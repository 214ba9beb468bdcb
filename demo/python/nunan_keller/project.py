"""Nunan-Keller sweep from Python: effective viscosity coefficients
alpha(V), beta(V) for a periodic suspension of rigid spheres, versus the
1984 paper table."""
import numpy as np

import fibergen_tpu as fgt

PAPER = {0.04: (0.11567, 0.097696), 0.12: (0.46580, 0.28995),
         0.20: (1.0666, 0.49665)}

XML = """
<settings>
  <solver n="32">
    <materials><matrix mu="1" /><fiber mu="0" /></materials>
    <mode>viscosity</mode>
    <gamma_scheme>full_staggered</gamma_scheme>
    <tol>1e-5</tol>
  </solver>
  <actions>
    <select_material name="fiber" />
    <place_fiber V="0.2" />
    <calc_effective_properties />
  </actions>
</settings>
"""

for V, (a_ref, b_ref) in PAPER.items():
    fg = fgt.FG()
    fg.set_xml(XML)
    fg.set("actions.place_fiber..V", V)
    fg.run()
    alpha, beta = fg._nunan_keller
    print(f"V={V}: alpha={alpha:.5f} (paper {a_ref}), "
          f"beta={beta:.5f} (paper {b_ref})")
