"""Regular-polygon fiber arrangement driven from Python: place capsules on a
circle and compute the effective conductivity."""
import numpy as np

import fibergen_tpu as fgt

N_SIDES = 6
R_CIRCLE = 0.3
R_FIBER = 0.06

fg = fgt.FG()
fg.set_xml("""
<settings>
  <solver n="64">
    <mode>heat</mode>
    <tol>1e-8</tol>
    <materials>
      <matrix mu="1" />
      <fiber mu="10" />
    </materials>
  </solver>
  <actions />
</settings>
""")
fg.init_lss()
fg.init_gen()
fg.gen.select_material(1, "fiber")

from fibergen_tpu.geometry.primitives import Capsule

for k in range(N_SIDES):
    a0 = 2 * np.pi * k / N_SIDES
    a1 = 2 * np.pi * (k + 1) / N_SIDES
    p0 = np.array([0.5 + R_CIRCLE * np.cos(a0), 0.5 + R_CIRCLE * np.sin(a0), 0.5])
    p1 = np.array([0.5 + R_CIRCLE * np.cos(a1), 0.5 + R_CIRCLE * np.sin(a1), 0.5])
    c = 0.5 * (p0 + p1)
    ax = (p1 - p0) / np.linalg.norm(p1 - p0)
    fg.gen.add_fiber(Capsule(center=c, axis=ax,
                             length=float(np.linalg.norm(p1 - p0)),
                             radius=R_FIBER))

fg.init_phase()
fg.solver.set_strain([1.0, 0, 0])
fg.solver.run()
print("effective flux:", fg.get_mean_stress())
