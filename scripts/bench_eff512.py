"""512^3 calc_effective_properties end-to-end on ONE chip (VERDICT r4
item 4): the flagship workflow (fibergen.cpp:26030-26403) at the flagship
size — 6 load cases streamed through the lm6 low-memory CG with warm
program reuse, phi dropped for the stream, Ceff + isotropic fit at the
end.  Usage: python scripts/bench_eff512.py [n] (default 512).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

XML = """
<settings>
  <solver n="{n}">
    <mode>elasticity</mode>
    <tol>1e-6</tol>
    <error_estimator>residual</error_estimator>
    <check_every>8</check_every>
    <materials>
      <matrix mu="1" lambda="1" />
      <fiber mu="10" lambda="5" />
    </materials>
  </solver>
  <actions>
    <select_material name="fiber" />
    <place_fiber R="0.3" />
    <calc_effective_properties />
  </actions>
</settings>
"""


def main(n=512):
    import fibergen_tpu as fgmod
    from fibergen_tpu.utils.logging import LOG

    fg = fgmod.FG()
    fg.set_xml(XML.format(n=n))
    LOG.enabled = False
    t0 = time.perf_counter()
    rc = fg.run()
    wall = time.perf_counter() - t0
    assert rc == 0, f"rc={rc}"
    C = np.array(fg.get_effective_property())
    print(f"{n}^3 calc_effective_properties end-to-end: {wall:.1f} s "
          "(6 load cases + Ceff, one chip)", flush=True)
    print("Ceff diag:", np.diag(C).round(4).tolist(), flush=True)
    print("C12,C13,C23:", [round(C[0, 1], 4), round(C[0, 2], 4),
                           round(C[1, 2], 4)], flush=True)
    assert np.all(np.isfinite(C))
    # sphere inclusion: cubic-symmetric Ceff, diagonal dominant
    assert abs(C[0, 0] - C[1, 1]) / C[0, 0] < 0.02
    assert C[0, 0] > C[0, 1] > 0


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
