"""End-to-end Grosmont digital-rocks timing on the real chip: the full
demo XML (read_raw_data x2 + calc_effective_properties, 6 load cases at
128^3, tol 1e-5) through the public API.

Round-3 recorded 70 s end-to-end with 6 strictly sequential solves; the
batched multi-RHS driver (LSSolver.run_batched) targets <= ~30 s.  Pass
--sequential to time the fallback path for comparison.

Usage:  python scripts/bench_grosmont.py [--sequential]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import fibergen_tpu as fglib
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    import jax
    backend = jax.default_backend()

    f = fglib.FG()
    xml = os.path.join(os.path.dirname(__file__), "..", "demo",
                       "elasticity", "digital_rocks", "project.xml")
    f.load_xml(os.path.abspath(xml))
    if "--sequential" in sys.argv:
        f.set("solver..batch_load_cases", "off")

    t0 = time.time()
    rc = f.run()
    wall = time.time() - t0
    if "--timings" in sys.argv:
        from fibergen_tpu.utils.logging import TIMINGS
        print(TIMINGS.report(), file=sys.stderr)
    C = np.array(f.get_effective_property())
    print(json.dumps({
        "backend": backend,
        "mode": "sequential" if "--sequential" in sys.argv else "batched",
        "rc": rc,
        "wall_s": round(wall, 2),
        "C11": round(float(C[0, 0]), 4),
        "C44": round(float(C[3, 3]), 4),
        "diag": [round(float(C[i, i]), 4) for i in range(6)],
    }))


if __name__ == "__main__":
    main()
