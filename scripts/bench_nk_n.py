"""Nunan-Keller n-convergence study (VERDICT r4 stretch item 9).

Round 2 recorded the full alpha/beta table at n=64 and the small-V rows
were ~1.4% off the Nunan & Keller (1984) digits, attributed to
discretization (the V=0.01 sphere is ~1.7 voxels in radius).  This adds
an n=128 column for the small-V rows, showing convergence toward the
paper values the way the Hashin n-study did (reference oracle:
/root/reference/demo/viscosity/nunan_keller/project.xml:22-33).

Usage: python scripts/bench_nk_n.py [n ...]   (default 64 128)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.chdir(os.path.join(os.path.dirname(__file__), ".."))

PAPER = {0.01: (0.025941, 0.024813), 0.02: (0.053804, 0.049320),
         0.04: (0.11567, 0.097696)}


def main(ns):
    import fibergen_tpu as fg
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False
    rows = []
    for n in ns:
        for V, (a_ref, b_ref) in PAPER.items():
            f = fg.FG()
            f.load_xml("demo/viscosity/nunan_keller/project.xml")
            f.set("solver..n", n)
            f.set("actions.place_fiber..V", V)
            f.set("solver.dtype", "float32")
            t0 = time.perf_counter()
            rc = f.run()
            wall = time.perf_counter() - t0
            a, b = f._nunan_keller if rc == 0 else (float("nan"),) * 2
            rows.append({"n": n, "V": V, "alpha": a, "beta": b,
                         "alpha_err": abs(a - a_ref) / a_ref,
                         "beta_err": abs(b - b_ref) / b_ref,
                         "wall_s": round(wall, 1)})
            print(json.dumps(rows[-1]), flush=True)
    json.dump(rows, open("/tmp/nk_n_table.json", "w"), indent=1)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 128])
