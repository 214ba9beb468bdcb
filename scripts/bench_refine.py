"""Deep-tolerance (mixed-precision refinement) validation on the real TPU.

Part A — the reference's flagship double-precision demo: hashin coated
sphere at its SHIPPED tol 1e-10 (demo/elasticity/hashin/project.xml:9;
the reference computes in double, fibergen.cpp:26550-26565).  On f32
hardware the solve must CONVERGE via refinement (no stagnation stop) and
the k_eff digit must match the CPU-f64 pipeline's (PARITY: 4.306751 at
n=64 with voigt interface mixing).

Part B — the 256^3 bench RVE to tol 1e-9: wall, sweeps, inner iterations.

Usage: python scripts/bench_refine.py [A|B|AB]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def part_a():
    import fibergen_tpu as fgmod
    from fibergen_tpu.utils.logging import LOG

    xml = open(os.path.join(os.path.dirname(__file__), "..",
                            "demo/elasticity/hashin/project.xml")).read()
    out = {}
    for refine in ("off", "auto"):
        fg = fgmod.FG()
        fg.set_xml(xml)
        fg.set("solver.refine", refine)
        LOG.enabled = False
        t0 = time.perf_counter()
        rc = fg.run()
        wall = time.perf_counter() - t0
        assert rc == 0, f"hashin run rc={rc}"
        sig = np.array(fg.get_mean_stress())
        k_eff = sig[:3].sum() / 9.0
        lss = fg.solver
        out[refine] = dict(k_eff=k_eff, wall=wall,
                           iters=len(lss.residuals),
                           final_rel=lss.residuals[-1],
                           refined=lss.eps64 is not None)
        print(f"hashin n=64 tol=1e-10 refine={refine}: "
              f"k_eff={k_eff!r} wall={wall:.1f}s "
              f"iters={len(lss.residuals)} final_rel={lss.residuals[-1]:g} "
              f"refined={lss.eps64 is not None}", flush=True)
    # refined run must actually reach the demo tolerance; bare f32 cannot
    assert out["auto"]["refined"] and out["auto"]["final_rel"] <= 1e-10
    assert not out["off"]["refined"]
    # CPU-f64 pipeline digit (PARITY round-2 n-study, voigt mixing)
    print(f"CPU-f64 pipeline digit: 4.306751  |  refined TPU digit: "
          f"{out['auto']['k_eff']:.6f}", flush=True)


def part_b(n=256, tol=1e-9):
    import jax
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import make_problem
    from fibergen_tpu.utils.logging import LOG

    grid, mat, solver = make_problem(n, tol=tol)
    LOG.enabled = False
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        ret = solver.run()
        wall = time.perf_counter() - t0
        assert not ret
        print(f"{n}^3 tol={tol:g} [{tag}]: wall={wall:.2f}s "
              f"sweeps={getattr(solver, 'refine_sweeps', 0)} "
              f"inner_iters={getattr(solver, 'refine_inner_iters', 0)} "
              f"total_res={len(solver.residuals)} "
              f"final_rel={solver.residuals[-1]:g} "
              f"refined={solver.eps64 is not None}", flush=True)
        assert solver.eps64 is not None
        assert solver.residuals[-1] <= tol


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    if "A" in which:
        part_a()
    if "B" in which:
        part_b()
