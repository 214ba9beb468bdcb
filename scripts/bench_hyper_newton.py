"""Full hyperelastic Newton-Krylov wall-to-tolerance on the real chip
(VERDICT r4 item 5): the reference's flagship differentiator is the
complete solve (runCGHyper, fibergen.cpp:22699-23131), not the inner-CG
iteration rate bench_modes.py records.  Two-phase SVK RVE, 2% uniaxial
stretch, staggered scheme, f32.

Usage: python scripts/bench_hyper_newton.py [n ...]   (default 128 256)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(n, tol=1e-5, stretch=0.02, tangent="exact", repeats=1):
    import jax.numpy as jnp

    import fibergen_tpu as fg
    from fibergen_tpu.utils.logging import LOG

    grid = fg.Grid(n, n, n)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("fiber", fg.SaintVenantKirchhoff(mu=10.0, lam=5.0), phi1),
        fg.Phase("matrix", fg.SaintVenantKirchhoff(mu=1.0, lam=1.0),
                 1.0 - phi1)], dim=9)
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="hyperelasticity", method="cg", gamma_scheme="staggered",
        tol=tol, error_estimator="residual",
        outer_error_estimator="epsilon", check_every=8, dtype="float32",
        newton_tangent=tangent, maxiter=2000))
    # uniaxial stretch: F11 = 1 + stretch, F22 = F33 = 1
    E = np.array([1.0 + stretch, 1, 1, 0, 0, 0, 0, 0, 0])
    # repeats > 1: re-solve from scratch in the same process so the last
    # wall is warm (all programs cached) — the compile-free number the
    # reference's persistent-process usage pattern sees.
    for rep in range(repeats):
        s.set_strain(E)
        LOG.enabled = False
        t0 = time.perf_counter()
        ret = s.run()
        wall = time.perf_counter() - t0
        assert not ret, "hyper solve failed"
        it = len(s.residuals)
        sig = np.asarray(s.calc_mean_stress())
        detf = s.calc_min_det_f()
        tag = "warm" if rep else "cold"
        print(f"hyper {n}^3 SVK Newton-CG[{tangent}] tol={tol:g} "
              f"stretch={stretch} [{tag}]: "
              f"wall-to-tol {wall:.1f} s, {it} total inner iterations "
              f"({it/wall:.2f} it/s), min detF {detf:.4f}, "
              f"P11 {sig[0]:.6f}", flush=True)
    return wall, it


if __name__ == "__main__":
    if sys.argv[1:2] == ["warm"]:
        # warm walls + accuracy-matched frozen comparison at one size
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        run(n, tangent="exact", repeats=2)
        run(n, tangent="frozen_iso", repeats=2)
        # frozen at tighter tol: linear outer convergence stops the
        # eps-change estimator early in true-error terms (P11 was 0.8%
        # off exact at tol 1e-5); measure the tol that recovers the digit
        run(n, tol=1e-7, tangent="frozen_iso", repeats=2)
    else:
        ns = [int(a) for a in sys.argv[1:]] or [128, 256]
        for n in ns:
            run(n, tangent="exact")
            run(n, tangent="frozen_iso")
