"""512^3 single-chip rows beyond iso-linear trivial-BC elasticity
(VERDICT r4 item 3): the lm6 tuple-state CG extended to the viscosity
Delta staggered path and to mixed-BC solves.  Matches joss/paper.md:80
("several 100 million unknowns" on one node regardless of mode).

Usage: python scripts/bench_lm6_modes.py [visc|bca|both] [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _sphere_phi(grid):
    import jax.numpy as jnp
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    return jnp.asarray(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float32))


def run_visc(n):
    """Viscosity Delta staggered CG at n^3 on one chip (lm6)."""
    import fibergen_tpu as fg
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False
    grid = fg.Grid(n, n, n)
    phi1 = _sphere_phi(grid)
    mat = fg.VoigtMixed([
        fg.Phase("fiber", fg.ScalarLinearIsotropic(mu=0.5 * 5.0, dim=6),
                 phi1),
        fg.Phase("matrix", fg.ScalarLinearIsotropic(mu=0.5 * 1.0, dim=6),
                 1.0 - phi1)], dim=6)
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="viscosity", method="cg", gamma_scheme="staggered",
        tol=1e-6, error_estimator="residual", check_every=8,
        dtype="float32"))
    s.set_strain([0, 0, 0, 1.0, 0, 0])
    if n >= 512:
        mat._all_iso()
        mat.drop_phi()
    t0 = time.perf_counter()
    ret = s.run()
    wall = time.perf_counter() - t0
    assert not ret
    it = len(s.residuals)
    print(f"viscosity {n}^3 Delta staggered CG (lm6={s._lm6_capable}): "
          f"wall-to-1e-6 {wall:.2f} s / {it} iters "
          f"({it/wall:.2f} iter/s incl. setup), final_rel "
          f"{s.residuals[-1]:g}", flush=True)
    # second solve: warm programs, steady-state number
    s.eps = None
    t0 = time.perf_counter()
    assert not s.run()
    wall2 = time.perf_counter() - t0
    it2 = len(s.residuals)
    print(f"viscosity {n}^3 warm: {wall2:.2f} s / {it2} iters = "
          f"{it2/wall2:.2f} iter/s", flush=True)


def run_bca(n):
    """Mixed-BC elasticity at n^3 on one chip (lm6): strain-driven normal
    components, prescribed (zero) shear stresses."""
    import fibergen_tpu as fg
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False
    grid = fg.Grid(n, n, n)
    phi1 = _sphere_phi(grid)
    mat = fg.VoigtMixed([
        fg.Phase("fiber", fg.LinearIsotropic(mu=10.0, lam=5.0), phi1),
        fg.Phase("matrix", fg.LinearIsotropic(mu=1.0, lam=1.0),
                 1.0 - phi1)], dim=6)
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        tol=1e-6, error_estimator="residual", check_every=8,
        dtype="float32"))
    P = np.zeros((6, 6))
    P[0, 0] = P[1, 1] = P[2, 2] = 1.0
    s.set_bc_projector(P)
    s.set_strain([1.0, 0.5, 0.2, 0, 0, 0])
    s.set_stress(np.zeros(6))
    if n >= 512:
        mat._all_iso()
        mat.drop_phi()
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        ret = s.run()
        wall = time.perf_counter() - t0
        assert not ret
        it = len(s.residuals)
        print(f"mixed-BC {n}^3 elasticity CG (lm6={s._lm6_capable}) "
              f"[{tag}]: wall-to-1e-6 {wall:.2f} s / {it} iters "
              f"({it/wall:.2f} iter/s), final_rel "
              f"{s.residuals[-1]:g}, bc_error {s.bc_error():g}", flush=True)
    Sm = s.calc_mean_stress()
    print(f"  mean stress: {np.round(np.asarray(Sm), 5).tolist()}",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    if which in ("visc", "both"):
        run_visc(n)
    if which in ("bca", "both"):
        run_bca(n)
