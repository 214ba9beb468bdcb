"""Headline benchmark: Lippmann-Schwinger CG on a 256^3 linear-elasticity
RVE (staggered grid — the reference's default path).

Reports the FULL north-star metric (BASELINE.json): steady-state LS CG
iterations/sec AND wall-time / iterations to a 1e-6 relative CG residual
(runCGElasticity, fibergen.cpp:23153-23247; converged :21164).

Prints ONE JSON line:
  {"metric": ..., "value": iters/sec, "unit": "iter/s", "vs_baseline": ...,
   "wall_to_1e6_s": ..., "iters_to_1e6": ..., "final_rel": ...}

vs_baseline compares against a MEASURED reference proxy (BASELINE.md): the
fibergen C++ build needs Boost/FFTW which are not installed here, so
bench_baseline_cpu.py executes the identical staggered-CG op sequence in
threaded torch f64 on the host CPU.  Measured 2026-08-16: 26.05 s/iter at
256^3 on one core; the 64-core node estimate assumes perfect linear scaling
(favorable to the reference): 26.05/64 = 0.407 s/iter.  The same script's
--to-tol mode runs the true CG on the identical sphere RVE to the same
1e-6 residual, demonstrating iteration-count parity (BASELINE.md).
"""
import json
import sys
import time

import numpy as np

# measured reference proxy: 256^3 staggered CG, 26.05 s/iter on 1 core
# (python bench_baseline_cpu.py 256 2), perfect-scaling 64-core estimate
BASELINE_ITERS_PER_SEC = 1.0 / 0.407


def make_problem(n, dtype="float32", **opt_kw):
    """Sphere RVE, 30% fiber volume, contrast 10 — identical to
    bench_baseline_cpu.py --to-tol so iteration counts are comparable."""
    import jax.numpy as jnp

    import fibergen_tpu as fg

    grid = fg.Grid(n, n, n)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("fiber", fg.LinearIsotropic(mu=10.0, lam=5.0), phi1),
        fg.Phase("matrix", fg.LinearIsotropic(mu=1.0, lam=1.0), 1.0 - phi1),
    ], dim=6)
    solver = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype=dtype, check_every=8, **opt_kw))
    solver.set_strain([1.0, 0, 0, 0, 0, 0])
    if n >= 512:
        # 512^3 single-chip memory budget: keep only the mixed moduli
        # resident (low_mem="auto" already picks the 3-field CG step)
        mat._all_iso()
        mat.drop_phi()
    return grid, mat, solver


def steady_state_ips(n):
    """Steady-state fused-chunk iterations/sec (the round-1/2 metric)."""
    import jax
    import jax.numpy as jnp

    from fibergen_tpu.core import fields

    grid, mat, solver = make_problem(n)
    solver.eps = fields.const_field(grid, np.zeros(6), solver.dtype)
    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0

    E = jnp.asarray(np.array([1.0, 0, 0, 0, 0, 0]), solver.dtype)
    mf = solver.mat.fields()
    K = solver.opt.check_every
    lm6 = getattr(solver, "_lm6_capable", False)
    if lm6:
        # tuple-state low-memory chunks (the run loop's actual 512^3 unit).
        # Free the (6,n,n,n) const field first: lm6 never reads it, and at
        # 512^3 its 3 GiB sits next to the 14.1 GiB chunk program —
        # runtime OOM even though the AOT estimate fits.
        solver.eps = None
        eps, r, p, gamma, gamma_prev, _, _, _, _ = \
            solver._lm6_init_chunk_n(K)(mf, E, mu0=mu0, lam0=lam0)

        def chunk(eps, r, p, gamma, gamma_prev):
            return solver._lm6_multi_n(K)(
                mf, eps, r, p, gamma, gamma_prev, mu0=mu0, lam0=lam0)
    else:
        eps, r, p, gamma, gamma_prev, _ = solver._k_cg_init(
            mf, E, None, mu0=mu0, lam0=lam0)

        def chunk(eps, r, p, gamma, gamma_prev):
            return solver._k_cg_multi(
                mf, eps, r, p, gamma, gamma_prev, None, mu0=mu0, lam0=lam0)

    # warmup (compile); K iterations fused per device chunk (check_every)
    eps, r, p, gamma, gamma_prev, gammas, mets = chunk(
        eps, r, p, gamma, gamma_prev)
    jax.block_until_ready(eps)

    # pipelined like the real loop (_run_cg): the gamma carry stays a
    # device scalar and each chunk's metrics are pulled to host one chunk
    # behind, overlapping the tunnel round-trip with device compute
    chunks = 6
    pending = None
    t0 = time.perf_counter()
    for _ in range(chunks):
        eps, r, p, gamma, gamma_prev, gammas, mets = chunk(
            eps, r, p, gamma, gamma_prev)
        if pending is not None:
            np.asarray(pending[0]); np.asarray(pending[1])
        pending = (gammas, mets)
    np.asarray(pending[0]); np.asarray(pending[1])
    jax.block_until_ready(eps)
    dt = time.perf_counter() - t0
    return chunks * K / dt


def wall_to_tol(n, tol=1e-6):
    """Full solve through the public run() path to a 1e-6 relative CG
    residual (sqrt(gamma/gamma0), same metric as the reference's residual
    estimator, fibergen.cpp:14385-14405).  The first solve compiles the
    kernels (cached); the SECOND, timed solve measures pure solve wall time
    — the reference has no JIT so steady-state is the comparable number.
    """
    _, _, solver = make_problem(
        n, error_estimator="residual", tol=tol, maxiter=4000)
    solver.run()          # compile warmup (returns False on success)
    fail = solver.run()   # timed: solve_time excludes tracing/compilation
    iters = len(solver.residuals)
    final_rel = float(solver.residuals[-1]) if solver.residuals else float("nan")
    return solver.solve_time, iters, final_rel, bool(fail)


def main():
    n = 256
    if len(sys.argv) > 1:
        n = int(sys.argv[1])

    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    ips = steady_state_ips(n)
    wall, iters, final_rel, fail = wall_to_tol(n)

    print(json.dumps({
        "metric": f"LS CG iterations/sec, {n}^3 elasticity RVE, staggered grid, f32",
        "value": round(ips, 4),
        "unit": "iter/s",
        "vs_baseline": round(ips / BASELINE_ITERS_PER_SEC, 2),
        "wall_to_1e6_s": round(wall, 3),
        "iters_to_1e6": iters,
        "final_rel": final_rel,
        "tol_reached": (not fail) and final_rel <= 1e-6,
    }))


if __name__ == "__main__":
    main()
