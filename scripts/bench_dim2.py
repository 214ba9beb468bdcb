"""Benchmark the true DIM=2 pipeline against the nz=1 3-D superset path.

Disc RVE (30% fiber, contrast 10) on an n x n x 1 grid, staggered CG —
the 2-D analogue of bench.py's sphere problem.  Prints one JSON line per
(n, use_dim2) combination with steady-state iterations/sec.

Run on the real TPU:  python scripts/bench_dim2.py [n ...]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(n, use_dim2):
    import jax.numpy as jnp

    import fibergen_tpu as fg

    grid = fg.Grid(n, n, 1)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in (n, n)]
    X, Y = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(
        ((X * X + Y * Y) < 0.3 / np.pi).astype(np.float32)[..., None])
    mat = fg.VoigtMixed([
        fg.Phase("fiber", fg.LinearIsotropic(mu=10.0, lam=5.0), phi1),
        fg.Phase("matrix", fg.LinearIsotropic(mu=1.0, lam=1.0), 1.0 - phi1),
    ], dim=6)
    solver = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype="float32", check_every=16, use_dim2=use_dim2))
    solver.set_strain([1.0, 0, 0, 0, 0, 0])
    return grid, mat, solver


def steady_state_ips(n, use_dim2):
    import jax
    import jax.numpy as jnp

    from fibergen_tpu.core import fields

    grid, mat, solver = make_problem(n, use_dim2)
    solver.eps = fields.const_field(grid, np.zeros(6), solver.dtype)
    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0
    E = jnp.asarray(np.array([1.0, 0, 0, 0, 0, 0]), solver.dtype)
    dim2 = solver._dim2_ok(None, np.array([1.0, 0, 0, 0, 0, 0]))
    mf = solver.mat.fields()
    eps, r, p, gamma, gamma_prev, _ = solver._k_cg_init(
        mf, E, None, mu0=mu0, lam0=lam0, dim2=dim2)

    K = solver.opt.check_every
    eps, r, p, gamma, gamma_prev, gammas, mets = solver._k_cg_multi(
        mf, eps, r, p, gamma, gamma_prev, None, mu0=mu0, lam0=lam0,
        dim2=dim2)
    jax.block_until_ready(eps)

    chunks = 8
    pending = None
    t0 = time.perf_counter()
    for _ in range(chunks):
        eps, r, p, gamma, gamma_prev, gammas, mets = solver._k_cg_multi(
            mf, eps, r, p, gamma, gamma_prev, None, mu0=mu0, lam0=lam0,
            dim2=dim2)
        if pending is not None:
            np.asarray(pending[0]); np.asarray(pending[1])
        pending = (gammas, mets)
    np.asarray(pending[0]); np.asarray(pending[1])
    jax.block_until_ready(eps)
    dt = time.perf_counter() - t0
    return chunks * K / dt, dim2


def main():
    ns = [int(a) for a in sys.argv[1:]] or [256, 512]
    from fibergen_tpu.utils.logging import LOG
    from fibergen_tpu.ops import fft as fftmod
    LOG.enabled = False
    import jax
    backend = jax.default_backend()

    for n in ns:
        for mode, fftb in (("off", "auto"), ("auto", "auto"),
                           ("auto", "xla")):
            fftmod.FFT_BACKEND = fftb
            ips, dim2 = steady_state_ips(n, mode)
            print(json.dumps({
                "metric": f"2-D LS CG iter/s, {n}^2 disc RVE, staggered f32",
                "use_dim2": mode, "fft_backend": fftb,
                "dim2_active": bool(dim2),
                "value": round(ips, 2), "unit": "iter/s",
                "backend": backend,
            }), flush=True)
            fftmod.FFT_BACKEND = "auto"


if __name__ == "__main__":
    main()
