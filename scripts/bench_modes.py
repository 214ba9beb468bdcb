"""Steady-state iter/s for the non-headline hot paths (real TPU):
heat/porous 256^3 staggered CG, hyperelastic Newton inner CG, and
any-mode/size via args.

Usage: python scripts/bench_modes.py [mode] [n] [scheme]
mode in {heat, porous, elasticity, viscosity, hyperelasticity}
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "heat"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scheme = sys.argv[3] if len(sys.argv) > 3 else "staggered"
    import jax
    import jax.numpy as jnp
    import fibergen_tpu as fg
    from fibergen_tpu.core import fields
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    print("backend:", jax.default_backend())
    grid = fg.Grid(n, n, n)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float32))
    if mode in ("heat", "porous"):
        dim = 3
        mk = lambda mu: fg.ScalarLinearIsotropic(mu=mu, dim=3)
        mat = fg.VoigtMixed([fg.Phase("a", mk(10.0), phi1),
                             fg.Phase("b", mk(1.0), 1.0 - phi1)], dim=3)
    elif mode == "hyperelasticity":
        dim = 9
        mat = fg.VoigtMixed([
            fg.Phase("a", fg.SaintVenantKirchhoff(mu=10.0, lam=5.0), phi1),
            fg.Phase("b", fg.SaintVenantKirchhoff(mu=1.0, lam=1.0),
                     1.0 - phi1),
        ], dim=9)
    else:
        dim = 6
        mat = fg.VoigtMixed([
            fg.Phase("a", fg.LinearIsotropic(mu=10.0, lam=5.0), phi1),
            fg.Phase("b", fg.LinearIsotropic(mu=1.0, lam=1.0), 1.0 - phi1),
        ], dim=6)
    solver = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode=mode, method="cg", gamma_scheme=scheme,
        dtype="float32", check_every=8))

    if mode == "hyperelasticity":
        # steady-state Newton INNER-CG throughput (the hot work of
        # run_newton_cg): one outer linearization, chunked inner CG
        from fibergen_tpu.core import voigt
        from fibergen_tpu.solvers import bc as bcmod
        from fibergen_tpu.solvers import newton
        E = np.zeros(9, np.float64)
        E[:3] = 1.0
        E[0] = 1.02  # 2% uniaxial stretch
        solver.set_strain(E)
        solver.eps = fields.const_field(grid, E, solver.dtype)
        solver.calc_ref_material()
        mu0, lam0 = solver.mu_0, solver.lambda_0
        bca = bcmod.to_arrays(solver._bc, solver.dtype)
        ks = newton._kernels(solver)
        mf = solver.mat.fields()
        X0 = voigt.dyad4_mv(solver._bc.M, np.zeros(9))
        F = solver.eps
        X, R, gamma = ks["init"](mf, F, X0, mu0=mu0, lam0=lam0, bca=bca)
        Q = R
        K = solver.opt.check_every
        relax = solver.opt.newton_relax
        step = lambda s: ks["cg_multi"](mf, F, *s[:4], relax,
                                        mu0=mu0, lam0=lam0, bca=bca)
        st = step((X, R, Q, gamma))
        jax.block_until_ready(st[0])
        chunks = 6
        pending = None
        t0 = time.perf_counter()
        for _ in range(chunks):
            st = step(st)
            if pending is not None:
                np.asarray(pending[0]); np.asarray(pending[1])
            pending = (st[5], st[6])
        np.asarray(pending[0]); np.asarray(pending[1])
        jax.block_until_ready(st[0])
        dt = time.perf_counter() - t0
        print(f"{mode} {n}^3 {scheme} Newton inner CG: "
              f"{chunks * K / dt:.1f} iter/s "
              f"({dt / (chunks * K) * 1e3:.2f} ms/iter)")
        return

    solver.eps = fields.const_field(grid, np.zeros(dim), solver.dtype)
    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0
    E = jnp.asarray(np.eye(dim)[0], solver.dtype)
    mf = solver.mat.fields()
    eps, r, p, gamma, gamma_prev, _ = solver._k_cg_init(
        mf, E, None, mu0=mu0, lam0=lam0)
    K = solver.opt.check_every
    step = lambda s: solver._k_cg_multi(mf, *s[:5], None, mu0=mu0, lam0=lam0)
    st = step((eps, r, p, gamma, gamma_prev))
    jax.block_until_ready(st[0])
    chunks = 6
    pending = None
    t0 = time.perf_counter()
    for _ in range(chunks):
        st = step(st)
        if pending is not None:
            np.asarray(pending[0]); np.asarray(pending[1])
        pending = (st[5], st[6])
    np.asarray(pending[0]); np.asarray(pending[1])
    jax.block_until_ready(st[0])
    dt = time.perf_counter() - t0
    print(f"{mode} {n}^3 {scheme} CG: {chunks * K / dt:.1f} iter/s "
          f"({dt / (chunks * K) * 1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
