"""Hyperelastic Newton inner-CG step breakdown (real chip).

VERDICT r3 item 3 asks for a measured hyper iter/s with a per-stage
breakdown explaining the cost vs the elasticity step.  The inner CG step
(newton.newton_cg_step) is

    W    = (dP/dF(F) - C0) : Q          tangent jvp  (stress_deriv)
    W    = -Gamma0 W                    9-comp spectral chain (gamma_op)
    tail = alpha/beta axpy updates + two reductions

Each stage is timed standalone with the roofline convention
(scripts/bench_roofline.py): N reps chained through a lax.scan carry in ONE
device program, a single float() sync, wall/N.  Also times the full fused
step for the composition total.

Usage: python scripts/bench_hyper_breakdown.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import fibergen_tpu as fg
    from fibergen_tpu.core import fields
    from fibergen_tpu.solvers import bc as bcmod
    from fibergen_tpu.solvers import newton
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    grid = fg.Grid(n, n, n)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X_, Y_, Z_ = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(((X_**2 + Y_**2 + Z_**2) < 0.09).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("a", fg.SaintVenantKirchhoff(mu=10.0, lam=5.0), phi1),
        fg.Phase("b", fg.SaintVenantKirchhoff(mu=1.0, lam=1.0), 1.0 - phi1),
    ], dim=9)
    solver = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="hyperelasticity", method="cg", gamma_scheme="staggered",
        dtype="float32", check_every=8))
    E = np.zeros(9); E[:3] = 1.0; E[0] = 1.02
    solver.set_strain(E)
    solver.eps = fields.const_field(grid, E, solver.dtype)
    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0
    bca = bcmod.to_arrays(solver._bc, solver.dtype)
    ks = newton._kernels(solver)
    mf = solver.mat.fields()

    F = solver.eps
    key = jax.random.key(0)
    Q0 = 0.01 * jax.random.normal(key, F.shape, F.dtype)

    from fibergen_tpu.ops import gamma as gammamod

    # F and the material fields ride as jit ARGUMENTS (closure constants
    # are serialized into the compile payload: a 600 MB F overflows the
    # tunnel's remote-compile body limit with HTTP 413)
    def stress_deriv_only(F, mfields, Q):
        with mat.bound(mfields):
            W = mat.dpk1(F, Q) - 2.0 * mu0 * Q
        tr = lam0 * (Q[0] + Q[1] + Q[2])
        return W.at[0:3].add(-tr) if lam0 != 0.0 else W

    def chain_only(F, mfields, Q):
        zero = jnp.zeros(9, Q.dtype)
        return gammamod.gamma_operator(
            grid, solver.mode, solver.scheme, bca, zero, mu0, lam0, Q,
            -1.0, par=None, pallas_mid=True)

    def tail_only(F, mfields, Q):
        # stand-in axpy tail: same traffic shape as the CG update
        # (X += a Q; R -= a (Q - W); two reductions) with W := Q rolled
        W = jnp.roll(Q, 1, axis=1)
        gamma = fields.inner_l2(Q, Q)
        denom = fields.inner_l2_diff(Q, Q, W) + 1e-30
        a = gamma / denom
        X2 = Q + a * W
        R2 = Q - a * (Q - W)
        return X2 + 1e-6 * R2

    N = 10

    def timeit(name, body, x0):
        def prog(F, mfields, x):
            def step(c, _):
                return body(F, mfields, c), ()
            y, _ = lax.scan(step, x, None, length=N)
            return y
        f = jax.jit(prog)
        y = f(F, mf, x0); jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = f(F, mf, x0)
        float(y.ravel()[0])
        dt = (time.perf_counter() - t0) / N
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt

    t_sd = timeit("stress_deriv (tangent jvp, 9-comp)", stress_deriv_only, Q0)
    t_ch = timeit("gamma chain (9-comp spectral)", chain_only, Q0)
    t_tl = timeit("CG axpy tail (same traffic)", tail_only, Q0)

    # full fused inner-CG chunk (the production unit), per iteration
    X0 = jnp.zeros_like(F)
    R0 = Q0
    st = ks["cg_multi"](mf, F, X0, R0, Q0, 1.0, 1.0,
                        mu0=mu0, lam0=lam0, bca=bca)
    jax.block_until_ready(st[0])
    K = solver.opt.check_every
    t0 = time.perf_counter()
    reps = 4
    s = (X0, R0, Q0, st[3])
    for _ in range(reps):
        X, R, Q, gamma, eps2, gammas, denoms, mets = ks["cg_multi"](
            mf, F, s[0], s[1], s[2], s[3], 1.0,
            mu0=mu0, lam0=lam0, bca=bca)
        s = (X, R, Q, gamma)
    jax.block_until_ready(s[0])
    t_step = (time.perf_counter() - t0) / (reps * K)
    print(f"full fused inner-CG step: {t_step*1e3:.2f} ms "
          f"({1.0/t_step:.1f} iter/s)", flush=True)
    print(f"stage sum {1e3*(t_sd+t_ch+t_tl):.2f} ms vs fused {t_step*1e3:.2f} "
          f"ms (fusion wins {(1-(t_step/(t_sd+t_ch+t_tl)))*100:.0f}%)"
          if (t_sd+t_ch+t_tl) > 0 else "")


if __name__ == "__main__":
    main()
