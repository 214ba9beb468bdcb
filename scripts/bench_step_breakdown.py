"""Where does the 256^3 staggered CG step's time go at HEAD?

Each stage runs inside a 4-deep lax.scan with a data dependency between
iterations (the axon tunnel otherwise hides per-call cost).  All fields
ride as jit ARGUMENTS — captured-array constants get serialized into the
remote-compile payload and blow its size limit.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

from fibergen_tpu.core import fields
from fibergen_tpu.core.grid import Grid
from fibergen_tpu.ops import green
from fibergen_tpu.ops import pallas_sweep as psw

assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()

n = 256
grid = Grid(n, n, n)
ks = jax.random.split(jax.random.key(0), 8)
r6 = jax.random.normal(ks[0], (6, n, n, n), jnp.float32)
p6 = jax.random.normal(ks[1], (6, n, n, n), jnp.float32)
w6 = jax.random.normal(ks[2], (6, n, n, n), jnp.float32)
mu_x = 1.0 + jax.random.uniform(ks[3], (n, n, n), jnp.float32)
lam_x = 1.0 + jax.random.uniform(ks[4], (n, n, n), jnp.float32)
f3 = jax.random.normal(ks[5], (3, n, n, n), jnp.float32)
E = jnp.zeros(6, jnp.float32)
DEPTHS = (4, 12)


def _sync(y):
    # block_until_ready does not round-trip the axon tunnel; a scalar
    # float() transfer is the reliable sync (CLAUDE.md gotcha)
    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(jnp.sum(leaf[0, 0, 0]))


def bench(name, make_many, x0, *consts, reps=3):
    """Times scans of two depths and reports the slope — the tunnel's
    ~28 ms host-sync cost cancels in the difference."""
    ts = []
    for depth in DEPTHS:
        many = make_many(depth)
        y = many(x0, *consts)
        _sync(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = many(y, *consts)
            _sync(y)
        ts.append((time.perf_counter() - t0) / reps)
    dt = (ts[1] - ts[0]) / (DEPTHS[1] - DEPTHS[0]) * 1e3
    print(f"{name:34s} {dt:7.3f} ms", flush=True)
    return dt


def many_stress(depth):
    @jax.jit
    def run(p, r, mu, lam):
        def body(pp, _):
            f, p2 = psw.stress_div_beta_sweep(grid, r, pp, 0.7, mu, lam,
                                              2.0, 0.0)
            return p2 * (1.0 + 1e-30 * f[0, 0, 0, 0]), 0.0
        out, _ = lax.scan(body, p, None, length=depth)
        return out
    return run


def many_chain(depth):
    @jax.jit
    def run(f):
        def body(ff, _):
            return green.g0_staggered_fused(grid, 2.0, 0.0, ff, -1.0), 0.0
        out, _ = lax.scan(body, f, None, length=depth)
        return out
    return run


def many_eps(depth):
    @jax.jit
    def run(p, u):
        def body(pp, _):
            w, dot = psw.eps_from_u_dot_sweep(grid, E, u, pp)
            return w, 0.0
        out, _ = lax.scan(body, p, None, length=depth)
        return out
    return run


def many_axpy(depth):
    @jax.jit
    def run(c, p, w):
        def body(cc, _):
            eps, r = cc
            alpha = jnp.float32(0.5) + 1e-30 * r[0, 0, 0, 0]
            eps2 = eps + alpha * p
            r2 = r - alpha * (p - w)
            delta = fields.inner_l2(r2, r2)
            return (eps2 * (1.0 + 1e-30 * delta), r2), 0.0
        out, _ = lax.scan(body, c, None, length=depth)
        return out
    return run


t2 = bench("chain (fft+G0+ifft, Pallas mid)", many_chain, f3)
t3 = bench("eps_from_u_dot_sweep", many_eps, p6, f3)
t4 = bench("axpy tail (eps2,r2,gamma)", many_axpy, (r6, p6), p6, w6)
t1 = bench("stress_div_beta_sweep", many_stress, p6, r6, mu_x, lam_x)
print(f"{'sum of stages':34s} {t1 + t2 + t3 + t4:7.3f} ms"
      f"  (bench.py full step: ~16.3 ms)")
