"""Heat 256^3 staggered CG step composition (two-depth scan slope)."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fibergen_tpu.core.grid import Grid
from fibergen_tpu.ops import green, staggered

assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()

n = 256
grid = Grid(n, n, n)
ks = jax.random.split(jax.random.key(0), 6)
p3 = jax.random.normal(ks[0], (3, n, n, n), jnp.float32)
r3 = jax.random.normal(ks[1], (3, n, n, n), jnp.float32)
w3 = jax.random.normal(ks[2], (3, n, n, n), jnp.float32)
mu = 1.0 + jax.random.uniform(ks[3], (n, n, n), jnp.float32)
f1 = jax.random.normal(ks[4], (1, n, n, n), jnp.float32)
E = jnp.zeros(3, jnp.float32)
DEPTHS = (4, 12)


def _sync(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(jnp.sum(leaf[0, 0, 0]))


def bench(name, make_many, x0, *consts, reps=3):
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


def many_stress_div(depth):
    @jax.jit
    def run(p, m):
        def body(pp, _):
            tau = 2.0 * (m - 1.5)[None] * pp
            f = staggered.div_staggered_heat(grid, tau)
            return pp * (1.0 + 1e-30 * f[0, 0, 0, 0]), 0.0
        out, _ = lax.scan(body, p, None, length=depth)
        return out
    return run


def many_chain(depth):
    @jax.jit
    def run(f):
        def body(ff, _):
            return green.g0_staggered_heat_fused(grid, 0.75, 0.0, ff,
                                                 -1.0), 0.0
        out, _ = lax.scan(body, f, None, length=depth)
        return out
    return run


def many_eps(depth):
    @jax.jit
    def run(u):
        def body(uu, _):
            w = staggered.eps_staggered_heat(grid, E, uu)
            return uu * (1.0 + 1e-30 * w[0, 0, 0, 0]), 0.0
        out, _ = lax.scan(body, u, None, length=depth)
        return out
    return run


def many_axpy(depth):
    @jax.jit
    def run(c, p, w):
        from fibergen_tpu.core import fields
        def body(cc, _):
            eps, r = cc
            alpha = jnp.float32(0.5) + 1e-30 * r[0, 0, 0, 0]
            eps2 = eps + alpha * p
            r2 = r - alpha * (p - w)
            denom = fields.inner_l2_diff(p, p, w)
            delta = fields.inner_l2(r2, r2)
            return (eps2 * (1.0 + 1e-30 * (delta + denom)), r2), 0.0
        out, _ = lax.scan(body, c, None, length=depth)
        return out
    return run


t1 = bench("stress+div (jnp pads)", many_stress_div, p3, mu)
t2 = bench("chain (1-comp G0, Pallas mid)", many_chain, f1)
t3 = bench("eps grad (jnp pads)", many_eps, f1)
t4 = bench("axpy+dots tail", many_axpy, (p3, r3), p3, w3)
print(f"{'sum of stages':34s} {t1 + t2 + t3 + t4:7.3f} ms"
      f"  (measured step: ~9.4 ms)")
