"""Where does the 256^3 staggered CG step's time go at HEAD?

Each stage runs inside a 10-deep lax.scan with a data dependency between
iterations (the axon tunnel otherwise hides per-call cost), mirroring
bench_pallas_middle3.py's methodology: stress/div sweep, spectral chain
(Pallas middle), eps/dot sweep, and the XLA axpy tail.
"""
import time

import numpy as np
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


def bench(name, many, x0, reps=3, depth=10):
    y = many(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = many(y)
        jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / (reps * depth) * 1e3
    print(f"{name:34s} {dt:7.3f} ms", flush=True)
    return dt


@jax.jit
def many_stress(p):
    def body(pp, _):
        f, p2 = psw.stress_div_beta_sweep(grid, r6, pp, 0.7, mu_x, lam_x,
                                          2.0, 0.0)
        return p2 * (1.0 + 1e-30 * f[0, 0, 0, 0]), 0.0
    out, _ = lax.scan(body, p, None, length=10)
    return out


@jax.jit
def many_chain(f):
    def body(ff, _):
        return green.g0_staggered_fused(grid, 2.0, 0.0, ff, -1.0), 0.0
    out, _ = lax.scan(body, f, None, length=10)
    return out


@jax.jit
def many_eps(p):
    def body(pp, _):
        w, dot = psw.eps_from_u_dot_sweep(grid, E, f3, pp)
        return w, 0.0
    out, _ = lax.scan(body, p, None, length=10)
    return out


@jax.jit
def many_axpy(c):
    def body(cc, _):
        eps, r = cc
        alpha = jnp.float32(0.5) + 1e-30 * r[0, 0, 0, 0]
        eps2 = eps + alpha * p6
        r2 = r - alpha * (p6 - w6)
        delta = fields.inner_l2(r2, r2)
        return (eps2 * (1.0 + 1e-30 * delta), r2), 0.0
    out, _ = lax.scan(body, c, None, length=10)
    return out


t1 = bench("stress_div_beta_sweep", many_stress, p6)
t2 = bench("chain (fft+G0+ifft, Pallas mid)", many_chain, f3)
t3 = bench("eps_from_u_dot_sweep", many_eps, p6)
t4 = bench("axpy tail (eps2,r2,gamma)", many_axpy, (r6, p6))
print(f"{'sum of stages':34s} {t1 + t2 + t3 + t4:7.3f} ms"
      f"  (bench.py full step: ~16.3 ms)")
