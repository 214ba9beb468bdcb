import numpy as np, jax, jax.numpy as jnp, time
from jax import lax
assert jax.default_backend() in ("tpu", "axon")
n = 256
p = jax.random.normal(jax.random.key(1), (6, n, n, n), jnp.float32)
u = jax.random.normal(jax.random.key(0), (3, n, n, n), jnp.float32)

N = 20
def bench(name, fn, nbytes):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), 0.0
        c, o = lax.scan(body, x, None, length=N)
        return c.sum()
    float(loop(p))
    t0 = time.perf_counter(); float(loop(p)); dt = (time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.3f} ms  ({nbytes/dt/1e9:.0f} GB/s agg)", flush=True)

fb = 4 * n**3  # one component-field in bytes

# read 6 write 6
bench("p*1.0001+2        (r6+w6)", lambda c: c * 1.0001 + 2.0, 12 * fb)
# read 6 write 6 with a y-roll (shift) on every component
bench("roll(p,1,y)+p     (r6+w6)", lambda c: jnp.roll(c, 1, axis=2) + c, 12 * fb)
# read 6+3 write 6 (closer to the eps mix; u closed over)
bench("p+pad-less mix    (r9+w6)", lambda c: c + jnp.concatenate([u, u], 0) * 0.5, 15 * fb)
# reduction only: read 6
bench("sum(p*p)          (r6)   ", lambda c: c + (c * c).sum() * 1e-20, 13 * fb)
