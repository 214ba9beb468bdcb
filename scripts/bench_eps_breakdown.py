"""Breakdown of the eps-sweep kernel's time at 256^3: variants toggle the
stencil math, the Kahan dot, and the output store while keeping the exact
DMA pattern."""
import numpy as np, jax, jax.numpy as jnp, time
from jax import lax
from fibergen_tpu.core.grid import Grid
from fibergen_tpu.ops import pallas_sweep as psw
from fibergen_tpu.ops.pallas_sweep import pick_bx, _roll, _EPS_PLANES
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
assert jax.default_backend() in ("tpu", "axon")

n = 256
grid = Grid(n, n, n)
u = jax.random.normal(jax.random.key(0), (3, n, n, n), jnp.float32)
p = jax.random.normal(jax.random.key(1), (6, n, n, n), jnp.float32)
E = jnp.asarray([0.1, 0, 0.2, 0, 0, 0.05], jnp.float32)


def eps_variant(grid, E, u, p, *, stencil=True, dot=True, kahan=True,
                rolls=True):
    nx, ny, nz = u.shape[-3:]
    bx = pick_bx((nx, ny, nz), *_EPS_PLANES)
    nb = nx // bx
    dt = u.dtype
    hx = float(grid.nx / grid.dx); hy = float(grid.ny / grid.dy)
    hz = float(grid.nz / grid.dz)
    wv = (1.0, 1.0, 1.0, 2.0, 2.0, 2.0)

    def kernel(u_hbm, p_hbm, e_ref, w_hbm, dot_ref,
               uwin, pwin, outb, acc, comp, isem, psem, osem):
        Ev = [e_ref[ci, 0] for ci in range(6)]

        def in_copies(i, s):
            return (
                pltpu.make_async_copy(u_hbm.at[:, pl.ds(i * bx, bx)],
                                      uwin.at[s, :, 2:bx + 2], isem.at[s, 0]),
                pltpu.make_async_copy(p_hbm.at[:, pl.ds(i * bx, bx)],
                                      pwin.at[s, :, 1:bx + 1], isem.at[s, 1]),
            )

        def w_copy(i, s):
            return pltpu.make_async_copy(
                outb.at[s], w_hbm.at[:, pl.ds(i * bx - 1, bx)], osem.at[s, 0])

        def w_wrap_copy(s):
            return pltpu.make_async_copy(
                outb.at[s, :, 0:1], w_hbm.at[:, pl.ds(nx - 1, 1)],
                osem.at[s, 1])

        def w_rest_copy(s):
            return pltpu.make_async_copy(
                outb.at[s, :, 1:bx], w_hbm.at[:, pl.ds(0, bx - 1)],
                osem.at[s, 0])

        c1 = pltpu.make_async_copy(u_hbm.at[:, pl.ds(nx - 2, 2)],
                                   uwin.at[0, :, 0:2], psem.at[0])
        c2 = pltpu.make_async_copy(p_hbm.at[:, pl.ds(nx - 1, 1)],
                                   pwin.at[0, :, 0:1], psem.at[1])
        c1.start(); c2.start()
        for cp in in_copies(0, 0):
            cp.start()
        c1.wait(); c2.wait()
        acc[...] = jnp.zeros((ny, nz), dt)
        comp[...] = jnp.zeros((ny, nz), dt)

        def body(i, _):
            s = i % 2
            for cp in in_copies(i, s):
                cp.wait()

            @pl.when(i > 0)
            def _():
                uwin[s, :, 0:2] = uwin[1 - s, :, bx:bx + 2]
                pwin[s, :, 0:1] = pwin[1 - s, :, bx:bx + 1]

            @pl.when(i + 1 < nb)
            def _():
                for cp in in_copies(i + 1, 1 - s):
                    cp.start()

            um = uwin[s, :, 0:bx]
            uc = uwin[s, :, 1:bx + 1]
            uq = uwin[s, :, 2:bx + 2]
            pc = pwin[s, :, 0:bx]
            if stencil:
                if rolls:
                    dyp = lambda a: (_roll(a, -1, 1) - a) * hy
                    dym = lambda a: (a - _roll(a, 1, 1)) * hy
                    dzp = lambda a: (_roll(a, -1, 2) - a) * hz
                    dzm = lambda a: (a - _roll(a, 1, 2)) * hz
                else:
                    dyp = dym = lambda a: a * hy
                    dzp = dzm = lambda a: a * hz
                ws = (
                    Ev[0] + (uq[0] - uc[0]) * hx,
                    Ev[1] + dyp(uc[1]),
                    Ev[2] + dzp(uc[2]),
                    Ev[3] + 0.5 * (dym(uc[2]) + dzm(uc[1])),
                    Ev[4] + 0.5 * ((uc[2] - um[2]) * hx + dzm(uc[0])),
                    Ev[5] + 0.5 * ((uc[1] - um[1]) * hx + dym(uc[0])),
                )
            else:
                ws = tuple(pc[ci] for ci in range(6))

            if dot:
                contrib = sum(
                    (wv[ci] * pc[ci] * (pc[ci] - ws[ci])).sum(axis=0)
                    for ci in range(6))
                if kahan:
                    y = contrib - comp[...]
                    t = acc[...] + y
                    comp[...] = (t - acc[...]) - y
                    acc[...] = t
                else:
                    acc[...] = acc[...] + contrib

            @pl.when(i == 2)
            def _():
                w_wrap_copy(s).wait()
                if bx > 1:
                    w_rest_copy(s).wait()

            @pl.when(i > 2)
            def _():
                w_copy(i, s).wait()

            for ci in range(6):
                outb[s, ci] = ws[ci]

            @pl.when(i == 0)
            def _():
                w_wrap_copy(s).start()
                if bx > 1:
                    w_rest_copy(s).start()

            @pl.when(i > 0)
            def _():
                w_copy(i, s).start()
            return 0

        jax.lax.fori_loop(0, nb, body, 0, unroll=False)
        for back in (2, 1):
            i = nb - back
            s = i % 2
            w_copy(i, s).wait()
        dot_ref[0, 0] = (acc[...] - comp[...]).sum()

    w, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((6, nx, ny, nz), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((6, 1), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + 2, ny, nz), dt),
            pltpu.VMEM((2, 6, bx + 1, ny, nz), dt),
            pltpu.VMEM((2, 6, bx, ny, nz), dt),
            pltpu.VMEM((ny, nz), dt),
            pltpu.VMEM((ny, nz), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=92 * 1024 * 1024),
    )(u, p, jnp.asarray(E, dt).reshape(6, 1))
    return w, d[0, 0]


N = 20
def bench(name, fn):
    @jax.jit
    def loop(u, p):
        def body(c, _):
            w, d = fn(grid, E, u, c)
            return w, d
        c, o = lax.scan(body, p, None, length=N)
        return o.sum()
    float(loop(u, p))
    t0 = time.perf_counter(); float(loop(u, p)); dt = (time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)

bench("full (prod kernel)   ", psw.eps_from_u_dot_sweep)
bench("full (variant copy)  ", lambda g, E, u, p: eps_variant(g, E, u, p))
bench("no dot               ", lambda g, E, u, p: eps_variant(g, E, u, p, dot=False))
bench("dot no kahan         ", lambda g, E, u, p: eps_variant(g, E, u, p, kahan=False))
bench("no stencil (copy w=p)", lambda g, E, u, p: eps_variant(g, E, u, p, stencil=False))
bench("stencil no rolls     ", lambda g, E, u, p: eps_variant(g, E, u, p, rolls=False))
bench("dma only             ", lambda g, E, u, p: eps_variant(g, E, u, p, stencil=False, dot=False))
