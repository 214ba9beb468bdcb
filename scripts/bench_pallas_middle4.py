"""Prototype v4: stacked z-stages for the Pallas spectral middle.

v3 keeps re/im as separate arrays: the forward z-stage is two dots each
reading the full input, and the inverse is two dots plus a full-field
subtract pass.  Stacking re/im on a leading axis of size 2 makes each
z-stage ONE dot — the forward reads the input once, and the inverse's
subtract folds INTO the dot (contract over (kz, part) with the matrix
[Cr, -Sr]).  The middle kernel reads/writes the (KZ, 2, C, X, Y) layout.

Run on the real TPU: python scripts/bench_pallas_middle4.py [n]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    C = 3
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fibergen_tpu.ops import fft as fftmod
    from fibergen_tpu.ops import pallas_chain as pc

    print("backend:", jax.default_backend())
    P = lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, n, n, n)).astype(np.float32))
    nx = ny = nz = n
    kz = nz // 2 + 1
    hx, hy = nx // 2, ny // 2

    # current production path (separate re/im z-stages + middle)
    ident = lambda G, xs, ys, zs, ec: G

    from fibergen_tpu.core.grid import Grid
    _grid = Grid(nx, ny, nz)

    @jax.jit
    def chain_v3(v):
        re, im = pc._z_fwd(v)
        xc, yc, zc = pc._staggered_consts(_grid, v.dtype)
        re, im = pc._middle(re, im, xc, yc, zc, ident, False)
        return pc._z_inv(re, im, nz)

    # ---------------- stacked variant
    Cz, Sz = fftmod._r2c_mats(nz)
    Cr, Sr = fftmod._c2r_mats(nz)
    scale = 1.0 / (nx * ny * nz)
    Mf = jnp.asarray(np.stack([Cz * scale, Sz * scale], axis=1),
                     jnp.float32)                      # (kz, 2, z)
    Mi = jnp.asarray(np.stack([Cr, -Sr], axis=-1),
                     jnp.float32)                      # (z, kz, 2)

    def z_fwd_stacked(v):
        return jnp.einsum("kpz,cxyz->kpcxy", Mf, v, precision=P)

    def z_inv_stacked(w):
        return jnp.einsum("kpcxy,zkp->cxyz", w, Mi, precision=P)

    def make_middle_stacked():
        dt = jnp.float32
        ye = pc._difmats3(ny, -1, True, dt)
        yo = ye[3:]; ye = ye[:3]
        xe = pc._difmats3(nx, -1, False, dt)
        xo = xe[3:]; xe = xe[:3]
        xei = pc._difmats3(nx, +1, False, dt)
        xoi = xei[3:]; xei = xei[:3]
        yei = pc._difmats3(ny, +1, True, dt)
        yoi = yei[3:]; yei = yei[:3]
        mats = (*ye, *yo, *xe, *xo, *xei, *xoi, *yei, *yoi)

        def kernel(w_ref, *rest):
            mrefs = rest[:len(mats)]
            (ow_ref,) = rest[len(mats):]
            m = [r[...] for r in mrefs]
            k_ye, k_yo = m[0:3], m[3:6]
            k_xe, k_xo = m[6:9], m[9:12]
            k_xei, k_xoi = m[12:15], m[15:18]
            k_yei, k_yoi = m[18:21], m[21:24]
            for c in range(C):
                vr = w_ref[0, 0, c]
                vi = w_ref[0, 1, c]
                ur, ui = vr[:, :hy] + vr[:, hy:], vi[:, :hy] + vi[:, hy:]
                wr, wi = vr[:, :hy] - vr[:, hy:], vi[:, :hy] - vi[:, hy:]
                Er, Ei = pc._c3m_last(ur, ui, k_ye)
                Or, Oi = pc._c3m_last(wr, wi, k_yo)
                W1r = jnp.concatenate([Er, Or], axis=-1)
                W1i = jnp.concatenate([Ei, Oi], axis=-1)
                u2r, u2i = W1r[:hx] + W1r[hx:], W1i[:hx] + W1i[hx:]
                w2r, w2i = W1r[:hx] - W1r[hx:], W1i[:hx] - W1i[hx:]
                Ger, Gei = pc._c3m_first(k_xe, u2r, u2i)
                Gor, Goi = pc._c3m_first(k_xo, w2r, w2i)
                # identity apply
                pr, pi = pc._c3m_first(k_xei, Ger, Gei)
                tr, ti = pc._c3m_first(k_xoi, Gor, Goi)
                W3r = jnp.concatenate([pr + tr, pr - tr], axis=0)
                W3i = jnp.concatenate([pi + ti, pi - ti], axis=0)
                pr, pi = pc._c3m_last(W3r[:, :hy], W3i[:, :hy], k_yei)
                tr, ti = pc._c3m_last(W3r[:, hy:], W3i[:, hy:], k_yoi)
                ow_ref[0, 0, c, :, :hy] = pr + tr
                ow_ref[0, 1, c, :, :hy] = pi + ti
                ow_ref[0, 0, c, :, hy:] = pr - tr
                ow_ref[0, 1, c, :, hy:] = pi - ti

        spec = pl.BlockSpec((1, 2, C, nx, ny), lambda k: (k, 0, 0, 0, 0))

        def full(a):
            return pl.BlockSpec(a.shape, lambda k, _nd=a.ndim: (0,) * _nd)

        f = pl.pallas_call(
            kernel,
            grid=(kz,),
            in_specs=[spec, *[full(a) for a in mats]],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((kz, 2, C, nx, ny), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=118 * 1024 * 1024),
        )
        return lambda w: f(w, *mats)

    mid_stacked = make_middle_stacked()

    @jax.jit
    def chain_v4(v):
        return z_inv_stacked(mid_stacked(z_fwd_stacked(v)))

    @jax.jit
    def chain_v4_zonly(v):
        return z_inv_stacked(z_fwd_stacked(v))

    def bench(name, fn, check=True):
        @jax.jit
        def many(v):
            def body(c, _):
                return fn(c), 0.0
            out, _ = lax.scan(body, v, None, length=10)
            return out
        y = many(x)
        _ = float(jnp.sum(y))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            y = many(y)
            _ = float(jnp.sum(y))
        dt = (time.perf_counter() - t0) / (reps * 10) * 1e3
        msg = f"{name}: {dt:.2f} ms/chain"
        if check:
            err = float(jnp.abs(y - x).max()) / float(jnp.abs(x).max())
            msg += f" (roundtrip rel-err {err:.2e})"
        print(msg, flush=True)

    fftmod.FFT_BACKEND = "matmul"
    bench("v3 (production)        ", chain_v3)
    bench("v4 stacked z, no middle", chain_v4_zonly, check=False)
    bench("v4 stacked z + middle  ", chain_v4)
    fftmod.FFT_BACKEND = "auto"


if __name__ == "__main__":
    main()
