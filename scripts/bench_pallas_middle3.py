"""Prototype v3: dot-granularity study for the Pallas spectral middle.

Variants (all B=1, block-variable, no HBM concats):
  * z-only: XLA z-stages with a passthrough Pallas copy kernel (floor).
  * rxy: radix-2 on both axes, ky-blocks merged into full-width operands
    so the x-stage dots are (128,128)@(128,256) and the y-stage dots
    (256,128)@(128,128) — 32 real dots/slab/comp instead of 56.
  * ry: radix-2 on y only — x-stages are FULL (256,256) matmuls
    (24 dots/slab/comp, 1.5x the FLOPs of rxy).
  * each also in 3m (Karatsuba) form.

Run on the real TPU: python scripts/bench_pallas_middle3.py [n]
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

    print("backend:", jax.default_backend())
    P = lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, n, n, n)).astype(np.float32))
    nx = ny = nz = n
    kz = nz // 2 + 1
    hx, hy = nx // 2, ny // 2

    @jax.jit
    def chain_xla(v):
        return fftmod.fftn_apply_ifftn_mm(v, lambda re, im: (re, im))

    Cz, Sz = fftmod._r2c_mats(nz)
    Cr, Sr = fftmod._c2r_mats(nz)
    scale = 1.0 / (nx * ny * nz)

    def z_fwd(v):
        dt = v.dtype
        re = jnp.einsum("kz,cxyz->kcxy", jnp.asarray(Cz * scale, dt), v,
                        precision=P)
        im = jnp.einsum("kz,cxyz->kcxy", jnp.asarray(Sz * scale, dt), v,
                        precision=P)
        return re, im

    def z_inv(re, im):
        dt = re.dtype
        return (jnp.einsum("kcxy,zk->cxyz", re, jnp.asarray(Cr, dt),
                           precision=P)
                - jnp.einsum("kcxy,zk->cxyz", im, jnp.asarray(Sr, dt),
                             precision=P))

    def difmats(m, sign, transpose):
        mats = fftmod._dif_mats(m, sign)
        if transpose:
            mats = tuple(a.T for a in mats)
        CeC, CeS, CoC, CoS = mats
        return tuple(jnp.asarray(a, jnp.float32)
                     for a in (CeC, CeS, CeC + CeS, CoC, CoS, CoC + CoS))

    def cmats(m, sign, transpose):
        Cm, Sm = fftmod._c2c_mats(m, sign)
        if transpose:
            Cm, Sm = Cm.T, Sm.T
        return (jnp.asarray(Cm, jnp.float32), jnp.asarray(Sm, jnp.float32),
                jnp.asarray(Cm + Sm, jnp.float32))

    dot = functools.partial(jnp.dot, precision=P,
                            preferred_element_type=jnp.float32)

    def cdot_last(vr, vi, Ct, St, CSt, m3):
        if m3:
            m1 = dot(vr, Ct)
            m2 = dot(vi, St)
            mm = dot(vr + vi, CSt)
            return m1 - m2, mm - m1 - m2
        return dot(vr, Ct) - dot(vi, St), dot(vr, St) + dot(vi, Ct)

    def cdot_first(Cm, Sm, CSm, vr, vi, m3):
        if m3:
            m1 = dot(Cm, vr)
            m2 = dot(Sm, vi)
            mm = dot(CSm, vr + vi)
            return m1 - m2, mm - m1 - m2
        return dot(Cm, vr) - dot(Sm, vi), dot(Cm, vi) + dot(Sm, vr)

    def make_middle(variant, m3):
        my_f = difmats(ny, -1, True)
        my_i = difmats(ny, +1, True)
        if variant == "rxy":
            mx_f = difmats(nx, -1, False)
            mx_i = difmats(nx, +1, False)
        else:  # "ry": full-size x mats
            mx_f = cmats(nx, -1, False)
            mx_i = cmats(nx, +1, False)
        if variant == "zonly":
            mats = ()
        else:
            mats = (*my_f, *mx_f, *mx_i, *my_i)

        def kernel(re_ref, im_ref, *rest):
            mrefs = rest[:len(mats)]
            ore_ref, oim_ref = rest[len(mats):]
            if variant == "zonly":
                ore_ref[...] = re_ref[...]
                oim_ref[...] = im_ref[...]
                return
            m = [r[...] for r in mrefs]
            ye, yo = m[0:3], m[3:6]
            if variant == "rxy":
                xe, xo = m[6:9], m[9:12]
                xei, xoi = m[12:15], m[15:18]
                yei, yoi = m[18:21], m[21:24]
            else:
                xf, xi_ = m[6:9], m[9:12]
                yei, yoi = m[12:15], m[15:18]

            for c in range(C):
                vr = re_ref[0, c]
                vi = im_ref[0, c]
                # S1: contract Y -> W1 = [E | O] along cols, via 2 cplx dots
                ur, ui = (vr[:, :hy] + vr[:, hy:], vi[:, :hy] + vi[:, hy:])
                wr, wi = (vr[:, :hy] - vr[:, hy:], vi[:, :hy] - vi[:, hy:])
                Er, Ei = cdot_last(ur, ui, *ye, m3)
                Or, Oi = cdot_last(wr, wi, *yo, m3)
                W1r = jnp.concatenate([Er, Or], axis=-1)   # (nx, ny)
                W1i = jnp.concatenate([Ei, Oi], axis=-1)
                if variant == "rxy":
                    # S2: contract X, radix: full-width RHS
                    u2r, u2i = W1r[:hx] + W1r[hx:], W1i[:hx] + W1i[hx:]
                    w2r, w2i = W1r[:hx] - W1r[hx:], W1i[:hx] - W1i[hx:]
                    Ger, Gei = cdot_first(*xe, u2r, u2i, m3)  # (hx, ny)
                    Gor, Goi = cdot_first(*xo, w2r, w2i, m3)
                    # identity apply on (Ge, Go)
                    # S3: inverse over KX blocks
                    pr, pi = cdot_first(*xei, Ger, Gei, m3)
                    tr, ti = cdot_first(*xoi, Gor, Goi, m3)
                    Xlor, Xloi = pr + tr, pi + ti            # (hx, ny)
                    Xhir, Xhii = pr - tr, pi - ti
                    W3r = jnp.concatenate([Xlor, Xhir], axis=0)  # (nx, ny)
                    W3i = jnp.concatenate([Xloi, Xhii], axis=0)
                else:
                    # S2/S3: full-size x matmuls
                    Gr, Gi = cdot_first(*xf, W1r, W1i, m3)   # (nx, ny)
                    # identity apply
                    W3r, W3i = cdot_first(*xi_, Gr, Gi, m3)
                # S4: contract KY blocks -> spatial Y
                pr, pi = cdot_last(W3r[:, :hy], W3i[:, :hy], *yei, m3)
                tr, ti = cdot_last(W3r[:, hy:], W3i[:, hy:], *yoi, m3)
                ore_ref[0, c, :, :hy] = pr + tr
                oim_ref[0, c, :, :hy] = pi + ti
                ore_ref[0, c, :, hy:] = pr - tr
                oim_ref[0, c, :, hy:] = pi - ti

        spec = pl.BlockSpec((1, C, nx, ny), lambda k: (k, 0, 0, 0))
        mspecs = [pl.BlockSpec(m.shape, lambda k: (0,) * m.ndim)
                  for m in mats]
        f = pl.pallas_call(
            kernel,
            grid=(kz,),
            in_specs=[spec, spec, *mspecs],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((kz, C, nx, ny), jnp.float32),
                       jax.ShapeDtypeStruct((kz, C, nx, ny), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
        )
        return lambda re, im: f(re, im, *mats)

    def make_chain(variant, m3):
        mid = make_middle(variant, m3)

        @jax.jit
        def chain(v):
            re, im = z_fwd(v)
            re, im = mid(re, im)
            return z_inv(re, im)
        return chain

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
    fftmod.MM_DIF = "off"
    bench("XLA chain (current) ", chain_xla)
    bench("z-stages + copy mid ", make_chain("zonly", False), check=False)
    bench("rxy merged 4m       ", make_chain("rxy", False))
    bench("rxy merged 3m       ", make_chain("rxy", True))
    bench("ry (full-x) 4m      ", make_chain("ry", False))
    bench("ry (full-x) 3m      ", make_chain("ry", True))
    fftmod.FFT_BACKEND = "auto"


if __name__ == "__main__":
    main()
