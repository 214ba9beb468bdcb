"""Prototype v2: Pallas-fused spectral middle, block-variable form.

Improvements over bench_pallas_middle.py's radix-2 kernel:
  * even/odd DIF blocks stay SEPARATE VARIABLES through all four stages
    (no jnp.concatenate copies in VMEM); the final recombination stores
    slice-wise into the output ref;
  * optional kz-blocking (B slabs per grid step) to amortize per-step
    overhead, merging (B, C, X) into one big matmul M for the last-axis
    stages;
  * optional Karatsuba 3m complex product (25% fewer MXU FLOPs; the
    operand add is cheap in VMEM; C+S matrices precomputed host-side).

Run on the real TPU: python scripts/bench_pallas_middle2.py [n]
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
        # (Ce, Se, Ce+Se, Co, So, Co+So)
        CeC, CeS, CoC, CoS = mats
        return tuple(jnp.asarray(a, jnp.float32)
                     for a in (CeC, CeS, CeC + CeS, CoC, CoS, CoC + CoS))

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

    def make_middle(B, m3, merge):
        my_f = difmats(ny, -1, True)    # (y, k) halves: e 3 mats, o 3 mats
        mx_f = difmats(nx, -1, False)   # (k, x)
        mx_i = difmats(nx, +1, False)   # (x, k)
        my_i = difmats(ny, +1, True)    # (k, y)
        mats = (*my_f, *mx_f, *mx_i, *my_i)

        def kernel(re_ref, im_ref, *rest):
            mrefs = rest[:len(mats)]
            ore_ref, oim_ref = rest[len(mats):]
            m = [r[...] for r in mrefs]
            ye = m[0:3]; yo = m[3:6]
            xe = m[6:9]; xo = m[9:12]
            xei = m[12:15]; xoi = m[15:18]
            yei = m[18:21]; yoi = m[21:24]

            def s1(vr, vi):
                # contract Y (last): -> even/odd KY blocks (X, hy)
                ar, br = vr[:, :hy], vr[:, hy:]
                ai, bi = vi[:, :hy], vi[:, hy:]
                E = cdot_last(ar + br, ai + bi, *ye, m3)
                O = cdot_last(ar - br, ai - bi, *yo, m3)
                return E, O

            def s2(V):
                # contract X (first): -> even/odd KX blocks (hx, hy)
                vr, vi = V
                ar, br = vr[:hx], vr[hx:]
                ai, bi = vi[:hx], vi[hx:]
                E = cdot_first(*xe, ar + br, ai + bi, m3)
                O = cdot_first(*xo, ar - br, ai - bi, m3)
                return E, O

            def s3(Ve, Vo):
                # inverse over KX blocks -> spatial X halves
                pr, pi = cdot_first(*xei, Ve[0], Ve[1], m3)
                tr, ti = cdot_first(*xoi, Vo[0], Vo[1], m3)
                return (pr + tr, pi + ti), (pr - tr, pi - ti)

            def s4(Ve, Vo):
                # inverse over KY blocks -> spatial Y halves
                pr, pi = cdot_last(Ve[0], Ve[1], *yei, m3)
                tr, ti = cdot_last(Vo[0], Vo[1], *yoi, m3)
                return (pr + tr, pi + ti), (pr - tr, pi - ti)

            if merge:
                # one big dot for S1/S4 by folding (B, C, X) into M
                vr = re_ref[...].reshape(B * C * nx, ny)
                vi = im_ref[...].reshape(B * C * nx, ny)
                (Er, Ei), (Or, Oi) = s1(vr, vi)
                E = (Er.reshape(B * C, nx, hy), Ei.reshape(B * C, nx, hy))
                O = (Or.reshape(B * C, nx, hy), Oi.reshape(B * C, nx, hy))
                outs = []
                for bc in range(B * C):
                    Eb = (E[0][bc], E[1][bc])
                    Ob = (O[0][bc], O[1][bc])
                    Gee, Goe = s2(Eb)
                    Geo, Goo = s2(Ob)
                    # identity apply
                    XloE, XhiE = s3(Gee, Goe)
                    XloO, XhiO = s3(Geo, Goo)
                    outs.append((XloE, XloO, XhiE, XhiO))
                lo_e = (jnp.stack([o[0][0] for o in outs]),
                        jnp.stack([o[0][1] for o in outs]))
                lo_o = (jnp.stack([o[1][0] for o in outs]),
                        jnp.stack([o[1][1] for o in outs]))
                hi_e = (jnp.stack([o[2][0] for o in outs]),
                        jnp.stack([o[2][1] for o in outs]))
                hi_o = (jnp.stack([o[3][0] for o in outs]),
                        jnp.stack([o[3][1] for o in outs]))

                def fold(V):
                    return (V[0].reshape(B * C * hx, hy),
                            V[1].reshape(B * C * hx, hy))
                (plr, pli), (qlr, qli) = s4(fold(lo_e), fold(lo_o))
                (phr, phi), (qhr, qhi) = s4(fold(hi_e), fold(hi_o))
                ore = jnp.concatenate([
                    jnp.concatenate([plr.reshape(B, C, hx, hy),
                                     qlr.reshape(B, C, hx, hy)], axis=-1),
                    jnp.concatenate([phr.reshape(B, C, hx, hy),
                                     qhr.reshape(B, C, hx, hy)], axis=-1),
                ], axis=-2)
                oim = jnp.concatenate([
                    jnp.concatenate([pli.reshape(B, C, hx, hy),
                                     qli.reshape(B, C, hx, hy)], axis=-1),
                    jnp.concatenate([phi.reshape(B, C, hx, hy),
                                     qhi.reshape(B, C, hx, hy)], axis=-1),
                ], axis=-2)
                ore_ref[...] = ore
                oim_ref[...] = oim
            else:
                for b in range(B):
                    for c in range(C):
                        vr = re_ref[b, c]
                        vi = im_ref[b, c]
                        E, O = s1(vr, vi)
                        Gee, Goe = s2(E)
                        Geo, Goo = s2(O)
                        # identity apply would act on G** here
                        XloE, XhiE = s3(Gee, Goe)
                        XloO, XhiO = s3(Geo, Goo)
                        (lr, li), (mr, mi) = s4(XloE, XloO)
                        ore_ref[b, c, :hx, :hy] = lr
                        oim_ref[b, c, :hx, :hy] = li
                        ore_ref[b, c, :hx, hy:] = mr
                        oim_ref[b, c, :hx, hy:] = mi
                        (lr, li), (mr, mi) = s4(XhiE, XhiO)
                        ore_ref[b, c, hx:, :hy] = lr
                        oim_ref[b, c, hx:, :hy] = li
                        ore_ref[b, c, hx:, hy:] = mr
                        oim_ref[b, c, hx:, hy:] = mi

        spec = pl.BlockSpec((B, C, nx, ny), lambda k: (k, 0, 0, 0))
        mspecs = [pl.BlockSpec(m.shape, lambda k: (0,) * m.ndim)
                  for m in mats]
        f = pl.pallas_call(
            kernel,
            grid=(kz // B,),
            in_specs=[spec, spec, *mspecs],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((kz, C, nx, ny), jnp.float32),
                       jax.ShapeDtypeStruct((kz, C, nx, ny), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
        )
        return lambda re, im: f(re, im, *mats)

    def make_chain(B, m3, merge):
        mid = make_middle(B, m3, merge)

        @jax.jit
        def chain(v):
            re, im = z_fwd(v)
            re, im = mid(re, im)
            return z_inv(re, im)
        return chain

    def bench(name, fn):
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
        err = float(jnp.abs(y - x).max()) / float(jnp.abs(x).max())
        print(f"{name}: {dt:.2f} ms/chain (roundtrip rel-err {err:.2e})",
              flush=True)

    fftmod.FFT_BACKEND = "matmul"
    fftmod.MM_DIF = "off"
    bench("XLA chain (current)      ", chain_xla)
    bench("blockvar B=1 4m          ", make_chain(1, False, False))
    bench("blockvar B=3 4m          ", make_chain(3, False, False))
    bench("blockvar B=3 3m          ", make_chain(3, True, False))
    bench("blockvar B=3 4m merged   ", make_chain(3, False, True))
    bench("blockvar B=3 3m merged   ", make_chain(3, True, True))
    fftmod.FFT_BACKEND = "auto"


if __name__ == "__main__":
    main()
