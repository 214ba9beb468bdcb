"""Prototype: Pallas-fused spectral middle for the matmul-DFT chain.

The fused chain (fft.fftn_apply_ifftn_mm) runs 6 XLA einsum stages; the 4
c2c stages (y/x forward, x/y inverse) plus the elementwise apply account
for ~3/4 of its time and all of its intermediate HBM traffic.  This
prototype keeps the z r2c/c2r stages in XLA (natural (KZ, C, X, Y) layout)
and fuses the middle into ONE Pallas kernel gridded over KZ: per kz-slab,
each component's (X, Y) plane goes through four plain 2-D MXU matmuls —
optionally with an in-VMEM radix-2 DIF split (half the MXU FLOPs at full
128-lane tile utilization; the [even|odd] block concats are free in VMEM,
unlike the XLA DIF variant where they cost HBM round trips, see
ops/fft.py MM_DIF notes).

Run on the real TPU: python scripts/bench_pallas_middle.py [n]
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

    # ---------------- reference: current XLA chain (identity apply)
    @jax.jit
    def chain_xla(v):
        return fftmod.fftn_apply_ifftn_mm(v, lambda re, im: (re, im))

    # ---------------- z-stages in (KZ, C, X, Y) layout
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

    # ---------------- Pallas middle kernels
    def cmats(m, sign, transpose):
        Cm, Sm = fftmod._c2c_mats(m, sign)
        if transpose:
            Cm, Sm = Cm.T, Sm.T
        return (jnp.asarray(Cm, jnp.float32), jnp.asarray(Sm, jnp.float32))

    def difmats(m, sign, transpose):
        CeC, CeS, CoC, CoS = fftmod._dif_mats(m, sign)
        if transpose:
            CeC, CeS, CoC, CoS = CeC.T, CeS.T, CoC.T, CoS.T
        return tuple(jnp.asarray(a, jnp.float32)
                     for a in (CeC, CeS, CoC, CoS))

    dot = functools.partial(jnp.dot, precision=P,
                            preferred_element_type=jnp.float32)

    def cdot_last(vr, vi, Ct, St):
        """(vr + i vi) @ (Ct + i St), contracting the LAST axis (4m)."""
        return dot(vr, Ct) - dot(vi, St), dot(vr, St) + dot(vi, Ct)

    def cdot_first(Cm, Sm, vr, vi):
        """(Cm + i Sm) @ (vr + i vi), contracting the FIRST axis of v."""
        return dot(Cm, vr) - dot(Sm, vi), dot(Cm, vi) + dot(Sm, vr)

    def dif_last(vr, vi, mats):
        """Forward DIF stage contracting the last axis -> block bin order."""
        CeC, CeS, CoC, CoS = mats
        h = vr.shape[-1] // 2
        ar, br = vr[:, :h], vr[:, h:]
        ai, bi = vi[:, :h], vi[:, h:]
        er, ei = cdot_last(ar + br, ai + bi, CeC, CeS)
        orr, oi = cdot_last(ar - br, ai - bi, CoC, CoS)
        return (jnp.concatenate([er, orr], axis=-1),
                jnp.concatenate([ei, oi], axis=-1))

    def dif_first(mats, vr, vi):
        """Forward DIF stage contracting the first axis."""
        CeC, CeS, CoC, CoS = mats
        h = vr.shape[0] // 2
        ar, br = vr[:h], vr[h:]
        ai, bi = vi[:h], vi[h:]
        er, ei = cdot_first(CeC, CeS, ar + br, ai + bi)
        orr, oi = cdot_first(CoC, CoS, ar - br, ai - bi)
        return (jnp.concatenate([er, orr], axis=0),
                jnp.concatenate([ei, oi], axis=0))

    def dif_inv_first(mats, vr, vi):
        """Inverse DIF stage: input [even|odd] blocks along axis 0,
        output natural spatial order along axis 0."""
        CeC, CeS, CoC, CoS = mats
        h = vr.shape[0] // 2
        ar, br = vr[:h], vr[h:]
        ai, bi = vi[:h], vi[h:]
        pr, pi = cdot_first(CeC, CeS, ar, ai)
        tr, ti = cdot_first(CoC, CoS, br, bi)
        return (jnp.concatenate([pr + tr, pr - tr], axis=0),
                jnp.concatenate([pi + ti, pi - ti], axis=0))

    def dif_inv_last(vr, vi, mats):
        CeC, CeS, CoC, CoS = mats
        h = vr.shape[-1] // 2
        ar, br = vr[:, :h], vr[:, h:]
        ai, bi = vi[:, :h], vi[:, h:]
        pr, pi = cdot_last(ar, ai, CeC, CeS)
        tr, ti = cdot_last(br, bi, CoC, CoS)
        return (jnp.concatenate([pr + tr, pr - tr], axis=-1),
                jnp.concatenate([pi + ti, pi - ti], axis=-1))

    def make_middle(radix2):
        if radix2:
            my_f = difmats(ny, -1, True)    # (y, k) halves
            mx_f = difmats(nx, -1, False)   # (k, x) halves
            mx_i = difmats(nx, +1, False)   # (x, k) halves
            my_i = difmats(ny, +1, True)    # (k, y) halves
        else:
            my_f = cmats(ny, -1, True)
            mx_f = cmats(nx, -1, False)
            mx_i = cmats(nx, +1, False)
            my_i = cmats(ny, +1, True)
        mats = (*my_f, *mx_f, *mx_i, *my_i)
        nm = len(my_f)

        def kernel(re_ref, im_ref, *rest):
            mat_refs = rest[:len(mats)]
            ore_ref, oim_ref = rest[len(mats):]
            m = [r[...] for r in mat_refs]
            kmy_f, kmx_f = m[:nm], m[nm:2 * nm]
            kmx_i, kmy_i = m[2 * nm:3 * nm], m[3 * nm:]
            for c in range(C):
                vr = re_ref[0, c]
                vi = im_ref[0, c]
                if radix2:
                    vr, vi = dif_last(vr, vi, kmy_f)       # (X, KYb)
                    vr, vi = dif_first(kmx_f, vr, vi)      # (KXb, KYb)
                    # identity apply
                    vr, vi = dif_inv_first(kmx_i, vr, vi)  # (X, KYb)
                    vr, vi = dif_inv_last(vr, vi, kmy_i)   # (X, Y)
                else:
                    vr, vi = cdot_last(vr, vi, *kmy_f)     # (X, KY)
                    vr, vi = cdot_first(*kmx_f, vr, vi)    # (KX, KY)
                    vr, vi = cdot_first(*kmx_i, vr, vi)    # (X, KY)
                    vr, vi = cdot_last(vr, vi, *kmy_i)     # (X, Y)
                ore_ref[0, c] = vr
                oim_ref[0, c] = vi

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
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return lambda re, im: f(re, im, *mats)

    def make_chain(radix2):
        mid = make_middle(radix2)

        @jax.jit
        def chain(v):
            re, im = z_fwd(v)
            re, im = mid(re, im)
            return z_inv(re, im)
        return chain

    # ---------------- timing harness
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
    bench("XLA chain (current)   ", chain_xla)
    bench("pallas middle 4m      ", make_chain(False))
    bench("pallas middle radix-2 ", make_chain(True))
    fftmod.FFT_BACKEND = "auto"


if __name__ == "__main__":
    main()
