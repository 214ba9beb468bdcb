"""Batched real-to-complex FFTs over tensor fields.

Replaces the reference's FFTW plan cache (FFT3, fibergen.cpp:7147-7289) with
``jnp.fft.rfftn`` using the *forward* normalization so that the DC bin of a
hat-field equals the spatial mean — the convention the reference's BC
projector relies on (fibergen.cpp:18486, 20220-20226).

Two device backends: XLA's FFT op, and an MXU matmul-DFT (per-axis O(N^2)
cosine/sine matmuls at HIGHEST precision) which is ~1.5x faster on TPU up
to ~384-point axes because XLA's TPU FFT makes many memory passes while the
DFT rides the systolic array in one pass per axis.  Multi-chip transforms
use the explicit slab decomposition in parallel/fft.py instead.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_AXES = (-3, -2, -1)

# FFT backend policy: "auto" uses the MXU matmul-DFT on TPU-class backends
# for axis sizes where the O(N^2) DFT beats XLA's FFT op (measured ~1.5x at
# 256 points and ~2x at 512: XLA's TPU FFT degrades faster than the DFT's
# quadratic FLOP growth); "xla" forces jnp.fft, "matmul" forces the DFT.
# CPU always uses XLA (pocketfft).
FFT_BACKEND = "auto"
_MM_MAX_AXIS = 512


def _mm_enabled(shape):
    if FFT_BACKEND == "xla":
        return False
    if FFT_BACKEND == "matmul":
        return True
    return (jax.default_backend() not in ("cpu",)
            and max(shape) <= _MM_MAX_AXIS and min(shape) >= 16)


# --------------------------------------------------------- matmul-DFT path
# DFT matrices are cached host-side per axis length and embedded as jit
# constants (a 256-point pair is 0.5 MB — negligible next to the fields).
_MM_CACHE = {}


def _mats(key, builder):
    m = _MM_CACHE.get(key)
    if m is None:
        m = _MM_CACHE[key] = builder()
    return m


def _c2c_mats(n, sign):
    def build():
        k = np.arange(n)[:, None] * np.arange(n)[None, :]
        ang = sign * 2.0 * np.pi * k / n
        return np.cos(ang), np.sin(ang)
    return _mats(("c2c", n, sign), build)


def _r2c_mats(n):
    def build():
        nzr = n // 2 + 1
        k = np.arange(nzr)[:, None] * np.arange(n)[None, :]
        ang = -2.0 * np.pi * k / n
        return np.cos(ang), np.sin(ang)
    return _mats(("r2c", n), build)


def _c2r_mats(n):
    def build():
        nzr = n // 2 + 1
        # x[j] = sum_k a_k (Re[k] cos(2 pi j k / n) - Im[k] sin(...)),
        # a_0 = 1, a_nyq = 1 (even n), else 2 (Hermitian half-spectrum)
        a = np.full(nzr, 2.0)
        a[0] = 1.0
        if n % 2 == 0:
            a[-1] = 1.0
        jk = np.arange(n)[:, None] * np.arange(nzr)[None, :]
        ang = 2.0 * np.pi * jk / n
        return np.cos(ang) * a, np.sin(ang) * a
    return _mats(("c2r", n), build)


_P = lax.Precision.HIGHEST

# Complex-stage algorithm for the c2c matmul-DFT stages: "4m" is the plain
# 4-real-matmul complex product; "3m" is the Karatsuba 3-matmul form
# (m1 = re@C, m2 = im@S, m3 = (re+im)@(C+S); rr = m1-m2, ii = m3-m1-m2),
# 25% fewer MXU FLOPs per c2c stage at the cost of one elementwise add of
# the operands and a ~2-4x larger (but still f32-tiny) roundoff from the
# m3-m1-m2 cancellation.  Overridable for experiments via
# FIBERGEN_TPU_MM_ALG; the default is set by TPU measurement (see PARITY).
MM_COMPLEX_ALG = "4m"


def _mm_alg():
    import os
    return os.environ.get("FIBERGEN_TPU_MM_ALG", MM_COMPLEX_ALG)


def _apply_last(re, im, C, S):
    """(re + i im) @ (C + i S)^T along the last axis."""
    if _mm_alg() == "3m":
        m1 = jnp.einsum("...z,kz->...k", re, C, precision=_P)
        m2 = jnp.einsum("...z,kz->...k", im, S, precision=_P)
        m3 = jnp.einsum("...z,kz->...k", re + im, C + S, precision=_P)
        return m1 - m2, m3 - m1 - m2
    rr = (jnp.einsum("...z,kz->...k", re, C, precision=_P)
          - jnp.einsum("...z,kz->...k", im, S, precision=_P))
    ii = (jnp.einsum("...z,kz->...k", re, S, precision=_P)
          + jnp.einsum("...z,kz->...k", im, C, precision=_P))
    return rr, ii


def _fftn_mm(x):
    """Forward R2C 3-D DFT by per-axis matmuls on the MXU; norm='forward'
    (total 1/N folded into the z-stage matrices at trace time)."""
    nx, ny, nz = x.shape[-3:]
    dt = x.dtype
    scale = 1.0 / (nx * ny * nz)
    Cz, Sz = _r2c_mats(nz)
    re = jnp.einsum("...z,kz->...k", x, jnp.asarray(Cz * scale, dt),
                    precision=_P)
    im = jnp.einsum("...z,kz->...k", x, jnp.asarray(Sz * scale, dt),
                    precision=_P)
    Cy, Sy = _c2c_mats(ny, -1)
    re, im = jnp.moveaxis(re, -2, -1), jnp.moveaxis(im, -2, -1)
    re, im = _apply_last(re, im, jnp.asarray(Cy, dt), jnp.asarray(Sy, dt))
    re, im = jnp.moveaxis(re, -1, -2), jnp.moveaxis(im, -1, -2)
    Cx, Sx = _c2c_mats(nx, -1)
    re, im = jnp.moveaxis(re, -3, -1), jnp.moveaxis(im, -3, -1)
    re, im = _apply_last(re, im, jnp.asarray(Cx, dt), jnp.asarray(Sx, dt))
    re, im = jnp.moveaxis(re, -1, -3), jnp.moveaxis(im, -1, -3)
    return lax.complex(re, im)


def _ifftn_mm(y, shape):
    """Inverse of :func:`_fftn_mm` (unscaled, norm='forward')."""
    nx, ny, nz = shape
    re, im = jnp.real(y), jnp.imag(y)
    dt = re.dtype
    Cx, Sx = _c2c_mats(nx, +1)
    re, im = jnp.moveaxis(re, -3, -1), jnp.moveaxis(im, -3, -1)
    re, im = _apply_last(re, im, jnp.asarray(Cx, dt), jnp.asarray(Sx, dt))
    re, im = jnp.moveaxis(re, -1, -3), jnp.moveaxis(im, -1, -3)
    Cy, Sy = _c2c_mats(ny, +1)
    re, im = jnp.moveaxis(re, -2, -1), jnp.moveaxis(im, -2, -1)
    re, im = _apply_last(re, im, jnp.asarray(Cy, dt), jnp.asarray(Sy, dt))
    re, im = jnp.moveaxis(re, -1, -2), jnp.moveaxis(im, -1, -2)
    Cr, Sr = _c2r_mats(nz)
    out = (jnp.einsum("...k,jk->...j", re, jnp.asarray(Cr, dt), precision=_P)
           - jnp.einsum("...k,jk->...j", im, jnp.asarray(Sr, dt),
                        precision=_P))
    return out


# ------------------------------------------------- local-stage mm helpers
# Used by the distributed slab FFT (parallel/fft.py) so that the per-device
# stages of the multi-chip transform ride the MXU exactly like the
# single-chip path, instead of falling back to XLA's slower TPU FFT op.

def rfft2_mm(x, full_shape):
    """R2C 2-D DFT over the last two axes by MXU matmuls, scaled by
    1/(nx*ny*nz) of the FULL grid (norm='forward' for the composed 3-D
    transform); ``full_shape`` is the global (nx, ny, nz)."""
    nx, ny, nz = full_shape
    dt = x.dtype
    scale = 1.0 / (nx * ny * nz)
    Cz, Sz = _r2c_mats(nz)
    re = jnp.einsum("...z,kz->...k", x, jnp.asarray(Cz * scale, dt),
                    precision=_P)
    im = jnp.einsum("...z,kz->...k", x, jnp.asarray(Sz * scale, dt),
                    precision=_P)
    Cy, Sy = _c2c_mats(ny, -1)
    re, im = jnp.moveaxis(re, -2, -1), jnp.moveaxis(im, -2, -1)
    re, im = _apply_last(re, im, jnp.asarray(Cy, dt), jnp.asarray(Sy, dt))
    re, im = jnp.moveaxis(re, -1, -2), jnp.moveaxis(im, -1, -2)
    return lax.complex(re, im)


def irfft2_mm(y, yz_shape):
    """Inverse of :func:`rfft2_mm` (unscaled); ``yz_shape`` = (ny, nz)."""
    ny, nz = yz_shape
    re, im = jnp.real(y), jnp.imag(y)
    dt = re.dtype
    Cy, Sy = _c2c_mats(ny, +1)
    re, im = jnp.moveaxis(re, -2, -1), jnp.moveaxis(im, -2, -1)
    re, im = _apply_last(re, im, jnp.asarray(Cy, dt), jnp.asarray(Sy, dt))
    re, im = jnp.moveaxis(re, -1, -2), jnp.moveaxis(im, -1, -2)
    Cr, Sr = _c2r_mats(nz)
    return (jnp.einsum("...k,jk->...j", re, jnp.asarray(Cr, dt), precision=_P)
            - jnp.einsum("...k,jk->...j", im, jnp.asarray(Sr, dt),
                         precision=_P))


def cfft_mm(y, axis, sign):
    """Unscaled C2C DFT along ``axis`` by MXU matmuls (sign=-1 forward,
    +1 inverse; the forward 1/n scale is composed into the slab FFT's 2-D
    stage by :func:`rfft2_mm`)."""
    n = y.shape[axis]
    C, S = _c2c_mats(n, sign)
    re, im = jnp.real(y), jnp.imag(y)
    dt = re.dtype
    re, im = jnp.moveaxis(re, axis, -1), jnp.moveaxis(im, axis, -1)
    re, im = _apply_last(re, im, jnp.asarray(C, dt), jnp.asarray(S, dt))
    return lax.complex(jnp.moveaxis(re, -1, axis), jnp.moveaxis(im, -1, axis))


def _apply_rot(re, im, spec, C, S, dt):
    """One complex DFT stage as real einsums, with the output axis order
    chosen to be dot_general's NATURAL ordering (batch + lhs free + rhs
    free) so XLA emits no transpose at all.  Two einsums per part ("4m"),
    or the Karatsuba 3-matmul form when MM_COMPLEX_ALG == "3m"."""
    C = jnp.asarray(C, dt)
    S = jnp.asarray(S, dt)
    if _mm_alg() == "3m":
        m1 = jnp.einsum(spec, re, C, precision=_P)
        m2 = jnp.einsum(spec, im, S, precision=_P)
        m3 = jnp.einsum(spec, re + im, C + S, precision=_P)
        return m1 - m2, m3 - m1 - m2
    rr = (jnp.einsum(spec, re, C, precision=_P)
          - jnp.einsum(spec, im, S, precision=_P))
    ii = (jnp.einsum(spec, re, S, precision=_P)
          + jnp.einsum(spec, im, C, precision=_P))
    return rr, ii


def _stage(re, im, spec, n, sign, dt):
    """One c2c chain stage as a single full-length matmul pair."""
    C, S = _c2c_mats(n, sign)
    return _apply_rot(re, im, spec, C, S, dt)


# ------------------------------------------------------- DIF radix-2 stages
# A radix-2 Cooley-Tukey DIT split (stride-2 even/odd INPUT slices + an
# explicit twiddle pass) was measured SLOWER at 256^3 on v5e (17.4 vs
# 12.6 ms per chain): strided slices and the output concatenate cost more
# HBM/layout traffic than the halved MXU FLOPs save.  The DIF
# (decimation-in-frequency) form below avoids both costs:
#   * the input splits into CONTIGUOUS halves a, b (free slices), combined
#     elementwise once: u = a+b feeds the even-bin DFT, w = a-b the odd-bin
#     DFT — XLA fuses the single a+-b pass with neighbouring elementwise
#     work between the dots;
#   * the radix twiddles FOLD INTO the half-size DFT matrices (the odd-bin
#     rows e^{-2 pi i (2m+1) j / n} ARE twiddle x half-DFT), so no separate
#     twiddle multiply exists;
#   * the output stays in [even-bins | odd-bins] BLOCK order — legal inside
#     fftn_apply_ifftn_mm because the spectral apply is elementwise: the
#     per-axis constant vectors are simply reordered with chain_perm(), and
#     the inverse stage consumes the block order directly, emitting natural
#     spatial order.
# Net effect: each c2c stage runs 2 half-size matmul pairs = HALF the MXU
# FLOPs at full systolic utilization (contraction n/2 >= 128 for n >= 256).
#
# MEASURED (v5e, 256^3, scripts/bench_dif_stage.py + bench_dif_chain.py):
# an ISOLATED DIF stage wins (3.29 vs 3.67 ms, and the concatenate is free
# when the consumer is elementwise), but in the CHAIN each concat feeds the
# next stage's MATMUL OPERANDS, which XLA must materialize — two extra
# full-field HBM round trips per stage boundary that overwhelm the matmul
# saving (chain 14.5 vs 13.0 ms; solve 42.6 vs 45.2 iter/s).  A
# block-structured chain (blocks kept separate through apply, no concats)
# models out to <= 1 ms net because the forward y-split add cannot fuse
# into the pure-dot z-stage and the final spatial assembly pays a pass —
# the same economics that made the Karatsuba 3m stage lose to 4m here.
# Default therefore OFF; the implementation, knob, and equivalence tests
# stay for future hardware where the FLOP:byte ratio shifts.

MM_DIF = "off"  # "auto" (on for even n >= 256) | "on" | "off"


def _dif_on(n):
    import os
    v = os.environ.get("FIBERGEN_TPU_MM_DIF", MM_DIF)
    if v == "off" or n % 2 != 0:
        return False
    if v == "on":
        return True
    return n >= 256


def chain_perm(n):
    """Frequency-bin ordering along a c2c axis of the fused 3-D chain, or
    None for natural order.  Builders of spectral constants consumed by
    fftn_apply_ifftn_mm's apply_fn MUST reorder their per-axis kx/ky
    vectors with this (the z half-spectrum axis is never reordered)."""
    if _dif_on(n):
        return np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])
    return None


def _dif_mats(n, sign):
    """Half-size DFT matrices for one DIF stage.  Forward (sign=-1) maps
    space j -> block bins [even m' | odd m'] (matrix [out=bin, in=j]);
    inverse (+1) maps block bins -> space (matrix [out=j, in=bin])."""
    def build():
        h = n // 2
        j = np.arange(h)
        me, mo = 2.0 * j, 2.0 * j + 1.0
        if sign < 0:
            ae = -2.0 * np.pi * np.outer(me, j) / n
            ao = -2.0 * np.pi * np.outer(mo, j) / n
        else:
            ae = 2.0 * np.pi * np.outer(j, me) / n
            ao = 2.0 * np.pi * np.outer(j, mo) / n
        return np.cos(ae), np.sin(ae), np.cos(ao), np.sin(ao)
    return _mats(("dif", n, sign), build)


def _stage_dif(re, im, spec, n, sign, dt, in_axis):
    """One DIF-split c2c chain stage (see the block comment above).
    ``in_axis`` is the position of the contracted axis in the INPUT layout;
    the output axis is always last (dot_general natural order)."""
    CeC, CeS, CoC, CoS = _dif_mats(n, sign)
    a_re, b_re = jnp.split(re, 2, axis=in_axis)
    a_im, b_im = jnp.split(im, 2, axis=in_axis)
    if sign < 0:
        e_re, e_im = _apply_rot(a_re + b_re, a_im + b_im, spec, CeC, CeS, dt)
        o_re, o_im = _apply_rot(a_re - b_re, a_im - b_im, spec, CoC, CoS, dt)
    else:
        # input halves are the even/odd bin blocks; p + t / p - t recombine
        # them into the two contiguous spatial halves
        p_re, p_im = _apply_rot(a_re, a_im, spec, CeC, CeS, dt)
        t_re, t_im = _apply_rot(b_re, b_im, spec, CoC, CoS, dt)
        e_re, e_im = p_re + t_re, p_im + t_im
        o_re, o_im = p_re - t_re, p_im - t_im
    return (jnp.concatenate([e_re, o_re], axis=-1),
            jnp.concatenate([e_im, o_im], axis=-1))


def _stage_auto(re, im, spec, n, sign, dt, in_axis):
    if _dif_on(n):
        return _stage_dif(re, im, spec, n, sign, dt, in_axis)
    return _stage(re, im, spec, n, sign, dt)


def fftn_apply_ifftn_mm(x, apply_fn):
    """ifftn(apply(fftn(x))) with every DFT stage an MXU matmul in a
    cyclically ROTATING layout: each einsum's output axis order is
    dot_general's natural order, so the whole chain — forward 3 stages,
    the elementwise spectral ``apply_fn``, inverse 3 stages — compiles to
    dots + fused elementwise with ZERO transpose/materialization between
    them (the separate fftn/ifftn path pays a moveaxis round trip per
    stage).  ``apply_fn(re, im)`` receives the half-spectrum parts in
    (..., KZ, KY, KX) layout and must be elementwise/broadcast; the KY and
    KX axes carry bins in ``chain_perm`` order (DIF block order when the
    radix-2 split is active), so per-axis constant vectors must be
    reordered accordingly — KZ is always natural rfft order."""
    nx, ny, nz = x.shape[-3:]
    dt = x.dtype
    scale = 1.0 / (nx * ny * nz)
    Cz, Sz = _r2c_mats(nz)
    # (..., X, Y, Z) -> (..., X, Y, KZ)
    re = jnp.einsum("...xyz,kz->...xyk", x, jnp.asarray(Cz * scale, dt),
                    precision=_P)
    im = jnp.einsum("...xyz,kz->...xyk", x, jnp.asarray(Sz * scale, dt),
                    precision=_P)
    # -> (..., X, KZ, KY)   (KY in chain_perm order under DIF)
    re, im = _stage_auto(re, im, "...xyk,jy->...xkj", ny, -1, dt, -2)
    # -> (..., KZ, KY, KX)   (KX in chain_perm order under DIF)
    re, im = _stage_auto(re, im, "...xkj,ix->...kji", nx, -1, dt, -3)

    re, im = apply_fn(re, im)

    # -> (..., KZ, KY, X)
    re, im = _stage_auto(re, im, "...kji,xi->...kjx", nx, +1, dt, -1)
    # -> (..., KZ, X, Y)
    re, im = _stage_auto(re, im, "...kjx,yj->...kxy", ny, +1, dt, -2)
    Cr, Sr = _c2r_mats(nz)
    # -> (..., X, Y, Z)
    return (jnp.einsum("...kxy,zk->...xyz", re, jnp.asarray(Cr, dt),
                       precision=_P)
            - jnp.einsum("...kxy,zk->...xyz", im, jnp.asarray(Sr, dt),
                         precision=_P))


def mm_enabled(shape):
    """Public probe: does this grid use the matmul-DFT backend?"""
    return _mm_enabled(shape)


def mm2d_enabled(shape):
    """Eligibility of the true-2-D matmul-DFT chain: a one-voxel-thick
    (nx, ny, 1) grid — the <dim>2</dim> instantiation — with in-plane axis
    sizes in the measured matmul-DFT win window.  Forced on/off by
    FFT_BACKEND exactly like the 3-D backend."""
    nx, ny, nz = shape
    if nz != 1 or FFT_BACKEND == "xla":
        return False
    if FFT_BACKEND == "matmul":
        return True
    return (jax.default_backend() not in ("cpu",)
            and max(nx, ny) <= _MM_MAX_AXIS and min(nx, ny) >= 16)


def fft2_apply_ifft2_mm(x, apply_fn):
    """irfft2(apply(rfft2(x))) for one-voxel-thick (..., nx, ny, 1) fields —
    the true DIM=2 instantiation of the transpose-free spectral chain
    (:func:`fftn_apply_ifftn_mm`): R2C along y (the half-spectrum axis),
    C2C along x, ``apply_fn(re, im)`` elementwise in (..., KY, KX) layout,
    then the inverse stages.  Every stage is an MXU matmul in dot_general's
    natural output order, so the hat field never materializes in HBM.

    The reference's (disabled) 2-D dispatch would run 2-D FFTW plans over
    (nx, ny) here (fibergen.cpp:26550-26565); norm='forward' so the DC bin
    is the field mean, like the 3-D chain."""
    nx, ny = x.shape[-3], x.shape[-2]
    dt = x.dtype
    x2 = x[..., 0]                                   # (..., X, Y)
    scale = 1.0 / (nx * ny)
    Cy, Sy = _r2c_mats(ny)
    re = jnp.einsum("...xy,ky->...xk", x2, jnp.asarray(Cy * scale, dt),
                    precision=_P)
    im = jnp.einsum("...xy,ky->...xk", x2, jnp.asarray(Sy * scale, dt),
                    precision=_P)
    # -> (..., KY, KX)
    re, im = _stage(re, im, "...xk,ix->...ki", nx, -1, dt)

    re, im = apply_fn(re, im)

    # -> (..., KY, X)
    re, im = _stage(re, im, "...ki,xi->...kx", nx, +1, dt)
    Cr, Sr = _c2r_mats(ny)
    out = (jnp.einsum("...kx,yk->...xy", re, jnp.asarray(Cr, dt),
                      precision=_P)
           - jnp.einsum("...kx,yk->...xy", im, jnp.asarray(Sr, dt),
                        precision=_P))
    return out[..., None]


def fftn(x):
    """Forward FFT of a (ncomp, nx, ny, nz) real field; scaled by 1/N so the
    DC bin holds the field mean (fibergen.cpp:18481-18510)."""
    if _mm_enabled(x.shape[-3:]):
        return _fftn_mm(x)
    return jnp.fft.rfftn(x, axes=_AXES, norm="forward")


def ifftn(y, shape):
    """Inverse of :func:`fftn`; ``shape`` is the real-space (nx, ny, nz)."""
    if _mm_enabled(shape):
        return _ifftn_mm(y, shape)
    return jnp.fft.irfftn(y, s=shape, axes=_AXES, norm="forward")


def fftn_zero_trace(x):
    """Forward FFT enforcing a traceless tensor: the first component is
    reconstructed as -(c1 + c2) in the Fourier domain
    (fibergen.cpp:18531-18560, used by the viscosity Delta scheme)."""
    y_rest = fftn(x[1:])
    y0 = -(y_rest[0] + y_rest[1])
    return jnp.concatenate([y0[None], y_rest], axis=0)


def ifftn_zero_trace(y, shape):
    """Inverse FFT of components 1.. and traceless reconstruction of
    component 0 (fibergen.cpp:18563-18584)."""
    x_rest = ifftn(y[1:], shape)
    x0 = -(x_rest[0] + x_rest[1])
    return jnp.concatenate([x0[None], x_rest], axis=0)
