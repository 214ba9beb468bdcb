"""Pallas-fused spectral middle of the matmul-DFT chain (single chip).

The transpose-free chain (ops/fft.fftn_apply_ifftn_mm) runs six XLA einsum
stages with the elementwise spectral apply between them.  Profiling at
256^3 x 3 components on v5e (scripts/bench_pallas_middle3.py) shows the
chain is MXU-bound at HIGHEST precision (12.6 ms) while its three
full-field HBM passes floor at ~6.1 ms — so the only lever left is MXU
FLOPs, and the XLA-level radix-2 split loses them back to HBM concats
(ops/fft.py MM_DIF notes).

This module keeps the z r2c/c2r stages as XLA einsums in a (KZ, C, X, Y)
natural-dot layout (zero transposes) and replaces the four c2c stages +
apply with ONE Pallas kernel gridded over the KZ half-spectrum.  Per
kz-slab, each component's (X, Y) plane runs four 2-D MXU matmul stages
with

  * an in-VMEM radix-2 DIF split per stage — HALF the MXU FLOPs at full
    128-lane tile utilization; the even/odd pre-adds and block
    recombinations are VPU ops on VMEM values, so unlike the XLA DIF the
    split costs no HBM traffic (the even|odd block bin order is absorbed
    by permuting the apply's per-axis constant vectors);
  * the Karatsuba 3m complex product (m1 = re.C, m2 = im.S,
    m3 = (re+im).(C+S)) — 25% fewer MXU FLOPs again, with the C+S
    matrices precomputed host-side;
  * the G0 scaling applied in-register between the forward and inverse
    x-stages (u_hat never exists in HBM, as in the XLA chain).

Measured 256^3 x 3 f32 (v5e): 12.6 ms (XLA chain) -> 8.2 ms per chain;
roundtrip error identical to the XLA chain (~7e-6 relative).

This is the same G0 math as green._g0_staggered_chain
(G0OperatorFourierStaggeredGeneral, fibergen.cpp:19834-19927); equivalence
is pinned by tests/test_pallas_chain.py in Pallas interpret mode.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid

# Knob: "auto" enables the Pallas middle on TPU-class backends for shapes
# where it measures faster than the XLA chain (even nx/ny >= 256 — the
# radix-2 halves must fill the 128x128 MXU tile); "on" forces it (tests,
# with INTERPRET on CPU); "off" disables.  Env: FIBERGEN_TPU_MM_MIDDLE.
MM_MIDDLE = "auto"
# Run the kernel in Pallas interpret mode (CPU tests).
INTERPRET = False

_P = lax.Precision.HIGHEST


def _knob():
    return os.environ.get("FIBERGEN_TPU_MM_MIDDLE", MM_MIDDLE)


def middle_enabled(shape, ncomp=3) -> bool:
    """Policy: use the Pallas spectral middle for this grid shape?"""
    v = _knob()
    if v == "off":
        return False
    nx, ny, nz = shape
    even = nx % 2 == 0 and ny % 2 == 0
    if v == "on":
        return even
    # one (C, X, Y) f32 plane-set must fit the kernel's VMEM working set
    # (~10 buffered copies of it next to the stage matrices)
    plane_mb = ncomp * nx * ny * 4 / 2**20
    return (even
            and jax.default_backend() not in ("cpu",)
            and min(nx, ny) >= 256 and max(nx, ny) <= 512
            and nz >= 16 and plane_mb <= 8.0)


def _perm(n):
    """Bin order of a radix-2 DIF axis: [even bins | odd bins]."""
    return np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])


def _difmats3(n, sign, transpose, dt):
    """Half-size DIF stage matrices as (C, S, C+S) triplets for the even
    and odd blocks (6 arrays).  ``transpose`` selects the contract-last
    form (y stages); otherwise contract-first (x stages)."""
    from . import fft as fftmod
    CeC, CeS, CoC, CoS = fftmod._dif_mats(n, sign)
    if transpose:
        CeC, CeS, CoC, CoS = CeC.T, CeS.T, CoC.T, CoS.T
    return tuple(jnp.asarray(a, dt)
                 for a in (CeC, CeS, CeC + CeS, CoC, CoS, CoC + CoS))


def _c3m_last(vr, vi, m):
    """(vr + i vi) @ (C + i S), contracting the LAST axis (Karatsuba)."""
    C, S, CS = m
    dot = functools.partial(jnp.dot, precision=_P,
                            preferred_element_type=vr.dtype)
    m1 = dot(vr, C)
    m2 = dot(vi, S)
    m3 = dot(vr + vi, CS)
    return m1 - m2, m3 - m1 - m2


def _c3m_first(m, vr, vi):
    """(C + i S) @ (vr + i vi), contracting the FIRST axis (Karatsuba)."""
    C, S, CS = m
    dot = functools.partial(jnp.dot, precision=_P,
                            preferred_element_type=vr.dtype)
    m1 = dot(C, vr)
    m2 = dot(S, vi)
    m3 = dot(CS, vr + vi)
    return m1 - m2, m3 - m1 - m2


def _middle(re, im, xc, yc, zc, apply_fn, interpret, ec=None):
    """Run the fused middle: four radix-2 c2c stages + ``apply_fn`` on one
    Pallas grid over KZ.

    re/im: (KZ, C, X, Y) z-transformed parts.  xc: (R, nx, 1) per-KX-bin
    constant rows in DIF block order; yc: (R, 1, ny) per-KY-bin; zc:
    (R, KZ) per-slab scalars; ``ec`` an optional small SMEM vector (e.g.
    the DC-bin injection values).  ``apply_fn(G, xs, ys, zs, ec)`` maps a
    list of C (re, im) block pairs plus the constant tuples to the scaled
    list — called once per KX block (rows = that block's bins, cols = all
    KY bins in block order)."""
    kz, C, nx, ny = re.shape
    hx, hy = nx // 2, ny // 2
    dt = re.dtype
    ye = _difmats3(ny, -1, True, dt)
    yo_f = ye[3:]
    ye = ye[:3]
    xef = _difmats3(nx, -1, False, dt)
    xof = xef[3:]
    xef = xef[:3]
    xei = _difmats3(nx, +1, False, dt)
    xoi = xei[3:]
    xei = xei[:3]
    yei = _difmats3(ny, +1, True, dt)
    yoi = yei[3:]
    yei = yei[:3]
    mats = (*ye, *yo_f, *xef, *xof, *xei, *xoi, *yei, *yoi)

    nrow = xc.shape[0]
    nec = 1 if ec is not None else 0

    def kernel(re_ref, im_ref, xc_ref, yc_ref, zc_ref, *rest):
        ec_ref = rest[0] if nec else None
        mrefs = rest[nec:nec + len(mats)]
        ore_ref, oim_ref = rest[nec + len(mats):]
        m = [r[...] for r in mrefs]
        k_ye, k_yo = m[0:3], m[3:6]
        k_xe, k_xo = m[6:9], m[9:12]
        k_xei, k_xoi = m[12:15], m[15:18]
        k_yei, k_yoi = m[18:21], m[21:24]
        k = pl.program_id(0)
        zs = tuple(zc_ref[i, k] for i in range(nrow))
        ys = tuple(yc_ref[i] for i in range(nrow))
        xs_e = tuple(xc_ref[i, :hx] for i in range(nrow))
        xs_o = tuple(xc_ref[i, hx:] for i in range(nrow))

        Ge, Go = [], []
        for c in range(C):
            vr = re_ref[0, c]
            vi = im_ref[0, c]
            # S1: contract Y (radix-2) -> [even | odd] KY blocks
            ur, ui = vr[:, :hy] + vr[:, hy:], vi[:, :hy] + vi[:, hy:]
            wr, wi = vr[:, :hy] - vr[:, hy:], vi[:, :hy] - vi[:, hy:]
            Er, Ei = _c3m_last(ur, ui, k_ye)
            Or, Oi = _c3m_last(wr, wi, k_yo)
            W1r = jnp.concatenate([Er, Or], axis=-1)      # (nx, ny)
            W1i = jnp.concatenate([Ei, Oi], axis=-1)
            # S2: contract X (radix-2) -> even/odd KX row blocks (hx, ny)
            u2r, u2i = W1r[:hx] + W1r[hx:], W1i[:hx] + W1i[hx:]
            w2r, w2i = W1r[:hx] - W1r[hx:], W1i[:hx] - W1i[hx:]
            Ge.append(_c3m_first(k_xe, u2r, u2i))
            Go.append(_c3m_first(k_xo, w2r, w2i))

        Ge = apply_fn(Ge, xs_e, ys, zs, ec_ref)
        Go = apply_fn(Go, xs_o, ys, zs, ec_ref)

        for c in range(C):
            # S3: inverse over KX blocks -> spatial X halves
            pr, pi = _c3m_first(k_xei, *Ge[c])
            tr, ti = _c3m_first(k_xoi, *Go[c])
            W3r = jnp.concatenate([pr + tr, pr - tr], axis=0)   # (nx, ny)
            W3i = jnp.concatenate([pi + ti, pi - ti], axis=0)
            # S4: inverse over KY blocks -> spatial Y halves
            pr, pi = _c3m_last(W3r[:, :hy], W3i[:, :hy], k_yei)
            tr, ti = _c3m_last(W3r[:, hy:], W3i[:, hy:], k_yoi)
            ore_ref[0, c, :, :hy] = pr + tr
            oim_ref[0, c, :, :hy] = pi + ti
            ore_ref[0, c, :, hy:] = pr - tr
            oim_ref[0, c, :, hy:] = pi - ti

    fspec = pl.BlockSpec((1, C, nx, ny), lambda k: (k, 0, 0, 0))

    def full(a):
        return pl.BlockSpec(a.shape, lambda k, _nd=a.ndim: (0,) * _nd)

    ecs = []
    ein = []
    if ec is not None:
        ecs = [pl.BlockSpec(ec.shape, lambda k: (0,),
                            memory_space=pltpu.SMEM)]
        ein = [ec]
    return pl.pallas_call(
        kernel,
        grid=(kz,),
        in_specs=[fspec, fspec, full(xc), full(yc),
                  pl.BlockSpec(zc.shape, lambda k: (0, 0),
                               memory_space=pltpu.SMEM),
                  *ecs,
                  *[full(a) for a in mats]],
        out_specs=(fspec, fspec),
        out_shape=(jax.ShapeDtypeStruct((kz, C, nx, ny), dt),
                   jax.ShapeDtypeStruct((kz, C, nx, ny), dt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=118 * 1024 * 1024),
        interpret=interpret,
    )(re, im, xc, yc, zc, *ein, *mats)


def _z_fwd(x, scale=None):
    """Forward r2c z-stage in the (KZ, C, X, Y) natural-dot layout,
    norm='forward' (total 1/N folded into the matrices).  ``scale``
    overrides the 1/N normalization when ``x`` is a per-device slab whose
    local extents are not the global grid's (g0_staggered_middle_slab)."""
    from . import fft as fftmod
    nx, ny, nz = x.shape[-3:]
    dt = x.dtype
    if scale is None:
        scale = 1.0 / (nx * ny * nz)
    Cz, Sz = fftmod._r2c_mats(nz)
    re = jnp.einsum("kz,cxyz->kcxy", jnp.asarray(Cz * scale, dt), x,
                    precision=_P)
    im = jnp.einsum("kz,cxyz->kcxy", jnp.asarray(Sz * scale, dt), x,
                    precision=_P)
    return re, im


def _z_inv(re, im, nz):
    """Inverse c2r z-stage consuming the (KZ, C, X, Y) layout."""
    from . import fft as fftmod
    dt = re.dtype
    Cr, Sr = fftmod._c2r_mats(nz)
    return (jnp.einsum("kcxy,zk->cxyz", re, jnp.asarray(Cr, dt),
                       precision=_P)
            - jnp.einsum("kcxy,zk->cxyz", im, jnp.asarray(Sr, dt),
                         precision=_P))


def _staggered_consts(grid: Grid, rdtype, kzp=None):
    """Per-axis staggered wavenumber constants in the kernel's layouts:
    xc (3, nx, 1) = [Re kp0, Im kp0, dc] in DIF block order, yc (3, 1, ny)
    likewise for kp1, zc (3, KZ) for kp2 (natural rfft order).  Built in
    host numpy (the grid is static) so they enter the program as literal
    constants — under a traced mesh program GSPMD would otherwise
    partition + all-gather the jnp construction.  ``kzp`` edge-pads zc's
    kz axis (the slab middle's mesh-multiple padding; the last rfft bin's
    k+ is never zero, so padded bins stay finite)."""
    nd = np.dtype(rdtype)
    sx, sy, sz = grid.xi_staggered()
    h0, h1, h2 = grid.staggered_h()

    def row(xi, h, n, perm):
        xi = np.reshape(np.asarray(xi, np.float64), (-1,))
        kp = (np.sin(xi) / h) * np.exp(1j * xi)
        dc = (np.arange(n) == 0).astype(np.float64)
        r = np.stack([kp.real, kp.imag, dc]).astype(nd)
        return r if perm is None else r[:, perm]

    kzr = grid.nz // 2 + 1
    xc = row(sx, h0, grid.nx, _perm(grid.nx)).reshape(3, grid.nx, 1)
    yc = row(sy, h1, grid.ny, _perm(grid.ny)).reshape(3, 1, grid.ny)
    zc = row(sz, h2, kzr, None)
    if kzp is not None:
        zc = np.pad(zc, ((0, 0), (0, kzp - kzr)), mode="edge")
    return jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(zc)


def _g0_apply(c10, c20):
    """Staggered-grid G0 on one KX block: eta = c1 tau + c2 (tau . k+) k-
    with c1 = c10/|k|^2, c2 = c20/|k|^4 and the DC bin zeroed — the same
    math as green._g0_staggered_chain (fibergen.cpp:19834-19927), expressed
    on explicit (re, im) parts and 1-D broadcast constants."""

    def apply(G, xs, ys, zs, ec):
        kxr, kxi, dcx = xs          # (hx, 1)
        kyr, kyi, dcy = ys          # (1, ny)
        kzr_, kzi, dcz = zs         # scalars
        n2 = (kxr * kxr + kxi * kxi + kyr * kyr + kyi * kyi
              + kzr_ * kzr_ + kzi * kzi)
        dc = dcx * dcy * dcz
        n2s = n2 + dc
        ndc = 1.0 - dc
        c1 = c10 * ndc / n2s
        c2 = c20 * ndc / (n2s * n2s)
        kpr = (kxr, kyr, kzr_)
        kpi = (kxi, kyi, kzi)
        fr = sum(G[j][0] * kpr[j] - G[j][1] * kpi[j] for j in range(3))
        fi = sum(G[j][0] * kpi[j] + G[j][1] * kpr[j] for j in range(3))
        cfr, cfi = c2 * fr, c2 * fi
        return [(c1 * G[j][0] - (cfr * kpr[j] + cfi * kpi[j]),
                 c1 * G[j][1] - (cfi * kpr[j] - cfr * kpi[j]))
                for j in range(3)]

    return apply


def _g0_heat_apply(c10):
    """Scalar staggered G0 (heat/porous): eta = c10 tau / |k|^2, DC zeroed
    (fibergen.cpp:19778-19830)."""

    def apply(G, xs, ys, zs, ec):
        kxr, kxi, dcx = xs
        kyr, kyi, dcy = ys
        kzr_, kzi, dcz = zs
        n2 = (kxr * kxr + kxi * kxi + kyr * kyr + kyi * kyi
              + kzr_ * kzr_ + kzi * kzi)
        dc = dcx * dcy * dcz
        c1 = c10 * (1.0 - dc) / (n2 + dc)
        return [(c1 * G[0][0], c1 * G[0][1])]

    return apply


def _xi_consts(grid: Grid, rdtype, kzp=None):
    """Per-axis collocated xi constants in the kernel's layouts: rows
    [xi, dc] per axis, x/y in DIF block order, z natural rfft order.
    Host-numpy literals; ``kzp`` edge-pads the kz axis (see
    :func:`_staggered_consts`)."""
    nd = np.dtype(rdtype)
    fx, fy, fz = grid.xi(two_pi=False)

    def row(v, n, perm):
        v = np.reshape(np.asarray(v, np.float64), (-1,))
        dc = (np.arange(n) == 0).astype(np.float64)
        r = np.stack([v, dc]).astype(nd)
        return r if perm is None else r[:, perm]

    kzr = grid.nz // 2 + 1
    xc = row(fx, grid.nx, _perm(grid.nx)).reshape(2, grid.nx, 1)
    yc = row(fy, grid.ny, _perm(grid.ny)).reshape(2, 1, grid.ny)
    zc = row(fz, kzr, None)
    if kzp is not None:
        zc = np.pad(zc, ((0, 0), (0, kzp - kzr)), mode="edge")
    return jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(zc)


def _gamma_collocated_apply(part_fn, beta, C):
    """Collocated Gamma on one KX block: green's real-coefficient
    ``part_fn(p, xis, k2)`` applied to the re and im parts independently,
    with the DC bin replaced by the prescribed mean E (green._gamma_chain,
    fibergen.cpp:19302-19609)."""

    def apply(G, xs, ys, zs, ec):
        x0, dcx = xs                # (hx, 1)
        x1, dcy = ys                # (1, ny)
        x2, dcz = zs                # scalars
        dc = dcx * dcy * dcz
        ndc = 1.0 - dc
        k2 = x0 * x0 + x1 * x1 + x2 * x2 + dc
        xis = (x0, x1, x2)
        pr = part_fn([g[0] for g in G], xis, k2)
        pi = part_fn([g[1] for g in G], xis, k2)
        out = []
        for j in range(C):
            er, ei = pr[j], pi[j]
            if beta != 0.0:
                er = er + beta * G[j][0]
                ei = ei + beta * G[j][1]
            out.append((er * ndc + ec[j] * dc, ei * ndc))
        return out

    return apply


def gamma_collocated_middle(grid: Grid, tau, E, beta, part_fn):
    """eta = ifftn(Gamma_collocated(fftn(tau))) with the Pallas-fused
    middle; ``part_fn`` is the same real-coefficient kernel green's
    _gamma_chain uses.  Equivalent to green._gamma_chain
    (tests/test_pallas_chain.py)."""
    C = tau.shape[0]
    re, im = _z_fwd(tau)
    xc, yc, zc = _xi_consts(grid, tau.dtype)
    ec = jnp.reshape(jnp.asarray(E, tau.dtype), (-1,))
    re, im = _middle(re, im, xc, yc, zc,
                     _gamma_collocated_apply(part_fn, beta, C),
                     INTERPRET, ec=ec)
    return _z_inv(re, im, grid.nz)


def _zt_apply(part_fn, beta, C):
    """Zero-trace collocated Gamma on one KX block: component 0 of the
    traceless tensor is reconstructed as -(c1 + c2) before the full
    ``part_fn`` and dropped after (fibergen.cpp:18531-18584); ``C`` is the
    number of TRANSFORMED components (full - 1)."""

    def apply(G, xs, ys, zs, ec_ref):
        x0, dcx = xs
        x1, dcy = ys
        x2, dcz = zs
        dc = dcx * dcy * dcz
        ndc = 1.0 - dc
        k2 = x0 * x0 + x1 * x1 + x2 * x2 + dc
        xis = (x0, x1, x2)
        p_r = [-(G[0][0] + G[1][0])] + [g[0] for g in G]
        p_i = [-(G[0][1] + G[1][1])] + [g[1] for g in G]
        pr = part_fn(p_r, xis, k2)
        pi = part_fn(p_i, xis, k2)
        out = []
        for j in range(1, C + 1):
            er, ei = pr[j], pi[j]
            if beta != 0.0:
                er = er + beta * p_r[j]
                ei = ei + beta * p_i[j]
            out.append((er * ndc + ec_ref[j] * dc, ei * ndc))
        return out

    return apply


def gamma_collocated_zt_middle(grid: Grid, tau, E, beta, part_fn):
    """Zero-trace collocated Gamma chain (viscosity Delta scheme) with the
    Pallas-fused middle: only components 1.. of the traceless ``tau`` are
    transformed; component 0 is reconstructed as -(c1 + c2) inside the
    kernel before the 6-component ``part_fn`` and dropped again after
    (fft.fftn_zero_trace / ifftn_zero_trace, fibergen.cpp:18531-18584)."""
    C = tau.shape[0] - 1
    re, im = _z_fwd(tau[1:])
    xc, yc, zc = _xi_consts(grid, tau.dtype)
    ec = jnp.reshape(jnp.asarray(E, tau.dtype), (-1,))
    re, im = _middle(re, im, xc, yc, zc, _zt_apply(part_fn, beta, C),
                     INTERPRET, ec=ec)
    rest = _z_inv(re, im, grid.nz)
    x0 = -(rest[0] + rest[1])
    return jnp.concatenate([x0[None], rest], axis=0)


def g0_staggered_middle(grid: Grid, f, c10, c20):
    """u = ifftn(G0_staggered(fftn(f))) with the Pallas-fused middle; f is
    the 3-component staggered force field.  Equivalent to
    green._g0_staggered_chain (tests/test_pallas_chain.py)."""
    re, im = _z_fwd(f)
    xc, yc, zc = _staggered_consts(grid, f.dtype)
    re, im = _middle(re, im, xc, yc, zc, _g0_apply(c10, c20), INTERPRET)
    return _z_inv(re, im, grid.nz)


def middle_slab_enabled(par, shape, ncomp=3) -> bool:
    """Policy: run the Pallas spectral middle on a slab-sharded field?

    Exactly :func:`middle_enabled`'s shape/backend/VMEM policy (delegated,
    so the single-chip and distributed windows can never desynchronize),
    plus nx must divide the mesh (the kz<->x all-to-all transpose needs
    equal x chunks; the kz axis is zero-padded to a mesh multiple
    internally)."""
    if par is None or shape[0] % par.n_devices != 0:
        return False
    return middle_enabled(shape, ncomp)


def _run_middle_slab(par, grid: Grid, x, xc, yc, zc, apply_fn, ec=None):
    """Distributed spectral middle over ``par``'s x-slab mesh.

    The single-chip middle grids its kernel over the KZ half-spectrum, so
    the natural decomposition on a mesh is a KZ slab: each device z-
    transforms its x-slab locally (z is unsharded), ONE tiled
    ``lax.all_to_all`` re-shards (KZ, C, X, Y) from x-slabs to kz-slabs,
    the fused radix-2 Pallas middle (four c2c stages + ``apply_fn``
    in-register) runs on full (X, Y) planes for the device's kz bins, and
    the mirrored all-to-all + local c2r z-stage return real-space x-slabs.
    Communication is one all-to-all each way — the same volume as the
    plain slab-FFT pair (parallel/fft.py) but with the whole
    fft+apply+ifft chain fused per device, so the per-device rate matches
    the single-chip Pallas path instead of the unfused XLA rate.

    KZ = nz//2+1 rarely divides the mesh: re/im are zero-padded to the
    next multiple (``zc`` must come in edge-padded to kzp columns — padded
    bins stay finite because the last rfft bin's wavenumber is never zero
    — and the pad is sliced off before the inverse z-stage).  Equivalence
    to the single-chip middles is pinned in tests/test_pallas_chain.py on
    the 8-device CPU mesh."""
    mesh, ax = par.mesh, par.axis
    d = par.n_devices
    nx, ny, nz = grid.shape
    kz = nz // 2 + 1
    kzp = -(-kz // d) * d
    assert zc.shape[-1] == kzp, "zc must be pre-padded to the mesh multiple"
    scale = 1.0 / (nx * ny * nz)
    interpret = INTERPRET

    def local(fb, xcb, ycb, zcb, *ecb):
        re, im = _z_fwd(fb, scale=scale)       # (KZ, C, nx/D, ny)
        ri = jnp.stack([re, im])
        ri = jnp.pad(ri, ((0, 0), (0, kzp - kz), (0, 0), (0, 0), (0, 0)))
        ri = lax.all_to_all(ri, ax, split_axis=1, concat_axis=3, tiled=True)
        re2, im2 = _middle(ri[0], ri[1], xcb, ycb, zcb, apply_fn, interpret,
                           ec=ecb[0] if ecb else None)
        ri = jnp.stack([re2, im2])
        ri = lax.all_to_all(ri, ax, split_axis=3, concat_axis=1, tiled=True)
        return _z_inv(ri[0, :kz], ri[1, :kz], nz)

    from jax.sharding import PartitionSpec as P
    ein, especs = (), ()
    if ec is not None:
        ein, especs = (ec,), (P(),)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, ax, None, None), P(), P(), P(None, ax)) + especs,
        out_specs=P(None, ax, None, None),
        check_vma=False)(x, xc, yc, zc, *ein)


def _kzp(par, grid):
    kz = grid.nz // 2 + 1
    return -(-kz // par.n_devices) * par.n_devices


def g0_staggered_middle_slab(par, grid: Grid, f, c10, c20):
    """Distributed :func:`g0_staggered_middle` (staggered G0,
    fibergen.cpp:19834-19927) — see :func:`_run_middle_slab`."""
    xc, yc, zc = _staggered_consts(grid, f.dtype, kzp=_kzp(par, grid))
    return _run_middle_slab(par, grid, f, xc, yc, zc, _g0_apply(c10, c20))


def g0_staggered_heat_middle_slab(par, grid: Grid, f, c10):
    """Distributed :func:`g0_staggered_heat_middle` (scalar staggered G0,
    fibergen.cpp:19778-19830)."""
    xc, yc, zc = _staggered_consts(grid, f.dtype, kzp=_kzp(par, grid))
    return _run_middle_slab(par, grid, f, xc, yc, zc, _g0_heat_apply(c10))


def gamma_collocated_middle_slab(par, grid: Grid, tau, E, beta, part_fn):
    """Distributed :func:`gamma_collocated_middle` (collocated Gamma with
    the DC bin carrying E, fibergen.cpp:19302-19609).  Only the device
    owning kz bin 0 has a nonzero dc indicator, so the E injection stays
    local — every device receives the replicated E vector but applies it
    times its own dc row."""
    C = tau.shape[0]
    xc, yc, zc = _xi_consts(grid, tau.dtype, kzp=_kzp(par, grid))
    ec = jnp.reshape(jnp.asarray(E, tau.dtype), (-1,))
    return _run_middle_slab(par, grid, tau, xc, yc, zc,
                            _gamma_collocated_apply(part_fn, beta, C), ec=ec)


def gamma_collocated_zt_middle_slab(par, grid: Grid, tau, E, beta, part_fn):
    """Distributed :func:`gamma_collocated_zt_middle` (viscosity Delta
    scheme: zero-trace transforms around the collocated Gamma,
    fibergen.cpp:18531-18584).  The trace reconstructions outside the
    middle are per-voxel elementwise ops on the component axis, which is
    unsharded — GSPMD keeps them local to each x-slab."""
    C = tau.shape[0] - 1
    xc, yc, zc = _xi_consts(grid, tau.dtype, kzp=_kzp(par, grid))
    ec = jnp.reshape(jnp.asarray(E, tau.dtype), (-1,))
    rest = _run_middle_slab(par, grid, tau[1:], xc, yc, zc,
                            _zt_apply(part_fn, beta, C), ec=ec)
    x0 = -(rest[0] + rest[1])
    return jnp.concatenate([x0[None], rest], axis=0)


def g0_staggered_heat_middle(grid: Grid, f, c10):
    """Scalar-G0 variant of :func:`g0_staggered_middle` (heat/porous)."""
    re, im = _z_fwd(f)
    xc, yc, zc = _staggered_consts(grid, f.dtype)
    re, im = _middle(re, im, xc, yc, zc, _g0_heat_apply(c10), INTERPRET)
    return _z_inv(re, im, grid.nz)
