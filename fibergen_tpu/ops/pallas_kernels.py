"""Pallas TPU kernels for the staggered-grid hot path.

The Lippmann-Schwinger iteration is HBM-bandwidth bound; XLA fuses the
elementwise Green kernel well but keeps the stress evaluation and the
staggered finite-difference stencils as separate passes.  These kernels fuse
them:

    stress_div_staggered:  eps (6) + per-voxel moduli
                           -> f = div((C - C0) : eps) (3)
                           (calcStressDiff + divOperatorStaggered fused,
                            fibergen.cpp:18030 + 18853)
    eps_from_u_staggered:  u (3) -> eta = E + sym grad u (6)
                           (epsOperatorStaggered, fibergen.cpp:18614)

Layout: fields are (ncomp, nx, ny, nz) f32 with z as the lane dimension.
The grid tiles x in thin slabs; y and z stay fully resident per block so
their periodic shifts are circular in-block (pltpu.roll); the x-neighbor
access reads an overlapping halo window (pl.Element indexing) of a
wrap-padded input.

Only the all-isotropic voigt/reuss mixing path is fused (the common case);
other mixing rules use the jnp path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid


def _roll(a, shift, axis):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def _pick_bx(grid: Grid, nfields: int):
    """x-slab width bounded by a VMEM budget (double-buffered blocks)."""
    budget = 10 * 1024 * 1024  # bytes
    plane = grid.ny * grid.nz * 4
    bx = max(1, budget // (2 * nfields * plane)) - 2
    bx = max(1, min(int(bx), grid.nx))
    while grid.nx % bx != 0:
        bx -= 1
    return bx


def supported(grid: Grid, dim: int, dtype) -> bool:
    """Kernel applicability: staggered elasticity with lane-aligned z.

    The y/z extent must also fit VMEM: blocks keep full y/z planes resident
    (halo only in x), so the minimal bx=1 footprint is 27 planes
    (eps 6x3 + moduli 2x3 + out 3x1), double-buffered by the pipeline.
    Past ~14 MB the Mosaic scoped-vmem allocator rejects the kernel
    (16 MB/core on v5e) and the solver falls back to the jnp path."""
    plane = grid.ny * grid.nz * 4
    min_vmem = 2 * 27 * plane  # double-buffered bx=1 stress_div footprint
    return (dim == 6 and grid.nz % 128 == 0 and grid.ny % 8 == 0
            and grid.nx >= 2 and jnp.dtype(dtype) == jnp.float32
            and min_vmem <= 14 * 1024 * 1024)


def stress_div_staggered(grid: Grid, eps, mu_x, lam_x, mu0, lam0):
    """f = div_staggered((C(x) - C0) : eps) in one fused pass.

    eps: (6, nx, ny, nz); mu_x/lam_x: (nx, ny, nz) effective iso moduli.
    Returns (3, nx, ny, nz)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = grid.shape
    bx = _pick_bx(grid, nfields=6 + 2 + 3 + 6)

    # periodic halo of 1 in x only
    eps_p = jnp.pad(eps, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="wrap")
    mod_p = jnp.pad(jnp.stack([mu_x, lam_x]),
                    ((0, 0), (1, 1), (0, 0), (0, 0)), mode="wrap")

    mu0f = float(mu0)
    lam0f = float(lam0)
    hxf = float(grid.nx / grid.dx)
    hyf = float(grid.ny / grid.dy)
    hzf = float(grid.nz / grid.dz)

    c_x = slice(1, 1 + bx)
    m_x = slice(0, bx)
    p_x = slice(2, 2 + bx)

    def kernel(eps_ref, mod_ref, out_ref):
        dmu = 2.0 * (mod_ref[0] - mu0f)
        ltr = (mod_ref[1] - lam0f) * (eps_ref[0] + eps_ref[1] + eps_ref[2])

        t0 = dmu * eps_ref[0] + ltr
        t1 = dmu * eps_ref[1] + ltr
        t2 = dmu * eps_ref[2] + ltr
        t3 = dmu * eps_ref[3]
        t4 = dmu * eps_ref[4]
        t5 = dmu * eps_ref[5]

        # f0 = D-x(t0) + D+y(t5) + D+z(t4)
        out_ref[0] = ((t0[c_x] - t0[m_x]) * hxf
                      + (_roll(t5, -1, 1)[c_x] - t5[c_x]) * hyf
                      + (_roll(t4, -1, 2)[c_x] - t4[c_x]) * hzf)
        # f1 = D+x(t5) + D-y(t1) + D+z(t3)
        out_ref[1] = ((t5[p_x] - t5[c_x]) * hxf
                      + (t1[c_x] - _roll(t1, 1, 1)[c_x]) * hyf
                      + (_roll(t3, -1, 2)[c_x] - t3[c_x]) * hzf)
        # f2 = D+x(t4) + D+y(t3) + D-z(t2)
        out_ref[2] = ((t4[p_x] - t4[c_x]) * hxf
                      + (_roll(t3, -1, 1)[c_x] - t3[c_x]) * hyf
                      + (t2[c_x] - _roll(t2, 1, 2)[c_x]) * hzf)

    halo_spec = lambda ncomp: pl.BlockSpec(
        (pl.Element(ncomp), pl.Element(bx + 2), pl.Element(ny),
         pl.Element(nz)),
        lambda i: (0, i * bx, 0, 0),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), eps.dtype),
        grid=(nx // bx,),
        in_specs=[halo_spec(6), halo_spec(2)],
        out_specs=pl.BlockSpec((3, bx, ny, nz), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(eps_p, mod_p)
    return out


def eps_from_u_staggered(grid: Grid, E, u):
    """eta = E + sym grad_staggered(u) in one fused pass.

    u: (3, nx, ny, nz); E: (6,).  Returns (6, nx, ny, nz)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = grid.shape
    bx = _pick_bx(grid, nfields=3 + 6)

    u_p = jnp.pad(u, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="wrap")
    Ef = jnp.asarray(E, jnp.float32).reshape(6, 1)

    hx = float(grid.nx / grid.dx)
    hy = float(grid.ny / grid.dy)
    hz = float(grid.nz / grid.dz)

    c_x = slice(1, 1 + bx)
    m_x = slice(0, bx)
    p_x = slice(2, 2 + bx)

    def kernel(u_ref, e_ref, out_ref):
        ux, uy, uz = u_ref[0], u_ref[1], u_ref[2]
        out_ref[0] = e_ref[0, 0] + (ux[p_x] - ux[c_x]) * hx
        out_ref[1] = e_ref[1, 0] + (_roll(uy, -1, 1)[c_x] - uy[c_x]) * hy
        out_ref[2] = e_ref[2, 0] + (_roll(uz, -1, 2)[c_x] - uz[c_x]) * hz
        out_ref[3] = e_ref[3, 0] + 0.5 * (
            (uz[c_x] - _roll(uz, 1, 1)[c_x]) * hy
            + (uy[c_x] - _roll(uy, 1, 2)[c_x]) * hz)
        out_ref[4] = e_ref[4, 0] + 0.5 * (
            (uz[c_x] - uz[m_x]) * hx
            + (ux[c_x] - _roll(ux, 1, 2)[c_x]) * hz)
        out_ref[5] = e_ref[5, 0] + 0.5 * (
            (uy[c_x] - uy[m_x]) * hx
            + (ux[c_x] - _roll(ux, 1, 1)[c_x]) * hy)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((6, nx, ny, nz), u.dtype),
        grid=(nx // bx,),
        in_specs=[
            pl.BlockSpec((pl.Element(3), pl.Element(bx + 2), pl.Element(ny),
                          pl.Element(nz)),
                         lambda i: (0, i * bx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((6, bx, ny, nz), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(u_p, Ef)
    return out
