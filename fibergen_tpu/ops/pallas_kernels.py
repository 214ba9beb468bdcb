"""Pallas TPU kernels for the staggered-grid hot path.

The Lippmann-Schwinger iteration is HBM-bandwidth bound; XLA fuses the
elementwise Green kernel well but keeps the stress evaluation, the staggered
finite-difference stencils, the CG direction update, and the CG inner
products as separate passes.  These kernels fuse them:

    stress_div_staggered:      eps (6) + per-voxel moduli
                               -> f = div((C - C0) : eps) (3)
                               (calcStressDiff + divOperatorStaggered,
                                fibergen.cpp:18030 + 18853)
    stress_div_beta_staggered: p = r + beta p_prev fused into the same pass
                               (runCGElasticity direction update,
                                fibergen.cpp:23227-23229)
    eps_from_u_staggered:      u (3) -> eta = E + sym grad u (6)
                               (epsOperatorStaggered, fibergen.cpp:18614)
    eps_from_u_dot_staggered:  ... fused with the Voigt-weighted CG
                               denominator sum p : (p - eta)
                               (innerProduct, fibergen.cpp:20871-20952)

Layout: fields are (ncomp, nx, ny, nz) f32 with z as the lane dimension.
The grid tiles (x, y) in blocks with a 1-voxel periodic halo on both axes
(wrap-padded inputs + pl.Element windows); z stays fully resident per block
so its periodic shifts are circular in-block (pltpu.roll).  2-D tiling keeps
the VMEM footprint bounded for any nx*ny (512^3 works), with halo read
amplification ((bx+2)(by+2))/(bx*by) ~ 1.1-1.6.

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


# Run the kernels in Pallas interpret mode (pure-jax emulation).  Tests use
# this to exercise the kernel bodies — including the sharded ppermute-halo
# variants — on the virtual CPU mesh, where Mosaic cannot compile.
INTERPRET = False

_VMEM_BUDGET = 12 * 1024 * 1024  # bytes for double-buffered blocks


def _pick_bxy(shape, n_halo: int, n_out: int):
    """Pick an (x, y) block size: halo-extended input blocks of ``n_halo``
    components plus ``n_out`` output components must fit the VMEM budget
    double-buffered, while minimizing the halo read amplification
    ((bx+2)(by+2))/(bx by)."""
    nx, ny, nz = shape
    lane = nz * 4
    best = None
    sizes = (1, 2, 4, 8, 16, 32, 64, 128, 256)
    for bx in (b for b in sizes if b <= nx and nx % b == 0):
        for by in (b for b in sizes if b >= 8 and b <= ny and ny % b == 0):
            vmem = 2 * (n_halo * (bx + 2) * (by + 8) + n_out * bx * by) * lane
            if vmem > _VMEM_BUDGET:
                continue
            amp = ((bx + 2) * (by + 8)) / (bx * by)
            key = (amp, -(bx * by))  # min amplification, then larger blocks
            if best is None or key < best[0]:
                best = (key, bx, by)
    if best is None:
        return None
    return best[1], best[2]


def supported(grid: Grid, dim: int, dtype, n_devices: int = 1) -> bool:
    """Kernel applicability: staggered elasticity, f32, lane-aligned z, and
    a viable (x, y) block tiling within the Mosaic scoped-VMEM limit.
    ``n_devices > 1`` checks the per-device x-slab shape instead (the
    sharded kernels run on local blocks of nx/D planes)."""
    nx = grid.nx // n_devices if n_devices > 1 else grid.nx
    if n_devices > 1 and grid.nx % n_devices != 0:
        return False
    if not (dim == 6 and grid.nz % 128 == 0 and grid.ny % 8 == 0
            and nx >= 2 and jnp.dtype(dtype) == jnp.float32):
        return False
    # the largest kernel (stress_div_beta: 14 halo comps, 9 out comps)
    return _pick_bxy((nx, grid.ny, grid.nz), 14, 9) is not None


def _pad_xy(a, axis_name=None):
    """Periodic halo: 1 voxel in x, 4 in y (axes -3, -2).  The y halo is
    4 wide (not 1) so that halo windows have size by+8, a multiple of 8 —
    Pallas TPU requires the second-to-last block dimension to be divisible
    by 8; only the outermost voxel of the halo is actually used.

    With ``axis_name`` set (inside shard_map over an x-slab mesh), the x
    halo planes come from the neighbouring devices via ``lax.ppermute``
    over ICI instead of the same-device wrap — the TPU-native analogue of
    an MPI ghost-layer exchange."""
    if axis_name is None:
        return jnp.pad(a, ((0, 0), (1, 1), (4, 4), (0, 0)), mode="wrap")
    n = jax.lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # device i+1 receives device i's last plane (its left/minus halo);
    # device i-1 receives device i's first plane (its right/plus halo)
    left = jax.lax.ppermute(a[:, -1:], axis_name, fwd)
    right = jax.lax.ppermute(a[:, :1], axis_name, bwd)
    a = jnp.concatenate([left, a, right], axis=1)
    return jnp.pad(a, ((0, 0), (0, 0), (4, 4), (0, 0)), mode="wrap")


def _halo_spec(ncomp, bx, by, nz):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl.BlockSpec(
        (pl.Element(ncomp), pl.Element(bx + 2), pl.Element(by + 8),
         pl.Element(nz)),
        lambda i, j: (0, i * bx, j * by, 0),
        memory_space=pltpu.VMEM)


class _Slices:
    """Center/minus/plus windows of a halo-extended (.., bx+2, by+8, nz)
    block for the x and y axes (y halo is 4 wide for the TPU sublane
    divisibility rule; only +-1 is used)."""

    def __init__(self, bx, by):
        self.cx = slice(1, 1 + bx)
        self.mx = slice(0, bx)
        self.px = slice(2, 2 + bx)
        self.cy = slice(4, 4 + by)
        self.my = slice(3, 3 + by)
        self.py = slice(5, 5 + by)


def _win(a, sx, sy):
    """Window of a (bx+2, by+8, nz) block."""
    return a[sx, sy, :]


def stress_div_staggered(grid: Grid, eps, mu_x, lam_x, mu0, lam0,
                         axis_name=None):
    """f = div_staggered((C(x) - C0) : eps) in one fused pass.

    eps: (6, nx, ny, nz); mu_x/lam_x: (nx, ny, nz) effective iso moduli.
    Returns (3, nx, ny, nz).  With ``axis_name``, operates on the local
    x-slab inside shard_map (halo via ppermute)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = eps.shape[-3:]
    bx, by = _pick_bxy((nx, ny, nz), n_halo=6 + 2, n_out=3)

    eps_p = _pad_xy(eps, axis_name)
    mod_p = _pad_xy(jnp.stack([mu_x, lam_x]), axis_name)

    mu0f, lam0f = float(mu0), float(lam0)
    hxf = float(grid.nx / grid.dx)
    hyf = float(grid.ny / grid.dy)
    hzf = float(grid.nz / grid.dz)
    s = _Slices(bx, by)

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
        out_ref[0] = ((_win(t0, s.cx, s.cy) - _win(t0, s.mx, s.cy)) * hxf
                      + (_win(t5, s.cx, s.py) - _win(t5, s.cx, s.cy)) * hyf
                      + (_roll(_win(t4, s.cx, s.cy), -1, 2)
                         - _win(t4, s.cx, s.cy)) * hzf)
        # f1 = D+x(t5) + D-y(t1) + D+z(t3)
        out_ref[1] = ((_win(t5, s.px, s.cy) - _win(t5, s.cx, s.cy)) * hxf
                      + (_win(t1, s.cx, s.cy) - _win(t1, s.cx, s.my)) * hyf
                      + (_roll(_win(t3, s.cx, s.cy), -1, 2)
                         - _win(t3, s.cx, s.cy)) * hzf)
        # f2 = D+x(t4) + D+y(t3) + D-z(t2)
        out_ref[2] = ((_win(t4, s.px, s.cy) - _win(t4, s.cx, s.cy)) * hxf
                      + (_win(t3, s.cx, s.py) - _win(t3, s.cx, s.cy)) * hyf
                      + (_win(t2, s.cx, s.cy)
                         - _roll(_win(t2, s.cx, s.cy), 1, 2)) * hzf)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), eps.dtype),
        grid=(nx // bx, ny // by),
        in_specs=[_halo_spec(6, bx, by, nz), _halo_spec(2, bx, by, nz)],
        out_specs=pl.BlockSpec((3, bx, by, nz), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(eps_p, mod_p)
    return out


def stress_div_beta_staggered(grid: Grid, r, p_prev, beta, mu_x, lam_x,
                              mu0, lam0, axis_name=None):
    """Fused CG direction update + stress + divergence:

        p = r + beta * p_prev                (conjugate direction)
        f = div_staggered((C(x) - C0) : p)

    in one HBM pass; returns (f, p).  Folding the direction axpy into this
    kernel removes the separate p-update pass of the CG iteration
    (runCGElasticity p_k update, fibergen.cpp:23227-23229)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = r.shape[-3:]
    bx, by = _pick_bxy((nx, ny, nz), n_halo=6 + 6 + 2, n_out=3 + 6)

    r_p = _pad_xy(r, axis_name)
    pp_p = _pad_xy(p_prev, axis_name)
    mod_p = _pad_xy(jnp.stack([mu_x, lam_x]), axis_name)
    beta_a = jnp.asarray(beta, jnp.float32).reshape(1, 1)

    mu0f, lam0f = float(mu0), float(lam0)
    hxf = float(grid.nx / grid.dx)
    hyf = float(grid.ny / grid.dy)
    hzf = float(grid.nz / grid.dz)
    s = _Slices(bx, by)

    def kernel(r_ref, pp_ref, mod_ref, b_ref, f_ref, p_ref):
        b = b_ref[0, 0]
        p0 = r_ref[0] + b * pp_ref[0]
        p1 = r_ref[1] + b * pp_ref[1]
        p2 = r_ref[2] + b * pp_ref[2]
        p3 = r_ref[3] + b * pp_ref[3]
        p4 = r_ref[4] + b * pp_ref[4]
        p5 = r_ref[5] + b * pp_ref[5]

        p_ref[0] = _win(p0, s.cx, s.cy)
        p_ref[1] = _win(p1, s.cx, s.cy)
        p_ref[2] = _win(p2, s.cx, s.cy)
        p_ref[3] = _win(p3, s.cx, s.cy)
        p_ref[4] = _win(p4, s.cx, s.cy)
        p_ref[5] = _win(p5, s.cx, s.cy)

        dmu = 2.0 * (mod_ref[0] - mu0f)
        ltr = (mod_ref[1] - lam0f) * (p0 + p1 + p2)
        t0 = dmu * p0 + ltr
        t1 = dmu * p1 + ltr
        t2 = dmu * p2 + ltr
        t3 = dmu * p3
        t4 = dmu * p4
        t5 = dmu * p5

        f_ref[0] = ((_win(t0, s.cx, s.cy) - _win(t0, s.mx, s.cy)) * hxf
                    + (_win(t5, s.cx, s.py) - _win(t5, s.cx, s.cy)) * hyf
                    + (_roll(_win(t4, s.cx, s.cy), -1, 2)
                       - _win(t4, s.cx, s.cy)) * hzf)
        f_ref[1] = ((_win(t5, s.px, s.cy) - _win(t5, s.cx, s.cy)) * hxf
                    + (_win(t1, s.cx, s.cy) - _win(t1, s.cx, s.my)) * hyf
                    + (_roll(_win(t3, s.cx, s.cy), -1, 2)
                       - _win(t3, s.cx, s.cy)) * hzf)
        f_ref[2] = ((_win(t4, s.px, s.cy) - _win(t4, s.cx, s.cy)) * hxf
                    + (_win(t3, s.cx, s.py) - _win(t3, s.cx, s.cy)) * hyf
                    + (_win(t2, s.cx, s.cy)
                       - _roll(_win(t2, s.cx, s.cy), 1, 2)) * hzf)

    f, p = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((3, nx, ny, nz), r.dtype),
                   jax.ShapeDtypeStruct((6, nx, ny, nz), r.dtype)),
        grid=(nx // bx, ny // by),
        in_specs=[_halo_spec(6, bx, by, nz), _halo_spec(6, bx, by, nz),
                  _halo_spec(2, bx, by, nz),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((3, bx, by, nz), lambda i, j: (0, i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((6, bx, by, nz), lambda i, j: (0, i, j, 0),
                                memory_space=pltpu.VMEM)),
        interpret=INTERPRET,
    )(r_p, pp_p, mod_p, beta_a)
    return f, p


def _eps_exprs(u_ref, e_ref, s, hx, hy, hz):
    """The six staggered symmetrized-gradient components on a halo block."""
    ux, uy, uz = u_ref[0], u_ref[1], u_ref[2]
    e0 = e_ref[0, 0] + (_win(ux, s.px, s.cy) - _win(ux, s.cx, s.cy)) * hx
    e1 = e_ref[1, 0] + (_win(uy, s.cx, s.py) - _win(uy, s.cx, s.cy)) * hy
    e2 = e_ref[2, 0] + (_roll(_win(uz, s.cx, s.cy), -1, 2)
                        - _win(uz, s.cx, s.cy)) * hz
    e3 = e_ref[3, 0] + 0.5 * (
        (_win(uz, s.cx, s.cy) - _win(uz, s.cx, s.my)) * hy
        + (_win(uy, s.cx, s.cy) - _roll(_win(uy, s.cx, s.cy), 1, 2)) * hz)
    e4 = e_ref[4, 0] + 0.5 * (
        (_win(uz, s.cx, s.cy) - _win(uz, s.mx, s.cy)) * hx
        + (_win(ux, s.cx, s.cy) - _roll(_win(ux, s.cx, s.cy), 1, 2)) * hz)
    e5 = e_ref[5, 0] + 0.5 * (
        (_win(uy, s.cx, s.cy) - _win(uy, s.mx, s.cy)) * hx
        + (_win(ux, s.cx, s.cy) - _win(ux, s.cx, s.my)) * hy)
    return e0, e1, e2, e3, e4, e5


def eps_from_u_staggered(grid: Grid, E, u, axis_name=None):
    """eta = E + sym grad_staggered(u) in one fused pass.

    u: (3, nx, ny, nz); E: (6,).  Returns (6, nx, ny, nz)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = u.shape[-3:]
    bx, by = _pick_bxy((nx, ny, nz), n_halo=3, n_out=6)

    u_p = _pad_xy(u, axis_name)
    Ef = jnp.asarray(E, jnp.float32).reshape(6, 1)
    hx = float(grid.nx / grid.dx)
    hy = float(grid.ny / grid.dy)
    hz = float(grid.nz / grid.dz)
    s = _Slices(bx, by)

    def kernel(u_ref, e_ref, out_ref):
        e0, e1, e2, e3, e4, e5 = _eps_exprs(u_ref, e_ref, s, hx, hy, hz)
        out_ref[0] = e0
        out_ref[1] = e1
        out_ref[2] = e2
        out_ref[3] = e3
        out_ref[4] = e4
        out_ref[5] = e5

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((6, nx, ny, nz), u.dtype),
        grid=(nx // bx, ny // by),
        in_specs=[_halo_spec(3, bx, by, nz),
                  pl.BlockSpec((6, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((6, bx, by, nz), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(u_p, Ef)
    return out


def eps_from_u_dot_staggered(grid: Grid, E, u, p, axis_name=None):
    """eta = E + sym grad_staggered(u), fused with the CG denominator
    reduction sum_c w_c p_c (p_c - eta_c) (Voigt weights w = [1,1,1,2,2,2],
    innerProduct, fibergen.cpp:20871-20952) — removes the separate read of
    (p, eta) for the denominator.  Returns (eta, dot_raw) with dot_raw the
    UN-normalized sum (divide by nxyz outside).  With ``axis_name`` the
    per-slab partial sum is psum-reduced over the mesh."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = u.shape[-3:]
    bx, by = _pick_bxy((nx, ny, nz), n_halo=3 + 6, n_out=6)

    u_p = _pad_xy(u, axis_name)
    Ef = jnp.asarray(E, jnp.float32).reshape(6, 1)
    hx = float(grid.nx / grid.dx)
    hy = float(grid.ny / grid.dy)
    hz = float(grid.nz / grid.dz)
    s = _Slices(bx, by)

    def kernel(u_ref, e_ref, p_ref, out_ref, dot_ref):
        e0, e1, e2, e3, e4, e5 = _eps_exprs(u_ref, e_ref, s, hx, hy, hz)
        out_ref[0] = e0
        out_ref[1] = e1
        out_ref[2] = e2
        out_ref[3] = e3
        out_ref[4] = e4
        out_ref[5] = e5
        acc = (jnp.sum(p_ref[0] * (p_ref[0] - e0))
               + jnp.sum(p_ref[1] * (p_ref[1] - e1))
               + jnp.sum(p_ref[2] * (p_ref[2] - e2))
               + 2.0 * jnp.sum(p_ref[3] * (p_ref[3] - e3))
               + 2.0 * jnp.sum(p_ref[4] * (p_ref[4] - e4))
               + 2.0 * jnp.sum(p_ref[5] * (p_ref[5] - e5)))
        # sequential-grid Kahan accumulation into the scalar block: the
        # per-block sums are tree reductions, but the across-block chain is
        # sequential f32 — compensated summation keeps the denominator at
        # the precision of the XLA tree reduction it replaces
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init():
            dot_ref[0, 0] = jnp.float32(0.0)
            dot_ref[1, 0] = jnp.float32(0.0)
        y = acc - dot_ref[1, 0]
        t = dot_ref[0, 0] + y
        dot_ref[1, 0] = (t - dot_ref[0, 0]) - y
        dot_ref[0, 0] = t

    eta, dots = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((6, nx, ny, nz), u.dtype),
                   jax.ShapeDtypeStruct((2, 1), jnp.float32)),
        grid=(nx // bx, ny // by),
        in_specs=[_halo_spec(3, bx, by, nz),
                  pl.BlockSpec((6, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((6, bx, by, nz), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((6, bx, by, nz), lambda i, j: (0, i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, 1), lambda i, j: (0, 0),
                                memory_space=pltpu.SMEM)),
        interpret=INTERPRET,
    )(u_p, Ef, p)
    dot = dots[0, 0]
    if axis_name is not None:
        dot = jax.lax.psum(dot, axis_name)
    return eta, dot
