"""Voxelization: fibers -> per-phase volume-fraction fields on device.

TPU-native equivalent of LSSolver::initPhi + integratePhiVoxel
(fibergen.cpp:16622-16760, 17489-17645).  Instead of per-voxel recursive
halfspace cuts on the host, every voxel computes, for every fiber, the exact
volume fraction cut from the voxel by the tangent plane of the fiber surface
(signed distance + SDF normal at the voxel center) — the reference's level-0
composite-voxel rule — fully vectorized as a lax.scan over fibers.  Optional
supersampling refines curved interfaces like the reference's recursive
subdivision, via average pooling.

The plane/box cut volume uses the closed form of the CDF of a sum of three
independent uniforms (the reference's halfspace_box_cut_volume,
fibergen.cpp:1377-1578, in closed form instead of case analysis).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..utils.logging import LOG
from .primitives import Fiber, HalfSpace, pack_fibers


def _coords(grid: Grid, ss: int, dtype):
    """Supersampled voxel-center coordinate arrays, broadcastable."""
    def ax(n, d, o):
        return o + (np.arange(n * ss) + 0.5) * (d / (n * ss))
    x = jnp.asarray(ax(grid.nx, grid.dx, grid.x0[0]), dtype).reshape(-1, 1, 1)
    y = jnp.asarray(ax(grid.ny, grid.dy, grid.x0[1]), dtype).reshape(-1, 1)
    z = jnp.asarray(ax(grid.nz, grid.dz, grid.x0[2]), dtype)
    return x, y, z


def plane_cut_fraction(d, n0, n1, n2, h):
    """Volume fraction of a voxel with edge lengths h=(h0,h1,h2) on the
    inside (negative) side of a plane at signed distance d from the voxel
    center with unit normal n.

    Closed form: P(U0+U1+U2 <= -d) with U_i ~ Uniform(-a_i, a_i),
    a_i = |n_i| h_i / 2 — the CDF of a sum of three uniforms (equivalent to
    halfspace_box_cut_volume, fibergen.cpp:1377-1578).  Evaluated as a
    stable nested central difference of relu(x)^3 with analytic limits per
    regime, so axis-aligned normals (degenerate a_i) suffer no catastrophic
    cancellation even in float32."""
    b0 = jnp.abs(n0) * (0.5 * h[0])
    b1 = jnp.abs(n1) * (0.5 * h[1])
    b2 = jnp.abs(n2) * (0.5 * h[2])
    # sort: a0 = max (the outermost, well-conditioned difference),
    # a2 = min (innermost), with a small relative floor on the minor widths
    a0 = jnp.maximum(b0, jnp.maximum(b1, b2))
    amin = jnp.minimum(b0, jnp.minimum(b1, b2))
    amid = (b0 + b1 + b2) - a0 - amin
    rel_eps = 1e-6
    a1 = jnp.maximum(amid, rel_eps * a0)
    a2 = jnp.maximum(amin, rel_eps * a0)

    t = -d

    def k(y):
        """Delta_{a2} relu(y)^3, stable: exact polynomial away from the kink."""
        quad = 2.0 * a2 * (3.0 * y * y + a2 * a2)
        direct = jnp.maximum(y + a2, 0.0) ** 3
        return jnp.where(y >= a2, quad, jnp.where(y <= -a2, 0.0, direct))

    def hfun(x):
        """(Delta_{a1} Delta_{a2} relu^3)(x) / (24 a1 a2), stable: equals x
        in the fully-linear regime, 0 below, nested differences near the kink."""
        inner = (k(x + a1) - k(x - a1)) / (24.0 * a1 * a2)
        return jnp.where(x >= a1 + a2, x,
                         jnp.where(x <= -(a1 + a2), 0.0, inner))

    f = (hfun(t + a0) - hfun(t - a0)) / (2.0 * a0)
    return jnp.clip(f, 0.0, 1.0)


def _capsule_dn(x, y, z, c, a, hl, R, flat):
    """Signed distance and outward normal of one capsule/cylinder fiber at
    broadcast coordinates.  flat=1 selects flat caps (cylinder)."""
    qx, qy, qz = x - c[0], y - c[1], z - c[2]
    t = qx * a[0] + qy * a[1] + qz * a[2]
    tc = jnp.clip(t, -hl, hl)

    # capsule: distance to core segment
    dx_, dy_, dz_ = qx - tc * a[0], qy - tc * a[1], qz - tc * a[2]
    r = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    d_cap = r - R
    rs = jnp.maximum(r, 1e-30)
    n_cap = (dx_ / rs, dy_ / rs, dz_ / rs)

    # cylinder: radial/axial decomposition with flat caps
    rx, ry, rz = qx - t * a[0], qy - t * a[1], qz - t * a[2]
    rr = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    dr = rr - R
    da = jnp.abs(t) - hl
    u = jnp.maximum(dr, 0.0)
    v = jnp.maximum(da, 0.0)
    d_out = jnp.sqrt(u * u + v * v)
    d_cyl = d_out + jnp.minimum(jnp.maximum(dr, da), 0.0)
    rrs = jnp.maximum(rr, 1e-30)
    sa = jnp.sign(t)
    # outward normal: blend of radial and axial parts
    outside = d_out > 0
    wr = jnp.where(outside, u / jnp.maximum(d_out, 1e-30),
                   (dr >= da).astype(rr.dtype))
    wa = jnp.where(outside, v / jnp.maximum(d_out, 1e-30),
                   (dr < da).astype(rr.dtype))
    n_cyl = (wr * rx / rrs + wa * sa * a[0],
             wr * ry / rrs + wa * sa * a[1],
             wr * rz / rrs + wa * sa * a[2])

    d = jnp.where(flat, d_cyl, d_cap)
    n = tuple(jnp.where(flat, nc, nk) for nc, nk in zip(n_cyl, n_cap))
    return d, n


def phi_field(grid: Grid, fibers: List[Fiber], supersample: int = 1,
              dtype=jnp.float32):
    """Volume-fraction field of a set of same-material fibers.

    Contributions of individual fibers are summed and clamped like
    integratePhiVoxel (fibergen.cpp:16681-16704)."""
    ss = max(1, int(supersample))
    x, y, z = _coords(grid, ss, dtype)
    h = (grid.dx / (grid.nx * ss), grid.dy / (grid.ny * ss),
         grid.dz / (grid.nz * ss))

    phi = jnp.zeros((grid.nx * ss, grid.ny * ss, grid.nz * ss), dtype)

    packed = pack_fibers(fibers)
    if packed is not None:
        params = (
            jnp.asarray(packed.centers, dtype),
            jnp.asarray(packed.axes, dtype),
            jnp.asarray(packed.half_lengths, dtype),
            jnp.asarray(packed.radii, dtype),
            jnp.asarray(packed.flat),
        )

        def body(phi, p):
            c, a, hl, R, flat = p
            d, n = _capsule_dn(x, y, z, c, a, hl, R, flat)
            return phi + plane_cut_fraction(d, n[0], n[1], n[2], h), None

        phi, _ = jax.lax.scan(body, phi, params)

    for f in fibers:
        if isinstance(f, HalfSpace):
            nv = np.asarray(f.normal, dtype=np.float64)
            nv = nv / np.linalg.norm(nv)
            d = ((x - f.point[0]) * nv[0] + (y - f.point[1]) * nv[1]
                 + (z - f.point[2]) * nv[2])
            phi = phi + plane_cut_fraction(
                d, jnp.full_like(d, nv[0]), jnp.full_like(d, nv[1]),
                jnp.full_like(d, nv[2]), h)

    phi = jnp.clip(phi, 0.0, 1.0)
    if ss > 1:
        phi = phi.reshape(grid.nx, ss, grid.ny, ss, grid.nz, ss).mean(
            axis=(1, 3, 5))
    return phi


def voxelize(grid: Grid, fibers: List[Fiber], n_materials: int,
             matrix_material: int = 0, supersample: int = 1,
             dtype=jnp.float32) -> List[jnp.ndarray]:
    """Per-material volume-fraction fields with matrix fill + normalization
    (initPhi + normalizePhi, fibergen.cpp:17489-17645: later materials have
    priority, the matrix gets the remainder)."""
    phis = []
    for m in range(n_materials):
        if m == matrix_material:
            phis.append(jnp.ones(grid.shape, dtype))
        else:
            fl = [f for f in fibers if f.material == m]
            phis.append(phi_field(grid, fl, supersample, dtype)
                        if fl else jnp.zeros(grid.shape, dtype))
    return normalize_phi(phis)


def normalize_phi(phis: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Sum_m phi_m = 1 with priority to later materials
    (normalizePhi, fibergen.cpp:17588-17645)."""
    rem = jnp.ones_like(phis[0])
    out = [None] * len(phis)
    for m in range(len(phis) - 1, -1, -1):
        vol = jnp.minimum(rem, phis[m])
        out[m] = vol
        rem = rem - vol
    for m, p in enumerate(out):
        LOG.info(f"material {m} volume fraction: {float(p.mean()):.6f}")
    return out


def geometry_fields(grid: Grid, fibers: List[Fiber], dtype=jnp.float32):
    """Distance / normals / orientation / fiber_id / material_id fields of
    the closest fiber per voxel (get_raw_field derived fields,
    fibergen.cpp:15396-15695)."""
    x, y, z = _coords(grid, 1, dtype)
    big = jnp.asarray(np.finfo(np.dtype(dtype)).max / 4, dtype)
    shape = grid.shape

    dmin = jnp.full(shape, big, dtype)
    normal = jnp.zeros((3,) + shape, dtype)
    orient = jnp.zeros((3,) + shape, dtype)
    fid = jnp.full(shape, -1, jnp.int32)
    mid = jnp.full(shape, -1, jnp.int32)

    packed = pack_fibers(fibers)
    caps = [f for f in fibers if not isinstance(f, HalfSpace)]
    if packed is not None:
        mats = jnp.asarray(np.array([f.material for f in caps]), jnp.int32)
        params = (
            jnp.asarray(packed.centers, dtype),
            jnp.asarray(packed.axes, dtype),
            jnp.asarray(packed.half_lengths, dtype),
            jnp.asarray(packed.radii, dtype),
            jnp.asarray(packed.flat),
            jnp.asarray(packed.ids),
            mats,
        )

        def body(carry, p):
            dmin, normal, orient, fid, mid = carry
            c, a, hl, R, flat, i, m = p
            d, n = _capsule_dn(x, y, z, c, a, hl, R, flat)
            take = d < dmin
            dmin = jnp.where(take, d, dmin)
            normal = jnp.where(take[None], jnp.stack(n), normal)
            orient = jnp.where(take[None],
                               a.reshape(3, 1, 1, 1).astype(dtype), orient)
            fid = jnp.where(take, i, fid)
            mid = jnp.where(take, m, mid)
            return (dmin, normal, orient, fid, mid), None

        (dmin, normal, orient, fid, mid), _ = jax.lax.scan(
            body, (dmin, normal, orient, fid, mid), params)

    for f in fibers:
        if isinstance(f, HalfSpace):
            nv = np.asarray(f.normal, dtype=np.float64)
            nv = nv / np.linalg.norm(nv)
            d = ((x - f.point[0]) * nv[0] + (y - f.point[1]) * nv[1]
                 + (z - f.point[2]) * nv[2]).astype(dtype)
            take = d < dmin
            dmin = jnp.where(take, d, dmin)
            nfield = jnp.broadcast_to(
                jnp.asarray(nv, dtype).reshape(3, 1, 1, 1), (3,) + shape)
            normal = jnp.where(take[None], nfield, normal)
            orient = jnp.where(take[None], nfield, orient)
            fid = jnp.where(take, f.fiber_id, fid)
            mid = jnp.where(take, f.material, mid)

    return {
        "distance": dmin,
        "normals": normal,
        "orientation": orient,
        "fiber_id": fid,
        "material_id": mid,
    }
