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

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..utils.logging import LOG
from .primitives import Fiber, HalfSpace, pack_fibers

# running count of fiber-distance evaluations performed by the voxelizer
# (get_distance_evals, fibergen.cpp:25087: the reference's default build
# returns 0 unless compiled with TEST_DIST_EVAL; here the count is real —
# one evaluation per primitive per (supersampled) voxel, the exact work the
# batched device kernels perform)
DIST_EVALS = 0


def reset_distance_evals():
    global DIST_EVALS
    DIST_EVALS = 0


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


# x-slab processing engages when the supersampled evaluation grid exceeds
# this many voxels (2^27 f32 = 512 MiB per temp array): a 512^3 grid at the
# default supersample=2 would otherwise need several 1024^3 temporaries at
# once (> HBM on one chip)
PHI_SLAB_VOXELS = 2 ** 27


def _pool_ss(phi, ss):
    """Average-pool by ss per axis via strided slices.  A
    reshape(nx, ss, ny, ss, nz, ss) would put size-ss dims minormost, and
    the TPU (8,128) tiled layout pads the minormost two dims — at ss=2
    that materializes a 64x-padded temporary (observed: a 256 GiB
    allocation for a 512^3 grid).  Strided slices keep full-size trailing
    dims."""
    acc = None
    for a in range(ss):
        for b in range(ss):
            for c in range(ss):
                s = phi[a::ss, b::ss, c::ss]
                acc = s if acc is None else acc + s
    return acc / float(ss ** 3)


def _phi_body(x, y, z, h, grid, fibers, params, dtype, ss):
    """phi on the (slab of the) supersampled grid spanned by broadcast
    coordinates x, y, z; pooled back to the output resolution.  Pure
    function of the coordinate arrays — jitted once and reused across
    x-slabs (the slab's x coordinates are the only changing argument)."""
    phi = jnp.zeros((x.shape[0], y.shape[0], z.shape[0]), dtype)

    if params is not None:
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

    mesh_phi = mesh_phi_contributions(grid, fibers, x, y, z, h, dtype)
    if mesh_phi is not None:
        phi = phi + mesh_phi

    phi = jnp.clip(phi, 0.0, 1.0)
    if ss > 1:
        phi = _pool_ss(phi, ss)
    return phi


def phi_field(grid: Grid, fibers: List[Fiber], supersample: int = 1,
              dtype=jnp.float32):
    """Volume-fraction field of a set of same-material fibers.

    Contributions of individual fibers are summed and clamped like
    integratePhiVoxel (fibergen.cpp:16681-16704).  Large supersampled
    grids are evaluated in x-slabs through one reused jit program so the
    working set stays bounded (PHI_SLAB_VOXELS)."""
    global DIST_EVALS
    ss = max(1, int(supersample))
    DIST_EVALS += len(fibers) * int(np.prod(grid.shape)) * ss ** 3
    x, y, z = _coords(grid, ss, dtype)
    h = (grid.dx / (grid.nx * ss), grid.dy / (grid.ny * ss),
         grid.dz / (grid.nz * ss))

    packed = pack_fibers(fibers)
    params = None
    if packed is not None:
        params = (
            jnp.asarray(packed.centers, dtype),
            jnp.asarray(packed.axes, dtype),
            jnp.asarray(packed.half_lengths, dtype),
            jnp.asarray(packed.radii, dtype),
            jnp.asarray(packed.flat),
        )

    fn = jax.jit(lambda xs, p: _phi_body(xs, y, z, h, grid, fibers, p,
                                         dtype, ss))

    nvox_ss = int(np.prod(grid.shape)) * ss ** 3
    if nvox_ss <= PHI_SLAB_VOXELS:
        return fn(x, params)

    # x-slab sweep: largest divisor of nx whose slab fits the budget
    per_row = ss ** 3 * grid.ny * grid.nz
    max_rows = max(1, PHI_SLAB_VOXELS // per_row)
    sx = max(d for d in range(1, max_rows + 1) if grid.nx % d == 0)
    LOG.info(f"phi voxelization in {grid.nx // sx} x-slabs of {sx} rows "
             f"(supersampled grid {nvox_ss} voxels)")
    outs = [fn(x[i * ss:(i + sx) * ss], params)
            for i in range(0, grid.nx, sx)]
    return jnp.concatenate(outs, axis=0)


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


@jax.jit
def _normalize_phi_jit(phis):
    rem = jnp.ones_like(phis[0])
    out = [None] * len(phis)
    for m in range(len(phis) - 1, -1, -1):
        vol = jnp.minimum(rem, phis[m])
        out[m] = vol
        rem = rem - vol
    return tuple(out), jnp.stack([p.mean() for p in out])


def normalize_phi(phis: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Sum_m phi_m = 1 with priority to later materials
    (normalizePhi, fibergen.cpp:17588-17645).

    One jitted program including the volume-fraction stats, with a single
    host sync: on the axon backend every EAGER jnp op is a separately
    remote-compiled program and the per-material float(mean()) syncs
    measured 409 s of a 412 s read_raw_data action at 128^3 (cProfile,
    2026-08-19) — the jitted version is one cacheable program."""
    out, vols = _normalize_phi_jit(tuple(phis))
    if LOG.enabled:
        for m, v in enumerate(np.asarray(vols)):
            LOG.info(f"material {m} volume fraction: {v:.6f}")
    return list(out)


def _translation_of(f) -> np.ndarray:
    t = getattr(f, "translation", None)
    return np.zeros(3) if t is None else np.asarray(t, dtype=np.float64)


def geometry_fields(grid: Grid, fibers: List[Fiber], dtype=jnp.float32):
    """Distance / normals / orientation / fiber_id / material_id /
    fiber_translation fields of the closest fiber per voxel (get_raw_field
    derived fields, fibergen.cpp:15396-15695; fiber_translation is the
    periodic-clone offset of the closest fiber, :6865-6884).

    One jitted program: the body is a long chain of full/zeros/where/scan
    ops, and on the axon backend every EAGER op remote-compiles its own
    tiny program (~5-30 s each through the tunnel — the round-5 demo sweep
    measured the trivial normals demo at 533 s, nearly all of it these
    compiles)."""
    return jax.jit(lambda: _geometry_fields_impl(grid, fibers, dtype))()


def _geometry_fields_impl(grid: Grid, fibers: List[Fiber], dtype):
    global DIST_EVALS
    x, y, z = _coords(grid, 1, dtype)
    big = jnp.asarray(np.finfo(np.dtype(dtype)).max / 4, dtype)
    shape = grid.shape
    nvox = int(np.prod(shape))

    dmin = jnp.full(shape, big, dtype)
    normal = jnp.zeros((3,) + shape, dtype)
    orient = jnp.zeros((3,) + shape, dtype)
    fid = jnp.full(shape, -1, jnp.int32)
    mid = jnp.full(shape, -1, jnp.int32)
    trans = jnp.zeros((3,) + shape, dtype)

    from .primitives import Capsule, Cylinder
    packed = pack_fibers(fibers)
    caps = [f for f in fibers if isinstance(f, (Capsule, Cylinder))]
    if packed is not None:
        mats = jnp.asarray(np.array([f.material for f in caps]), jnp.int32)
        trs = jnp.asarray(np.stack([_translation_of(f) for f in caps]), dtype)
        params = (
            jnp.asarray(packed.centers, dtype),
            jnp.asarray(packed.axes, dtype),
            jnp.asarray(packed.half_lengths, dtype),
            jnp.asarray(packed.radii, dtype),
            jnp.asarray(packed.flat),
            jnp.asarray(packed.ids),
            mats,
            trs,
        )
        DIST_EVALS += len(caps) * nvox

        def body(carry, p):
            dmin, normal, orient, fid, mid, trans = carry
            c, a, hl, R, flat, i, m, tr = p
            d, n = _capsule_dn(x, y, z, c, a, hl, R, flat)
            take = d < dmin
            dmin = jnp.where(take, d, dmin)
            normal = jnp.where(take[None], jnp.stack(n), normal)
            orient = jnp.where(take[None],
                               a.reshape(3, 1, 1, 1).astype(dtype), orient)
            fid = jnp.where(take, i, fid)
            mid = jnp.where(take, m, mid)
            trans = jnp.where(take[None], tr.reshape(3, 1, 1, 1), trans)
            return (dmin, normal, orient, fid, mid, trans), None

        (dmin, normal, orient, fid, mid, trans), _ = jax.lax.scan(
            body, (dmin, normal, orient, fid, mid, trans), params)

    for f in fibers:
        if isinstance(f, HalfSpace):
            DIST_EVALS += nvox
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
            tf = jnp.broadcast_to(jnp.asarray(_translation_of(f), dtype)
                                  .reshape(3, 1, 1, 1), (3,) + shape)
            trans = jnp.where(take[None], tf, trans)

    # mesh primitives: tets (incl. expanded TetMesh), triangles, STL surfaces
    # (the reference computes these through the same closest-fiber query,
    # fibergen.cpp:15518-15584)
    from .primitives import Tetrahedron, TetMesh, Triangle, TriangleSurface

    tets = [f for f in fibers if isinstance(f, Tetrahedron)]
    for f in fibers:
        if isinstance(f, TetMesh):
            for t in f.tets:
                tt = Tetrahedron(verts=f.points[t], material=f.material,
                                 fiber_id=f.fiber_id)
                tt.translation = getattr(f, "translation", None)
                tets.append(tt)
    if tets:
        nrm = jnp.asarray(np.stack(
            [np.stack([pl[0] for pl in t._faces]) for t in tets]), dtype)
        off = jnp.asarray(np.stack(
            [np.array([pl[0] @ pl[1] for pl in t._faces]) for t in tets]), dtype)
        ids = jnp.asarray(np.array([t.fiber_id for t in tets]), jnp.int32)
        ms = jnp.asarray(np.array([t.material for t in tets]), jnp.int32)
        trs = jnp.asarray(np.stack([_translation_of(t) for t in tets]), dtype)
        DIST_EVALS += len(tets) * nvox

        def tbody(carry, p):
            dmin, normal, orient, fid, mid, trans = carry
            nr, of, i, m, tr = p
            d, n = _tet_dn(x, y, z, nr, of)
            take = d < dmin
            dmin = jnp.where(take, d, dmin)
            nf = jnp.stack(jnp.broadcast_arrays(*n)).astype(dtype)
            normal = jnp.where(take[None], nf, normal)
            orient = jnp.where(take[None], nf, orient)
            fid = jnp.where(take, i, fid)
            mid = jnp.where(take, m, mid)
            trans = jnp.where(take[None], tr.reshape(3, 1, 1, 1), trans)
            return (dmin, normal, orient, fid, mid, trans), None

        (dmin, normal, orient, fid, mid, trans), _ = jax.lax.scan(
            tbody, (dmin, normal, orient, fid, mid, trans),
            (nrm, off, ids, ms, trs))

    tris = [f for f in fibers if isinstance(f, Triangle)]
    tri_groups = [(jnp.asarray(np.stack([np.stack([t.v0, t.v1, t.v2])
                                         for t in tris]), dtype),
                   jnp.asarray(np.array([t.fiber_id for t in tris]), jnp.int32),
                   jnp.asarray(np.array([t.material for t in tris]), jnp.int32),
                   jnp.asarray(np.stack([_translation_of(t) for t in tris]),
                               dtype),
                   False)] if tris else []
    for f in fibers:
        if isinstance(f, TriangleSurface):
            V = jnp.stack([jnp.asarray(f.V0, dtype), jnp.asarray(f.V1, dtype),
                           jnp.asarray(f.V2, dtype)], axis=1)
            nt = V.shape[0]
            tri_groups.append((
                V, jnp.full(nt, f.fiber_id, jnp.int32),
                jnp.full(nt, f.material, jnp.int32),
                jnp.broadcast_to(jnp.asarray(_translation_of(f), dtype),
                                 (nt, 3)), bool(f.fill)))
    for V, ids, ms, trs, signed in tri_groups:
        DIST_EVALS += int(V.shape[0]) * nvox

        def tribody(carry, p):
            dmin, normal, orient, fid, mid, trans = carry
            v, i, m, tr = p
            d, s, n = _tri_dn(x, y, z, v[0], v[1], v[2])
            if signed:
                d = d * s
            take = d < dmin
            dmin = jnp.where(take, d, dmin)
            nf = jnp.stack(n).reshape(3, 1, 1, 1).astype(dtype)
            nf = jnp.broadcast_to(nf, (3,) + shape)
            normal = jnp.where(take[None], nf, normal)
            orient = jnp.where(take[None], nf, orient)
            fid = jnp.where(take, i, fid)
            mid = jnp.where(take, m, mid)
            trans = jnp.where(take[None], tr.reshape(3, 1, 1, 1), trans)
            return (dmin, normal, orient, fid, mid, trans), None

        (dmin, normal, orient, fid, mid, trans), _ = jax.lax.scan(
            tribody, (dmin, normal, orient, fid, mid, trans), (V, ids, ms, trs))

    return {
        "distance": dmin,
        "normals": normal,
        "orientation": orient,
        "fiber_id": fid,
        "material_id": mid,
        "fiber_translation": trans,
    }


# ---------------------------------------------------------------------------
# mesh primitives: device kernels
# ---------------------------------------------------------------------------

def _tri_closest(x, y, z, v0, v1, v2):
    """Closest point on a triangle for broadcast coordinates (Ericson's
    region algorithm, branchless).  Returns (cx, cy, cz)."""
    abx, aby, abz = v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2]
    acx, acy, acz = v2[0] - v0[0], v2[1] - v0[1], v2[2] - v0[2]
    apx, apy, apz = x - v0[0], y - v0[1], z - v0[2]
    d1 = abx * apx + aby * apy + abz * apz
    d2 = acx * apx + acy * apy + acz * apz
    bpx, bpy, bpz = x - v1[0], y - v1[1], z - v1[2]
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz
    cpx, cpy, cpz = x - v2[0], y - v2[1], z - v2[2]
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4
    eps = 1e-30

    # interior barycentric
    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
    v_in = vb / denom
    w_in = vc / denom
    # edge parameters
    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3)
    t_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6)
    t_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6))
    t_ab = jnp.clip(t_ab, 0.0, 1.0)
    t_ac = jnp.clip(t_ac, 0.0, 1.0)
    t_bc = jnp.clip(t_bc, 0.0, 1.0)

    r1 = (d1 <= 0) & (d2 <= 0)                      # vertex v0
    r2 = (d3 >= 0) & (d4 <= d3)                     # vertex v1
    r3 = (d6 >= 0) & (d5 <= d6)                     # vertex v2
    r4 = (vc <= 0) & (d1 >= 0) & (d3 <= 0)          # edge ab
    r5 = (vb <= 0) & (d2 >= 0) & (d6 <= 0)          # edge ac
    r6 = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)  # edge bc

    def pick(comp_v0, comp_ab, comp_ac, comp_bc_a, comp_bc_d):
        interior = comp_v0 + comp_ab * v_in + comp_ac * w_in
        c = interior
        c = jnp.where(r6, comp_bc_a + t_bc * comp_bc_d, c)
        c = jnp.where(r5, comp_v0 + t_ac * comp_ac, c)
        c = jnp.where(r4, comp_v0 + t_ab * comp_ab, c)
        c = jnp.where(r3, comp_v0 + comp_ac, c)
        c = jnp.where(r2, comp_v0 + comp_ab, c)
        c = jnp.where(r1, comp_v0, c)
        return c

    bcx, bcy, bcz = v2[0] - v1[0], v2[1] - v1[1], v2[2] - v1[2]
    cx = pick(v0[0], abx, acx, v1[0], bcx)
    cy = pick(v0[1], aby, acy, v1[1], bcy)
    cz = pick(v0[2], abz, acz, v1[2], bcz)
    return cx, cy, cz


def _tri_dn(x, y, z, v0, v1, v2):
    """Signed distance (sign from the triangle plane normal) and unit normal."""
    cx, cy, cz = _tri_closest(x, y, z, v0, v1, v2)
    dx_, dy_, dz_ = x - cx, y - cy, z - cz
    d = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    nx = (v1[1] - v0[1]) * (v2[2] - v0[2]) - (v1[2] - v0[2]) * (v2[1] - v0[1])
    ny = (v1[2] - v0[2]) * (v2[0] - v0[0]) - (v1[0] - v0[0]) * (v2[2] - v0[2])
    nz = (v1[0] - v0[0]) * (v2[1] - v0[1]) - (v1[1] - v0[1]) * (v2[0] - v0[0])
    nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nn = jnp.where(nn < 1e-30, 1e-30, nn)
    nx, ny, nz = nx / nn, ny / nn, nz / nn
    s = jnp.sign((x - v0[0]) * nx + (y - v0[1]) * ny + (z - v0[2]) * nz)
    s = jnp.where(s == 0, 1.0, s)
    return d, s, (nx, ny, nz)


def _tet_dn(x, y, z, normals, offsets):
    """Signed distance of a tetrahedron as max over 4 outward face planes
    (exact inside, conservative outside edges).  normals (4,3), offsets (4,)."""
    ds = [normals[k, 0] * x + normals[k, 1] * y + normals[k, 2] * z
          - offsets[k] for k in range(4)]
    d = ds[0]
    arg = jnp.zeros_like(d, dtype=jnp.int32)
    for k in range(1, 4):
        take = ds[k] > d
        d = jnp.where(take, ds[k], d)
        arg = jnp.where(take, k, arg)
    n = tuple(jnp.take(normals[:, c], arg) for c in range(3))
    return d, n


def mesh_phi_contributions(grid, fibers, x, y, z, h, dtype):
    """phi contributions from triangle/tet/surface primitives (added to the
    capsule/halfspace contributions in phi_field)."""
    from .primitives import Tetrahedron, TetMesh, Triangle, TriangleSurface

    phi = None

    def add(p):
        nonlocal phi
        phi = p if phi is None else phi + p

    # solid tetrahedra (including expanded TetMesh)
    tets = [f for f in fibers if isinstance(f, Tetrahedron)]
    for f in fibers:
        if isinstance(f, TetMesh):
            tets.extend(Tetrahedron(verts=f.points[t], material=f.material,
                                    fiber_id=f.fiber_id) for t in f.tets)
    if tets:
        normals = jnp.asarray(np.stack(
            [np.stack([pl[0] for pl in t._faces]) for t in tets]), dtype)
        offsets = jnp.asarray(np.stack(
            [np.array([pl[0] @ pl[1] for pl in t._faces]) for t in tets]), dtype)

        def body(carry, p):
            nrm, off = p
            d, n = _tet_dn(x, y, z, nrm, off)
            return carry + plane_cut_fraction(d, n[0], n[1], n[2], h), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(x.shape[:1] + y.shape[:1] + z.shape, dtype
                            ).reshape(x.shape[0], y.shape[0], z.shape[0]),
            (normals, offsets))
        add(acc)

    # thin triangles: slab of one (supersampled) voxel thickness
    tris = [f for f in fibers if isinstance(f, Triangle)]
    if tris:
        V = jnp.asarray(np.stack([np.stack([t.v0, t.v1, t.v2]) for t in tris]),
                        dtype)
        hmin = min(h)

        def body(carry, v):
            d, s, n = _tri_dn(x, y, z, v[0], v[1], v[2])
            frac = jnp.clip(1.0 - d / hmin, 0.0, 1.0)
            return carry + frac, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((x.shape[0], y.shape[0], z.shape[0]), dtype), V)
        add(acc)

    # closed triangle surfaces (STL): signed distance to the closest triangle
    for f in fibers:
        if not isinstance(f, TriangleSurface):
            continue
        V0 = jnp.asarray(f.V0, dtype)
        V1 = jnp.asarray(f.V1, dtype)
        V2 = jnp.asarray(f.V2, dtype)
        big = jnp.asarray(np.finfo(np.dtype(dtype)).max / 4, dtype)
        shape = (x.shape[0], y.shape[0], z.shape[0])
        init = (jnp.full(shape, big, dtype), jnp.ones(shape, dtype),
                jnp.zeros((3,) + shape, dtype))

        def body(carry, v):
            dmin, sign, nrm = carry
            d, s, n = _tri_dn(x, y, z, v[0], v[1], v[2])
            take = d < dmin
            dmin = jnp.where(take, d, dmin)
            sign = jnp.where(take, s, sign)
            # triangle normals are per-triangle scalars -> broadcast to field
            nstack = jnp.stack(n).reshape(3, 1, 1, 1)
            nrm = jnp.where(take[None], nstack, nrm)
            return (dmin, sign, nrm), None

        (dmin, sign, nrm), _ = jax.lax.scan(
            body, init, jnp.stack([V0, V1, V2], axis=1))
        if f.fill:
            add(plane_cut_fraction(dmin * sign, nrm[0], nrm[1], nrm[2], h))
        else:
            add(jnp.clip(1.0 - dmin / min(h), 0.0, 1.0))

    return phi
