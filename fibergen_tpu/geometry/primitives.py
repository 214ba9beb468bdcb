"""Geometric fiber primitives.

Host-side dataclasses describing fibers (used by the sequential RSA
generator) plus batched device-side signed-distance evaluation (used by the
voxelizer).  Redesign of the reference's Fiber class hierarchy
(fibergen.cpp:3011-5642): instead of virtual per-point distance calls, the
primitives of one type are packed into parameter arrays and evaluated for
all voxels at once on the TPU.

Conventions: signed distance < 0 inside the fiber; ``axis`` is a unit
vector; capsule/cylinder length L is the length of the core segment
(total capsule length = L + 2R).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Fiber:
    material: int = 0
    fiber_id: int = 0

    def volume(self) -> float:
        raise NotImplementedError

    def orientation(self) -> np.ndarray:
        return np.array([0.0, 0.0, 1.0])

    def distance(self, p: np.ndarray) -> np.ndarray:
        """Signed distance for points p (..., 3) (host, numpy)."""
        raise NotImplementedError

    def translated(self, t) -> "Fiber":
        raise NotImplementedError

    def bbox(self):
        raise NotImplementedError


@dataclasses.dataclass
class Capsule(Fiber):
    """Cylinder with hemispherical caps (CapsuleFiber, fibergen.cpp:5236);
    L = 0 gives a sphere."""

    center: np.ndarray = None
    axis: np.ndarray = None
    length: float = 0.0
    radius: float = 1.0

    def volume(self):
        R, L = self.radius, self.length
        return np.pi * R * R * L + 4.0 / 3.0 * np.pi * R ** 3

    def orientation(self):
        return np.asarray(self.axis, dtype=np.float64)

    def distance(self, p):
        q = np.asarray(p, dtype=np.float64) - self.center
        t = np.clip(q @ self.axis, -0.5 * self.length, 0.5 * self.length)
        d = q - t[..., None] * self.axis
        return np.sqrt((d * d).sum(-1)) - self.radius

    def translated(self, t):
        return Capsule(material=self.material, fiber_id=self.fiber_id,
                       center=self.center + np.asarray(t), axis=self.axis,
                       length=self.length, radius=self.radius)

    def bbox(self):
        h = 0.5 * self.length * np.abs(self.axis) + self.radius
        return self.center - h, self.center + h


@dataclasses.dataclass
class Cylinder(Fiber):
    """Finite cylinder with flat caps (CylindricalFiber, fibergen.cpp:3648)."""

    center: np.ndarray = None
    axis: np.ndarray = None
    length: float = 0.0
    radius: float = 1.0

    def volume(self):
        return np.pi * self.radius ** 2 * self.length

    def orientation(self):
        return np.asarray(self.axis, dtype=np.float64)

    def distance(self, p):
        q = np.asarray(p, dtype=np.float64) - self.center
        t = q @ self.axis
        rad = q - t[..., None] * self.axis
        dr = np.sqrt((rad * rad).sum(-1)) - self.radius
        da = np.abs(t) - 0.5 * self.length
        outside = np.sqrt(np.maximum(dr, 0) ** 2 + np.maximum(da, 0) ** 2)
        inside = np.minimum(np.maximum(dr, da), 0.0)
        return outside + inside

    def translated(self, t):
        return Cylinder(material=self.material, fiber_id=self.fiber_id,
                        center=self.center + np.asarray(t), axis=self.axis,
                        length=self.length, radius=self.radius)

    def bbox(self):
        # loose: treat like capsule bbox
        h = 0.5 * self.length * np.abs(self.axis) + self.radius
        return self.center - h, self.center + h


@dataclasses.dataclass
class HalfSpace(Fiber):
    """Half space n.(x - p) <= 0 (HalfSpaceFiber, fibergen.cpp:5528)."""

    point: np.ndarray = None
    normal: np.ndarray = None

    def volume(self):
        return np.inf

    def orientation(self):
        return np.asarray(self.normal, dtype=np.float64)

    def distance(self, p):
        return (np.asarray(p, dtype=np.float64) - self.point) @ self.normal

    def translated(self, t):
        return HalfSpace(material=self.material, fiber_id=self.fiber_id,
                         point=self.point + np.asarray(t), normal=self.normal)

    def bbox(self):
        inf = np.full(3, np.inf)
        return -inf, inf


def sphere(center, radius, **kw) -> Capsule:
    return Capsule(center=np.asarray(center, dtype=np.float64),
                   axis=np.array([0.0, 0.0, 1.0]), length=0.0,
                   radius=radius, **kw)


# ---------------------------------------------------------------------------
# fiber-fiber distances (host, for RSA collision tests)
# ---------------------------------------------------------------------------

def _segment_points(f) -> tuple:
    a = np.asarray(f.axis, dtype=np.float64)
    c = np.asarray(f.center, dtype=np.float64)
    h = 0.5 * f.length
    return c - h * a, c + h * a


def segment_segment_distance(p1, q1, P2, Q2):
    """Min distance between segment (p1,q1) and a batch of segments
    (P2[i], Q2[i]).  Standard clamped closest-point algorithm, vectorized."""
    p1 = np.asarray(p1); q1 = np.asarray(q1)
    P2 = np.atleast_2d(P2); Q2 = np.atleast_2d(Q2)
    d1 = q1 - p1                      # (3,)
    d2 = Q2 - P2                      # (n, 3)
    r = p1 - P2                       # (n, 3)
    a = float(d1 @ d1)
    e = (d2 * d2).sum(-1)
    f = (d2 * r).sum(-1)
    eps = 1e-30

    c = r @ d1
    b = d2 @ d1
    denom = a * e - b * b

    s = np.where(denom > eps, np.clip((b * f - c * e) / np.maximum(denom, eps), 0, 1), 0.0)
    t = (b * s + f) / np.maximum(e, eps)
    # re-clamp t and recompute s
    t_cl = np.clip(t, 0.0, 1.0)
    s = np.where(t != t_cl,
                 np.clip((b * t_cl - c) / max(a, eps), 0, 1), s)
    t = t_cl
    # degenerate segment 1 (a ~ 0)
    if a <= eps:
        s = np.zeros_like(t)
        t = np.clip(f / np.maximum(e, eps), 0, 1)
    c1 = p1 + s[:, None] * d1
    c2 = P2 + t[:, None] * d2
    diff = c1 - c2
    return np.sqrt((diff * diff).sum(-1))


def fiber_fiber_distance(f, others: List[Fiber]) -> np.ndarray:
    """Surface-surface distance between fiber f and a list of fibers
    (capsule metric; cylinders are treated by their bounding capsule, a
    conservative approximation of CylindricalFiber::distanceTo)."""
    if not others:
        return np.empty(0)
    if isinstance(f, HalfSpace) or any(isinstance(o, HalfSpace) for o in others):
        # halfspaces: distance from the other fiber's segment to the plane
        out = np.empty(len(others))
        for i, o in enumerate(others):
            if isinstance(f, HalfSpace):
                p, q = _segment_points(o) if hasattr(o, "length") else (o.point, o.point)
                d = min(float(f.distance(p)), float(f.distance(q))) - getattr(o, "radius", 0.0)
            else:
                p, q = _segment_points(f)
                d = min(float(o.distance(p)), float(o.distance(q))) - f.radius
            out[i] = d
        return out
    p1, q1 = _segment_points(f)
    P2 = np.stack([_segment_points(o)[0] for o in others])
    Q2 = np.stack([_segment_points(o)[1] for o in others])
    R2 = np.array([o.radius for o in others])
    d = segment_segment_distance(p1, q1, P2, Q2)
    return d - f.radius - R2


# ---------------------------------------------------------------------------
# packed device-side representation
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PackedFibers:
    """Array-of-struct packing of capsule/cylinder fibers for device kernels:
    centers (F,3), axes (F,3), half-lengths (F,), radii (F,), flat (F,) bool
    (flat caps = cylinder), ids (F,)."""

    centers: np.ndarray
    axes: np.ndarray
    half_lengths: np.ndarray
    radii: np.ndarray
    flat: np.ndarray
    ids: np.ndarray

    @property
    def count(self):
        return self.centers.shape[0]


def pack_fibers(fibers: List[Fiber]) -> Optional[PackedFibers]:
    caps = [f for f in fibers if isinstance(f, (Capsule, Cylinder))]
    if not caps:
        return None
    return PackedFibers(
        centers=np.stack([f.center for f in caps]).astype(np.float64),
        axes=np.stack([f.axis for f in caps]).astype(np.float64),
        half_lengths=np.array([0.5 * f.length for f in caps]),
        radii=np.array([f.radius for f in caps]),
        flat=np.array([isinstance(f, Cylinder) for f in caps]),
        ids=np.array([f.fiber_id for f in caps], dtype=np.int32),
    )
