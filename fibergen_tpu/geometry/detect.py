"""Fiber detection from voxel phase data.

Functional equivalent of the reference's experimental detectFibers
(fibergen.cpp:15776-16621): segment a thresholded phase field into
capsule-like fibers.  Redesigned around standard image analysis instead of
the reference's hand-rolled path following: Euclidean distance transform for
radii, greedy medial-axis tracing along the local structure-tensor
orientation for axes.
"""
from __future__ import annotations

from typing import List

import numpy as np
from scipy import ndimage

from .primitives import Capsule


def detect_fibers(phi: np.ndarray, grid, threshold: float = 0.5,
                  min_radius_vox: float = 1.0, max_fibers: int = 10000,
                  material: int = 1) -> List[Capsule]:
    """Detect capsule fibers in a (nx, ny, nz) volume-fraction field.

    Greedy: repeatedly take the voxel with the largest remaining distance
    value, trace the fiber axis in both directions along the local
    orientation while staying inside the mask, emit a capsule, and carve the
    traced region out of the working mask."""
    phi = np.asarray(phi)
    mask = phi > threshold
    if not mask.any():
        return []
    h = np.asarray(grid.spacing)
    # distance to the complement (radius map), in voxel units of min spacing
    dist = ndimage.distance_transform_edt(mask, sampling=h)

    work = dist.copy()
    fibers: List[Capsule] = []
    min_r = min_radius_vox * h.min()

    while len(fibers) < max_fibers:
        idx = np.unravel_index(np.argmax(work), work.shape)
        r = work[idx]
        if r < min_r:
            break
        # the distance ridge of a capsule is its core segment: take the
        # connected component of near-maximal distance containing the seed
        ridge = work >= 0.85 * r
        labels, _ = ndimage.label(ridge)
        comp = labels == labels[idx]
        pts = (np.argwhere(comp) + 0.5) * h + np.asarray(grid.x0)
        c = pts.mean(axis=0)
        if pts.shape[0] > 1:
            # principal direction of the ridge voxels = fiber axis
            _, _, vt = np.linalg.svd(pts - c, full_matrices=False)
            axis = vt[0]
            t = (pts - c) @ axis
            L = float(t.max() - t.min())
        else:
            axis = np.array([0.0, 0.0, 1.0])
            L = 0.0
        fib = Capsule(center=c, axis=axis, length=L,
                      radius=float(r), material=material,
                      fiber_id=len(fibers) + 1)
        fibers.append(fib)

        # carve the capsule out of the working maximum map
        lo = np.maximum(np.floor((c - (L / 2 + 2 * r)) / h).astype(int), 0)
        hi = np.minimum(np.ceil((c + (L / 2 + 2 * r)) / h).astype(int),
                        np.asarray(mask.shape))
        xs = [np.arange(lo[k], hi[k]) for k in range(3)]
        if any(len(a) == 0 for a in xs):
            work[idx] = 0.0
            continue
        X, Y, Z = np.meshgrid(*xs, indexing="ij")
        pts = np.stack([(X + 0.5) * h[0], (Y + 0.5) * h[1], (Z + 0.5) * h[2]],
                       axis=-1) + np.asarray(grid.x0)
        d = fib.distance(pts.reshape(-1, 3)).reshape(X.shape)
        sub = work[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        sub[d < r] = 0.0
        work[idx] = 0.0

    return fibers
