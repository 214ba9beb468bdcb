"""Voigt-notation helpers.

The framework stores symmetric rank-2 tensors as vectors with *tensor*
components (shear entries are NOT doubled).  Component ordering follows the
reference (fibergen.cpp:19120-19121, 22213-22214):

    dim 3:  [x, y, z]                                   (vectors / gradients)
    dim 6:  [xx, yy, zz, yz, xz, xy]                    (symmetric tensors)
    dim 9:  [xx, yy, zz, yz, xz, xy, zy, zx, yx]        (full tensors)

Because shear components are stored un-doubled, double contractions carry a
weight of 2 on entries 3..5 for dim 6 (fibergen.cpp:539-575).
"""
from __future__ import annotations

import numpy as np

# Voigt index -> tensor (row, col) index tables (fibergen.cpp:19120, 22213)
VI = {
    3: np.array([0, 1, 2]),
    6: np.array([0, 1, 2, 1, 0, 0]),
    9: np.array([0, 1, 2, 1, 0, 0, 2, 2, 1]),
}
VJ = {
    3: np.array([0, 1, 2]),
    6: np.array([0, 1, 2, 2, 2, 1]),
    9: np.array([0, 1, 2, 2, 2, 1, 1, 0, 0]),
}

# tensor (row, col) -> Voigt index, for dim 9 ordering
FULL_INDEX = np.array([
    [0, 5, 4],
    [8, 1, 3],
    [7, 6, 2],
])
# tensor (row, col) -> Voigt index for symmetric (dim 6) ordering
SYM_INDEX = np.array([
    [0, 5, 4],
    [5, 1, 3],
    [4, 3, 2],
])


def weights(dim: int, dtype=np.float64) -> np.ndarray:
    """Double-contraction weights (2 on shear entries for dim 6)."""
    w = np.ones(dim, dtype=dtype)
    if dim == 6:
        w[3:6] = 2.0
    return w


def id4(dim: int, dtype=np.float64) -> np.ndarray:
    """Fourth-order identity in Voigt matrix form (fibergen.cpp:500-512).

    For dim 6 the shear diagonal is 1/2 so that dyad4(id4, v) == v."""
    m = np.eye(dim, dtype=dtype)
    if dim == 6:
        m[3, 3] = m[4, 4] = m[5, 5] = 0.5
    return m


def ii4(dim: int, dtype=np.float64) -> np.ndarray:
    """I (x) I in Voigt matrix form (fibergen.cpp:517-525)."""
    m = np.zeros((dim, dim), dtype=dtype)
    m[0:3, 0:3] = 1.0
    return m


def dyad4_mv(M, v):
    """Voigt matrix times Voigt vector with shear doubling (fibergen.cpp:563-575).

    Works for numpy or jax arrays."""
    dim = M.shape[1]
    w = weights(dim)
    return M @ (v * w)


def dyad4_mm(A, B):
    """Voigt matrix product with shear doubling (fibergen.cpp:582-597)."""
    dim = A.shape[1]
    w = weights(dim)
    return A @ (B * w[:, None])


def dyad_vv(a, b):
    """Double contraction of two Voigt vectors (fibergen.cpp:544-556)."""
    dim = a.shape[-1]
    w = weights(dim)
    return (a * w * b).sum(-1)


def norm_2(v):
    """Tensor 2-norm of a Voigt vector (fibergen.cpp:530-537)."""
    return np.sqrt(float(dyad_vv(v, v))) if isinstance(v, np.ndarray) else dyad_vv(v, v) ** 0.5


def identity_vec(dim: int, dtype=np.float64) -> np.ndarray:
    """Identity rank-2 tensor as a Voigt vector."""
    v = np.zeros(dim, dtype=dtype)
    v[0:3] = 1.0
    if dim == 3:
        v[:] = 0.0  # no meaningful identity for plain vectors
    return v


def to_matrix(v) -> np.ndarray:
    """Voigt vector (6 or 9) -> 3x3 matrix (numpy, host-side)."""
    v = np.asarray(v)
    dim = v.shape[-1]
    m = np.zeros(v.shape[:-1] + (3, 3), dtype=v.dtype)
    vi, vj = VI[dim], VJ[dim]
    for k in range(dim):
        m[..., vi[k], vj[k]] = v[..., k]
        if dim == 6:
            m[..., vj[k], vi[k]] = v[..., k]
    return m


def from_matrix(m, dim: int) -> np.ndarray:
    """3x3 matrix -> Voigt vector (symmetrizes for dim 6)."""
    m = np.asarray(m)
    out = np.zeros(m.shape[:-2] + (dim,), dtype=m.dtype)
    vi, vj = VI[dim], VJ[dim]
    for k in range(dim):
        if dim == 6:
            out[..., k] = 0.5 * (m[..., vi[k], vj[k]] + m[..., vj[k], vi[k]])
        else:
            out[..., k] = m[..., vi[k], vj[k]]
    return out


def expand_6_to_9(v):
    """Duplicate shear entries: [a..f] -> [a..f, d, e, f] (fibergen.cpp:12117-12121)."""
    import jax.numpy as jnp
    xp = jnp if not isinstance(v, np.ndarray) else np
    return xp.concatenate([v, v[..., 3:6]], axis=-1)


def expand_matrix_6_to_9(M: np.ndarray) -> np.ndarray:
    """Extend a symmetric 6x6 Voigt matrix to 9x9 (fibergen.cpp:26632-26639 style:
    index i>=6 maps to i-3)."""
    out = np.zeros((9, 9), dtype=M.dtype)
    idx = [0, 1, 2, 3, 4, 5, 3, 4, 5]
    for i in range(9):
        for j in range(9):
            out[i, j] = M[idx[i], idx[j]]
    return out


def reduce_matrix_9_to_6(M: np.ndarray) -> np.ndarray:
    """Reduce a 9x9 matrix to symmetric 6x6 by averaging the duplicated
    shear rows/columns (fibergen.cpp:20653-20662)."""
    M = M.copy()
    for i in range(3):
        for j in range(6):
            M[j, 3 + i] = 0.5 * (M[j, 3 + i] + M[j, 6 + i])
            M[3 + i, j] = 0.5 * (M[3 + i, j] + M[6 + i, j])
    return M[:6, :6]
