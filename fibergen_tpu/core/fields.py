"""Field-level reductions and BLAS-like helpers.

Replaces TensorField's hand-rolled OpenMP kernels (average, dot,
component_dot, xpay..., fibergen.cpp:9549-10286) with fused jnp reductions.
Shear components carry a weight of 2 in double contractions for dim-6 fields
(fibergen.cpp:20897-20919).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import voigt


def mean(field):
    """Per-component spatial mean; TensorField::average (fibergen.cpp:10171)."""
    return field.mean(axis=(-3, -2, -1))


def component_norm(field):
    """Per-component sqrt(mean(f^2)) (fibergen.cpp:10088-10138)."""
    return jnp.sqrt((field * field).mean(axis=(-3, -2, -1)))


def _w(dim, dtype):
    return jnp.asarray(voigt.weights(dim), dtype)


def inner_l2(a, b):
    """Voigt-weighted mean inner product sum(a : b)/nxyz
    (innerProductL2, fibergen.cpp:20955-21036)."""
    dim = a.shape[0]
    w = _w(dim, a.dtype).reshape(dim, 1, 1, 1)
    return (a * w * b).sum() / np.prod(a.shape[1:])


def inner_l2_diff(a, b, c):
    """sum(a : (b - c))/nxyz (fibergen.cpp:20871-20952)."""
    dim = a.shape[0]
    w = _w(dim, a.dtype).reshape(dim, 1, 1, 1)
    return (a * w * (b - c)).sum() / np.prod(a.shape[1:])


def norm_voigt(v):
    """Tensor 2-norm of a Voigt mean-value vector, with dim-6 values expanded
    to 9 entries like fix_dim + ublas::norm_2 (fibergen.cpp:14602-14608)."""
    dim = v.shape[-1]
    if dim == 6:
        v = voigt.expand_6_to_9(v)
    return jnp.sqrt((v * v).sum(-1))


def const_field(grid, values, dtype):
    """Constant field of shape (len(values), nx, ny, nz)."""
    v = jnp.asarray(values, dtype)
    return jnp.broadcast_to(v.reshape(-1, 1, 1, 1), (v.shape[0],) + grid.shape)
