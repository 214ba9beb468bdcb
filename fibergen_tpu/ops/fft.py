"""Batched real-to-complex FFTs over tensor fields.

Replaces the reference's FFTW plan cache (FFT3, fibergen.cpp:7147-7289) with
``jnp.fft.rfftn`` using the *forward* normalization so that the DC bin of a
hat-field equals the spatial mean — the convention the reference's BC
projector relies on (fibergen.cpp:18486, 20220-20226).

Under jit on a sharded mesh, XLA/GSPMD lowers these to distributed FFTs with
all-to-all transposes over ICI.
"""
from __future__ import annotations

import jax.numpy as jnp

_AXES = (-3, -2, -1)


def fftn(x):
    """Forward FFT of a (ncomp, nx, ny, nz) real field; scaled by 1/N so the
    DC bin holds the field mean (fibergen.cpp:18481-18510)."""
    return jnp.fft.rfftn(x, axes=_AXES, norm="forward")


def ifftn(y, shape):
    """Inverse of :func:`fftn`; ``shape`` is the real-space (nx, ny, nz)."""
    return jnp.fft.irfftn(y, s=shape, axes=_AXES, norm="forward")


def fftn_zero_trace(x):
    """Forward FFT enforcing a traceless tensor: the first component is
    reconstructed as -(c1 + c2) in the Fourier domain
    (fibergen.cpp:18531-18560, used by the viscosity Delta scheme)."""
    y_rest = jnp.fft.rfftn(x[1:], axes=_AXES, norm="forward")
    y0 = -(y_rest[0] + y_rest[1])
    return jnp.concatenate([y0[None], y_rest], axis=0)


def ifftn_zero_trace(y, shape):
    """Inverse FFT of components 1.. and traceless reconstruction of
    component 0 (fibergen.cpp:18563-18584)."""
    x_rest = jnp.fft.irfftn(y[1:], s=shape, axes=_AXES, norm="forward")
    x0 = -(x_rest[0] + x_rest[1])
    return jnp.concatenate([x0[None], x_rest], axis=0)
