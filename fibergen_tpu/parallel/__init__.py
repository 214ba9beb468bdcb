"""Multi-chip domain decomposition for the FFT homogenization solvers.

The reference is a single-node OpenMP program (no MPI/NCCL anywhere,
CMakeLists.txt:86-117); memory bounds it to one machine (joss/paper.md:80).
This module is the TPU-native replacement for that whole layer: fields are
laid out as ``(ncomp, nx, ny, nz)`` and sharded as **x-slabs** over a 1-D
``jax.sharding.Mesh``.

- the 3-D FFTs run through the hand-written slab decomposition in
  :mod:`.fft` (local 2-D FFTs + one ``lax.all_to_all`` transpose over ICI
  per transform — GSPMD alone would all-gather the full field instead),
- elementwise ops (stress, Green scaling) stay local to each slab and the
  staggered stencil halo exchanges lower to `ppermute`,
- reductions (inner products, means) lower to `psum` over the mesh.

Helpers here centralize mesh/spec construction so solvers, tests and the
driver entry point agree on the layout.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .fft import SlabFFT, slab_fft_for

X_AXIS = "x"


def make_mesh(devices: Optional[Sequence] = None, axis: str = X_AXIS) -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(axis,))


def field_sharding(mesh: Mesh, axis: str = X_AXIS) -> NamedSharding:
    """x-slab sharding for ``(ncomp, nx, ny, nz)`` voxel fields: the
    component axis and y/z stay replicated-local, x is split across the
    mesh.  This keeps the hot staggered stencils local (their x-halo
    exchange becomes a `ppermute` synthesized by GSPMD) and turns the FFT
    into the standard slab decomposition."""
    return NamedSharding(mesh, P(None, axis, None, None))


def scalar_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding for means / Voigt vectors / scalars."""
    return NamedSharding(mesh, P())


def shard_field(x, mesh: Mesh, axis: str = X_AXIS):
    """Place a host/replicated field onto the mesh as x-slabs."""
    return jax.device_put(x, field_sharding(mesh, axis))


def good_slab_size(nx: int, n_devices: int) -> bool:
    """True when the x extent divides evenly over the mesh (required for
    an all-equal slab decomposition; GSPMD pads otherwise, which wastes
    HBM and ICI bandwidth on the FFT all-to-all)."""
    return nx % n_devices == 0
