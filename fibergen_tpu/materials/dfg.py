"""Doubly-fine-grid (staggered) constitutive evaluation.

Equivalent of the reference's half/full_staggered schemes (use_dfg,
fibergen.cpp:14894; prolongate_to_dfg/restrict_from_dfg,
fibergen.cpp:14214-14341; initFullStageredRawPhases, fibergen.cpp:17648):
the staggered discretization stores the shear strain components at
edge-centered positions, so the constitutive law is evaluated on a 2x
refined grid where each Voigt component is sampled at its own staggered
location (per-component half-voxel shifts), with phases voxelized at the
fine resolution.  Strain is prolongated component-wise (nearest with shift),
the stress is evaluated with fine-grid phases, and restricted back by a
shifted 8-point average.
"""
from __future__ import annotations


import jax.numpy as jnp

from ..core.grid import Grid
from .mixing import MixedMaterial, Phase

# per-Voigt-component prolongation shifts (fibergen.cpp:14231-14233):
# diagonal components live at cell centers, shear components at the
# edge-centered staggered positions
_SHIFTS = {
    3: [(0, 0, 0)] * 3,
    6: [(0, 0, 0), (0, 0, 0), (0, 0, 0),
        (0, 1, 1), (1, 0, 1), (1, 1, 0)],
    9: [(0, 0, 0), (0, 0, 0), (0, 0, 0),
        (0, 1, 1), (1, 0, 1), (1, 1, 0),
        (0, 1, 1), (1, 0, 1), (1, 1, 0)],
}

_AX = (-3, -2, -1)


def _prolong_comp(x, shift):
    """Nearest-neighbour 2x upsample with a half-voxel shift:
    dest[i] = src[((i + s) mod 2n) / 2] (fibergen.cpp:14244-14266)."""
    out = x
    for ax, s in zip(_AX, shift):
        out = jnp.repeat(out, 2, axis=ax)
        if s:
            out = jnp.roll(out, -s, axis=ax)
    return out


def _restrict_fast(y, shift):
    """Same as _restrict_comp but with explicit reshape-pooling per axis."""
    out = y
    # axis -3 (x)
    s0, s1, s2 = shift
    if s0:
        out = jnp.roll(out, s0, axis=-3)
    if s1:
        out = jnp.roll(out, s1, axis=-2)
    if s2:
        out = jnp.roll(out, s2, axis=-1)
    # strided slices, not reshape(..., 2, ..., 2): minormost size-2 dims
    # get 64x tile padding on TPU (see geometry/discretize._pool_ss)
    acc = None
    for a in range(2):
        for b in range(2):
            for c in range(2):
                s = out[..., a::2, b::2, c::2]
                acc = s if acc is None else acc + s
    return acc / 8.0


def prolong(F):
    """Prolongate a (dim, nx, ny, nz) field to the dfg (dim, 2nx, 2ny, 2nz)."""
    shifts = _SHIFTS[F.shape[0]]
    return jnp.stack([_prolong_comp(F[g], shifts[g])
                      for g in range(F.shape[0])])


def restrict(Y):
    """Restrict a (dim, 2nx, 2ny, 2nz) field back to the coarse grid."""
    shifts = _SHIFTS[Y.shape[0]]
    return jnp.stack([_restrict_fast(Y[g], shifts[g])
                      for g in range(Y.shape[0])])


def fine_grid(grid: Grid) -> Grid:
    return Grid(2 * grid.nx, 2 * grid.ny, 2 * grid.nz,
                grid.dx, grid.dy, grid.dz, grid.x0)


class DfgMaterial(MixedMaterial):
    """Wraps a mixed material whose phase fields live on the doubly-fine
    grid, exposing the coarse-field constitutive API: every evaluation is
    prolongate -> fine-grid law -> restrict (calcStress with use_dfg,
    fibergen.cpp:18134-18149)."""

    rule = "dfg"

    def __init__(self, inner: MixedMaterial):
        self.inner = inner
        self._dim = inner.dim
        # share the phase list so FG can assign (fine) phi fields through it
        self.phases = inner.phases

    @property
    def dim(self):
        return self._dim

    def _constituents(self):
        return [self] + self.inner._constituents()

    def pk1(self, F):
        return restrict(self.inner.pk1(prolong(F)))

    def stress_diff(self, F, mu_0, lambda_0):
        return restrict(self.inner.stress_diff(prolong(F), mu_0, lambda_0))

    def dpk1(self, F, W):
        return restrict(self.inner.dpk1(prolong(F), prolong(W)))

    def w(self, F):
        return self.inner.w(prolong(F))  # fine-grid energy density

    def mean_w(self, F):
        return self.inner.w(prolong(F)).mean()

    def mean_pk1(self, F):
        # mean on the fine grid (meanPK1 with dfg, fibergen.cpp:17793-17811)
        return self.inner.pk1(prolong(F)).mean(axis=(-3, -2, -1))

    def mean_cauchy(self, F):
        return self.inner.mean_cauchy(prolong(F))

    def polarization(self, mu_0, F, inv=False):
        return restrict(self.inner.polarization(mu_0, prolong(F), inv))

    def eig_range(self, F, zero_trace=False):
        return self.inner.eig_range(prolong(F), zero_trace)

    def __str__(self):
        return f"dfg({self.inner})"
