"""Real-space staggered-grid finite-difference operators.

TPU-native reformulation of the reference's hand-unrolled OpenMP loops
(epsOperatorStaggered / divOperatorStaggered and their heat / hyper variants,
fibergen.cpp:18614-19074) using periodic rolls, which XLA fuses into a single
pass.

Conventions (periodic):
    D+ f = (f(i+1) - f(i)) * n/d      forward difference
    D- f = (f(i) - f(i-1)) * n/d      backward difference

Elasticity:  eps uses D+ on the diagonal and D- on the shear terms;
div uses D- on the diagonal and D+ on the shear terms (adjoint pair).
"""
from __future__ import annotations

import jax.numpy as jnp

# spatial axes of a (ncomp, nx, ny, nz) field
_AX = (-3, -2, -1)


def _dp(f, axis, h):
    """Forward difference along spatial axis (0=x,1=y,2=z)."""
    a = _AX[axis]
    return (jnp.roll(f, -1, axis=a) - f) * h


def _dm(f, axis, h):
    """Backward difference along spatial axis."""
    a = _AX[axis]
    return (f - jnp.roll(f, 1, axis=a)) * h


def _hs(grid):
    return (grid.nx / grid.dx, grid.ny / grid.dy, grid.nz / grid.dz)


def eps_staggered(grid, E, u):
    """Symmetrized staggered gradient of displacement + mean strain E
    (fibergen.cpp:18614-18692).  u: (3,nx,ny,nz), E: (6,), returns (6,...)."""
    hx, hy, hz = _hs(grid)
    ux, uy, uz = u[0], u[1], u[2]
    out = jnp.stack([
        E[0] + _dp(ux, 0, hx),
        E[1] + _dp(uy, 1, hy),
        E[2] + _dp(uz, 2, hz),
        E[3] + 0.5 * (_dm(uz, 1, hy) + _dm(uy, 2, hz)),
        E[4] + 0.5 * (_dm(uz, 0, hx) + _dm(ux, 2, hz)),
        E[5] + 0.5 * (_dm(uy, 0, hx) + _dm(ux, 1, hy)),
    ])
    return out


def div_staggered(grid, tau):
    """Staggered divergence of a symmetric tensor field (6 comps), backward
    differences on the diagonal, forward on the shear terms
    (fibergen.cpp:18853-18908).  Returns (3, nx, ny, nz)."""
    hx, hy, hz = _hs(grid)
    out = jnp.stack([
        _dm(tau[0], 0, hx) + _dp(tau[5], 1, hy) + _dp(tau[4], 2, hz),
        _dp(tau[5], 0, hx) + _dm(tau[1], 1, hy) + _dp(tau[3], 2, hz),
        _dp(tau[4], 0, hx) + _dp(tau[3], 1, hy) + _dm(tau[2], 2, hz),
    ])
    return out


def eps_staggered_comp(grid, u, c):
    """Single Voigt component of ``eps_staggered(grid, 0, u)`` without
    stacking.  The 512^3 low-memory CG step evaluates the gradient
    component-by-component (sequenced with optimization_barrier) so the
    (6, nx, ny, nz) stacked temp — 3 GB at 512^3 f32, the allocation that
    pushed the fused step past HBM — never exists."""
    hx, hy, hz = _hs(grid)
    ux, uy, uz = u[0], u[1], u[2]
    if c == 0:
        return _dp(ux, 0, hx)
    if c == 1:
        return _dp(uy, 1, hy)
    if c == 2:
        return _dp(uz, 2, hz)
    if c == 3:
        return 0.5 * (_dm(uz, 1, hy) + _dm(uy, 2, hz))
    if c == 4:
        return 0.5 * (_dm(uz, 0, hx) + _dm(ux, 2, hz))
    return 0.5 * (_dm(uy, 0, hx) + _dm(ux, 1, hy))


def div_stress_diff_comp(grid, p, two_dmu, ltr, i):
    """Row ``i`` of ``div_staggered((C(x) - C0) : p)`` for an
    all-isotropic linear material, with the 6-component stress never
    stacked (low-memory CG companion of :func:`eps_staggered_comp`).
    ``two_dmu`` = 2(mu(x) - mu_0) per voxel, ``ltr`` = (lam(x) - lam_0)
    * tr(p) per voxel (pass 0.0 when both lambdas vanish)."""
    hx, hy, hz = _hs(grid)

    def t(c):
        s = two_dmu * p[c]
        return s + ltr if c < 3 else s

    if i == 0:
        return _dm(t(0), 0, hx) + _dp(t(5), 1, hy) + _dp(t(4), 2, hz)
    if i == 1:
        return _dp(t(5), 0, hx) + _dm(t(1), 1, hy) + _dp(t(3), 2, hz)
    return _dp(t(4), 0, hx) + _dp(t(3), 1, hy) + _dm(t(2), 2, hz)


def eps_staggered_heat(grid, E, u):
    """Staggered gradient of a scalar potential + mean gradient E
    (fibergen.cpp:18697-18758).  u: (1,nx,ny,nz) or (3,...) with comp 0 used."""
    hx, hy, hz = _hs(grid)
    p = u[0]
    return jnp.stack([
        E[0] + _dp(p, 0, hx),
        E[1] + _dp(p, 1, hy),
        E[2] + _dp(p, 2, hz),
    ])


def div_staggered_heat(grid, tau):
    """Staggered divergence of a vector field into a scalar (component 0),
    all backward differences (fibergen.cpp:18914-18968). Returns (1,...)."""
    hx, hy, hz = _hs(grid)
    d = _dm(tau[0], 0, hx) + _dm(tau[1], 1, hy) + _dm(tau[2], 2, hz)
    return d[None]


def div_staggered_2d(grid, tau):
    """True-2-D staggered divergence (<dim>2</dim> instantiation): only the
    in-plane rows of :func:`div_staggered` survive on a one-voxel-thick
    periodic grid (every z difference is identically zero, and the z row is
    zero for in-plane loading of z-monoclinic materials — the same subspace
    the reference's disabled DIM=2 build would instantiate,
    fibergen.cpp:26550-26565).  tau: (6, nx, ny, 1) with in-plane comps
    [xx, yy, xy] = [0, 1, 5]; returns the (2, nx, ny, 1) in-plane force."""
    hx, hy, _ = _hs(grid)
    return jnp.stack([
        _dm(tau[0], 0, hx) + _dp(tau[5], 1, hy),
        _dp(tau[5], 0, hx) + _dm(tau[1], 1, hy),
    ])


def eps_staggered_2d(grid, E, u):
    """True-2-D symmetrized staggered gradient: in-plane comps from the
    (2, nx, ny, 1) displacement, out-of-plane comps exactly the constants
    E[2..4] (zz is the prescribed plane-strain value; yz/xz are zero by the
    dim=2 qualification).  Returns the full (6, nx, ny, 1) Voigt field so
    everything downstream (laws, estimators, actions) is unchanged."""
    hx, hy, _ = _hs(grid)
    ux, uy = u[0], u[1]
    shp = ux.shape
    return jnp.stack([
        E[0] + _dp(ux, 0, hx),
        E[1] + _dp(uy, 1, hy),
        jnp.broadcast_to(E[2], shp),
        jnp.broadcast_to(E[3], shp),
        jnp.broadcast_to(E[4], shp),
        E[5] + 0.5 * (_dm(uy, 0, hx) + _dm(ux, 1, hy)),
    ])


def div_staggered_heat_2d(grid, tau):
    """True-2-D scalar staggered divergence: the z term of
    :func:`div_staggered_heat` is identically zero on nz=1 for ANY
    conductivity law (it is a z difference).  Returns (1, nx, ny, 1)."""
    hx, hy, _ = _hs(grid)
    return (_dm(tau[0], 0, hx) + _dm(tau[1], 1, hy))[None]


def eps_staggered_heat_2d(grid, E, u):
    """True-2-D staggered gradient of a scalar potential; the z component
    is exactly the prescribed constant E[2]."""
    hx, hy, _ = _hs(grid)
    p = u[0]
    return jnp.stack([
        E[0] + _dp(p, 0, hx),
        E[1] + _dp(p, 1, hy),
        jnp.broadcast_to(E[2], p.shape),
    ])


def eps_staggered_hyper(grid, E, u):
    """Full (unsymmetrized) staggered gradient + mean F for finite strain
    (fibergen.cpp:18763-18847).  Returns 9 components ordered per core.voigt."""
    hx, hy, hz = _hs(grid)
    ux, uy, uz = u[0], u[1], u[2]
    return jnp.stack([
        E[0] + _dp(ux, 0, hx),
        E[1] + _dp(uy, 1, hy),
        E[2] + _dp(uz, 2, hz),
        E[3] + _dm(uy, 2, hz),   # F_yz = d_z u_y
        E[4] + _dm(ux, 2, hz),   # F_xz
        E[5] + _dm(ux, 1, hy),   # F_xy
        E[6] + _dm(uz, 1, hy),   # F_zy
        E[7] + _dm(uz, 0, hx),   # F_zx
        E[8] + _dm(uy, 0, hx),   # F_yx
    ])


def div_staggered_hyper(grid, tau):
    """Staggered divergence of a full (9 comp) tensor field
    (fibergen.cpp:19016-19071).  Row i divergence uses tau[i,:]."""
    hx, hy, hz = _hs(grid)
    return jnp.stack([
        _dm(tau[0], 0, hx) + _dp(tau[5], 1, hy) + _dp(tau[4], 2, hz),
        _dp(tau[8], 0, hx) + _dm(tau[1], 1, hy) + _dp(tau[3], 2, hz),
        _dp(tau[7], 0, hx) + _dp(tau[6], 1, hy) + _dm(tau[2], 2, hz),
    ])
