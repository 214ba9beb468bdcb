"""Composite Gamma operators: mode x scheme dispatch.

Mirrors the reference's GammaOperator* composition wrappers
(fibergen.cpp:20288-20531): the staggered paths run
div -> FFT -> G0_hat -> iFFT -> eps in real space (only 3-component FFTs);
the collocated/Willot paths run FFT -> Gamma_hat -> iFFT on the full tensor.
The mixed-BC mean correction R is applied to the result mean exactly like
initBCProjector/applyBCProjector (fibergen.cpp:20220-20279).

All functions are pure and jit-safe; ``scheme``/``mode`` are Python strings
resolved at trace time.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import fields
from ..core.grid import Grid
from ..solvers import bc as bcmod
from . import fft, green, staggered

# "half_staggered"/"full_staggered" share the staggered operator path
_STAGGERED = ("staggered", "half_staggered", "full_staggered")


def _apply_mean_correction(eta, R, alpha):
    """eta += alpha * R broadcast over space (applyBCProjector)."""
    return eta + (alpha * R).reshape(-1, 1, 1, 1)


def gamma_operator(grid: Grid, mode: str, scheme: str, bc: "bcmod.BCProjector | None",
                   E, mu_0, lambda_0, tau, alpha=-1.0, beta=0.0, F00=None,
                   g0_solver: str = "fft", freq_hack: bool = False, par=None,
                   dim2: bool = False, pallas_mid: bool = True):
    """eta = alpha * Gamma : tau + beta * tau with mean handling.

    ``tau`` is the real-space polarization field; returns the real-space eta.
    (GammaOperator dispatch, fibergen.cpp:20488-20531.)  g0_solver selects
    the staggered G0 applicator: "fft" or "multigrid"
    (G0OperatorStaggered, fibergen.cpp:20101-20116).  freq_hack enables the
    even-grid Nyquist symmetrization of the collocated elasticity Gamma —
    the only operator where the reference's flag is active
    (fibergen.cpp:19396; the other sites are compiled out).

    ``dim2`` runs the true DIM=2 staggered pipeline on one-voxel-thick
    grids — in-plane-only divergence, 2-D spectral chain, in-plane
    gradient with constant out-of-plane components.  The caller (LSSolver)
    guarantees the qualification: nz == 1, trivial-or-mean-only BCs with no
    out-of-plane loading, and (for elasticity) z-monoclinic materials, so
    the dropped components are identically zero, not approximated.
    """
    if mode == "viscosity":
        return delta_operator(grid, scheme, bc, E, mu_0, lambda_0, tau, alpha,
                              F00, par=par, pallas_mid=pallas_mid)

    # distributed slab FFTs when the solver runs on a device mesh
    # (parallel/fft.py); otherwise the plain single-program transforms
    _fftn = par.fftn if par is not None else fft.fftn
    _ifftn = par.ifftn if par is not None else fft.ifftn

    bc_active = bc is not None

    if mode == "elasticity":
        if scheme == "collocated":
            if (dim2 and par is None and not bc_active and beta == 0.0
                    and not freq_hack):
                # true DIM=2 collocated pipeline: 3-component 2-D chain
                return green.gamma_collocated_fused_2d(
                    grid, jnp.asarray(E, tau.dtype), mu_0, lambda_0, tau,
                    alpha)
            # fused chain: the DC bin (forward-normalized = field mean)
            # carries E plus any BC mean correction; on a mesh the fused
            # function routes through the kz-slab middle / slab-FFT pair
            E_eff = jnp.asarray(E, tau.dtype)
            if bc_active:
                R = bcmod.bc_correction(bc, fields.mean(tau), F00)
                E_eff = E_eff + alpha * R
            return green.gamma_collocated_fused(
                grid, E_eff, mu_0, lambda_0, tau, alpha, beta,
                freq_hack=freq_hack, pallas_mid=pallas_mid, par=par)
        if scheme == "willot":
            tau_hat = _fftn(tau)
            F0 = tau_hat[:, 0, 0, 0].real if bc_active else None
            eta_hat = green.gamma_willot(grid, E, mu_0, lambda_0, tau_hat,
                                         alpha, beta)
            if bc_active:
                R = bcmod.bc_correction(bc, F0, F00)
                eta_hat = eta_hat.at[:, 0, 0, 0].add(alpha * R)
            return _ifftn(eta_hat, grid.shape)
        if scheme in _STAGGERED:
            F0 = fields.mean(tau) if bc_active else None
            if dim2 and par is None and g0_solver == "fft":
                # true DIM=2 pipeline: 2-component force, 2-D spectral chain
                f = staggered.div_staggered_2d(grid, tau)
                u = green.g0_staggered_fused_2d(grid, mu_0, lambda_0, f,
                                                alpha)
                eta = staggered.eps_staggered_2d(
                    grid, jnp.asarray(E, tau.dtype), u)
            else:
                f = staggered.div_staggered(grid, tau)
                if g0_solver == "multigrid":
                    from ..solvers.multigrid import g0_multigrid_staggered
                    u = g0_multigrid_staggered(grid, mu_0, lambda_0, f, alpha)
                else:
                    # transpose-free fft+G0+ifft chain on the matmul-DFT
                    # backend (falls back to separate transforms off it);
                    # par routes through the slab middle / slab-FFT pair
                    u = green.g0_staggered_fused(grid, mu_0, lambda_0, f,
                                                 alpha, pallas_mid=pallas_mid,
                                                 par=par)
                eta = staggered.eps_staggered(grid, jnp.asarray(E, tau.dtype),
                                              u)
            if beta != 0.0:
                eta = eta + beta * tau
            if bc_active:
                R = bcmod.bc_correction(bc, F0, F00)
                eta = _apply_mean_correction(eta, R, alpha)
            return eta

    elif mode in ("heat", "porous"):
        if scheme == "collocated":
            if dim2 and par is None and not bc_active and beta == 0.0:
                return green.gamma_collocated_heat_fused_2d(
                    grid, jnp.asarray(E, tau.dtype), mu_0, lambda_0, tau,
                    alpha)
            E_eff = jnp.asarray(E, tau.dtype)
            if bc_active:
                R = bcmod.bc_correction(bc, fields.mean(tau), F00)
                E_eff = E_eff + alpha * R
            return green.gamma_collocated_heat_fused(
                grid, E_eff, mu_0, lambda_0, tau, alpha, beta,
                pallas_mid=pallas_mid, par=par)
        if scheme in _STAGGERED:
            F0 = fields.mean(tau) if bc_active else None
            if dim2 and par is None:
                f = staggered.div_staggered_heat_2d(grid, tau)
                u = green.g0_staggered_heat_fused_2d(grid, mu_0, lambda_0, f,
                                                     alpha)
                eta = staggered.eps_staggered_heat_2d(
                    grid, jnp.asarray(E, tau.dtype), u)
            else:
                f = staggered.div_staggered_heat(grid, tau)
                u = green.g0_staggered_heat_fused(grid, mu_0, lambda_0, f,
                                                  alpha, pallas_mid=pallas_mid,
                                                  par=par)
                eta = staggered.eps_staggered_heat(
                    grid, jnp.asarray(E, tau.dtype), u)
            if beta != 0.0:
                eta = eta + beta * tau
            if bc_active:
                R = bcmod.bc_correction(bc, F0, F00)
                eta = _apply_mean_correction(eta, R, alpha)
            return eta

    elif mode == "hyperelasticity":
        if scheme == "collocated":
            E_eff = jnp.asarray(E, tau.dtype)
            if bc_active:
                R = bcmod.bc_correction(bc, fields.mean(tau), F00)
                E_eff = E_eff + alpha * R
            return green.gamma_collocated_hyper_fused(
                grid, E_eff, mu_0, lambda_0, tau, alpha, beta,
                pallas_mid=pallas_mid, par=par)
        if scheme in _STAGGERED:
            F0 = fields.mean(tau) if bc_active else None
            f = staggered.div_staggered_hyper(grid, tau)
            u = green.g0_staggered_hyper_fused(grid, mu_0, lambda_0, f,
                                               alpha, pallas_mid=pallas_mid,
                                               par=par)
            eta = staggered.eps_staggered_hyper(grid, jnp.asarray(E, tau.dtype), u)
            if beta != 0.0:
                eta = eta + beta * tau
            if bc_active:
                R = bcmod.bc_correction(bc, F0, F00)
                eta = _apply_mean_correction(eta, R, alpha)
            return eta

    raise ValueError(f"Unknown gamma scheme '{scheme}' for mode '{mode}'")


def delta_operator(grid: Grid, scheme: str, bc, E, mu_0, lambda_0, tau,
                   alpha=-1.0, F00=None, par=None, pallas_mid=True):
    """Viscosity dual (fluidity) operator:
        eta = 2*alpha*mu0v*(tau - mu0v * Gamma^0 : tau),  mean(eta) = E
    where mu0v = 1/(4*mu_0) converts fluidity to viscosity and Gamma^0 uses
    (mu0v, lambda_0 -> inf)  (DeltaOperator*, fibergen.cpp:20380-20486)."""
    mu0v = 1.0 / (4.0 * mu_0)

    if scheme == "collocated":
        # applyDeltaFourier path (fibergen.cpp:19075-19080, 20464-20471):
        # fused zero-trace chain (+ Pallas middle on qualifying shapes —
        # distributed kz-slab middle with par): the DC bin carries E plus
        # any BC mean correction; F0 is the zero-trace-reconstructed tau
        # mean (= the hat DC by linearity)
        bc_active = bc is not None
        E_eff = jnp.asarray(E, tau.dtype)
        if bc_active:
            m = fields.mean(tau)
            F0 = jnp.concatenate([-(m[1] + m[2])[None], m[1:]])
            E_eff = E_eff + alpha * bcmod.bc_correction(bc, F0, F00)
        return green.gamma_collocated_zt_fused(
            grid, E_eff, -1.0 / (4.0 * mu0v), float("inf"), tau, alpha,
            2.0 * alpha * mu0v, pallas_mid=pallas_mid, par=par)

    if scheme in _STAGGERED or scheme == "willot":
        # mean constant such that <eta> = E (fibergen.cpp:20446-20453)
        adj = jnp.asarray(E, tau.dtype) - 2.0 * alpha * mu0v * fields.mean(tau)
        sub = "willot" if scheme == "willot" else "staggered"
        eta = gamma_operator(grid, "elasticity", sub, bc, adj,
                             -1.0 / (4.0 * mu0v), float("inf"), tau, alpha,
                             0.0, F00, par=par, pallas_mid=pallas_mid)
        return eta + 2.0 * alpha * mu0v * tau

    raise ValueError(f"Unknown delta scheme '{scheme}'")
