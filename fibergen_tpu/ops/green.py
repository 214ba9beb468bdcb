"""Fourier-space Green operators for the Lippmann-Schwinger solvers.

TPU-native re-derivation of the reference's per-wavenumber kernels
(fibergen.cpp:19083-20218).  Instead of materializing 6x6 Gamma matrices per
voxel, the operators are expressed in closed vector form (contract with xi
once, scale, outer-product back), which XLA fuses into a single elementwise
pass over the hat-field — the analogue of the reference's hot kernel #2
(G0OperatorFourierStaggeredGeneral, fibergen.cpp:19834).

All functions take hat-fields of shape (ncomp, nx, ny, nzc) and return the
same shape.  The DC bin (0,0,0) is overwritten by the caller-provided mean
(or zero), mirroring the reference's explicit zero-frequency handling.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.grid import Grid


def _set_dc(y, value):
    """Set the DC (zero-frequency) bin of each component."""
    return y.at[:, 0, 0, 0].set(value)


def _xi_bcast(grid: Grid, dtype):
    fx, fy, fz = grid.xi(two_pi=False)
    return (jnp.asarray(fx, dtype), jnp.asarray(fy, dtype), jnp.asarray(fz, dtype))


# ---------------------------------------------------------------------------
# Collocated (classical Moulinec-Suquet) operators
# ---------------------------------------------------------------------------

def gamma_collocated(grid: Grid, E, mu_0, lambda_0, tau_hat, alpha=-1.0, beta=0.0,
                     freq_hack=False):
    """eta_hat = alpha * Gamma_hat : tau_hat + beta * tau_hat, DC bin = E.

    Vector form of GammaOperatorFourierCollocated (fibergen.cpp:19381-19608):
        t_i  = tau_ij xi_j
        s    = xi . t
        (Gamma tau)_ij = (xi_i t_j + xi_j t_i) / (2 mu0 |xi|^2)
                         - (lam0+mu0)/(mu0(lam0+2mu0)) xi_i xi_j s / |xi|^4

    ``freq_hack`` reproduces the reference's even-grid Nyquist fix
    (fibergen.cpp:19396-19398, 19459-19472): at a bin where one or more axes
    sit on their (sign-ambiguous) Nyquist frequency, Gamma is replaced by its
    average over the 2^m sign choices of those frequency components.  Entries
    odd in a Nyquist component average to zero; this is realized here by
    averaging the (linear-in-Gamma) vector-form application over sign-flipped
    wavevectors, which XLA folds into a handful of extra fused passes.
    """
    rdtype = jnp.real(tau_hat).dtype
    xi0, xi1, xi2 = _xi_bcast(grid, rdtype)

    A = alpha / (2.0 * mu_0)
    # robust for lambda_0 -> inf (fibergen.cpp:19388)
    B = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))

    def apply(x0, x1, x2):
        k2 = x0 * x0 + x1 * x1 + x2 * x2
        k2 = k2.at[0, 0, 0].set(1.0)  # guard DC; overwritten below
        t0 = tau_hat[0] * x0 + tau_hat[5] * x1 + tau_hat[4] * x2
        t1 = tau_hat[5] * x0 + tau_hat[1] * x1 + tau_hat[3] * x2
        t2 = tau_hat[4] * x0 + tau_hat[3] * x1 + tau_hat[2] * x2
        s = x0 * t0 + x1 * t1 + x2 * t2
        a = A / k2
        b = (B / (k2 * k2)) * s
        return jnp.stack([
            a * (2.0 * x0 * t0) + b * (x0 * x0),
            a * (2.0 * x1 * t1) + b * (x1 * x1),
            a * (2.0 * x2 * t2) + b * (x2 * x2),
            a * (x1 * t2 + x2 * t1) + b * (x1 * x2),
            a * (x0 * t2 + x2 * t0) + b * (x0 * x2),
            a * (x0 * t1 + x1 * t0) + b * (x0 * x1),
        ])

    combos = _nyquist_sign_combos(grid, (xi0, xi1, xi2), rdtype) if freq_hack else None
    if not combos:
        eta = apply(xi0, xi1, xi2)
    else:
        eta = apply(*combos[0])
        for c in combos[1:]:
            eta = eta + apply(*c)
        eta = eta / float(len(combos))
    if beta != 0.0:
        eta = eta + beta * tau_hat
    return _set_dc(eta, jnp.asarray(E, eta.dtype))


def _nyquist_sign_combos(grid: Grid, xis, rdtype):
    """All sign-flip variants of (xi0, xi1, xi2) over even-axis Nyquist bins.

    Returns [] when no axis is even (freq_hack is then a no-op).  For m even
    axes returns 2^m tuples; at non-Nyquist bins every variant equals the
    original, so averaging the Gamma application over them realizes exactly
    the reference's per-bin sign symmetrization (fibergen.cpp:19459-19472).
    """
    import itertools

    fx, fy, fz = grid.freq_index
    ns = (grid.nx, grid.ny, grid.nz)
    masks = []
    for axis, (f, n) in enumerate(zip((fx, fy, fz), ns)):
        if n % 2 == 0:
            masks.append((axis, jnp.asarray(np.abs(f) == n // 2)))
    if not masks:
        return []
    combos = []
    for signs in itertools.product((1.0, -1.0), repeat=len(masks)):
        var = list(xis)
        for (axis, m), sgn in zip(masks, signs):
            if sgn < 0:
                var[axis] = jnp.where(m, -var[axis], var[axis])
        combos.append(tuple(var))
    return combos


def gamma_collocated_heat(grid: Grid, E, mu_0, lambda_0, tau_hat, alpha=-1.0, beta=0.0):
    """Scalar (heat/porous) collocated Gamma with reference conductivity
    k0 = 2*mu_0 (GammaOperatorFourierCollocatedHeat, fibergen.cpp:19302-19377):
        (Gamma tau)_i = xi_i (xi . tau) / (2 mu0 |xi|^2)
    """
    rdtype = jnp.real(tau_hat).dtype
    xi0, xi1, xi2 = _xi_bcast(grid, rdtype)
    k2 = xi0 * xi0 + xi1 * xi1 + xi2 * xi2
    k2 = k2.at[0, 0, 0].set(1.0)

    s = tau_hat[0] * xi0 + tau_hat[1] * xi1 + tau_hat[2] * xi2
    c = (alpha / (2.0 * mu_0)) * s / k2
    eta = jnp.stack([c * xi0, c * xi1, c * xi2])
    if beta != 0.0:
        eta = eta + beta * tau_hat
    return _set_dc(eta, jnp.asarray(E, eta.dtype))


def gamma_collocated_hyper(grid: Grid, E, mu_0, lambda_0, tau_hat, alpha=-1.0, beta=0.0):
    """Nonsymmetrized (finite-strain) collocated Gamma on 9-component fields
    (GammaOperatorFourierCollocatedHyper, fibergen.cpp:19619-19745):
        (Gamma tau)_ij = xi_j t_i / (2 mu0 |xi|^2)
                         - lam0/(2 mu0 (lam0+2mu0)) xi_i xi_j s / |xi|^4
    with t_i = tau_il xi_l (tau full, not symmetrized).
    """
    rdtype = jnp.real(tau_hat).dtype
    xi0, xi1, xi2 = _xi_bcast(grid, rdtype)
    k2 = xi0 * xi0 + xi1 * xi1 + xi2 * xi2
    k2 = k2.at[0, 0, 0].set(1.0)

    c1 = (alpha / (2.0 * mu_0)) / k2
    # robust for lambda_0 -> 0 or inf (fibergen.cpp:19627)
    with np.errstate(divide="ignore"):
        c2f = float(-alpha / (2.0 * mu_0 * (1.0 + 2.0 * mu_0 / np.float64(lambda_0))))

    # rows of tau: (xx, xy, xz), (yx, yy, yz), (zx, zy, zz)
    t0 = tau_hat[0] * xi0 + tau_hat[5] * xi1 + tau_hat[4] * xi2
    t1 = tau_hat[8] * xi0 + tau_hat[1] * xi1 + tau_hat[3] * xi2
    t2 = tau_hat[7] * xi0 + tau_hat[6] * xi1 + tau_hat[2] * xi2
    s = xi0 * t0 + xi1 * t1 + xi2 * t2
    b = (c2f / (k2 * k2)) * s

    eta = jnp.stack([
        c1 * xi0 * t0 + b * xi0 * xi0,   # xx
        c1 * xi1 * t1 + b * xi1 * xi1,   # yy
        c1 * xi2 * t2 + b * xi2 * xi2,   # zz
        c1 * xi2 * t1 + b * xi1 * xi2,   # yz
        c1 * xi2 * t0 + b * xi0 * xi2,   # xz
        c1 * xi1 * t0 + b * xi0 * xi1,   # xy
        c1 * xi1 * t2 + b * xi2 * xi1,   # zy
        c1 * xi0 * t2 + b * xi2 * xi0,   # zx
        c1 * xi0 * t1 + b * xi1 * xi0,   # yx
    ])
    if beta != 0.0:
        eta = eta + beta * tau_hat
    return _set_dc(eta, jnp.asarray(E, eta.dtype))


# ------------------------------------------------- fused collocated chains
# The collocated Gamma kernels apply REAL xi factors, so they act on the
# real and imaginary spectrum parts independently — which lets them run
# inside the transpose-free matmul-DFT chain (fft.fftn_apply_ifftn_mm)
# exactly like the staggered G0: real-space tau in, real-space eta out,
# eta_hat never materialized in HBM.

def _chain_ax(v, n):
    """Reorder a per-axis 1-D spectral vector to the fused chain's bin
    order along a c2c axis (fft.chain_perm: DIF block order when the
    radix-2 split is active, natural otherwise).  Trace-time take on a
    length-n constant — folded by XLA."""
    from . import fft as fftmod
    p = fftmod.chain_perm(n)
    v = jnp.reshape(v, (-1,))
    return v if p is None else jnp.take(v, jnp.asarray(p), axis=0)


def _xi_perm(grid: Grid, rdtype):
    """xi broadcast vectors in the chain's (KZ, KY, KX) layout."""
    fx, fy, fz = grid.xi(two_pi=False)
    x0 = _chain_ax(jnp.asarray(fx, rdtype), grid.nx).reshape(1, 1, -1)
    x1 = _chain_ax(jnp.asarray(fy, rdtype), grid.ny).reshape(1, -1, 1)
    x2 = jnp.asarray(fz, rdtype).reshape(-1, 1, 1)
    return x0, x1, x2


def _dc_perm(grid: Grid, rdtype):
    """DC indicator / complement in the chain's (KZ, KY, KX) layout.
    (chain_perm always maps bin 0 to position 0, so the reorder is a
    mathematical no-op here — applied for correctness-by-construction.)"""
    dx, dy, dz = _staggered_dc(grid, rdtype)
    dc = (dz.reshape(-1, 1, 1)
          * _chain_ax(dy, grid.ny).reshape(1, -1, 1)
          * _chain_ax(dx, grid.nx).reshape(1, 1, -1))
    return dc, 1.0 - dc


def _gamma_chain(grid: Grid, tau, E, beta, part_fn, pallas_mid=True,
                 par=None, hat_fn=None):
    """Run ``ifftn(Gamma(fftn(tau)))`` as one chain.  ``part_fn(p, xis,
    k2reg)`` applies the real-coefficient Gamma kernel to one spectrum part;
    the DC bin is set to E in the real part (the reference's explicit
    zero-frequency handling, incl. any BC mean correction folded into E).
    On qualifying single-chip shapes the chain's middle runs as the
    radix-2 Pallas kernel (ops/pallas_chain.py) with the same part_fn.
    With ``par`` (SlabFFT) qualifying shapes run the kz-slab-distributed
    middle; the rest use the slab-FFT pair around ``hat_fn(tau_hat)``
    (the family's hat-domain Gamma, E already applied at DC)."""
    from . import fft as fftmod
    from . import pallas_chain

    if par is not None:
        if (pallas_mid and fftmod.mm_enabled(tau.shape[-3:])
                and pallas_chain.middle_slab_enabled(par, tau.shape[-3:],
                                                     tau.shape[0])):
            return pallas_chain.gamma_collocated_middle_slab(
                par, grid, tau, E, beta, part_fn)
        return par.ifftn(hat_fn(par.fftn(tau)), tau.shape[-3:])

    if pallas_mid and pallas_chain.middle_enabled(tau.shape[-3:],
                                                  tau.shape[0]):
        return pallas_chain.gamma_collocated_middle(grid, tau, E, beta,
                                                    part_fn)

    rdtype = tau.dtype
    Ej = jnp.asarray(E, rdtype).reshape(-1, 1, 1, 1)

    def apply(re, im):
        xis = _xi_perm(grid, rdtype)
        dc, ndc = _dc_perm(grid, rdtype)
        k2 = xis[0] * xis[0] + xis[1] * xis[1] + xis[2] * xis[2] + dc
        eta_re = part_fn(re, xis, k2)
        eta_im = part_fn(im, xis, k2)
        if beta != 0.0:
            eta_re = eta_re + beta * re
            eta_im = eta_im + beta * im
        return eta_re * ndc + Ej * dc, eta_im * ndc

    return fftmod.fftn_apply_ifftn_mm(tau, apply)


def gamma_collocated_fused(grid: Grid, E, mu_0, lambda_0, tau, alpha=-1.0,
                           beta=0.0, freq_hack=False, pallas_mid=True,
                           par=None):
    """Fused-chain :func:`gamma_collocated`: real-space tau in, eta out.
    Falls back to separate transforms off the matmul backend or when the
    Nyquist freq_hack averaging is requested.  ``par`` (SlabFFT) routes
    sharded fields through the kz-slab middle / slab-FFT pair."""
    from . import fft as fftmod

    def hat_fn(tau_hat):
        return gamma_collocated(grid, E, mu_0, lambda_0, tau_hat, alpha,
                                beta, freq_hack)

    if par is not None and freq_hack:
        return par.ifftn(hat_fn(par.fftn(tau)), tau.shape[-3:])
    if par is None and (not fftmod.mm_enabled(tau.shape[-3:]) or freq_hack):
        return fftmod.ifftn(hat_fn(fftmod.fftn(tau)), tau.shape[-3:])

    A = alpha / (2.0 * mu_0)
    B = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))

    def part(p, xis, k2):
        x0, x1, x2 = xis
        t0 = p[0] * x0 + p[5] * x1 + p[4] * x2
        t1 = p[5] * x0 + p[1] * x1 + p[3] * x2
        t2 = p[4] * x0 + p[3] * x1 + p[2] * x2
        s = x0 * t0 + x1 * t1 + x2 * t2
        a = A / k2
        b = (B / (k2 * k2)) * s
        return jnp.stack([
            a * (2.0 * x0 * t0) + b * (x0 * x0),
            a * (2.0 * x1 * t1) + b * (x1 * x1),
            a * (2.0 * x2 * t2) + b * (x2 * x2),
            a * (x1 * t2 + x2 * t1) + b * (x1 * x2),
            a * (x0 * t2 + x2 * t0) + b * (x0 * x2),
            a * (x0 * t1 + x1 * t0) + b * (x0 * x1),
        ])

    return _gamma_chain(grid, tau, E, beta, part,
                        pallas_mid=pallas_mid, par=par, hat_fn=hat_fn)


def gamma_collocated_zt_fused(grid: Grid, E, mu_0, lambda_0, tau,
                              alpha=-1.0, beta=0.0, pallas_mid=True,
                              par=None):
    """Zero-trace collocated Gamma (the viscosity Delta scheme's spectral
    core, fibergen.cpp:19075-19080 + 20464-20471): transform components
    1.. of the traceless 6-component ``tau``, reconstruct component 0 as
    -(c1+c2) in the spectral domain, apply :func:`gamma_collocated`'s
    kernel, and invert with the same reconstruction.  On qualifying
    single-chip shapes the whole thing rides the Pallas-fused middle;
    otherwise the separate zero-trace transforms.  ``E`` must already
    carry any BC mean correction."""
    from . import fft as fftmod
    from . import pallas_chain

    A = alpha / (2.0 * mu_0)
    B = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))

    def part(p, xis, k2):
        x0, x1, x2 = xis
        t0 = p[0] * x0 + p[5] * x1 + p[4] * x2
        t1 = p[5] * x0 + p[1] * x1 + p[3] * x2
        t2 = p[4] * x0 + p[3] * x1 + p[2] * x2
        s = x0 * t0 + x1 * t1 + x2 * t2
        a = A / k2
        b = (B / (k2 * k2)) * s
        return [
            a * (2.0 * x0 * t0) + b * (x0 * x0),
            a * (2.0 * x1 * t1) + b * (x1 * x1),
            a * (2.0 * x2 * t2) + b * (x2 * x2),
            a * (x1 * t2 + x2 * t1) + b * (x1 * x2),
            a * (x0 * t2 + x2 * t0) + b * (x0 * x2),
            a * (x0 * t1 + x1 * t0) + b * (x0 * x1),
        ]

    if par is not None:
        if (pallas_mid and fftmod.mm_enabled(tau.shape[-3:])
                and pallas_chain.middle_slab_enabled(par, tau.shape[-3:],
                                                     tau.shape[0] - 1)):
            return pallas_chain.gamma_collocated_zt_middle_slab(
                par, grid, tau, E, beta, part)
        tau_hat = par.fftn_zero_trace(tau)
        eta_hat = gamma_collocated(grid, E, mu_0, lambda_0, tau_hat, alpha,
                                   beta)
        return par.ifftn_zero_trace(eta_hat, tau.shape[-3:])

    if (pallas_mid and fftmod.mm_enabled(tau.shape[-3:])
            and pallas_chain.middle_enabled(tau.shape[-3:],
                                            tau.shape[0] - 1)):
        return pallas_chain.gamma_collocated_zt_middle(grid, tau, E, beta,
                                                       part)

    tau_hat = fftmod.fftn_zero_trace(tau)
    eta_hat = gamma_collocated(grid, E, mu_0, lambda_0, tau_hat, alpha, beta)
    return fftmod.ifftn_zero_trace(eta_hat, tau.shape[-3:])


def gamma_collocated_heat_fused(grid: Grid, E, mu_0, lambda_0, tau,
                                alpha=-1.0, beta=0.0, pallas_mid=True,
                                par=None):
    """Fused-chain :func:`gamma_collocated_heat`."""
    from . import fft as fftmod

    def hat_fn(tau_hat):
        return gamma_collocated_heat(grid, E, mu_0, lambda_0, tau_hat,
                                     alpha, beta)

    if par is None and not fftmod.mm_enabled(tau.shape[-3:]):
        return fftmod.ifftn(hat_fn(fftmod.fftn(tau)), tau.shape[-3:])

    A = alpha / (2.0 * mu_0)

    def part(p, xis, k2):
        x0, x1, x2 = xis
        c = A * (p[0] * x0 + p[1] * x1 + p[2] * x2) / k2
        return jnp.stack([c * x0, c * x1, c * x2])

    return _gamma_chain(grid, tau, E, beta, part,
                        pallas_mid=pallas_mid, par=par, hat_fn=hat_fn)


def gamma_collocated_hyper_fused(grid: Grid, E, mu_0, lambda_0, tau,
                                 alpha=-1.0, beta=0.0, pallas_mid=True,
                                 par=None):
    """Fused-chain :func:`gamma_collocated_hyper` (9-component fields)."""
    from . import fft as fftmod

    def hat_fn(tau_hat):
        return gamma_collocated_hyper(grid, E, mu_0, lambda_0, tau_hat,
                                      alpha, beta)

    if par is None and not fftmod.mm_enabled(tau.shape[-3:]):
        return fftmod.ifftn(hat_fn(fftmod.fftn(tau)), tau.shape[-3:])

    A = alpha / (2.0 * mu_0)
    with np.errstate(divide="ignore"):
        c2f = float(-alpha / (2.0 * mu_0
                              * (1.0 + 2.0 * mu_0 / np.float64(lambda_0))))

    def part(p, xis, k2):
        x0, x1, x2 = xis
        t0 = p[0] * x0 + p[5] * x1 + p[4] * x2
        t1 = p[8] * x0 + p[1] * x1 + p[3] * x2
        t2 = p[7] * x0 + p[6] * x1 + p[2] * x2
        s = x0 * t0 + x1 * t1 + x2 * t2
        c1 = A / k2
        b = (c2f / (k2 * k2)) * s
        return jnp.stack([
            c1 * x0 * t0 + b * x0 * x0,
            c1 * x1 * t1 + b * x1 * x1,
            c1 * x2 * t2 + b * x2 * x2,
            c1 * x2 * t1 + b * x1 * x2,
            c1 * x2 * t0 + b * x0 * x2,
            c1 * x1 * t0 + b * x0 * x1,
            c1 * x1 * t2 + b * x2 * x1,
            c1 * x0 * t2 + b * x2 * x0,
            c1 * x0 * t1 + b * x1 * x0,
        ])

    return _gamma_chain(grid, tau, E, beta, part,
                        pallas_mid=pallas_mid, par=par, hat_fn=hat_fn)


# ---------------------------------------------------------------------------
# Staggered-grid G0 operators (modified wavenumbers)
# ---------------------------------------------------------------------------

def _staggered_k(grid: Grid, rdtype):
    """Modified wavenumbers k+ = sin(xi) e^{+i xi} / h and |k|^2
    (fibergen.cpp:19838-19877).  Returns (kp0, kp1, kp2, norm_kp2)."""
    sx, sy, sz = grid.xi_staggered()
    h0, h1, h2 = grid.staggered_h()
    xi0 = jnp.asarray(sx, rdtype)
    xi1 = jnp.asarray(sy, rdtype)
    xi2 = jnp.asarray(sz, rdtype)
    s0, s1, s2 = jnp.sin(xi0) / h0, jnp.sin(xi1) / h1, jnp.sin(xi2) / h2
    kp0 = s0 * jnp.exp(1j * xi0.astype(jnp.result_type(rdtype, jnp.complex64)))
    kp1 = s1 * jnp.exp(1j * xi1.astype(kp0.dtype))
    kp2 = s2 * jnp.exp(1j * xi2.astype(kp0.dtype))
    norm2 = s0 * s0 + s1 * s1 + s2 * s2
    return kp0, kp1, kp2, norm2


def _staggered_dc(grid: Grid, rdtype):
    """Per-axis DC-bin indicator vectors, broadcastable to the half-spectrum
    (nx, ny, nzr) layout.  Their product is 1 at the DC bin and 0 elsewhere;
    used to regularize 1/|k|^2 and zero the G0 output at DC WITHOUT
    `.at[].set` scatters — a scatter forces XLA to materialize the full
    spectral-constant buffer (0.8 GB of c1/c2/n2 at 512^3), while the
    indicator product stays an elementwise fusion over 1-D inputs."""
    dx = (jnp.arange(grid.nx) == 0).astype(rdtype).reshape(-1, 1, 1)
    dy = (jnp.arange(grid.ny) == 0).astype(rdtype).reshape(-1, 1)
    dz = (jnp.arange(grid.nz // 2 + 1) == 0).astype(rdtype)
    return dx, dy, dz


def g0_staggered(grid: Grid, mu_0, lambda_0, tau_hat, alpha=-1.0):
    """eta_hat = alpha * G0_hat(tau_hat) on 3-component (force) hat fields
    (G0OperatorFourierStaggered + General, fibergen.cpp:19749-19927):

        eta = c1 tau + c2 (tau . k+) k-        with k- = -conj(k+)
        c1  = -alpha/(mu0 |k|^2)
        c2  = -alpha (lam0+mu0) / (mu0 (lam0+2mu0) |k|^4)
    """
    c10 = -alpha / mu_0
    c20 = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))
    return _g0_staggered_general(grid, tau_hat, c10, c20)


def g0_staggered_hyper(grid: Grid, mu_0, lambda_0, tau_hat, alpha=-1.0):
    """Staggered G0 for the full-gradient scheme (fibergen.cpp:19768-19774)."""
    c10 = -alpha / (2.0 * mu_0)
    with np.errstate(divide="ignore"):  # lambda_0 = 0 -> c20 = 0 (IEEE inf)
        c20 = float(-alpha / (2.0 * mu_0 * (1.0 + 2.0 * mu_0 / np.float64(lambda_0))))
    return _g0_staggered_general(grid, tau_hat, c10, c20)


def _g0_staggered_general(grid: Grid, tau_hat, c10, c20):
    rdtype = jnp.real(tau_hat).dtype
    kp0, kp1, kp2, n2 = _staggered_k(grid, rdtype)
    dx, dy, dz = _staggered_dc(grid, rdtype)
    dc = dx * dy * dz
    n2s = n2 + dc          # regularizes the n2=0 DC bin
    ndc = 1.0 - dc         # zeroes the output there (was _set_dc)

    c1 = c10 * ndc / n2s
    c2 = c20 * ndc / (n2s * n2s)

    fkp = tau_hat[0] * kp0 + tau_hat[1] * kp1 + tau_hat[2] * kp2
    c2_fkp = c2 * fkp
    # k- = (-Re(k+), Im(k+)) = -conj(k+)
    return jnp.stack([
        c1 * tau_hat[0] - c2_fkp * jnp.conj(kp0),
        c1 * tau_hat[1] - c2_fkp * jnp.conj(kp1),
        c1 * tau_hat[2] - c2_fkp * jnp.conj(kp2),
    ])


def _g0_fused_dispatch(grid: Grid, f, pallas_mid, par, hat_fn, slab_fn,
                       mid_fn, chain_fn):
    """Shared dispatch skeleton of the staggered ``*_fused`` entry points
    (g0_staggered / _hyper / _heat differ only in constants and kernels):

      * ``par`` (SlabFFT): qualifying shapes run the kz-slab-distributed
        Pallas middle (``slab_fn`` — explicit shard_map, where pallas_call
        IS allowed), the rest the slab-FFT pair around ``hat_fn``;
      * single chip off the matmul backend: separate transforms around
        ``hat_fn``;
      * qualifying single-chip shapes: the radix-2 Pallas middle
        (``mid_fn``); pass ``pallas_mid=False`` when the field may be
        GSPMD-sharded (pallas_call does not run under GSPMD);
      * otherwise the transpose-free XLA chain (``chain_fn``)."""
    from . import fft as fftmod
    from . import pallas_chain

    shape = f.shape[-3:]
    if par is not None:
        if (pallas_mid and fftmod.mm_enabled(shape)
                and pallas_chain.middle_slab_enabled(par, shape,
                                                     f.shape[0])):
            return slab_fn()
        return par.ifftn(hat_fn(par.fftn(f)), shape)
    if not fftmod.mm_enabled(shape):
        return fftmod.ifftn(hat_fn(fftmod.fftn(f)), shape)
    if pallas_mid and pallas_chain.middle_enabled(shape, f.shape[0]):
        return mid_fn()
    return chain_fn()


def g0_staggered_fused(grid: Grid, mu_0, lambda_0, f, alpha=-1.0,
                       pallas_mid=True, par=None):
    """u = ifftn(G0_staggered(fftn(f))) as ONE transpose-free chain.

    The separate fftn/g0/ifftn path materializes the hat field twice and
    pays a moveaxis round trip per DFT stage; this runs the whole
    fft+scale+ifft in the matmul-DFT's cyclically rotating layout
    (ops/fft.fftn_apply_ifftn_mm) with the G0 scaling (same math as
    :func:`g0_staggered`, fibergen.cpp:19749-19927) applied elementwise
    between the forward and inverse x-stages — u_hat never exists in HBM.
    Dispatch across the Pallas middle / distributed kz-slab middle /
    slab-FFT pair / separate transforms: :func:`_g0_fused_dispatch`."""
    from . import pallas_chain

    c10 = -alpha / mu_0
    c20 = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))
    return _g0_fused_dispatch(
        grid, f, pallas_mid, par,
        lambda f_hat: g0_staggered(grid, mu_0, lambda_0, f_hat, alpha),
        lambda: pallas_chain.g0_staggered_middle_slab(par, grid, f, c10, c20),
        lambda: pallas_chain.g0_staggered_middle(grid, f, c10, c20),
        lambda: _g0_staggered_chain(grid, f, c10, c20))


def g0_staggered_hyper_fused(grid: Grid, mu_0, lambda_0, f, alpha=-1.0,
                             pallas_mid=True, par=None):
    """Fused-chain variant of :func:`g0_staggered_hyper` (full-gradient
    scheme coefficients, fibergen.cpp:19768-19774); same G0 kernel as
    :func:`g0_staggered_fused`, different constants."""
    from . import pallas_chain

    c10 = -alpha / (2.0 * mu_0)
    with np.errstate(divide="ignore"):  # lambda_0 = 0 -> c20 = 0 (IEEE inf)
        c20 = float(-alpha / (2.0 * mu_0 * (1.0 + 2.0 * mu_0 / np.float64(lambda_0))))
    return _g0_fused_dispatch(
        grid, f, pallas_mid, par,
        lambda f_hat: g0_staggered_hyper(grid, mu_0, lambda_0, f_hat, alpha),
        lambda: pallas_chain.g0_staggered_middle_slab(par, grid, f, c10, c20),
        lambda: pallas_chain.g0_staggered_middle(grid, f, c10, c20),
        lambda: _g0_staggered_chain(grid, f, c10, c20))


def g0_staggered_heat_fused(grid: Grid, mu_0, lambda_0, f, alpha=-1.0,
                            pallas_mid=True, par=None):
    """Fused-chain variant of :func:`g0_staggered_heat` (scalar G0,
    fibergen.cpp:19778-19830): one transpose-free fft+scale+ifft."""
    from . import pallas_chain

    c10 = -alpha / (2.0 * mu_0)

    def chain_fn():
        return _g0_heat_chain(grid, f, c10)

    return _g0_fused_dispatch(
        grid, f, pallas_mid, par,
        lambda f_hat: g0_staggered_heat(grid, mu_0, lambda_0, f_hat, alpha),
        lambda: pallas_chain.g0_staggered_heat_middle_slab(par, grid, f, c10),
        lambda: pallas_chain.g0_staggered_heat_middle(grid, f, c10),
        chain_fn)


def _g0_heat_chain(grid: Grid, f, c10):
    """Transpose-free XLA chain of the scalar staggered G0."""
    from . import fft as fftmod

    def apply(re, im):
        rdtype = re.dtype
        kp0, kp1, kp2, _ = _staggered_k(grid, rdtype)
        # (KZ, KY, KX) layout: rebuild |k|^2 from the 1-D factors and bake
        # the DC zero in with the indicator mask (no materialized buffers);
        # kx/ky vectors reordered to the chain's bin order (_chain_ax)
        kp = (kp2.reshape(-1, 1, 1),
              _chain_ax(kp1, grid.ny).reshape(1, -1, 1),
              _chain_ax(kp0, grid.nx).reshape(1, 1, -1))
        n2p = sum(jnp.real(k) ** 2 + jnp.imag(k) ** 2 for k in kp)
        dc, _ = _dc_perm(grid, rdtype)
        c1 = c10 * (1.0 - dc) / (n2p + dc)
        return c1 * re, c1 * im

    return fftmod.fftn_apply_ifftn_mm(f, apply)


def _g0_staggered_chain(grid: Grid, f, c10, c20):
    from . import fft as fftmod

    def apply(re, im):
        # layout (..., KZ, KY, KX): permute the broadcastable k-factors
        rdtype = re.dtype
        kp0, kp1, kp2, _ = _staggered_k(grid, rdtype)
        # axes here are (KZ, KY, KX): kp0 varies along KX (last), kp1 along
        # KY, kp2 along KZ (first); kx/ky vectors reordered to the chain's
        # bin order (_chain_ax)
        kp = (_chain_ax(kp0, grid.nx).reshape(1, 1, -1),
              _chain_ax(kp1, grid.ny).reshape(1, -1, 1),
              kp2.reshape(-1, 1, 1))
        kpr = [jnp.real(k) for k in kp]
        kpi = [jnp.imag(k) for k in kp]
        # |k|^2 rebuilt from the 1-D factors IN this layout (|kp_a|^2 =
        # s_a^2): a sum of 1-D broadcasts, so with the mask-based DC
        # handling below none of n2/c1/c2 is ever a materialized buffer
        n2p = sum(kpr[j] * kpr[j] + kpi[j] * kpi[j] for j in range(3))
        dc, _ = _dc_perm(grid, rdtype)
        n2s = n2p + dc
        ndc = 1.0 - dc
        c1 = c10 * ndc / n2s                          # bakes the DC zero in
        c2 = c20 * ndc / (n2s * n2s)
        # fkp = sum_j tau_j kp_j ; eta_j = c1 tau_j - c2 fkp conj(kp_j)
        fr = sum(re[j] * kpr[j] - im[j] * kpi[j] for j in range(3))
        fi = sum(re[j] * kpi[j] + im[j] * kpr[j] for j in range(3))
        cfr, cfi = c2 * fr, c2 * fi
        re2 = jnp.stack([c1 * re[j] - (cfr * kpr[j] + cfi * kpi[j])
                         for j in range(3)])
        im2 = jnp.stack([c1 * im[j] - (cfi * kpr[j] - cfr * kpi[j])
                         for j in range(3)])
        return re2, im2

    return fftmod.fftn_apply_ifftn_mm(f, apply)


# ------------------------------------------------- true-2-D (dim=2) chains
# The <dim>2</dim> instantiation: in-plane force fields only (2 components
# for elasticity, 1 for heat), spectral factors built over (KY, KX) — the
# 2-D chain's layout (ops/fft.fft2_apply_ifft2_mm).  These are the operators
# the reference's disabled DIM=2 dispatch would instantiate
# (fibergen.cpp:26550-26565): a periodic one-voxel z axis has kz = 0
# identically, so dropping the z row/column is exact, not an approximation.

def _staggered_k_2d(grid: Grid, rdtype):
    """1-D staggered wavenumber factors for the (KY, KX) chain layout:
    kpx over the full x axis, kpy over the y half-spectrum axis
    (same modified wavenumbers as :func:`_staggered_k`)."""
    from ..core.grid import _freq_index, _rfreq_index
    fx = _freq_index(grid.nx)
    fy = _rfreq_index(grid.ny)
    xix = jnp.asarray(fx * (np.pi / grid.nx), rdtype)
    xiy = jnp.asarray(fy * (np.pi / grid.ny), rdtype)
    hx, hy, _ = grid.staggered_h()
    sx = jnp.sin(xix) / hx
    sy = jnp.sin(xiy) / hy
    cd = jnp.result_type(rdtype, jnp.complex64)
    kpx = (sx * jnp.exp(1j * xix.astype(cd))).reshape(1, -1)
    kpy = (sy * jnp.exp(1j * xiy.astype(cd))).reshape(-1, 1)
    n2 = (sx * sx).reshape(1, -1) + (sy * sy).reshape(-1, 1)
    return kpx, kpy, n2


def _dc_2d(grid: Grid, rdtype):
    """DC indicator / complement in the (KY, KX) layout (mask-based, no
    scatters — see :func:`_staggered_dc`)."""
    dcx = (jnp.arange(grid.nx) == 0).astype(rdtype).reshape(1, -1)
    dcy = (jnp.arange(grid.ny // 2 + 1) == 0).astype(rdtype).reshape(-1, 1)
    dc = dcy * dcx
    return dc, 1.0 - dc


def _xi_2d(grid: Grid, rdtype):
    """Continuous wavenumber vectors in the 2-D chain's (KY, KX) layout:
    x along the full KX axis, y along the half-spectrum KY axis."""
    from ..core.grid import _freq_index, _rfreq_index
    fx = _freq_index(grid.nx) / grid.dx
    fy = _rfreq_index(grid.ny) / grid.dy
    return (jnp.asarray(fx, rdtype).reshape(1, -1),
            jnp.asarray(fy, rdtype).reshape(-1, 1))


def _sym_nyquist_x_2d(grid: Grid, part, p, x0):
    """x-Nyquist sign symmetrization for the 2-D collocated chains: the
    nz=1 3-D path's final real-part projection averages the collocated
    Gamma over the two Nyquist sign choices of an even nx (killing the
    x0-odd cross terms); reproduce that so the 2-D chain is bit-equivalent
    in exact arithmetic.  The double-Nyquist bin (even nx AND even ny) is
    self-conjugate — the 3-D path applies Gamma there unaveraged (real in,
    real out — nothing is projected away), so it is excluded.  (The
    staggered k+ needs none of this: sin(t)e^{it} is sign-invariant at
    t = pi/2.)"""
    out = part(p, x0)
    if grid.nx % 2 == 0:
        nyq = (jnp.arange(grid.nx) == grid.nx // 2).astype(
            p.dtype).reshape(1, -1)
        if grid.ny % 2 == 0:
            nyq = nyq * (1.0 - (jnp.arange(grid.ny // 2 + 1)
                                == grid.ny // 2).astype(
                p.dtype).reshape(-1, 1))
        out = out + 0.5 * nyq * (part(p, -x0) - out)
    return out


def gamma_collocated_fused_2d(grid: Grid, E, mu_0, lambda_0, tau,
                              alpha=-1.0):
    """True-2-D collocated Gamma chain (beta = 0, trivial BC): only the
    in-plane components [xx, yy, xy] ride the 2-D half-spectrum chain —
    at kz = 0 the out-of-plane rows of :func:`gamma_collocated` vanish
    identically, so those components are exactly the constants E[2..4].
    Falls back to the full 6-component separate transforms off the 2-D
    matmul backend."""
    from . import fft as fftmod

    rdtype = tau.dtype
    Ej = jnp.asarray(E, rdtype)
    if not fftmod.mm2d_enabled(tau.shape[-3:]):
        tau_hat = fftmod.fftn(tau)
        eta_hat = gamma_collocated(grid, Ej, mu_0, lambda_0, tau_hat, alpha)
        return fftmod.ifftn(eta_hat, tau.shape[-3:])

    A = alpha / (2.0 * mu_0)
    B = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))
    Er = Ej[jnp.array([0, 1, 5])].reshape(3, 1, 1)

    def apply(re, im):
        x0, x1 = _xi_2d(grid, re.dtype)
        dc, ndc = _dc_2d(grid, re.dtype)
        k2 = x0 * x0 + x1 * x1 + dc

        def part(p, xx0):
            t0 = p[0] * xx0 + p[2] * x1
            t1 = p[2] * xx0 + p[1] * x1
            s = xx0 * t0 + x1 * t1
            a = A / k2
            b = (B / (k2 * k2)) * s
            return jnp.stack([
                a * (2.0 * xx0 * t0) + b * (xx0 * xx0),
                a * (2.0 * x1 * t1) + b * (x1 * x1),
                a * (xx0 * t1 + x1 * t0) + b * (xx0 * x1),
            ])

        def sym(p):
            return _sym_nyquist_x_2d(grid, part, p, x0)

        return sym(re) * ndc + Er * dc, sym(im) * ndc

    taur = jnp.stack([tau[0], tau[1], tau[5]])
    eta = fftmod.fft2_apply_ifft2_mm(taur, apply)
    shp = eta.shape[1:]
    return jnp.stack([
        eta[0], eta[1],
        jnp.broadcast_to(Ej[2], shp),
        jnp.broadcast_to(Ej[3], shp),
        jnp.broadcast_to(Ej[4], shp),
        eta[2],
    ])


def gamma_collocated_heat_fused_2d(grid: Grid, E, mu_0, lambda_0, tau,
                                   alpha=-1.0):
    """True-2-D collocated heat Gamma chain (beta = 0, trivial BC); the z
    component of :func:`gamma_collocated_heat` is c * xi_z * s = 0 at
    kz = 0, so it is exactly the constant E[2]."""
    from . import fft as fftmod

    rdtype = tau.dtype
    Ej = jnp.asarray(E, rdtype)
    if not fftmod.mm2d_enabled(tau.shape[-3:]):
        tau_hat = fftmod.fftn(tau)
        eta_hat = gamma_collocated_heat(grid, Ej, mu_0, lambda_0, tau_hat,
                                        alpha)
        return fftmod.ifftn(eta_hat, tau.shape[-3:])

    A = alpha / (2.0 * mu_0)
    Er = Ej[:2].reshape(2, 1, 1)

    def apply(re, im):
        x0, x1 = _xi_2d(grid, re.dtype)
        dc, ndc = _dc_2d(grid, re.dtype)
        k2 = x0 * x0 + x1 * x1 + dc

        def part(p, xx0):
            c = A * (p[0] * xx0 + p[1] * x1) / k2
            return jnp.stack([c * xx0, c * x1])

        def sym(p):
            return _sym_nyquist_x_2d(grid, part, p, x0)

        return sym(re) * ndc + Er * dc, sym(im) * ndc

    eta = fftmod.fft2_apply_ifft2_mm(tau[:2], apply)
    return jnp.concatenate(
        [eta, jnp.broadcast_to(Ej[2], eta.shape[1:])[None]], axis=0)


def g0_staggered_fused_2d(grid: Grid, mu_0, lambda_0, f, alpha=-1.0):
    """u = irfft2(G0_staggered_2d(rfft2(f))) on in-plane (2, nx, ny, 1)
    force fields as one transpose-free 2-D chain — the true DIM=2 staggered
    G0 (same c1/c2 coefficients as :func:`g0_staggered`,
    fibergen.cpp:19749-19927, restricted to the kz = 0 plane where the z
    row decouples exactly).  Falls back to the zero-padded 3-component path
    off the 2-D matmul backend."""
    from . import fft as fftmod

    c10 = -alpha / mu_0
    c20 = float(-alpha / (mu_0 * (1.0 + mu_0 / (np.float64(lambda_0) + mu_0))))

    if not fftmod.mm2d_enabled(f.shape[-3:]):
        # separate transforms, still only the 2 in-plane components
        f_hat = fftmod.fftn(f)
        u_hat = _g0_staggered_2d_hat(grid, f_hat, c10, c20)
        return fftmod.ifftn(u_hat, f.shape[-3:])

    def apply(re, im):
        rdtype = re.dtype
        kpx, kpy, n2 = _staggered_k_2d(grid, rdtype)
        kpr = (jnp.real(kpx), jnp.real(kpy))
        kpi = (jnp.imag(kpx), jnp.imag(kpy))
        dc, ndc = _dc_2d(grid, rdtype)
        n2s = n2 + dc
        c1 = c10 * ndc / n2s
        c2 = c20 * ndc / (n2s * n2s)
        fr = sum(re[j] * kpr[j] - im[j] * kpi[j] for j in range(2))
        fi = sum(re[j] * kpi[j] + im[j] * kpr[j] for j in range(2))
        cfr, cfi = c2 * fr, c2 * fi
        re2 = jnp.stack([c1 * re[j] - (cfr * kpr[j] + cfi * kpi[j])
                         for j in range(2)])
        im2 = jnp.stack([c1 * im[j] - (cfi * kpr[j] - cfr * kpi[j])
                         for j in range(2)])
        return re2, im2

    return fftmod.fft2_apply_ifft2_mm(f, apply)


def _g0_staggered_2d_hat(grid: Grid, tau_hat, c10, c20):
    """Separate-transform variant of the true-2-D staggered G0: 2-component
    (nx, ny, 1) hat fields in the standard rfftn layout (the z half-axis is
    trivial), kp_z = 0 exactly."""
    rdtype = jnp.real(tau_hat).dtype
    kp0, kp1, _, n2 = _staggered_k(grid, rdtype)
    dx, dy, dz = _staggered_dc(grid, rdtype)
    dc = dx * dy * dz
    n2s = n2 + dc
    ndc = 1.0 - dc
    c1 = c10 * ndc / n2s
    c2 = c20 * ndc / (n2s * n2s)
    fkp = tau_hat[0] * kp0 + tau_hat[1] * kp1
    c2_fkp = c2 * fkp
    return jnp.stack([
        c1 * tau_hat[0] - c2_fkp * jnp.conj(kp0),
        c1 * tau_hat[1] - c2_fkp * jnp.conj(kp1),
    ])


def g0_staggered_heat_fused_2d(grid: Grid, mu_0, lambda_0, f, alpha=-1.0):
    """True-2-D scalar staggered G0 chain on (1, nx, ny, 1) force fields
    (:func:`g0_staggered_heat` restricted to kz = 0)."""
    from . import fft as fftmod

    if not fftmod.mm2d_enabled(f.shape[-3:]):
        f_hat = fftmod.fftn(f)
        u_hat = g0_staggered_heat(grid, mu_0, lambda_0, f_hat, alpha)
        return fftmod.ifftn(u_hat, f.shape[-3:])

    c10 = -alpha / (2.0 * mu_0)

    def apply(re, im):
        rdtype = re.dtype
        _, _, n2 = _staggered_k_2d(grid, rdtype)
        dc, ndc = _dc_2d(grid, rdtype)
        c1 = c10 * ndc / (n2 + dc)
        return c1 * re, c1 * im

    return fftmod.fft2_apply_ifft2_mm(f, apply)


def g0_staggered_heat(grid: Grid, mu_0, lambda_0, tau_hat, alpha=-1.0):
    """Scalar staggered G0 (G0OperatorFourierStaggeredGeneralHeat,
    fibergen.cpp:19778-19830): eta = -alpha/(2 mu0 |k|^2) * tau."""
    rdtype = jnp.real(tau_hat).dtype
    _, _, _, n2 = _staggered_k(grid, rdtype)
    dx, dy, dz = _staggered_dc(grid, rdtype)
    dc = dx * dy * dz
    c10 = -alpha / (2.0 * mu_0)
    eta = (c10 * (1.0 - dc) / (n2 + dc)) * tau_hat[0]
    return eta[None]


# ---------------------------------------------------------------------------
# Willot rotated scheme
# ---------------------------------------------------------------------------

def gamma_willot(grid: Grid, E, mu_0, lambda_0, tau_hat, alpha=-1.0, beta=0.0):
    """Willot's rotated discrete Green operator on symmetric (6 comp) fields
    (GammaOperatorFourierWillotR, fibergen.cpp:19083-19299).

    The discrete wavevector is
        kvec_a = i/4 * tan(q_a/2) * prod_b(1 + e^{i q_b}) / w_a,
        q_a = 2 pi f_a / n_a,  w_a = d_a / n_a
    normalized to r = kvec/|kvec|.  gamma is evaluated in a lambda_0-scaled
    form valid for finite lambda_0 (incl. 0); pass ``lambda_0=None`` for the
    lambda_0 -> infinity limit used by the viscosity Delta scheme.
    """
    rdtype = jnp.real(tau_hat).dtype
    cdtype = tau_hat.dtype
    fx, fy, fz = grid.freq_index
    q0 = jnp.asarray(fx * (2.0 * np.pi / grid.nx), rdtype)
    q1 = jnp.asarray(fy * (2.0 * np.pi / grid.ny), rdtype)
    q2 = jnp.asarray(fz * (2.0 * np.pi / grid.nz), rdtype)
    w = (grid.dx / grid.nx, grid.dy / grid.ny, grid.dz / grid.nz)

    e0 = 1.0 + jnp.exp(1j * q0.astype(cdtype))
    e1 = 1.0 + jnp.exp(1j * q1.astype(cdtype))
    e2 = 1.0 + jnp.exp(1j * q2.astype(cdtype))
    e012 = e0 * e1 * e2

    kv = [
        (1j * 0.25 / w[0]) * jnp.tan(0.5 * q0) * e012,
        (1j * 0.25 / w[1]) * jnp.tan(0.5 * q1) * e012,
        (1j * 0.25 / w[2]) * jnp.tan(0.5 * q2) * e012,
    ]
    tiny = np.finfo(np.dtype(rdtype)).tiny
    mag = jnp.sqrt(sum(jnp.abs(k) ** 2 for k in kv)) + tiny
    r = [k / mag for k in kv]
    rc = [jnp.conj(x) for x in r]
    r2 = jnp.abs(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]) ** 2

    # lambda_0-scaled coefficients (fibergen.cpp:19242-19250); the
    # lambda_0 -> inf limit gives (1, 1, 0, 2, 1) (fibergen.cpp:19231-19240).
    if lambda_0 is None or np.isinf(lambda_0):
        a1, a2, a3, b1, b2 = 1.0, 1.0, 0.0, 2.0, 1.0
    else:
        a1 = lambda_0 + 2.0 * mu_0
        a2 = lambda_0
        a3 = -mu_0
        b1 = 2.0 * (lambda_0 + mu_0)
        b2 = lambda_0
    den = mu_0 * (b1 - b2 * r2)

    vi = [0, 1, 2, 1, 0, 0]
    vj = [0, 1, 2, 2, 2, 1]

    def im(a, b):
        return (a * jnp.conj(b)).imag

    def s_term(i, j, k):
        # s_{jk} with row indices (i, j) (fibergen.cpp:19181-19214)
        if k == j:
            v = im(r[i], r[k])
            return 4.0 * v * v
        return -4.0 * im(r[k], r[j]) * im(r[k], r[i])

    def gamma_entry(iv, jv):
        i, j = vi[iv], vj[iv]
        k, l = vi[jv], vj[jv]
        d = lambda a, b: 1.0 if a == b else 0.0
        A = 0.25 * (
            r[i] * rc[l] * d(j, k) + r[j] * rc[l] * d(i, k)
            + r[i] * rc[k] * d(j, l) + r[j] * rc[k] * d(i, l)
        )
        B = 0.25 * (
            r[i] * rc[l] * s_term(i, j, k) + r[j] * rc[l] * s_term(j, i, k)
            + r[i] * rc[k] * s_term(i, j, l) + r[j] * rc[k] * s_term(j, i, l)
        ) - (r[i] * rc[j]).real * (r[k] * rc[l]).real
        C = r[i] * r[j] * rc[k] * rc[l]
        return (a1 * A + a2 * B + a3 * C) / den

    # cache the upper triangle; lower triangle entries are conjugates
    cache = {}

    def g(iv, jv):
        if iv <= jv:
            key = (iv, jv)
            if key not in cache:
                cache[key] = gamma_entry(iv, jv)
            return cache[key]
        key = (jv, iv)
        if key not in cache:
            cache[key] = gamma_entry(jv, iv)
        return jnp.conj(cache[key])

    outs = []
    for iv in range(6):
        acc = 0.0
        for jv in range(6):
            wgt = 2.0 if jv >= 3 else 1.0
            acc = acc + wgt * g(iv, jv) * tau_hat[jv]
        outs.append(alpha * acc + (beta * tau_hat[iv] if beta != 0.0 else 0.0))
    eta = jnp.stack(outs)
    return _set_dc(eta, jnp.asarray(E, eta.dtype))


# ---------------------------------------------------------------------------
# Auxiliary Fourier operators for the hyperelastic Newton-Krylov path
# ---------------------------------------------------------------------------

def grad_hyper(grid: Grid, q_hat):
    """W_hat = GRAD_hat q_hat (GradOperatorFourierHyper, fibergen.cpp:22069)."""
    rdtype = jnp.real(q_hat).dtype
    xi0, xi1, xi2 = _xi_bcast(grid, rdtype)
    two_pi = 2.0 * np.pi
    xi0, xi1, xi2 = two_pi * xi0, two_pi * xi1, two_pi * xi2
    i = 1j
    q0, q1, q2 = q_hat[0], q_hat[1], q_hat[2]
    return jnp.stack([
        i * xi0 * q0, i * xi1 * q1, i * xi2 * q2,
        i * xi2 * q1, i * xi2 * q0, i * xi1 * q0,
        i * xi1 * q2, i * xi0 * q2, i * xi0 * q1,
    ])


def g0_div_hyper(grid: Grid, mu_0, lambda_0, tau_hat, alpha=1.0):
    """eta_hat = alpha * G0_hat Div_hat tau_hat on 9-component fields
    (G0DivOperatorFourierHyper, fibergen.cpp:20155-20218)."""
    rdtype = jnp.real(tau_hat).dtype
    xi0, xi1, xi2 = _xi_bcast(grid, rdtype)
    two_pi = 2.0 * np.pi
    xi0, xi1, xi2 = two_pi * xi0, two_pi * xi1, two_pi * xi2
    k2 = xi0 * xi0 + xi1 * xi1 + xi2 * xi2
    k2 = k2.at[0, 0, 0].set(1.0)

    c10 = -alpha / (2.0 * mu_0)
    with np.errstate(divide="ignore"):
        c20 = float(alpha / (2.0 * mu_0 * (1.0 + 2.0 * mu_0 / np.float64(lambda_0))))
    c1 = c10 / k2
    c2 = c20 / (k2 * k2)

    i = 1j
    f1 = i * (xi0 * tau_hat[0] + xi1 * tau_hat[5] + xi2 * tau_hat[4])
    f2 = i * (xi0 * tau_hat[8] + xi1 * tau_hat[1] + xi2 * tau_hat[3])
    f3 = i * (xi0 * tau_hat[7] + xi1 * tau_hat[6] + xi2 * tau_hat[2])
    s = xi0 * f1 + xi1 * f2 + xi2 * f3

    eta = jnp.stack([
        c1 * f1 + c2 * xi0 * s,
        c1 * f2 + c2 * xi1 * s,
        c1 * f3 + c2 * xi2 * s,
    ])
    return _set_dc(eta, jnp.zeros((), eta.dtype))


def poisson_solve(grid: Grid, f):
    """Solve Laplace(p) = f with zero mean on the periodic grid
    (LSSolver::poisson_solve, fibergen.cpp:23454-23500): divide the rhs hat
    by the 7-point Laplacian symbol sum_a 2 (cos(xi_a) - 1) / d_a^2 * n_a^2
    and zero the DC bin.  ``f`` is (1, nx, ny, nz) real; returns same."""
    from . import fft as fftmod
    f_hat = fftmod.fftn(f)
    rdtype = jnp.real(f_hat).dtype
    fx, fy, fz = grid.freq_index
    cx = 2.0 * (np.cos(2.0 * np.pi * fx / grid.nx) - 1.0) * (grid.nx / grid.dx) ** 2
    cy = 2.0 * (np.cos(2.0 * np.pi * fy / grid.ny) - 1.0) * (grid.ny / grid.dy) ** 2
    cz = 2.0 * (np.cos(2.0 * np.pi * fz / grid.nz) - 1.0) * (grid.nz / grid.dz) ** 2
    denom = jnp.asarray(cx + cy + cz, rdtype)
    denom = denom.at[0, 0, 0].set(1.0)
    p_hat = f_hat / denom
    p_hat = _set_dc(p_hat, jnp.zeros((), p_hat.dtype))
    return fftmod.ifftn(p_hat, grid.shape)
