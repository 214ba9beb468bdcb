"""Deflated CG experiment: does phase-indicator deflation cut iteration
counts on high-contrast microstructures?

The LS equation A eps = E with A = I + Gamma(C-C0) is solved by CG; the
iteration count grows with contrast (digital rocks: contrast ~1e3, 78
iterations at tol 1e-5).  Deflation with phase-mode vectors removes the
low-frequency phase modes from the spectrum — the composite version of
rigid-body-mode deflation (Jonsthovel et al., "Deflated PCG applied to
composite materials").

Subtlety this experiment surfaced (kept as documentation): A is
self-adjoint in the Voigt-weighted l2 product ONLY on the COMPATIBLE
subspace V = range(Gamma_0) (zero-mean symmetrized-gradient fields) —
that is where plain CG implicitly operates, since r0 and every direction
are Gamma images (cf. Zeman et al. 2010).  Raw indicator fields
chi_p e_c are NOT compatible (measured 64% asymmetry of <u, Av> on them;
deflated CG built on them diverges), so every deflation vector must be
projected into V first.  With mu_0 iso / lambda_0 = 0, alpha = 2 mu_0
makes Gamma_0 the exact l2-orthogonal projection (verified idempotent to
1e-16).

Measures iterations-to-tol for plain vs deflated CG on a synthetic
2-phase sphere at several contrasts.  Setup cost = m projection + m
operator applies, amortized over the 6 load cases of
calc_effective_properties if productized.

Usage: python scripts/bench_deflation.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def deflated_cg(solver, phis, E, tol=1e-5, maxiter=1000):
    """Textbook deflated CG (Saad et al., "A deflated version of the
    conjugate gradient algorithm") on (I + Gamma(C-C0)) eps = E."""
    import jax
    import jax.numpy as jnp

    from fibergen_tpu.core import fields, voigt
    from fibergen_tpu.ops import gamma as gammamod

    dt = solver.dtype
    mf = solver.mat.fields()
    mu0, lam0 = solver.mu_0, solver.lambda_0
    dim = solver.dim
    grid = solver.grid
    nxyz = float(np.prod(grid.shape))
    wv = np.asarray(voigt.weights(dim))

    def Aop(v):
        return v - solver._k_krylov(mf, v, None, mu0=mu0, lam0=lam0)

    def G0proj(v):
        return gammamod.gamma_operator(
            grid, solver.mode, solver.scheme, None, np.zeros(dim),
            mu0, lam0, v, alpha=2.0 * mu0, beta=0.0)

    # centered indicators (drop one phase: centered sum is 0), one vector
    # per (phase, Voigt component), each projected into V
    chi = jnp.stack(phis[:-1])
    chi = chi - chi.mean(axis=(1, 2, 3), keepdims=True)
    P = chi.shape[0]
    m = P * dim
    Zf = []
    for p in range(P):
        for c in range(dim):
            z = chi[p][None] * jnp.eye(dim, dtype=dt)[c].reshape(-1, 1, 1, 1)
            Zf.append(G0proj(z))
    Zf = jnp.stack(Zf)                       # (m, dim, nx, ny, nz)
    AZ = jnp.stack([Aop(Zf[j]) for j in range(m)])

    wvj = jnp.asarray(wv, dt).reshape(1, dim, 1, 1, 1)

    @jax.jit
    def ZT(v):
        return jnp.einsum("jdxyz,dxyz->j", Zf * wvj, v) / nxyz

    @jax.jit
    def AZt(v):
        return jnp.einsum("jdxyz,dxyz->j", AZ * wvj, v) / nxyz

    @jax.jit
    def Zmul(mu):
        return jnp.einsum("jdxyz,j->dxyz", Zf, mu)

    Ec = np.stack([np.asarray(ZT(AZ[j])) for j in range(m)])
    Ecinv = np.linalg.pinv(Ec)

    @jax.jit
    def defl(v):
        """v - Z E^-1 (AZ)^T v: removes the deflation-space component of
        the next search direction."""
        mu = jnp.asarray(Ecinv, dt) @ AZt(v)
        return v - Zmul(mu.astype(dt))

    # affine split: x = const E + compatible fluctuation; Galerkin coarse
    # correction makes W^T r = 0 (maintained by the deflated directions)
    b = fields.const_field(grid, E, dt)
    x = b
    r = b - Aop(x)
    x = x + Zmul(jnp.asarray(Ecinv @ np.asarray(ZT(r)), dt))
    r = b - Aop(x)
    g0 = float(fields.inner_l2(r, r))
    gamma = g0
    p_dir = defl(r)
    it = 0
    delta = g0
    while it < maxiter:
        w = Aop(p_dir)
        denom = float(fields.inner_l2_diff(p_dir, w, 0.0 * w))
        alpha = gamma / denom
        x = x + alpha * p_dir
        r = r - alpha * w
        delta = float(fields.inner_l2(r, r))
        it += 1
        if np.sqrt(delta / g0) <= tol:
            break
        p_dir = defl(r) + (delta / gamma) * p_dir
        gamma = delta
    return x, it, float(np.sqrt(delta / g0))


def plain_iters(solver, E, tol, maxiter):
    solver.opt.tol = tol
    solver.opt.maxiter = maxiter
    solver.set_strain(E)
    fail = solver.run()
    return len(solver.residuals), fail


def sphere_case(n, contrast):
    import jax.numpy as jnp

    import fibergen_tpu as fg
    grid = fg.Grid(n, n, n)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("f", fg.LinearIsotropic(mu=contrast, lam=contrast / 2),
                 phi1),
        fg.Phase("m", fg.LinearIsotropic(mu=1.0, lam=1.0), 1.0 - phi1),
    ], dim=6)
    import jax
    dtype = "float64" if jax.default_backend() == "cpu" else "float32"
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype=dtype, error_estimator="residual", check_every=8,
        use_pallas="off"))
    return s, [phi1, 1.0 - phi1]


def main():
    import jax
    if jax.default_backend() == "cpu":
        # the coarse correction (E^-1 solve + Galerkin projection) is
        # f32-UNSTABLE: without x64 the requested float64 silently
        # downcasts and deflated CG diverges while plain CG still
        # converges (measured: n=32 contrast 10, rel 37.7 after 60 its
        # in f32 vs 5.6e-7 in f64).  Enable x64 before any array exists.
        jax.config.update("jax_enable_x64", True)
    from fibergen_tpu.core import fields
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    E = np.array([1.0, 0, 0, 0, 0, 0])
    tol = 1e-6
    for contrast in (10.0, 100.0, 1000.0):
        s, phis = sphere_case(n, contrast)
        s.eps = fields.const_field(s.grid, np.zeros(6), s.dtype)
        s.calc_ref_material()
        it_plain, fail = plain_iters(s, E, tol, 2000)
        x, it_defl, rel = deflated_cg(s, phis, E, tol=tol, maxiter=2000)
        S_plain = np.asarray(s.calc_mean_stress())
        s.eps = x
        S_defl = np.asarray(s.calc_mean_stress())
        dS = np.abs(S_defl - S_plain).max() / np.abs(S_plain).max()
        m = (len(phis) - 1) * 6
        print(f"contrast {contrast:g}: plain {it_plain} it, deflated "
              f"{it_defl} it (+{m} setup applies), "
              f"answer rel diff {dS:.2e}", flush=True)


if __name__ == "__main__":
    main()
