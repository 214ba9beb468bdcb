"""The manual-DMA x-sweep kernels must reproduce the BlockSpec halo
kernels exactly (same math, zero pad traffic) — exercised in Pallas
interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fibergen_tpu.core.grid import Grid
from fibergen_tpu.ops import pallas_kernels as pk
from fibergen_tpu.ops import pallas_sweep as psw


@pytest.fixture(autouse=True)
def _interpret():
    old = pk.INTERPRET
    pk.INTERPRET = True
    yield
    pk.INTERPRET = old


def _rand_fields(nx, ny, nz, seed=0):
    rng = np.random.default_rng(seed)
    r = jnp.asarray(rng.standard_normal((6, nx, ny, nz)), jnp.float32)
    pp = jnp.asarray(rng.standard_normal((6, nx, ny, nz)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((3, nx, ny, nz)), jnp.float32)
    mu = jnp.asarray(1.0 + rng.random((nx, ny, nz)), jnp.float32)
    lam = jnp.asarray(0.5 + rng.random((nx, ny, nz)), jnp.float32)
    return r, pp, u, mu, lam


@pytest.mark.parametrize("shape", [(8, 8, 128), (6, 16, 128), (16, 8, 256)])
def test_stress_div_beta_sweep_matches_blockspec(shape):
    nx, ny, nz = shape
    grid = Grid(nx, ny, nz)
    r, pp, _, mu, lam = _rand_fields(nx, ny, nz)
    beta = jnp.float32(0.37)
    mu0, lam0 = 2.25, 0.0

    f_ref, p_ref = pk.stress_div_beta_staggered(
        grid, r, pp, beta, mu, lam, mu0, lam0)
    f_new, p_new = psw.stress_div_beta_sweep(
        grid, r, pp, beta, mu, lam, mu0, lam0)

    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               rtol=1e-5, atol=2e-3)


@pytest.mark.parametrize("shape", [(8, 8, 128), (6, 16, 128), (16, 8, 256)])
def test_eps_from_u_dot_sweep_matches_blockspec(shape):
    nx, ny, nz = shape
    grid = Grid(nx, ny, nz)
    r, _, u, _, _ = _rand_fields(nx, ny, nz, seed=1)
    E = np.array([0.1, 0.0, 0.2, 0.0, 0.0, 0.05])

    w_ref, dot_ref = pk.eps_from_u_dot_staggered(grid, E, u, r)
    w_new, dot_new = psw.eps_from_u_dot_sweep(grid, E, u, r)

    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_ref),
                               rtol=1e-5, atol=2e-3)
    assert float(dot_new) == pytest.approx(float(dot_ref), rel=1e-5)


def test_sweep_under_jit_and_scan():
    """The kernels must trace inside jit/lax.scan like the CG chunk loop."""
    nx, ny, nz = 8, 8, 128
    grid = Grid(nx, ny, nz)
    r, pp, u, mu, lam = _rand_fields(nx, ny, nz, seed=2)

    @jax.jit
    def step(r, pp):
        def body(carry, _):
            r, pp = carry
            f, p = psw.stress_div_beta_sweep(
                grid, r, pp, jnp.float32(0.5), mu, lam, 2.0, 0.0)
            w, dot = psw.eps_from_u_dot_sweep(
                grid, jnp.zeros(6, jnp.float32), f, p)
            return (w, p), dot
        (r, pp), dots = jax.lax.scan(body, (r, pp), None, length=2)
        return r, dots

    out, dots = step(r, pp)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(dots)))


def test_supported_shapes():
    assert psw.supported(Grid(8, 8, 128), 6, jnp.float32)
    assert not psw.supported(Grid(8, 8, 100), 6, jnp.float32)   # lanes
    assert not psw.supported(Grid(2, 8, 128), 6, jnp.float32)   # nb < 3
    assert not psw.supported(Grid(8, 8, 128), 3, jnp.float32)   # heat dim
    assert not psw.supported(Grid(8, 8, 128), 6, jnp.float64)


def test_sweep_kernels_anisotropic_cell():
    """Non-unit, anisotropic cell dimensions: pins the hx/hy/hz scale
    factors of both sweep kernels against the BlockSpec kernels."""
    nx, ny, nz = 8, 16, 128
    grid = Grid(nx, ny, nz, dx=2.0, dy=0.5, dz=1.25)
    r, pp, u, mu, lam = _rand_fields(nx, ny, nz, seed=2)
    beta = jnp.float32(-0.8)
    mu0, lam0 = 1.75, 0.0

    f_ref, p_ref = pk.stress_div_beta_staggered(
        grid, r, pp, beta, mu, lam, mu0, lam0)
    f_new, p_new = psw.stress_div_beta_sweep(
        grid, r, pp, beta, mu, lam, mu0, lam0)
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               rtol=1e-5, atol=2e-3)

    E = np.array([0.0, -0.3, 0.0, 0.1, 0.0, 0.0])
    w_ref, dot_ref = pk.eps_from_u_dot_staggered(grid, E, u, r)
    w_new, dot_new = psw.eps_from_u_dot_sweep(grid, E, u, r)
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_ref),
                               rtol=1e-5, atol=2e-3)
    assert float(dot_new) == pytest.approx(float(dot_ref), rel=1e-5)


def test_stress_sweep_tau_sum():
    """want_tau_sum returns the exact per-component grid sum of tau (the
    viscosity Delta mean-correction input) alongside unchanged (f, p)."""
    nx, ny, nz = 8, 8, 128
    grid = Grid(nx, ny, nz)
    r, pp, _, mu, lam = _rand_fields(nx, ny, nz, seed=3)
    beta = jnp.float32(0.61)
    mu0, lam0 = 1.5, 0.0

    f0, p0 = psw.stress_div_beta_sweep(grid, r, pp, beta, mu, lam, mu0, lam0)
    f1, p1, ts = psw.stress_div_beta_sweep(grid, r, pp, beta, mu, lam,
                                           mu0, lam0, want_tau_sum=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))
    p_np = np.asarray(p0, np.float64)
    mu_np = np.asarray(mu, np.float64)
    lam_np = np.asarray(lam, np.float64)
    tau = 2.0 * (mu_np - mu0) * p_np
    tr = (lam_np - lam0) * (p_np[0] + p_np[1] + p_np[2])
    tau[0:3] += tr
    ref = tau.reshape(6, -1).sum(axis=1)
    np.testing.assert_allclose(np.asarray(ts, np.float64), ref,
                               rtol=1e-5, atol=1e-2)


def test_eps_sweep_viscosity_tau_term():
    """The in-kernel Delta tau term: w == (plain w) + tau2c*2*(mu-mu0)*p
    and the CG dot is computed against the full w."""
    nx, ny, nz = 8, 8, 128
    grid = Grid(nx, ny, nz)
    p, _, u, mu, _ = _rand_fields(nx, ny, nz, seed=4)
    E = np.array([0.3, 0.0, -0.1, 0.0, 0.05, 0.0])
    tau2c, mu0 = -0.375, 1.2

    w0, _ = psw.eps_from_u_dot_sweep(grid, E, u, p)
    w1, dot1 = psw.eps_from_u_dot_sweep(grid, E, u, p, mu_x=mu,
                                        tau2c=tau2c, mu0=mu0)
    extra = tau2c * 2.0 * (np.asarray(mu) - mu0)[None] * np.asarray(p)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0) + extra,
                               rtol=1e-5, atol=2e-3)
    wv = np.array([1, 1, 1, 2, 2, 2.0])
    p_np = np.asarray(p, np.float64)
    ref = (wv[:, None] * (p_np * (p_np - np.asarray(w1, np.float64)))
           .reshape(6, -1)).sum()
    assert float(dot1) == pytest.approx(ref, rel=1e-5)


def test_supported_visc_shapes():
    assert psw.supported_visc(Grid(8, 8, 128), 6, jnp.float32)
    assert not psw.supported_visc(Grid(8, 8, 100), 6, jnp.float32)
    assert not psw.supported_visc(Grid(8, 8, 128), 3, jnp.float32)


@pytest.mark.parametrize("method", ["cg", "basic"])
def test_viscosity_fused_solve_matches_generic(method):
    """A full viscosity Delta staggered solve through the fused sweep path
    (tau-sum reduction + in-kernel tau term) must match the generic
    gamma/delta path: same answer, same iteration count (within the f32
    reduction-order wiggle)."""
    import fibergen_tpu as fg
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    nx, ny, nz = 8, 8, 128
    grid = Grid(nx, ny, nz)
    x = (np.arange(nx) + 0.5) / nx
    phi = jnp.asarray(np.broadcast_to(
        (x < 0.5)[:, None, None], (nx, ny, nz)).astype(np.float32))

    def solve(use_pallas):
        mat = fg.VoigtMixed([
            fg.Phase("a", fg.ScalarLinearIsotropic(mu=1.0, dim=6), phi),
            fg.Phase("b", fg.ScalarLinearIsotropic(mu=8.0, dim=6),
                     1.0 - phi)], dim=6)
        s = fg.LSSolver(grid, mat, fg.SolverOptions(
            mode="viscosity", method=method, gamma_scheme="staggered",
            tol=1e-5, maxiter=400, dtype="float32", use_pallas=use_pallas))
        s.set_strain([0, 0, 0, 0, 1.0, 0])
        assert not s.run()
        if use_pallas == "on":
            assert s._visc_pallas, "fused viscosity path must engage"
        return np.asarray(s.calc_mean_stress()), len(s.residuals)

    sig_ref, it_ref = solve("off")
    sig_new, it_new = solve("on")
    np.testing.assert_allclose(sig_new, sig_ref, rtol=5e-4, atol=1e-5)
    assert abs(it_new - it_ref) <= 1


def test_viscosity_fused_gate_rejects_lambda_laws():
    """Lambda-carrying laws in viscosity mode must NOT engage the fused
    path (its in-kernel tau term is the scalar 2(mu-mu0)p only): the
    solver keeps the generic delta path and still converges."""
    import fibergen_tpu as fg
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    nx, ny, nz = 8, 8, 128
    grid = Grid(nx, ny, nz)
    x = (np.arange(nx) + 0.5) / nx
    phi = jnp.asarray(np.broadcast_to(
        (x < 0.5)[:, None, None], (nx, ny, nz)).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("a", fg.LinearIsotropic(mu=1.0, lam=0.7), phi),
        fg.Phase("b", fg.LinearIsotropic(mu=4.0, lam=0.3), 1.0 - phi)],
        dim=6)
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="viscosity", method="cg", gamma_scheme="staggered",
        tol=1e-5, maxiter=400, dtype="float32", use_pallas="on"))
    assert not s._visc_pallas
    s.set_strain([0, 0, 0, 0, 1.0, 0])
    assert not s.run()
    assert np.all(np.isfinite(np.asarray(s.calc_mean_stress())))
