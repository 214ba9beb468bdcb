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
