"""True DIM=2 instantiation tests.

The reference declares <dim>2</dim> in its schema and has a (disabled)
DIM=2 template dispatch (fibergen.cpp:26550-26565); fibergen_tpu
instantiates the real thing on one-voxel-thick grids: an in-plane-only
staggered pipeline (2-component force, 2-D half-spectrum matmul-DFT chain,
constant out-of-plane components).  These tests pin

  * the 2-D spectral chain against the generic rfft2 route,
  * exact equivalence (fields, iteration counts) between the true 2-D
    pipeline and the nz=1 3-D superset path it replaces,
  * the loading/material qualification guards.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fibergen_tpu.core.grid import Grid
from fibergen_tpu.materials import laws
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.ops import fft as fftmod
from fibergen_tpu.solvers.ls import LSSolver, SolverOptions


@pytest.fixture
def mm_backend(monkeypatch):
    """Force the matmul-DFT backend so the 2-D chain runs on CPU."""
    monkeypatch.setattr(fftmod, "FFT_BACKEND", "matmul")


def checkerboard_phi(grid, seed=0):
    rng = np.random.default_rng(seed)
    m = (rng.random((grid.nx, grid.ny, grid.nz)) < 0.4).astype(np.float64)
    phi1 = jnp.asarray(m)
    return phi1, 1.0 - phi1


def elastic_mat(grid, seed=0):
    phi1, phi2 = checkerboard_phi(grid, seed)
    return VoigtMixed([
        Phase("fiber", laws.LinearIsotropic(mu=5.0, lam=3.0), phi1),
        Phase("matrix", laws.LinearIsotropic(mu=1.0, lam=0.7), phi2),
    ], dim=6)


def heat_mat(grid, seed=0):
    phi1, phi2 = checkerboard_phi(grid, seed)
    return VoigtMixed([
        Phase("fiber", laws.ScalarLinearIsotropic(mu=8.0, dim=3), phi1),
        Phase("matrix", laws.ScalarLinearIsotropic(mu=1.0, dim=3), phi2),
    ], dim=3)


# --------------------------------------------------------------- chain math
def test_fft2_chain_matches_rfft2(mm_backend):
    """The 2-D chain == irfft2(g * rfft2(x)) with forward normalization."""
    rng = np.random.default_rng(3)
    nx, ny = 12, 10
    x = jnp.asarray(rng.standard_normal((4, nx, ny, 1)))

    gr = rng.standard_normal((ny // 2 + 1, nx))   # (KY, KX) chain layout
    # Hermitian-safe: apply a REAL spectral multiplier to re and im alike
    out = fftmod.fft2_apply_ifft2_mm(
        x, lambda re, im: (re * gr, im * gr))

    # reference route: numpy rfft2 with y as the half axis
    x2 = np.asarray(x)[..., 0]                     # (4, X, Y)
    y_hat = np.fft.rfftn(x2, axes=(-2, -1), norm="forward")  # c2c x, r2c y
    y_hat = y_hat * gr.T[None]                     # (X, KY) layout
    ref = np.fft.irfftn(y_hat, s=(nx, ny), axes=(-2, -1), norm="forward")
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref, atol=1e-12)


def test_fft2_chain_roundtrip_identity(mm_backend):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 14, 1)))
    out = fftmod.fft2_apply_ifft2_mm(x, lambda re, im: (re, im))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-12)


def test_mm2d_enabled_gate():
    assert not fftmod.mm2d_enabled((32, 32, 32))   # not one-voxel-thick
    # on CPU with auto policy the chain is off; forced on via "matmul"
    old = fftmod.FFT_BACKEND
    try:
        fftmod.FFT_BACKEND = "matmul"
        assert fftmod.mm2d_enabled((32, 32, 1))
        fftmod.FFT_BACKEND = "xla"
        assert not fftmod.mm2d_enabled((32, 32, 1))
    finally:
        fftmod.FFT_BACKEND = old


# ------------------------------------------------------------- equivalence
def _solve(grid, mat_fn, mode, method, E, use_dim2, seed=0, **opt_kw):
    mat = mat_fn(grid, seed)
    opt_kw.setdefault("gamma_scheme", "staggered")
    opt = SolverOptions(mode=mode, method=method,
                        tol=1e-10, maxiter=4000, use_dim2=use_dim2, **opt_kw)
    s = LSSolver(grid, mat, opt)
    s.set_strain(E)
    assert not s.run()
    return s


@pytest.mark.parametrize("method", ["cg", "basic"])
def test_dim2_elasticity_equivalence(method, mm_backend):
    """True 2-D pipeline == nz=1 3-D superset path: identical iteration
    counts and fields (the dropped components are exactly zero, so the two
    paths compute the same operator)."""
    grid = Grid(24, 20, 1)
    E = [1.0, 0.4, 0.3, 0.0, 0.0, 0.25]  # plane strain with nonzero E_zz
    s2 = _solve(grid, elastic_mat, "elasticity", method, E, "auto")
    s3 = _solve(grid, elastic_mat, "elasticity", method, E, "off")
    assert s2._dim2_last and not s3._dim2_last
    assert len(s2.residuals) == len(s3.residuals)
    np.testing.assert_allclose(np.asarray(s2.eps), np.asarray(s3.eps),
                               atol=1e-9)
    np.testing.assert_allclose(s2.calc_mean_stress(), s3.calc_mean_stress(),
                               rtol=1e-10)
    # out-of-plane strain components are exactly the prescribed constants
    eps = np.asarray(s2.eps)
    np.testing.assert_allclose(eps[2], E[2], atol=1e-12)
    np.testing.assert_allclose(eps[3], 0.0, atol=1e-12)
    np.testing.assert_allclose(eps[4], 0.0, atol=1e-12)


@pytest.mark.parametrize("mode_matfn", [("elasticity", elastic_mat),
                                        ("heat", heat_mat)])
def test_dim2_collocated_equivalence(mode_matfn, mm_backend):
    """The reduced 3-component (resp. 2-component) collocated 2-D chain ==
    the full 6-component (3) nz=1 collocated path."""
    mode, mat_fn = mode_matfn
    grid = Grid(20, 18, 1)
    E = ([1.0, 0.4, 0.3, 0.0, 0.0, 0.25] if mode == "elasticity"
         else [1.0, 0.5, 0.2])
    s2 = _solve(grid, mat_fn, mode, "cg", E, "auto",
                gamma_scheme="collocated")
    s3 = _solve(grid, mat_fn, mode, "cg", E, "off",
                gamma_scheme="collocated")
    assert s2._dim2_last and not s3._dim2_last
    assert len(s2.residuals) == len(s3.residuals)
    np.testing.assert_allclose(np.asarray(s2.eps), np.asarray(s3.eps),
                               atol=1e-9)
    np.testing.assert_allclose(s2.calc_mean_stress(), s3.calc_mean_stress(),
                               rtol=1e-9)


def test_dim2_heat_equivalence(mm_backend):
    grid = Grid(20, 24, 1)
    E = [1.0, 0.5, 0.2]
    s2 = _solve(grid, heat_mat, "heat", "cg", E, "auto")
    s3 = _solve(grid, heat_mat, "heat", "cg", E, "off")
    assert s2._dim2_last and not s3._dim2_last
    assert len(s2.residuals) == len(s3.residuals)
    np.testing.assert_allclose(np.asarray(s2.eps), np.asarray(s3.eps),
                               atol=1e-10)
    np.testing.assert_allclose(s2.calc_mean_stress(), s3.calc_mean_stress(),
                               rtol=1e-10)


def test_dim2_equivalence_xla_fallback():
    """Off the matmul backend the dim2 pipeline pads to 3 components for
    the transform but still computes the reduced operator — same answer."""
    grid = Grid(18, 16, 1)
    E = [1.0, 0.3, 0.0, 0.0, 0.0, 0.5]
    s2 = _solve(grid, elastic_mat, "elasticity", "cg", E, "auto")
    s3 = _solve(grid, elastic_mat, "elasticity", "cg", E, "off")
    assert s2._dim2_last
    np.testing.assert_allclose(np.asarray(s2.eps), np.asarray(s3.eps),
                               atol=1e-9)


# ------------------------------------------------------------- qualification
def test_dim2_out_of_plane_loading_disqualifies():
    """E_xz != 0 is an anti-plane problem: the reduction must switch off
    and the superset path must solve it (u_z becomes active)."""
    grid = Grid(16, 16, 1)
    E = [0.0, 0.0, 0.0, 0.0, 0.7, 0.0]
    s = _solve(grid, elastic_mat, "elasticity", "cg", E, "auto")
    assert not s._dim2_last
    # anti-plane shear stress must be nonzero (the problem really ran)
    assert abs(s.calc_mean_stress()[4]) > 1e-3


def test_dim2_requires_one_voxel_grid():
    grid = Grid(12, 12, 4)
    s = _solve(grid, elastic_mat, "elasticity", "cg",
               [1, 0, 0, 0, 0, 0], "auto")
    assert not s._dim2_last


def test_dim2_anisotropic_material_disqualifies():
    """A tilted transversely isotropic phase couples in-plane strain to
    out-of-plane shear; _all_iso() is None and the reduction stays off."""
    grid = Grid(12, 12, 1)
    phi1, phi2 = checkerboard_phi(grid)
    aniso = laws.LinearTransverselyIsotropic(
        E=1.0, nu=0.2, E_a=5.0, G_a=1.5, nu_a=0.25,
        a=np.array([0.0, 0.6, 0.8]))  # out-of-plane fiber direction
    mat = VoigtMixed([
        Phase("a", aniso, phi1),
        Phase("b", laws.LinearIsotropic(mu=1.0, lam=0.7), phi2),
    ], dim=6)
    opt = SolverOptions(mode="elasticity", method="cg",
                        gamma_scheme="staggered", tol=1e-8, maxiter=2000)
    s = LSSolver(grid, mat, opt)
    s.set_strain([1, 0, 0, 0, 0, 0])
    assert not s.run()
    assert not getattr(s, "_dim2_last", False)
    # the coupling is real: in-plane stretch produces out-of-plane shear
    # strain somewhere in the field
    assert float(np.abs(np.asarray(s.eps)[3:5]).max()) > 1e-8
