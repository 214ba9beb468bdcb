"""Constitutive-law derivative checks.

The reference's test_law (fibergen.cpp:23527) compares PK1 against finite
differences of W and dPK1 against finite differences of PK1 — but is disabled
by an early return.  With autodiff laws these checks are resurrected and must
hold to near machine precision.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fibergen_tpu.core import voigt
from fibergen_tpu.materials import convert, laws

HYPER_LAWS = [
    laws.SaintVenantKirchhoff(mu=1.3, lam=0.8),
    laws.NeoHooke(mu=1.3, lam=0.8),
    laws.NeoHooke2(mu=1.3, K=2.1),
]


def rand_F9(n=4, seed=0):
    rng = np.random.default_rng(seed)
    F = 0.2 * rng.standard_normal((9, n, 1, 1))
    F[0:3] += 1.0  # close to identity, det > 0
    return jnp.asarray(F)


@pytest.mark.parametrize("law", HYPER_LAWS, ids=lambda l: type(l).__name__)
def test_pk1_is_gradient_of_w(law):
    F = rand_F9()
    P = law.pk1(F)
    h = 1e-6
    for k in range(9):
        Fp = F.at[k].add(h)
        Fm = F.at[k].add(-h)
        fd = (law.w(Fp) - law.w(Fm)) / (2 * h)
        np.testing.assert_allclose(np.asarray(P[k]), np.asarray(fd),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("law", HYPER_LAWS, ids=lambda l: type(l).__name__)
def test_dpk1_is_derivative_of_pk1(law):
    F = rand_F9(seed=1)
    rng = np.random.default_rng(2)
    W = jnp.asarray(0.5 * rng.standard_normal(F.shape))
    dP = law.dpk1(F, W)
    h = 1e-6
    fd = (law.pk1(F + h * W) - law.pk1(F - h * W)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dP), np.asarray(fd), rtol=1e-5, atol=1e-7)


def test_linear_isotropic_consistency():
    law = laws.LinearIsotropic(mu=1.5, lam=0.7)
    rng = np.random.default_rng(3)
    E = jnp.asarray(rng.standard_normal((6, 3, 1, 1)))
    P = law.pk1(E)
    # sigma = 2 mu eps + lam tr(eps) I
    tr = np.asarray(E[0] + E[1] + E[2])
    expect = 2 * 1.5 * np.asarray(E)
    expect[0:3] += 0.7 * tr
    np.testing.assert_allclose(np.asarray(P), expect, rtol=1e-12)
    # energy consistency W = 1/2 sigma : eps
    w = voigt.weights(6)
    expW = 0.5 * sum(w[i] * expect[i] * np.asarray(E[i]) for i in range(6))
    np.testing.assert_allclose(np.asarray(law.w(E)), expW, rtol=1e-12)


def test_svk_matches_linear_at_small_strain():
    mu, lam = 1.3, 0.8
    svk = laws.SaintVenantKirchhoff(mu=mu, lam=lam)
    lin = laws.LinearIsotropic(mu=mu, lam=lam)
    rng = np.random.default_rng(4)
    eps6 = 1e-6 * rng.standard_normal(6)
    F9 = np.array([1 + eps6[0], 1 + eps6[1], 1 + eps6[2],
                   eps6[3], eps6[4], eps6[5], eps6[3], eps6[4], eps6[5]])
    P9 = np.asarray(svk.pk1(jnp.asarray(F9.reshape(9, 1, 1, 1)))).reshape(9)
    S6 = np.asarray(lin.pk1(jnp.asarray(eps6.reshape(6, 1, 1, 1)))).reshape(6)
    np.testing.assert_allclose(P9[:6], S6, rtol=1e-4, atol=1e-11)


def test_material_constant_conversion_roundtrip():
    c = convert.elastic_constants(mu=1.3, lam=0.8)
    for pair in [("K", "E"), ("K", "mu"), ("E", "nu"), ("mu", "nu"), ("mu", "M")]:
        c2 = convert.elastic_constants(**{pair[0]: c[pair[0]], pair[1]: c[pair[1]]})
        for k in c:
            assert abs(c[k] - c2[k]) < 1e-12 * max(1, abs(c[k])), (pair, k)


def test_conversion_errors():
    with pytest.raises(ValueError):
        convert.elastic_constants(mu=1.0)
    with pytest.raises(ValueError):
        convert.elastic_constants(K=1.0, E=1.0, mu=1.0)


def test_polarization_transform_inverse():
    """(C - C0)(C + C0)^{-1} composed with the inverse transform."""
    law = laws.LinearIsotropic(mu=2.0, lam=1.0)
    rng = np.random.default_rng(5)
    F = jnp.asarray(rng.standard_normal((6, 2, 1, 1)))
    mu0 = 0.7
    Q = law.polarization(mu0, F)            # (C-C0)(C+C0)^{-1} F
    Finv = law.polarization(mu0, F, inv=True)   # (C+C0)^{-1} F
    # consistency: Q == (C - C0) applied to Finv
    CF = law.pk1(Finv)
    C0F = 2 * mu0 * Finv
    np.testing.assert_allclose(np.asarray(Q), np.asarray(CF - C0F),
                               rtol=1e-10, atol=1e-12)


GOLDBERG = [cls() for cls in laws.GOLDBERG_LAWS.values()]


@pytest.mark.parametrize("law", GOLDBERG, ids=lambda l: type(l).__name__)
def test_goldberg_pk1_is_gradient_of_w(law):
    F = rand_F9(seed=6)
    P = law.pk1(F)
    h = 1e-6
    for k in range(9):
        fd = (law.w(F.at[k].add(h)) - law.w(F.at[k].add(-h))) / (2 * h)
        np.testing.assert_allclose(np.asarray(P[k]), np.asarray(fd),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("law", GOLDBERG, ids=lambda l: type(l).__name__)
def test_goldberg_energy_zero_at_identity(law):
    # Fiber3's energy is intentionally not normalized at F = I
    # (W = f1 J1 + f2 J1^4 + f3 sqrt(J2) + ..., fibergen.cpp:10915)
    if isinstance(law, laws.GoldbergFiber3):
        pytest.skip("Fiber3 energy not normalized at identity (as in reference)")
    Fid = jnp.asarray(np.array([1., 1, 1, 0, 0, 0, 0, 0, 0]).reshape(9, 1, 1, 1))
    w = float(law.w(Fid).squeeze())
    assert abs(w) < 1e-12


def test_tiso_reduces_to_isotropic():
    """With E_a = E, G_a = G, nu_a = nu the tiso law must equal the
    isotropic law for any direction."""
    E, nu = 2.0, 0.3
    G = E / (2 * (1 + nu))
    c = convert.elastic_constants(E=E, nu=nu)
    iso = laws.LinearIsotropic(mu=c["mu"], lam=c["lam"])
    tiso = laws.LinearTransverselyIsotropic(
        E=E, nu=nu, E_a=E, G_a=G, nu_a=nu, a=np.array([0.3, -0.5, 0.8]))
    rng = np.random.default_rng(7)
    F = jnp.asarray(rng.standard_normal((6, 2, 1, 1)))
    np.testing.assert_allclose(np.asarray(tiso.pk1(F)), np.asarray(iso.pk1(F)),
                               rtol=1e-10, atol=1e-12)


def test_aniso_heat_diagonal_matches_scalar():
    k = 3.0
    aniso = laws.MatrixLinearAnisotropic(K=np.diag([k, k, k]))
    scalar = laws.ScalarLinearIsotropic(mu=k, dim=3)
    rng = np.random.default_rng(8)
    F = jnp.asarray(rng.standard_normal((3, 2, 1, 1)))
    np.testing.assert_allclose(np.asarray(aniso.pk1(F)),
                               np.asarray(scalar.pk1(F)), rtol=1e-12)


def test_hyper_eig_range_chunked_matches_full_grid():
    """The chunked tangent eigen-bound path (voigt rule; bounds the padded
    (..., 9, 9) TPU footprint so 256^3 hyper solves fit HBM) must reproduce
    the full-grid eigvalsh bounds exactly, including a chunk that does not
    divide the voxel count (padding repeats leading voxels)."""
    from fibergen_tpu.materials.mixing import Phase, VoigtMixed

    rng = np.random.default_rng(11)
    shape = (5, 3, 3)  # 45 voxels: prime-ish, exercises chunk padding
    F = jnp.asarray(np.tile(np.array([1.0, 1, 1, 0, 0, 0, 0, 0, 0]),
                            (*shape, 1)).transpose(3, 0, 1, 2)
                    + 0.05 * rng.standard_normal((9, *shape)))
    phi = jnp.asarray(rng.uniform(size=shape))
    mat = VoigtMixed([
        Phase("a", laws.SaintVenantKirchhoff(mu=10.0, lam=5.0), phi),
        Phase("b", laws.NeoHooke(mu=1.0, lam=1.0), 1.0 - phi),
    ], dim=9)

    # full-grid reference: force the generic path by calling the body with
    # the chunk gate bypassed
    eye = jnp.eye(9, dtype=F.dtype)
    cols = [mat.dpk1(F, jnp.broadcast_to(eye[j].reshape(9, 1, 1, 1), F.shape))
            for j in range(9)]
    C = jnp.stack(cols, axis=1)
    C = jnp.moveaxis(C, (0, 1), (-2, -1))
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    e = jnp.linalg.eigvalsh(C)
    lo_ref, hi_ref = float(e.min()), float(e.max())

    for chunk in (16, 45, 64):
        lo, hi = mat._eig_range_nonlinear_chunked(F, False, chunk=chunk)
        np.testing.assert_allclose(float(lo), lo_ref, rtol=1e-10)
        np.testing.assert_allclose(float(hi), hi_ref, rtol=1e-10)

    # and the public entry point routes the voigt rule through the chunks
    lo, hi = mat.eig_range(F)
    np.testing.assert_allclose(float(lo), lo_ref, rtol=1e-10)
    np.testing.assert_allclose(float(hi), hi_ref, rtol=1e-10)

def test_hyper_eig_range_host_split_matches_single_program(monkeypatch):
    """eig_range_host (large grids: the eigvalsh pass split across several
    short device programs — one 256^3 program crashed the TPU worker) must
    reproduce eig_range's single-program bounds, including a window count
    that does not divide the voxel count (the tail window overlaps)."""
    from fibergen_tpu.materials import mixing
    from fibergen_tpu.materials.mixing import Phase, VoigtMixed

    rng = np.random.default_rng(12)
    shape = (7, 3, 3)  # 63 voxels
    F = jnp.asarray(np.tile(np.array([1.0, 1, 1, 0, 0, 0, 0, 0, 0]),
                            (*shape, 1)).transpose(3, 0, 1, 2)
                    + 0.05 * rng.standard_normal((9, *shape)))
    phi = jnp.asarray(rng.uniform(size=shape))
    mat = VoigtMixed([
        Phase("a", laws.SaintVenantKirchhoff(mu=10.0, lam=5.0), phi),
        Phase("b", laws.NeoHooke(mu=1.0, lam=1.0), 1.0 - phi),
    ], dim=9)

    lo_ref, hi_ref = map(float, mat.eig_range(F))
    assert not mat.needs_host_eig(F)  # 63 voxels: single program suffices

    monkeypatch.setattr(mixing.MixedMaterial, "HOST_EIG_VOX", 16)
    assert mat.needs_host_eig(F)  # 63 > 16: host split engages
    for zt in (False,):
        lo, hi = mat.eig_range_host(F, zero_trace=zt)
        np.testing.assert_allclose(float(lo), lo_ref, rtol=1e-10)
        np.testing.assert_allclose(float(hi), hi_ref, rtol=1e-10)

    # zero_trace variant consistent with the single-program path too
    lo_zt_ref, hi_zt_ref = map(float, mat.eig_range(F, zero_trace=True))
    lo, hi = mat.eig_range_host(F, zero_trace=True)
    np.testing.assert_allclose(float(lo), lo_zt_ref, rtol=1e-10)
    np.testing.assert_allclose(float(hi), hi_zt_ref, rtol=1e-10)


def test_calc_ref_material_gate_order_iso_linear(monkeypatch):
    """Regression: needs_host_eig may warm the mixed-moduli cache, which
    ADDS material field slots — calc_ref_material must evaluate the gate
    BEFORE capturing mat.fields() or bound() fails with 'material field
    state changed' on any large iso-linear grid (bench.py 256 hit this)."""
    import fibergen_tpu as fg
    from fibergen_tpu.materials import mixing

    grid = fg.Grid(8, 4, 4)
    phi = jnp.asarray(np.zeros(grid.shape, np.float64))
    phi = phi.at[:4].set(1.0)
    mat = fg.VoigtMixed([
        fg.Phase("a", fg.LinearIsotropic(mu=10.0, lam=5.0), phi),
        fg.Phase("b", fg.LinearIsotropic(mu=1.0, lam=1.0), 1.0 - phi),
    ], dim=6)
    s = fg.LSSolver(grid, mat, fg.SolverOptions(mode="elasticity"))
    s.set_strain([1.0, 0, 0, 0, 0, 0])
    from fibergen_tpu.core import fields as fmod
    s.eps = fmod.const_field(grid, np.zeros(6), s.dtype)
    # force the size gate open so needs_host_eig runs its _all_iso probe
    monkeypatch.setattr(mixing.MixedMaterial, "HOST_EIG_VOX", 1)
    s.calc_ref_material()   # must not raise
    assert np.isfinite(s.mu_0) and s.mu_0 > 0
