"""Laminate (interface) mixing tests: with the exact rank-1 laminate rule a
voxel-cutting planar interface must yield the exact effective property even
though the interface falls inside voxels — the accuracy multiplier the
reference claims over Voigt mixing (joss/paper.md:52)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.materials.laminate import LaminateMixed
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.solvers.ls import LSSolver, SolverOptions
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def cut_voxel_laminate(grid, frac):
    """Layered phi along x where the interface cuts the middle voxel at an
    off-grid position (frac of the RVE in phase 2).  Returns phi1, phi2,
    normals."""
    nx = grid.nx
    x_lo = np.arange(nx) / nx
    x_hi = (np.arange(nx) + 1) / nx
    # fraction of each voxel with x < frac (phase 2)
    f2 = np.clip((frac - x_lo) / (x_hi - x_lo), 0.0, 1.0)
    phi2 = jnp.asarray(np.broadcast_to(f2[:, None, None], grid.shape))
    phi1 = 1.0 - phi2
    n = jnp.zeros((3,) + grid.shape, phi1.dtype).at[0].set(1.0)
    return phi1, phi2, n


@pytest.mark.parametrize("frac", [0.5 + 0.3 / 16, 0.4 + 0.7 / 16])
def test_heat_series_exact_with_laminate_mixing(frac):
    grid = Grid = fg.Grid(16, 2, 2)
    phi1, phi2, n = cut_voxel_laminate(grid, frac)
    k1, k2 = 1.0, 10.0

    def solve(mat):
        s = LSSolver(grid, mat, SolverOptions(mode="heat", tol=1e-12,
                                              maxiter=3000))
        s.set_strain([1.0, 0, 0])
        assert not s.run()
        return float(s.calc_mean_stress()[0])

    from fibergen_tpu.materials import laws
    mk = lambda: [Phase("m1", laws.ScalarLinearIsotropic(mu=k1, dim=3), phi1),
                  Phase("m2", laws.ScalarLinearIsotropic(mu=k2, dim=3), phi2)]
    lam = LaminateMixed(mk(), dim=3, normals=n)
    voi = VoigtMixed(mk(), dim=3)

    exact = 1.0 / ((1 - frac) / k1 + frac / k2)
    k_lam = solve(lam)
    k_voi = solve(voi)
    # laminate mixing is exact for a planar interface, voigt is not
    assert abs(k_lam - exact) / exact < 1e-9, (k_lam, exact)
    assert abs(k_voi - exact) > 100 * abs(k_lam - exact)


@pytest.mark.parametrize("frac", [0.5 + 0.3 / 16])
def test_elastic_series_exact_with_laminate_mixing(frac):
    grid = fg.Grid(16, 2, 2)
    phi1, phi2, n = cut_voxel_laminate(grid, frac)
    m1 = dict(mu=1.0, lam=1.0)
    m2 = dict(mu=5.0, lam=2.0)

    from fibergen_tpu.materials import laws
    phases = [Phase("m1", laws.LinearIsotropic(**m1), phi1),
              Phase("m2", laws.LinearIsotropic(**m2), phi2)]
    lam = LaminateMixed(phases, dim=6, normals=n)
    s = LSSolver(grid, lam, SolverOptions(mode="elasticity", tol=1e-12,
                                          maxiter=3000))
    s.set_strain([1.0, 0, 0, 0, 0, 0])
    assert not s.run()
    sig = s.calc_mean_stress()
    M1 = m1["lam"] + 2 * m1["mu"]
    M2 = m2["lam"] + 2 * m2["mu"]
    exact = 1.0 / ((1 - frac) / M1 + frac / M2)
    assert abs(sig[0] - exact) / exact < 1e-9, (float(sig[0]), exact)


def test_laminate_pure_voxels_match_voigt():
    """On sharp (0/1) phase fields the laminate rule must reduce to the pure
    per-voxel laws (identical to voigt)."""
    grid = fg.Grid(8, 4, 4)
    x = (np.arange(grid.nx) + 0.5) / grid.nx
    phi2 = jnp.asarray(np.broadcast_to((x < 0.5)[:, None, None],
                                       grid.shape).astype(np.float64))
    phi1 = 1.0 - phi2
    n = jnp.zeros((3,) + grid.shape).at[0].set(1.0)
    from fibergen_tpu.materials import laws
    mk = lambda: [Phase("m1", laws.LinearIsotropic(mu=1, lam=1), phi1),
                  Phase("m2", laws.LinearIsotropic(mu=5, lam=2), phi2)]
    lam = LaminateMixed(mk(), dim=6, normals=n)
    voi = VoigtMixed(mk(), dim=6)
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((6,) + grid.shape))
    np.testing.assert_allclose(np.asarray(lam.pk1(F)), np.asarray(voi.pk1(F)),
                               rtol=1e-12, atol=1e-12)


def test_laminate_tangent_consistency():
    """dpk1 must be the exact derivative of pk1 (jvp through the solve)."""
    grid = fg.Grid(4, 2, 2)
    rng = np.random.default_rng(1)
    phi2 = jnp.asarray(rng.uniform(0.2, 0.8, grid.shape))
    phi1 = 1.0 - phi2
    nv = rng.standard_normal((3,) + grid.shape)
    nv /= np.linalg.norm(nv, axis=0, keepdims=True)
    from fibergen_tpu.materials import laws
    lam = LaminateMixed(
        [Phase("m1", laws.LinearIsotropic(mu=1, lam=1), phi1),
         Phase("m2", laws.LinearIsotropic(mu=5, lam=2), phi2)],
        dim=6, normals=jnp.asarray(nv))
    F = jnp.asarray(rng.standard_normal((6,) + grid.shape))
    W = jnp.asarray(rng.standard_normal((6,) + grid.shape))
    dP = lam.dpk1(F, W)
    h = 1e-6
    fd = (lam.pk1(F + h * W) - lam.pk1(F - h * W)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dP), np.asarray(fd),
                               rtol=1e-5, atol=1e-7)


def test_heat_demo_xml_with_laminate_mixing():
    """The heat demo uses mixing_rule=laminate with generated fibers
    (demo/heat/heat/project.xml)."""
    xml = """
    <settings>
      <length>0.4</length>
      <radius>0.08</radius>
      <n>6</n>
      <m>2000</m>
      <seed>2</seed>
      <solver n="16">
        <mode>heat</mode>
        <tol>1e-8</tol>
        <mixing_rule>laminate</mixing_rule>
        <materials>
          <matrix mu="1" />
          <fiber mu="10" />
        </materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <calc_effective_properties />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    K = np.array(f.get_effective_property())
    # sanity: conductivity between phase values, matrix-dominated
    assert 1.0 < K[0, 0] < 10.0
    assert 1.0 < K[1, 1] < 10.0


# ---------------------------------------------------------------------------
# Nonlinear (hyperelastic) laminate: full Newton on the jump vector
# ---------------------------------------------------------------------------

def _hyper_laminate(grid, frac=0.5):
    from fibergen_tpu.materials import laws
    phi1, phi2, n = cut_voxel_laminate(grid, frac)
    mat = LaminateMixed([
        Phase("m1", laws.SaintVenantKirchhoff(mu=1.0, lam=1.0), phi1),
        Phase("m2", laws.SaintVenantKirchhoff(mu=4.0, lam=2.0), phi2),
    ], dim=9, normals=n)
    return mat


def test_hyper_laminate_traction_continuity():
    """After the Newton solve, the traction-equilibrium residual
    (P2(F2) - P1(F1)) : B_k vanishes at interface voxels (the quantity the
    reference's per-voxel Newton drives to zero, fibergen.cpp:13104-13470)."""
    from fibergen_tpu.core import voigt
    from fibergen_tpu.materials.laminate import _sym_dyad_basis

    grid = fg.Grid(4, 2, 2)
    mat = _hyper_laminate(grid, frac=0.37)
    # moderate finite strain: 8% stretch + shear
    Fbar = np.array([1.08, 1.0, 0.97, 0.0, 0.0, 0.05, 0.0, 0.0, 0.02])
    F = jnp.asarray(np.broadcast_to(Fbar.reshape(9, 1, 1, 1),
                                    (9,) + grid.shape))
    F1, F2, mask = mat._phase_strains(F)
    law1, law2 = mat.phases[0].law, mat.phases[1].law
    dP = law2.pk1(F2) - law1.pk1(F1)
    B = _sym_dyad_basis(mat.normals, 9)
    w = jnp.asarray(voigt.weights(9)).reshape(-1, 1, 1, 1)
    res = jnp.stack([(dP * w * Bk).sum(0) for Bk in B])
    res = np.asarray(jnp.where(mask[None], res, 0.0))
    assert np.abs(res).max() < 1e-10

    # energy consistency: mixed energy below the Voigt (Taylor) bound
    w_lam = float(mat.w(F)[np.asarray(mask)].mean())
    w_voigt = float((mat.phases[0].phi * law1.w(F)
                     + mat.phases[1].phi * law2.w(F))[np.asarray(mask)].mean())
    assert w_lam < w_voigt + 1e-12


def test_hyper_laminate_small_strain_matches_linear():
    """At tiny strain the SVK laminate Newton reproduces the exact linear
    laminate mixing (which is a single exact solve)."""
    from fibergen_tpu.materials import laws

    grid = fg.Grid(4, 2, 2)
    phi1, phi2, n = cut_voxel_laminate(grid, 0.37)
    h = 1e-6
    lin = LaminateMixed([
        Phase("m1", laws.LinearIsotropic(mu=1.0, lam=1.0), phi1),
        Phase("m2", laws.LinearIsotropic(mu=4.0, lam=2.0), phi2),
    ], dim=6, normals=n)
    E6 = np.array([h, 0, 0, 0, 0, 0.5 * h])
    S_lin = np.asarray(lin.pk1(jnp.asarray(
        np.broadcast_to(E6.reshape(6, 1, 1, 1), (6,) + grid.shape))))

    hyp = _hyper_laminate(grid, 0.37)
    F9 = np.array([1 + h, 1, 1, 0, 0, h, 0, 0, 0])  # F = I + e11 + e12(xy)
    S_h = np.asarray(hyp.pk1(jnp.asarray(
        np.broadcast_to(F9.reshape(9, 1, 1, 1), (9,) + grid.shape))))
    # compare the symmetric components (PK1 ~ sigma at infinitesimal strain)
    np.testing.assert_allclose(S_h[0], S_lin[0], rtol=2e-5, atol=1e-12)
    np.testing.assert_allclose(S_h[1], S_lin[1], rtol=2e-5, atol=1e-12)
    sym_xy = 0.5 * (S_h[5] + S_h[8])
    np.testing.assert_allclose(sym_xy, S_lin[5], rtol=2e-5, atol=1e-12)


# --------------------------------------------------------------------------
# Infinity-laminate (fibergen.cpp:13737-14067) and fluidity (14068-14213)
# --------------------------------------------------------------------------

def test_infinity_laminate_matches_direct_minimization():
    """The infinity-laminate jump uses fixed half-weights q1 = q2 = 1/2
    (F1 = F - a/2 x n, F2 = F + a/2 x n) while the energy stays
    c1 W1 + c2 W2; cross-check the vectorized solve against a direct numpy
    minimization on one voxel, and confirm it differs from the rank-1 rule
    away from c = 1/2."""
    from fibergen_tpu.materials import laws
    from fibergen_tpu.materials.laminate import InfinityLaminateMixed

    grid = fg.Grid(2, 2, 2)
    c1v, c2v = 0.3, 0.7
    phi1 = jnp.full(grid.shape, c1v)
    phi2 = jnp.full(grid.shape, c2v)
    nvec = np.array([1.0, 0.5, -0.25])
    nvec /= np.linalg.norm(nvec)
    n = jnp.asarray(np.broadcast_to(nvec[:, None, None, None],
                                    (3,) + grid.shape).copy())

    m1 = dict(mu=1.0, lam=1.0)
    m2 = dict(mu=5.0, lam=2.0)
    mk = lambda: [Phase("m1", laws.LinearIsotropic(**m1), phi1),
                  Phase("m2", laws.LinearIsotropic(**m2), phi2)]
    inf = InfinityLaminateMixed(mk(), dim=6, normals=n)
    lam = LaminateMixed(mk(), dim=6, normals=n)

    Ev = np.array([1.0, 0.2, -0.1, 0.3, 0.0, 0.1])
    F = jnp.asarray(np.broadcast_to(
        Ev[:, None, None, None], (6,) + grid.shape).copy())

    S_inf = np.asarray(inf.pk1(F))[:, 0, 0, 0]
    S_lam = np.asarray(lam.pk1(F))[:, 0, 0, 0]
    assert np.abs(S_inf - S_lam).max() > 1e-3, "must differ from rank-1"

    # direct numpy: minimize c1 W1(E - 1/2 sym(a x n)) + c2 W2(E + ...)
    def C_iso(mu, lam):
        C = np.zeros((6, 6))
        C[:3, :3] = lam
        np.fill_diagonal(C, [2 * mu + lam] * 3 + [2 * mu] * 3)
        return C

    wts = np.array([1, 1, 1, 2, 2, 2], float)
    B = np.zeros((3, 6))
    for k in range(3):
        ek = np.eye(3)[k]
        M = 0.5 * (np.outer(ek, nvec) + np.outer(nvec, ek))
        B[k] = [M[0, 0], M[1, 1], M[2, 2], M[1, 2], M[0, 2], M[0, 1]]

    C1, C2 = C_iso(**m1), C_iso(**m2)

    def energy(a):
        j = 0.5 * (a @ B)
        E1, E2 = Ev - j, Ev + j
        return (c1v * 0.5 * E1 @ (wts * (C1 @ E1))
                + c2v * 0.5 * E2 @ (wts * (C2 @ E2)))

    from scipy.optimize import minimize
    res = minimize(energy, np.zeros(3), method="BFGS", tol=1e-14)
    j = 0.5 * (res.x @ B)
    S_direct = c1v * C1 @ (Ev - j) + c2v * C2 @ (Ev + j)
    np.testing.assert_allclose(S_inf, S_direct, rtol=1e-6, atol=1e-8)


def test_fluidity_mixing_matches_direct_rotation():
    """Fluidity mixing: harmonic fluidity for diag+yz, arithmetic for the
    normal-involving shears, in the n-aligned frame
    (fibergen.cpp:14128-14166)."""
    from fibergen_tpu.materials import laws
    from fibergen_tpu.materials.laminate import FluidityMixed

    grid = fg.Grid(2, 2, 2)
    c1v = 0.35
    phi1 = jnp.full(grid.shape, c1v)
    phi2 = jnp.full(grid.shape, 1 - c1v)
    nvec = np.array([0.6, -0.3, 0.9])
    nvec /= np.linalg.norm(nvec)
    n = jnp.asarray(np.broadcast_to(nvec[:, None, None, None],
                                    (3,) + grid.shape).copy())
    f1v, f2v = 0.5, 3.0
    phases = [Phase("m1", laws.ScalarLinearIsotropic(mu=f1v, dim=6), phi1),
              Phase("m2", laws.ScalarLinearIsotropic(mu=f2v, dim=6), phi2)]
    fl = FluidityMixed(phases, dim=6, normals=n)

    Sv = np.array([0.4, -0.1, -0.3, 0.25, -0.15, 0.05])
    F = jnp.asarray(np.broadcast_to(
        Sv[:, None, None, None], (6,) + grid.shape).copy())
    out = np.asarray(fl.pk1(F))[:, 0, 0, 0]

    # direct: rotate, scale, rotate back
    sig = np.array([[Sv[0], Sv[5], Sv[4]],
                    [Sv[5], Sv[1], Sv[3]],
                    [Sv[4], Sv[3], Sv[2]]])
    e1 = np.array([1.0, 0, 0])
    v = np.cross(nvec, e1)
    c = nvec @ e1
    Vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    R = np.eye(3) + Vx + Vx @ Vx / (1 + c)
    assert np.allclose(R @ nvec, e1)
    f_R = 1 / (c1v / f1v + (1 - c1v) / f2v)
    f_V = c1v * f1v + (1 - c1v) * f2v
    sp = R @ sig @ R.T
    scale = np.array([[f_R, f_V, f_V], [f_V, f_R, f_R], [f_V, f_R, f_R]])
    gam = R.T @ (sp * scale) @ R
    expect = np.array([gam[0, 0], gam[1, 1], gam[2, 2],
                       gam[1, 2], gam[0, 2], gam[0, 1]])
    np.testing.assert_allclose(out, expect, rtol=1e-10, atol=1e-12)

    # pure voxels reduce to the plain phase response
    phases2 = [Phase("m1", laws.ScalarLinearIsotropic(mu=f1v, dim=6),
                     jnp.ones(grid.shape)),
               Phase("m2", laws.ScalarLinearIsotropic(mu=f2v, dim=6),
                     jnp.zeros(grid.shape))]
    fl2 = FluidityMixed(phases2, dim=6, normals=n)
    pure = np.asarray(fl2.pk1(F))[:, 0, 0, 0]
    law_resp = np.asarray(
        laws.ScalarLinearIsotropic(mu=f1v, dim=6).pk1(F))[:, 0, 0, 0]
    np.testing.assert_allclose(pure, law_resp, rtol=1e-12)


def test_fluidity_viscosity_solve():
    """End-to-end viscosity solve with the fluidity mixing rule on a
    layered microstructure; the solver must converge and land between the
    Reuss/Voigt fluidity bounds."""
    from fibergen_tpu.materials import laws
    from fibergen_tpu.materials.laminate import FluidityMixed

    grid = fg.Grid(16, 4, 4)
    x = (np.arange(grid.nx) + 0.5) / grid.nx
    f2frac = np.clip((0.5 - np.arange(grid.nx) / grid.nx) * grid.nx, 0, 1)
    phi2 = jnp.asarray(np.broadcast_to(f2frac[:, None, None], grid.shape))
    phi1 = 1.0 - phi2
    n = jnp.zeros((3,) + grid.shape).at[0].set(1.0)
    f1v, f2v = 0.5, 1.5  # fluidities (XML mu scaled by 0.5 at creation)
    phases = [Phase("m1", laws.ScalarLinearIsotropic(mu=f1v, dim=6), phi1),
              Phase("m2", laws.ScalarLinearIsotropic(mu=f2v, dim=6), phi2)]
    mat = FluidityMixed(phases, dim=6, normals=n)
    s = LSSolver(grid, mat, SolverOptions(mode="viscosity", method="cg",
                                          tol=1e-9, maxiter=2000))
    s.set_strain([-1.0, 1.0, 0, 0, 0, 0])
    assert not s.run()
    assert len(s.residuals) < s.opt.maxiter
    sig = np.asarray(s.calc_mean_stress())
    assert np.isfinite(sig).all()


def test_three_phase_laminate_series_exact():
    """Three declared materials with pairwise interfaces: the per-voxel
    top-two selection (the reference's get_mix walks phases and uses the
    <=2 with phi>0, fibergen.cpp:12186-12209) must reproduce the exact
    3-layer series conductivity even with interfaces cutting voxels."""
    from fibergen_tpu.materials import laws
    grid = fg.Grid(24, 2, 2)
    nx = grid.nx
    b1, b2 = 0.30 + 0.4 / nx, 0.65 + 0.3 / nx   # off-grid layer boundaries
    x_lo = np.arange(nx) / nx
    x_hi = (np.arange(nx) + 1) / nx

    def frac_below(b):
        return np.clip((b - x_lo) / (x_hi - x_lo), 0.0, 1.0)

    f1 = frac_below(b1)
    f2 = frac_below(b2) - f1
    f3 = 1.0 - f1 - f2
    mk = lambda f: jnp.asarray(np.broadcast_to(f[:, None, None], grid.shape))
    k = [1.0, 5.0, 20.0]
    phases = [Phase(f"m{i}", laws.ScalarLinearIsotropic(mu=k[i], dim=3),
                    mk(f)) for i, f in enumerate((f1, f2, f3))]
    n = jnp.zeros((3,) + grid.shape).at[0].set(1.0)
    mat = LaminateMixed(phases, dim=3, normals=n)
    s = LSSolver(grid, mat, SolverOptions(mode="heat", tol=1e-12,
                                          maxiter=3000))
    s.set_strain([1.0, 0, 0])
    assert not s.run()
    k_eff = float(s.calc_mean_stress()[0])
    exact = 1.0 / (b1 / k[0] + (b2 - b1) / k[1] + (1 - b2) / k[2])
    assert abs(k_eff - exact) / exact < 1e-9, (k_eff, exact)


def test_three_phase_laminate_elasticity_runs():
    """Multi-material elasticity with laminate mixing (the hashin
    coated-sphere layout) solves end-to-end — round 1 raised
    'requires exactly 2 phases'."""
    f = fg.FG()
    f.load_xml(os.path.join(os.path.dirname(__file__), "..", "demo",
                            "elasticity", "hashin", "project.xml"))
    f.set("variables.res..value", 16)
    f.set("solver.mixing_rule", "laminate")
    f.set("solver.tol", "1e-8")
    assert f.run() == 0
    sig = np.array(f.get_mean_stress())
    k_eff = sig[:3].sum() / 9.0
    k_star = 3.63867684478 + 2.0 / 3.0
    assert abs(k_eff - k_star) / k_star < 2e-2
