"""Batched multi-RHS CG (LSSolver.run_batched) and the adaptive chunked
host loop: both must reproduce the sequential reference trajectory's
answers exactly (calc_effective_properties, fibergen.cpp:26030-26403 —
sequential there; runCGElasticity + converged, fibergen.cpp:23153-23247).
"""
import numpy as np
import pytest

from fibergen_tpu.core.grid import Grid
from fibergen_tpu.solvers.ls import LSSolver, SolverOptions

from test_solver import elastic_material, heat_material

M1 = dict(mu=1.0, lam=1.0)
M2 = dict(mu=10.0, lam=5.0)


def _solver(grid, mat, **kw):
    kw = {"method": "cg", "tol": 1e-8, "maxiter": 500, **kw}
    return LSSolver(grid, mat, SolverOptions(**kw))


def _sequential_ceff(grid, mat, dim, **kw):
    S = np.zeros((dim, dim))
    for i in range(dim):
        s = _solver(grid, mat, **kw)
        s.set_strain(np.eye(dim)[i])
        assert not s.run()
        S[:, i] = s.calc_mean_stress()
    return S


@pytest.mark.parametrize("mode,dim", [("elasticity", 6), ("heat", 3)])
def test_run_batched_matches_sequential(mode, dim):
    grid = Grid(8, 8, 8)
    mat = (elastic_material(grid, M1, M2) if mode == "elasticity"
           else heat_material(grid, 1.0, 10.0))
    S_seq = _sequential_ceff(grid, mat, dim, mode=mode)

    s = _solver(grid, mat, mode=mode)
    assert not s.run_batched(np.eye(dim))
    S_bat = s.calc_mean_stress_batched().T

    # same operator, same CG, same estimator: answers agree to tolerance
    assert np.allclose(S_bat, S_seq, rtol=5e-7, atol=1e-9)
    assert s.eps_batch.shape == (dim, dim) + grid.shape
    # self.eps is the last case's field (sequential driver end state)
    assert np.allclose(np.asarray(s.eps), np.asarray(s.eps_batch[-1]))


def test_run_batched_residual_estimator_and_chunks():
    grid = Grid(8, 4, 4)
    mat = elastic_material(grid, M1, M2)
    S_seq = _sequential_ceff(grid, mat, 6, error_estimator="residual")
    s = _solver(grid, mat, error_estimator="residual", check_every=4)
    assert not s.run_batched(np.eye(6))
    assert np.allclose(s.calc_mean_stress_batched().T, S_seq,
                       rtol=5e-7, atol=1e-9)
    # in-plane unit strains on a laminate have ZERO initial residual
    # (uniform stress), so those RHS converge via abs_tol with rel pinned
    # at 1 — exactly like a sequential solve; converged == not spinning
    assert len(s.residuals) < 50


def test_run_batched_viscosity_matches_sequential():
    grid = Grid(8, 8, 4)
    from fibergen_tpu.materials import laws
    from fibergen_tpu.materials.mixing import Phase, VoigtMixed
    from test_solver import layered_phi
    phi1, phi2 = layered_phi(grid)
    # fluidity-scaled scalar laws (XML mu is halved at creation; here the
    # laws are built directly so any positive mu works)
    mat = VoigtMixed([
        Phase("fluid", laws.ScalarLinearIsotropic(mu=0.5, dim=6), phi1),
        Phase("solid", laws.ScalarLinearIsotropic(mu=5.0, dim=6), phi2),
    ], dim=6)
    E = np.zeros(6)
    E[3] = 1.0  # traceless shear loading
    s_seq = _solver(grid, mat, mode="viscosity")
    s_seq.set_strain(E)
    assert not s_seq.run()
    S_ref = s_seq.calc_mean_stress()

    s = _solver(grid, mat, mode="viscosity")
    assert not s.run_batched(np.stack([E, 2.0 * E]))
    Sb = s.calc_mean_stress_batched()
    assert np.allclose(Sb[0], S_ref, rtol=5e-7, atol=1e-9)
    # linearity: doubled loading doubles the response
    assert np.allclose(Sb[1], 2.0 * Sb[0], rtol=5e-7, atol=1e-9)


def _cg_run(check_every):
    grid = Grid(8, 8, 8)
    mat = elastic_material(grid, M1, M2)
    # adaptive_drain="on": the drain is gated off below
    # ADAPTIVE_DRAIN_MIN_VOXELS by default (compile-count economy), but
    # its trajectory equivalence must stay covered on test-sized grids
    s = _solver(grid, mat, error_estimator="residual",
                check_every=check_every, adaptive_drain="on")
    s.set_strain([1, 0, 0, 0, 0, 0])
    assert not s.run()
    return list(s.residuals), s.calc_mean_stress()


@pytest.mark.parametrize("check_every", [4, 8])
def test_adaptive_chunked_cg_trajectory(check_every):
    """check_every > 1 (pipelined + adaptive drain) must walk the SAME CG
    trajectory as the per-iteration loop: identical residual sequence up
    to the detection point and the same converged answer."""
    ref_res, ref_S = _cg_run(1)
    res, S = _cg_run(check_every)
    n = len(ref_res)
    assert len(res) >= n
    assert np.allclose(res[:n], ref_res, rtol=1e-10)
    # converged state may be a few margin iterations past detection -> at
    # least as converged; mean stress agrees to solver tolerance
    assert np.allclose(S, ref_S, rtol=1e-7)


def test_chunked_basic_estimators_agree():
    """Non-residual estimator through the chunked path: epsilon-estimator
    trajectory matches the K=1 loop."""
    grid = Grid(8, 4, 4)
    mat = heat_material(grid, 1.0, 10.0)
    runs = {}
    for K in (1, 4):
        s = _solver(grid, mat, mode="heat", tol=1e-9, check_every=K)
        s.set_strain([1.0, 0.0, 0.0])
        assert not s.run()
        runs[K] = (list(s.residuals), s.calc_mean_stress())
    n = len(runs[1][0])
    assert np.allclose(runs[4][0][:n], runs[1][0], rtol=1e-10)
    assert np.allclose(runs[4][1], runs[1][1], rtol=1e-8)


@pytest.mark.parametrize("check_every", [1, 4])
def test_low_mem_cg_matches_standard(check_every):
    """cg_step_lowmem (512^3 memory path, forced on here) must walk the
    identical CG trajectory: same residual sequence, same answer; and the
    solve must work with the phase fields dropped (mat.drop_phi)."""
    grid = Grid(16, 8, 8)
    runs = {}
    for lm in ("off", "on"):
        mat = elastic_material(grid, M1, M2)
        s = _solver(grid, mat, error_estimator="residual",
                    check_every=check_every, low_mem=lm)
        s.set_strain([1, 0, 0, 0, 0, 0])
        if lm == "on":
            mat._all_iso()
            mat.drop_phi()
        assert not s.run()
        runs[lm] = (list(s.residuals), s.calc_mean_stress())
    n = min(len(runs["off"][0]), len(runs["on"][0]))
    assert np.allclose(runs["on"][0][:n], runs["off"][0][:n], rtol=1e-9)
    assert np.allclose(runs["on"][1], runs["off"][1], rtol=1e-9)


@pytest.mark.parametrize("estimator", ["residual", "epsilon", "sigma",
                                       "energy"])
def test_lm6_tuple_path_matches_standard(estimator):
    """The tuple-state low-mem chunked CG (lm6: per-component leaves across
    programs, no stacked (6,...) buffer) must walk the standard trajectory
    and produce identical metrics for every estimator kind."""
    from test_solver import elastic_material

    grid = Grid(16, 8, 8)
    runs = {}
    for lm in ("off", "on"):
        mat = elastic_material(grid, M1, M2)
        s = _solver(grid, mat, error_estimator=estimator,
                    check_every=4, low_mem=lm)
        if lm == "on":
            assert s._lm6_capable  # the tuple path actually engages
        s.set_strain([1, 0, 0, 0.3, 0, 0])
        assert not s.run()
        runs[lm] = (list(s.residuals), s.calc_mean_stress())
    n = min(len(runs["off"][0]), len(runs["on"][0]))
    assert np.allclose(runs["on"][0][:n], runs["off"][0][:n], rtol=1e-9)
    assert np.allclose(runs["on"][1], runs["off"][1], rtol=1e-9)


def test_low_mem_cg_generic_material_fallback():
    """A non-isotropic material (LinearGeneral phase) cannot ride the
    component-wise low-mem path; the stacked fallback must walk the same
    trajectory as standard CG."""
    from fibergen_tpu.materials import laws
    from fibergen_tpu.materials.mixing import Phase, VoigtMixed
    from test_solver import layered_phi

    def iso_C(mu, lam):
        # Voigt matrix reproducing LinearIsotropic under LinearGeneral.pk1's
        # weighted contraction (shear rows: C_ii * w_i = 2 mu, w_i = 2)
        C = np.zeros((6, 6))
        C[:3, :3] = lam
        C[np.arange(3), np.arange(3)] += 2.0 * mu
        C[np.arange(3, 6), np.arange(3, 6)] = mu
        return C

    grid = Grid(16, 8, 8)
    C1 = iso_C(**M1)
    C2 = iso_C(**M2)
    C2[0, 1] = C2[1, 0] = C2[0, 1] * 1.2   # break isotropy

    runs = {}
    for lm in ("off", "on"):
        phi1, phi2 = layered_phi(grid, 0.5)
        mat = VoigtMixed([
            Phase("a", laws.LinearGeneral(C=C1, dim=6), phi1),
            Phase("b", laws.LinearGeneral(C=C2, dim=6), phi2)], dim=6)
        s = _solver(grid, mat, error_estimator="residual",
                    check_every=4, low_mem=lm)
        s.set_strain([1, 0, 0, 0, 0, 0])
        assert not s.run()
        runs[lm] = (list(s.residuals), s.calc_mean_stress())
    n = min(len(runs["off"][0]), len(runs["on"][0]))
    assert np.allclose(runs["on"][0][:n], runs["off"][0][:n], rtol=1e-9)
    assert np.allclose(runs["on"][1], runs["off"][1], rtol=1e-9)


@pytest.mark.parametrize("estimator", ["residual", "epsilon"])
def test_lm6_viscosity_matches_standard(estimator):
    """The tuple-state low-mem CG extended to the viscosity Delta
    staggered path (VERDICT r4 item 3a): lm6_step with visc=True must walk
    the standard delta_operator trajectory (fibergen.cpp:20380-20486) on a
    traceless shear loading."""
    from test_solver import _viscosity_material

    grid = Grid(12, 8, 8)
    runs = {}
    for lm in ("off", "on"):
        mat = _viscosity_material(grid, 1.0, 0.2)
        s = _solver(grid, mat, mode="viscosity", gamma_scheme="staggered",
                    error_estimator=estimator, check_every=4, low_mem=lm,
                    tol=1e-9)
        if lm == "on":
            assert s._lm6_capable
        s.set_strain([0.0, 0.0, 0.0, 0.2, 0.0, 0.01])
        assert not s.run()
        runs[lm] = (list(s.residuals), s.calc_mean_stress())
    n = min(len(runs["off"][0]), len(runs["on"][0]))
    assert np.allclose(runs["on"][0][:n], runs["off"][0][:n], rtol=1e-9)
    assert np.allclose(runs["on"][1], runs["off"][1], rtol=1e-9)


@pytest.mark.parametrize("mode", ["elasticity", "viscosity"])
def test_lm6_mixed_bc_matches_standard(mode):
    """lm6 with a non-trivial BC projector (VERDICT r4 item 3b): the
    in-step mean correction (bc_correction of the tau mean) must reproduce
    the standard mixed-BC trajectory and satisfy the same BC error."""
    from test_solver import _viscosity_material, elastic_material

    grid = Grid(12, 8, 8)
    P = np.zeros((6, 6))
    if mode == "elasticity":
        P[0, 0] = P[1, 1] = P[2, 2] = 1.0   # strain-driven normal comps
        E = [1.0, 0.5, 0.2, 0, 0, 0]
        S = [0, 0, 0, 0.3, 0, 0.1]          # prescribed shear stresses
    else:
        # viscosity BCs stay traceless; drive two shear rates, prescribe
        # the third shear stress.  Shear projector entries are 0.5 in this
        # Voigt convention (id4's shear diagonal, core/voigt.py)
        P[3, 3] = P[5, 5] = 0.5
        P[0, 0] = P[1, 1] = P[2, 2] = 1.0
        E = [0, 0, 0, 0.2, 0, 0.05]
        S = [0, 0, 0, 0, 0.1, 0]
    runs = {}
    for lm in ("off", "on"):
        mat = (elastic_material(grid, M1, M2) if mode == "elasticity"
               else _viscosity_material(grid, 1.0, 0.2))
        s = _solver(grid, mat, mode=mode, gamma_scheme="staggered",
                    error_estimator="residual", check_every=4, low_mem=lm,
                    tol=1e-9)
        s.set_bc_projector(P)
        s.set_strain(E)
        s.set_stress(S)
        assert not s.run()
        runs[lm] = (list(s.residuals), s.calc_mean_stress(),
                    s.calc_mean_strain(), s.bc_error())
    n = min(len(runs["off"][0]), len(runs["on"][0]))
    assert np.allclose(runs["on"][0][:n], runs["off"][0][:n], rtol=1e-9)
    assert np.allclose(runs["on"][1], runs["off"][1], rtol=1e-8, atol=1e-10)
    assert np.allclose(runs["on"][2], runs["off"][2], rtol=1e-8, atol=1e-10)
    assert runs["on"][3] <= max(runs["off"][3] * 1.5, 1e-3)
