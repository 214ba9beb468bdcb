"""Mixed-precision iterative refinement (solvers/refine.py).

A float32 solver with a deep tolerance (the reference's double-precision
demo tols, e.g. demo/elasticity/hashin tol=1e-10) must converge via
f64-residual refinement sweeps and reproduce the float64 solve's digits —
the capability VERDICT round-4 item 1 asked for.  These tests run the
whole machinery on the CPU backend (f32 device fields + f64 host
residuals), exactly the shape of the TPU deployment.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fibergen_tpu.core.grid import Grid
from fibergen_tpu.materials import laws
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.solvers.ls import LSSolver, SolverOptions

M1 = dict(mu=1.0, lam=2.0)
M2 = dict(mu=10.0, lam=5.0)


def _sphere_phi(grid, dtype, r=0.35):
    """Smooth-ish sphere inclusion: a genuinely 3-D two-phase field whose
    phase fractions are NOT grid-aligned (so f32 rounding actually shows
    in the solve, unlike a laminate whose mean response is exact)."""
    ax = [(np.arange(n) + 0.5) / n - 0.5 for n in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    d = np.sqrt(X**2 + Y**2 + Z**2)
    # quantize to f32 FIRST so the f32 and f64 solvers see the *same*
    # discrete problem (f32 values are exact in f64); the refinement
    # converges to the exact solution of the f32-phi problem
    phi = np.clip((r - d) / (1.0 / grid.nx) + 0.5, 0.0, 1.0)
    phi = phi.astype(np.float32)
    phi1 = jnp.asarray(phi, dtype)
    return phi1, jnp.asarray((1.0 - phi).astype(np.float32), dtype)


def _material(mode, grid, dtype):
    """Two-phase sphere composite with fields in the SOLVER dtype — the
    production layout (the TPU pipeline discretizes phi in f32)."""
    phi1, phi2 = _sphere_phi(grid, dtype)
    if mode == "heat":
        return VoigtMixed([
            Phase("incl", laws.ScalarLinearIsotropic(mu=10.0, dim=3), phi1),
            Phase("matrix", laws.ScalarLinearIsotropic(mu=1.0, dim=3), phi2),
        ], dim=3)
    return VoigtMixed([
        Phase("incl", laws.LinearIsotropic(**M2), phi1),
        Phase("matrix", laws.LinearIsotropic(**M1), phi2),
    ], dim=6)


def _solve(mode, dtype, tol, scheme="staggered", check_every=1, refine="auto",
           E=None, estimator="epsilon"):
    grid = Grid(16, 8, 4)
    mat = _material(mode, grid, dtype)
    if mode == "heat":
        E = E if E is not None else [1.0, 0.0, 0.0]
    else:
        E = E if E is not None else [1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
    opt = SolverOptions(mode=mode, method="cg", gamma_scheme=scheme,
                        tol=tol, maxiter=3000, dtype=dtype,
                        check_every=check_every, refine=refine,
                        error_estimator=estimator)
    s = LSSolver(grid, mat, opt)
    s.set_strain(E)
    assert not s.run()
    return s


@pytest.mark.parametrize("mode", ["heat", "elasticity"])
@pytest.mark.parametrize("check_every", [1, 8])
def test_refined_f32_matches_f64_solve(mode, check_every):
    """f32 + refinement at tol 1e-10 reproduces the f64 solve's mean
    stress to ~1e-9 relative — far below the bare-f32 floor (~1e-7)."""
    s64 = _solve(mode, "float64", 1e-13, estimator="residual")
    ref = s64.calc_mean_stress()

    s32 = _solve(mode, "float32", 1e-10, check_every=check_every)
    assert s32.eps64 is not None, "refinement did not engage"
    got = s32.calc_mean_stress()
    np.testing.assert_allclose(got, ref, rtol=2e-9, atol=2e-9)

    # and the refined trajectory actually reached the tolerance
    assert s32.residuals[-1] <= 1e-10

    # bare f32 for contrast: stays at its floor
    s32b = _solve(mode, "float32", 1e-10, refine="off")
    assert s32b.eps64 is None
    err_bare = np.abs(s32b.calc_mean_stress() - ref).max()
    err_ref = np.abs(got - ref).max()
    assert err_ref < err_bare / 10


def test_refined_mean_strain_and_energy():
    s64 = _solve("elasticity", "float64", 1e-13, estimator="residual")
    s32 = _solve("elasticity", "float32", 1e-10)
    np.testing.assert_allclose(s32.calc_mean_strain(),
                               s64.calc_mean_strain(), rtol=0, atol=1e-9)
    np.testing.assert_allclose(s32.calc_mean_energy(),
                               s64.calc_mean_energy(), rtol=1e-9)


def test_refine_skips_mixed_bc_with_warning():
    """Mixed BCs are out of refinement scope: the solver must fall back to
    the stagnation guard, not crash."""
    grid = Grid(8, 4, 4)
    mat = _material("elasticity", grid, "float32")
    opt = SolverOptions(mode="elasticity", method="cg", tol=1e-9,
                        maxiter=300, dtype="float32")
    s = LSSolver(grid, mat, opt)
    P = np.zeros((6, 6))
    P[0, 0] = 1.0  # strain-controlled only in xx; stress-free otherwise
    s.set_bc_projector(P)
    s.set_strain([1.0, 0, 0, 0, 0, 0])
    s.set_stress(np.zeros(6))
    assert not s.run()
    assert s.eps64 is None


def test_refine_off_by_default_for_loose_tol():
    s = _solve("heat", "float32", 1e-5)
    assert s.eps64 is None


def test_refined_collocated_scheme():
    """The f64 residual reuses gamma_operator, so every linear scheme is in
    scope — pin the collocated path too."""
    s64 = _solve("heat", "float64", 1e-13, scheme="collocated", estimator="residual")
    s32 = _solve("heat", "float32", 1e-10, scheme="collocated")
    assert s32.eps64 is not None
    np.testing.assert_allclose(s32.calc_mean_stress(),
                               s64.calc_mean_stress(), rtol=2e-9, atol=2e-9)


@pytest.mark.parametrize("mode", ["elasticity", "viscosity"])
def test_refined_lm6_matches_plain(mode):
    """Refinement over the lm6 tuple-state CG (low_mem='on'): the 512^3
    single-chip path must reach deep tolerances too (the lm6 correction
    solve is _solve_correction_lm6).  Pinned against the plain-layout
    refined solve."""
    grid = Grid(16, 8, 4)
    E = ([1.0, 1.0, 1.0, 0.0, 0.0, 0.0] if mode == "elasticity"
         else [0.0, 0.0, 0.0, 1.0, 0.0, 0.0])

    def run(low_mem):
        if mode == "viscosity":
            phi1, phi2 = _sphere_phi(grid, "float32")
            mat = VoigtMixed([
                Phase("incl", laws.ScalarLinearIsotropic(mu=0.5 * 5.0,
                                                         dim=6), phi1),
                Phase("matrix", laws.ScalarLinearIsotropic(mu=0.5 * 1.0,
                                                           dim=6), phi2),
            ], dim=6)
        else:
            mat = _material(mode, grid, "float32")
        s = LSSolver(grid, mat, SolverOptions(
            mode=mode, method="cg", gamma_scheme="staggered", tol=1e-10,
            maxiter=3000, dtype="float32", check_every=4,
            error_estimator="residual", low_mem=low_mem))
        s.set_strain(E)
        assert not s.run()
        return s

    s_plain = run("off")
    s_lm6 = run("on")
    assert s_plain.eps64 is not None and s_lm6.eps64 is not None
    assert getattr(s_lm6, "_lm6_last", False), "lm6 path did not engage"
    assert not getattr(s_plain, "_lm6_last", True)
    assert s_lm6.residuals[-1] <= 1e-10
    np.testing.assert_allclose(
        np.asarray(s_lm6.calc_mean_stress()),
        np.asarray(s_plain.calc_mean_stress()), rtol=5e-9, atol=5e-9)
