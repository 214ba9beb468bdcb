"""The measured CPU baseline proxy (bench_baseline_cpu.py) must execute the
SAME operator and CG trajectory as the repo's solver — otherwise its
s/iter and iterations-to-tolerance numbers would not be comparable to
bench.py's (the "iteration-count parity demonstrated, not assumed"
requirement of the round-2 verdict)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import bench_baseline_cpu as proxy
from fibergen_tpu import Grid, LSSolver, Phase, SolverOptions, VoigtMixed
from fibergen_tpu.core import fields
from fibergen_tpu.materials.laws import LinearIsotropic


def _repo_solver(n, phi, tol=1e-6):
    grid = Grid(n, n, n)
    mat = VoigtMixed([
        Phase("f", LinearIsotropic(mu=10.0, lam=5.0), jnp.asarray(phi)),
        Phase("m", LinearIsotropic(mu=1.0, lam=1.0), jnp.asarray(1.0 - phi)),
    ], dim=6)
    solver = LSSolver(grid, mat, SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype="float64", error_estimator="residual", tol=tol, maxiter=4000))
    solver.set_strain([1.0, 0, 0, 0, 0, 0])
    return solver


def test_proxy_krylov_matches_repo_operator():
    """One application of the proxy's -Gamma (C-C0) p equals the repo's
    krylov kernel to machine precision on random input."""
    n = 8
    rng = np.random.default_rng(0)
    phi = (rng.random((n, n, n)) < 0.3).astype(np.float64)
    solver = _repo_solver(n, phi)
    solver.eps = fields.const_field(solver.grid, np.zeros(6), solver.dtype)
    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0

    p_np = rng.standard_normal((6, n, n, n))
    w_repo = np.asarray(solver._k_krylov(
        solver.mat.fields(), jnp.asarray(p_np), None, mu0=mu0, lam0=lam0))

    xi = 2.0 * np.pi * np.fft.fftfreq(n)
    kp = torch.tensor((np.exp(1j * xi) - 1.0) * n, dtype=torch.complex128)
    w_proxy = proxy.krylov_staggered(
        torch.tensor(p_np), torch.tensor(1.0 + 9.0 * phi),
        torch.tensor(1.0 + 4.0 * phi), mu0, lam0, kp, n).numpy()

    scale = np.abs(w_repo).max()
    assert np.abs(w_repo - w_proxy).max() < 1e-12 * scale


def test_proxy_reference_material_matches_repo():
    n = 16
    ax = [(np.arange(n) + 0.5) / n - 0.5 for _ in range(3)]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi = ((X * X + Y * Y + Z * Z) < 0.09).astype(np.float64)
    solver = _repo_solver(n, phi)
    solver.eps = fields.const_field(solver.grid, np.zeros(6), solver.dtype)
    solver.calc_ref_material()
    _, _, mu0, lam0 = proxy.make_sphere_problem(n)
    assert mu0 == pytest.approx(solver.mu_0, rel=1e-12)
    assert lam0 == solver.lambda_0 == 0.0


def test_proxy_cg_iteration_parity():
    """The proxy CG on the bench sphere RVE reaches 1e-6 in exactly the
    same number of iterations as the repo's solver (both f64)."""
    n = 16
    ax = [(np.arange(n) + 0.5) / n - 0.5 for _ in range(3)]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi = ((X * X + Y * Y + Z * Z) < 0.09).astype(np.float64)

    solver = _repo_solver(n, phi)
    assert not solver.run()
    repo_iters = len(solver.residuals)
    repo_final = solver.residuals[-1]

    proxy_iters, proxy_final, _ = proxy.run_cg_to_tol(n, 1e-6)
    assert proxy_iters == repo_iters
    assert proxy_final == pytest.approx(repo_final, rel=1e-3)
