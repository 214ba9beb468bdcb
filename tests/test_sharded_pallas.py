"""The sharded hot path must be the FAST path, not a de-optimized fallback.

Round-2 verdict: on a mesh both single-chip optimizations were switched off
(`use_pallas` kill-switch + jnp.fft slab stages).  These tests pin the fix:

- the fused Pallas stencils run per-slab under shard_map with the x halo
  exchanged via ppermute (interpret mode on the virtual CPU mesh), and one
  krylov application is BITWISE identical to the single-chip Pallas path,
- full CG solves agree between the single-chip and sharded fused paths,
- the slab FFT's local stages use the matmul-DFT backend: the compiled
  sharded CG step contains dot ops and NO fft op,
- a sharded solver whose grid does not divide the mesh REFUSES loudly
  (SolverOptions.sharding_fallback) instead of silently replicating.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import fibergen_tpu as fg
from fibergen_tpu.materials import laws
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.ops import fft as fftmod
from fibergen_tpu.ops import pallas_kernels as pk
from fibergen_tpu.solvers.ls import LSSolver, SolverError, SolverOptions
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False

GRID = fg.Grid(16, 16, 128)


@pytest.fixture
def pallas_interpret(monkeypatch):
    """Pallas kernels in interpret mode + forced matmul-DFT backend, so the
    exact TPU hot path (minus Mosaic codegen) runs on the CPU mesh."""
    monkeypatch.setattr(pk, "INTERPRET", True)
    monkeypatch.setattr(fftmod, "FFT_BACKEND", "matmul")
    yield


def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), axis_names=("x",))


def make_solver(sharding=None, use_pallas="on", **opt_kw):
    opt_kw.setdefault("method", "cg")
    x = (np.arange(GRID.nx) + 0.5) / GRID.nx
    phi1 = jnp.asarray(np.broadcast_to(
        ((x % 0.5) < 0.25)[:, None, None], GRID.shape).astype(np.float32))
    if sharding is not None:
        phi1 = jax.device_put(
            phi1, NamedSharding(sharding.mesh, P("x", None, None)))
    mat = VoigtMixed([
        Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
        Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
    opt = SolverOptions(mode="elasticity", dtype="float32",
                        use_pallas=use_pallas, **opt_kw)
    return LSSolver(GRID, mat, opt, sharding=sharding)


def x_slab(mesh):
    return NamedSharding(mesh, P(None, "x", None, None))


# ----------------------------------------------------- operator equivalence
def test_sharded_krylov_matches_single_chip(pallas_interpret):
    """One -Gamma(C-C0)eps application: per-slab Pallas stencils (ppermute
    halo) + slab matmul-DFT must reproduce the single-chip fused path to
    machine precision (elementwise ops are reduction-free)."""
    s1 = make_solver()
    assert s1._pallas_active and s1.par is None

    s2 = make_solver(sharding=x_slab(mesh8()))
    assert s2._pallas_active, "Pallas kill-switch must be gone on the mesh"
    assert s2.par is not None

    rng = np.random.default_rng(0)
    eps_np = rng.standard_normal((6,) + GRID.shape).astype(np.float32)
    out1 = np.asarray(s1._k_krylov(s1.mat.fields(), jnp.asarray(eps_np),
                                   None, mu0=2.0, lam0=0.0))
    eps_sh = jax.device_put(jnp.asarray(eps_np), s2.sharding)
    out2 = np.asarray(s2._k_krylov(s2.mat.fields(), eps_sh, None,
                                   mu0=2.0, lam0=0.0))
    scale = np.abs(out1).max()
    np.testing.assert_allclose(out2, out1, atol=1e-6 * scale)


@pytest.mark.parametrize("method", ["cg", "basic"])
def test_sharded_fused_solve_matches_single_chip(pallas_interpret, method):
    """Full solves through the fused sharded path agree with single-chip
    Pallas (same operators bitwise; reductions differ by f32 roundoff, so
    iteration counts may shift by one near the tolerance)."""
    s1 = make_solver(use_pallas="on", method=method, tol=1e-5, maxiter=400)
    s1.set_strain([1.0, 0, 0, 0, 0, 0])
    assert not s1.run()

    s2 = make_solver(sharding=x_slab(mesh8()), use_pallas="on",
                     method=method, tol=1e-5, maxiter=400)
    assert s2._pallas_active and s2.par is not None
    s2.set_strain([1.0, 0, 0, 0, 0, 0])
    assert not s2.run()
    assert not s2.eps.sharding.is_fully_replicated

    np.testing.assert_allclose(s2.calc_mean_stress(), s1.calc_mean_stress(),
                               rtol=5e-4, atol=1e-5)
    assert abs(len(s2.residuals) - len(s1.residuals)) <= 1


def test_sharded_solve_with_slab_middle_matches_single_chip(
        pallas_interpret, monkeypatch):
    """With the kz-slab-distributed Pallas middle forced on, the sharded CG
    solve must match the single-chip solve (same chain math; the middle
    replaces the slab-FFT pair with one fused kernel per device)."""
    from fibergen_tpu.ops import pallas_chain as pc
    monkeypatch.setattr(pc, "MM_MIDDLE", "on")
    monkeypatch.setattr(pc, "INTERPRET", True)

    s1 = make_solver(use_pallas="on", tol=1e-5, maxiter=400)
    s1.set_strain([1.0, 0, 0, 0, 0, 0])
    assert not s1.run()

    called = {}
    orig = pc.g0_staggered_middle_slab

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pc, "g0_staggered_middle_slab", spy)
    s2 = make_solver(sharding=x_slab(mesh8()), use_pallas="on",
                     tol=1e-5, maxiter=400)
    assert s2._pallas_active and s2.par is not None
    s2.set_strain([1.0, 0, 0, 0, 0, 0])
    assert not s2.run()
    assert called.get("yes"), "sharded CG must route through the slab middle"
    np.testing.assert_allclose(s2.calc_mean_stress(), s1.calc_mean_stress(),
                               rtol=5e-4, atol=1e-5)
    assert abs(len(s2.residuals) - len(s1.residuals)) <= 1


# ------------------------------------------------------------ compiled HLO
def _compile_cg_step(s):
    import fibergen_tpu.core.fields as fields
    s.eps = fields.const_field(s.grid, np.zeros(6), s.dtype)
    s.calc_ref_material()
    mu0, lam0 = s.mu_0, s.lambda_0
    E = jnp.asarray(np.array([1.0, 0, 0, 0, 0, 0]), s.dtype)
    mf = s.mat.fields()
    eps, r, p, gamma, gamma_prev, _ = s._k_cg_init(mf, E, None,
                                                   mu0=mu0, lam0=lam0)
    return s._k_cg_step.lower(mf, eps, r, p, gamma, gamma_prev, None,
                              mu0=mu0, lam0=lam0).compile()


def test_sharded_cg_step_compiles_to_dots_not_fft(monkeypatch):
    """With the matmul-DFT backend the sharded CG step must contain dot ops
    (the DFT einsums) and NO fft op, while keeping the all-to-all slab
    transpose (the round-1 pathology was all-gather + full-grid fft)."""
    monkeypatch.setattr(fftmod, "FFT_BACKEND", "matmul")
    s = make_solver(sharding=x_slab(mesh8()), use_pallas="off")
    assert s.par is not None
    hlo = _compile_cg_step(s).as_text()
    assert "all-to-all" in hlo
    assert " fft(" not in hlo and " fft " not in hlo.replace("(", " ("), \
        "slab local stages must use the matmul-DFT, not XLA's fft op"
    assert "dot(" in hlo or "dot " in hlo, "matmul-DFT dots missing"


def test_sharded_middle_step_keeps_all_to_all_no_gather(monkeypatch):
    """The slab-middle CG step (interpret mode) must still communicate via
    all-to-all only — no full-field all-gather, no fft op."""
    from fibergen_tpu.ops import pallas_chain as pc
    monkeypatch.setattr(pc, "MM_MIDDLE", "on")
    monkeypatch.setattr(pc, "INTERPRET", True)
    monkeypatch.setattr(pk, "INTERPRET", True)
    monkeypatch.setattr(fftmod, "FFT_BACKEND", "matmul")
    s = make_solver(sharding=x_slab(mesh8()), use_pallas="on")
    assert s._pallas_active and s.par is not None
    hlo = _compile_cg_step(s).as_text()
    assert "all-to-all" in hlo
    assert "all-gather" not in hlo, \
        "slab middle must never all-gather the field"
    assert " fft(" not in hlo and " fft " not in hlo.replace("(", " (")


def test_hyper_gspmd_fallback_never_uses_pallas_middle(monkeypatch):
    """A sharded hyperelastic solve that fell back to replicated GSPMD FFTs
    (sharding set, par=None) must NOT route through the Pallas spectral
    middle — pallas_call does not run under GSPMD.  newton.py's gamma_op
    carries the same guard as ls.py's."""
    from fibergen_tpu.ops import pallas_chain as pc
    from fibergen_tpu.materials import laws as lawsmod

    monkeypatch.setattr(pc, "MM_MIDDLE", "on")
    monkeypatch.setattr(pc, "INTERPRET", True)
    monkeypatch.setattr(fftmod, "FFT_BACKEND", "matmul")

    def boom(*a, **k):
        raise AssertionError("Pallas middle invoked under GSPMD fallback")

    for name in ("g0_staggered_middle", "g0_staggered_heat_middle",
                 "gamma_collocated_middle", "gamma_collocated_zt_middle",
                 "g0_staggered_middle_slab", "gamma_collocated_middle_slab"):
        monkeypatch.setattr(pc, name, boom)

    grid = fg.Grid(12, 8, 8)    # nx=12 does not divide the 8-mesh
    phi1 = jnp.ones(grid.shape, dtype=np.float64) * 0.5
    mat = VoigtMixed([
        Phase("a", lawsmod.SaintVenantKirchhoff(mu=1.0, lam=1.0), phi1),
        Phase("b", lawsmod.SaintVenantKirchhoff(mu=2.0, lam=1.0), 1 - phi1)],
        dim=9)
    s = LSSolver(grid, mat, SolverOptions(
        mode="hyperelasticity", method="cg", tol=1e-6, maxiter=50,
        sharding_fallback="warn", dtype="float64"),
        sharding=NamedSharding(mesh8(), P(None, "x", None, None)))
    assert s.par is None
    s.set_strain([1.01, 1.0, 1.0, 0, 0, 0, 0, 0, 0])
    assert not s.run()


# ------------------------------------------------------- fallback behavior
def test_nondivisible_grid_refuses_silent_replication():
    """nx=12 does not divide the 8-mesh: constructing the sharded solver
    must raise (round-2 verdict item 2), not silently fall back to GSPMD
    full-field replication."""
    grid = fg.Grid(12, 8, 8)
    mesh = mesh8()
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    phi1 = jnp.ones(grid.shape, dtype=np.float64) * 0.5
    mat = VoigtMixed([
        Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
        Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
    with pytest.raises(SolverError, match="not divisible"):
        LSSolver(grid, mat, SolverOptions(), sharding=sharding)

    # explicit opt-in proceeds (warn path)
    s = LSSolver(grid, mat, SolverOptions(sharding_fallback="warn"),
                 sharding=sharding)
    assert s.par is None

    # a fully-replicated sharding is an explicit user choice, not the
    # silent pathology: no error
    s2 = LSSolver(grid, mat, SolverOptions(),
                  sharding=NamedSharding(mesh, P()))
    assert s2.par is None


def test_wrong_axis_spec_refuses():
    """Splitting a non-x axis cannot use the slab decomposition either."""
    grid = fg.Grid(16, 8, 8)
    sharding = NamedSharding(mesh8(), P(None, None, "x", None))
    phi1 = jnp.ones(grid.shape, dtype=np.float64) * 0.5
    mat = VoigtMixed([
        Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
        Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
    with pytest.raises(SolverError, match="slab"):
        LSSolver(grid, mat, SolverOptions(), sharding=sharding)


def test_warn_fallback_still_solves_correctly():
    """sharding_fallback='warn' on a non-divisible grid proceeds with
    replicated (GSPMD) FFTs — slower, but the ANSWER must match the
    single-device solve."""
    grid = fg.Grid(12, 8, 8)
    x = (np.arange(grid.nx) + 0.5) / grid.nx
    phi1 = jnp.asarray(np.broadcast_to(
        (x < 0.5)[:, None, None], grid.shape).astype(np.float64))
    def make(sharding=None, **kw):
        mat = VoigtMixed([
            Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
            Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
        s = LSSolver(grid, mat, SolverOptions(
            mode="elasticity", method="cg", tol=1e-10, maxiter=400, **kw),
            sharding=sharding)
        s.set_strain([1.0, 0, 0, 0, 0, 0])
        return s

    s_ref = make()
    assert not s_ref.run()
    sig_ref = s_ref.calc_mean_stress()

    sharding = NamedSharding(mesh8(), P(None, "x", None, None))
    s_warn = make(sharding, sharding_fallback="warn")
    assert s_warn.par is None
    assert not s_warn.run()
    np.testing.assert_allclose(np.asarray(s_warn.calc_mean_stress()),
                               np.asarray(sig_ref), rtol=1e-8, atol=1e-11)
