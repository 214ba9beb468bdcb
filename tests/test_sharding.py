"""Multi-device sharding equivalence: the solver on an 8-device x-slab mesh
must produce the same solution as single-device execution (within roundoff)
— the distributed capability the reference lacks (SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import fibergen_tpu as fg
from fibergen_tpu.materials import laws
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.solvers.ls import LSSolver, SolverOptions
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def make_problem(grid, dim, sharding=None):
    x = (np.arange(grid.nx) + 0.5) / grid.nx
    phi1 = jnp.asarray(np.broadcast_to(
        ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float64))
    if sharding is not None:
        phi1 = jax.device_put(phi1, sharding_field(sharding, 3))
    if dim == 3:
        phases = [Phase("a", laws.ScalarLinearIsotropic(mu=1.0, dim=3), phi1),
                  Phase("b", laws.ScalarLinearIsotropic(mu=7.0, dim=3), 1 - phi1)]
        mode = "heat"
    else:
        phases = [Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
                  Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)]
        mode = "elasticity"
    mat = VoigtMixed(phases, dim=dim)
    opt = SolverOptions(mode=mode, method="cg", tol=1e-11, maxiter=500)
    return LSSolver(grid, mat, opt, sharding=sharding)


def sharding_field(s, ncomp):
    # phi fields are (nx, ny, nz): shard the x axis
    mesh = s.mesh
    return NamedSharding(mesh, P("x", None, None))


@pytest.mark.parametrize("dim", [3, 6])
def test_sharded_solve_matches_single_device(dim):
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    grid = fg.Grid(16, 8, 8)

    s_ref = make_problem(grid, dim)
    E = np.zeros(dim)
    E[0] = 1.0
    s_ref.set_strain(E)
    assert not s_ref.run()
    sig_ref = s_ref.calc_mean_stress()

    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    s_sh = make_problem(grid, dim, sharding=sharding)
    s_sh.set_strain(E)
    assert not s_sh.run()
    sig_sh = s_sh.calc_mean_stress()

    np.testing.assert_allclose(sig_sh, sig_ref, rtol=1e-10, atol=1e-12)
    assert len(s_sh.residuals) == len(s_ref.residuals)
    # the final field itself must match, and actually be sharded
    np.testing.assert_allclose(np.asarray(s_sh.eps), np.asarray(s_ref.eps),
                               atol=1e-10)
    assert not s_sh.eps.sharding.is_fully_replicated


def test_sharded_hyper_newton_matches_single_device():
    """The Newton-Krylov hyperelastic path also runs sharded (GSPMD
    propagates the x-slab layout through pk1/jvp and the Green operator)."""
    devs = jax.devices()
    grid = fg.Grid(16, 8, 8)

    def make(sharding=None):
        x = (np.arange(grid.nx) + 0.5) / grid.nx
        phi1 = jnp.asarray(np.broadcast_to(
            ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float64))
        if sharding is not None:
            phi1 = jax.device_put(phi1, sharding_field(sharding, 3))
        mat = VoigtMixed([
            Phase("a", laws.SaintVenantKirchhoff(mu=1.0, lam=1.0), phi1),
            Phase("b", laws.SaintVenantKirchhoff(mu=4.0, lam=2.0), 1 - phi1),
        ], dim=9)
        s = LSSolver(grid, mat, SolverOptions(
            mode="hyperelasticity", method="cg", tol=1e-10, maxiter=300),
            sharding=sharding)
        s.set_strain(np.array([1.02, 1, 1, 0, 0, 0.01, 0, 0, 0]))
        return s

    s_ref = make()
    assert not s_ref.run()
    P_ref = s_ref.calc_mean_stress()

    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    s_sh = make(sharding=sharding)
    assert not s_sh.run()
    np.testing.assert_allclose(s_sh.calc_mean_stress(), P_ref,
                               rtol=1e-8, atol=1e-12)


def test_sharded_viscosity_matches_single_device():
    """The viscosity dual scheme on the mesh: the zero-trace slab-FFT
    variants (SlabFFT.fftn_zero_trace) must reproduce the single-device
    solve (the collocated Delta path is the only user of the zero-trace
    transforms)."""
    devs = jax.devices()
    grid = fg.Grid(16, 8, 8)

    def make(sharding=None):
        x = (np.arange(grid.nx) + 0.5) / grid.nx
        phi1 = jnp.asarray(np.broadcast_to(
            ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float64))
        if sharding is not None:
            phi1 = jax.device_put(phi1, NamedSharding(sharding.mesh,
                                                      P("x", None, None)))
        from fibergen_tpu.materials import laws as lawsmod
        mat = VoigtMixed([
            Phase("a", lawsmod.ScalarLinearIsotropic(mu=0.5, dim=6), phi1),
            Phase("b", lawsmod.ScalarLinearIsotropic(mu=1.5, dim=6),
                  1 - phi1)], dim=6)
        opt = SolverOptions(mode="viscosity", method="cg",
                            gamma_scheme="collocated", tol=1e-11,
                            maxiter=500)
        return LSSolver(grid, mat, opt, sharding=sharding)

    s_ref = make()
    E = np.array([-1.0, 1.0, 0, 0, 0, 0])
    s_ref.set_strain(E)
    assert not s_ref.run()
    sig_ref = s_ref.calc_mean_stress()

    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    s_sh = make(sharding)
    assert s_sh.par is not None
    s_sh.set_strain(E)
    assert not s_sh.run()
    sig_sh = s_sh.calc_mean_stress()

    np.testing.assert_allclose(sig_sh, sig_ref, rtol=1e-9, atol=1e-12)
    assert len(s_sh.residuals) == len(s_ref.residuals)


def test_sharded_mixed_bc_matches_single_device():
    """Stress-controlled mixed BCs on the mesh: the per-iteration mean
    correction (hat DC-bin update on the y-sharded spectrum) must
    reproduce the single-device solve."""
    devs = jax.devices()
    grid = fg.Grid(16, 8, 8)

    def make(sharding=None):
        x = (np.arange(grid.nx) + 0.5) / grid.nx
        phi1 = jnp.asarray(np.broadcast_to(
            ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float64))
        if sharding is not None:
            phi1 = jax.device_put(phi1, NamedSharding(sharding.mesh,
                                                      P("x", None, None)))
        mat = VoigtMixed([
            Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
            Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
        opt = SolverOptions(mode="elasticity", method="cg", tol=1e-11,
                            maxiter=800)
        s = LSSolver(grid, mat, opt, sharding=sharding)
        # stress control on the 11-component, strain control elsewhere
        # (Voigt-weighted identity: shear diagonal 1/2, so P : P = P)
        from fibergen_tpu.core import voigt
        Pm = voigt.id4(6).copy()
        Pm[0, 0] = 0.0
        s.set_bc_projector(Pm)
        s.set_stress([2.0, 0, 0, 0, 0, 0])
        s.set_strain([0.0, 0.1, 0, 0, 0, 0])
        return s

    s_ref = make()
    assert not s_ref.run()
    eps_ref = s_ref.calc_mean_strain()
    sig_ref = s_ref.calc_mean_stress()

    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    s_sh = make(sharding)
    assert s_sh.par is not None
    assert not s_sh.run()

    np.testing.assert_allclose(s_sh.calc_mean_strain(), eps_ref,
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(s_sh.calc_mean_stress(), sig_ref,
                               rtol=1e-8, atol=1e-11)
    # the stress control actually held
    np.testing.assert_allclose(sig_ref[0], 2.0, rtol=1e-6)


def test_sharded_get_fft_time_samples_slab_backend():
    """get_fft_time on a sharded solver times the slab-decomposed transform
    (round-2 verdict: the sample must track the ACTIVE spectral backend,
    not a generic single-device FFT pair)."""
    devs = jax.devices()
    grid = fg.Grid(16, 8, 8)
    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    s = make_problem(grid, 3, sharding=sharding)
    assert s.par is not None
    E = np.zeros(3)
    E[0] = 1.0
    s.set_strain(E)
    assert not s.run()
    t = s.get_fft_time()
    assert t > 0.0
    assert s._fft_pair_sample[-1] == "slab"


def test_sharded_get_fft_time_samples_slab_middle(monkeypatch):
    """With the kz-slab Pallas middle active on the mesh, get_fft_time
    samples THAT op (backend key 'slab_mid'), not the slab-FFT pair."""
    from fibergen_tpu.ops import fft as fftmod
    from fibergen_tpu.ops import pallas_chain as pc

    monkeypatch.setattr(pc, "MM_MIDDLE", "on")
    monkeypatch.setattr(pc, "INTERPRET", True)
    monkeypatch.setattr(fftmod, "FFT_BACKEND", "matmul")
    devs = jax.devices()
    grid = fg.Grid(16, 8, 8)
    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    s = make_problem(grid, 3, sharding=sharding)
    assert s.par is not None
    E = np.zeros(3)
    E[0] = 1.0
    s.set_strain(E)
    assert not s.run()
    t = s.get_fft_time()
    assert t > 0.0
    assert s._fft_pair_sample[-1] == "slab_mid"


def test_run_batched_on_mesh_matches_sequential():
    """Multi-RHS CG on the 8-device mesh (VERDICT r4 item 6): the batched
    driver rides the slab FFT through vmap-of-shard_map; Ceff columns must
    equal the sequential sharded solves'.  The reference is sequential AND
    single-node here (fibergen.cpp:26044-26066)."""
    devs = jax.devices()
    assert len(devs) >= 8
    grid = fg.Grid(16, 8, 8)
    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))

    dim = 3
    s_seq = make_problem(grid, dim, sharding=sharding)
    S_seq = np.zeros((dim, dim))
    for i in range(dim):
        s_seq.set_strain(np.eye(dim)[i])
        assert not s_seq.run()
        S_seq[:, i] = s_seq.calc_mean_stress()

    s_b = make_problem(grid, dim, sharding=sharding)
    assert s_b.par is not None  # slab layout engaged
    assert not s_b.run_batched(np.eye(dim))
    S_bat = s_b.calc_mean_stress_batched().T
    np.testing.assert_allclose(S_bat, S_seq, rtol=5e-7, atol=1e-9)


def test_run_batched_on_mesh_without_slab_refuses():
    """Replicated sharding (no slab layout) must refuse run_batched loudly
    instead of letting GSPMD all-gather per device."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    grid = fg.Grid(18, 8, 8)   # nx=18 not divisible by 8: no slab FFT
    from fibergen_tpu.solvers.ls import SolverError
    s = make_problem(grid, 3, sharding=None)
    s.sharding = sharding      # solver built unsharded; forced mismatch
    s.par = None
    with pytest.raises(SolverError):
        s.run_batched(np.eye(3))
