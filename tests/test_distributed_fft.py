"""The distributed FFT must be a real slab decomposition, not replication.

Round-1 finding: expressing the 3-D FFT through sharding constraints alone
makes GSPMD all-gather the full field on every device (3 all-gathers, 0
all-to-alls in the compiled HLO).  These tests pin the fixed behavior:

- SlabFFT matches jnp.fft.rfftn exactly (forward/inverse/zero-trace),
- the compiled sharded CG step contains all-to-all collectives and **no
  all-gather of a full-field-sized buffer**,
- per-device temp memory stays bounded by a few shards, not the full field.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import fibergen_tpu as fg
from fibergen_tpu.materials import laws
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.parallel import SlabFFT, slab_fft_for
from fibergen_tpu.solvers.ls import LSSolver, SolverOptions
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), axis_names=("x",))


# ------------------------------------------------------------- numerics
@pytest.mark.parametrize("shape", [(16, 8, 10), (32, 16, 7), (8, 8, 1)])
@pytest.mark.parametrize("ncomp", [3, 6])
def test_slab_fft_matches_rfftn(shape, ncomp):
    mesh = mesh8()
    sfft = SlabFFT(mesh)
    assert sfft.supports(*shape)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((ncomp,) + shape)
    xd = jax.device_put(jnp.asarray(x), sfft.field_sharding())

    yhat = jax.jit(sfft.fftn)(xd)
    ref = jnp.fft.rfftn(jnp.asarray(x), axes=(-3, -2, -1), norm="forward")
    np.testing.assert_allclose(np.asarray(yhat), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)
    # hat field is y-sharded (the slab transpose), not replicated
    assert not yhat.sharding.is_fully_replicated

    back = jax.jit(lambda y: sfft.ifftn(y, shape))(yhat)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-12, atol=1e-13)
    assert not back.sharding.is_fully_replicated


def test_slab_fft_zero_trace_matches():
    from fibergen_tpu.ops import fft as fftmod
    mesh = mesh8()
    shape = (16, 8, 8)
    sfft = SlabFFT(mesh)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((6,) + shape)
    # make components 0..2 traceless so the reconstruction is consistent
    x[0] = -(x[1] + x[2])
    xd = jax.device_put(jnp.asarray(x), sfft.field_sharding())

    yhat = jax.jit(sfft.fftn_zero_trace)(xd)
    ref = fftmod.fftn_zero_trace(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yhat), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)
    back = jax.jit(lambda y: sfft.ifftn_zero_trace(y, shape))(yhat)
    refb = fftmod.ifftn_zero_trace(ref, shape)
    np.testing.assert_allclose(np.asarray(back), np.asarray(refb),
                               rtol=1e-12, atol=1e-13)


def test_slab_fft_for_dispatch():
    mesh = mesh8()
    sh = NamedSharding(mesh, P(None, "x", None, None))
    assert slab_fft_for(sh, fg.Grid(16, 8, 8)) is not None
    # ny=4 does not divide 8 devices -> no slab path
    assert slab_fft_for(sh, fg.Grid(16, 4, 4)) is None
    # nx not divisible
    assert slab_fft_for(sh, fg.Grid(12, 8, 8)) is None
    # replicated sharding -> no slab path
    assert slab_fft_for(NamedSharding(mesh, P()), fg.Grid(16, 8, 8)) is None
    assert slab_fft_for(None, fg.Grid(16, 8, 8)) is None


# --------------------------------------------------- compiled collectives
def _sharded_solver(grid, mesh):
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    x = (np.arange(grid.nx) + 0.5) / grid.nx
    phi1 = jnp.asarray(np.broadcast_to(
        ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float64))
    phi1 = jax.device_put(phi1, NamedSharding(mesh, P("x", None, None)))
    mat = VoigtMixed([
        Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
        Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
    opt = SolverOptions(mode="elasticity", method="cg")
    s = LSSolver(grid, mat, opt, sharding=sharding)
    assert s.par is not None, "slab FFT must engage for this layout"
    return s


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


def _collective_output_bytes(hlo_text, opname):
    """Byte sizes of every `opname` op result in an HLO dump."""
    sizes = []
    itemsize = {"f64": 8, "f32": 4, "c128": 16, "c64": 8, "s32": 4,
                "u32": 4, "pred": 1, "f16": 2, "bf16": 2}
    for m in re.finditer(
            r"=\s+\(?([a-z0-9]+)\[([0-9,]*)\][^)]*\)?\s+" + opname, hlo_text):
        dtype, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * itemsize.get(dtype, 8))
    return sizes


def test_sharded_cg_step_uses_all_to_all_not_all_gather():
    grid = fg.Grid(32, 16, 16)
    mesh = mesh8()
    s = _sharded_solver(grid, mesh)
    compiled = _compile_cg_step(s)
    hlo = compiled.as_text()

    assert "all-to-all" in hlo, "slab FFT transpose must compile to all-to-all"

    full_field_bytes = 6 * grid.nx * grid.ny * grid.nz * 8
    ag_sizes = _collective_output_bytes(hlo, "all-gather")
    assert all(sz < full_field_bytes // 2 for sz in ag_sizes), (
        f"full-field-sized all-gather present: {ag_sizes} vs field "
        f"{full_field_bytes}")


def test_sharded_cg_step_memory_scales_with_shard():
    """Per-device temp allocation must be a few shards, not the full
    field: the round-1 GSPMD path used ~16x shard size in temps."""
    grid = fg.Grid(32, 16, 16)
    mesh = mesh8()
    s = _sharded_solver(grid, mesh)
    compiled = _compile_cg_step(s)
    mem = compiled.memory_analysis()
    shard_bytes = 6 * grid.nx * grid.ny * grid.nz * 8 // 8
    assert mem.temp_size_in_bytes <= 8 * shard_bytes, (
        f"temp {mem.temp_size_in_bytes} exceeds 8 shards "
        f"({8 * shard_bytes})")


def test_512_cube_sharded_step_fits_hbm():
    """The capability claim behind the mesh path: a 512^3 CG step exceeds
    single-chip HBM (measured 18.9 GB > 15.75 GB on v5e) but compiles to
    ~3.4 GB per device on an 8-mesh with the slab FFT — comfortable v5e
    headroom.  AOT-compiles the sharded step and checks the per-device
    memory analysis."""
    import fibergen_tpu.core.fields as fields

    n = 512
    grid = fg.Grid(n, n, n)
    mesh = mesh8()
    sharding = NamedSharding(mesh, P(None, "x", None, None))
    x = (np.arange(n) + 0.5) / n
    phi1 = jnp.asarray(np.broadcast_to(
        ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float32))
    mat = VoigtMixed([
        Phase("a", laws.LinearIsotropic(mu=1, lam=1), phi1),
        Phase("b", laws.LinearIsotropic(mu=5, lam=2), 1 - phi1)], dim=6)
    s = LSSolver(grid, mat,
                 SolverOptions(mode="elasticity", method="cg",
                               dtype="float32"), sharding=sharding)
    assert s.par is not None
    s.eps = fields.const_field(grid, np.zeros(6), s.dtype)
    s.calc_ref_material()

    phi_sh = NamedSharding(mesh, P("x", None, None))
    mf = s.mat.fields()
    import jax.tree_util as jtu
    mf_abs = jtu.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                       sharding=phi_sh if a.ndim == 3
                                       else None), mf)
    f6 = jax.ShapeDtypeStruct((6, n, n, n), jnp.float32, sharding=sharding)
    sc = jax.ShapeDtypeStruct((), jnp.float32)
    comp = s._k_cg_step.lower(mf_abs, f6, f6, f6, sc, sc, None,
                              mu0=s.mu_0, lam0=s.lambda_0).compile()
    m = comp.memory_analysis()
    per_device = (m.argument_size_in_bytes + m.temp_size_in_bytes
                  + m.output_size_in_bytes)
    assert per_device < 6e9, f"per-device {per_device/1e9:.2f} GB too large"
