"""Equivalence of the Pallas-fused spectral middle (ops/pallas_chain.py)
with the XLA chain it replaces (green._g0_staggered_chain), in Pallas
interpret mode on CPU float64."""
import contextlib

import numpy as np
import jax.numpy as jnp
import pytest

import fibergen_tpu as fg
from fibergen_tpu.core.grid import Grid
from fibergen_tpu.ops import fft as fftmod
from fibergen_tpu.ops import green
from fibergen_tpu.ops import pallas_chain as pc


@contextlib.contextmanager
def _forced_middle():
    old = (pc.MM_MIDDLE, pc.INTERPRET, fftmod.FFT_BACKEND)
    pc.MM_MIDDLE, pc.INTERPRET = "on", True
    fftmod.FFT_BACKEND = "matmul"
    try:
        yield
    finally:
        pc.MM_MIDDLE, pc.INTERPRET, fftmod.FFT_BACKEND = old


@pytest.mark.parametrize("shape,cell", [
    ((8, 6, 10), (1.0, 1.0, 1.0)),
    ((6, 8, 7), (2.0, 0.5, 1.3)),     # odd nz, anisotropic cell
    ((4, 4, 4), (1.0, 2.0, 3.0)),
])
def test_g0_staggered_middle_matches_chain(shape, cell):
    grid = Grid(*shape, dx=cell[0], dy=cell[1], dz=cell[2])
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((3, *shape)))
    for c10, c20 in ((-1.0 / 0.7, -0.9), (2.0, 0.0)):
        ref = green._g0_staggered_chain(grid, f, c10, c20)
        with _forced_middle():
            out = pc.g0_staggered_middle(grid, f, c10, c20)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)


def test_g0_staggered_heat_middle_matches_chain():
    shape = (8, 6, 5)
    grid = Grid(*shape, dx=1.5, dy=0.7, dz=1.0)
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((1, *shape)))
    c10 = 1.0 / 1.3          # -alpha / (2 mu_0) with alpha = -1, mu_0 = 0.65
    ref_hat = green.g0_staggered_heat(grid, 0.65, 0.0, fftmod.fftn(f), -1.0)
    ref = fftmod.ifftn(ref_hat, shape)
    with _forced_middle():
        out = pc.g0_staggered_heat_middle(grid, f, c10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_fused_dispatch_uses_middle(monkeypatch):
    """g0_staggered_fused routes through the Pallas middle when enabled and
    stays bit-compatible with the XLA chain."""
    shape = (8, 8, 6)
    grid = Grid(*shape)
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.standard_normal((3, *shape)))
    fftmod.FFT_BACKEND = "matmul"
    try:
        ref = green.g0_staggered_fused(grid, 0.8, 0.3, f)
        called = {}
        orig = pc.g0_staggered_middle

        def spy(*a, **k):
            called["yes"] = True
            return orig(*a, **k)

        monkeypatch.setattr(pc, "g0_staggered_middle", spy)
        with _forced_middle():
            out = green.g0_staggered_fused(grid, 0.8, 0.3, f)
        assert called.get("yes")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)
        # pallas_mid=False (GSPMD fallback) must keep the XLA chain
        called.clear()
        with _forced_middle():
            out2 = green.g0_staggered_fused(grid, 0.8, 0.3, f,
                                            pallas_mid=False)
        assert not called
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   rtol=1e-12)
    finally:
        fftmod.FFT_BACKEND = "auto"


@pytest.mark.parametrize("kind,ncomp,beta", [
    ("elasticity", 6, 0.0),
    ("elasticity", 6, 0.3),
    ("heat", 3, 0.0),
    ("hyper", 9, 0.25),
])
def test_gamma_collocated_middle_matches_chain(kind, ncomp, beta):
    shape = (8, 6, 7)
    grid = Grid(*shape, dx=1.2, dy=0.8, dz=1.0)
    rng = np.random.default_rng(6)
    tau = jnp.asarray(rng.standard_normal((ncomp, *shape)))
    E = jnp.asarray(rng.standard_normal(ncomp))
    fn = {"elasticity": green.gamma_collocated_fused,
          "heat": green.gamma_collocated_heat_fused,
          "hyper": green.gamma_collocated_hyper_fused}[kind]
    fftmod.FFT_BACKEND = "matmul"
    try:
        ref = fn(grid, E, 0.7, 0.4, tau, alpha=-1.0, beta=beta)
        with _forced_middle():
            out = fn(grid, E, 0.7, 0.4, tau, alpha=-1.0, beta=beta)
            out_off = fn(grid, E, 0.7, 0.4, tau, alpha=-1.0, beta=beta,
                         pallas_mid=False)
    finally:
        fftmod.FFT_BACKEND = "auto"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


def test_gamma_collocated_zt_middle_matches_chain():
    """Viscosity Delta-scheme spectral core: zero-trace transforms +
    collocated Gamma with the negative reference viscosity and
    lambda -> inf, Pallas middle vs the separate-transform path."""
    shape = (8, 6, 7)
    grid = Grid(*shape, dx=1.1, dy=0.9, dz=1.0)
    rng = np.random.default_rng(7)
    tau = jnp.asarray(rng.standard_normal((6, *shape)))
    E = jnp.asarray(rng.standard_normal(6))
    mu0v = 0.35
    args = (grid, E, -1.0 / (4.0 * mu0v), float("inf"), tau)
    kw = dict(alpha=-1.0, beta=2.0 * (-1.0) * mu0v)
    fftmod.FFT_BACKEND = "matmul"
    try:
        ref = green.gamma_collocated_zt_fused(*args, **kw, pallas_mid=False)
        with _forced_middle():
            out = green.gamma_collocated_zt_fused(*args, **kw)
    finally:
        fftmod.FFT_BACKEND = "auto"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)
    # the zero-trace reconstruction: component 0 == -(c1 + c2)
    np.testing.assert_allclose(np.asarray(out[0]),
                               -np.asarray(out[1] + out[2]), rtol=1e-12)


@pytest.mark.parametrize("shape", [
    (16, 6, 10),    # kz = 6 on an 8-mesh: 2 padded kz slabs exercised
    (16, 8, 14),    # kz = 8: no padding
    (24, 4, 9),     # odd nz, nx = 3 slabs per device
])
def test_g0_staggered_middle_slab_matches_chain(shape):
    """The kz-slab-distributed Pallas middle on the 8-device CPU mesh must
    reproduce the single-chip XLA chain on x-slab-sharded fields."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fibergen_tpu.parallel.fft import SlabFFT

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), axis_names=("x",))
    par = SlabFFT(mesh, "x")
    grid = Grid(*shape, dx=1.1, dy=0.8, dz=1.0)
    rng = np.random.default_rng(11)
    f_np = rng.standard_normal((3, *shape))
    f_sh = jax.device_put(jnp.asarray(f_np),
                          NamedSharding(mesh, P(None, "x", None, None)))
    for c10, c20 in ((-1.0 / 0.7, -0.9), (2.0, 0.0)):
        ref = green._g0_staggered_chain(grid, jnp.asarray(f_np), c10, c20)
        with _forced_middle():
            out = pc.g0_staggered_middle_slab(par, grid, f_sh, c10, c20)
        assert not out.sharding.is_fully_replicated
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)


def test_fused_dispatch_uses_slab_middle(monkeypatch):
    """g0_staggered_fused(par=...) routes qualifying shapes through the
    distributed middle and keeps the slab-FFT pair otherwise."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fibergen_tpu.parallel.fft import SlabFFT

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("x",))
    par = SlabFFT(mesh, "x")
    shape = (16, 8, 10)
    grid = Grid(*shape)
    rng = np.random.default_rng(12)
    f = jax.device_put(
        jnp.asarray(rng.standard_normal((3, *shape))),
        NamedSharding(mesh, P(None, "x", None, None)))
    ref = green.g0_staggered_fused(grid, 0.8, 0.3, jnp.asarray(f))
    called = {}
    orig = pc.g0_staggered_middle_slab

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pc, "g0_staggered_middle_slab", spy)
    with _forced_middle():
        out = green.g0_staggered_fused(grid, 0.8, 0.3, f, par=par)
    assert called.get("yes")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)
    # pallas_mid=False (or a non-qualifying shape) keeps the slab FFT pair
    called.clear()
    with _forced_middle():
        out2 = green.g0_staggered_fused(grid, 0.8, 0.3, f, par=par,
                                        pallas_mid=False)
    assert not called
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kind", ["elasticity", "heat", "hyper", "zt",
                                  "g0heat"])
def test_middle_slab_matches_single_chip(kind):
    """Every chain family's distributed middle must match its single-chip
    fused path on x-slab-sharded fields (8-device CPU mesh, f64)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fibergen_tpu.parallel.fft import SlabFFT

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("x",))
    par = SlabFFT(mesh, "x")
    shape = (16, 6, 10)
    grid = Grid(*shape, dx=1.2, dy=0.9, dz=1.0)
    rng = np.random.default_rng(13)
    ncomp = {"elasticity": 6, "heat": 3, "hyper": 9, "zt": 6, "g0heat": 1}
    tau_np = rng.standard_normal((ncomp[kind], *shape))
    tau_sh = jax.device_put(jnp.asarray(tau_np),
                            NamedSharding(mesh, P(None, "x", None, None)))

    def run(tau, par_arg):
        if kind == "g0heat":
            return green.g0_staggered_heat_fused(grid, 0.65, 0.0, tau, -1.0,
                                                 par=par_arg)
        if kind == "zt":
            return green.gamma_collocated_zt_fused(
                grid, jnp.asarray(rng0), -1.0 / (4.0 * 0.35), float("inf"),
                tau, alpha=-1.0, beta=-0.7, par=par_arg)
        fn = {"elasticity": green.gamma_collocated_fused,
              "heat": green.gamma_collocated_heat_fused,
              "hyper": green.gamma_collocated_hyper_fused}[kind]
        return fn(grid, jnp.asarray(rng0), 0.7, 0.4, tau, alpha=-1.0,
                  beta=0.3, par=par_arg)

    rng0 = np.random.default_rng(14).standard_normal(ncomp[kind])
    fftmod.FFT_BACKEND = "matmul"
    try:
        ref = run(jnp.asarray(tau_np), None)
        with _forced_middle():
            out = run(tau_sh, par)
    finally:
        fftmod.FFT_BACKEND = "auto"
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_middle_slab_policy():
    import jax
    from jax.sharding import Mesh
    from fibergen_tpu.parallel.fft import SlabFFT

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("x",))
    par = SlabFFT(mesh, "x")
    old = pc.MM_MIDDLE
    try:
        pc.MM_MIDDLE = "on"
        assert pc.middle_slab_enabled(par, (16, 6, 10))
        assert not pc.middle_slab_enabled(par, (20, 6, 10))  # nx % 8 != 0
        assert not pc.middle_slab_enabled(par, (16, 7, 10))  # odd ny
        assert not pc.middle_slab_enabled(None, (16, 6, 10))
        pc.MM_MIDDLE = "off"
        assert not pc.middle_slab_enabled(par, (16, 6, 10))
    finally:
        pc.MM_MIDDLE = old


def test_middle_policy():
    # CPU backend: auto never enables the Pallas middle
    assert pc._knob() in ("auto", "on", "off")
    assert not pc.middle_enabled((256, 256, 256)) or pc._knob() == "on"
    old = pc.MM_MIDDLE
    try:
        pc.MM_MIDDLE = "on"
        assert pc.middle_enabled((8, 6, 10))
        assert not pc.middle_enabled((9, 6, 10))   # odd nx: no radix-2 split
        assert not pc.middle_enabled((8, 7, 10))
        pc.MM_MIDDLE = "off"
        assert not pc.middle_enabled((256, 256, 256))
    finally:
        pc.MM_MIDDLE = old


@pytest.mark.parametrize("scheme", ["staggered", "collocated"])
def test_solver_equivalence_with_middle(scheme):
    """A CG elasticity solve is identical (iterations and effective
    stiffness) with the Pallas middle on and off, for both the staggered
    G0 chain and the collocated Gamma chain."""
    grid = fg.Grid(8, 8, 7)
    x = (np.arange(8) + 0.5) / 8
    phi = jnp.asarray(np.broadcast_to((x < 0.5)[:, None, None],
                                      grid.shape).astype(np.float64))
    mat = fg.VoigtMixed([
        fg.Phase("a", fg.LinearIsotropic(mu=1.0, lam=1.0), phi),
        fg.Phase("b", fg.LinearIsotropic(mu=5.0, lam=2.0), 1.0 - phi),
    ], dim=6)

    def solve():
        s = fg.LSSolver(grid, mat, fg.SolverOptions(
            mode="elasticity", method="cg", gamma_scheme=scheme,
            tol=1e-10, maxiter=200, dtype="float64", use_dim2="off"))
        s.set_strain([1.0, 0, 0, 0, 0, 0])
        assert not s.run()
        return np.asarray(s.calc_mean_stress()), len(s.residuals)

    fftmod.FFT_BACKEND = "matmul"
    try:
        with _forced_middle():
            sig_mid, it_mid = solve()
        sig_ref, it_ref = solve()
    finally:
        fftmod.FFT_BACKEND = "auto"
    assert it_mid == it_ref
    np.testing.assert_allclose(sig_mid, sig_ref, rtol=1e-9, atol=1e-14)
    if scheme == "staggered":
        # series laminate: C11 = 2*M1*M2/(M1+M2), M = lam + 2 mu
        np.testing.assert_allclose(sig_mid[0], 2 * 3.0 * 12.0 / 15.0,
                                   rtol=1e-8)
