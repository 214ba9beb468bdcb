"""Doubly-fine-grid (half/full staggered) tests."""
import jax.numpy as jnp
import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.materials import dfg, laws
from fibergen_tpu.materials.mixing import Phase, VoigtMixed
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def test_prolong_restrict_roundtrip():
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((6, 4, 6, 8)))
    R = dfg.restrict(dfg.prolong(F))
    np.testing.assert_allclose(np.asarray(R), np.asarray(F), atol=1e-14)


def test_prolong_shift_semantics():
    """Shear components sample at staggered (half-shifted) positions:
    dest[i] = src[((i + s) mod 2n)/2] (fibergen.cpp:14244-14266)."""
    n = 4
    F = jnp.asarray(np.arange(n, dtype=np.float64).reshape(1, n, 1, 1)
                    * np.ones((6, n, 2, 2)))
    P = np.asarray(dfg.prolong(jnp.asarray(F)))
    # diagonal comp (no shift): piecewise constant repeat
    np.testing.assert_allclose(P[0, :, 0, 0],
                               np.repeat(np.arange(n), 2))
    # xz comp (4): shifted by 1 in x: dest[i] = src[((i+1) mod 2n)/2]
    expect = np.array([((i + 1) % (2 * n)) // 2 for i in range(2 * n)],
                      dtype=np.float64)
    np.testing.assert_allclose(P[4, :, 0, 0], expect)


def test_dfg_uniform_material_identity():
    """On a homogeneous material the dfg wrapper must be exactly transparent."""
    grid = fg.Grid(4, 4, 4)
    fine = dfg.fine_grid(grid)
    phi = jnp.ones(fine.shape)
    inner = VoigtMixed([Phase("m", laws.LinearIsotropic(mu=2, lam=1), phi)],
                       dim=6)
    mat = dfg.DfgMaterial(inner)
    rng = np.random.default_rng(1)
    F = jnp.asarray(rng.standard_normal((6,) + grid.shape))
    direct = laws.LinearIsotropic(mu=2, lam=1).pk1(F)
    np.testing.assert_allclose(np.asarray(mat.pk1(F)), np.asarray(direct),
                               atol=1e-12)


def test_full_staggered_nunan_keller_small():
    """Viscosity with full_staggered (dfg) at n=16; at n=64 this setup
    reproduces the Nunan-Keller 1984 paper values alpha=1.0666 (ours:
    1.06483, 0.17%) and beta=0.49665 (ours: 0.49660, 0.011%)."""
    xml = """
    <settings>
      <solver n="16">
        <materials><matrix mu="1" /><fiber mu="0" /></materials>
        <mode>viscosity</mode>
        <gamma_scheme>full_staggered</gamma_scheme>
        <method>cg</method>
        <tol>1e-5</tol>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber V="0.2" />
        <calc_effective_properties />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    alpha, beta = f._nunan_keller
    assert abs(alpha - 1.0666) / 1.0666 < 0.06
    assert abs(beta - 0.49665) / 0.49665 < 0.06
