"""Fiber detection from voxel data (detect_fibers equivalent)."""
import jax.numpy as jnp
import numpy as np

import fibergen_tpu as fg
from fibergen_tpu.geometry import discretize
from fibergen_tpu.geometry.detect import detect_fibers
from fibergen_tpu.geometry.primitives import Capsule
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def test_detect_single_capsule():
    grid = fg.Grid(32, 32, 32)
    truth = Capsule(center=np.array([0.5, 0.5, 0.5]),
                    axis=np.array([1.0, 0, 0]), length=0.4, radius=0.08)
    phi = np.asarray(discretize.phi_field(grid, [truth], dtype=jnp.float64))
    fibers = detect_fibers(phi, grid, threshold=0.5)
    assert len(fibers) >= 1
    f = fibers[0]
    assert abs(f.radius - truth.radius) < 0.03
    np.testing.assert_allclose(f.center, truth.center, atol=0.1)
    # axis up to sign
    assert abs(abs(f.axis @ truth.axis) - 1.0) < 0.2


def test_detect_action_xml(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    xml = """
    <settings>
      <solver n="24">
        <mode>heat</mode>
        <materials><matrix mu="1" /><fiber mu="10" /></materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber L="0.4" R="0.08" cx="0.5" cy="0.5" cz="0.5"
                     ax="0" ay="1" az="0" />
        <init_phase />
        <detect_fibers filename="detected.txt" />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    lines = (tmp_path / "detected.txt").read_text().splitlines()
    assert len(lines) >= 2
