"""Native C++ kernel tests: the ctypes library must agree with the numpy
implementations and serve as a long-double oracle for the device cut-volume
kernel."""
import jax.numpy as jnp
import numpy as np
import pytest

from fibergen_tpu import native
from fibergen_tpu.geometry import discretize
from fibergen_tpu.geometry.primitives import segment_segment_distance

LIB = native.get_lib()
pytestmark = pytest.mark.skipif(LIB is None, reason="native toolchain missing")


def test_segseg_native_matches_numpy():
    rng = np.random.default_rng(0)
    p1 = rng.standard_normal(3)
    q1 = rng.standard_normal(3)
    P2 = rng.standard_normal((50, 3))
    Q2 = rng.standard_normal((50, 3))
    d_native = native.segseg_distance_batch(p1, q1, P2, Q2)
    d_np = segment_segment_distance(p1, q1, P2, Q2)
    np.testing.assert_allclose(d_native, d_np, atol=1e-12)


def test_capsule_clearance_min():
    rng = np.random.default_rng(1)
    p1 = np.zeros(3)
    q1 = np.array([1.0, 0, 0])
    P2 = rng.uniform(-2, 2, (20, 3))
    Q2 = P2 + rng.standard_normal((20, 3)) * 0.1
    R2 = np.full(20, 0.05)
    d = native.capsule_clearance_min(p1, q1, 0.1, P2, Q2, R2)
    d_ref = (segment_segment_distance(p1, q1, P2, Q2) - 0.1 - R2).min()
    assert abs(d - d_ref) < 1e-12


def test_cut_volume_device_vs_native_oracle():
    """The device plane_cut_fraction must match the long-double native oracle
    across random and degenerate normals (f64)."""
    rng = np.random.default_rng(2)
    h = (0.9, 1.1, 1.3)
    cases = [rng.standard_normal(3) for _ in range(20)]
    cases += [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
              np.array([0, 0, 1.0]), np.array([1.0, 1e-9, 0])]
    for n in cases:
        n = n / np.linalg.norm(n)
        for d in [-1.5, -0.4, -0.05, 0.0, 0.05, 0.4, 1.5]:
            want = native.halfspace_box_cut_fraction(n, d, h)
            got = float(discretize.plane_cut_fraction(
                jnp.asarray(float(d)), jnp.asarray(n[0]), jnp.asarray(n[1]),
                jnp.asarray(n[2]), h))
            assert abs(got - want) < 1e-9, (n, d, got, want)
