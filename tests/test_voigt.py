"""Voigt-algebra identities (the reference's run_tests math section,
fibergen.cpp:23666-23868): identity operators, dyad contractions and the
6<->9 expansion round-trip."""
import numpy as np
import pytest

from fibergen_tpu.core import voigt


@pytest.mark.parametrize("dim", [3, 6, 9])
def test_id4_is_identity_on_tensors(dim):
    """Id4 : v = v for Voigt vectors representing symmetric (dim 6) or
    general (dim 9) tensors, with the weighted contraction."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=dim)
    out = voigt.dyad4_mv(voigt.id4(dim), v)
    np.testing.assert_allclose(out, v, atol=1e-14)


@pytest.mark.parametrize("dim", [6, 9])
def test_ii4_projects_trace(dim):
    """II4 : v = tr(v) * I (the spherical operator)."""
    rng = np.random.default_rng(1)
    v = rng.normal(size=dim)
    out = voigt.dyad4_mv(voigt.ii4(dim), v)
    tr = v[0] + v[1] + v[2]
    expect = np.zeros(dim)
    expect[:3] = tr
    np.testing.assert_allclose(out, expect, atol=1e-14)


def test_expand_roundtrip():
    rng = np.random.default_rng(2)
    v6 = rng.normal(size=6)
    v9 = voigt.expand_6_to_9(v6)
    np.testing.assert_allclose(v9[3:6], v9[6:9])
    # matrix round-trip: to_matrix/from_matrix are mutually inverse
    np.testing.assert_allclose(
        voigt.from_matrix(voigt.to_matrix(v6), 6), v6, atol=1e-14)
    v9g = rng.normal(size=9)
    np.testing.assert_allclose(
        voigt.from_matrix(voigt.to_matrix(v9g), 9), v9g, atol=1e-14)


def test_dyad4_mm_matches_tensor_contraction():
    """A : B in Voigt equals the full 4th-order tensor contraction."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(6, 6)); A = 0.5 * (A + A.T)
    B = rng.normal(size=(6, 6)); B = 0.5 * (B + B.T)
    VI = [0, 1, 2, 1, 0, 0]
    VJ = [0, 1, 2, 2, 2, 1]

    def to_tensor(M):
        T = np.zeros((3, 3, 3, 3))
        for a in range(6):
            for b in range(6):
                for p, q in {(VI[a], VJ[a]), (VJ[a], VI[a])}:
                    for r, s in {(VI[b], VJ[b]), (VJ[b], VI[b])}:
                        T[p, q, r, s] = M[a, b]
        return T

    T = np.einsum("ijkl,klmn->ijmn", to_tensor(A), to_tensor(B))
    C = voigt.dyad4_mm(A, B)
    for a in range(6):
        for b in range(6):
            np.testing.assert_allclose(C[a, b], T[VI[a], VJ[a], VI[b], VJ[b]],
                                       atol=1e-12)


def test_identity_vec():
    for dim in (6, 9):
        v = voigt.identity_vec(dim)
        assert v[:3].sum() == 3 and np.abs(v[3:]).max() == 0
    # scalar modes carry no rank-2 identity
    assert np.abs(voigt.identity_vec(3)).max() == 0
