"""Mixed boundary-condition projector machinery.

Re-derivation of the reference's setBCProjector / calcBCMean /
applyBCProjector (fibergen.cpp:20599-20712, 20220-20279): a symmetric
idempotent Voigt projector P selects the strain-controlled subspace, Q = I-P
the stress-controlled one.  The per-iteration mean correction uses the
C0-weighted Moore-Penrose pseudo-inverse M of Q:C0:Q, computed with the
6 -> 9 -> 6 symmetrization dance of the reference.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core import voigt


@dataclasses.dataclass
class BCProjector:
    """Host-side precomputed projector matrices (all numpy, Voigt convention
    with tensor shear components; products use dyad4 doubling)."""

    P: np.ndarray
    Q: np.ndarray
    QC0: np.ndarray
    M: np.ndarray
    MQ: np.ndarray
    bc_relax: float = 1.0

    @property
    def dim(self):
        return self.P.shape[0]

    @property
    def is_trivial(self):
        """True when P == Id (pure strain control): M == 0, no correction."""
        return float(np.abs(self.MQ).max(initial=0.0)) < 1e-300 or np.linalg.norm(self.MQ) == 0.0


def make_bc_projector(P: np.ndarray, mu_0: float, lambda_0: float,
                      bc_relax: float = 1.0) -> BCProjector:
    """Build the projector set for reference material (mu_0, lambda_0)
    (setBCProjector, fibergen.cpp:20599-20665)."""
    P = np.asarray(P, dtype=np.float64)
    dim = P.shape[0]
    eps = np.sqrt(np.finfo(np.float64).eps)

    if P.shape[1] != dim or np.linalg.norm(P - P.T) > eps:
        raise ValueError("Projector is not symmetric")
    if np.linalg.norm(P - voigt.dyad4_mm(P, P)) > eps:
        raise ValueError("Specified projector is not a projector (P:P != P)")

    C0 = 2.0 * mu_0 * voigt.id4(dim) + lambda_0 * voigt.ii4(dim)
    Q = voigt.id4(dim) - P
    QC0 = voigt.dyad4_mm(Q, C0)
    QC0Q = voigt.dyad4_mm(QC0, Q)

    edim = 9 if dim == 6 else dim
    A = voigt.expand_matrix_6_to_9(QC0Q) if dim == 6 else QC0Q

    # Moore-Penrose pseudo-inverse via SVD with sqrt(eps)*|s| cutoff
    U, s, Vt = np.linalg.svd(A)
    cutoff = np.sqrt(np.finfo(np.float64).eps) * np.linalg.norm(s)
    sinv = np.where(np.abs(s) > cutoff, 1.0 / np.where(s == 0, 1.0, s), 0.0)
    M = (Vt.T * sinv) @ U.T

    if dim == 6:
        M = voigt.reduce_matrix_9_to_6(M)

    MQ = voigt.dyad4_mm(M, Q)
    return BCProjector(P=P, Q=Q, QC0=QC0, M=M, MQ=MQ, bc_relax=bc_relax)


@dataclasses.dataclass
class BCArrays:
    """Traced (jnp) view of the projector matrices for use inside jitted
    solver steps; registered as a pytree with bc_relax static."""

    MQ: object
    M: object
    QC0: object
    bc_relax: float = 1.0


def _bc_arrays_flatten(b):
    return (b.MQ, b.M, b.QC0), b.bc_relax


def _bc_arrays_unflatten(aux, children):
    return BCArrays(MQ=children[0], M=children[1], QC0=children[2], bc_relax=aux)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(BCArrays, _bc_arrays_flatten, _bc_arrays_unflatten)


def to_arrays(bc: BCProjector, dtype) -> "BCArrays | None":
    """Return a traced-arg view, or None when the projector is trivial
    (pure strain control: no per-iteration mean correction needed)."""
    import jax.numpy as jnp

    if bc is None or bc.is_trivial:
        return None
    return BCArrays(
        MQ=jnp.asarray(bc.MQ, dtype),
        M=jnp.asarray(bc.M, dtype),
        QC0=jnp.asarray(bc.QC0, dtype),
        bc_relax=bc.bc_relax,
    )


def calc_bc_mean(bc: BCProjector, E, S):
    """E + bc_relax * M : (S - Q:C0 : E) (calcBCMean, fibergen.cpp:20242-20245).

    Works with numpy or jax vectors."""
    return E + bc.bc_relax * voigt.dyad4_mv(bc.M, S - voigt.dyad4_mv(bc.QC0, E))


def bc_correction(bc: BCProjector, F0, F00=None):
    """Per-iteration mean correction R (calcBCProjector, fibergen.cpp:20258-20261):
        R = bc_relax * (M:Q) : F0 - (1 - bc_relax) * M : (Q:C0 : F00)
    F0 is the mean of the polarization field tau; F00 the mean strain
    (only used when bc_relax != 1)."""
    R = bc.bc_relax * voigt.dyad4_mv(bc.MQ, F0)
    if bc.bc_relax != 1.0 and F00 is not None:
        R = R - (1.0 - bc.bc_relax) * voigt.dyad4_mv(bc.M, voigt.dyad4_mv(bc.QC0, F00))
    return R
