"""Constitutive material laws.

TPU-native redesign of the reference's MaterialLaw hierarchy
(fibergen.cpp:10287-12003): laws operate on whole Voigt fields
``(dim, nx, ny, nz)`` at once; hyperelastic first Piola-Kirchhoff stress and
its linearization come from JAX autodiff of the stored-energy density instead
of ~1,700 lines of hand-derived tensor algebra — which also makes the
reference's (disabled) finite-difference law checks exact (jax.grad == PK1 by
construction, tested in tests/test_laws.py).

Voigt conventions: see core.voigt.  dim 6 strains store tensor shear
components (not doubled); dim 9 stores the full deformation gradient
[xx, yy, zz, yz, xz, xy, zy, zx, yx].
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import voigt
from . import convert


# ---------------------------------------------------------------------------
# helpers: Voigt-9 <-> matrix rows
# ---------------------------------------------------------------------------

def mat_from_voigt9(F):
    """(9, ...) -> (..., 3, 3) using the dim-9 component order."""
    rows = jnp.stack([
        jnp.stack([F[0], F[5], F[4]], axis=-1),
        jnp.stack([F[8], F[1], F[3]], axis=-1),
        jnp.stack([F[7], F[6], F[2]], axis=-1),
    ], axis=-2)
    return rows


def voigt9_from_mat(M):
    """(..., 3, 3) -> (9, ...)."""
    return jnp.stack([
        M[..., 0, 0], M[..., 1, 1], M[..., 2, 2],
        M[..., 1, 2], M[..., 0, 2], M[..., 0, 1],
        M[..., 2, 1], M[..., 2, 0], M[..., 1, 0],
    ])


def det3(M):
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def _safe_log(x):
    """log with clamp against J <= 0 (the reference's MaterialLaw::log guard)."""
    tiny = jnp.finfo(x.dtype).tiny
    return jnp.log(jnp.maximum(x, tiny))


# ---------------------------------------------------------------------------
# Law base classes
# ---------------------------------------------------------------------------

class MaterialLaw:
    """Field-level constitutive API.

    w(F) -> (...), pk1(F) -> (dim, ...), dpk1(F, W) -> directional derivative
    of pk1 at F in direction W (the reference's dPK1, fibergen.cpp:10338)."""

    dim: int = 6
    is_linear: bool = False

    def w(self, F):
        raise NotImplementedError

    def pk1(self, F):
        raise NotImplementedError

    def dpk1(self, F, W):
        # exact linearization via forward-mode autodiff
        return jax.jvp(self.pk1, (F,), (W,))[1]

    def eig_range_const(self):
        """(lmin, lmax) of the Voigt dPK1 matrix when constant (linear laws),
        used for the reference-material bounds (getRefMaterial,
        fibergen.cpp:12153-12236).  None for nonlinear laws."""
        return None

    def cauchy(self, F):
        """Cauchy stress push-forward sigma = P F^T / det(F)
        (MaterialLaw::Cauchy, fibergen.cpp:10326).  For linear laws the
        stress is already Cauchy."""
        if self.dim != 9:
            return self.pk1(F)
        P = mat_from_voigt9(self.pk1(F))
        Fm = mat_from_voigt9(F)
        J = det3(Fm)
        sig = jnp.einsum("...ij,...kj->...ik", P, Fm) / J[..., None, None]
        return voigt9_from_mat(sig)

    def polarization(self, mu_0, F, inv=False):
        """Eyre-Milton transform (C - C0)(C + C0)^{-1} F with C0 = 2 mu_0 Id
        (calcPolarization, fibergen.cpp:10414-10445, 11427-11467)."""
        raise NotImplementedError(f"{type(self).__name__} has no polarization")

    def __str__(self):
        return type(self).__name__


@dataclasses.dataclass
class LinearIsotropic(MaterialLaw):
    """sigma = 2 mu eps + lambda tr(eps) I  (fibergen.cpp:11354-11474)."""

    mu: float
    lam: float
    dim: int = 6
    is_linear: bool = True

    def pk1(self, F):
        out = 2.0 * self.mu * F
        tr = self.lam * (F[0] + F[1] + F[2])
        return out.at[0:3].add(tr)

    def w(self, F):
        s = self.pk1(F)
        w = voigt.weights(self.dim)
        return 0.5 * sum(w[i] * s[i] * F[i] for i in range(self.dim))

    def dpk1(self, F, W):
        return self.pk1(W)

    def eig_range_const(self):
        e = (2.0 * self.mu, 2.0 * self.mu + 3.0 * self.lam)
        return (min(e), max(e))

    def iso_moduli(self):
        return (self.mu, self.lam)

    def polarization(self, mu_0, F, inv=False):
        # inv(C + C0) = 1/m Id - lam/(m(3 lam + m)) II, m = 2(mu + mu_0)
        m = 2.0 * (self.mu + mu_0)
        a = 1.0 / m
        b = self.lam / (m * (3.0 * self.lam + m))
        tr = F[0] + F[1] + F[2]
        P = a * F
        P = P.at[0:3].add(-b * tr)
        if not inv:
            m1 = 2.0 * (self.mu - mu_0)
            trP = P[0] + P[1] + P[2]
            P = m1 * P
            P = P.at[0:3].add(self.lam * trP)
        return P

    def __str__(self):
        return f"linear isotropic lambda={self.lam:g} mu={self.mu:g}"


@dataclasses.dataclass
class ScalarLinearIsotropic(MaterialLaw):
    """Scalar conductivity/fluidity law sigma = mu * E on dim-3 fields
    (fibergen.cpp:11161-11228).  Also used for viscosity (dim 6)."""

    mu: float
    dim: int = 3
    is_linear: bool = True

    def pk1(self, F):
        return self.mu * F

    def w(self, F):
        w = voigt.weights(self.dim)
        return 0.5 * self.mu * sum(w[i] * F[i] * F[i] for i in range(self.dim))

    def dpk1(self, F, W):
        return self.mu * W

    def eig_range_const(self):
        return (self.mu, self.mu)

    def iso_moduli(self):
        return (0.5 * self.mu, 0.0)  # C = mu * I == 2*(mu/2)*Id with lam=0

    def polarization(self, mu_0, F, inv=False):
        # C = mu*I, C0 = 2*mu_0*I -> scalar transform
        denom = self.mu + 2.0 * mu_0
        if inv:
            return F / denom
        return (self.mu - 2.0 * mu_0) / denom * F

    def __str__(self):
        return f"scalar linear isotropic mu={self.mu:g}"


@dataclasses.dataclass
class LinearGeneral(MaterialLaw):
    """Full 6x6 stiffness in Voigt notation, sigma = C : eps
    (LinearGeneralMaterialLaw, fibergen.cpp:11233-11349)."""

    C: np.ndarray  # (6, 6)
    dim: int = 6
    is_linear: bool = True

    def pk1(self, F):
        Cw = jnp.asarray(self.C * voigt.weights(6)[None, :], F.dtype)
        return jnp.einsum("ij,j...->i...", Cw, F)

    def w(self, F):
        s = self.pk1(F)
        w = voigt.weights(6)
        return 0.5 * sum(w[i] * s[i] * F[i] for i in range(6))

    def dpk1(self, F, W):
        return self.pk1(W)

    def eig_range_const(self):
        e = np.linalg.eigvalsh(np.asarray(self.C, dtype=np.float64))
        return (float(e.min()), float(e.max()))

    def __str__(self):
        return "general linear C"


# ---------------------------------------------------------------------------
# Hyperelastic laws (dim 9, autodiff-based)
# ---------------------------------------------------------------------------

class HyperelasticLaw(MaterialLaw):
    """Base for finite-strain laws: subclasses define the energy density
    ``energy(Fm)`` on (..., 3, 3) deformation gradients; PK1 = dW/dF and
    dPK1 = d2W/dF2 : W come from autodiff."""

    dim = 9

    def energy(self, Fm):
        raise NotImplementedError

    def w(self, F):
        return self.energy(mat_from_voigt9(F))

    def pk1(self, F):
        # gradient of sum(W) w.r.t. the (9, ...) field == per-voxel dW/dF
        return jax.grad(lambda x: self.energy(mat_from_voigt9(x)).sum())(F)


@dataclasses.dataclass
class SaintVenantKirchhoff(HyperelasticLaw):
    """W = lambda/2 tr(E)^2 + mu E:E with E = (F^T F - I)/2
    (fibergen.cpp:11598-11724)."""

    mu: float
    lam: float

    def energy(self, Fm):
        C = jnp.einsum("...ji,...jk->...ik", Fm, Fm)
        E = 0.5 * (C - jnp.eye(3, dtype=Fm.dtype))
        trE = jnp.trace(E, axis1=-2, axis2=-1)
        EE = (E * E).sum((-2, -1))
        return 0.5 * self.lam * trE * trE + self.mu * EE

    def __str__(self):
        return f"hyperelastic Saint Venant-Kirchhoff lambda={self.lam:g} mu={self.mu:g}"


@dataclasses.dataclass
class NeoHooke(HyperelasticLaw):
    """W = mu/2 (tr C - 3 - 2 ln J) + lambda/2 (ln J)^2
    (fibergen.cpp:11729-11861)."""

    mu: float
    lam: float

    def energy(self, Fm):
        trC = (Fm * Fm).sum((-2, -1))
        J = det3(Fm)
        logJ = _safe_log(J)
        return 0.5 * (self.mu * (trC - 3.0 - 2.0 * logJ) + self.lam * logJ * logJ)

    def __str__(self):
        return f"hyperelastic Neo-Hooke lambda={self.lam:g} mu={self.mu:g}"


@dataclasses.dataclass
class NeoHooke2(HyperelasticLaw):
    """W = mu/2 (J^{-2/3} tr C - 3) + K/2 (J - 1)^2
    (fibergen.cpp:11867-11998)."""

    mu: float
    K: float

    def energy(self, Fm):
        trC = (Fm * Fm).sum((-2, -1))
        J = det3(Fm)
        Jm23 = jnp.maximum(J, jnp.finfo(Fm.dtype).tiny) ** (-2.0 / 3.0)
        J1 = J - 1.0
        return 0.5 * (self.mu * (Jm23 * trC - 3.0) + self.K * J1 * J1)

    def __str__(self):
        return f"hyperelastic Neo-Hooke-2 K={self.K:g} mu={self.mu:g}"


def make_law(kind: str, dim_hint: int = 6, **params) -> MaterialLaw:
    """Law factory by XML tag name (readSettings law table,
    fibergen.cpp:15219-15305)."""
    kind = kind.lower()
    if kind in ("iso", "linear_isotropic", "matrix", "fiber", ""):
        c = convert.elastic_constants(**params)
        return LinearIsotropic(mu=c["mu"], lam=c["lam"])
    if kind in ("scalar", "scalar_linear_isotropic"):
        return ScalarLinearIsotropic(mu=float(params["mu"]), dim=dim_hint)
    if kind in ("general", "linear_general"):
        return LinearGeneral(C=np.asarray(params["C"], dtype=np.float64))
    if kind in ("svk", "saint_venant_kirchhoff", "sv"):
        c = convert.elastic_constants(**params)
        return SaintVenantKirchhoff(mu=c["mu"], lam=c["lam"])
    if kind in ("nh", "neo_hooke", "neo-hooke", "neohooke"):
        c = convert.elastic_constants(**params)
        return NeoHooke(mu=c["mu"], lam=c["lam"])
    if kind in ("nh2", "neo_hooke_2", "neohooke2"):
        c = convert.elastic_constants(**params)
        return NeoHooke2(mu=c["mu"], K=c["K"])
    raise ValueError(f"Unknown material law '{kind}'")
