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
        return cauchy_from_pk1_comp(self.pk1(F), F)

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
    ``energy(F)`` directly on the (9, ...) component field using the
    component helpers below; PK1 = dW/dF and dPK1 = d2W/dF2 : W come from
    autodiff.

    Component arithmetic (not (..., 3, 3) matrix views) is a TPU layout
    requirement, not style: a voxel-trailing 3x3 minor dimension pads to
    (4, 128) tiles — a ~57x HBM footprint/traffic blowup that made the
    hyper hot path bandwidth-bound on padding and a 256^3 tangent
    literally unallocatable (32 GB).  As (9, nx, ny, nz) slices everything
    stays in the natural field layout and XLA fuses the whole energy/PK1
    chain elementwise."""

    dim = 9

    def energy(self, F):
        raise NotImplementedError

    def w(self, F):
        return self.energy(jnp.asarray(F))

    def pk1(self, F):
        # gradient of sum(W) w.r.t. the (9, ...) field == per-voxel dW/dF
        return jax.grad(lambda x: self.energy(x).sum())(F)


def f_rows(F):
    """(9, ...) -> the nine matrix entries in row-major order
    (f00, f01, f02, f10, f11, f12, f20, f21, f22) per the dim-9 component
    order [xx, yy, zz, yz, xz, xy, zy, zx, yx]."""
    return F[0], F[5], F[4], F[8], F[1], F[3], F[7], F[6], F[2]


def det3_comp(F):
    """det(F) from the (9, ...) components (no (..., 3, 3) view)."""
    f00, f01, f02, f10, f11, f12, f20, f21, f22 = f_rows(F)
    return (f00 * (f11 * f22 - f12 * f21)
            - f01 * (f10 * f22 - f12 * f20)
            + f02 * (f10 * f21 - f11 * f20))


def cauchy_green_comp(F):
    """Unique entries of C = F^T F from the (9, ...) components:
    (C00, C11, C22, C12, C02, C01)."""
    f00, f01, f02, f10, f11, f12, f20, f21, f22 = f_rows(F)
    C00 = f00 * f00 + f10 * f10 + f20 * f20
    C11 = f01 * f01 + f11 * f11 + f21 * f21
    C22 = f02 * f02 + f12 * f12 + f22 * f22
    C12 = f01 * f02 + f11 * f12 + f21 * f22
    C02 = f00 * f02 + f10 * f12 + f20 * f22
    C01 = f00 * f01 + f10 * f11 + f20 * f21
    return C00, C11, C22, C12, C02, C01


def cauchy_from_pk1_comp(P, F):
    """sigma = P F^T / det(F) as (9, ...) component arithmetic
    (MaterialLaw::Cauchy, fibergen.cpp:10326); sigma_ij = P_ik F_jk / J."""
    p00, p01, p02, p10, p11, p12, p20, p21, p22 = f_rows(P)
    f00, f01, f02, f10, f11, f12, f20, f21, f22 = f_rows(F)
    J = det3_comp(F)
    s00 = (p00 * f00 + p01 * f01 + p02 * f02) / J
    s11 = (p10 * f10 + p11 * f11 + p12 * f12) / J
    s22 = (p20 * f20 + p21 * f21 + p22 * f22) / J
    s12 = (p10 * f20 + p11 * f21 + p12 * f22) / J
    s02 = (p00 * f20 + p01 * f21 + p02 * f22) / J
    s01 = (p00 * f10 + p01 * f11 + p02 * f12) / J
    s21 = (p20 * f10 + p21 * f11 + p22 * f12) / J
    s20 = (p20 * f00 + p21 * f01 + p22 * f02) / J
    s10 = (p10 * f00 + p11 * f01 + p12 * f02) / J
    return jnp.stack([s00, s11, s22, s12, s02, s01, s21, s20, s10])


@dataclasses.dataclass
class SaintVenantKirchhoff(HyperelasticLaw):
    """W = lambda/2 tr(E)^2 + mu E:E with E = (F^T F - I)/2
    (fibergen.cpp:11598-11724)."""

    mu: float
    lam: float

    def energy(self, F):
        C00, C11, C22, C12, C02, C01 = cauchy_green_comp(F)
        E00, E11, E22 = 0.5 * (C00 - 1.0), 0.5 * (C11 - 1.0), 0.5 * (C22 - 1.0)
        trE = E00 + E11 + E22
        # E:E with the symmetric off-diagonals E_ij = C_ij / 2 counted twice
        EE = (E00 * E00 + E11 * E11 + E22 * E22
              + 0.5 * (C01 * C01 + C02 * C02 + C12 * C12))
        return 0.5 * self.lam * trE * trE + self.mu * EE

    def __str__(self):
        return f"hyperelastic Saint Venant-Kirchhoff lambda={self.lam:g} mu={self.mu:g}"


@dataclasses.dataclass
class NeoHooke(HyperelasticLaw):
    """W = mu/2 (tr C - 3 - 2 ln J) + lambda/2 (ln J)^2
    (fibergen.cpp:11729-11861)."""

    mu: float
    lam: float

    def energy(self, F):
        trC = (F * F).sum(0)
        J = det3_comp(F)
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

    def energy(self, F):
        trC = (F * F).sum(0)
        J = det3_comp(F)
        Jm23 = jnp.maximum(J, jnp.finfo(F.dtype).tiny) ** (-2.0 / 3.0)
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


# ---------------------------------------------------------------------------
# Goldberg invariant-based hyperelastic family
# ---------------------------------------------------------------------------

class GoldbergLaw(HyperelasticLaw):
    """Isochoric-invariant energies W(J1, J2, J3) with
        J1 = J3^{-2/3} tr C,  J2 = J3^{-4/3} (trC^2 - tr C^2)/2,  J3 = det F
    (GeneralGoldbergMaterialLaw, fibergen.cpp:10455-10665).  PK1/dPK1 come
    from autodiff of the energy instead of the reference's hand-derived
    dev/inv tensor chains."""

    def w_inv(self, J1, J2, J3):
        raise NotImplementedError

    def energy(self, F):
        C00, C11, C22, C12, C02, C01 = cauchy_green_comp(F)
        trC = C00 + C11 + C22
        # tr(C^2) for symmetric C: sum of squared entries
        trCC = (C00 * C00 + C11 * C11 + C22 * C22
                + 2.0 * (C01 * C01 + C02 * C02 + C12 * C12))
        J3 = jnp.maximum(det3_comp(F), jnp.finfo(F.dtype).tiny)
        J1 = J3 ** (-2.0 / 3.0) * trC
        J2 = 0.5 * J3 ** (-4.0 / 3.0) * (trC * trC - trCC)
        return self.w_inv(J1, J2, J3)


@dataclasses.dataclass
class GoldbergMatrix1(GoldbergLaw):
    """W = m1 (J1-3) + m2 (J3 + 1/J3 - 2) (fibergen.cpp:10669-10717)."""
    m1: float = 1.0
    m2: float = 10.0

    def w_inv(self, J1, J2, J3):
        return self.m1 * (J1 - 3.0) + self.m2 * (J3 + 1.0 / J3 - 2.0)


@dataclasses.dataclass
class GoldbergMatrix2(GoldbergLaw):
    """Cubic in (J1-3) + volumetric (fibergen.cpp:10719-10770)."""
    m1: float = 0.5
    m2: float = 0.1
    m3: float = 1.0
    m4: float = 5.0

    def w_inv(self, J1, J2, J3):
        x = J1 - 3.0
        return (self.m1 + (self.m2 + self.m3 * x) * x) * x \
            + self.m4 * (J3 + 1.0 / J3 - 2.0)


@dataclasses.dataclass
class GoldbergMatrix3(GoldbergLaw):
    """W = m1 (J1-3) + m2/50 (J3^5 + J3^-5 - 2) (fibergen.cpp:10772-10820)."""
    m1: float = 1.0
    m2: float = 10.0

    def w_inv(self, J1, J2, J3):
        J5 = J3 ** 5
        return self.m1 * (J1 - 3.0) + (self.m2 / 50.0) * (J5 + 1.0 / J5 - 2.0)


@dataclasses.dataclass
class GoldbergMatrix4(GoldbergLaw):
    """Cubic isochoric + stiff J3^5 volumetric (fibergen.cpp:10822-10876)."""
    m1: float = 0.5
    m2: float = 1.0
    m3: float = 3.0
    m4: float = 50.0

    def w_inv(self, J1, J2, J3):
        x = J1 - 3.0
        J5 = J3 ** 5
        return self.m1 * x + self.m2 * x * x + self.m3 * x ** 3 \
            + (self.m4 / 50.0) * (J5 + 1.0 / J5 - 2.0)


@dataclasses.dataclass
class GoldbergFiber1(GoldbergLaw):
    """W = f1 (J1-3) + f2 (J3 + 1/J3 - 2) (fibergen.cpp:10878-10904ff)."""
    f1: float = 10.0
    f2: float = 100.0

    def w_inv(self, J1, J2, J3):
        return self.f1 * (J1 - 3.0) + self.f2 * (J3 + 1.0 / J3 - 2.0)


@dataclasses.dataclass
class GoldbergFiber2(GoldbergLaw):
    """Logarithmic locking law W = -f1 f2/2 ln((f1 + 3 - J1)/f1) + vol
    (fibergen.cpp:10858-10904)."""
    f1: float = 10.0
    f2: float = 2.0
    f3: float = 500.0

    def w_inv(self, J1, J2, J3):
        c = (self.f1 + (3.0 - J1)) / self.f1
        c = jnp.maximum(c, jnp.finfo(J1.dtype).tiny)
        return -0.5 * self.f1 * self.f2 * jnp.log(c) \
            + self.f3 * (J3 + 1.0 / J3 - 2.0)


@dataclasses.dataclass
class GoldbergFiber3(GoldbergLaw):
    """W = f1 J1 + f2 J1^4 + f3 sqrt(J2) + f4 vol (fibergen.cpp:10906-10942)."""
    f1: float = 1.0
    f2: float = 0.02
    f3: float = 100.0
    f4: float = 500.0

    def w_inv(self, J1, J2, J3):
        return self.f1 * J1 + self.f2 * J1 ** 4 \
            + self.f3 * jnp.sqrt(jnp.maximum(J2, jnp.finfo(J1.dtype).tiny)) \
            + self.f4 * (J3 + 1.0 / J3 - 2.0)


@dataclasses.dataclass
class GoldbergFiber4(GoldbergLaw):
    """W = f1 (J1-3) + f2/50 (J3^5 + J3^-5 - 2) (fibergen.cpp:10944-10981)."""
    f1: float = 20.0
    f2: float = 200.0

    def w_inv(self, J1, J2, J3):
        J5 = J3 ** 5
        return self.f1 * (J1 - 3.0) + (self.f2 / 50.0) * (J5 + 1.0 / J5 - 2.0)


@dataclasses.dataclass
class GoldbergFiber5(GoldbergLaw):
    """Exponential stiffening W = f1 (e^{f2 (J1-3)} - 1) + f3 vol
    (fibergen.cpp:10983-11018)."""
    f1: float = 3.5
    f2: float = 2.0
    f3: float = 500.0

    def w_inv(self, J1, J2, J3):
        return self.f1 * (jnp.exp(self.f2 * (J1 - 3.0)) - 1.0) \
            + self.f3 * (J3 + 1.0 / J3 - 2.0)


@dataclasses.dataclass
class GoldbergFiber6(GoldbergLaw):
    """Exponential isochoric + J3^5 volumetric (fibergen.cpp:11020-11087)."""
    f1: float = 3.5
    f2: float = 4.0
    f3: float = 500.0

    def w_inv(self, J1, J2, J3):
        J5 = J3 ** 5
        return self.f1 * (jnp.exp(self.f2 * (J1 - 3.0)) - 1.0) \
            + (self.f3 / 50.0) * (J5 + 1.0 / J5 - 2.0)


GOLDBERG_LAWS = {
    "gb_matrix1": GoldbergMatrix1,
    "gb_matrix2": GoldbergMatrix2,
    "gb_matrix3": GoldbergMatrix3,
    "gb_matrix4": GoldbergMatrix4,
    "gb_fiber1": GoldbergFiber1,
    "gb_fiber2": GoldbergFiber2,
    "gb_fiber3": GoldbergFiber3,
    "gb_fiber4": GoldbergFiber4,
    "gb_fiber5": GoldbergFiber5,
    "gb_fiber6": GoldbergFiber6,
}


# ---------------------------------------------------------------------------
# Anisotropic linear laws
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MatrixLinearAnisotropic(MaterialLaw):
    """Anisotropic conduction/permeability: S = K : E with a full 3x3 matrix
    (MatrixLinearAnisotropicMaterialLaw, fibergen.cpp:11089-11160)."""

    K: np.ndarray  # (3, 3)
    dim: int = 3
    is_linear: bool = True

    def pk1(self, F):
        Kj = jnp.asarray(self.K, F.dtype)
        return jnp.einsum("ij,j...->i...", Kj, F)

    def w(self, F):
        s = self.pk1(F)
        return 0.5 * sum(s[i] * F[i] for i in range(3))

    def dpk1(self, F, W):
        return self.pk1(W)

    def eig_range_const(self):
        e = np.linalg.eigvalsh(0.5 * (self.K + self.K.T))
        return (float(e.min()), float(e.max()))

    def __str__(self):
        return "matrix linear anisotropic"


@dataclasses.dataclass
class LinearTransverselyIsotropic(MaterialLaw):
    """Transversely isotropic elasticity with 5 engineering constants and an
    anisotropy direction (fixed vector a or a per-voxel orientation field)
    (LinearTransverselyIsotropicMaterialLaw, fibergen.cpp:11479-11593):

        S = 2 mu E + lambda tr(E) I + alpha_t (a.E.a) I
            + (alpha_t tr(E) + beta_t (a.E.a)) A + 2 dmu sym(AE + EA),
        A = a x a
    """

    E: float = 1.0
    nu: float = 0.3
    E_a: float = 1.0
    G_a: float = 1.0
    nu_a: float = 0.3
    a: Optional[np.ndarray] = None          # fixed direction, else field
    orientation: object = None              # (3, nx, ny, nz) unit field
    dim: int = 6
    is_linear: bool = True

    def __post_init__(self):
        E, nu, E_a, G_a, nu_ab = self.E, self.nu, self.E_a, self.G_a, self.nu_a
        G = E / (2 * (nu + 1))
        nu_ba = E / E_a * nu_ab
        D = (1 + nu) * (1 - nu - 2 * nu_ab * nu_ba)
        self._alpha = E * (nu_ab * (1 + nu - nu_ba) - nu) / D
        self._beta = (E_a * (1 - nu * nu) - E * (nu + nu_ab * nu_ba)
                      - 2 * E * (nu_ab * (1 + nu - nu_ba) - nu)) / D \
            - 4 * G_a + 2 * G
        self._lam = E * (nu + nu_ab * nu_ba) / D
        self._two_mu = 2 * G
        self._two_dmu = 2 * (G_a - G)

    def _direction(self, F):
        if self.a is not None and np.linalg.norm(self.a) != 0:
            av = np.asarray(self.a, dtype=np.float64)
            av = av / np.linalg.norm(av)
            return [jnp.asarray(av[k], F.dtype) for k in range(3)]
        if self.orientation is None:
            raise ValueError("tiso law needs a direction or orientation field")
        return [self.orientation[k] for k in range(3)]

    def pk1(self, F):
        return jnp.stack(self._stress_terms(F, self._direction(F)))

    def _stress_terms(self, F, a):
        """Namespace-agnostic stress evaluation (works on jnp tracers AND
        plain numpy — the latter is needed by eig_range_const, which may be
        invoked while a jit trace is active and must not stage jnp ops)."""
        a0, a1, a2 = a
        # A = a x a in Voigt [xx, yy, zz, yz, xz, xy]
        A = [a0 * a0, a1 * a1, a2 * a2, a1 * a2, a0 * a2, a0 * a1]
        trE = F[0] + F[1] + F[2]
        w = voigt.weights(6)
        aEa = sum(w[i] * A[i] * F[i] for i in range(6))
        # sym(A E + E A) in Voigt via matrix product of symmetric tensors
        # (AE+EA)_ij = sum_k A_ik E_kj + E_ik A_kj
        Am = [[A[0], A[5], A[4]], [A[5], A[1], A[3]], [A[4], A[3], A[2]]]
        Em = [[F[0], F[5], F[4]], [F[5], F[1], F[3]], [F[4], F[3], F[2]]]

        def prod(i, j):
            return sum(Am[i][k] * Em[k][j] + Em[i][k] * Am[k][j]
                       for k in range(3))

        AE = [prod(0, 0), prod(1, 1), prod(2, 2),
              0.5 * (prod(1, 2) + prod(2, 1)),
              0.5 * (prod(0, 2) + prod(2, 0)),
              0.5 * (prod(0, 1) + prod(1, 0))]

        c_I = self._lam * trE + self._alpha * aEa
        c_A = self._alpha * trE + self._beta * aEa
        out = []
        for i in range(6):
            t = self._two_mu * F[i] + c_A * A[i] + 0.5 * self._two_dmu * AE[i]
            if i < 3:
                t = t + c_I
            out.append(t)
        return out

    def w(self, F):
        s = self.pk1(F)
        w = voigt.weights(6)
        return 0.5 * sum(w[i] * s[i] * F[i] for i in range(6))

    def dpk1(self, F, W):
        return self.pk1(W)

    def eig_range_const(self):
        # conservative: eigenvalues of the 6x6 Voigt matrix for a = e_z,
        # computed in pure numpy so this is safe inside an active jit trace
        C = np.zeros((6, 6))
        eye = np.eye(6)
        for j in range(6):
            col = self._stress_terms(eye[j], (0.0, 0.0, 1.0))
            C[:, j] = np.asarray(col, dtype=np.float64)
        e = np.linalg.eigvalsh(0.5 * (C + C.T))
        return (float(e.min()), float(e.max()))

    def __str__(self):
        return (f"linear transversely isotropic lambda={self._lam:g} "
                f"mu={0.5*self._two_mu:g}")
