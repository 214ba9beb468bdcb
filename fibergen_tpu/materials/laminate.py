"""Laminate (interface-aware) composite-voxel mixing.

TPU-native equivalent of LaminateMixedMaterialLaw (fibergen.cpp:13086-13736):
interface voxels (0 < phi < 1) are treated as a rank-1 laminate along the
interface normal n.  The phase strains are

    F1 = Fbar - c2 * sym(a x n),   F2 = Fbar + c1 * sym(a x n)

with the jump vector a minimizing the mixed energy
W(a) = c1 W1(F1) + c2 W2(F2) (traction continuity across the interface).
The reference solves a per-voxel Newton with backtracking; for linear laws
the minimization is an exact per-voxel 3x3 linear solve, vectorized over the
whole grid with jnp.linalg.solve — no iteration, no per-voxel dispatch.

For scalar (heat/porous) laws the jump reduces to a scalar along n with the
closed form s = -(k2-k1)(n.g)/(c1 k2 + c2 k1).

dPK1 comes from jax.jvp through the whole solve (exact tangent; the
reference's 'tangent' option ambiguity disappears).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core import voigt
from .mixing import MixedMaterial, Phase

_THR = 1e-7  # interface detection threshold (10*eps in the reference)


def _top2_phases(phases):
    """Per-voxel indices and renormalized fractions of the two
    largest-volume-fraction phases (the reference walks the phase list per
    voxel and uses the <=2 with phi > 0, fibergen.cpp:12186-12209)."""
    phis = jnp.stack([p.phi for p in phases])
    order = jnp.argsort(-phis, axis=0)
    i1, i2 = order[0], order[1]
    c1 = jnp.take_along_axis(phis, i1[None], 0)[0]
    c2 = jnp.take_along_axis(phis, i2[None], 0)[0]
    tot = jnp.maximum(c1 + c2, _THR)
    return i1, i2, c1 / tot, c2 / tot


class _FieldIso:
    """Linear isotropic law with PER-VOXEL moduli fields, used as the
    virtual phase law of the n-phase laminate selection.  Moduli follow the
    iso_moduli() convention C = 2 mu Id + lam I(x)I (for dim 3 this makes
    pk1 = 2 mu F = conductivity * F)."""

    is_linear = True

    def __init__(self, mu, lam, dim):
        self._mu = mu
        self._lam = lam
        self._dim = dim

    def iso_moduli(self):
        return (self._mu, self._lam)

    def pk1(self, F):
        out = 2.0 * self._mu[None] * F
        if self._dim >= 6:
            tr = self._lam * (F[0] + F[1] + F[2])
            out = out.at[0:3].add(tr[None])
        return out

    def dpk1(self, F, W):
        return self.pk1(W)

    def w(self, F):
        s = self.pk1(F)
        wts = voigt.weights(self._dim)
        return 0.5 * sum(wts[i] * s[i] * F[i] for i in range(self._dim))


def _sym_dyad_basis(n, dim):
    """B_k = sym(e_k x n) as Voigt fields, k = 0..2.

    n: (3, nx, ny, nz) -> returns list of 3 arrays (dim, nx, ny, nz)."""
    n0, n1, n2 = n[0], n[1], n[2]
    z = jnp.zeros_like(n0)
    if dim == 6:
        # components [xx, yy, zz, yz, xz, xy]
        B0 = jnp.stack([n0, z, z, z, 0.5 * n2, 0.5 * n1])
        B1 = jnp.stack([z, n1, z, 0.5 * n2, z, 0.5 * n0])
        B2 = jnp.stack([z, z, n2, 0.5 * n1, 0.5 * n0, z])
        return [B0, B1, B2]
    if dim == 9:
        # full a x n: [xx, yy, zz, yz, xz, xy, zy, zx, yx], (a x n)_ij = a_i n_j
        B0 = jnp.stack([n0, z, z, z, n2, n1, z, z, z])
        B1 = jnp.stack([z, n1, z, n2, z, z, z, z, n0])
        B2 = jnp.stack([z, z, n2, z, z, z, n1, n0, z])
        return [B0, B1, B2]
    raise ValueError(f"no jump basis for dim {dim}")


class LaminateMixed(MixedMaterial):
    """Two-phase laminate mixing.  Requires a ``normals`` field (3, nx,ny,nz)
    pointing from phase 2 into phase 1 (the discretizer's outward fiber
    normal)."""

    rule = "laminate"

    def __init__(self, phases: List[Phase], dim: int = 6, normals=None):
        super().__init__(phases, dim=dim)
        if len(phases) < 2:
            raise ValueError("laminate mixing requires at least 2 phases")
        if len(phases) > 2:
            # n declared phases: per voxel only the two largest-phi phases
            # participate (the reference's get_mix walks the phases and
            # throws when more than two have phi > 0 at a voxel,
            # fibergen.cpp:12186-12209); gathering per-voxel moduli needs
            # isotropic laws
            for p in phases:
                if not (getattr(p.law, "is_linear", False)
                        and hasattr(p.law, "iso_moduli")):
                    raise ValueError(
                        "laminate mixing with more than 2 phases requires "
                        "linear isotropic laws")
        self.normals = normals

    def _two_phase_view(self):
        """(law1, law2, c1, c2): the two per-voxel active phases.  With two
        declared phases these are the phases themselves (general laws
        supported); with more, the two largest-phi phases are gathered per
        voxel into virtual isotropic laws with field moduli and the
        fractions renormalized to c1 + c2 = 1."""
        if len(self.phases) == 2:
            return (self.phases[0].law, self.phases[1].law,
                    self.phases[0].phi, self.phases[1].phi)
        i1, i2, c1, c2 = _top2_phases(self.phases)
        mo = [p.law.iso_moduli() for p in self.phases]
        mu_vec = jnp.asarray([m[0] for m in mo], c1.dtype)
        lam_vec = jnp.asarray([m[1] for m in mo], c1.dtype)
        law1 = _FieldIso(mu_vec[i1], lam_vec[i1], self._dim)
        law2 = _FieldIso(mu_vec[i2], lam_vec[i2], self._dim)
        return law1, law2, c1, c2

    def _jump_coeffs(self):
        """(alpha1, alpha2): the phase strains are F1 = F - alpha1 * jump,
        F2 = F + alpha2 * jump.  The rank-1 laminate uses (c2, c1), which
        preserves the volume average c1 F1 + c2 F2 = F."""
        c1, c2 = self._fractions()
        return c2, c1

    # ----------------------------------------------------------- internals
    def _fractions(self):
        _, _, c1, c2 = self._two_phase_view()
        return c1, c2

    def _interface_mask(self):
        c1, c2 = self._fractions()
        return (c1 > _THR) & (c2 > _THR)

    def _phase_strains(self, F):
        """Solve for the jump and return (F1, F2, mask)."""
        if self.normals is None:
            raise ValueError("laminate mixing requires a normals field")
        law1, law2, c1, c2 = self._two_phase_view()
        mask = self._interface_mask()
        n = self.normals
        # guard degenerate (zero) normals: substitute e_x there so the jump
        # solve stays regular; the result is only consumed where `mask` holds,
        # and interface voxels always carry a real normal after rasterization
        nn2 = (n * n).sum(0, keepdims=True)
        ex = jnp.zeros_like(n).at[0].set(1.0)
        n = jnp.where(nn2 > 1e-12, n, ex)
        dim = self._dim
        w = jnp.asarray(voigt.weights(dim), F.dtype).reshape(-1, 1, 1, 1)

        a1, a2 = self._jump_coeffs()

        if dim == 3:
            # scalar jump along n: minimize c1 k1 |F1|^2 + c2 k2 |F2|^2 over
            # s with F1 = F - a1 s n, F2 = F + a2 s n (closed form);
            # conductivity k = 2 * iso mu (ScalarLinearIsotropic.iso_moduli)
            k1 = 2.0 * law1.iso_moduli()[0]
            k2 = 2.0 * law2.iso_moduli()[0]
            ng = (n * F).sum(0)
            s = (c1 * a1 * k1 - c2 * a2 * k2) * ng / (
                c1 * a1 * a1 * k1 + c2 * a2 * a2 * k2)
            s = jnp.where(mask, s, 0.0)
            F1 = F - (a1 * s)[None] * n
            F2 = F + (a2 * s)[None] * n
            return F1, F2, mask

        B = _sym_dyad_basis(n, dim)
        eye = jnp.eye(3, dtype=F.dtype)

        def newton_step(a):
            """One Newton step of the energy minimization over the jump a
            (the reference's per-voxel Newton, fibergen.cpp:13104-13470 and
            13753-14040, vectorized over all voxels at once).  With
            F1 = F - a1 jump, F2 = F + a2 jump and W = c1 W1 + c2 W2:
                g_k  = (c2 a2 P2(F2) - c1 a1 P1(F1)) : B_k
                K_kl = B_k : (c1 a1^2 C1(F1) + c2 a2^2 C2(F2)) : B_l
            (for the rank-1 coefficients (a1,a2)=(c2,c1) this reduces to the
            reference's cancelled form g ~ (P2-P1):B)."""
            jump = sum(a[..., k][None] * B[k] for k in range(3))
            F1 = F - a1[None] * jump
            F2 = F + a2[None] * jump
            dP = (c2 * a2)[None] * law2.pk1(F2) - (c1 * a1)[None] * law1.pk1(F1)
            g = jnp.stack([(dP * w * Bk).sum(0) for Bk in B], axis=-1)
            C1B = [law1.dpk1(F1, Bk) for Bk in B]
            C2B = [law2.dpk1(F2, Bk) for Bk in B]
            K = jnp.stack([
                jnp.stack([
                    (B[k] * w * ((c1 * a1 * a1)[None] * C1B[l]
                                 + (c2 * a2 * a2)[None] * C2B[l])).sum(0)
                    for l in range(3)], axis=-1)
                for k in range(3)], axis=-2)
            # regularize non-interface voxels (K would be ~0 there)
            K = jnp.where(mask[..., None, None], K, eye)
            g = jnp.where(mask[..., None], g, 0.0)
            da = jnp.linalg.solve(K, -g[..., None])[..., 0]
            # guard: keep the previous iterate where the local solve blew up
            # (e.g. det F <= 0 under an aggressive trial jump)
            ok = jnp.isfinite(da).all(axis=-1, keepdims=True)
            return jnp.where(ok, a + da, a)

        a = newton_step(jnp.zeros(mask.shape + (3,), F.dtype))
        if not (getattr(law1, "is_linear", False)
                and getattr(law2, "is_linear", False)):
            # nonlinear laws: continue the Newton to convergence (for linear
            # laws the first step is already exact).  A fixed iteration count
            # keeps the program jit-static; quadratic convergence makes 7
            # further steps ample at moderate strain.
            a = jax.lax.fori_loop(0, 7, lambda i, a: newton_step(a), a)

        jump = sum(a[..., k][None] * B[k] for k in range(3))
        F1 = F - a1[None] * jump
        F2 = F + a2[None] * jump
        return F1, F2, mask

    # ------------------------------------------------------------- API
    def pk1(self, F):
        law1, law2, c1, c2 = self._two_phase_view()
        F1, F2, _ = self._phase_strains(F)
        return c1[None] * law1.pk1(F1) + c2[None] * law2.pk1(F2)

    def w(self, F):
        law1, law2, c1, c2 = self._two_phase_view()
        F1, F2, _ = self._phase_strains(F)
        return c1 * law1.w(F1) + c2 * law2.w(F2)

    def dpk1(self, F, W):
        # exact consistent tangent through the per-voxel solve
        return jax.jvp(self.pk1, (F,), (W,))[1]


class InfinityLaminateMixed(LaminateMixed):
    """Infinity-laminate mixing (InfinityLaminateMixedMaterialLaw,
    fibergen.cpp:13737-14067): identical energy minimization over the jump
    vector, but with fixed half-weights q1 = q2 = 1/2 on the jump
    distribution (F1 = F + q2 a x n, F2 = F - q1 a x n in the reference's
    sign convention) instead of the volume-average-preserving (c2, c1).
    Like the reference, exactly two phases are supported
    (fibergen.cpp:12186-12209, get_mix throws otherwise)."""

    rule = "infinity_laminate"

    def _jump_coeffs(self):
        c1, _ = self._fractions()
        half = jnp.full_like(c1, 0.5)
        return half, half


def _rot_to_e1(n):
    """Vectorized rotation matrices R with R n = e1 (Tensor3x3::rot,
    fibergen.cpp:9232-9266, Rodrigues form).  n: (3, nx, ny, nz) unit
    vectors -> (nx, ny, nz, 3, 3)."""
    nx_, ny_, nz_ = n[0], n[1], n[2]
    c = nx_  # n . e1
    # v = n x e1 = (0, nz, -ny)
    v0 = jnp.zeros_like(nx_)
    v1 = nz_
    v2 = -ny_
    eye = jnp.eye(3, dtype=n.dtype)
    V = jnp.stack([
        jnp.stack([v0, -v2, v1], -1),
        jnp.stack([v2, v0, -v0], -1),
        jnp.stack([-v1, v0, v0], -1),
    ], -2)
    denom = jnp.where(1.0 + c > 1e-8, 1.0 + c, 1.0)
    R = eye + V + (V @ V) / denom[..., None, None]
    # n ~ -e1: rotation by pi about e2 maps -e1 -> e1
    R_pi = jnp.asarray(np.diag([-1.0, 1.0, -1.0]), n.dtype)
    return jnp.where((1.0 + c <= 1e-8)[..., None, None], R_pi, R)


class FluidityMixed(MixedMaterial):
    """Fluidity (viscosity dual) interface mixing
    (FluidityMixedMaterialLaw, fibergen.cpp:14068-14213): the stored field
    holds stresses; in the frame rotated so the interface normal n maps to
    e_x, the diagonal and the in-plane (yz) shear components mix with the
    harmonic (Reuss) fluidity f_R = 1/(c1/f1 + c2/f2) while the
    normal-involving shears (xz, xy) mix with the arithmetic (Voigt)
    fluidity f_V = c1 f1 + c2 f2:

        gamma = R^T Fx(R sigma R^T) R

    Exactly two scalar-isotropic phases are supported, like the reference
    (fibergen.cpp:14089-14125)."""

    rule = "fluidity"

    def __init__(self, phases: List[Phase], dim: int = 6, normals=None):
        super().__init__(phases, dim=dim)
        if len(phases) < 2:
            raise ValueError("fluidity mixing requires at least 2 phases")
        if dim != 6:
            raise ValueError("fluidity mixing requires dim 6 (viscosity)")
        for p in phases:
            if not hasattr(p.law, "mu"):
                raise ValueError("fluidity mixing requires scalar-isotropic "
                                 "laws (fibergen.cpp:14120-14125)")
        self.normals = normals

    def _select(self):
        """Per-voxel two active phases (f1, f2, c1, c2); with two declared
        phases this is just their (fluidity, phi) pairs."""
        if len(self.phases) == 2:
            return (self.phases[0].law.mu, self.phases[1].law.mu,
                    self.phases[0].phi, self.phases[1].phi)
        i1, i2, c1, c2 = _top2_phases(self.phases)
        f_vec = jnp.asarray([p.law.mu for p in self.phases], c1.dtype)
        return f_vec[i1], f_vec[i2], c1, c2

    def pk1(self, F):
        if self.normals is None:
            raise ValueError("fluidity mixing requires a normals field")
        f1, f2, c1, c2 = self._select()
        mask = (c1 > _THR) & (c2 > _THR)

        n = self.normals
        nn2 = (n * n).sum(0, keepdims=True)
        ex = jnp.zeros_like(n).at[0].set(1.0)
        n = jnp.where(nn2 > 1e-12, n / jnp.sqrt(jnp.maximum(nn2, 1e-30)), ex)

        f_R = 1.0 / (c1 / f1 + c2 / f2)
        f_V = c1 * f1 + c2 * f2

        # sigma as (..., 3, 3) from the Voigt-6 stored field
        s0, s1, s2, s3, s4, s5 = F[0], F[1], F[2], F[3], F[4], F[5]
        sig = jnp.stack([
            jnp.stack([s0, s5, s4], -1),
            jnp.stack([s5, s1, s3], -1),
            jnp.stack([s4, s3, s2], -1),
        ], -2)

        R = _rot_to_e1(n)
        sp = R @ sig @ jnp.swapaxes(R, -1, -2)
        # apply Fx in the rotated frame (fibergen.cpp:14148-14158)
        scale = jnp.stack([
            jnp.stack([f_R, f_V, f_V], -1),
            jnp.stack([f_V, f_R, f_R], -1),
            jnp.stack([f_V, f_R, f_R], -1),
        ], -2)
        spp = sp * scale
        gam = jnp.swapaxes(R, -1, -2) @ spp @ R

        mixed = jnp.stack([
            gam[..., 0, 0], gam[..., 1, 1], gam[..., 2, 2],
            gam[..., 1, 2], gam[..., 0, 2], gam[..., 0, 1],
        ])
        # pure voxels: per-voxel dominant-phase fluidity
        pure = (c1 * f1 + c2 * f2)[None] * F
        return jnp.where(mask[None], mixed, pure)

    def w(self, F):
        wts = jnp.asarray(voigt.weights(6), F.dtype).reshape(-1, 1, 1, 1)
        return 0.5 * (self.pk1(F) * wts * F).sum(0)

    def dpk1(self, F, W):
        return self.pk1(W)  # linear map
