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
        if len(phases) != 2:
            raise ValueError("laminate mixing requires exactly 2 phases")
        self.normals = normals

    # ----------------------------------------------------------- internals
    def _fractions(self):
        c1 = self.phases[0].phi
        c2 = self.phases[1].phi
        return c1, c2

    def _interface_mask(self):
        c1, _ = self._fractions()
        return (c1 > _THR) & (c1 < 1.0 - _THR)

    def _phase_strains(self, F):
        """Solve for the jump and return (F1, F2, mask)."""
        if self.normals is None:
            raise ValueError("laminate mixing requires a normals field")
        law1, law2 = self.phases[0].law, self.phases[1].law
        c1, c2 = self._fractions()
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

        if dim == 3:
            # scalar jump along n (closed form)
            k1 = law1.mu
            k2 = law2.mu
            ng = (n * F).sum(0)
            s = -(k2 - k1) * ng / (c1 * k2 + c2 * k1)
            s = jnp.where(mask, s, 0.0)
            F1 = F - (c2 * s)[None] * n
            F2 = F + (c1 * s)[None] * n
            return F1, F2, mask

        B = _sym_dyad_basis(n, dim)
        eye = jnp.eye(3, dtype=F.dtype)

        def newton_step(a):
            """One Newton step of the traction-equilibrium energy min
            (the reference's per-voxel Newton, fibergen.cpp:13104-13470,
            vectorized over all voxels at once):
                g_k = (P2(F2) - P1(F1)) : B_k
                K_kl = c2 B_k : C1(F1) : B_l + c1 B_k : C2(F2) : B_l
            (common c1*c2 factor cancelled)."""
            jump = sum(a[..., k][None] * B[k] for k in range(3))
            F1 = F - c2[None] * jump
            F2 = F + c1[None] * jump
            dP = law2.pk1(F2) - law1.pk1(F1)
            g = jnp.stack([(dP * w * Bk).sum(0) for Bk in B], axis=-1)
            C1B = [law1.dpk1(F1, Bk) for Bk in B]
            C2B = [law2.dpk1(F2, Bk) for Bk in B]
            K = jnp.stack([
                jnp.stack([
                    (B[k] * w * (c2[None] * C1B[l] + c1[None] * C2B[l])).sum(0)
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
        F1 = F - c2[None] * jump
        F2 = F + c1[None] * jump
        return F1, F2, mask

    # ------------------------------------------------------------- API
    def pk1(self, F):
        law1, law2 = self.phases[0].law, self.phases[1].law
        c1, c2 = self._fractions()
        F1, F2, _ = self._phase_strains(F)
        return c1[None] * law1.pk1(F1) + c2[None] * law2.pk1(F2)

    def w(self, F):
        law1, law2 = self.phases[0].law, self.phases[1].law
        c1, c2 = self._fractions()
        F1, F2, _ = self._phase_strains(F)
        return c1 * law1.w(F1) + c2 * law2.w(F2)

    def dpk1(self, F, W):
        # exact consistent tangent through the per-voxel solve
        return jax.jvp(self.pk1, (F,), (W,))[1]
