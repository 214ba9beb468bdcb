"""Phase containers and composite-voxel mixing rules.

Equivalent of PhaseBase + MixedMaterialLaw* (fibergen.cpp:12004-14342).
Phases hold per-voxel volume-fraction fields phi (nx, ny, nz); the mixing
rule defines the effective per-voxel constitutive response where
0 < phi < 1.  All rules are expressed as fused field operations (no
per-voxel dispatch): the Voigt rule is a phi-weighted sum of phase stresses;
for all-isotropic phase sets the effective per-voxel moduli are formed once
and a single isotropic kernel is applied (cheaper on TPU: 2 reads/1 write).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import fields, voigt
from . import laws as lawsmod


@dataclasses.dataclass
class Phase:
    """Per-phase state: name, law, volume-fraction field
    (PhaseBase, fibergen.cpp:12004-12062)."""

    name: str
    law: lawsmod.MaterialLaw
    phi: Optional[jnp.ndarray] = None  # (nx, ny, nz)
    index: int = 0

    @property
    def vol(self):
        return float(self.phi.mean()) if self.phi is not None else 0.0


class MixedMaterial:
    """Base mixed material over phases (MixedMaterialLawBase,
    fibergen.cpp:12067-12143)."""

    rule = "voigt"
    # True when pk1 equals the _all_iso()-mixed isotropic law (enables the
    # fused stress_diff fast path)
    _iso_linear = False

    def __init__(self, phases: List[Phase], dim: int = 6):
        self._dim = dim
        self.phases = []
        for p in phases:
            self.add_phase(p)

    def add_phase(self, phase: Phase):
        phase.index = len(self.phases)
        self.phases.append(phase)

    @property
    def dim(self):
        return self._dim

    # -- field-argument plumbing -------------------------------------------
    # The solvers pass all array-valued material state (phi fields, cached
    # moduli planes, normals, orientation fields) as explicit jit arguments
    # instead of closure constants: closure constants are serialized into
    # every compiled program (one copy PER KERNEL, fatal for 512^3 fields
    # through a remote-compile tunnel) while arguments are passed by
    # reference.  `fields()` snapshots the state, `bound(values)` swaps the
    # (traced) values in for the duration of a trace.

    def _constituents(self):
        """Materials whose attributes participate in slots (overridden by
        wrappers/composites)."""
        return [self]

    def field_slots(self):
        """Stable list of (obj, attr) pairs holding array pytrees."""
        slots = []
        seen = set()
        for m in self._constituents():
            for p in m.phases:
                if id(p) not in seen and p.phi is not None:
                    seen.add(id(p))
                    slots.append((p, "phi"))
            for p in m.phases:
                law = p.law
                if (id(law) not in seen
                        and getattr(law, "orientation", None) is not None):
                    seen.add(id(law))
                    slots.append((law, "orientation"))
            if getattr(m, "normals", None) is not None and (id(m), "normals") not in seen:
                seen.add((id(m), "normals"))
                slots.append((m, "normals"))
            if getattr(m, "_iso_key", None) is not None:
                slots.append((m, "_iso_val"))
        return slots

    def fields(self):
        """Current array state as a pytree (pass as the kernels' mf arg)."""
        return tuple(getattr(o, a) for o, a in self.field_slots())

    def drop_phi(self):
        """Free the per-phase volume-fraction fields' HBM, keeping only the
        cached mixed moduli (mu(x), lam(x)).

        Huge-grid memory headroom for all-isotropic-linear materials: the
        solve path (stress_diff, pk1, eig_range, mean_pk1) reads the mixed
        moduli only, so phi is dead weight — one full scalar field per
        phase (0.5 GB each at 512^3 f32).  Phase statistics and re-mixing
        become unavailable until phi is reassigned.  No reference analogue:
        the reference keeps phi resident (fibergen.cpp:12004-12062); this
        exists because HBM, unlike host RAM, is the binding constraint."""
        if self._all_iso() is None:
            raise ValueError("drop_phi requires all-isotropic linear phases")
        self._phi_dropped = True
        for p in self.phases:
            p.phi = None

    def bound(self, values):
        """Context manager: substitute `values` (same structure as
        `fields()`) into the material while tracing a kernel."""
        return _BoundFields(self, values)

    # -- per-field constitutive API ---------------------------------------
    def pk1(self, F):
        raise NotImplementedError

    def w(self, F):
        raise NotImplementedError

    def dpk1(self, F, W):
        raise NotImplementedError

    def mean_pk1(self, F):
        """<P(F)> over voxels (meanPK1, fibergen.cpp:12312)."""
        return fields.mean(self.pk1(F))

    def mean_w(self, F):
        """<W(F)> over voxels (meanW, fibergen.cpp:12239)."""
        return self.w(F).mean()

    def mean_cauchy(self, F):
        if self._dim != 9:
            return self.mean_pk1(F)
        # push forward per voxel then average (component arithmetic: a
        # voxel-trailing (..., 3, 3) layout pads 3x3 tiles to 4x128 on TPU)
        F = jnp.asarray(F)
        return fields.mean(lawsmod.cauchy_from_pk1_comp(self.pk1(F), F))

    def polarization(self, mu_0, F, inv=False):
        """Eyre-Milton transform; pure voxels use the phase law
        (fibergen.cpp:12087-12099).  Only valid for sharp (0/1) phase fields
        of isotropic laws: applies each phase transform phi-weighted."""
        out = jnp.zeros_like(F)
        for p in self.phases:
            out = out + p.phi[None] * p.law.polarization(mu_0, F, inv)
        return out

    def stress_diff(self, F, mu_0, lambda_0):
        """(C - C0) : F in one fused pass (calcStressDiff, fibergen.cpp:18030):
        for all-isotropic phases the moduli shift folds into the mixed
        coefficients so the hot kernel reads F + 2 moduli planes once.

        The fast path only applies to rules whose response IS the iso-mixed
        law (voigt/reuss); selector rules fall back to the generic form."""
        iso = self._all_iso() if self._iso_linear else None
        if iso is not None and self._dim != 9:
            mu_x, lam_x = iso
            two_dmu = 2.0 * (mu_x - mu_0)
            if self._dim >= 6:
                ltr = (lam_x - lambda_0) * (F[0] + F[1] + F[2])
                return jnp.stack([
                    two_dmu * F[0] + ltr, two_dmu * F[1] + ltr,
                    two_dmu * F[2] + ltr]
                    + [two_dmu * F[k] for k in range(3, self._dim)])
            return two_dmu[None] * F
        tau = self.pk1(F) - 2.0 * mu_0 * F
        if self._dim >= 6 and lambda_0 != 0.0:
            tr = lambda_0 * (F[0] + F[1] + F[2])
            tau = tau.at[0:3].add(-tr)
        return tau

    # -- reference material -------------------------------------------------
    def eig_range(self, F, zero_trace=False):
        """Per-voxel eigenvalue bounds of dPK1, reduced over the grid
        (getRefMaterial, fibergen.cpp:12153-12236).  Returns (lmin, lmax)
        as jnp scalars."""
        iso = self._all_iso()
        if iso is not None:
            mu_x, lam_x = iso
            if self._dim == 3:
                # scalar laws: dPK1 = mu(x) * I3
                m = 2.0 * mu_x
                return m.min(), m.max()
            e1 = 2.0 * mu_x
            # dropping row/col 0 (zero_trace, viscosity) leaves eigenvalues
            # {2mu, 2mu + 2lam} of the reduced 5x5 block; the full matrix has
            # {2mu, 2mu + 3lam}
            e2 = 2.0 * mu_x + (2.0 if zero_trace else 3.0) * lam_x
            lo = jnp.minimum(e1, e2)
            hi = jnp.maximum(e1, e2)
            return lo.min(), hi.max()

        # generic linear laws: conservative bounds from the phase constants
        los, his = [], []
        for p in self.phases:
            r = p.law.eig_range_const()
            if r is None:
                return self._eig_range_nonlinear(F, zero_trace)
            los.append(r[0]); his.append(r[1])
        return jnp.asarray(min(los)), jnp.asarray(max(his))

    def _eig_range_nonlinear(self, F, zero_trace):
        """Exact per-voxel eigenvalue bounds of the 9x9 tangent for
        hyperelastic laws, via batched eigvalsh (replaces the reference's
        per-voxel LAPACK syev loop, fibergen.cpp:12472-12530).

        The voxel-trailing (..., 9, 9) layout pads to (16, 128) TPU tiles
        (a 14x footprint blowup: a full-grid 256^3 tangent would be tens of
        GB), so the grid is flattened and processed in fixed-size voxel
        chunks under ``lax.map`` — peak HBM is one chunk's padded tangent,
        independent of grid size.  The chunked fast path requires the
        per-voxel tangent to be the phi-weighted phase sum (the voigt rule,
        MixedMaterialLaw::getRefMaterial's arithmetic mean); other rules
        keep the full-grid path (their grids are small in practice)."""
        dim = self._dim
        if self.rule == "voigt":
            return self._eig_range_nonlinear_chunked(F, zero_trace)
        eye = jnp.eye(dim, dtype=F.dtype)
        # build tangent columns by jvp in unit directions
        cols = []
        for j in range(dim):
            W = jnp.broadcast_to(eye[j].reshape(dim, 1, 1, 1), F.shape)
            cols.append(self.dpk1(F, W))
        Cmat = jnp.stack(cols, axis=1)            # (dim, dim, nx, ny, nz)
        Cmat = jnp.moveaxis(Cmat, (0, 1), (-2, -1))
        Cmat = 0.5 * (Cmat + jnp.swapaxes(Cmat, -1, -2))
        if zero_trace:
            Cmat = Cmat[..., 1:, 1:]
        e = jnp.linalg.eigvalsh(Cmat)
        return e.min(), e.max()

    def _eig_flat(self, Ff, pf, zero_trace, chunk=65536):
        """Tangent eigen min/max over flat voxels: Ff (dim, n), pf
        (n_phases, n); n must be a multiple of ``chunk`` (or smaller than
        it).  Shared by the single-program chunked path and the host-split
        large-grid path."""
        dim = self._dim
        n = Ff.shape[1]
        ch = min(chunk, n)
        nch = n // ch
        Fc = jnp.moveaxis(Ff.reshape(dim, nch, ch), 1, 0)          # (nch, dim, ch)
        pc = jnp.moveaxis(pf.reshape(pf.shape[0], nch, ch), 1, 0)
        eye = jnp.eye(dim, dtype=Ff.dtype)

        def one(args):
            Fk, pk = args
            cols = []
            for j in range(dim):
                W = jnp.broadcast_to(eye[j].reshape(dim, 1), Fk.shape)
                col = None
                for i, p in enumerate(self.phases):
                    t = pk[i][None] * p.law.dpk1(Fk, W)
                    col = t if col is None else col + t
                cols.append(col)
            C = jnp.stack(cols, axis=1)            # (dim, dim, ch)
            C = jnp.moveaxis(C, -1, 0)             # (ch, dim, dim)
            C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
            if zero_trace:
                C = C[:, 1:, 1:]
            e = jnp.linalg.eigvalsh(C)
            return e.min(), e.max()

        mins, maxs = jax.lax.map(one, (Fc, pc))
        return mins.min(), maxs.max()

    def _eig_range_nonlinear_chunked(self, F, zero_trace, chunk=65536):
        """Voigt-rule tangent eigen bounds in flat voxel chunks (see
        _eig_range_nonlinear).  Chunk padding repeats leading voxels, which
        cannot move a min/max."""
        dim = self._dim
        nvox = int(np.prod(F.shape[1:]))
        ch = min(chunk, nvox)
        Ff = F.reshape(dim, nvox)
        phis = jnp.stack([
            jnp.broadcast_to(p.phi, F.shape[1:]).reshape(nvox).astype(F.dtype)
            for p in self.phases])
        pad = (-nvox) % ch
        if pad:
            Ff = jnp.concatenate([Ff, Ff[:, :pad]], axis=1)
            phis = jnp.concatenate([phis, phis[:, :pad]], axis=1)
        return self._eig_flat(Ff, phis, zero_trace, chunk=ch)

    # Largest voxel count the single-program eigvalsh pass may handle: one
    # 256^3 (16.7M voxel) lax.map-of-eigvalsh program crashed the TPU worker
    # through the axon tunnel, while 128^3 (2.1M) is fine.
    HOST_EIG_VOX = 1 << 21

    def needs_host_eig(self, F) -> bool:
        """True when eig_range(F) would run the chunked eigvalsh pass on a
        grid too large for one device program (see HOST_EIG_VOX).  Callers
        (LSSolver.calc_ref_material) then use eig_range_host instead."""
        if self.rule != "voigt":
            return False
        if int(np.prod(F.shape[1:])) <= self.HOST_EIG_VOX:
            return False
        if self._all_iso() is not None:
            return False
        return any(p.law.eig_range_const() is None for p in self.phases)

    def eig_range_host(self, F, zero_trace=False):
        """Large-grid nonlinear eig_range split across several SHORT device
        programs (getRefMaterial, fibergen.cpp:12153-12236, for the
        hyperelastic case).  One compiled slice program is reused over
        shifted windows (the window start is a traced scalar), chaining the
        running (lmin, lmax) through device scalars so the host syncs once
        at the end.  The tail window overlaps the previous one — repeated
        voxels cannot move a min/max."""
        dim = self._dim
        nvox = int(np.prod(F.shape[1:]))
        V = min(self.HOST_EIG_VOX, nvox)
        cache = getattr(self, "_eig_host_cache", None)
        if cache is None:
            cache = self._eig_host_cache = {}
        key = (bool(zero_trace), V)
        if key not in cache:
            def prep(F, phis):
                Ff = F.reshape(dim, -1)
                pf = jnp.stack([
                    jnp.broadcast_to(ph, F.shape[1:]).reshape(-1).astype(F.dtype)
                    for ph in phis])
                # initial running bounds built on-device here (an eager
                # jnp scalar would remote-compile its own tiny program
                # through the axon tunnel)
                return (Ff, pf, jnp.asarray(jnp.inf, F.dtype),
                        jnp.asarray(-jnp.inf, F.dtype))

            def slice_prog(Ff, pf, start, lmin, lmax):
                Fk = jax.lax.dynamic_slice(Ff, (0, start), (dim, V))
                pk = jax.lax.dynamic_slice(pf, (0, start), (pf.shape[0], V))
                lo, hi = self._eig_flat(Fk, pk, zero_trace)
                return jnp.minimum(lmin, lo), jnp.maximum(lmax, hi)

            cache[key] = (jax.jit(prep), jax.jit(slice_prog))
        prep, slice_prog = cache[key]
        Ff, pf, lmin, lmax = prep(F, [p.phi for p in self.phases])
        starts = list(range(0, nvox - V + 1, V))
        if starts[-1] != nvox - V:
            starts.append(nvox - V)
        for s in starts:
            lmin, lmax = slice_prog(Ff, pf, s, lmin, lmax)
        return lmin, lmax

    def _all_iso(self):
        """If every phase law exposes iso_moduli, return per-voxel
        (mu(x), lam(x)) fields, else None.  The fields are cached (keyed on
        the phi arrays) so the hot stress kernel reads 2 moduli planes
        instead of re-mixing n_phases phi fields every iteration."""
        phis = [p.phi for p in self.phases]
        key = getattr(self, "_iso_key", None)
        if key is not None and (
                getattr(self, "_bound_active", False)
                or getattr(self, "_phi_dropped", False)
                or (len(key) == len(phis)
                    and all(a is b for a, b in zip(key, phis)))):
            return self._iso_val
        mus, lams = [], []
        for p in self.phases:
            f = getattr(p.law, "iso_moduli", None)
            if f is None:
                return None
            mu, lam = f()
            mus.append(mu); lams.append(lam)
        mu_x = sum(p.phi * m for p, m in zip(self.phases, mus))
        lam_x = sum(p.phi * l for p, l in zip(self.phases, lams))
        # only cache values computed OUTSIDE a jit trace (omnistaging makes
        # in-trace results tracers, which must not escape)
        from jax._src import core as _jax_core
        if _jax_core.trace_state_clean():
            self._iso_key = phis
            self._iso_val = (mu_x, lam_x)
        return mu_x, lam_x

    def __str__(self):
        return f"{self.rule} mixed ({len(self.phases)} phases)"


class VoigtMixed(MixedMaterial):
    """Arithmetic (Voigt) stress averaging: P = sum_p phi_p P_p(F)
    (VoigtMixedMaterialLaw, fibergen.cpp:12729-12777).

    For all-isotropic phase sets this collapses to a single isotropic kernel
    with effective per-voxel moduli."""

    rule = "voigt"
    _iso_linear = True

    def pk1(self, F):
        iso = self._all_iso()
        if iso is not None and self._dim != 9:
            mu_x, lam_x = iso
            two_mu = 2.0 * mu_x
            if self._dim >= 6:
                # single fused kernel (stack, no .at update pass)
                ltr = lam_x * (F[0] + F[1] + F[2])
                return jnp.stack([
                    two_mu * F[0] + ltr, two_mu * F[1] + ltr,
                    two_mu * F[2] + ltr]
                    + [two_mu * F[k] for k in range(3, self._dim)])
            return two_mu[None] * F
        out = None
        for p in self.phases:
            t = p.phi[None] * p.law.pk1(F)
            out = t if out is None else out + t
        return out

    def w(self, F):
        out = None
        for p in self.phases:
            t = p.phi * p.law.w(F)
            out = t if out is None else out + t
        return out

    def dpk1(self, F, W):
        iso = self._all_iso()
        if iso is not None and self._dim != 9:
            return self.pk1(W)
        out = None
        for p in self.phases:
            t = p.phi[None] * p.law.dpk1(F, W)
            out = t if out is None else out + t
        return out


class ReussMixed(MixedMaterial):
    """Harmonic (Reuss) compliance averaging (ReussMixedMaterialLaw,
    fibergen.cpp:12653-12726).  For all-isotropic phases the effective
    per-voxel moduli are the harmonic means; general laws are not yet
    supported."""

    rule = "reuss"
    _iso_linear = True

    def _iso_harmonic(self):
        mus, lams = [], []
        for p in self.phases:
            f = getattr(p.law, "iso_moduli", None)
            if f is None:
                raise NotImplementedError("reuss mixing needs isotropic laws")
            mu, lam = f()
            mus.append(mu); lams.append(lam)
        eps = np.finfo(np.float64).tiny
        # harmonic average of (2mu) and (3lam+2mu) -> recover (mu, lam)
        inv_m = sum(p.phi / (2.0 * m + eps) for p, m in zip(self.phases, mus))
        inv_k = sum(p.phi / (3.0 * l + 2.0 * m + eps)
                    for p, m, l in zip(self.phases, mus, lams))
        two_mu = 1.0 / inv_m
        three_lam_two_mu = 1.0 / inv_k
        mu_x = 0.5 * two_mu
        lam_x = (three_lam_two_mu - two_mu) / 3.0
        return mu_x, lam_x

    def _all_iso(self):
        return self._iso_harmonic()

    def pk1(self, F):
        mu_x, lam_x = self._iso_harmonic()
        out = 2.0 * mu_x[None] * F
        if self._dim >= 6:
            tr = lam_x * (F[0] + F[1] + F[2])
            out = out.at[0:3].add(tr[None])
        return out

    def dpk1(self, F, W):
        return self.pk1(W)

    def w(self, F):
        s = self.pk1(F)
        w = voigt.weights(self._dim)
        return 0.5 * sum(w[i] * s[i] * F[i] for i in range(self._dim))


class MaximumMixed(MixedMaterial):
    """Dominant-phase selection: the voxel uses the law of the phase with the
    largest phi (MaximumMixedMaterialLaw, fibergen.cpp:12568-12605)."""

    rule = "maximum"

    def _masks(self):
        phis = jnp.stack([p.phi for p in self.phases])
        arg = jnp.argmax(phis, axis=0)
        return [(arg == i).astype(phis.dtype) for i in range(len(self.phases))]

    def pk1(self, F):
        out = None
        for m, p in zip(self._masks(), self.phases):
            t = m[None] * p.law.pk1(F)
            out = t if out is None else out + t
        return out

    def dpk1(self, F, W):
        out = None
        for m, p in zip(self._masks(), self.phases):
            t = m[None] * p.law.dpk1(F, W)
            out = t if out is None else out + t
        return out

    def w(self, F):
        out = None
        for m, p in zip(self._masks(), self.phases):
            t = m * p.law.w(F)
            out = t if out is None else out + t
        return out


MIXING_RULES = {
    "voigt": VoigtMixed,
    "reuss": ReussMixed,
    "maximum": MaximumMixed,
}


def make_mixed(rule: str, phases: List[Phase], dim: int = 6) -> MixedMaterial:
    """Mixing-rule factory (create_mixing_rule equivalent,
    fibergen.cpp:14975-15030)."""
    if rule == "laminate":
        from .laminate import LaminateMixed
        return LaminateMixed(phases, dim=dim)
    if rule in ("infinity_laminate", "infinity-laminate"):
        from .laminate import InfinityLaminateMixed
        return InfinityLaminateMixed(phases, dim=dim)
    if rule == "fluidity":
        from .laminate import FluidityMixed
        return FluidityMixed(phases, dim=dim)
    try:
        cls = MIXING_RULES[rule]
    except KeyError:
        raise ValueError(f"Unknown mixing rule '{rule}'") from None
    return cls(phases, dim=dim)


class RandomMixed(MixedMaterial):
    """Interface voxels resolve to a single pseudo-random phase, pure voxels
    to their phase (RandomMixedMaterialLaw, fibergen.cpp:12782-12867).
    Uses the reference's LCG hash of the flat voxel index."""

    rule = "random"

    def _weights(self):
        nph = len(self.phases)
        phis = jnp.stack([p.phi for p in self.phases])
        interface = ((phis > _RTHR) & (phis < 1.0 - _RTHR)).any(axis=0)
        shape = phis.shape[1:]
        idx = (np.arange(np.prod(shape)).reshape(shape))
        rnd = (((idx * 1103515245 + 12345) >> 16) & 0x7FFFFFFF) % nph
        rnd = jnp.asarray(rnd)
        sel = jnp.stack([(rnd == p).astype(phis.dtype) for p in range(nph)])
        return jnp.where(interface[None], sel, phis)

    def pk1(self, F):
        w = self._weights()
        out = None
        for wp, p in zip(w, self.phases):
            t = wp[None] * p.law.pk1(F)
            out = t if out is None else out + t
        return out

    def dpk1(self, F, W):
        w = self._weights()
        out = None
        for wp, p in zip(w, self.phases):
            t = wp[None] * p.law.dpk1(F, W)
            out = t if out is None else out + t
        return out

    def w(self, F):
        w = self._weights()
        out = None
        for wp, p in zip(w, self.phases):
            t = wp * p.law.w(F)
            out = t if out is None else out + t
        return out

    def _all_iso(self):
        return None


class FiftyFiftyMixed(MixedMaterial):
    """Interface voxels average all phases equally
    (FiftyFiftyMixedMaterialLaw, fibergen.cpp:12870-12955)."""

    rule = "fiftyfifty"

    def _weights(self):
        nph = len(self.phases)
        phis = jnp.stack([p.phi for p in self.phases])
        interface = ((phis > _RTHR) & (phis < 1.0 - _RTHR)).any(axis=0)
        eq = jnp.full_like(phis, 1.0 / nph)
        return jnp.where(interface[None], eq, phis)

    pk1 = RandomMixed.pk1
    dpk1 = RandomMixed.dpk1
    w = RandomMixed.w

    def _all_iso(self):
        return None


class SplitMixed(MixedMaterial):
    """Volumetric/deviatoric split with separate sub-rules
    (SplitMixedMaterialLaw, fibergen.cpp:12608-12650)."""

    rule = "split"

    def __init__(self, phases, dim=6, dev_rule="voigt", vol_rule="reuss"):
        super().__init__(phases, dim=dim)
        # sub-rules share the same Phase objects, so phi assignments propagate
        self.dev = MIXING_RULES[dev_rule](self.phases, dim=dim)
        self.vol = MIXING_RULES[vol_rule](self.phases, dim=dim)

    def _constituents(self):
        return [self, self.dev, self.vol]

    def _split(self, F):
        tr3 = (F[0] + F[1] + F[2]) / 3.0
        Fvol = jnp.zeros_like(F).at[0:3].set(tr3[None])
        return F - Fvol, Fvol

    def pk1(self, F):
        Fdev, Fvol = self._split(F)
        return self.dev.pk1(Fdev) + self.vol.pk1(Fvol)

    def dpk1(self, F, W):
        Wdev, Wvol = self._split(W)
        return self.dev.dpk1(F, Wdev) + self.vol.dpk1(F, Wvol)

    def w(self, F):
        Fdev, Fvol = self._split(F)
        return self.dev.w(Fdev) + self.vol.w(Fvol)

    def _all_iso(self):
        return None


class IsoMixed(MixedMaterial):
    """Energy-optimal isostrain/isostress split for two isotropic phases
    (IsoMixedMaterialLaw, fibergen.cpp:12958-13083):
        (c2 C1 + c1 C2) F1 = C2 F,  F2 = (F - c1 F1)/c2.
    Implemented in closed form for isotropic laws (the mixing matrix is
    itself isotropic and inverted analytically)."""

    rule = "iso"

    def __init__(self, phases, dim=6):
        super().__init__(phases, dim=dim)
        if len(phases) != 2:
            raise ValueError("iso mixing requires exactly 2 phases")

    def _phase_strains(self, F):
        l1, l2 = self.phases[0].law, self.phases[1].law
        if not (hasattr(l1, "iso_moduli") and hasattr(l2, "iso_moduli")):
            raise NotImplementedError("iso mixing needs isotropic laws")
        mu1, la1 = l1.iso_moduli()
        mu2, la2 = l2.iso_moduli()
        c1 = self.phases[0].phi
        c2 = self.phases[1].phi
        # M = c2 C1 + c1 C2 (isotropic with per-voxel moduli)
        m = c2 * mu1 + c1 * mu2
        l = c2 * la1 + c1 * la2
        # solve M F1 = C2 F analytically: inv(2m Id + l II) applied to
        # (2 mu2 F + la2 tr(F) I)
        trF = F[0] + F[1] + F[2]
        rhs = 2.0 * mu2 * F
        if self._dim >= 6:
            rhs = rhs.at[0:3].add((la2 * trF)[None])
        tr_rhs = rhs[0] + rhs[1] + rhs[2]
        inv2m = 1.0 / jnp.maximum(2.0 * m, 1e-300)
        b = l / (jnp.maximum(2.0 * m, 1e-300)
                 * jnp.maximum(3.0 * l + 2.0 * m, 1e-300))
        F1 = inv2m[None] * rhs
        if self._dim >= 6:
            F1 = F1.at[0:3].add(-(b * tr_rhs)[None])
        # guard pure voxels: F1 = F where c2 ~ 0 or c1 ~ 0
        pure1 = c2 <= _RTHR
        pure2 = c1 <= _RTHR
        F1 = jnp.where(pure1[None] | pure2[None], F, F1)
        c2s = jnp.maximum(c2, _RTHR)
        F2 = (F - c1[None] * F1) / c2s[None]
        F2 = jnp.where(pure1[None] | pure2[None], F, F2)
        return F1, F2, c1, c2, pure1, pure2

    def pk1(self, F):
        F1, F2, c1, c2, pure1, pure2 = self._phase_strains(F)
        l1, l2 = self.phases[0].law, self.phases[1].law
        out = c1[None] * l1.pk1(F1) + c2[None] * l2.pk1(F2)
        return out

    def dpk1(self, F, W):
        import jax
        return jax.jvp(self.pk1, (F,), (W,))[1]

    def w(self, F):
        F1, F2, c1, c2, _, _ = self._phase_strains(F)
        return c1 * self.phases[0].law.w(F1) + c2 * self.phases[1].law.w(F2)

    def _all_iso(self):
        return None


_RTHR = 1e-7

MIXING_RULES.update({
    "random": RandomMixed,
    "fiftyfifty": FiftyFiftyMixed,
    "split": SplitMixed,
    "iso": IsoMixed,
})


class _BoundFields:
    """Context manager used by MixedMaterial.bound()."""

    def __init__(self, mat, values):
        self.mat = mat
        self.values = values

    def __enter__(self):
        slots = self.mat.field_slots()
        assert len(slots) == len(self.values), \
            "material field state changed between fields() and bound()"
        self._slots = slots
        self._saved = [getattr(o, a) for o, a in slots]
        for (o, a), v in zip(slots, self.values):
            setattr(o, a, v)
        self._mats = self.mat._constituents()
        self._flags = [getattr(m, "_bound_active", False) for m in self._mats]
        for m in self._mats:
            m._bound_active = True
        return self.mat

    def __exit__(self, *exc):
        for (o, a), v in zip(self._slots, self._saved):
            setattr(o, a, v)
        for m, f in zip(self._mats, self._flags):
            m._bound_active = f
        return False
