"""Lippmann-Schwinger solver.

TPU-native equivalent of the reference's LSSolver (fibergen.cpp:14643-24741):
iteration schemes operate on whole (dim, nx, ny, nz) jax fields with each
iteration compiled to a single fused XLA program (stress kernel + staggered
FD ops + batched FFTs + Green kernel + reductions).  The host loop only
consumes per-iteration scalars (error-estimator metrics), mirroring the
reference's converged() logic (fibergen.cpp:21164-21244).

Reference material (mu_0, lambda_0) is static per loadstep, so it is passed
as a hashable jit-static argument: XLA constant-folds the Green-operator
coefficients, and re-running with the same material hits the jit cache.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import fields, voigt
from ..core.grid import Grid
from ..materials.mixing import MixedMaterial
from ..ops import gamma as gammamod
from ..utils.logging import LOG, timer
from . import bc as bcmod
from .estimators import make_estimator

# The adaptive drain (_run_cg_chunked) dispatches power-of-two chunk
# lengths, each a separately compiled program.  Through the remote-compile
# tunnel every extra program variant costs 20-60 s once per HLO — far more
# than the <= K-1 overshoot iterations it avoids unless iterations are
# expensive.  Below this voxel count the drain stays off and the solve
# uses exactly two programs (fused init chunk + one K-chunk); the round-5
# demo sweep measured small planar demos (e.g. 111x64x1 laminate-mixing
# SFRP) blowing a 900 s budget on drain-program compiles alone.
ADAPTIVE_DRAIN_MIN_VOXELS = 1 << 22

MODE_DIM = {
    "elasticity": 6,
    "hyperelasticity": 9,
    "viscosity": 6,
    "heat": 3,
    "porous": 3,
}


class SolverError(RuntimeError):
    pass


@dataclasses.dataclass
class SolverOptions:
    """Solver configuration (defaults per LSSolver ctor,
    fibergen.cpp:14780-14892)."""

    mode: str = "elasticity"
    method: str = "cg"
    gamma_scheme: str = "auto"
    tol: float = 1e-4
    tol_red: float = math.sqrt(np.finfo(np.float64).eps)
    abs_tol: float = float(np.finfo(np.float64).eps)
    bc_tol: float = 1e-3
    maxiter: int = 10000
    update_ref: str = "loadstep"
    ref_scale: float = 1.0
    newton_relax: float = 1.0
    basic_relax: float = 1.0
    bc_relax: float = 1.0
    cg_inner_product: str = "l2"
    cg_reinit: int = 0
    # hyper Newton inner-CG tangent: "exact" (jvp of the autodiff PK1,
    # quadratic Newton) or "frozen_iso" (per-voxel isotropic-form tangent
    # refreshed per outer iteration — modified Newton, cheaper inner
    # iterations; see solvers/newton.py _frozen_abc)
    newton_tangent: str = "exact"
    nl_cg_beta_scheme: str = "polak_ribiere"
    nl_cg_c: float = 0.5
    nl_cg_tau: float = 0.5
    nl_cg_alpha: float = 1.0
    error_estimator: str = "epsilon"
    outer_error_estimator: str = "epsilon"
    # device-side iteration batching: run this many solver iterations per
    # host round-trip (lax.scan); metrics for every iteration are still
    # recorded, convergence is only *acted on* at chunk granularity.
    # 1 reproduces the reference's per-iteration loop exactly.
    check_every: int = 1
    # fused Pallas stencil kernels for the staggered elasticity hot path:
    # "auto" enables them on TPU when the problem shape/mixing qualifies
    use_pallas: str = "auto"
    # manual-DMA sequential-sweep variants of the CG stencil kernels
    # (pallas_sweep.py): zero halo-pad traffic, ~1.9x on the stress/div
    # pass.  "auto" uses them whenever the Pallas path is active on a
    # single chip and the shape qualifies; "off" keeps the BlockSpec
    # kernels.
    use_sweep: str = "auto"
    # what to do when a sharded solver's grid does NOT qualify for the slab
    # decomposition (non-divisible nx/ny, wrong spec): "error" refuses
    # (default — the GSPMD fallback silently all-gathers the full field on
    # every device, the round-1 replication pathology), "warn" logs loudly
    # and proceeds with the replicated-FFT fallback anyway
    sharding_fallback: str = "error"
    # true DIM=2 instantiation on one-voxel-thick grids (<dim>2</dim>):
    # in-plane-only staggered pipeline (2-component force, 2-D spectral
    # chain, constant out-of-plane components).  "auto" engages it per
    # solve when the qualification holds exactly (staggered scheme, trivial
    # BCs, no out-of-plane loading; elasticity additionally requires
    # isotropic linear phases so in-plane strain cannot excite out-of-plane
    # shear); "off" keeps the nz=1 3-D superset path.  The reference's own
    # DIM=2 dispatch is disabled in its shipped source
    # (fibergen.cpp:26558-26564) — this path instantiates what it would.
    use_dim2: str = "auto"
    # low-memory CG step: "auto" engages on single-chip staggered
    # elasticity when the 4 standard CG fields would exceed ~11 GB
    # (512^3 f32); "on"/"off" force it.  See cg_step_lowmem.
    low_mem: str = "auto"
    # batched multi-RHS driver for calc_effective_properties: "auto" runs
    # all load cases in ONE vmapped CG when the solver qualifies (linear
    # CG, trivial BCs, single device; see run_batched), "off" keeps the
    # reference's sequential per-case solves (fibergen.cpp:26044-26066)
    batch_load_cases: str = "auto"
    # interactive stepping: pause for ENTER after every convergence check
    # (the reference's step_mode, fibergen.cpp:21168-21172); only prompts
    # when stdin is a TTY so batch runs cannot hang
    step_mode: bool = False
    # spectral-backend selection applied at the start of every run():
    # "auto" = MXU matmul-DFT on TPU where it wins, "xla" = force the FFT
    # op, "matmul" = force the DFT.  None (default) leaves the process
    # global ops.fft.FFT_BACKEND untouched (programmatic overrides and
    # tests set it directly).  Stored per solver so two FG instances with
    # different <fft_backend> settings cannot silently override each
    # other's traces (the global is re-applied when THIS solver runs).
    fft_backend: "str | None" = None
    # mixed-precision iterative refinement (solvers/refine.py): deep
    # tolerances (the reference's double-precision demo tols down to
    # 1e-10, fibergen.cpp:26550-26565) on f32 hardware.  "auto" engages
    # after the f32 CG when tol < ~3e-7 and the solve qualifies (linear
    # mode, trivial BCs, single chip); "on" forces it for any tol; "off"
    # disables.  The f32 phase then runs to max(tol, 1e-6) and f64-residual
    # sweeps (device f32 correction solves) finish the job.
    refine: str = "auto"
    refine_max_sweeps: int = 10
    # adaptive chunk drain of the pipelined CG: "auto" engages only on
    # grids >= ADAPTIVE_DRAIN_MIN_VOXELS (each power-of-two drain chunk
    # length is a separately compiled program — 20-60 s once per HLO
    # through the remote-compile tunnel, which dwarfs the <= K-1 saved
    # iterations on small grids); "on"/"off" force it
    adaptive_drain: str = "auto"
    # inner correction-solve tolerance on sqrt(gamma/gamma0); each sweep
    # multiplies the error by about this factor
    refine_inner_tol: float = 1e-5
    # staggered G0 applicator: "fft" or "multigrid" (G0_solver setting)
    g0_solver: str = "fft"
    # even-grid Nyquist symmetrization of the collocated Gamma
    # (<freq_hack>, fibergen.cpp:15081, active at fibergen.cpp:19396)
    freq_hack: bool = False
    loadsteps: int = 1
    first_loadstep: int = -1
    loadstep_extrapolation_order: int = 0
    loadstep_extrapolation_method: str = "polynomial"
    # automatic divergence recovery: on NaN / indefinite-operator abort
    # inside a loadstep, restore the last converged state and insert the
    # midpoint loadstep parameter (the retry the reference left disabled,
    # fibergen.cpp:21661-21671 `#if 0`).  Value = max number of splits per
    # solve; 0 disables recovery.
    max_loadstep_splits: int = 8
    print_mean: bool = False
    print_detF: bool = False
    dtype: str = "float64"
    # explicit reference material (overrides the eigenvalue-bound update when
    # update_ref == "never"; <materials><reference .../>, fibergen.cpp:15187)
    ref_mu: Optional[float] = None
    ref_lambda: Optional[float] = None

    def resolved_scheme(self) -> str:
        """'auto' resolution (fibergen.cpp:15068-15079)."""
        s = self.gamma_scheme.replace("-", "_")
        if s == "Willot_R".replace("-", "_") or s.lower() == "willot_r":
            s = "willot"
        if s == "auto":
            s = "collocated" if self.method == "polarization" else "staggered"
        if self.method == "polarization" and "staggered" in s:
            LOG.warn("switching to collocated discretization for polarization method")
            s = "collocated"
        return s


class LSSolver:
    """FFT-homogenization solver on a periodic voxel grid."""

    def __init__(self, grid: Grid, material: MixedMaterial,
                 options: SolverOptions = None, sharding=None):
        self.grid = grid
        self.mat = material
        self.opt = options or SolverOptions()
        # jax.sharding.Sharding for the (ncomp, nx, ny, nz) fields; x-slab
        # NamedSharding over a device mesh distributes the FFTs via GSPMD
        # collectives (the reference is single-node OpenMP only)
        self.sharding = sharding
        self.mode = self.opt.mode
        self.dim = MODE_DIM[self.mode]
        if material.dim != self.dim:
            raise SolverError(
                f"material dim {material.dim} incompatible with mode '{self.mode}'")
        self.scheme = self.opt.resolved_scheme()
        # canonicalize so float64 maps to float32 when x64 is disabled
        # (otherwise the CG safeguard `tiny` would be the float64 tiny,
        # which flushes to 0 in f32 arrays and yields 0/0 on zero residuals)
        self.dtype = jax.dtypes.canonicalize_dtype(jnp.dtype(self.opt.dtype))

        # prescribed BCs (Voigt vectors of mode dim)
        self.E = np.zeros(self.dim)
        self.S = np.zeros(self.dim)
        self.P = voigt.id4(self.dim)
        self._bc: Optional[bcmod.BCProjector] = None

        # reference material: NaN until set or derived (fibergen.cpp:14836)
        self.mu_0 = self.opt.ref_mu if self.opt.ref_mu is not None else float("nan")
        self.lambda_0 = self.opt.ref_lambda if self.opt.ref_lambda is not None else 0.0

        self.eps: Optional[jnp.ndarray] = None
        # f64 host solution after mixed-precision refinement (refine.py);
        # calc_mean_* read it when present so deep-tolerance digits survive
        self.eps64 = None
        self._refiner = None
        self.residuals: List[float] = []
        self.convergence_callback: Optional[Callable[[], bool]] = None
        self.loadstep_callback: Optional[Callable[[], bool]] = None
        # called with the loadstep index after each loadstep solve
        # (write_loadsteps/loadstep_filename wiring, fibergen.cpp:21437)
        self.loadstep_writer: Optional[Callable[[int], None]] = None
        self._canceled = False
        self._diverged = False

        self._current_E = self.E
        self._current_S = self.S
        self.solve_time = 0.0

        self._id = voigt.identity_vec(self.dim)
        self._estimator_kind = make_estimator(self.opt.error_estimator).metric_kind

        self._build_kernels()

    # ------------------------------------------------------------------ API
    def set_strain(self, e):
        """Prescribe mean strain/gradient (setStrain, fibergen.cpp:20692)."""
        self.E = self._fit_vec(np.asarray(e, dtype=np.float64))

    def set_stress(self, s):
        """Prescribe mean stress/flux (setStress, fibergen.cpp:20668)."""
        self.S = self._fit_vec(np.asarray(s, dtype=np.float64))

    def set_bc_projector(self, P):
        """Prescribe the strain-control projector (setBCProjector)."""
        self.P = np.asarray(P, dtype=np.float64)
        if np.isfinite(self.mu_0):
            self._bc = bcmod.make_bc_projector(
                self.P, self.mu_0, self.lambda_0, self.opt.bc_relax)

    def cancel(self):
        self._canceled = True

    def _fit_vec(self, e):
        out = np.zeros(self.dim)
        n = min(e.size, self.dim)
        if e.size == 6 and self.dim == 9:
            out[:6] = e
            out[6:9] = e[3:6]
        elif e.size <= self.dim:
            out[:n] = e[:n]
        else:
            out[:] = e[: self.dim]
        return out

    # --------------------------------------------------------------- kernels
    def _build_kernels(self):
        grid, mode, scheme = self.grid, self.mode, self.scheme
        mat = self.mat
        kind = self._estimator_kind
        dt = self.dtype
        tiny = float(np.finfo(np.float64 if dt == jnp.float64 else np.float32).tiny)

        def metric(eps):
            if kind == "epsilon":
                return fields.component_norm(eps)
            if kind == "sigma":
                return mat.mean_pk1(eps)
            if kind == "energy":
                return mat.mean_w(eps)
            return jnp.zeros((), dt)

        def stress_diff(eps, mu0, lam0):
            """tau = (C - C0) : eps (calcStressDiff, fibergen.cpp:18030)."""
            return mat.stress_diff(eps, mu0, lam0)

        # hand-written slab-decomposed distributed FFT when the field
        # sharding qualifies (parallel/fft.py); None falls back to the
        # single-program jnp.fft path
        from .. import parallel as parmod
        from ..parallel.fft import slab_reject_reason
        self.par = (parmod.slab_fft_for(self.sharding, grid)
                    if self.sharding is not None else None)
        if (self.sharding is not None and self.par is None
                and not getattr(self.sharding, "is_fully_replicated", True)):
            reason = slab_reject_reason(self.sharding, grid)
            if reason is not None:
                msg = (
                    f"sharded solve cannot use the slab FFT: {reason}. "
                    "Without it GSPMD lowers every FFT to a full-field "
                    "all-gather (each device computes the whole transform; "
                    "neither memory nor ICI traffic scales with the mesh). "
                    "Use a grid whose nx and ny divide the mesh, or set "
                    "SolverOptions(sharding_fallback='warn') to proceed "
                    "with replicated FFTs anyway.")
                if self.opt.sharding_fallback == "warn":
                    LOG.warn(msg)
                else:
                    raise SolverError(msg)

        def gamma_op(E, tau, mu0, lam0, bca, alpha=-1.0, beta=0.0,
                     dim2=False):
            return gammamod.gamma_operator(
                grid, mode, scheme, bca, E, mu0, lam0, tau, alpha, beta,
                g0_solver=self.opt.g0_solver, freq_hack=self.opt.freq_hack,
                par=self.par, dim2=dim2,
                # pallas_call cannot run under GSPMD: when a sharded solver
                # fell back to replicated FFTs (sharding set, no slab
                # layout) the chain must stay in XLA einsums.  With a slab
                # layout (par) the middle runs under explicit shard_map,
                # where Pallas IS allowed (kz-slab distributed middle).
                pallas_mid=self.sharding is None or self.par is not None)

        # true DIM=2 capability (the per-solve loading qualification is
        # checked in _dim2_ok): one-voxel-thick grid, staggered scheme,
        # single device, and a mode/material combination where the
        # out-of-plane components provably stay constant
        self._dim2_capable = (
            self.opt.use_dim2 != "off" and grid.nz == 1
            and self.sharding is None
            and scheme in ("staggered", "half_staggered", "full_staggered",
                           "collocated")
            and not (scheme == "collocated" and self.opt.freq_hack)
            and self.opt.method != "polarization"
            and (mode in ("heat", "porous")
                 or (mode == "elasticity"
                     and (scheme == "collocated"
                          or self.opt.g0_solver == "fft")
                     and getattr(mat, "_iso_linear", False))))

        def shard(x):
            if self.sharding is not None:
                return jax.lax.with_sharding_constraint(x, self.sharding)
            return x

        def _pallas_enabled():
            if self.opt.use_pallas == "off":
                return False
            if self.sharding is not None and self.par is None:
                return False  # no slab layout: plain GSPMD path
            ndev = self.par.n_devices if self.par is not None else 1
            from ..ops import pallas_kernels as pk
            if not (mode == "elasticity" and scheme == "staggered"
                    and self.opt.g0_solver == "fft"
                    and getattr(mat, "_iso_linear", False)
                    and pk.supported(grid, self.dim, dt, ndev)):
                return False
            if self.opt.use_pallas == "on":
                return True
            return jax.default_backend() not in ("cpu",)

        self._pallas_active = _pallas_enabled()
        # single-chip CG steps use the manual-DMA sweep kernels when the
        # shape qualifies (pallas_sweep.py: every input plane read once,
        # no wrap-pad materialization)
        from ..ops import pallas_sweep as psw
        self._sweep_active = (
            self._pallas_active and self.sharding is None
            and self.opt.use_sweep != "off"
            and psw.supported(grid, self.dim, dt))

        def _visc_pallas_enabled():
            """Fused viscosity Delta staggered CG: the same sweep kernels
            with the tau-sum reduction and the in-kernel Delta tau term
            (pallas_sweep want_tau_sum / mu_x variants).  The in-kernel tau
            term is the SCALAR law's 2(mu-mu0)p only, so every phase must
            be a zero-lambda (fluidity) law — lambda-carrying laws keep the
            generic delta path."""
            if self.opt.use_pallas == "off" or self.opt.use_sweep == "off":
                return False
            if not (mode == "viscosity" and scheme == "staggered"
                    and self.sharding is None
                    and self.opt.g0_solver == "fft"
                    and getattr(mat, "_iso_linear", False)
                    and psw.supported_visc(grid, self.dim, dt)):
                return False

            def _lam0(p):
                f = getattr(p.law, "iso_moduli", None)
                if f is None:
                    return False
                lam = f()[1]
                return isinstance(lam, (int, float)) and float(lam) == 0.0

            if not all(_lam0(p) for p in mat.phases):
                return False
            if self.opt.use_pallas == "on":
                return True
            return jax.default_backend() not in ("cpu",)

        self._visc_pallas = _visc_pallas_enabled()

        # low-memory CG step for grids where standard CG's 4 live
        # solution-sized fields (eps, r, p, w) exceed HBM — 12.9 GB at
        # 512^3/f32 before moduli and FFT transients (the capability gap
        # PARITY's round-3 table recorded vs joss/paper.md:80's
        # "several 100 million unknowns" single-node claim).  The sweep
        # kernels cannot help here (a 512^2 x-plane blows their VMEM
        # windows), so the step is jnp with w never materialized: the CG
        # denominator reduces the staggered gradient of u on the fly, and
        # the update recomputes that gradient fused into the eps/r axpys.
        nxyz_i = int(np.prod(grid.shape))
        self._low_mem = (
            self.opt.low_mem == "on"
            or (self.opt.low_mem == "auto"
                and self.sharding is None
                and mode in ("elasticity", "viscosity")
                and scheme == "staggered"
                and self.opt.g0_solver == "fft"
                and 4 * self.dim * nxyz_i * jnp.dtype(dt).itemsize > 11e9))

        def cg_step_lowmem(eps, r, p_prev, gamma, gamma_prev, mu0, lam0):
            """One CG step with 3 live solution fields instead of 4: w is
            recomputed from u behind an optimization_barrier (which stops
            XLA CSE from merging the two gradient evaluations back into
            one materialized field).  Extra cost: one more read of u and p
            per iteration; saving: dim*nxyz*4 bytes of peak (3.2 GB at
            512^3).  Same trajectory as cg_step (identical math).

            For all-isotropic linear materials the step additionally runs
            COMPONENT-WISE (eps_staggered_comp / div_stress_diff_comp),
            with each component's reduction chained through an
            optimization_barrier so XLA schedules them sequentially: no
            stacked 6-component temp ever exists.  The stacked variant's
            compile at 512^3 f32 measured 17.13 GB peak (3 GB stacked
            gradient + slice temps) vs 15.75 GB HBM on v5e."""
            from ..ops import green
            from ..ops import staggered as stag
            iso = (mat._all_iso()
                   if getattr(mat, "_iso_linear", False) else None)
            beta = gamma / gamma_prev
            if iso is None or self.dim != 6:
                zero = jnp.zeros(self.dim, dt)
                p = r + beta * p_prev
                tau = stress_diff(p, mu0, lam0)
                f = stag.div_staggered(grid, tau)
                u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0)
                w1 = stag.eps_staggered(grid, zero, u)
                denom = fields.inner_l2_diff(p, p, w1) + tiny
                alpha = gamma / denom
                u2 = jax.lax.optimization_barrier(u)
                w2 = stag.eps_staggered(grid, zero, u2)
                eps2 = eps + alpha * p
                r2 = r - alpha * (p - w2)
                delta = fields.inner_l2(r2, r2) + tiny
                return eps2, r2, p, delta, gamma, metric(eps2)

            mu_x, lam_x = iso
            two_dmu = 2.0 * (mu_x - mu0)
            wv = voigt.weights(6)
            # direction update in place on the donated p_prev buffer
            p = p_prev
            for c in range(6):
                p = p.at[c].set(r[c] + beta * p_prev[c])
            ltr = (lam_x - lam0) * (p[0] + p[1] + p[2])
            f = jnp.zeros((3,) + grid.shape, dt)
            for i in range(3):
                f = f.at[i].set(
                    stag.div_stress_diff_comp(grid, p, two_dmu, ltr, i))
            u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0)
            s = jnp.zeros((), dt)
            uc = u
            for c in range(6):
                w1c = stag.eps_staggered_comp(grid, uc, c)
                s = s + float(wv[c]) * (p[c] * (p[c] - w1c)).sum()
                s, uc = jax.lax.optimization_barrier((s, uc))
            denom = s / nxyz + tiny
            alpha = gamma / denom
            eps2, r2 = eps, r
            delta = jnp.zeros((), dt)
            for c in range(6):
                w2c = stag.eps_staggered_comp(grid, uc, c)
                rc = r[c] - alpha * (p[c] - w2c)
                eps2 = eps2.at[c].add(alpha * p[c])
                r2 = r2.at[c].set(rc)
                delta = delta + float(wv[c]) * (rc * rc).sum()
                delta, uc = jax.lax.optimization_barrier((delta, uc))
            delta = delta / nxyz + tiny
            return eps2, r2, p, delta, gamma, metric(eps2)

        # shard_map plumbing for the fused sharded hot path: the Pallas
        # stencils run per-slab with the 1-voxel x halo exchanged over ICI
        # (lax.ppermute inside pallas_kernels._pad_xy) and the slab FFT's
        # local stages ride the same matmul-DFT backend as single-chip
        par = self.par
        if par is not None:
            from jax.sharding import PartitionSpec as _P
            _mesh, _ax = par.mesh, par.axis
            _fs = par.field_spec          # (ncomp, x-slab, y, z)
            _ms = _P(_ax, None, None)     # (x-slab, y, z) moduli fields
            _rs = _P()                    # replicated scalars / Voigt vecs

            def _smap(fn, in_specs, out_specs):
                # check_vma=False: pallas_call outputs carry no varying-axis
                # metadata; collective correctness is explicit here (ppermute
                # halos, psum for the fused CG denominator)
                return jax.shard_map(fn, mesh=_mesh, in_specs=in_specs,
                                     out_specs=out_specs, check_vma=False)

        def fused_basic(eps, E, mu0, lam0):
            """stress_diff + div fused (Pallas), then G0 in Fourier, then the
            fused staggered gradient.  Only the trivial-BC path is fused;
            mixed BCs need the tau mean and use the jnp path.  On a mesh,
            the stencils run per-slab under shard_map (ppermute halo) and
            the FFTs through the slab decomposition."""
            from ..ops import fft as fftmod
            from ..ops import green
            from ..ops import pallas_kernels as pk
            mu_x, lam_x = mat._all_iso()
            Ej = jnp.asarray(E, dt)
            if par is None:
                f = pk.stress_div_staggered(grid, eps, mu_x, lam_x, mu0, lam0)
                # transpose-free fft+G0+ifft chain (falls back to separate
                # transforms off the matmul-DFT backend)
                u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0)
                return pk.eps_from_u_staggered(grid, Ej, u)
            f = _smap(
                lambda e, m, l: pk.stress_div_staggered(
                    grid, e, m, l, mu0, lam0, axis_name=_ax),
                (_fs, _ms, _ms), _fs)(eps, mu_x, lam_x)
            # qualifying shapes run the kz-slab-distributed Pallas middle
            # (one all-to-all each way, chain fused per device); the rest
            # use the slab FFT pair
            u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0, par=par)
            return _smap(
                lambda uu, ee: pk.eps_from_u_staggered(
                    grid, ee, uu, axis_name=_ax),
                (_fs, _rs), _fs)(u, Ej)

        def fused_visc(r, p_prev, beta, E, mu0, lam0):
            """Fused viscosity Delta staggered application on one direction
            build: p = r + beta p_prev; tau = 2(f(x)-f0)p (lam terms are
            zero for the scalar fluidity law); f = div tau; u = G0'(f) with
            the dual constants (mu_0' = -mu0, lambda' -> inf — exactly what
            delta_operator passes, fibergen.cpp:20446-20458); eta = adj +
            grad(u) + 2*alpha*mu0v*tau with adj = E - 2*alpha*mu0v*mean(tau)
            folded into the eps sweep's E vector.  Returns (eta, p,
            dot_raw) with dot_raw = nxyz * <p, p - eta> (the CG
            denominator)."""
            from ..ops import green
            from ..ops import pallas_sweep as psw
            mu_x, lam_x = mat._all_iso()
            f, p, tau_sum = psw.stress_div_beta_sweep(
                grid, r, p_prev, beta, mu_x, lam_x, mu0, lam0,
                want_tau_sum=True)
            u = green.g0_staggered_fused(grid, -mu0, float("inf"), f, -1.0)
            mu0v = 1.0 / (4.0 * mu0)
            bdelta = 2.0 * (-1.0) * mu0v      # alpha = -1
            adj = jnp.asarray(E, dt) - (bdelta / nxyz) * tau_sum
            w, dot_raw = psw.eps_from_u_dot_sweep(
                grid, adj, u, p, mu_x=mu_x, tau2c=bdelta, mu0=mu0)
            return w, p, dot_raw

        def basic_step(eps, E, bca, mu0, lam0, dim2=False):
            if self._pallas_active and bca is None and not dim2:
                eta = shard(fused_basic(eps, E, mu0, lam0))
            elif self._visc_pallas and bca is None and not dim2:
                # beta = 0 with p_prev = eps: p = eps exactly, without
                # materializing a zero field in HBM (the repeated read of
                # eps stays in cache)
                eta, _, _ = fused_visc(eps, eps, 0.0, E, mu0, lam0)
            else:
                tau = stress_diff(eps, mu0, lam0)
                eta = shard(gamma_op(E, tau, mu0, lam0, bca, dim2=dim2))
            return eta, metric(eta)

        def krylov(eps, bca, mu0, lam0, dim2=False):
            """-Gamma (C-C0) eps with zero mean (krylovOperator,
            fibergen.cpp:20583-20587)."""
            if self._pallas_active and bca is None and not dim2:
                return fused_basic(eps, jnp.zeros(self.dim, dt), mu0, lam0)
            if self._visc_pallas and bca is None and not dim2:
                eta, _, _ = fused_visc(eps, eps, 0.0,
                                       jnp.zeros(self.dim, dt), mu0, lam0)
                return eta
            zero = jnp.zeros(self.dim, dt)
            tau = stress_diff(eps, mu0, lam0)
            return gamma_op(zero, tau, mu0, lam0, bca, dim2=dim2)

        def cg_init(E, bca, mu0, lam0, dim2=False):
            """Initial CG state in the SHIFTED form: the conjugate direction
            is built at the START of each step as p_k = r_k + beta_k p_{k-1}
            with beta_k = gamma_k / gamma_{k-1} (identical trajectory to the
            reference's end-of-step update, fibergen.cpp:23227-23229, but it
            lets the direction axpy fuse into the stress kernel).  Returns
            (eps, r, p_prev=0, gamma, gamma_prev) with gamma_prev = gamma so
            beta_0 = 1 against p_prev = 0 gives p_0 = r."""
            eps = shard(fields.const_field(grid, E, dt))
            r = krylov(eps, bca, mu0, lam0, dim2)
            r = shard(r + (jnp.asarray(E, dt).reshape(-1, 1, 1, 1) - eps))
            gamma0 = fields.inner_l2(r, r) + tiny
            return eps, r, jnp.zeros_like(r), gamma0, gamma0, metric(eps)

        nxyz = float(np.prod(grid.shape))

        def cg_step(eps, r, p_prev, gamma, gamma_prev, bca, mu0, lam0,
                    dim2=False):
            # the stacked low-mem step only implements the elasticity
            # Gamma; viscosity/mixed-BC low-memory solves ride the lm6
            # tuple-state family instead (lm6_step_gen)
            if (self._low_mem and bca is None and not dim2
                    and mode == "elasticity"):
                return cg_step_lowmem(eps, r, p_prev, gamma, gamma_prev,
                                      mu0, lam0)
            beta = gamma / gamma_prev
            if self._pallas_active and bca is None and not dim2:
                # fully fused hot path: direction update + stress + div in
                # one Pallas pass; gradient + CG denominator in another
                from ..ops import fft as fftmod
                from ..ops import green
                from ..ops import pallas_kernels as pk
                mu_x, lam_x = mat._all_iso()
                if par is None:
                    if self._sweep_active:
                        from ..ops import pallas_sweep as psw
                        f, p = psw.stress_div_beta_sweep(
                            grid, r, p_prev, beta, mu_x, lam_x, mu0, lam0)
                    else:
                        f, p = pk.stress_div_beta_staggered(
                            grid, r, p_prev, beta, mu_x, lam_x, mu0, lam0)
                    # fused transpose-free fft+G0+ifft chain: u_hat never
                    # hits HBM (g0_staggered_fused docstring)
                    u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0)
                    if self._sweep_active:
                        w, dot_raw = psw.eps_from_u_dot_sweep(
                            grid, jnp.zeros(self.dim, dt), u, p)
                    else:
                        w, dot_raw = pk.eps_from_u_dot_staggered(
                            grid, jnp.zeros(self.dim, dt), u, p)
                else:
                    f, p = _smap(
                        lambda rr, pp, bb, m, l: pk.stress_div_beta_staggered(
                            grid, rr, pp, bb, m, l, mu0, lam0, axis_name=_ax),
                        (_fs, _fs, _rs, _ms, _ms), (_fs, _fs))(
                        r, p_prev, beta, mu_x, lam_x)
                    u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0,
                                                 par=par)
                    w, dot_raw = _smap(
                        lambda uu, pp, ee: pk.eps_from_u_dot_staggered(
                            grid, ee, uu, pp, axis_name=_ax),
                        (_fs, _fs, _rs), (_fs, _rs))(
                        u, p, jnp.zeros(self.dim, dt))
                denom = dot_raw / nxyz + tiny
            elif self._visc_pallas and bca is None and not dim2:
                # fused viscosity Delta hot path: direction + stress + div
                # + tau mean in one sweep, dual-G0 chain, gradient + Delta
                # tau term + CG denominator in the second sweep
                w, p, dot_raw = fused_visc(r, p_prev, beta,
                                           jnp.zeros(self.dim, dt),
                                           mu0, lam0)
                denom = dot_raw / nxyz + tiny
            else:
                p = shard(r + beta * p_prev)
                w = krylov(p, bca, mu0, lam0, dim2)
                denom = fields.inner_l2_diff(p, p, w) + tiny
            alpha = gamma / denom
            eps2 = shard(eps + alpha * p)
            met = metric(eps2)
            r2 = shard(r - alpha * (p - w))
            delta = fields.inner_l2(r2, r2) + tiny
            return eps2, r2, p, delta, gamma, met

        def make_cg_multi(length):
            def cg_multi(eps, r, p, gamma, gamma_prev, bca, mu0, lam0,
                         dim2=False):
                """`length` CG iterations fused into one device program;
                returns per-iteration (gamma, metric) stacks."""
                def body(carry, _):
                    eps, r, p, gamma, gamma_prev = carry
                    eps2, r2, p2, delta, g, met = cg_step(
                        eps, r, p, gamma, gamma_prev, bca, mu0, lam0, dim2)
                    return (eps2, r2, p2, delta, g), (gamma, met)

                (eps, r, p, gamma, gamma_prev), (gammas, mets) = jax.lax.scan(
                    body, (eps, r, p, gamma, gamma_prev), None,
                    length=length)
                return eps, r, p, gamma, gamma_prev, gammas, mets
            return cg_multi

        def make_cg_init_chunk(length):
            def cg_init_chunk(E, bca, mu0, lam0, dim2=False):
                """Fused CG init + first `length` iterations: one device
                program, no host round-trip between the residual build and
                the first chunk (the separate init dispatch + float(gamma0)
                sync cost ~2 tunnel round-trips of the wall-to-tolerance
                budget).  gamma0 and met0 ride back with the chunk."""
                eps, r, p, gamma, gamma_prev, met0 = cg_init(
                    E, bca, mu0, lam0, dim2)
                gamma0 = gamma
                eps, r, p, gamma, gamma_prev, gammas, mets = \
                    make_cg_multi(length)(eps, r, p, gamma, gamma_prev,
                                          bca, mu0, lam0, dim2)
                return (eps, r, p, gamma, gamma_prev, gammas, mets,
                        gamma0, met0)
            return cg_init_chunk

        # ---- tuple-state low-memory CG (single-chip 512^3) -------------
        # The stacked low-mem step still peaked 17.13 GB at 512^3 f32: the
        # donated (6,nx,ny,nz) while-carries double-buffer through the .at
        # update chains (the compiler materializes a fresh 3 GB stacked
        # temp per update pass).  The lm6 path instead keeps eps/r/p as
        # SIX separate (nx,ny,nz) leaves ACROSS chunk programs: every leaf
        # aliases in place inside the while loop, the worst transient is
        # one 0.5 GB component, and no (6,...) buffer exists anywhere.
        # self.eps is restacked once after convergence.  Math is identical
        # to cg_step (same trajectory); single chip, trivial BCs,
        # elasticity/staggered, all-isotropic linear materials only.
        wv6 = [float(w) for w in voigt.weights(6)]

        def lm6_means(eps_t):
            """(mean strain, mean stress) from the tuple state — what
            bc_error needs mid-solve when self.eps does not exist (mixed-BC
            lm6 solves).  The iso mean stress matches mean_pk1's fast
            path (2 mu_x e + lam_x tr(e) on the diagonal)."""
            mu_x, lam_x = mat._all_iso()
            ltr = lam_x * (eps_t[0] + eps_t[1] + eps_t[2])
            Em = jnp.stack([e.mean() for e in eps_t])
            Sm = jnp.stack([
                (2.0 * mu_x * eps_t[c] + (ltr if c < 3 else 0.0)).mean()
                for c in range(6)])
            return Em, Sm

        def lm6_metric(eps_t):
            if kind == "epsilon":
                return jnp.sqrt(jnp.stack([(e * e).mean() for e in eps_t]))
            if kind in ("sigma", "energy"):
                mu_x, lam_x = mat._all_iso()
                ltr = lam_x * (eps_t[0] + eps_t[1] + eps_t[2])
                if kind == "sigma":
                    return jnp.stack([
                        (2.0 * mu_x * eps_t[c] + (ltr if c < 3 else 0.0)).mean()
                        for c in range(6)])
                s = jnp.zeros((), dt)
                for c in range(6):
                    sc = 2.0 * mu_x * eps_t[c] + (ltr if c < 3 else 0.0)
                    s = s + 0.5 * wv6[c] * (sc * eps_t[c]).mean()
                return s
            return jnp.zeros((), dt)

        # static law-level lambda test: when every phase law has lambda == 0
        # (the viscosity fluidity case) AND lam0 == 0, the trace term is
        # identically zero and all ltr passes drop out of the traced program
        def _law_lam_zero(p):
            f = getattr(p.law, "iso_moduli", None)
            if f is None:
                return False
            lam = f()[1]
            return isinstance(lam, (int, float)) and float(lam) == 0.0

        lm6_lam_zero = all(_law_lam_zero(p)
                           for p in getattr(mat, "phases", ()))

        def lm6_apply(p_t, mu0, lam0, visc, need_mean):
            """Displacement u = -G0' div((C-C0):p) for a 6-tuple direction,
            plus (optionally) the mean of the polarization tau.  The stress
            is never stacked (div_stress_diff_comp) and callers read
            component gradients off u on the fly; the three rows are
            barrier-chained with ltr recomputed per row so no shear-stress
            or trace temp stays live across rows.  visc switches the G0 to
            the dual Delta constants (mu_0' = -mu0, lambda' -> inf —
            exactly what delta_operator passes, fibergen.cpp:20446-20458).
            The tau mean costs one extra read of p and the moduli; its
            trace part is folded in as a scalar (mean is linear)."""
            from ..ops import green
            from ..ops import staggered as stag
            mu_x, lam_x = mat._all_iso()
            two_dmu = 2.0 * (mu_x - mu0)
            no_ltr = lm6_lam_zero and lam0 == 0.0
            rows = []
            pb = p_t
            for i in range(3):
                ltr = (0.0 if no_ltr
                       else (lam_x - lam0) * (pb[0] + pb[1] + pb[2]))
                rows.append(
                    stag.div_stress_diff_comp(grid, pb, two_dmu, ltr, i))
                rows[-1], pb = jax.lax.optimization_barrier((rows[-1], pb))
            f = jnp.stack(rows)
            if visc:
                u = green.g0_staggered_fused(grid, -mu0, float("inf"), f,
                                             -1.0)
            else:
                u = green.g0_staggered_fused(grid, mu0, lam0, f, -1.0)
            tmean = None
            if need_mean:
                mean_ltr = (0.0 if no_ltr else
                            ((lam_x - lam0)
                             * (pb[0] + pb[1] + pb[2])).mean())
                tmean = jnp.stack(
                    [(two_dmu * pb[c]).mean() + (mean_ltr if c < 3 else 0.0)
                     for c in range(6)])
            return u, tmean, pb

        def lm6_adj_tau(pb, tmean, bca, mu0, lam0, visc):
            """Constant mean adjustment adj (per component) and the tau
            recompute pieces (taufac, two_dmu, ltr field) for the w
            passes: w_c = eps_c(u) + adj[c] + taufac * tau_c.  Mirrors
            delta_operator's staggered branch (ops/gamma.py) and the
            mixed-BC mean correction (alpha = -1 krylov)."""
            mu_x, lam_x = mat._all_iso()
            no_ltr = lm6_lam_zero and lam0 == 0.0
            adj = None
            taufac = 0.0
            two_dmu = None
            ltrf = 0.0
            if visc:
                taufac = -1.0 / (2.0 * mu0)   # 2*alpha*mu0v, alpha = -1
                adj = -taufac * tmean         # E = 0 in the krylov apply
                two_dmu = 2.0 * (mu_x - mu0)
                if not no_ltr:
                    ltrf = (lam_x - lam0) * (pb[0] + pb[1] + pb[2])
            if bca is not None:
                R = bcmod.bc_correction(bca, tmean)
                adj = (-1.0) * R if adj is None else adj - R
            return adj, taufac, two_dmu, ltrf

        def lm6_w_comp(uc, c, pb, adj, taufac, two_dmu, ltrf, visc):
            from ..ops import staggered as stag
            w = stag.eps_staggered_comp(grid, uc, c)
            if adj is not None:
                w = w + adj[c]
            if visc:
                tc = two_dmu * pb[c] + (ltrf if c < 3 else 0.0)
                w = w + taufac * tc
            return w

        def lm6_step(eps_t, r_t, p_prev_t, gamma, gamma_prev, bca, mu0,
                     lam0, visc=False):
            beta = gamma / gamma_prev
            p_t = tuple(r_t[c] + beta * p_prev_t[c] for c in range(6))
            need_mean = visc or bca is not None
            u, tmean, pb = lm6_apply(p_t, mu0, lam0, visc, need_mean)
            adj, taufac, two_dmu, ltrf = lm6_adj_tau(
                pb, tmean, bca, mu0, lam0, visc)
            s = jnp.zeros((), dt)
            uc = u
            for c in range(6):
                w1c = lm6_w_comp(uc, c, pb, adj, taufac, two_dmu, ltrf,
                                 visc)
                s = s + wv6[c] * (pb[c] * (pb[c] - w1c)).sum()
                s, uc = jax.lax.optimization_barrier((s, uc))
            alpha = gamma / (s / nxyz + tiny)
            eps2, r2 = [], []
            delta = jnp.zeros((), dt)
            for c in range(6):
                w2c = lm6_w_comp(uc, c, pb, adj, taufac, two_dmu, ltrf,
                                 visc)
                rc = r_t[c] - alpha * (pb[c] - w2c)
                eps2.append(eps_t[c] + alpha * pb[c])
                r2.append(rc)
                delta = delta + wv6[c] * (rc * rc).sum()
                delta, uc = jax.lax.optimization_barrier((delta, uc))
            delta = delta / nxyz + tiny
            return (tuple(eps2), tuple(r2), tuple(pb), delta, gamma,
                    lm6_metric(tuple(eps2)))

        def lm6_init(E, bca, mu0, lam0, visc=False):
            """r0 = krylov(E) componentwise (eps0 == E so the E - eps term
            vanishes; see cg_init)."""
            Ej = jnp.asarray(E, dt)
            eps_t = tuple(jnp.full(grid.shape, Ej[c], dt) for c in range(6))
            need_mean = visc or bca is not None
            u, tmean, pb = lm6_apply(tuple(Ej[c] for c in range(6)),
                                     mu0, lam0, visc, need_mean)
            adj, taufac, two_dmu, ltrf = lm6_adj_tau(
                pb, tmean, bca, mu0, lam0, visc)
            r_t = []
            gamma0 = jnp.zeros((), dt)
            uc = u
            for c in range(6):
                rc = lm6_w_comp(uc, c, pb, adj, taufac, two_dmu, ltrf, visc)
                r_t.append(rc)
                gamma0 = gamma0 + wv6[c] * (rc * rc).sum()
                gamma0, uc = jax.lax.optimization_barrier((gamma0, uc))
            gamma0 = gamma0 / nxyz + tiny
            return eps_t, tuple(r_t), gamma0, lm6_metric(eps_t)

        def make_lm6_multi(length):
            def lm6_multi(eps_t, r_t, p_t, gamma, gamma_prev, bca=None,
                          mu0=None, lam0=None, visc=False):
                def body(carry, _):
                    e, r, p, g, gp = carry
                    e2, r2, p2, delta, g2, met = lm6_step(
                        e, r, p, g, gp, bca, mu0, lam0, visc)
                    return (e2, r2, p2, delta, g2), (g, met)

                (eps_t, r_t, p_t, gamma, gamma_prev), (gammas, mets) = \
                    jax.lax.scan(body, (eps_t, r_t, p_t, gamma, gamma_prev),
                                 None, length=length)
                return eps_t, r_t, p_t, gamma, gamma_prev, gammas, mets
            return lm6_multi

        def make_lm6_init_chunk(length):
            def lm6_init_chunk(E, bca=None, mu0=None, lam0=None,
                               visc=False):
                eps_t, r_t, gamma0, met0 = lm6_init(E, bca, mu0, lam0, visc)
                p0 = tuple(jnp.zeros(grid.shape, dt) for _ in range(6))
                out = make_lm6_multi(length)(eps_t, r_t, p0, gamma0, gamma0,
                                             bca, mu0=mu0, lam0=lam0,
                                             visc=visc)
                return (*out, gamma0, met0)
            return lm6_init_chunk

        def lm6_rhs_gamma(r_t):
            """Voigt-weighted mean <r,r> of a 6-leaf tuple (the lm6 gamma
            convention) — the correction-solve init piece."""
            gamma0 = jnp.zeros((), dt)
            for c in range(6):
                gamma0 = gamma0 + wv6[c] * (r_t[c] * r_t[c]).sum()
            return gamma0 / nxyz + tiny

        def lm6_zeros():
            return tuple(jnp.zeros(grid.shape, dt) for _ in range(6))

        # ---- batched multi-RHS CG -------------------------------------
        # calc_effective_properties solves dim load cases against the SAME
        # operator; the reference runs them strictly sequentially
        # (fibergen.cpp:26044-26066).  Here all B right-hand sides advance
        # in one vmapped device program: per-solve fixed costs (init,
        # tunnel syncs, convergence overshoot) are paid once, and small
        # grids that underutilize the chip get B-fold batching.
        def krylov_gen(eps, mu0, lam0, pallas_mid):
            """Generic-path Krylov apply for the vmapped program.  The
            manual-DMA sweep kernels have no vmap batching rule, so the
            fused single-RHS Pallas path is not used here; the XLA chain
            (matmul-DFT) batches cleanly over B x ncomp.  pallas_mid
            optionally keeps the Pallas spectral middle (its BlockSpec
            kernels do carry a batching rule).

            On a mesh the slab FFT (self.par) rides along: shard_map has a
            vmap batching rule, so each RHS's transform still runs the
            explicit all-to-all slab transpose per device — no GSPMD
            all-gather (asserted in tests/test_sharded_pallas.py)."""
            zero = jnp.zeros(self.dim, dt)
            tau = stress_diff(eps, mu0, lam0)
            return gammamod.gamma_operator(
                grid, mode, scheme, None, zero, mu0, lam0, tau, -1.0, 0.0,
                g0_solver=self.opt.g0_solver, freq_hack=self.opt.freq_hack,
                par=self.par, pallas_mid=pallas_mid and self.par is None)

        def cg_b_step(eps, r, p_prev, gamma, gamma_prev, mu0, lam0,
                      pallas_mid):
            beta = gamma / gamma_prev
            p = r + beta * p_prev
            w = krylov_gen(p, mu0, lam0, pallas_mid)
            denom = fields.inner_l2_diff(p, p, w) + tiny
            alpha = gamma / denom
            eps2 = eps + alpha * p
            r2 = r - alpha * (p - w)
            delta = fields.inner_l2(r2, r2) + tiny
            return eps2, r2, p, delta, gamma

        def _cg_b_scan(eps, r, p, gamma, gamma_prev, mu0, lam0, pallas_mid,
                       length):
            def body(carry, _):
                eps, r, p, gamma, gamma_prev = carry
                eps2, r2, p2, delta, g = jax.vmap(
                    lambda e, rr, pp, gg, gp: cg_b_step(
                        e, rr, pp, gg, gp, mu0, lam0, pallas_mid)
                )(eps, r, p, gamma, gamma_prev)
                return (eps2, r2, p2, delta, g), (gamma, jax.vmap(metric)(eps2))
            (eps, r, p, gamma, gamma_prev), (gammas, mets) = jax.lax.scan(
                body, (eps, r, p, gamma, gamma_prev), None, length=length)
            return eps, r, p, gamma, gamma_prev, gammas, mets

        def make_cg_b_init_chunk(length):
            def fn(Eb, mu0, lam0, pallas_mid=False):
                def init_one(E):
                    eps = jnp.broadcast_to(
                        jnp.asarray(E, dt).reshape(-1, 1, 1, 1),
                        (self.dim,) + grid.shape)
                    # r = -Gamma (C-C0) eps (+ E - eps == 0: eps is const E)
                    r = krylov_gen(eps, mu0, lam0, pallas_mid)
                    g0 = fields.inner_l2(r, r) + tiny
                    return eps, r, jnp.zeros_like(r), g0, g0, metric(eps)
                eps, r, p, gamma, gamma_prev, met0 = jax.vmap(init_one)(Eb)
                gamma0 = gamma
                eps, r, p, gamma, gamma_prev, gammas, mets = _cg_b_scan(
                    eps, r, p, gamma, gamma_prev, mu0, lam0, pallas_mid,
                    length)
                return (eps, r, p, gamma, gamma_prev, gammas, mets,
                        gamma0, met0)
            return fn

        def make_cg_b_multi(length):
            def fn(eps, r, p, gamma, gamma_prev, mu0, lam0,
                   pallas_mid=False):
                return _cg_b_scan(eps, r, p, gamma, gamma_prev, mu0, lam0,
                                  pallas_mid, length)
            return fn

        _b_cache = {}

        def cg_b_multi_n(length):
            fn = _b_cache.get(("multi", length))
            if fn is None:
                fn = mjit(make_cg_b_multi(length),
                          static_argnames=("mu0", "lam0", "pallas_mid"),
                          donate_argnums=(1, 2, 3))
                _b_cache[("multi", length)] = fn
            return fn

        def cg_b_init_chunk_n(length):
            fn = _b_cache.get(("init", length))
            if fn is None:
                fn = mjit(make_cg_b_init_chunk(length),
                          static_argnames=("mu0", "lam0", "pallas_mid"))
                _b_cache[("init", length)] = fn
            return fn

        self._cg_b_multi_n = cg_b_multi_n
        self._cg_b_init_chunk_n = cg_b_init_chunk_n

        def batch_means(eps_b):
            return jax.vmap(lambda e: (fields.mean(e), mat.mean_pk1(e)))(
                eps_b)

        self._batch_means_fn = batch_means  # jitted with mjit below

        def cg_recompute_residual(eps, E, bca, mu0, lam0, dim2=False):
            """Exact residual (cg_reinit path, fibergen.cpp:23231-23245);
            the conjugate update p = r + (delta/gamma) p happens in the
            next step's direction build."""
            r = krylov(eps, bca, mu0, lam0, dim2)
            r = r + (jnp.asarray(E, dt).reshape(-1, 1, 1, 1) - eps)
            delta = fields.inner_l2(r, r) + tiny
            return r, delta

        def mean_values(eps):
            return fields.mean(eps), mat.mean_pk1(eps)

        def eig_range(eps):
            return mat.eig_range(eps, zero_trace=(mode == "viscosity"))

        def polar_step(eps, E, P0, bca, mu0, lam0):
            """One Eyre-Milton iteration (polarizationScheme,
            fibergen.cpp:20536-20554)."""
            tau = mat.polarization(mu0, eps)
            P00 = fields.mean(tau)
            eta = gamma_op(P00 + jnp.asarray(P0, dt), tau, mu0, lam0, bca,
                           alpha=-4.0 * mu0, beta=1.0)
            return eta, metric(eta)

        def polar_finish(eps, mu0):
            return mat.polarization(mu0, eps, inv=True)

        def nesterov_step(tau, eps_in, q_old, n, E, bca, mu0, lam0,
                          dim2=False):
            """One Nesterov iteration (runNesterov, fibergen.cpp:21999-22043)."""
            tau2, met = basic_step(tau, E, bca, mu0, lam0, dim2)
            eps2 = eps_in - tau2
            q = fields.inner_l2(tau2, tau2) * (grid.dx * grid.dy * grid.dz)
            return tau2, eps2, q, met

        def calc_step_alpha(eps, deps):
            """Exact line-search step (calcStep, fibergen.cpp:21853-21914)."""
            S = mat.pk1(deps)
            w = jnp.asarray(voigt.weights(self.dim), dt).reshape(-1, 1, 1, 1)
            s1 = (eps * w * S).sum()
            s2 = (deps * w * S).sum()
            return jnp.where(s2 == 0, 0.0, -s1 / s2)

        def mjit(fn, **kw):
            """jit with the material's array state passed as the leading
            `mf` pytree argument (bound into `mat` during tracing) instead
            of being captured as closure constants — constants are
            serialized into every compiled program (one copy per kernel;
            fatal for 512^3 fields through a remote-compile tunnel),
            arguments are passed by reference."""
            def wrapped(mf, *args, **kwargs):
                with mat.bound(mf):
                    return fn(*args, **kwargs)
            wrapped.__name__ = getattr(fn, "__name__", "kernel")
            return jax.jit(wrapped, **kw)

        jit = partial(mjit, static_argnames=("mu0", "lam0", "dim2"))
        self._k_basic = jit(basic_step)
        self._k_krylov = jit(krylov)
        self._k_cg_init = jit(cg_init)
        self._k_cg_step = jit(cg_step)

        # length-parameterized chunk kernels (adaptive drain sizes are
        # powers of two <= check_every, so at most log2(K)+1 programs
        # compile; all hit the persistent compilation cache afterwards)
        _chunk_cache = {}

        def cg_multi_n(length):
            fn = _chunk_cache.get(("multi", length))
            if fn is None:
                fn = mjit(make_cg_multi(length),
                          static_argnames=("mu0", "lam0", "dim2"),
                          donate_argnums=(1, 2, 3))
                _chunk_cache[("multi", length)] = fn
            return fn

        def cg_init_chunk_n(length):
            fn = _chunk_cache.get(("init", length))
            if fn is None:
                fn = mjit(make_cg_init_chunk(length),
                          static_argnames=("mu0", "lam0", "dim2"))
                _chunk_cache[("init", length)] = fn
            return fn

        def lm6_multi_n(length):
            fn = _chunk_cache.get(("lm6", length))
            if fn is None:
                fn = mjit(make_lm6_multi(length),
                          static_argnames=("mu0", "lam0", "visc"),
                          donate_argnums=(1, 2, 3))
                _chunk_cache[("lm6", length)] = fn
            return fn

        def lm6_init_chunk_n(length):
            fn = _chunk_cache.get(("lm6i", length))
            if fn is None:
                fn = mjit(make_lm6_init_chunk(length),
                          static_argnames=("mu0", "lam0", "visc"))
                _chunk_cache[("lm6i", length)] = fn
            return fn


        self._cg_multi_n = cg_multi_n
        self._cg_init_chunk_n = cg_init_chunk_n
        # correction-solve init pieces (mixed-precision refinement): two
        # separate executions so the donated d/p buffers are distinct
        self._k_zeros_field = jax.jit(
            lambda: jnp.zeros((self.dim,) + grid.shape, dt))
        self._k_rhs_gamma = jax.jit(lambda rhs: fields.inner_l2(rhs, rhs)
                                    + tiny)
        self._lm6_multi_n = lm6_multi_n
        self._lm6_init_chunk_n = lm6_init_chunk_n
        self._k_lm6_rhs_gamma = jax.jit(lm6_rhs_gamma)
        self._k_lm6_zeros = jax.jit(lm6_zeros)
        self._k_lm6_means = mjit(lm6_means)
        self._k_stack6 = jax.jit(lambda t: jnp.stack(t))
        # tuple-state low-mem qualification (per-solve bca/dim2 checked in
        # _run_cg); laws checked for iso_moduli WITHOUT forcing an eager
        # _all_iso mix (eager jnp on axon remote-compiles tiny programs)
        self._lm6_capable = (
            self._low_mem and self.dim == 6 and par is None
            and getattr(mat, "_iso_linear", False)
            and all(getattr(p.law, "iso_moduli", None) is not None
                    for p in getattr(mat, "phases", ())))
        self._k_cg_multi = cg_multi_n(max(1, self.opt.check_every))
        self._k_cg_reinit = jit(cg_recompute_residual)
        self._k_means = mjit(mean_values)
        self._k_b_means = mjit(self._batch_means_fn)
        self._k_eig = mjit(eig_range)
        self._k_metric = mjit(metric)
        self._k_polar_step = jit(polar_step)
        self._k_polar_finish = mjit(polar_finish, static_argnames=("mu0",))
        self._k_nesterov = jit(nesterov_step)
        self._k_calc_step = mjit(calc_step_alpha)

    def _bca(self):
        return bcmod.to_arrays(self._bc, self.dtype)

    def _dim2_ok(self, bca, E) -> bool:
        """Per-solve qualification of the true DIM=2 pipeline: a capable
        solver (see _dim2_capable), trivial BCs (no per-iteration mean
        corrections), and no out-of-plane shear loading — with those, the
        out-of-plane components provably stay at their prescribed constants
        and dropping them from the hot path is exact."""
        if not getattr(self, "_dim2_capable", False) or bca is not None:
            return False
        if self.dim == 6:
            if float(E[3]) != 0.0 or float(E[4]) != 0.0:
                return False
            # _iso_linear is a class-level capability flag; ACTUAL per-law
            # isotropy (required so in-plane strain cannot excite the
            # out-of-plane shear rows) is decided by _all_iso()
            try:
                ok = self.mat._all_iso() is not None
            except (AttributeError, NotImplementedError, TypeError):
                ok = False
        else:
            ok = True
        if ok and not getattr(self, "_dim2_logged", False):
            LOG.info("true DIM=2 pipeline active (in-plane staggered ops, "
                     "2-D spectral chain)")
            self._dim2_logged = True
        return ok

    # --------------------------------------------------------- ref material
    def calc_ref_material(self):
        """Update (mu_0, lambda_0) from per-voxel tangent eigenvalue bounds
        (calcRefMaterial, fibergen.cpp:22283-22313).

        For LINEAR laws the tangent (hence the bounds) is independent of
        eps, so the reduction is memoized on the identity of the material's
        field arrays (jax arrays are immutable: same objects => same
        values).  Repeat solves against the same material — every loadstep,
        every load case of calc_effective_properties, the timed second
        bench solve — skip the eig pass and its host sync."""
        # evaluate the host-split gate BEFORE capturing the field slots:
        # needs_host_eig may warm the mixed-moduli cache (_all_iso), which
        # ADDS slots — a stale mf would then fail mat.bound()'s state check
        host_eig = (getattr(self.mat, "needs_host_eig", None) is not None
                    and self.mat.needs_host_eig(self.eps))
        mf = self.mat.fields()
        linear = getattr(self.mat, "_iso_linear", False) or (
            self.mode in ("elasticity", "heat", "porous", "viscosity"))
        key = (tuple(id(x) for x in jax.tree_util.tree_leaves(mf))
               if linear else None)
        if key is not None and getattr(self, "_eig_memo", None) is not None \
                and self._eig_memo[0] == key:
            lmin, lmax = self._eig_memo[1]
        else:
            with timer("calc ref material"):
                if host_eig:
                    # large nonlinear grids: one grid-sized eigvalsh
                    # program crashed the TPU worker at 256^3; split the
                    # pass across short reused slice programs instead
                    lmin, lmax = self.mat.eig_range_host(
                        self.eps, zero_trace=(self.mode == "viscosity"))
                else:
                    lmin, lmax = self._k_eig(mf, self.eps)
                lmin, lmax = float(lmin), float(lmax)
            if key is not None:
                self._eig_memo = (key, (lmin, lmax))
        if lmin < 0:
            LOG.warn(f"negative tangent eigenvalue ({lmin}); cutting off at 0")
            lmin = 0.0
        if self.opt.method == "polarization":
            mu = math.sqrt(lmin * lmax)
        else:
            mu = 0.5 * (lmin + lmax)
        self.mu_0 = 0.5 * self.opt.ref_scale * mu
        self.lambda_0 = 0.0
        LOG.info(f"adjusting mu_ref={self.mu_0:g}, lambda_ref={self.lambda_0:g}")
        self._bc = bcmod.make_bc_projector(
            self.P, self.mu_0, self.lambda_0, self.opt.bc_relax)

    # -------------------------------------------------------------- run
    def run(self) -> bool:
        """Full solve over all loadsteps (run, fibergen.cpp:21247-21398).
        Returns True on failure/cancel like the reference.

        Set FIBERGEN_TPU_PROFILE=<dir> to capture a jax profiler trace of
        the whole solve (view with tensorboard/xprof) — the TPU-native
        analogue of the reference's per-kernel Timer registry."""
        import os as _os
        if self.opt.fft_backend is not None:
            # re-apply this solver's spectral-backend choice so traces (and
            # mid-run retraces after a mu_0/lambda_0 recompile) use it even
            # when another solver instance changed the process global
            from ..ops import fft as _fftmod
            _fftmod.FFT_BACKEND = self.opt.fft_backend
        pdir = _os.environ.get("FIBERGEN_TPU_PROFILE")
        if pdir:
            try:
                jax.profiler.start_trace(pdir)
            except Exception as e:  # noqa: BLE001 - profiling is best-effort
                LOG.warn(f"profiler unavailable: {e}")
                pdir = None
        try:
            return self._run_impl()
        finally:
            if pdir:
                try:
                    jax.profiler.stop_trace()
                    LOG.info(f"profiler trace written to {pdir}")
                except Exception as e:  # noqa: BLE001
                    LOG.warn(f"profiler stop failed: {e}")

    def _run_impl(self) -> bool:
        self.residuals = []
        self._canceled = False
        self._diverged = False
        self.eps64 = None
        self._refiner = None

        LOG.info(f"RVE: dims={self.grid.dx}x{self.grid.dy}x{self.grid.dz} "
                 f"voxels={self.grid.nx}x{self.grid.ny}x{self.grid.nz}")
        LOG.info(f"mode: {self.opt.method} {self.scheme} {self.mode} "
                 f"{self.opt.cg_inner_product}")
        LOG.info(f"tolerances: relative={self.opt.tol} absolute={self.opt.abs_tol}")
        for p in self.mat.phases:
            LOG.info(f" - {p.name}: {p.law}")

        # BC compatibility checks (fibergen.cpp:21352-21364)
        Q = voigt.id4(self.dim) - self.P
        eps_m = math.sqrt(np.finfo(np.float64).eps)
        if voigt.norm_2(voigt.dyad4_mv(self.P, self.S)) > eps_m * (voigt.norm_2(self.S) or 1):
            if voigt.norm_2(self.S) > 0:
                raise SolverError("Incompatible stress boundary condition specified")
        if voigt.norm_2(voigt.dyad4_mv(Q, self.E)) > eps_m * (voigt.norm_2(self.E) or 1):
            if voigt.norm_2(self.E) > 0:
                raise SolverError("Incompatible strain boundary condition specified")

        # precompute the mixed-moduli cache eagerly (device constants reused
        # across all jitted kernels instead of re-mixed per compilation)
        if all(p.phi is not None for p in self.mat.phases):
            try:
                self.mat._all_iso()
            except (AttributeError, NotImplementedError):
                pass

        # initial field (fibergen.cpp:21368-21380)
        if self.mode == "hyperelasticity":
            self.eps = fields.const_field(self.grid, self._id, self.dtype)
        else:
            self.eps = fields.const_field(self.grid, np.zeros(self.dim), self.dtype)

        if np.isfinite(self.mu_0) and self._bc is None:
            self._bc = bcmod.make_bc_projector(
                self.P, self.mu_0, self.lambda_0, self.opt.bc_relax)

        self._reset_stall()

        import time as _time
        t0 = _time.perf_counter()
        ret = self._run_loadstepping(self.E, self.S)
        self.solve_time = _time.perf_counter() - t0
        return ret

    def get_fft_time(self) -> float:
        """Measured FFT wall time of the last solve (the reference tracks
        FFTW seconds directly, fibergen.cpp:15392-15393).  XLA fuses the
        transforms into the single iteration program, so exact in-loop
        attribution does not exist; instead ONE spectral round trip of the
        ACTIVE backend is timed and multiplied by the iteration count:

          * fused Pallas path: the transpose-free matmul-DFT chain with an
            identity spectral apply (fft.fftn_apply_ifftn_mm) — the op the
            hot loop actually runs;
          * sharded path: the slab-decomposed forward+inverse pair
            (includes the all-to-all transposes);
          * otherwise: ops.fft.fftn/ifftn (auto matmul-DFT or XLA FFT).
        """
        iters = len(self.residuals)
        if iters == 0 or self.eps is None:
            return 0.0
        from ..ops import fft as fftmod
        # staggered schemes transform the force field (3 components for
        # vector modes, 1 for heat/porous); collocated/Willot transform the
        # full tensor
        if self.scheme in ("staggered", "half_staggered", "full_staggered"):
            ncomp = 1 if self.dim == 3 else 3
        else:
            ncomp = self.dim
        if self.par is not None:
            from ..ops import pallas_chain
            if (self.scheme in ("staggered", "half_staggered",
                                "full_staggered")
                    and self.opt.g0_solver == "fft"
                    and fftmod.mm_enabled(self.grid.shape)
                    and pallas_chain.middle_slab_enabled(
                        self.par, self.grid.shape, ncomp)):
                backend = "slab_mid"
            else:
                backend = "slab"
        elif (getattr(self, "_dim2_last", False)
                and fftmod.mm2d_enabled(self.grid.shape)):
            # true DIM=2 solve on the 2-D chain.  Staggered transforms the
            # in-plane force (2 comps elasticity, 1 heat); the collocated
            # 2-D Gamma chains carry the in-plane tau components instead
            # (3 = [xx, yy, xy] elasticity, 2 heat — green.py *_fused_2d)
            if self.scheme in ("staggered", "half_staggered",
                               "full_staggered"):
                ncomp = 1 if self.dim == 3 else 2
            else:
                ncomp = 2 if self.dim == 3 else 3
            backend = "chain2d"
        elif (fftmod.mm_enabled(self.grid.shape)
                and ((self.scheme in ("staggered", "half_staggered",
                                      "full_staggered")
                      and self.opt.g0_solver == "fft")
                     or (self.scheme == "collocated"
                         and not self.opt.freq_hack))):
            # every single-chip staggered G0 apply — fused Pallas path,
            # jnp fallback, mixed BC, heat/hyper/viscosity — and the
            # collocated Gamma run the transpose-free chain on the matmul
            # backend (ops/gamma.py); willot and freq_hack use separate
            # transforms.  Staggered chains on qualifying shapes run the
            # Pallas spectral middle (ops/pallas_chain.py) — sample that
            # op, not the XLA chain; the viscosity collocated path samples
            # its zero-trace fused chain.
            from ..ops import pallas_chain
            if (self.scheme in ("staggered", "half_staggered",
                                "full_staggered")
                    and self.sharding is None
                    and pallas_chain.middle_enabled(self.grid.shape)):
                backend = "chain_mid"
            elif (self.mode == "viscosity" and self.scheme == "collocated"
                    and self.sharding is None):
                backend = "chain_zt"
            else:
                backend = "chain"
        else:
            backend = "pair"
        key = (ncomp, self.grid.shape, str(self.dtype), backend)
        if getattr(self, "_fft_pair_sample", None) != key:
            import time as _time
            import jax as _jax

            if backend == "slab":
                @_jax.jit
                def pair(x):
                    return self.par.ifftn(self.par.fftn(x), self.grid.shape)
            elif backend == "slab_mid":
                from ..ops import green as greenmod

                if ncomp == 1:
                    @_jax.jit
                    def pair(x):
                        return greenmod.g0_staggered_heat_fused(
                            self.grid, 1.0, 0.0, x, par=self.par)
                else:
                    @_jax.jit
                    def pair(x):
                        return greenmod.g0_staggered_fused(
                            self.grid, 1.0, 0.0, x, par=self.par)
            elif backend == "chain2d":
                @_jax.jit
                def pair(x):
                    return fftmod.fft2_apply_ifft2_mm(
                        x, lambda re, im: (re, im))
            elif backend == "chain_zt":
                from ..ops import green as greenmod

                @_jax.jit
                def pair(x):
                    return greenmod.gamma_collocated_zt_fused(
                        self.grid, np.zeros(self.dim), -1.0, float("inf"),
                        x)
            elif backend == "chain_mid":
                from ..ops import green as greenmod
                if ncomp == 1:
                    @_jax.jit
                    def pair(x):
                        return greenmod.g0_staggered_heat_fused(
                            self.grid, 1.0, 0.0, x)
                else:
                    @_jax.jit
                    def pair(x):
                        return greenmod.g0_staggered_fused(
                            self.grid, 1.0, 0.0, x)
            elif backend == "chain":
                @_jax.jit
                def pair(x):
                    return fftmod.fftn_apply_ifftn_mm(
                        x, lambda re, im: (re, im))
            else:
                @_jax.jit
                def pair(x):
                    return fftmod.ifftn(fftmod.fftn(x), self.grid.shape)

            x = fields.const_field(self.grid, np.ones(ncomp), self.dtype)
            if backend in ("slab", "slab_mid"):
                x = _jax.device_put(x, self.sharding)
            _jax.block_until_ready(pair(x))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = _time.perf_counter()
                _jax.block_until_ready(pair(x))
                best = min(best, _time.perf_counter() - t0)
            self._fft_pair_sample = key
            self._fft_pair_time = best
        return self._fft_pair_time * iters

    def _loadstep_params(self):
        n = max(1, int(self.opt.loadsteps))
        params = [i / n for i in range(n + 1)]
        first = self.opt.first_loadstep
        if first < 0:
            first = 0 if len(params) > 2 else 1
        return params, first

    def _run_loadstepping(self, Emax, Smax) -> bool:
        """Loadstep loop with optional solution extrapolation
        (runLoadsteppingSolver, fibergen.cpp:21584-21685) and automatic
        divergence recovery: the midpoint-split retry the reference left
        disabled (fibergen.cpp:21661-21671 `#if 0`) — on NaN or
        indefinite-operator abort the last converged state is restored and
        the loadstep is halved, up to ``max_loadstep_splits`` times."""
        params, first = self._loadstep_params()
        params = list(params)
        history = []  # (t, eps) for extrapolation
        splits = 0

        istep = first
        while istep < len(params):
            t = params[istep]
            E = t * np.asarray(Emax)
            S = t * np.asarray(Smax)
            if self.mode == "hyperelasticity":
                E = E + (1 - t) * voigt.dyad4_mv(self.P, self._id)

            if len(params) > 2:
                LOG.info(f"*** loadstep {istep}/{len(params)-1} parameter {t} ***")

            # snapshot the last-converged state so a diverged attempt can be
            # rolled back (jax arrays are immutable: holding the reference
            # is a free checkpoint).  At the FIRST loadstep self.eps is
            # still the constant seed _run_impl just created — snapshot the
            # recipe (None), not the array: holding the (dim,n,n,n) buffer
            # would pin 3 GiB of HBM next to the 512^3 low-memory CG
            # chunks for the whole solve (runtime OOM the AOT estimate
            # cannot see).
            eps_entry = None if istep == first else self.eps
            history_entry = list(history)

            order = self.opt.loadstep_extrapolation_order
            if order > 0 and istep > first:
                history.append((params[istep - 1], self.eps))
                history = history[-(order + 1):]
                if len(history) >= 2:
                    self.eps = _extrapolate(
                        history, t, self.opt.loadstep_extrapolation_method,
                        self.dim)

            self._diverged = False
            self.run_solver(E, S)
            if self._diverged:
                can_split = (self.opt.max_loadstep_splits > 0
                             and splits < self.opt.max_loadstep_splits
                             and istep >= 1)
                if not can_split:
                    LOG.error("loadsteps canceled")
                    return True
                mid = 0.5 * (params[istep] + params[istep - 1])
                LOG.warn(
                    f"loadstep {t:g} diverged: restoring "
                    f"state at {params[istep - 1]:g} and splitting at "
                    f"parameter {mid:g} "
                    f"(split {splits + 1}/{self.opt.max_loadstep_splits})")
                params.insert(istep, mid)
                splits += 1
                if eps_entry is None:
                    vec = (self._id if self.mode == "hyperelasticity"
                           else np.zeros(self.dim))
                    self.eps = fields.const_field(self.grid, vec, self.dtype)
                else:
                    self.eps = eps_entry
                history = history_entry
                self._canceled = False
                self._diverged = False
                continue
            if self._canceled:
                LOG.error("loadsteps canceled")
                return True
            # per-loadstep VTK dump (performLoadstepActions,
            # fibergen.cpp:21434-21439)
            if self.loadstep_writer is not None:
                self.loadstep_writer(istep)
            if self.loadstep_callback and self.loadstep_callback():
                LOG.info("Loadstep callback break request.")
                return True
            istep += 1
        return False

    def _reset_stall(self):
        """Reset the stagnation tracker; called per solve phase (each
        loadstep, and each Newton inner solve) since relative errors
        restart near 1 there."""
        self._best_rel = float("inf")
        self._stall = 0

    def run_solver(self, E, S):
        """Method dispatch (runSolver, fibergen.cpp:21401-21433)."""
        self._reset_stall()
        self._tol_active = self.opt.tol
        self._current_E = np.asarray(E)
        self._current_S = np.asarray(S)
        m = self.opt.method
        if m == "basic":
            self._run_basic(E, S)
        elif m == "cg":
            self._run_cg(E, S)
        elif m == "polarization":
            self._run_polarization(E, S)
        elif m == "nesterov":
            self._run_nesterov(E, S)
        elif m == "basic+el":
            self._run_basic_el(E, S)
        elif m == "nl_cg":
            self._run_nlcg(E, S)
        else:
            raise SolverError(f"Unknown solver method '{m}'")
        if self.opt.print_mean:
            self._print_mean_values()

    # ------------------------------------------------------------ schemes
    def _maybe_update_ref(self):
        if self.opt.update_ref != "never" or not np.isfinite(self.mu_0):
            self.calc_ref_material()
        elif self._bc is None:
            self._bc = bcmod.make_bc_projector(
                self.P, self.mu_0, self.lambda_0, self.opt.bc_relax)

    def _bc_mean(self, E, S):
        return np.asarray(bcmod.calc_bc_mean(self._bc, E, S), dtype=np.float64)

    def _run_basic(self, E0, S0):
        """Fixed-point scheme eps <- E - Gamma (C-C0) eps
        (runBasic, fibergen.cpp:21716-21805)."""
        self._maybe_update_ref()
        E = self._bc_mean(E0, S0)
        ee = make_estimator(self.opt.error_estimator)
        ee.start(self._k_metric(self.mat.fields(), self.eps))
        bca = self._bca()
        mu0, lam0 = self.mu_0, self.lambda_0
        dim2 = self._dim2_ok(bca, E)
        self._dim2_last = dim2
        Ej = jnp.asarray(E, self.dtype)

        it = 1
        while True:
            self.eps, met = self._k_basic(self.mat.fields(), self.eps, Ej, bca,
                                          mu0=mu0, lam0=lam0, dim2=dim2)
            ee.update(np.asarray(met))
            it, done = self._converged(it, ee.abs_error(), ee.rel_error())
            if done:
                break

    def _run_cg(self, E0, S0):
        if self.mode == "hyperelasticity":
            return self._run_cg_hyper(E0, S0)
        return self._run_cg_elasticity(E0, S0)

    def _run_cg_elasticity(self, E0, S0):
        """Linear CG on (I + Gamma(C-C0)) eps = E
        (runCGElasticity, fibergen.cpp:23153-23247)."""
        self._maybe_update_ref()
        E = self._bc_mean(E0, S0)
        ee = make_estimator(self.opt.error_estimator)
        bca = self._bca()
        mu0, lam0 = self.mu_0, self.lambda_0
        dim2 = self._dim2_ok(bca, E)
        self._dim2_last = dim2
        Ej = jnp.asarray(E, self.dtype)

        # mixed-precision refinement: when it will engage, the f32 phase
        # only needs to reach the refinement entry tolerance (the sweeps
        # finish the job) — this also avoids the 50-iteration stagnation
        # stall a deep tolerance would otherwise pay at the f32 floor
        refine = self._refine_ok(bca, E)
        if refine:
            self._tol_active = max(self.opt.tol, 1e-6)

        K = max(1, int(self.opt.check_every))
        if K > 1:
            # the lm6 tuple-state family covers trivial-BC elasticity,
            # the viscosity Delta staggered path, and mixed-BC (bca)
            # elasticity/viscosity solves (lm6_step with bca/visc)
            lm6 = getattr(self, "_lm6_capable", False) and not dim2
            self._run_cg_chunked(ee, Ej, bca, mu0, lam0, dim2, K, lm6=lm6)
            if refine and not (self._canceled or self._diverged):
                self._refine(E, bca, mu0, lam0)
            return

        eps, r, p, gamma, gamma_prev, met0 = self._k_cg_init(
            self.mat.fields(), Ej, bca, mu0=mu0, lam0=lam0, dim2=dim2)
        ee.start(np.asarray(met0))
        gamma0 = float(gamma)
        gamma = gamma0
        gamma_prev = gamma0

        it = 0
        while True:
            eps, r, p, delta, gp, met = self._k_cg_step(
                self.mat.fields(), eps, r, p, gamma, gamma_prev, bca,
                mu0=mu0, lam0=lam0, dim2=dim2)
            self.eps = eps  # keep live state visible to bc_error/callbacks
            if ee.metric_kind == "residual":
                ee.update_cg(gamma, gamma0)
            else:
                ee.update(np.asarray(met))
            it, done = self._converged(it, ee.abs_error(), ee.rel_error())
            if done:
                break
            if self.opt.cg_reinit > 0 and (it % self.opt.cg_reinit) == 0:
                r, delta = self._k_cg_reinit(
                    self.mat.fields(), eps, Ej, bca, mu0=mu0, lam0=lam0,
                    dim2=dim2)
            gamma_prev = float(gp) if not isinstance(gp, float) else gp
            gamma = float(delta)
        if refine and not (self._canceled or self._diverged):
            self._refine(E, bca, mu0, lam0)

    def _run_cg_chunked(self, ee, Ej, bca, mu0, lam0, dim2, K, lm6=False):
        """check_every > 1 host loop for the linear CG.

        Two latency hiders on top of the fused K-iteration chunks:

        * pipelining — the next chunk is dispatched BEFORE the previous
          chunk's metrics are pulled to host, so jax's async dispatch
          overlaps the ~28 ms tunnel round-trip with device compute;
        * adaptive drain — once the residual trajectory predicts tolerance
          within ~one chunk, the pipeline drains into exactly-sized
          power-of-two chunks queued back-to-back, so a 20-iteration solve
          executes ~21 iterations instead of rounding up to 4 full chunks
          (32: the convergence overshoot the round-3 bench measured as
          ~47% of wall-to-tolerance).

        CG init is fused into the first chunk (no separate dispatch, no
        float(gamma0) sync).  On convergence the device state may be up to
        one margin iteration past the detection point, i.e. strictly MORE
        converged.  Matches runCGElasticity + converged
        (fibergen.cpp:23153-23247, 21164) on the trajectory itself.
        """
        from collections import deque
        mf = self.mat.fields()
        visc = self.mode == "viscosity"
        self._lm6_last = lm6     # refinement picks the matching correction driver
        if lm6:
            # tuple-state low-memory path: eps/r/p are 6-tuples of
            # (nx,ny,nz) leaves across programs; self.eps is restacked
            # once after convergence.  bca/visc select the mixed-BC mean
            # correction and the Delta-scheme tau term inside lm6_step.
            # The (6,nx,ny,nz) const field _run_impl seeded is never an
            # input here (lm6_init rebuilds eps_t from E on device) — at
            # 512^3 it is 3 GiB that would otherwise sit in HBM next to
            # the 14.1 GiB chunk program and tip it over the 15.75 GiB
            # capacity at runtime (the AOT estimate can't see it).
            self.eps = None
            self._lm6_eps_t = None
            eps, r, p, gamma, gamma_prev, gammas, mets, g0dev, met0 = \
                self._lm6_init_chunk_n(K)(mf, Ej, bca=bca, mu0=mu0,
                                          lam0=lam0, visc=visc)
            self._lm6_eps_t = eps
        else:
            eps, r, p, gamma, gamma_prev, gammas, mets, g0dev, met0 = \
                self._cg_init_chunk_n(K)(mf, Ej, bca,
                                         mu0=mu0, lam0=lam0, dim2=dim2)
            self.eps = eps
        pend = deque([(K, gammas, mets)])
        dispatched = K
        state = {"gamma0": None, "it": 0, "done": False}

        def dispatch(L):
            nonlocal eps, r, p, gamma, gamma_prev, dispatched
            if lm6:
                eps, r, p, gamma, gamma_prev, gs, ms = self._lm6_multi_n(L)(
                    mf, eps, r, p, gamma, gamma_prev, bca=bca,
                    mu0=mu0, lam0=lam0, visc=visc)
                self._lm6_eps_t = eps
            else:
                eps, r, p, gamma, gamma_prev, gs, ms = self._cg_multi_n(L)(
                    mf, eps, r, p, gamma, gamma_prev, bca,
                    mu0=mu0, lam0=lam0, dim2=dim2)
                self.eps = eps
            pend.append((L, gs, ms))
            dispatched += L

        def check_front():
            L, gs, ms = pend.popleft()
            if state["gamma0"] is None:
                ee.start(np.asarray(met0))
                state["gamma0"] = float(g0dev)
            gs = np.asarray(gs)
            ms = np.asarray(ms)
            for k in range(L):
                if ee.metric_kind == "residual":
                    ee.update_cg(float(gs[k]), state["gamma0"])
                else:
                    ee.update(ms[k])
                state["it"], state["done"] = self._converged(
                    state["it"], ee.abs_error(), ee.rel_error())
                if state["done"]:
                    return

        adapt = (self.opt.adaptive_drain == "on"
                 or (self.opt.adaptive_drain == "auto"
                     and int(np.prod(self.grid.shape))
                     >= ADAPTIVE_DRAIN_MIN_VOXELS))
        while not state["done"]:
            if len(pend) <= 1:
                rem = self._predict_remaining(K, dispatched) if adapt else None
                if rem is None or rem > K:
                    dispatch(K)
                else:
                    # one margin iteration absorbs prediction error; a short
                    # prediction just re-enters this branch after the drain
                    n = rem + 1
                    while n > 0:
                        L = min(1 << (int(n).bit_length() - 1), K)
                        dispatch(L)
                        n -= L
            check_front()
        if lm6:
            # free r/p leaves BEFORE stacking so the (6,...) output buffer
            # fits next to the eps leaves at 512^3
            del r, p
            self._lm6_eps_t = None
            self.eps = self._k_stack6(eps)

    def _refine_ok(self, bca, E) -> bool:
        """Per-solve qualification of mixed-precision iterative refinement
        (solvers/refine.py).  Logs the reason when a deep tolerance is
        requested but refinement cannot engage."""
        o = self.opt
        if o.refine == "off" or o.method != "cg":
            return False
        want = o.refine == "on" or o.tol < 3e-7
        if not want:
            return False
        if self.dtype != jnp.float32:
            return False  # f64 fields reach deep tolerances natively
        why = None
        if self.mode == "hyperelasticity":
            why = "hyperelastic Newton is out of refinement scope"
        elif bca is not None:
            why = "mixed BCs are out of refinement scope"
        elif voigt.norm_2(self._current_S) != 0.0:
            why = "prescribed stress is out of refinement scope"
        elif self.sharding is not None:
            why = "sharded solves are out of refinement scope"
        if why is not None:
            LOG.warn(f"tolerance {o.tol:g} is below the f32 floor but "
                     f"mixed-precision refinement cannot engage: {why}; "
                     "the stagnation guard will stop at the floor")
            return False
        return True

    def _refine(self, E, bca, mu0, lam0):
        """Mixed-precision refinement sweeps: f64 host residual (CPU
        backend, same operator code) + f32 device correction solves.  See
        solvers/refine.py for the method; matches the reference's
        double-precision deep-tolerance capability
        (fibergen.cpp:26550-26565) on f32 hardware."""
        import time as _time
        from .refine import HostRefiner
        t0 = _time.perf_counter()
        hr = HostRefiner(self)
        self._refiner = hr
        eps64 = hr.to_host64(self.eps)
        # the f32 solution now lives in eps64; free the device copy for
        # the duration of the sweeps — the lm6 correction solve at 512^3
        # needs its HBM headroom (d/r/p tuples peak like the main solve)
        self.eps = None
        tol = self.opt.tol
        LOG.info(f"# Mixed-precision refinement to tol {tol:g} "
                 "(f32 device corrections, f64 host residuals)")
        prev_rel = None
        converged = False
        rel = float("inf")
        self.refine_sweeps = 0
        self.refine_inner_iters = 0
        for sweep in range(1, self.opt.refine_max_sweeps + 1):
            self.refine_sweeps = sweep
            r64, rnorm = hr.residual(eps64, E)
            # hand the rhs down as a HOST array: each correction driver
            # moves it to the device in its own layout (the lm6 driver
            # pushes per-component leaves so no stacked transient exists)
            rnp = np.asarray(r64).astype(
                np.float32 if self.dtype == jnp.float32 else np.float64)
            d, inner_it = self._solve_correction(rnp, mu0, lam0)
            del rnp
            self.refine_inner_iters += inner_it
            eps64, dn, en = hr.accumulate(eps64, d)
            del d
            rel = dn / (en + float(np.finfo(np.float64).tiny))
            self.residuals.append(rel)
            LOG.info(f"# Refinement sweep {sweep}: correction rel. = "
                     f"{rel:g} f64 residual = {rnorm:g} "
                     f"({inner_it} inner iterations)")
            if rel <= tol:
                converged = True
                LOG.info("Converged.")
                break
            if prev_rel is not None and rel > 0.5 * prev_rel:
                LOG.warn(f"refinement stalled at rel. error {rel:g} "
                         f"(tolerance {tol:g}): stopping at the "
                         "mixed-precision floor.")
                break
            prev_rel = rel
        if not converged and prev_rel is not None and rel <= prev_rel:
            LOG.warn(f"refinement stopped after "
                     f"{self.opt.refine_max_sweeps} sweeps at rel. error "
                     f"{rel:g} (tolerance {tol:g})")
        self.eps64 = eps64
        self.eps = hr.to_device32(eps64, self.dtype)
        LOG.info(f"refinement wall time {_time.perf_counter() - t0:.3f} s")

    def _solve_correction(self, rhs, mu0, lam0, maxiter=1000):
        """Solve A d = rhs (A = I + Gamma (C - C0)) in f32 with a FIELD
        right-hand side: the same fused CG chunk kernels as the main solve,
        initialized at d = 0, r = rhs, p = r.  Convergence on the CG
        recurrence sqrt(gamma/gamma0) <= refine_inner_tol, with a
        3-chunk stagnation guard at the f32 floor."""
        if getattr(self, "_lm6_last", False):
            return self._solve_correction_lm6(rhs, mu0, lam0, maxiter)
        rhs = jax.device_put(np.asarray(rhs))
        # material leaves must match the solve dtype or the scan carry
        # types diverge (f64 phi fields with an f32 solver are legal on the
        # CPU backend; the TPU flow always has f32 materials)
        dt = self.dtype
        mf = jax.tree_util.tree_map(
            lambda x: (jnp.asarray(x, dt)
                       if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                       else x),
            self.mat.fields())
        gamma = self._k_rhs_gamma(rhs)
        g0 = float(gamma)
        d = self._k_zeros_field()
        p = self._k_zeros_field()
        K = max(1, int(self.opt.check_every))
        it = 0
        best = float("inf")
        stall = 0
        gamma_prev = gamma
        while True:
            d, r, p, gamma, gamma_prev, gammas, mets = self._cg_multi_n(K)(
                mf, d, rhs if it == 0 else r, p, gamma, gamma_prev, None,
                mu0=mu0, lam0=lam0, dim2=False)
            it += K
            rel = math.sqrt(max(0.0, float(gamma)) / g0)
            if rel <= self.opt.refine_inner_tol or it >= maxiter:
                break
            if rel < best * (1.0 - 1e-3):
                best = rel
                stall = 0
            else:
                stall += 1
                if stall >= 3:
                    break
        return d, it

    def _solve_correction_lm6(self, rhs, mu0, lam0, maxiter=1000):
        """Tuple-state twin of _solve_correction for solves that ran the
        lm6 low-memory CG (512^3 on one chip): rhs arrives as a HOST
        array and is pushed per-component, so the device never holds a
        stacked (6,n,n,n) transient next to the d/r/p leaves."""
        mf = self.mat.fields()
        visc = self.mode == "viscosity"
        K = max(1, int(self.opt.check_every))
        rnp = np.asarray(rhs)
        del rhs
        r = tuple(jax.device_put(np.ascontiguousarray(rnp[c]))
                  for c in range(6))
        del rnp
        gamma = self._k_lm6_rhs_gamma(r)
        g0 = float(gamma)
        # d and p as two separate program executions -> distinct buffers;
        # gamma_prev = gamma makes the first step's direction r (CG from
        # zero), exactly like the plain-layout driver
        d = self._k_lm6_zeros()
        p = self._k_lm6_zeros()
        gamma_prev = gamma
        it = 0
        best = float("inf")
        stall = 0
        while True:
            d, r, p, gamma, gamma_prev, gammas, mets = self._lm6_multi_n(K)(
                mf, d, r, p, gamma, gamma_prev, bca=None,
                mu0=mu0, lam0=lam0, visc=visc)
            it += K
            rel = math.sqrt(max(0.0, float(gamma)) / g0)
            if rel <= self.opt.refine_inner_tol or it >= maxiter:
                break
            if rel < best * (1.0 - 1e-3):
                best = rel
                stall = 0
            else:
                stall += 1
                if stall >= 3:
                    break
        # free the r/p leaves before stacking d (512^3 headroom, mirrors
        # _run_cg_chunked's lm6 epilogue)
        del r, p
        return self._k_stack6(d), it

    def _predict_remaining(self, K, dispatched):
        """Geometric-decay extrapolation of the relative-error trajectory:
        returns the predicted iterations still needed beyond `dispatched`,
        or None when no trustworthy prediction exists (too little history,
        stalled, or non-monotone)."""
        rels = self.residuals
        c = len(rels)
        if c < 2:
            return None
        L = min(K, c - 1)
        r_last, r_first = rels[-1], rels[-1 - L]
        if not (0.0 < r_last < r_first):
            return None
        tol = getattr(self, "_tol_active", self.opt.tol)
        if r_last <= tol:
            rem_checked = 0.0
        else:
            d = (r_last / r_first) ** (1.0 / L)
            rem_checked = math.log(tol / r_last) / math.log(d)
        return max(0, int(math.ceil(rem_checked - (dispatched - c))))

    def run_batched(self, Es, pallas_mid="auto") -> bool:
        """Solve B pure-strain load cases against the shared operator in
        ONE batched CG: a leading RHS axis, vmapped inside the fused chunk
        program, so per-solve fixed costs (init dispatch, tunnel syncs,
        convergence overshoot) are paid once instead of B times and small
        grids get B-fold batching of every kernel.  This is a
        beat-the-reference path: calc_effective_properties in the
        reference loops its load cases strictly sequentially
        (fibergen.cpp:26044-26066).

        Requirements (callers fall back to sequential run() otherwise):
        linear CG (method='cg', mode != hyperelasticity), trivial BCs
        (P == Id, S == 0 — the caller prescribes pure strain columns),
        single loadstep.  On a device mesh the solver must qualify for the
        slab FFT (self.par): shard_map carries a vmap batching rule, so
        the batched chunks run each RHS's transforms through the explicit
        all-to-all slab transpose — without it GSPMD would all-gather the
        full field per device, so that combination is refused.

        On success self.eps_batch holds (B, dim, nx, ny, nz), self.eps the
        last case (the sequential driver's end state), and
        calc_mean_stress_batched() returns the (B, dim) mean stresses.
        Returns True on failure, False on success (run() semantics).
        """
        from collections import deque
        import time as _time
        if self.opt.method != "cg" or self.mode == "hyperelasticity":
            raise SolverError("run_batched requires the linear CG")
        if self.sharding is not None and self.par is None:
            raise SolverError(
                "run_batched on a mesh requires the slab-FFT layout "
                "(x-slab NamedSharding with mesh-divisible nx, ny)")
        t0 = _time.perf_counter()
        Es = np.asarray(Es, dtype=np.float64)
        self.residuals = []
        self._canceled = False
        self._diverged = False
        self.eps64 = None
        self._refiner = None
        self._reset_stall()
        self._tol_active = self.opt.tol
        self._current_E = Es[-1]
        self._current_S = np.zeros(self.dim)
        if self.eps is None:
            self.eps = fields.const_field(
                self.grid, np.zeros(self.dim), self.dtype)
        # precompute the mixed-moduli cache eagerly, exactly like _run_impl:
        # traced programs (the eig pass, the batched chunks) read the cached
        # moduli SLOTS when the cache is warm and re-mix phi fields inline
        # when cold — i.e. the HLO depends on this ordering.  Keeping it
        # deterministic is what makes the persistent compile cache hit on
        # warm runs (a Grosmont warm run once paid a fresh 26 s eig compile
        # purely because run_batched skipped this step).
        if all(p.phi is not None for p in self.mat.phases):
            try:
                self.mat._all_iso()
            except (AttributeError, NotImplementedError):
                pass
        self._maybe_update_ref()
        mu0, lam0 = self.mu_0, self.lambda_0
        # "auto" defers to pallas_chain.middle_enabled's shape/VMEM policy
        # inside the chain (the BlockSpec middle kernels carry a vmap
        # batching rule, so the batched program may use them)
        pm = (pallas_mid if pallas_mid != "auto" else True)
        mf = self.mat.fields()
        Eb = jnp.asarray(Es, self.dtype)
        K = max(1, int(self.opt.check_every))

        eps, r, p, gamma, gamma_prev, gammas, mets, g0dev, met0 = \
            self._cg_b_init_chunk_n(K)(mf, Eb, mu0=mu0, lam0=lam0,
                                       pallas_mid=pm)
        pend = deque([(K, gammas, mets)])
        dispatched = K
        st = {"g0": None, "it": 0, "done": False}
        # each RHS converges by the solver's configured estimator, exactly
        # like a sequential solve; the batch stops when the WORST RHS does
        B = Es.shape[0]
        ests = [make_estimator(self.opt.error_estimator) for _ in range(B)]

        def dispatch(L):
            nonlocal eps, r, p, gamma, gamma_prev, dispatched
            eps, r, p, gamma, gamma_prev, gs, ms = self._cg_b_multi_n(L)(
                mf, eps, r, p, gamma, gamma_prev,
                mu0=mu0, lam0=lam0, pallas_mid=pm)
            pend.append((L, gs, ms))
            dispatched += L

        def check_front():
            L, gs, ms = pend.popleft()
            if st["g0"] is None:
                st["g0"] = np.asarray(g0dev, dtype=np.float64)
                m0 = np.asarray(met0)
                for b, e in enumerate(ests):
                    e.start(m0[b])
            gs = np.asarray(gs, dtype=np.float64)  # (L, B)
            ms = np.asarray(ms)
            for k in range(L):
                for b, e in enumerate(ests):
                    if e.metric_kind == "residual":
                        e.update_cg(gs[k, b], st["g0"][b])
                    else:
                        e.update(ms[k, b])
                st["it"], st["done"] = self._converged(
                    st["it"], max(e.abs_error() for e in ests),
                    max(e.rel_error() for e in ests))
                if st["done"]:
                    return

        adapt = (self.opt.adaptive_drain == "on"
                 or (self.opt.adaptive_drain == "auto"
                     and int(np.prod(self.grid.shape))
                     >= ADAPTIVE_DRAIN_MIN_VOXELS))
        while not st["done"]:
            if len(pend) <= 1:
                rem = self._predict_remaining(K, dispatched) if adapt else None
                if rem is None or rem > K:
                    dispatch(K)
                else:
                    n = rem + 1
                    while n > 0:
                        L = min(1 << (int(n).bit_length() - 1), K)
                        dispatch(L)
                        n -= L
            check_front()

        self.eps_batch = eps
        self.eps = eps[-1]
        self.solve_time = _time.perf_counter() - t0
        return bool(self._canceled or self._diverged)

    def calc_mean_stress_batched(self):
        """(B, dim) phase-weighted mean stresses of the last run_batched."""
        _, Sb = self._k_b_means(self.mat.fields(), self.eps_batch)
        return np.asarray(Sb)

    def _run_cg_hyper(self, E0, S0):
        from .newton import run_newton_cg
        run_newton_cg(self, E0, S0)

    def _run_nlcg(self, E0, S0):
        if self.mode != "hyperelasticity":
            raise SolverError("nl_cg requires hyperelasticity mode")
        from .newton import run_nlcg
        run_nlcg(self, E0, S0)

    def _run_polarization(self, E0, S0):
        """Eyre-Milton accelerated scheme (runPolarization,
        fibergen.cpp:21808-21851)."""
        self._maybe_update_ref()
        E = self._bc_mean(E0, S0)
        ee = make_estimator(self.opt.error_estimator)
        bca = self._bca()
        mu0, lam0 = self.mu_0, self.lambda_0

        self.eps = fields.const_field(self.grid, 4.0 * mu0 * E, self.dtype)
        ee.start(self._k_metric(self.mat.fields(), self.eps))
        P0 = jnp.asarray(4.0 * mu0 * E, self.dtype)
        Ej = jnp.zeros(self.dim, self.dtype)  # unused placeholder

        it = 1
        while True:
            self.eps, met = self._k_polar_step(
                self.mat.fields(), self.eps, Ej, P0, bca,
                mu0=mu0, lam0=lam0)
            ee.update(np.asarray(met))
            it, done = self._converged(it, ee.abs_error(), ee.rel_error(),
                                       check_bc=False)
            if done:
                break
        self.eps = self._k_polar_finish(self.mat.fields(), self.eps, mu0=mu0)

    def _run_nesterov(self, E0, S0):
        """Nesterov-accelerated basic scheme (runNesterov,
        fibergen.cpp:21999-22043)."""
        self._maybe_update_ref()
        E = self._bc_mean(E0, S0)
        ee = make_estimator(self.opt.error_estimator)
        ee.start(self._k_metric(self.mat.fields(), self.eps))
        bca = self._bca()
        mu0, lam0 = self.mu_0, self.lambda_0
        dim2 = self._dim2_ok(bca, E)
        self._dim2_last = dim2
        Ej = jnp.asarray(E, self.dtype)

        tau = self.eps
        eps = tau
        q_old = 0.0
        q = 0.0
        n = 0
        n_min = 5
        it = 1
        while True:
            n += 1
            tau, met = self._k_basic(self.mat.fields(), tau, Ej, bca,
                                     mu0=mu0, lam0=lam0, dim2=dim2)
            eps = eps - tau
            q_old = q
            q = float(fields.inner_l2(tau, tau)) * (
                self.grid.dx * self.grid.dy * self.grid.dz)
            if q_old > q and n > n_min:
                n = 0
                eps = tau
            else:
                eps = tau + (n - 1.0) / (n + 2.0) * eps
                tau, eps = eps, tau
            self.eps = tau  # keep live state visible to bc_error/callbacks
            ee.update(np.asarray(met))
            it, done = self._converged(it, ee.abs_error(), ee.rel_error())
            if done:
                break

    def _run_basic_el(self, E0, S0):
        """Basic scheme with exact line search (runBasicEL,
        fibergen.cpp:21918-21996)."""
        self._maybe_update_ref()
        ee = make_estimator(self.opt.error_estimator)
        bca = self._bca()
        mu0, lam0 = self.mu_0, self.lambda_0
        zero = jnp.zeros(self.dim, self.dtype)

        E0v = self._fit_vec(np.asarray(E0))
        dim2 = self._dim2_ok(bca, E0v)
        self._dim2_last = dim2
        self.eps = fields.const_field(self.grid, E0v, self.dtype)
        ee.start(self._k_metric(self.mat.fields(), self.eps))
        deps, _ = self._k_basic(self.mat.fields(), self.eps, zero, bca,
                                mu0=mu0, lam0=lam0, dim2=dim2)

        it = 1
        while True:
            alpha = float(self._k_calc_step(self.mat.fields(), self.eps, deps))
            self.eps = self.eps + alpha * deps
            deps, met = self._k_basic(self.mat.fields(), deps, zero, bca,
                                      mu0=mu0, lam0=lam0, dim2=dim2)
            ee.update(np.asarray(self._k_metric(self.mat.fields(), self.eps)))
            it, done = self._converged(it, ee.abs_error(), ee.rel_error())
            if done:
                break

    # --------------------------------------------------------- convergence
    def _converged(self, it, abs_err, rel_err, check_bc=True, patience=50):
        """(converged, fibergen.cpp:21164-21244).  Returns (next_it, done).

        Adds a stagnation guard the reference lacks (it parses tol_red,
        fibergen.cpp:15047, but never uses it): when the relative error has
        not improved by tol_red for 50 consecutive checks, the iteration
        has hit its precision floor (common when a double-precision demo
        tolerance like 1e-10 is run in float32 on TPU) and spinning to
        maxiter would waste hours of device time."""
        LOG.info(f"# Iteration {it}: {self.opt.error_estimator} error "
                 f"abs. = {abs_err:g} rel. = {rel_err:g}")
        if math.isnan(rel_err):
            self._canceled = True
            self._diverged = True
            LOG.error("NaN detected in solution. Aborting.")
            return it, True
        self.residuals.append(rel_err)
        tol = getattr(self, "_tol_active", self.opt.tol)
        if rel_err < self._best_rel * (1.0 - self.opt.tol_red):
            self._best_rel = rel_err
            self._stall = 0
        else:
            self._stall += 1
            if self._stall >= patience:
                LOG.warn(
                    f"No progress for {self._stall} iterations at rel. "
                    f"error {rel_err:g} (tolerance {tol:g}): "
                    "stopping at the precision floor.")
                return it, True
        if self.opt.step_mode:
            # interactive stepping (the reference's step_mode,
            # fibergen.cpp:21168-21172); TTY-gated so batch runs never hang
            import sys as _sys
            if _sys.stdin is not None and _sys.stdin.isatty():
                LOG.info("Press the ENTER key")
                _sys.stdin.readline()
        if self.convergence_callback and self.convergence_callback():
            LOG.info("Custom convergence test returned true.")
            return it, True
        if it >= self.opt.maxiter:
            LOG.info("Maximum number of iterations reached.")
            return it, True
        if rel_err <= tol or abs_err <= self.opt.abs_tol:
            bc_err = 0.0
            if check_bc:
                bc_err = self.bc_error()
                LOG.info(f"Boundary condition error = {bc_err:g}")
            if bc_err <= self.opt.bc_tol:
                LOG.info("Converged.")
                return it, True
        return it + 1, False

    def bc_error(self) -> float:
        """Relative mixed-BC satisfaction error (bc_error,
        fibergen.cpp:21129-21161).

        Trivial-BC fast path (deliberate deviation): with pure strain
        control (P == Id) and no prescribed stress, Q == 0 so the stress
        branch vanishes, and every iteration scheme preserves mean(eps) ==
        E exactly (the Gamma/G0 output is zero-mean by construction, DC bin
        == prescribed mean), so err_F == 0 analytically.  The reference
        still reduces the fields (it is free there); here the reduction
        would BLOCK on the pipeline's in-flight chunk — one whole chunk of
        device time added to every converged solve for a value that is
        identically zero."""
        if ((self._bc is None or self._bc.is_trivial)
                and voigt.norm_2(self._current_S) == 0.0):
            return 0.0
        if self.eps is None and getattr(self, "_lm6_eps_t", None) is not None:
            # mid-solve tuple state (mixed-BC lm6 path)
            Emean, Smean = self._k_lm6_means(self.mat.fields(),
                                             self._lm6_eps_t)
        else:
            Emean, Smean = self._k_means(self.mat.fields(), self.eps)
        Emean = np.asarray(Emean, dtype=np.float64)
        Smean = np.asarray(Smean, dtype=np.float64)
        Q = voigt.id4(self.dim) - self.P
        P_E = voigt.dyad4_mv(self.P, Emean)
        Q_S = voigt.dyad4_mv(Q, Smean)
        PE_target = voigt.dyad4_mv(self.P, self._current_E)
        if self.dim == 9:
            PE_target = PE_target - voigt.dyad4_mv(self.P, self._id)
        norm_E = voigt.norm_2(PE_target)
        norm_S = voigt.norm_2(self._current_S)
        err_F = voigt.norm_2(P_E - self._current_E) / (
            1.0 if norm_E < self.opt.bc_tol else norm_E)
        err_S = voigt.norm_2(Q_S - self._current_S) / (
            1.0 if norm_S < self.opt.bc_tol else norm_S)
        return float(max(err_F, err_S))

    # ---------------------------------------------------------- checkpoint
    def save_state(self, path: str):
        """Checkpoint the solver state (field + BCs + reference material) —
        a capability the reference lacks (SURVEY.md section 5)."""
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            eps=np.asarray(self.eps) if self.eps is not None else np.zeros(0),
            E=self.E, S=self.S, P=self.P,
            mu_0=self.mu_0, lambda_0=self.lambda_0,
            residuals=np.asarray(self.residuals, dtype=np.float64),
            mode=np.array(self.mode), scheme=np.array(self.scheme))

    def load_state(self, path: str):
        import jax.numpy as jnp_
        d = np.load(path if path.endswith(".npz") else path + ".npz",
                    allow_pickle=False)
        if str(d["mode"]) != self.mode:
            raise SolverError(
                f"checkpoint mode '{d['mode']}' != solver mode '{self.mode}'")
        if d["eps"].size:
            self.eps = jnp_.asarray(d["eps"], self.dtype)
            self.eps64 = None
            self._refiner = None
        self.E = d["E"]
        self.S = d["S"]
        self.P = d["P"]
        self.mu_0 = float(d["mu_0"])
        self.lambda_0 = float(d["lambda_0"])
        self.residuals = list(d["residuals"])
        if np.isfinite(self.mu_0):
            self._bc = bcmod.make_bc_projector(
                self.P, self.mu_0, self.lambda_0, self.opt.bc_relax)

    # --------------------------------------------------------------- stats
    def calc_mean_strain(self):
        if self.eps64 is not None:
            return self._refiner.mean_strain(self.eps64)
        return np.asarray(fields.mean(self.eps))

    def calc_mean_stress(self):
        if self.eps64 is not None:
            # refined solves report f64 means — the f32 device reduction
            # would throw away the digits the refinement bought
            return self._refiner.mean_stress(self.eps64)
        return np.asarray(self.mat.mean_pk1(self.eps))

    def calc_mean_cauchy(self):
        return np.asarray(self.mat.mean_cauchy(self.eps))

    def calc_mean_energy(self):
        if self.eps64 is not None:
            return self._refiner.mean_energy(self.eps64)
        return float(self.mat.mean_w(self.eps))

    def calc_min_det_f(self):
        from ..materials import laws as lawsmod
        return float(lawsmod.det3_comp(self.eps).min())

    def calc_min_eig_h(self):
        """Max asymmetry of the per-voxel tangent dPK1 (calcMinEigH,
        fibergen.cpp:17813-17867): Frobenius norm of dP - dP^T, reduced
        over the grid.  Accumulated column-pair-wise in the (dim, ...)
        field layout — stacking a voxel-trailing (dim, dim) tangent pads
        to (16, 128) TPU tiles (32+ GB at 256^3)."""
        import jax.numpy as jnp_
        dim = self.dim
        eye = jnp_.eye(dim, dtype=self.dtype)
        cols = [self.mat.dpk1(
                    self.eps,
                    jnp_.broadcast_to(eye[j].reshape(dim, 1, 1, 1),
                                      self.eps.shape))
                for j in range(dim)]
        # |dP - dP^T|_F^2 = sum_{i<j} 2 (C[i][j] - C[j][i])^2
        r2 = None
        for i in range(dim):
            for j in range(i + 1, dim):
                d = cols[j][i] - cols[i][j]
                t = 2.0 * d * d
                r2 = t if r2 is None else r2 + t
        return float(jnp_.sqrt(r2).max())

    def _print_mean_values(self):
        names = {
            "elasticity": ("elastic strain", "average elastic stress"),
            "hyperelasticity": ("deformation gradient", "1st Piola-Kirchhoff stress"),
            "viscosity": ("fluid stress", "fluid shear"),
            "heat": ("temperature gradient", "heat flux"),
            "porous": ("pressure gradient", "volumetric flux"),
        }[self.mode]
        LOG.info(f"mean {names[0]} = {self.calc_mean_strain()}")
        LOG.info(f"mean {names[1]} = {self.calc_mean_stress()}")


def _extrapolate(history, t, method="polynomial", dim=6):
    """Loadstep solution extrapolation dispatch (extrapolateLoadstep,
    fibergen.cpp:21454-21466); unknown method names raise, matching the
    reference's BOOST_THROW."""
    if method == "polynomial":
        return _extrapolate_polynomial(history, t)
    if method == "transformation":
        return _extrapolate_transformation(history, dim)
    raise SolverError(f"Unknown loadstep extrapolation method '{method}'")


def _extrapolate_polynomial(history, t):
    """Polynomial extrapolation of the solution to loadstep parameter t
    (extrapolateLoadstepPolynomial, fibergen.cpp:21468-21517)."""
    ts = np.array([h[0] for h in history])
    # Lagrange weights at t
    wts = []
    for i in range(len(ts)):
        w = 1.0
        for j in range(len(ts)):
            if i != j:
                w *= (t - ts[j]) / (ts[i] - ts[j])
        wts.append(w)
    out = None
    for w, (_, e) in zip(wts, history):
        out = w * e if out is None else out + w * e
    return out


def _extrapolate_transformation(history, dim):
    """SVD-transformation extrapolation (extrapolateLoadstepTransformation,
    fibergen.cpp:21519-21582): per voxel, the transfer tensor between the
    last two converged fields TR = F2 F1^{-1} is powered through its SVD
    with the reference's fixed exponent tt = log(3)/log(2) - 1, and the
    prediction is F = TR^tt F2.  Meant for hyperelasticity, where the field
    is the deformation gradient (F ~ Id, so F1 is invertible); fields with
    dim < 9 are expanded to full 3x3 tensors by mirroring components
    [i] = [i-3] exactly like the reference."""
    from ..materials import laws as lawsmod
    (_, e1), (_, e2) = history[-2], history[-1]

    def to9(e):
        comps = [e[i] if i < dim else None for i in range(9)]
        for i in range(9):
            if comps[i] is None:
                comps[i] = comps[i - 3]
        return jnp.stack(comps, axis=0)

    F1 = lawsmod.mat_from_voigt9(to9(e1))
    F2 = lawsmod.mat_from_voigt9(to9(e2))
    TR = F2 @ jnp.linalg.inv(F1)
    tt = math.log(3.0) / math.log(2.0) - 1.0
    U, s, Vh = jnp.linalg.svd(TR)
    TRtt = (U * (s ** tt)[..., None, :]) @ Vh
    Fi = TRtt @ F2
    return lawsmod.voigt9_from_mat(Fi)[:dim]
