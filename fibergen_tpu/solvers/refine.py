"""Mixed-precision iterative refinement: deep tolerances on f32 hardware.

The reference computes in double and ships demos with tolerances down to
1e-10 (demo/elasticity/hashin/project.xml:9; datatype dispatch,
fibergen.cpp:26550-26565).  A float32 Lippmann-Schwinger CG stagnates at a
relative-error floor of ~1e-7 — below that, the recurrence residual no
longer reflects the true residual and the iterates stop moving.  The
TPU-native answer is classical iterative refinement:

    1. solve  A eps = E  on the device in f32 to ~1e-6,
    2. recompute the TRUE residual  r = E - A eps  in float64,
    3. solve the correction  A d = r  on the device in f32,
    4. eps <- eps + d  (accumulated in float64), repeat.

Each sweep multiplies the error by the inner solve's relative accuracy
(~1e-5..1e-6), so 2-3 sweeps reach 1e-10..1e-12 — the f32 device does all
the heavy lifting and the f64 work is one operator application per sweep.

The f64 residual runs on the host CPU *through the same jax operator code*
the device uses (materials.stress_diff + ops.gamma.gamma_operator), traced
under ``jax.enable_x64()`` onto the in-process CPU backend — there is no
second operator implementation to drift out of sync; the CPU-f64 test
suite already pins these code paths.  The residual mirrors cg_init
(solvers/ls.py): r(eps) = -Gamma (C - C0) eps + (E - eps), which is the
mode-generic form (the viscosity Delta operator dispatches inside
gamma_operator).

Supported envelope (see LSSolver._refine_reason): linear modes
(elasticity / heat / porous / viscosity), method=cg, trivial BCs, single
chip, f32 fields.  Hyperelastic Newton and mixed-BC refinement are out of
scope — the reference's own deep-tolerance demos in those classes are
mixed_bc only, whose tol is handled by the stagnation guard.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import voigt
from ..utils.logging import LOG


def _cast64(tree, cpu):
    """Move a pytree of arrays to the CPU device as float64.

    The f32 values are exactly representable in f64, so the cast *defines*
    the same discrete problem the device solves (same phi, same mixed
    moduli) — the refinement converges to the exact solution of the
    problem the f32 operator approximates."""
    def one(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(np.float64)
        elif np.issubdtype(a.dtype, np.complexfloating):
            a = a.astype(np.complex128)
        return jax.device_put(a, cpu)
    return jax.tree_util.tree_map(one, tree)


class HostRefiner:
    """f64 residual / accumulation helpers for one LSSolver solve.

    All entry points run inside ``jax.enable_x64()`` with inputs committed
    to the CPU device, so the compiled programs are float64 XLA:CPU
    regardless of the process' device/x64 defaults."""

    def __init__(self, lss):
        self.lss = lss
        self.grid = lss.grid
        self.mat = lss.mat
        self.mode = lss.mode
        self.scheme = lss.scheme
        self.dim = lss.dim
        self.mu_0 = float(lss.mu_0)
        self.lambda_0 = float(lss.lambda_0)
        self.cpu = jax.devices("cpu")[0]
        self._g0_solver = lss.opt.g0_solver
        self._freq_hack = lss.opt.freq_hack
        # f64 material fields: cast + remix once per solver (10.7 s at
        # 256^3), reused by every refined solve in the process
        mf64 = getattr(lss, "_hostrefiner_mf64", None)
        if mf64 is None:
            with jax.enable_x64():
                mf64 = self._remix64(_cast64(self.mat.fields(), self.cpu))
            lss._hostrefiner_mf64 = mf64
        self.mf64 = mf64
        # compiled-program cache lives on the SOLVER so repeated solves in
        # one process (warm re-runs, the 6-case effective-properties
        # stream) reuse the XLA:CPU f64 programs instead of re-tracing a
        # fresh HostRefiner's: each trace is a full 3D-f64-FFT-chain CPU
        # compile (~100 s at 256^3 when the CPU AOT cache cannot load,
        # e.g. machine-feature mismatch).  Keyed by (name, mu_0, lambda_0)
        # because the builders bake those floats in as constants.
        self._fns = getattr(lss, "_hostrefiner_fns", None)
        if self._fns is None:
            self._fns = lss._hostrefiner_fns = {}
        w = voigt.weights(self.dim).astype(np.float64)
        self._w = w.reshape(-1, 1, 1, 1)

    def _remix64(self, mf64):
        """Recompute cached mixed-moduli slots (mixing._all_iso `_iso_val`)
        in f64 from the f64 phi fields.  Merely *casting* the f32 cache
        would freeze its mixing rounding (~1e-8 relative) into the host
        operator, bounding the refinement one digit short of f64.  The law
        constants are Python floats (full precision), so phi64 * mu is the
        exact f64 mix.  Slots that cannot be re-mixed (dropped phi,
        array-valued moduli) keep the cast values."""
        slots = self.mat.field_slots()
        idx = {(id(o), a): i for i, (o, a) in enumerate(slots)}
        out = list(mf64)
        for i, (o, a) in enumerate(slots):
            if a != "_iso_val":
                continue
            phis, mus, lams = [], [], []
            ok = True
            for p in getattr(o, "phases", ()):
                j = idx.get((id(p), "phi"))
                f = getattr(p.law, "iso_moduli", None)
                if j is None or f is None:
                    ok = False
                    break
                mu, lam = f()
                if not (isinstance(mu, (int, float))
                        and isinstance(lam, (int, float))):
                    ok = False
                    break
                phis.append(out[j])
                mus.append(float(mu))
                lams.append(float(lam))
            if not ok or not phis:
                continue
            mu_x = sum(ph * m for ph, m in zip(phis, mus))
            lam_x = sum(ph * l for ph, l in zip(phis, lams))
            out[i] = (mu_x, lam_x)
        return tuple(out)

    # ------------------------------------------------------------ programs
    def _jit(self, name, builder):
        key = (name, self.mu_0, self.lambda_0)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = jax.jit(builder())
        return fn

    def _call(self, name, builder, *args):
        """Trace/call on the CPU backend under x64 with the XLA FFT (the
        matmul-DFT backend is an MXU design; on CPU pocketfft wins and the
        DFT matrices would be traced in as f64 constants)."""
        from ..ops import fft as fftmod
        prev = fftmod.FFT_BACKEND
        fftmod.FFT_BACKEND = "xla"
        try:
            with jax.enable_x64():
                return self._jit(name, builder)(*args)
        finally:
            fftmod.FFT_BACKEND = prev

    # ------------------------------------------------------------- entries
    def to_host64(self, eps_dev):
        """Device f32 field -> committed CPU f64 array."""
        with jax.enable_x64():
            return jax.device_put(
                np.asarray(eps_dev).astype(np.float64), self.cpu)

    def residual(self, eps64, E):
        """r = -Gamma (C - C0) eps + (E - eps) in f64 (the cg_init residual,
        solvers/ls.py cg_init / fibergen.cpp:23171-23180).  Returns
        (r64 on CPU, ||r|| Voigt-weighted RMS as float)."""
        mat, grid, mode, scheme = self.mat, self.grid, self.mode, self.scheme
        mu0, lam0 = self.mu_0, self.lambda_0
        dim = self.dim
        wv = self._w
        g0_solver, freq_hack = self._g0_solver, self._freq_hack

        def build():
            from ..ops import gamma as gammamod

            def fn(mf, eps, Ev):
                with mat.bound(mf):
                    tau = mat.stress_diff(eps, mu0, lam0)
                    eta = gammamod.gamma_operator(
                        grid, mode, scheme, None, jnp.zeros(dim, eps.dtype),
                        mu0, lam0, tau, -1.0, 0.0, g0_solver=g0_solver,
                        freq_hack=freq_hack, par=None, pallas_mid=False)
                r = eta + (Ev.reshape(-1, 1, 1, 1) - eps)
                rn = jnp.sqrt((r * jnp.asarray(wv, r.dtype) * r).sum()
                              / np.prod(r.shape[1:]))
                return r, rn

            return fn

        Ev = jax.device_put(np.asarray(E, np.float64), self.cpu)
        r64, rn = self._call("residual", build, self.mf64, eps64, Ev)
        return r64, float(rn)

    def accumulate(self, eps64, d_dev):
        """eps64 += d (f64); returns (new eps64, ||d||, ||eps||) with
        Voigt-weighted RMS norms."""
        wv = self._w

        def build():
            def fn(eps, d):
                w = jnp.asarray(wv, eps.dtype)
                n = np.prod(eps.shape[1:])
                eps2 = eps + d
                dn = jnp.sqrt((d * w * d).sum() / n)
                en = jnp.sqrt((eps2 * w * eps2).sum() / n)
                return eps2, dn, en
            return fn

        with jax.enable_x64():
            d64 = jax.device_put(
                np.asarray(d_dev).astype(np.float64), self.cpu)
        eps2, dn, en = self._call("accumulate", build, eps64, d64)
        return eps2, float(dn), float(en)

    def mean_strain(self, eps64):
        with jax.enable_x64():
            return np.asarray(eps64).mean(axis=(-3, -2, -1))

    def mean_stress(self, eps64):
        """Phase-weighted f64 mean stress <P(eps)> (meanPK1) on the CPU."""
        mat = self.mat

        def build():
            def fn(mf, eps):
                with mat.bound(mf):
                    return mat.mean_pk1(eps)
            return fn

        out = self._call("mean_stress", build, self.mf64, eps64)
        return np.asarray(out, dtype=np.float64)

    def mean_energy(self, eps64):
        mat = self.mat

        def build():
            def fn(mf, eps):
                with mat.bound(mf):
                    return mat.mean_w(eps)
            return fn

        return float(self._call("mean_energy", build, self.mf64, eps64))

    def to_device32(self, eps64, dtype, sharding=None):
        x = np.asarray(eps64).astype(dtype)
        return jax.device_put(x) if sharding is None else jax.device_put(
            x, sharding)
