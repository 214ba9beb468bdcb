"""Hyperelastic solvers: Newton-Krylov and nonlinear CG.

Equivalents of runCGHyper (outer Newton on the nonlinear Lippmann-Schwinger
equation, inner linear CG on the linearized operator, fibergen.cpp:22699-23131)
and runNLCGHyper (conjugate-direction descent with pluggable beta schemes,
fibergen.cpp:22480-22695).  The per-voxel tangent dP/dF comes from jax.jvp of
the autodiff PK1 instead of hand-derived dPK1 kernels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import fields, voigt
from ..ops import gamma as gammamod
from ..utils.logging import LOG
from . import bc as bcmod
from .estimators import make_estimator


def _kernels(solver):
    """Build (cached) jitted kernels for the hyper path on a solver."""
    if getattr(solver, "_hyper_kernels", None) is not None:
        return solver._hyper_kernels

    grid, mode, scheme = solver.grid, solver.mode, solver.scheme
    mat = solver.mat
    dt = solver.dtype
    dim = solver.dim
    tiny = float(np.finfo(np.float64 if dt == jnp.float64 else np.float32).tiny)

    def gamma_op(E, tau, mu0, lam0, bca, alpha=-1.0):
        par = getattr(solver, "par", None)
        return gammamod.gamma_operator(
            grid, mode, scheme, bca, E, mu0, lam0, tau, alpha,
            par=par,
            # same GSPMD guard as LSSolver's gamma_op (ls.py): pallas_call
            # cannot run under GSPMD, only single-chip or explicit
            # shard_map (the slab layout)
            pallas_mid=solver.sharding is None or par is not None)

    def stress_deriv(F, Q, mu0, lam0):
        """(dP/dF(F) - C0) : Q (calcStressDeriv, fibergen.cpp:18425-18480)."""
        W = mat.dpk1(F, Q) - 2.0 * mu0 * Q
        if lam0 != 0.0:
            tr = lam0 * (Q[0] + Q[1] + Q[2])
            W = W.at[0:3].add(-tr)
        return W

    # transpose index map for the 9-component Voigt layout: component c of
    # Q^T (core/voigt order [xx,yy,zz,yz,xz,xy,zy,zx,yx])
    _T9 = [0, 1, 2, 6, 7, 8, 3, 4, 5]

    def stress_deriv_frozen(Q, abc, mu0, lam0):
        """Modified-Newton tangent: per-voxel frozen isotropic-form map
        (a Q + b tr(Q) I + c Q^T) - C0 : Q.  abc = (a(x), b(x), c(x))
        voxel fields from the per-phase least-squares projection of the
        exact tangent at the mean deformation (see frozen_abc); the exact
        jvp tangent apply is the dominant inner-CG cost (~105 ms
        standalone at 256^3, PARITY round-4), this form reads 3 moduli
        planes instead."""
        a, b, c = abc
        tr = Q[0] + Q[1] + Q[2]
        W = (a - 2.0 * mu0) * Q + c * jnp.stack([Q[i] for i in _T9])
        W = W.at[0:3].add((b - lam0) * tr)
        return W

    def apply_op(F, Q, mu0, lam0, bca):
        """-Gamma0 (dP/dF(F) - C0) : Q (ApplyOperator, fibergen.cpp:23132)."""
        W = stress_deriv(F, Q, mu0, lam0)
        zero = jnp.zeros(dim, dt)
        return gamma_op(zero, W, mu0, lam0, bca)

    def apply_op_frozen(Q, abc, mu0, lam0, bca):
        W = stress_deriv_frozen(Q, abc, mu0, lam0)
        zero = jnp.zeros(dim, dt)
        return gamma_op(zero, W, mu0, lam0, bca)

    def newton_init(eps, X0, mu0, lam0, bca, abc=None):
        """X = -Gamma0 P(F) with mean X0; R = Q = ApplyOp(F, X); gamma.

        The inner CG solves A dX = X from the initial iterate dX0 = X, so
        its initial residual is R = X - A X = ApplyOp(X) — and A must be
        the SAME operator the CG steps apply.  With the frozen tangent the
        init therefore uses apply_op_frozen too: mixing an exact-operator
        R with frozen-operator steps solves an inconsistent system whose
        outer fixed point is NOT the true solution (measured 0.8% P11
        shift on a two-phase SVK sphere before this was caught)."""
        F = eps
        PF = mat.pk1(F)
        X = gamma_op(jnp.asarray(X0, dt), PF, mu0, lam0, bca, alpha=-1.0)
        R = (apply_op(F, X, mu0, lam0, bca) if abc is None
             else apply_op_frozen(X, abc, mu0, lam0, bca))
        gamma = fields.inner_l2(R, R) + tiny
        return X, R, gamma

    def newton_cg_step(F, X, R, Q, gamma, newton_relax, mu0, lam0, bca,
                       abc=None):
        W = (apply_op(F, Q, mu0, lam0, bca) if abc is None
             else apply_op_frozen(Q, abc, mu0, lam0, bca))
        denom = fields.inner_l2_diff(Q, Q, W) + tiny
        alpha = gamma / denom
        X2 = X + alpha * Q
        eps2 = F + newton_relax * X2
        R2 = R - alpha * (Q - W)
        delta = fields.inner_l2(R2, R2) + tiny
        beta = delta / gamma
        Q2 = R2 + beta * Q
        return X2, eps2, R2, Q2, delta, denom

    def newton_cg_multi(F, X, R, Q, gamma, newton_relax, mu0, lam0, bca,
                        abc=None):
        """check_every inner CG iterations fused into one device program
        (mirrors LSSolver._k_cg_multi): returns per-iteration
        (gamma, denom, metric) stacks; convergence and the
        indefinite-operator guard are acted on one chunk behind.  abc
        switches the tangent apply to the frozen isotropic-form map
        (modified Newton)."""
        def body(carry, _):
            X, R, Q, gamma = carry
            X2, eps2, R2, Q2, delta, denom = newton_cg_step(
                F, X, R, Q, gamma, newton_relax, mu0, lam0, bca, abc)
            return (X2, R2, Q2, delta), (gamma, denom, metric(eps2))

        (X, R, Q, gamma), (gammas, denoms, mets) = jax.lax.scan(
            body, (X, R, Q, gamma), None,
            length=max(1, solver.opt.check_every))
        eps2 = F + newton_relax * X
        return X, R, Q, gamma, eps2, gammas, denoms, mets

    def metric_for(kind):
        """Estimator metric for a GIVEN kind.  The inner and outer error
        estimators can differ (e.g. residual inner / epsilon outer); keying
        the metric on the inner kind only silently fed the outer estimator
        a constant (zero) metric, making it converge after ONE outer
        iteration — invisible with the default epsilon/epsilon pair but
        fatal for modified Newton, which needs many outers."""
        def metric(eps):
            if kind == "epsilon":
                return fields.component_norm(eps)
            if kind == "sigma":
                return mat.mean_pk1(eps)
            if kind == "energy":
                return mat.mean_w(eps)
            return jnp.zeros((), dt)
        return metric

    metric = metric_for(solver._estimator_kind)
    from .estimators import make_estimator as _mk
    metric_outer = metric_for(_mk(solver.opt.outer_error_estimator).metric_kind)

    def grad_step(eps, Emean, mu0, lam0, bca):
        """Steepest-descent direction dX = -Gamma0 P(eps), mean = Emean
        (calcGrad, fibergen.cpp:22434-22447)."""
        PF = mat.pk1(eps)
        dX = gamma_op(jnp.asarray(Emean, dt), PF, mu0, lam0, bca, alpha=-1.0)
        n2 = fields.inner_l2(dX, dX)
        return dX, n2

    def mjit(fn, **kw):
        # material arrays ride as the leading `mf` argument (see
        # LSSolver._build_kernels: closure constants are serialized per
        # compiled program; arguments are passed by reference)
        def wrapped(mf, *args, **kwargs):
            with mat.bound(mf):
                return fn(*args, **kwargs)
        wrapped.__name__ = getattr(fn, "__name__", "kernel")
        return jax.jit(wrapped, **kw)

    jit = partial(mjit, static_argnames=("mu0", "lam0"))
    ks = {
        "init": jit(newton_init),
        "cg_step": jit(newton_cg_step),
        "cg_multi": jit(newton_cg_multi),
        "metric": mjit(metric),
        "metric_outer": mjit(metric_outer),
        "grad": jit(grad_step),
        "inner": jax.jit(fields.inner_l2),
        "inner_diff": jax.jit(fields.inner_l2_diff),
    }
    solver._hyper_kernels = ks
    return ks


_T9 = [0, 1, 2, 6, 7, 8, 3, 4, 5]


def _iso_project(T):
    """Least-squares projection of a 9x9 tangent matrix onto the frozen
    isotropic form a*I + b*(tr outer) + c*(transpose map); returns
    (a, b, c).  Exact for isotropic laws at F = Id (where dP/dF =
    lam tr I + mu (Q + Q^T) + ... collapses to this span)."""
    I9 = np.eye(9)
    Ptr = np.zeros((9, 9))
    Ptr[:3, :3] = 1.0
    PT = np.zeros((9, 9))
    for i, j in enumerate(_T9):
        PT[i, j] = 1.0
    G = np.stack([I9.ravel(), Ptr.ravel(), PT.ravel()], axis=1)
    coef, *_ = np.linalg.lstsq(G, np.asarray(T, np.float64).ravel(),
                               rcond=None)
    return tuple(float(x) for x in coef)


def _frozen_abc(solver):
    """Per-voxel (a, b, c) fields for the modified-Newton tangent: each
    phase law's exact 9x9 tangent at the MEAN deformation, projected to
    the isotropic form, phi-mixed (consistent with VoigtMixed's
    dP/dF = sum phi_p dP_p/dF).  One tiny jit per law (cached across
    outer iterations) + one mixing jit."""
    mat, dt = solver.mat, solver.dtype
    Fbar = np.asarray(fields.mean(solver.eps), dtype=np.float64)

    coefs = []
    for p in mat.phases:
        law = p.law
        fn = getattr(law, "_tangent9_fn", None)
        if fn is None:
            def make(law=law):
                def tangent9(F0):
                    eye = jnp.eye(9, dtype=F0.dtype)
                    cols = [law.dpk1(F0, eye[j].reshape(9, 1, 1, 1))
                            for j in range(9)]
                    return jnp.stack(
                        [c.reshape(9) for c in cols], axis=1)
                return jax.jit(tangent9)
            fn = law._tangent9_fn = make()
        T = np.asarray(fn(jnp.asarray(Fbar, dt).reshape(9, 1, 1, 1)))
        coefs.append(_iso_project(T))

    phis = [p.phi for p in mat.phases]

    @jax.jit
    def mix(phis, cs):
        a = sum(ph * c[0] for ph, c in zip(phis, cs))
        b = sum(ph * c[1] for ph, c in zip(phis, cs))
        c_ = sum(ph * c[2] for ph, c in zip(phis, cs))
        return a, b, c_

    cs = tuple(tuple(jnp.asarray(x, dt) for x in c) for c in coefs)
    return mix(phis, cs)


def run_newton_cg(solver, E0, S0):
    """Newton-Krylov for finite strain (runCGHyper, fibergen.cpp:22699-23131).

    With SolverOptions.newton_tangent == "frozen_iso" the inner CG uses a
    per-voxel frozen isotropic-form tangent refreshed at each outer
    iteration (modified Newton): the exact jvp tangent apply — the
    dominant inner cost at 256^3 — is replaced by a 3-moduli-plane
    elementwise map; convergence drops from quadratic to linear, so this
    wins only when the per-iteration saving beats the extra outer
    iterations (measured in scripts/bench_hyper_newton.py)."""
    ks = _kernels(solver)
    opt = solver.opt

    # satisfy P : <eps> = E0 (fibergen.cpp:22744-22745)
    dE = np.asarray(E0) - voigt.dyad4_mv(solver.P, np.asarray(fields.mean(solver.eps)))
    solver.eps = solver.eps + jnp.asarray(dE, solver.dtype).reshape(-1, 1, 1, 1)

    ee_outer = make_estimator(opt.outer_error_estimator)
    ee_outer.start(np.asarray(ks["metric_outer"](solver.mat.fields(),
                                                  solver.eps)))
    iter_outer = 0
    gamma0 = -1.0
    best_outer = float("inf")
    stall_outer = 0

    while True:
        if gamma0 < 0 or opt.update_ref == "always":
            solver.calc_ref_material()
        mu0, lam0 = solver.mu_0, solver.lambda_0
        bca = bcmod.to_arrays(solver._bc, solver.dtype)

        F = solver.eps
        abc = (None if opt.newton_tangent != "frozen_iso"
               else _frozen_abc(solver))
        X0 = voigt.dyad4_mv(solver._bc.M, np.asarray(S0))
        X, R, gamma = ks["init"](solver.mat.fields(), F, X0,
                                 mu0=mu0, lam0=lam0, bca=bca, abc=abc)
        gamma = float(gamma)
        if gamma0 < 0:
            gamma0 = gamma
        Q = R

        ee = make_estimator(opt.error_estimator)
        ee.start(np.asarray(ks["metric"](solver.mat.fields(), solver.eps)))
        solver._reset_stall()   # inner CG restarts its relative errors
        it = 0
        K = max(1, int(opt.check_every))
        if K > 1:
            # chunked inner CG: K iterations per device dispatch; stacks are
            # pulled to host one chunk behind (the ~28 ms tunnel sync
            # overlaps device compute, exactly like _run_cg_elasticity)
            pending = None
            eps_checkpoint = solver.eps
            while True:
                X, R, Q, gamma, eps2, gammas, denoms, mets = ks["cg_multi"](
                    solver.mat.fields(), F, X, R, Q, gamma, opt.newton_relax,
                    mu0=mu0, lam0=lam0, bca=bca, abc=abc)
                done = False
                if pending is not None:
                    pg, pden, pm, eps_prev = pending
                    pg, pden, pm = (np.asarray(pg), np.asarray(pden),
                                    np.asarray(pm))
                    for k in range(K):
                        if pden[k] <= 0:
                            solver._canceled = True
                            solver._diverged = True
                            LOG.error(
                                f"indefinite operator (alpha={pden[k]:g}) "
                                "canceling CG!")
                            # the state advanced past the bad step: restore
                            # the last checked chunk boundary
                            solver.eps = eps_prev
                            return
                        if ee.metric_kind == "residual":
                            ee.update_cg(float(pg[k]), gamma0)
                        else:
                            ee.update(pm[k])
                        it, done = solver._converged(
                            it, ee.abs_error(), ee.rel_error(),
                            check_bc=False)
                        if done:
                            break
                    eps_checkpoint = eps_prev
                solver.eps = eps2
                if done:
                    break
                pending = (gammas, denoms, mets, eps_checkpoint)
                eps_checkpoint = eps2
        else:
            while True:
                X, eps2, R, Q, delta, denom = ks["cg_step"](
                    solver.mat.fields(), F, X, R, Q, gamma, opt.newton_relax,
                    mu0=mu0, lam0=lam0, bca=bca, abc=abc)
                if float(denom) <= 0:
                    solver._canceled = True
                    solver._diverged = True
                    LOG.error(f"indefinite operator (alpha={float(denom):g}) "
                              "canceling CG!")
                    return
                solver.eps = eps2
                if ee.metric_kind == "residual":
                    ee.update_cg(gamma, gamma0)
                else:
                    ee.update(np.asarray(ks["metric"](solver.mat.fields(),
                                                      solver.eps)))
                it, done = solver._converged(it, ee.abs_error(),
                                             ee.rel_error(), check_bc=False)
                if done:
                    break
                gamma = float(delta)
        if solver._canceled:
            return

        ee_outer.update(np.asarray(ks["metric_outer"](solver.mat.fields(),
                                                      solver.eps)))
        # track outer stagnation separately from the inner CG (each outer
        # iteration costs a full inner solve, so the patience is short)
        outer_rel = ee_outer.rel_error()
        if outer_rel < best_outer * (1.0 - opt.tol_red):
            best_outer = outer_rel
            stall_outer = 0
        else:
            stall_outer += 1
            if stall_outer >= 5:
                LOG.warn(f"Newton made no progress for {stall_outer} outer "
                         f"iterations at rel. error {outer_rel:g}: stopping "
                         "at the precision floor.")
                break
        solver._reset_stall()   # do not leak inner-solve state into outer
        iter_outer, done = solver._converged(
            iter_outer, ee_outer.abs_error(), outer_rel)
        if done:
            break


def run_nlcg(solver, E0, S0):
    """Nonlinear conjugate gradient for finite strain
    (runNLCGHyper, fibergen.cpp:22480-22695).  The reference's backtracking
    line search is dead code (early `continue`, fibergen.cpp:22597); steps use
    the constant nl_cg_alpha exactly like the reference executes."""
    ks = _kernels(solver)
    opt = solver.opt

    # initialize: one basic-scheme application to satisfy the mean constraint
    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0
    bca = bcmod.to_arrays(solver._bc, solver.dtype)
    E = solver._bc_mean(np.asarray(E0), np.asarray(S0))
    solver.eps, _ = solver._k_basic(
        solver.mat.fields(), solver.eps, jnp.asarray(E, solver.dtype), bca,
        mu0=mu0, lam0=lam0)

    solver.calc_ref_material()
    mu0, lam0 = solver.mu_0, solver.lambda_0
    bca = bcmod.to_arrays(solver._bc, solver.dtype)

    Emean = voigt.dyad4_mv(solver._bc.M, np.asarray(S0))
    alpha = opt.nl_cg_alpha
    beta_scheme = opt.nl_cg_beta_scheme

    X = solver.eps
    s = jnp.zeros_like(X)
    dX = None
    dX_norm2 = 0.0
    dX_norm2_initial = -1.0
    it = 0

    while True:
        dX_old = dX
        dX_old_norm2 = dX_norm2
        s_old = s

        dX, n2 = ks["grad"](solver.mat.fields(), X, Emean,
                            mu0=mu0, lam0=lam0, bca=bca)
        dX_norm2 = float(n2)
        if dX_norm2_initial < 0:
            dX_norm2_initial = dX_norm2 + np.finfo(np.float64).tiny

        abs_err = np.sqrt(dX_norm2)
        rel_err = np.sqrt(dX_norm2 / dX_norm2_initial)
        it, done = solver._converged(it, abs_err, rel_err, check_bc=False)
        if done:
            break

        beta = 0.0
        if it > 1 and dX_old is not None:
            if beta_scheme == "steepest_descent":
                beta = 0.0
            elif beta_scheme == "polak_ribiere":
                dot_old = float(ks["inner"](dX, dX_old))
                beta = 0.0 if dot_old > 0.2 * dX_norm2 else (
                    (dX_norm2 - dot_old) / dX_old_norm2)
            elif beta_scheme == "fletcher_reeves":
                beta = dX_norm2 / dX_old_norm2
            elif beta_scheme == "hestenes_stiefel":
                dot_old = float(ks["inner"](dX, dX_old))
                beta = (dX_norm2 - dot_old) / float(ks["inner_diff"](s_old, dX, dX_old))
            elif beta_scheme == "day_yuan":
                beta = dX_norm2 / float(ks["inner_diff"](s_old, dX, dX_old))
            else:
                raise ValueError(f"Unknown beta scheme '{beta_scheme}'")
        beta = max(0.0, beta)

        s = dX + beta * s_old if beta != 0.0 else dX
        X = X + alpha * s
        solver.eps = X
