"""Sequential x-sweep Pallas kernels for the staggered CG hot path.

The BlockSpec kernels in pallas_kernels.py wrap-pad their inputs with
``jnp.pad`` to provide the periodic stencil halo; because the producer and
consumer of those arrays are opaque pallas calls, XLA materializes every
pad — a full extra HBM read+write of all 14 input components per
iteration (~2 GB at 256^3), which measured as ~45% of the stencil kernels'
runtime.

These kernels eliminate the halo entirely with a manual-DMA sequential
sweep along x (the reference's divOperatorStaggered / epsOperatorStaggered
loops, fibergen.cpp:18853 + 18614, restructured for the TPU memory
system):

  * the kernel receives full HBM refs (no BlockSpecs) and double-buffers
    x-slabs of ``bx`` planes through VMEM with explicit ``make_async_copy``;
  * y and z stay fully resident per slab, so their periodic shifts are
    in-register ``pltpu.roll``s;
  * the x halo is a 2-plane VMEM carry: the stencil output lags the sweep
    by one plane, so every input plane is read from HBM EXACTLY ONCE;
  * the periodic wrap (f at x = nx-1 needs tau at x = 0) is handled by a
    prologue that preloads the last input planes and a split output DMA on
    the first block.

Each CG iteration's two stencil passes then move the mathematically
minimal traffic: read(r, p_prev, moduli) + write(f, p), and
read(u, p) + write(w) with the fused Voigt CG denominator
(Kahan-compensated in VMEM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from . import pallas_kernels as pk

# VMEM budget for scratch buffers (double-buffered slabs + carries).  The
# Mosaic scoped limit is ~124 MB on v5e; compute temporaries (stencil
# stacks, roll results) take roughly another third on top of the explicit
# scratch, so the scratch budget stays well below it.  (68 MB keeps the
# eps kernel at bx=8 for 256^3 — measured stable on v5e.)
_VMEM_BUDGET = 68 * 1024 * 1024

# exact explicit-scratch plane counts per kernel, as (per_bx, fixed):
#   stress_div_beta: inb 2*14*bx + outb 2*9*bx + pro 14*2 + carry 6*2
#                    (+ acc/comp 12 with the tau-sum reduction)
#   eps_from_u_dot:  uwin 2*3*(bx+2) + pwin 2*6*(bx+1) + outb 2*6*bx
#                    + acc/comp 2 (+ muwin 2*(bx+1) for the viscosity
#                    in-kernel tau term)
_STRESS_PLANES = (46, 40)
_STRESS_PLANES_TS = (46, 52)
_EPS_PLANES = (30, 26)
_EPS_PLANES_V = (32, 28)
# the viscosity eps variant's bx=8 working set at 256^3 is 71 MB; its
# budget is raised accordingly (Mosaic scoped limit ~124 MB, compute
# temporaries measured well under the remaining headroom)
_VMEM_BUDGET_V = 72 * 1024 * 1024


def _roll(a, shift, axis):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def pick_bx(shape, per_bx, fixed, budget=_VMEM_BUDGET):
    """Largest x-slab size whose explicit VMEM scratch (``per_bx * bx +
    fixed`` planes — the exact per-kernel allocation) fits the budget;
    None if even bx=1 does not fit."""
    nx, ny, nz = shape
    plane = ny * nz * 4
    for bx in (8, 4, 2, 1):
        if nx % bx != 0 or nx // bx < 3:
            continue
        need = (per_bx * bx + fixed) * plane
        if need <= budget:
            return bx
    return None


def supported(grid: Grid, dim: int, dtype) -> bool:
    if not (dim == 6 and grid.nz % 128 == 0 and grid.ny % 8 == 0
            and jnp.dtype(dtype) == jnp.float32):
        return False
    shape = (grid.nx, grid.ny, grid.nz)
    return (pick_bx(shape, *_STRESS_PLANES) is not None
            and pick_bx(shape, *_EPS_PLANES) is not None)


def supported_visc(grid: Grid, dim: int, dtype) -> bool:
    """Shape gate for the fused viscosity-staggered CG variant (tau-sum
    reduction in the stress sweep + in-kernel tau term in the eps sweep)."""
    if not supported(grid, dim, dtype):
        return False
    shape = (grid.nx, grid.ny, grid.nz)
    return (pick_bx(shape, *_STRESS_PLANES_TS) is not None
            and pick_bx(shape, *_EPS_PLANES_V, budget=_VMEM_BUDGET_V)
            is not None)


def stress_div_beta_sweep(grid: Grid, r, p_prev, beta, mu_x, lam_x,
                          mu0, lam0, want_tau_sum=False):
    """p = r + beta p_prev; f = div_staggered((C(x) - C0) : p); one sweep.

    Equals pallas_kernels.stress_div_beta_staggered (same math, same
    discretization) with zero halo-pad traffic.  Returns (f, p), plus the
    per-component grid sum of tau (Kahan-compensated, shape (6,)) when
    ``want_tau_sum`` — the viscosity Delta scheme's mean correction
    (delta_operator adj, fibergen.cpp:20446-20453) for free in the same
    pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = r.shape[-3:]
    planes = _STRESS_PLANES_TS if want_tau_sum else _STRESS_PLANES
    bx = pick_bx((nx, ny, nz), *planes)
    nb = nx // bx
    dt = r.dtype

    mu0f, lam0f = float(mu0), float(lam0)
    hx = float(grid.nx / grid.dx)
    hy = float(grid.ny / grid.dy)
    hz = float(grid.nz / grid.dz)

    mod = jnp.stack([mu_x, lam_x])
    beta_a = jnp.asarray(beta, dt).reshape(1, 1)

    def tau_of(rr, pp, mm, b):
        """p and tau of a slab; rr/pp (6, k, ny, nz), mm (2, k, ny, nz)."""
        pblk = rr + b * pp
        dmu = 2.0 * (mm[0] - mu0f)
        ltr = (mm[1] - lam0f) * (pblk[0] + pblk[1] + pblk[2])
        tau = jnp.concatenate([dmu * pblk[:3] + ltr[None], dmu * pblk[3:]])
        return pblk, tau

    def f_of(te):
        """f rows from a tau window te (6, k+2, ny, nz): output row j
        corresponds to x with tau rows (j, j+1, j+2) = (x-1, x, x+1)."""
        k = te.shape[1] - 2
        c = te[:, 1:1 + k]
        m = te[:, 0:k]
        q = te[:, 2:2 + k]
        dyp = lambda a: (_roll(a, -1, 1) - a) * hy
        dym = lambda a: (a - _roll(a, 1, 1)) * hy
        dzp = lambda a: (_roll(a, -1, 2) - a) * hz
        dzm = lambda a: (a - _roll(a, 1, 2)) * hz
        f0 = (c[0] - m[0]) * hx + dyp(c[5]) + dzp(c[4])
        f1 = (q[5] - c[5]) * hx + dym(c[1]) + dzp(c[3])
        f2 = (q[4] - c[4]) * hx + dyp(c[3]) + dzm(c[2])
        return jnp.stack([f0, f1, f2])

    def kernel(r_hbm, pp_hbm, mod_hbm, b_ref, f_hbm, p_hbm, *rest):
        if want_tau_sum:
            (ts_ref, inb, outb, pro, carry, acc, comp,
             isem, psem, osem) = rest
        else:
            inb, outb, pro, carry, isem, psem, osem = rest
        b = b_ref[0, 0]

        def in_copies(i, s):
            return (
                pltpu.make_async_copy(r_hbm.at[:, pl.ds(i * bx, bx)],
                                      inb.at[s, 0:6], isem.at[s, 0]),
                pltpu.make_async_copy(pp_hbm.at[:, pl.ds(i * bx, bx)],
                                      inb.at[s, 6:12], isem.at[s, 1]),
                pltpu.make_async_copy(mod_hbm.at[:, pl.ds(i * bx, bx)],
                                      inb.at[s, 12:14], isem.at[s, 2]),
            )

        # out-DMA descriptors; offsets only matter at .start(), the waits
        # only need matching transfer sizes on the same semaphore
        def p_copy(i, s):
            return pltpu.make_async_copy(
                outb.at[s, 0:6], p_hbm.at[:, pl.ds(i * bx, bx)],
                osem.at[s, 0])

        def f_copy(i, s):
            return pltpu.make_async_copy(
                outb.at[s, 6:9], f_hbm.at[:, pl.ds(i * bx - 1, bx)],
                osem.at[s, 1])

        def f_wrap_copy(s):
            return pltpu.make_async_copy(
                outb.at[s, 6:9, 0:1], f_hbm.at[:, pl.ds(nx - 1, 1)],
                osem.at[s, 2])

        def f_rest_copy(s):
            return pltpu.make_async_copy(
                outb.at[s, 6:9, 1:bx], f_hbm.at[:, pl.ds(0, bx - 1)],
                osem.at[s, 1])

        # ---- prologue: carry = tau(nx-2), tau(nx-1) from the last planes
        pros = (
            pltpu.make_async_copy(r_hbm.at[:, pl.ds(nx - 2, 2)],
                                  pro.at[0:6], psem.at[0]),
            pltpu.make_async_copy(pp_hbm.at[:, pl.ds(nx - 2, 2)],
                                  pro.at[6:12], psem.at[1]),
            pltpu.make_async_copy(mod_hbm.at[:, pl.ds(nx - 2, 2)],
                                  pro.at[12:14], psem.at[2]),
        )
        for cp in pros:
            cp.start()
        for cp in in_copies(0, 0):
            cp.start()
        for cp in pros:
            cp.wait()
        _, tau_carry = tau_of(pro[0:6], pro[6:12], pro[12:14], b)
        carry[...] = tau_carry
        if want_tau_sum:
            acc[...] = jnp.zeros((6, ny, nz), dt)
            comp[...] = jnp.zeros((6, ny, nz), dt)

        def body(i, _):
            s = i % 2
            for cp in in_copies(i, s):
                cp.wait()

            @pl.when(i + 1 < nb)
            def _():
                for cp in in_copies(i + 1, 1 - s):
                    cp.start()

            pblk, tau = tau_of(inb[s, 0:6], inb[s, 6:12], inb[s, 12:14], b)
            if want_tau_sum:
                # Kahan-accumulate the per-component tau sum over the
                # block's own x rows (each row counted exactly once)
                contrib = tau.sum(axis=1)            # (6, ny, nz)
                y = contrib - comp[...]
                t = acc[...] + y
                comp[...] = (t - acc[...]) - y
                acc[...] = t
            te = jnp.concatenate([carry[...], tau], axis=1)
            fblk = f_of(te)                    # rows i*bx-1 .. i*bx+bx-2
            carry[...] = te[:, bx:bx + 2]

            # wait for the out-DMAs issued two iterations ago on this slot
            @pl.when(i >= 2)
            def _():
                p_copy(i, s).wait()

            @pl.when(i == 2)
            def _():
                f_wrap_copy(s).wait()
                if bx > 1:
                    f_rest_copy(s).wait()

            @pl.when(i > 2)
            def _():
                f_copy(i, s).wait()

            outb[s, 0:6] = pblk
            outb[s, 6:9] = fblk

            p_copy(i, s).start()

            @pl.when(i == 0)
            def _():
                # f rows [-1 .. bx-2]: local row 0 is f(nx-1)
                f_wrap_copy(s).start()
                if bx > 1:
                    f_rest_copy(s).start()

            @pl.when(i > 0)
            def _():
                f_copy(i, s).start()

            return 0

        jax.lax.fori_loop(0, nb, body, 0, unroll=False)

        # drain the final two slots (nb >= 3, so i >= 1 here)
        for back in (2, 1):
            i = nb - back
            s = i % 2
            p_copy(i, s).wait()
            f_copy(i, s).wait()

        if want_tau_sum:
            for ci in range(6):
                ts_ref[ci, 0] = (acc[ci] - comp[ci]).sum()

    out_shape = [jax.ShapeDtypeStruct((3, nx, ny, nz), dt),
                 jax.ShapeDtypeStruct((6, nx, ny, nz), dt)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((2, 14, bx, ny, nz), dt),
        pltpu.VMEM((2, 9, bx, ny, nz), dt),
        pltpu.VMEM((14, 2, ny, nz), dt),
        pltpu.VMEM((6, 2, ny, nz), dt),
    ]
    if want_tau_sum:
        out_shape.append(jax.ShapeDtypeStruct((6, 1), dt))
        out_specs.append(pl.BlockSpec((6, 1), memory_space=pltpu.SMEM))
        scratch += [pltpu.VMEM((6, ny, nz), dt), pltpu.VMEM((6, ny, nz), dt)]
    scratch += [
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((3,)),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 24 * 1024 * 1024),
        interpret=pk.INTERPRET,
    )(r, p_prev, mod, beta_a)
    if want_tau_sum:
        f, p, ts = out
        return f, p, ts[:, 0]
    f, p = out
    return f, p


def eps_from_u_dot_sweep(grid: Grid, E, u, p, mu_x=None, tau2c=0.0,
                         mu0=0.0):
    """w = E + sym grad_staggered(u), fused with the Voigt-weighted CG
    denominator sum p : (p - w) (Kahan-compensated).  Returns (w, dot_raw).

    With ``mu_x`` the viscosity Delta scheme's tau term rides the same
    pass: w += tau2c * (mu_x - mu0) * p per component (tau2c folds the
    factor 2 of tau = 2(mu-mu0)p and the Delta coefficient 2*alpha*mu0v,
    fibergen.cpp:20446-20458), with the CG dot computed against the FULL w
    — one extra 1-plane window instead of a separate full-field pass.

    Equals pallas_kernels.eps_from_u_dot_staggered with zero halo-pad
    traffic.  The inputs stream through ROLLING VMEM WINDOWS: each block's
    DMA lands directly at row offset 2 (u) / 1 (p) of its window and the
    x-stencil carry is a 2-plane copy from the other slot's tail — the
    stencil rows are then pure slices, no per-block window concatenation
    (which measured ~20% of the kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = u.shape[-3:]
    visc = mu_x is not None
    if visc:
        bx = pick_bx((nx, ny, nz), *_EPS_PLANES_V, budget=_VMEM_BUDGET_V)
        mu4 = jnp.reshape(mu_x, (1, nx, ny, nz))
        tc2 = float(tau2c) * 2.0
        mu0f = float(mu0)
    else:
        bx = pick_bx((nx, ny, nz), *_EPS_PLANES)
    nb = nx // bx
    dt = u.dtype

    hx = float(grid.nx / grid.dx)
    hy = float(grid.ny / grid.dy)
    hz = float(grid.nz / grid.dz)
    wv = (1.0, 1.0, 1.0, 2.0, 2.0, 2.0)

    def kernel(*refs):
        if visc:
            (u_hbm, p_hbm, mu_hbm, e_ref, w_hbm, dot_ref,
             uwin, pwin, muwin, outb, acc, comp, isem, psem, osem) = refs
        else:
            (u_hbm, p_hbm, e_ref, w_hbm, dot_ref,
             uwin, pwin, outb, acc, comp, isem, psem, osem) = refs
        Ev = [e_ref[ci, 0] for ci in range(6)]

        def in_copies(i, s):
            cps = (
                pltpu.make_async_copy(u_hbm.at[:, pl.ds(i * bx, bx)],
                                      uwin.at[s, :, 2:bx + 2], isem.at[s, 0]),
                pltpu.make_async_copy(p_hbm.at[:, pl.ds(i * bx, bx)],
                                      pwin.at[s, :, 1:bx + 1], isem.at[s, 1]),
            )
            if visc:
                cps += (pltpu.make_async_copy(
                    mu_hbm.at[:, pl.ds(i * bx, bx)],
                    muwin.at[s, :, 1:bx + 1], isem.at[s, 2]),)
            return cps

        def w_copy(i, s):
            return pltpu.make_async_copy(
                outb.at[s], w_hbm.at[:, pl.ds(i * bx - 1, bx)],
                osem.at[s, 0])

        def w_wrap_copy(s):
            return pltpu.make_async_copy(
                outb.at[s, :, 0:1], w_hbm.at[:, pl.ds(nx - 1, 1)],
                osem.at[s, 1])

        def w_rest_copy(s):
            return pltpu.make_async_copy(
                outb.at[s, :, 1:bx], w_hbm.at[:, pl.ds(0, bx - 1)],
                osem.at[s, 0])

        # prologue: u(nx-2..nx-1) and p(nx-1) land straight in window 0
        pros = [pltpu.make_async_copy(u_hbm.at[:, pl.ds(nx - 2, 2)],
                                      uwin.at[0, :, 0:2], psem.at[0]),
                pltpu.make_async_copy(p_hbm.at[:, pl.ds(nx - 1, 1)],
                                      pwin.at[0, :, 0:1], psem.at[1])]
        if visc:
            pros.append(pltpu.make_async_copy(
                mu_hbm.at[:, pl.ds(nx - 1, 1)],
                muwin.at[0, :, 0:1], psem.at[2]))
        for cp in pros:
            cp.start()
        for cp in in_copies(0, 0):
            cp.start()
        for cp in pros:
            cp.wait()
        acc[...] = jnp.zeros((ny, nz), dt)
        comp[...] = jnp.zeros((ny, nz), dt)

        def body(i, _):
            s = i % 2
            for cp in in_copies(i, s):
                cp.wait()

            # carry rows from the other slot's tail (block i-1's last
            # planes), BEFORE the i+1 prefetch overwrites that region
            @pl.when(i > 0)
            def _():
                uwin[s, :, 0:2] = uwin[1 - s, :, bx:bx + 2]
                pwin[s, :, 0:1] = pwin[1 - s, :, bx:bx + 1]
                if visc:
                    muwin[s, :, 0:1] = muwin[1 - s, :, bx:bx + 1]

            @pl.when(i + 1 < nb)
            def _():
                for cp in in_copies(i + 1, 1 - s):
                    cp.start()

            # stencil rows are pure slices of the window
            um = uwin[s, :, 0:bx]
            uc = uwin[s, :, 1:bx + 1]
            uq = uwin[s, :, 2:bx + 2]
            pc = pwin[s, :, 0:bx]
            dyp = lambda a: (_roll(a, -1, 1) - a) * hy
            dym = lambda a: (a - _roll(a, 1, 1)) * hy
            dzp = lambda a: (_roll(a, -1, 2) - a) * hz
            dzm = lambda a: (a - _roll(a, 1, 2)) * hz
            ws = (
                Ev[0] + (uq[0] - uc[0]) * hx,
                Ev[1] + dyp(uc[1]),
                Ev[2] + dzp(uc[2]),
                Ev[3] + 0.5 * (dym(uc[2]) + dzm(uc[1])),
                Ev[4] + 0.5 * ((uc[2] - um[2]) * hx + dzm(uc[0])),
                Ev[5] + 0.5 * ((uc[1] - um[1]) * hx + dym(uc[0])),
            )
            if visc:
                # viscosity Delta term: + tau2c * 2 (mu(x) - mu0) p, aligned
                # with the output rows (muc mirrors pc's row range)
                dmu = tc2 * (muwin[s, 0, 0:bx] - mu0f)
                ws = tuple(ws[ci] + dmu * pc[ci] for ci in range(6))

            # Kahan-accumulate sum_c wv_c * p_c * (p_c - w_c) over x rows
            contrib = sum(
                (wv[ci] * pc[ci] * (pc[ci] - ws[ci])).sum(axis=0)
                for ci in range(6))
            y = contrib - comp[...]
            t = acc[...] + y
            comp[...] = (t - acc[...]) - y
            acc[...] = t

            @pl.when(i == 2)
            def _():
                w_wrap_copy(s).wait()
                if bx > 1:
                    w_rest_copy(s).wait()

            @pl.when(i > 2)
            def _():
                w_copy(i, s).wait()

            for ci in range(6):
                outb[s, ci] = ws[ci]

            @pl.when(i == 0)
            def _():
                w_wrap_copy(s).start()
                if bx > 1:
                    w_rest_copy(s).start()

            @pl.when(i > 0)
            def _():
                w_copy(i, s).start()

            return 0

        jax.lax.fori_loop(0, nb, body, 0, unroll=False)

        for back in (2, 1):
            i = nb - back
            s = i % 2
            w_copy(i, s).wait()

        dot_ref[0, 0] = (acc[...] - comp[...]).sum()

    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [u, p]
    scratch = [pltpu.VMEM((2, 3, bx + 2, ny, nz), dt),
               pltpu.VMEM((2, 6, bx + 1, ny, nz), dt)]
    if visc:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(mu4)
        scratch.append(pltpu.VMEM((2, 1, bx + 1, ny, nz), dt))
    in_specs.append(pl.BlockSpec((6, 1), memory_space=pltpu.SMEM))
    scratch += [
        pltpu.VMEM((2, 6, bx, ny, nz), dt),
        pltpu.VMEM((ny, nz), dt),
        pltpu.VMEM((ny, nz), dt),
        pltpu.SemaphoreType.DMA((2, 3 if visc else 2)),
        pltpu.SemaphoreType.DMA((3 if visc else 2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    budget = _VMEM_BUDGET_V if visc else _VMEM_BUDGET
    w, dot = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((6, nx, ny, nz), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=budget + 24 * 1024 * 1024),
        interpret=pk.INTERPRET,
    )(*inputs, jnp.asarray(E, dt).reshape(6, 1))
    return w, dot[0, 0]
