"""One-run roofline table for the 256^3 staggered-CG step (real chip).

Measures every access pattern the step is built from — pure copy, the CG
axpy tail, reduction-only, the two sweep kernels, and the spectral chain —
in a single process with one byte-accounting convention (bytes = minimal
algorithmic HBM traffic: each input field read once + each output written
once; 67.1 MB per 256^3 f32 component field), and prints a markdown table
with %% of the best streaming rate observed in the same run.

This reconciles the 230/300/470/650 GB/s figures PARITY quoted from
separate round-3 studies into one auditable table (VERDICT r3 next-step
#7).

Timing convention (CLAUDE.md): axon's block_until_ready does NOT sync, so
each pattern runs N times chained through a lax.scan CARRY inside one jit
program (the data dependence defeats loop-invariant hoisting), and the
wall time is read with a single float() sync, divided by N.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import fibergen_tpu as fg
    from fibergen_tpu.core import voigt
    from fibergen_tpu.ops import green
    from fibergen_tpu.ops import pallas_sweep as psw
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    grid = fg.Grid(n, n, n)
    fb = 4 * n**3                      # one f32 component field, bytes
    print(f"backend={jax.default_backend()} n={n} field={fb/2**20:.1f} MiB")

    p6 = jax.random.normal(jax.random.key(0), (6, n, n, n), jnp.float32)
    r6 = jax.random.normal(jax.random.key(1), (6, n, n, n), jnp.float32)
    e6 = jax.random.normal(jax.random.key(2), (6, n, n, n), jnp.float32)
    w6 = jax.random.normal(jax.random.key(5), (6, n, n, n), jnp.float32)
    u3 = jax.random.normal(jax.random.key(3), (3, n, n, n), jnp.float32)
    mu_x = jnp.abs(jax.random.normal(jax.random.key(4), (n, n, n),
                                     jnp.float32)) + 1.0
    lam_x = mu_x * 0.5

    N = 20
    rows = []

    def bench(name, body, init, nbytes, ops=(), reps=N):
        """body(carry, *ops) -> carry; chained `reps` times in one program.

        The carry dependence forces every iteration to execute; float() on
        the reduced result is the only host sync (one per timing run).
        Field-sized operands MUST ride in `ops` (jit arguments) — a closure
        would bake them into the program as constants and ship hundreds of
        MB through the remote-compile tunnel at ~20 MB/s.
        """
        @jax.jit
        def loop(c0, *ops):
            def step(c, _):
                return body(c, *ops), 0.0
            c, _ = lax.scan(step, c0, None, length=reps)
            leaves = jax.tree_util.tree_leaves(c)
            return sum(jnp.asarray(l).ravel()[0].astype(jnp.float32)
                       for l in leaves)
        float(loop(init, *ops))              # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(init, *ops))
            best = min(best, (time.perf_counter() - t0) / reps)
        gbs = nbytes / best / 1e9
        rows.append((name, best * 1e3, nbytes / fb, gbs))
        print(f"{name}: {best*1e3:.2f} ms, {gbs:.0f} GB/s", flush=True)

    # 1. pure streaming copy-scale: r6 + w6
    bench("copy-scale y = 1.0001 x   (r6+w6)",
          lambda c: c * 1.0001, p6, 12 * fb)

    # 2. CG axpy pair + delta reduction (the XLA tail of the fused step):
    #    eps' = eps + a p ; r' = r - a (p - w) ; delta = <r', r'>
    wv = jnp.asarray(voigt.weights(6), jnp.float32).reshape(6, 1, 1, 1)

    def tail(c, p, w):
        e, r = c
        a = jnp.float32(0.37)
        eps2 = e + a * p
        r2 = r - a * (p - w)
        delta = (r2 * wv * r2).sum()
        return eps2, r2 + delta * jnp.float32(1e-38)

    bench("CG axpy tail + reduction  (r24+w12)", tail, (e6, r6), 36 * fb,
          ops=(p6, w6))

    # 3. reduction only: r6 (carry is the scalar; the 1e-38 perturbation
    #    defeats hoisting without touching the traffic)
    bench("weighted dot              (r6)",
          lambda s, p: ((p + s * jnp.float32(1e-38)) * wv * p).sum(),
          jnp.float32(0.0), 6 * fb, ops=(p6,))

    # 4/5. the two sweep kernels (min traffic: every field once);
    #      chained on their natural 6-component outputs
    if psw.supported(grid, 6, jnp.float32):
        def sweep1(c, r, mu, lam):
            f, p = psw.stress_div_beta_sweep(
                grid, r, c, 0.5, mu, lam, 1.0, 0.0)
            return p + f[0, 0, 0, 0] * jnp.float32(1e-38)
        bench("stress+div sweep kernel   (r14+w9)", sweep1, p6, 23 * fb,
              ops=(r6, mu_x, lam_x))

        def sweep2(c, u):
            w, dot = psw.eps_from_u_dot_sweep(grid, np.zeros(6), u, c)
            return w + dot * jnp.float32(1e-38)
        bench("eps+dot sweep kernel      (r9+w6)", sweep2, p6, 15 * fb,
              ops=(u3,))

    # 6. spectral chain (3-comp fft+G0+ifft; MXU-bound, listed for the
    #    step budget, not the bandwidth roofline)
    bench("G0 chain fft+apply+ifft   (r3+w3+MXU)",
          lambda c: green.g0_staggered_fused(grid, 1.0, 0.0, c, -1.0),
          u3, 6 * fb)

    best_gbs = max(g for _, _, _, g in rows)
    print("\n| Access pattern | ms | min fields moved | GB/s | % of best"
          " streaming rate |")
    print("|---|---|---|---|---|")
    for name, ms, nf, gbs in rows:
        print(f"| {name} | {ms:.2f} | {nf:.0f} | {gbs:.0f} |"
              f" {100*gbs/best_gbs:.0f}% |")


if __name__ == "__main__":
    main()
