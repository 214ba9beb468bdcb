"""Isolate the fused-chain (fft+identity+ifft) cost: DIF split on vs off.

Times fftn_apply_ifftn_mm with an identity spectral apply on a 3-component
256^3 f32 field — the exact op sequence of the staggered G0 chain minus the
G0 scaling — for MM_DIF off/on, printing ms per chain.

Run on the real TPU: python scripts/bench_dif_chain.py [n]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp
    from fibergen_tpu.ops import fft as fftmod

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))

    for mode in ("off", "on"):
        fftmod.MM_DIF = mode
        fftmod.FFT_BACKEND = "matmul"

        @jax.jit
        def chain(v):
            return fftmod.fftn_apply_ifftn_mm(v, lambda re, im: (re, im))

        @jax.jit
        def chain_many(v):
            def body(c, _):
                return chain(c), 0.0
            import jax.lax as lax
            out, _ = lax.scan(body, v, None, length=10)
            return out

        y = chain_many(x)
        _ = float(jnp.sum(y))  # tunnel-safe sync (see CLAUDE.md)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            y = chain_many(y)
            _ = float(jnp.sum(y))
        dt = (time.perf_counter() - t0) / (reps * 10) * 1e3
        err = float(jnp.abs(y - x).max())
        print(f"MM_DIF={mode}: {dt:.2f} ms/chain (roundtrip-err {err:.2e})")
    fftmod.MM_DIF = "off"
    fftmod.FFT_BACKEND = "auto"


if __name__ == "__main__":
    main()
