"""Microbench one c2c chain stage: full matmul vs DIF variants.

Disambiguates why the DIF radix-2 chain measured slower than the
full-length matmul chain at 256^3: if the no-concat DIF variant runs at
~half the full-stage time, the output concatenate is the cost and a
block-structured chain would win; if it runs near the full-stage time, the
half-size (K=128) matmuls themselves are inefficient and DIF is hopeless.

Each variant's outputs are fully sum-reduced (equal extra read pass) so
nothing is DCE'd; the input is perturbed by the scan carry so the stage
can't be hoisted out of the loop.

Run on the real TPU: python scripts/bench_dif_stage.py [n]
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
    import jax.lax as lax
    from fibergen_tpu.ops import fft as fftmod

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    nzc = n // 2 + 1
    # x-stage shape: (3, X, KZ, KY) contracting X (axis -3), out last
    re = jnp.asarray(rng.standard_normal((3, n, nzc, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((3, n, nzc, n)).astype(np.float32))
    spec = "...xkj,ix->...kji"
    dt = re.dtype

    C, S = fftmod._c2c_mats(n, -1)
    CeC, CeS, CoC, CoS = fftmod._dif_mats(n, -1)

    def full(re, im):
        return fftmod._apply_rot(re, im, spec, C, S, dt)

    def dif_concat(re, im):
        a_re, b_re = jnp.split(re, 2, axis=-3)
        a_im, b_im = jnp.split(im, 2, axis=-3)
        e_re, e_im = fftmod._apply_rot(a_re + b_re, a_im + b_im, spec,
                                       CeC, CeS, dt)
        o_re, o_im = fftmod._apply_rot(a_re - b_re, a_im - b_im, spec,
                                       CoC, CoS, dt)
        return (jnp.concatenate([e_re, o_re], axis=-1),
                jnp.concatenate([e_im, o_im], axis=-1))

    def dif_blocks(re, im):
        a_re, b_re = jnp.split(re, 2, axis=-3)
        a_im, b_im = jnp.split(im, 2, axis=-3)
        e_re, e_im = fftmod._apply_rot(a_re + b_re, a_im + b_im, spec,
                                       CeC, CeS, dt)
        o_re, o_im = fftmod._apply_rot(a_re - b_re, a_im - b_im, spec,
                                       CoC, CoS, dt)
        return e_re, e_im, o_re, o_im

    for name, fn in [("full", full), ("dif+concat", dif_concat),
                     ("dif-blocks", dif_blocks)]:
        @jax.jit
        def many(re, im, fn=fn):
            def body(acc, _):
                outs = fn(re + acc, im)
                s = sum(jnp.sum(o) for o in outs)
                return s * 1e-30, 0.0
            out, _ = lax.scan(body, jnp.zeros((), dt), None, length=10)
            return out
        y = many(re, im)
        _ = float(y)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(many(re, im))
        dtms = (time.perf_counter() - t0) / 30 * 1e3
        print(f"{name}: {dtms:.3f} ms/stage")


if __name__ == "__main__":
    main()
