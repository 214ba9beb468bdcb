"""AOT memory analysis of the single-chip low-memory CG chunk at 512^3.

Lowers the actual run-loop unit (cg_multi with donation) against the real
TPU backend with abstract arguments — no 512^3 data ever crosses the
tunnel — and prints the compiler's buffer-assignment peak.  This is the
go/no-go gate for `python bench.py 512` (VERDICT r3 next-step #4).

Usage: python scripts/check_512_mem.py [n] [K] [--std]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import fibergen_tpu as fg
    from fibergen_tpu.core import fields
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 4
    low_mem = "off" if "--std" in sys.argv else "on"

    grid = fg.Grid(n, n, n)
    x = (np.arange(n) + 0.5) / n
    phi1 = jnp.asarray(np.broadcast_to(
        ((x % 0.5) < 0.25)[:, None, None], grid.shape).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("a", fg.LinearIsotropic(mu=10, lam=5), phi1),
        fg.Phase("b", fg.LinearIsotropic(mu=1, lam=1), 1 - phi1)], dim=6)
    mat._all_iso()
    mat.drop_phi()

    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype="float32", check_every=K, low_mem=low_mem))
    s.mu_0, s.lambda_0 = 9.25, 0.0   # representative static ref material
    print(f"n={n} K={K} low_mem={low_mem} backend={jax.default_backend()}")

    mf = s.mat.fields()
    import jax.tree_util as jtu
    mf_abs = jtu.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), mf)
    sc = jax.ShapeDtypeStruct((), jnp.float32)
    if low_mem == "on" and s._lm6_capable and "--stacked" not in sys.argv:
        # the run loop's actual 512^3 unit: tuple-state leaves, no (6,...)
        f1 = jax.ShapeDtypeStruct((n, n, n), jnp.float32)
        t6 = (f1,) * 6
        print("lowering: lm6 tuple-state chunk")
        comp = s._lm6_multi_n(K).lower(
            mf_abs, t6, t6, t6, sc, sc,
            mu0=s.mu_0, lam0=s.lambda_0).compile()
    else:
        f6 = jax.ShapeDtypeStruct((6, n, n, n), jnp.float32)
        print("lowering: stacked chunk")
        comp = s._cg_multi_n(K).lower(
            mf_abs, f6, f6, f6, sc, sc, None,
            mu0=s.mu_0, lam0=s.lambda_0).compile()
    m = comp.memory_analysis()
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            print(f"{k}: {v/2**30:.3f} GiB")
    args = m.argument_size_in_bytes
    temp = m.temp_size_in_bytes
    alias = getattr(m, "alias_size_in_bytes", 0)
    out = m.output_size_in_bytes
    # aliased outputs reuse argument buffers; peak = args + temps +
    # non-aliased outputs
    peak = args + temp + max(0, out - alias)
    print(f"peak estimate: {peak/2**30:.3f} GiB (HBM 15.75)")


if __name__ == "__main__":
    main()
