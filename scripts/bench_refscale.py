"""Iteration-count probe: CG iterations to tolerance vs reference-material
scale, at low and high phase contrast (CPU f64 or TPU f32).

The reference fixes mu_0 = 0.5*(lmin+lmax) (calcRefMaterial,
fibergen.cpp:22283-22313) — provably optimal for the BASIC scheme's
spectral radius, but CG's convergence depends on the whole spectrum of
I + Gamma(C-C0), so ref_scale is a free knob.  This measures whether any
scale (incl. the geometric mean, ref_scale = 2*sqrt(lmin*lmax)/(lmin+lmax))
beats the default on iterations-to-1e-6.

Usage: python scripts/bench_refscale.py [n] [contrast...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(n, contrast, scale):
    import jax.numpy as jnp

    import fibergen_tpu as fg
    grid = fg.Grid(n, n, n)
    ax = [(np.arange(s) + 0.5) / s - 0.5 for s in grid.shape]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi1 = jnp.asarray(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float32))
    mat = fg.VoigtMixed([
        fg.Phase("fiber", fg.LinearIsotropic(mu=contrast, lam=contrast / 2),
                 phi1),
        fg.Phase("matrix", fg.LinearIsotropic(mu=1.0, lam=1.0), 1.0 - phi1),
    ], dim=6)
    import jax
    dtype = "float32" if jax.default_backend() != "cpu" else "float64"
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype=dtype, check_every=8, tol=1e-6, maxiter=3000,
        error_estimator="residual", ref_scale=scale))
    s.set_strain([1.0, 0, 0, 0, 0, 0])
    fail = s.run()
    return len(s.residuals), float(s.residuals[-1]), fail


def main():
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    contrasts = [float(c) for c in sys.argv[2:]] or [10.0, 1000.0]
    for c in contrasts:
        row = []
        for scale in (0.6, 0.8, 1.0, 1.2, 1.5, 2.0):
            iters, rel, fail = run(n, c, scale)
            row.append(f"scale {scale}: {iters} it"
                       + (" FAIL" if fail else ""))
        print(f"contrast {c}: " + " | ".join(row), flush=True)


if __name__ == "__main__":
    main()
