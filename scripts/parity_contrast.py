"""Iteration-count parity sweep vs the reference proxy: staggered CG on
the bench sphere RVE at 64^3 for material contrasts 10/100/1000, TPU f32,
residual estimator, tol 1e-6.  Compare against
``python bench_baseline_cpu.py --to-tol 64 1e-6 <contrast>`` (torch f64):
iteration counts are hardware-independent, so equal counts demonstrate
trajectory parity with runCGElasticity (fibergen.cpp:23153-23247)."""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def run(contrast, n=64, tol=1e-6):
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
    s = fg.LSSolver(grid, mat, fg.SolverOptions(
        mode="elasticity", method="cg", gamma_scheme="staggered",
        dtype="float32", error_estimator="residual", tol=tol, maxiter=4000))
    s.set_strain([1.0, 0, 0, 0, 0, 0])
    fail = s.run()
    return {"contrast": contrast, "iters_to_tol": len(s.residuals),
            "final_rel": float(s.residuals[-1]), "failed": bool(fail)}


if __name__ == "__main__":
    from fibergen_tpu.utils.logging import LOG
    LOG.enabled = False
    for c in (10.0, 100.0, 1000.0):
        print(json.dumps(run(c)), flush=True)
