import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import fibergen_tpu as fg
from fibergen_tpu.utils.logging import LOG
LOG.enabled = False
print("backend:", jax.default_backend())

# 1. heat laminate oracle (series conductivity = harmonic mean)
grid = fg.Grid(32, 8, 8)
x = (np.arange(grid.nx) + 0.5) / grid.nx
phi1 = jnp.asarray(np.broadcast_to((x < .5)[:, None, None], grid.shape).astype(np.float32))
mat = fg.VoigtMixed([
    fg.Phase("a", fg.ScalarLinearIsotropic(mu=1.0, dim=3), phi1),
    fg.Phase("b", fg.ScalarLinearIsotropic(mu=10.0, dim=3), 1 - phi1)], dim=3)
s = fg.LSSolver(grid, mat, fg.SolverOptions(mode="heat", tol=1e-6,
                maxiter=100, dtype="float32"))
s.set_strain([1.0, 0, 0])
assert not s.run()
assert len(s.residuals) < s.opt.maxiter
k = float(np.asarray(s.calc_mean_stress())[0])
print("heat k_eff:", k, "exact:", 20/11)
assert abs(k - 20/11) / (20/11) < 1e-4

# 2. hyperelastic SVK small-strain vs linear series-laminate C11 oracle
h = 1e-3
m1 = dict(mu=1.0, lam=1.0); m2 = dict(mu=5.0, lam=2.0)
hyp = fg.VoigtMixed([
    fg.Phase("m1", fg.SaintVenantKirchhoff(**m1), phi1),
    fg.Phase("m2", fg.SaintVenantKirchhoff(**m2), 1 - phi1)], dim=9)
sh = fg.LSSolver(grid, hyp, fg.SolverOptions(
    mode="hyperelasticity", method="cg", tol=1e-6, maxiter=500,
    dtype="float32"))
sh.set_strain(np.array([1 + h, 1, 1, 0, 0, 0, 0, 0, 0]))
assert not sh.run()
P11 = float(np.asarray(sh.calc_mean_stress())[0])
M1 = m1["lam"] + 2 * m1["mu"]; M2 = m2["lam"] + 2 * m2["mu"]
C11 = 1.0 / (0.5 / M1 + 0.5 / M2)
print("hyper P11/h:", P11 / h, "exact series C11:", C11)
assert abs(P11 / h - C11) / C11 < 2e-2      # O(h) finite-strain offset
print("min detF:", sh.calc_min_det_f(), "mean cauchy[0]:",
      float(np.asarray(sh.calc_mean_cauchy())[0]))
print("VERIFY OK")

# 3. round-4 paths: batched calc_effective_properties through the public
# XML API (run_batched + adaptive chunked CG), against the closed-form
# laminate stiffness (Milton Eq. 9.9)
XML = """<settings>
  <solver n="16">
    <tol>1e-6</tol>
    <check_every>4</check_every>
    <materials>
      <m1 mu="1.0" lambda="1.0" />
      <m2 mu="5.0" lambda="2.0" />
    </materials>
  </solver>
  <actions>
    <select_material name="m2" />
    <place_fiber type="halfspace" cx="0.5" cy="0.5" cz="0.5" ax="-1" ay="0" az="0" />
    <calc_effective_properties />
  </actions>
</settings>"""
f = fg.FG()
f.set_xml(XML)
assert f.run() == 0
C = np.array(f.get_effective_property())
C_exact = fg.isotropic_laminate_stiffness([(1.0, 1.0, 0.5), (5.0, 2.0, 0.5)])
rel = np.abs(C - C_exact).max() / np.abs(C_exact).max()
print("batched Ceff max rel err vs laminate closed form:", rel)
assert rel < 2e-3
print("VERIFY OK (incl. batched effective properties)")
