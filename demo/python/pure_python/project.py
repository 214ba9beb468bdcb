"""Pure-Python project: drive fibergen_tpu without an XML file
(the reference's demo/python/pure_python equivalent)."""
import numpy as np

import fibergen_tpu as fgt

fg = fgt.FG()
fg.set_xml("""
<settings>
  <solver n="32">
    <tol>1e-8</tol>
    <materials>
      <matrix mu="1" lambda="1" />
      <fiber mu="10" lambda="5" />
    </materials>
  </solver>
  <actions />
</settings>
""")
fg.run()  # evaluates variables, empty actions

fg.init_lss()
# place geometry programmatically
fg.set("actions.select_material..name", "fiber")
fg.set("actions.place_fiber..R", 0.25)
fg.set("actions.run_load_case..e11", 1.0)
fg.run()

sigma = np.array(fg.get_mean_stress())
print("mean stress:", sigma)
print("residuals:", len(fg.get_residuals()))
