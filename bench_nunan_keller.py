import json
import numpy as np
import fibergen_tpu as fg
from fibergen_tpu.utils.logging import LOG
LOG.enabled = False

PAPER = {0.01: (0.025941, 0.024813), 0.02: (0.053804, 0.049320),
         0.04: (0.11567, 0.097696), 0.08: (0.26755, 0.19337),
         0.12: (0.46580, 0.28995), 0.16: (0.72502, 0.39009),
         0.20: (1.0666, 0.49665), 0.24: (1.5228, 0.61306),
         0.28: (2.1459, 0.74379)}
rows = []
for V, (a_ref, b_ref) in PAPER.items():
    f = fg.FG()
    f.load_xml("demo/viscosity/nunan_keller/project.xml")
    f.set("actions.place_fiber..V", V)
    f.set("solver.dtype", "float32")
    rc = f.run()
    a, b = f._nunan_keller if rc == 0 else (float("nan"), float("nan"))
    rows.append({"V": V, "alpha": a, "beta": b, "alpha_paper": a_ref,
                 "beta_paper": b_ref,
                 "alpha_err": abs(a - a_ref) / a_ref,
                 "beta_err": abs(b - b_ref) / b_ref})
    print(json.dumps(rows[-1]), flush=True)
json.dump(rows, open("/tmp/nk_table.json", "w"), indent=1)
