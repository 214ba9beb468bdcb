import json, time
import fibergen_tpu as fg
from fibergen_tpu.utils.logging import LOG
LOG.enabled = False
todo = ["elasticity/digital_rocks", "hyperelasticity/mixed_bc",
        "porous/porosity", "viscosity/nunan_keller", "viscosity/viscosity",
        "viscosity/viscosity_analytical"]
for d in todo:
    t0 = time.perf_counter()
    try:
        f = fg.FG()
        f.load_xml(f"demo/{d}/project.xml")
        rc = f.run()
        print(json.dumps({"demo": d, "rc": rc,
                          "sec": round(time.perf_counter()-t0, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"demo": d, "rc": "EXC", "err": str(e)[:100],
                          "sec": round(time.perf_counter()-t0, 1)}), flush=True)
