import json, os, time, traceback
import fibergen_tpu as fg
from fibergen_tpu.utils.logging import LOG
LOG.enabled = False
rows = []
for cat in sorted(os.listdir("demo")):
    catdir = os.path.join("demo", cat)
    if not os.path.isdir(catdir):
        continue
    for name in sorted(os.listdir(catdir)):
        proj = os.path.join(catdir, name, "project.xml")
        if not os.path.isfile(proj):
            continue
        t0 = time.perf_counter()
        try:
            f = fg.FG()
            f.load_xml(proj)
            rc = f.run()
            dt = time.perf_counter() - t0
            rows.append({"demo": f"{cat}/{name}", "rc": rc, "sec": round(dt, 1)})
        except Exception as e:
            rows.append({"demo": f"{cat}/{name}", "rc": "EXC",
                         "err": str(e)[:100], "sec": round(time.perf_counter()-t0, 1)})
        print(json.dumps(rows[-1]), flush=True)
json.dump(rows, open("/tmp/demosweep.json", "w"))
