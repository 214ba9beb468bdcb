"""Generate demo-browser thumbnails.

For every demo/<category>/<name>/project.xml, rasterize the project's
geometry at low resolution and save a mid-cell slice of the signed-distance
field as thumbnail.png next to it (the reference ships hand-made thumbnails
which its GUI demo browser displays, fibergen_gui.py:2381-2682).

Usage:  python doc/make_thumbnails.py [res]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(res=48):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    import fibergen_tpu as fg
    from fibergen_tpu.geometry import discretize
    from fibergen_tpu.utils.logging import LOG

    LOG.enabled = False
    root = os.path.join(os.path.dirname(__file__), "..", "demo")
    made = skipped = 0
    for cat in sorted(os.listdir(root)):
        catdir = os.path.join(root, cat)
        if not os.path.isdir(catdir):
            continue
        for name in sorted(os.listdir(catdir)):
            proj = os.path.join(catdir, name, "project.xml")
            if not os.path.isfile(proj):
                continue
            out = os.path.join(catdir, name, "thumbnail.png")
            try:
                from fibergen_tpu.config.xmlproject import SettingsReader
                f = fg.FG()
                f.load_xml(proj)
                # shrink the resolution through the usual variable hooks
                for path in ("variables.res..value", "solver..n"):
                    try:
                        if f.project.get(path):
                            f.set(path, res)
                    except Exception:  # noqa: BLE001
                        pass
                f._init_python()
                f.init_lss()
                f.init_fibers()
                # geometry is usually placed by actions: run only those
                geom = ("select_material", "place_fiber", "place_triangle",
                        "place_tetrahedron", "place_stl", "place_tetvtk",
                        "place_tetdolfin", "set_fiber_distribution",
                        "set_orientation_distribution",
                        "set_length_distribution", "set_radius_distribution",
                        "generate_fibers")
                acts = f.project.root.find("actions")
                for action in (acts if acts is not None else []):
                    if action.tag in geom:
                        f._dispatch_action(action.tag, action,
                                           SettingsReader(f.engine, action))
                fibers = f.gen.all_fibers()
                if not fibers:
                    raise ValueError("no geometry")
                gf = discretize.geometry_fields(f.solver.grid, fibers)
                d = np.asarray(gf["distance"])
                sl = d[:, :, d.shape[2] // 2]
            except Exception as e:  # noqa: BLE001 - raw-data/demo quirks
                print(f"skip {cat}/{name}: {e}")
                skipped += 1
                continue
            fig, ax = plt.subplots(figsize=(1.6, 1.6), dpi=80)
            ax.imshow(sl.T, origin="lower", cmap="viridis")
            ax.axis("off")
            fig.subplots_adjust(0, 0, 1, 1)
            fig.savefig(out)
            plt.close(fig)
            made += 1
            print(f"thumbnail {cat}/{name}")
    print(f"done: {made} thumbnails, {skipped} skipped")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 48)
