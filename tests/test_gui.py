"""Headless GUI-layer tests: slice viewer rendering and demo browser."""
import os

import matplotlib
matplotlib.use("Agg")

import numpy as np

import fibergen_tpu as fg
from fibergen_tpu.gui.viewer import SliceViewer, list_demos
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False

XML = """
<settings>
  <solver n="8">
    <tol>1e-6</tol>
    <materials>
      <matrix mu="1" lambda="1" />
      <fiber mu="5" lambda="2" />
    </materials>
  </solver>
  <actions>
    <select_material name="fiber" />
    <place_fiber R="0.25" />
    <run_load_case e11="1" />
  </actions>
</settings>
"""


def test_slice_viewer(tmp_path):
    f = fg.FG()
    f.set_xml(XML)
    assert f.run() == 0
    v = SliceViewer.from_fg(f)
    assert "epsilon" in v.fields
    sl = v.current_slice()
    assert sl.shape == (8, 8)
    v.alpha = 0.02
    lo, hi = v.bounds(sl)
    assert lo < hi
    png = tmp_path / "slice.png"
    v.save_png(str(png))
    assert png.stat().st_size > 500
    vtk = tmp_path / "slice.vtk"
    v.save_vtk(str(vtk))
    assert vtk.read_bytes().startswith(b"# vtk")
    # component/slice navigation
    v.field = "sigma"
    v.component = 3
    v.slice_dim = "x"
    v.slice_index = 0.0
    assert v.current_slice().shape == (8, 8)


def test_demo_browser():
    demo_dir = os.path.join(os.path.dirname(__file__), "..", "demo")
    cats = list_demos(demo_dir)
    names = {c["name"] for c in cats}
    assert {"elasticity", "heat", "viscosity", "porous",
            "hyperelasticity"} <= names
    el = next(c for c in cats if c["name"] == "elasticity")
    assert any(p["name"] == "hashin" for p in el["projects"])


def test_gui_main_headless(capsys):
    from fibergen_tpu.gui.app import main
    assert main(["app"]) == 0
    out = capsys.readouterr().out
    assert "usage" in out


def test_viewer_honors_view_settings(tmp_path):
    """SliceViewer.from_fg applies the project's <view> block (field,
    slice, bounds, extra_fields) like the reference GUI."""
    import fibergen_tpu as fg
    from fibergen_tpu.gui.viewer import SliceViewer

    xml = """<settings>
      <solver n="8">
        <materials><matrix mu="1" lambda="1" /><fiber mu="5" lambda="2" /></materials>
        <mode>elasticity</mode><tol>1e-4</tol>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber R="0.3" />
        <run_load_case e11="0.01" />
      </actions>
      <view>
        <field>sigma1</field>
        <slice_dim>y</slice_dim>
        <slice_index>0.25</slice_index>
        <custom_bounds>1</custom_bounds>
        <vmin>-1</vmin>
        <vmax>1</vmax>
        <extra_fields>distance,normals</extra_fields>
      </view>
    </settings>"""
    p = tmp_path / "project.xml"
    p.write_text(xml)
    f = fg.FG()
    f.load_xml(str(p))
    assert f.run() == 0
    v = SliceViewer.from_fg(f)
    assert v.field == "sigma" and v.component == 1
    assert v.slice_dim == "y" and abs(v.slice_index - 0.25) < 1e-12
    assert v.custom_bounds == (-1.0, 1.0)
    assert "distance" in v.fields and "normals" in v.fields
    sl = v.current_slice()
    assert sl.shape == (8, 8)


# --------------------------------------------------------------------------
# Context help from doc/fileformat.xml (HelpWidget equivalent,
# fibergen_gui.py:1945-2318) — headless
# --------------------------------------------------------------------------

def test_schema_lookup_and_render():
    from fibergen_tpu.gui.help import Schema
    s = Schema()
    e = s.lookup("solver.mixing_rule")
    assert e is not None
    assert "laminate" in e.values and "fluidity" in e.values
    assert e.default == "voigt"
    txt = s.help_for("solver.mixing_rule")
    assert "interface" in txt and "voigt" in txt
    # attribute lookup
    a = s.lookup("actions.place_fiber.R")
    assert a is not None and "radius" in a.help
    # action with attributes renders them
    txt2 = s.help_for("actions.place_fiber")
    assert "attributes:" in txt2 and "cx" in txt2
    assert s.lookup("solver.nonexistent_thing") is None


def test_cursor_element_path():
    from fibergen_tpu.gui.help import element_path_at, help_at
    doc = """<settings>
  <solver n="16">
    <tol>1e-6</tol>
    <materials>
      <matrix mu="1" />
    </materials>
  </solver>
  <actions>
    <place_fiber R="0.3" />
  </actions>
</settings>"""
    # inside <tol> content
    pos = doc.index("1e-6")
    assert element_path_at(doc, pos) == "settings.solver.tol"
    # inside the place_fiber tag itself
    pos = doc.index('R="0.3"')
    assert element_path_at(doc, pos) == "settings.actions.place_fiber"
    # after </materials>, inside <solver>
    pos = doc.index("</materials>") + len("</materials>") + 1
    assert element_path_at(doc, pos) == "settings.solver"
    # help text resolves through the schema
    txt = help_at(doc, doc.index('R="0.3"'))
    assert "place_fiber" in txt


def test_schema_defaults_match_solver_options():
    """The schema's <solver> defaults must agree with SolverOptions so the
    GUI help never lies about defaults."""
    from fibergen_tpu.gui.help import Schema
    from fibergen_tpu.solvers.ls import SolverOptions
    s = Schema()
    opt = SolverOptions()
    checks = {
        "mode": opt.mode, "method": opt.method,
        "tol": repr(opt.tol).replace("0.0001", "1e-4"),
        "maxiter": str(opt.maxiter),
        "error_estimator": opt.error_estimator,
        "update_ref": opt.update_ref,
        "loadstep_extrapolation_method": opt.loadstep_extrapolation_method,
        "cg_inner_product": opt.cg_inner_product,
        "nl_cg_beta_scheme": opt.nl_cg_beta_scheme,
        "G0_solver": opt.g0_solver,
        "check_every": str(opt.check_every),
        "use_pallas": opt.use_pallas,
        "use_sweep": opt.use_sweep,
        "sharding_fallback": opt.sharding_fallback,
    }
    for key, expect in checks.items():
        e = s.lookup(f"solver.{key}")
        assert e is not None, f"schema missing solver.{key}"
        assert str(e.default) == str(expect), (key, e.default, expect)


def test_schema_covers_action_vocabulary():
    """Every _action_* handler in the FG interpreter has a schema entry
    (except the group-*/skip meta-machinery)."""
    import fibergen_tpu.api as api
    from fibergen_tpu.gui.help import Schema
    s = Schema()
    handlers = [name[len("_action_"):] for name in dir(api.FG)
                if name.startswith("_action_")]
    documented = set(s.lookup("actions").children)
    aliases = {"set_orientation_distribution", "write_vtk2"}
    missing = [h for h in handlers
               if h not in documented and h not in ("group",)]
    assert not missing, f"schema missing actions: {missing}"
