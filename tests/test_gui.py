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
