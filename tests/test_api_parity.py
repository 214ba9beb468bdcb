"""Round-3 API parity sweep: fiber_translation field, real
get_distance_evals, calibrated write_png, full-primitive write_pvpy
(VERDICT round 2, item 8)."""
import struct
import zlib

import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def _sphere_project(cx=0.1, n=16, periodic=True):
    p = 1 if periodic else 0
    return f"""
    <settings>
      <periodic x="{p}" y="{p}" z="{p}">{p}</periodic>
      <solver n="{n}">
        <mode>heat</mode>
        <materials><matrix mu="1" /><fiber mu="10" /></materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber R="0.2" cx="{cx}" cy="0.5" cz="0.5" />
        <init_phase />
      </actions>
    </settings>
    """


def test_fiber_translation_field():
    """A sphere at x=0.1 clones across the x wall (translation +1): voxels
    near x=1 are closest to the CLONE and report its periodic offset; the
    region near the primary reports zero (get_raw_field 'fiber_translation',
    fibergen.cpp:15629-15660 = bbCenter - parent bbCenter, :6865)."""
    f = fg.FG()
    f.set_xml(_sphere_project())
    assert f.run() == 0
    tr = f.get_field("fiber_translation")
    assert tr.shape == (3, 16, 16, 16)
    # voxel at x ~ 0.97, y=z=0.5: closest fiber is the clone at x=1.1
    assert tr[0, 15, 8, 8] == pytest.approx(1.0)
    assert tr[1, 15, 8, 8] == pytest.approx(0.0)
    # voxel at x ~ 0.1 (inside the primary): translation 0
    assert tr[0, 1, 8, 8] == pytest.approx(0.0)


def test_fiber_translation_zero_without_periodicity():
    f = fg.FG()
    f.set_xml(_sphere_project(periodic=False))
    assert f.run() == 0
    tr = f.get_field("fiber_translation")
    assert np.all(tr == 0.0)


def test_get_distance_evals_counts_real_work():
    """get_distance_evals reports the actual voxelizer work: one evaluation
    per primitive per voxel (the reference's default build returns 0,
    fibergen.cpp:25087-25092; ours counts for real)."""
    from fibergen_tpu.geometry import discretize
    discretize.reset_distance_evals()
    f = fg.FG()
    f.set_xml(_sphere_project(periodic=False))
    assert f.run() == 0
    # one sphere, no clones, 16^3 voxels, at least the phi pass
    assert f.get_distance_evals() >= 16 ** 3
    before = f.get_distance_evals()
    f.get_field("distance")
    assert f.get_distance_evals() > before


def _read_gray8_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w, h, rows = 8, None, None, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 0)
        elif typ == b"IDAT":
            rows += body
        pos += 12 + ln
    raw = zlib.decompress(rows)
    img = np.frombuffer(raw, np.uint8).reshape(h, w + 1)
    assert np.all(img[:, 0] == 0)  # filter type 0 rows
    return img[:, 1:]


def test_write_png_absolute_scale(tmp_path, monkeypatch):
    """write_png emits the CALIBRATED value min(max(d+offset,0)^exp*scale,1)
    (writeDistanceMap, fibergen.cpp:7113-7119) — no renormalization, so
    halving `scale` halves every non-saturated pixel."""
    monkeypatch.chdir(tmp_path)

    def proj(scale, fname):
        return f"""
        <settings>
          <solver n="8">
            <mode>heat</mode>
            <materials><matrix mu="1" /><fiber mu="10" /></materials>
          </solver>
          <actions>
            <select_material name="fiber" />
            <place_fiber type="halfspace" cx="0.5" ax="-1" />
            <write_png filename="{fname}" a0z="0.5" w="8" h="8"
                       scale="{scale}" />
          </actions>
        </settings>
        """

    f1 = fg.FG(); f1.set_xml(proj(1.0, "s1.png")); assert f1.run() == 0
    f2 = fg.FG(); f2.set_xml(proj(0.5, "s2.png")); assert f2.run() == 0
    img1 = _read_gray8_png(tmp_path / "s1.png").astype(float)
    img2 = _read_gray8_png(tmp_path / "s2.png").astype(float)
    # halfspace normal -x at 0.5: d = (p - c) . n = 0.5 - x (inside is
    # x > 0.5, where d < 0 -> pixel 0)
    x = (np.arange(8) + 0.5) / 8
    expect1 = np.minimum(np.maximum(0.5 - x, 0.0), 1.0) * 255
    np.testing.assert_allclose(img1[4], expect1, atol=1.0)
    mask = (img1 > 2) & (img1 < 250)
    np.testing.assert_allclose(img2[mask], 0.5 * img1[mask], atol=1.0)


def test_write_pvpy_all_primitives(tmp_path, monkeypatch):
    """Every primitive type is emitted (the reference writer throws for
    anything but capsules, fibergen.cpp:5691-5699)."""
    monkeypatch.chdir(tmp_path)
    xml = """
    <settings>
      <solver n="4">
        <mode>heat</mode>
        <materials><matrix mu="1" /><fiber mu="2" /></materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber R="0.1" cx="0.3" cy="0.3" cz="0.3" />
        <place_fiber R="0.1" L="0.4" cx="0.7" cy="0.7" cz="0.7"
                     ax="0" ay="0" az="1" />
        <place_fiber type="halfspace" cx="0.9" ax="-1" />
        <init_phase />
        <write_pvpy filename="geo.py" />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    txt = (tmp_path / "geo.py").read_text()
    assert "Sphere" in txt            # sphere primitive
    assert "Cylinder" in txt          # capsule core
    assert "Transform" in txt         # oriented placement
    assert "Plane" in txt             # halfspace
    assert "rve_bbox" in txt          # bounding box
    compile(txt, "geo.py", "exec")    # syntactically valid python


def test_write_pvpy_triangle_surface(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fibergen_tpu.geometry.primitives import Triangle
    f = fg.FG()
    f.set_xml("""
    <settings>
      <solver n="4">
        <mode>heat</mode>
        <materials><matrix mu="1" /><fiber mu="2" /></materials>
      </solver>
      <actions><init_phase /></actions>
    </settings>
    """)
    assert f.run() == 0
    f.gen.fibers.append(Triangle(
        v0=np.array([0.0, 0, 0]), v1=np.array([1.0, 0, 0]),
        v2=np.array([0.0, 1, 0]), material=1, fiber_id=7))
    from fibergen_tpu.config.xmlproject import SettingsReader
    import xml.etree.ElementTree as ET
    node = ET.fromstring('<write_pvpy filename="tri.py" />')
    f._action_write_pvpy(node, SettingsReader(f.engine, node))
    txt = (tmp_path / "tri.py").read_text()
    assert "ProgrammableSource" in txt
    compile(txt, "tri.py", "exec")


def test_write_pvpy_rotation_order_and_plane_orientation(tmp_path,
                                                         monkeypatch):
    """The emitted Transform.Rotate angles must reconstruct the y->axis
    rotation under VTK's Z-X-Y application order (R = Rz Rx Ry), and the
    halfspace Plane must actually span the boundary plane of its normal."""
    import re
    monkeypatch.chdir(tmp_path)
    ax = np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    f = fg.FG()
    f.set_xml(f"""
    <settings>
      <solver n="4">
        <mode>heat</mode>
        <materials><matrix mu="1" /><fiber mu="2" /></materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber R="0.1" L="0.4" cx="0.5" cy="0.5" cz="0.5"
                     ax="{ax[0]}" ay="{ax[1]}" az="{ax[2]}" />
        <place_fiber type="halfspace" cx="0.9" cy="0.1" ax="-1" ay="-1" />
        <init_phase />
        <write_pvpy filename="geo.py" />
      </actions>
    </settings>
    """)
    assert f.run() == 0
    txt = (tmp_path / "geo.py").read_text()

    m = re.search(r"Transform\.Rotate = \[([^\]]+)\]", txt)
    assert m, txt
    rx, ry, rz = (np.radians(float(v)) for v in m.group(1).split(","))

    def rot(a, axis):
        c, s = np.cos(a), np.sin(a)
        if axis == "x":
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == "y":
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    # vtkTransform: R = Rz * Rx * Ry
    R = rot(rz, "z") @ rot(rx, "x") @ rot(ry, "y")
    np.testing.assert_allclose(R @ np.array([0.0, 1.0, 0.0]), ax, atol=1e-9)

    # halfspace: Plane() spans two tangents orthogonal to the normal
    nv = np.array([-1.0, -1.0, 0.0]) / np.sqrt(2.0)
    pts = {}
    for key in ("Origin", "Point1", "Point2"):
        m = re.search(rf"s\.{key} = \[([^\]]+)\]", txt)
        assert m, (key, txt)
        pts[key] = np.array([float(v) for v in m.group(1).split(",")])
    e1 = pts["Point1"] - pts["Origin"]
    e2 = pts["Point2"] - pts["Origin"]
    assert np.linalg.norm(e1) > 0 and np.linalg.norm(e2) > 0
    np.testing.assert_allclose(e1 @ nv, 0.0, atol=1e-9)
    np.testing.assert_allclose(e2 @ nv, 0.0, atol=1e-9)
    # the plane passes through the halfspace anchor point
    center = pts["Origin"] + 0.5 * (e1 + e2)
    np.testing.assert_allclose((center - np.array([0.9, 0.1, 0.0])) @ nv,
                               0.0, atol=1e-9)


def test_solver_xml_wires_use_sweep_and_sharding_fallback():
    """use_sweep / sharding_fallback documented in doc/fileformat.xml must
    actually reach SolverOptions from project XML."""
    f = fg.FG()
    f.set_xml("""
    <settings>
      <solver n="4" mode="heat">
        <use_sweep>off</use_sweep>
        <sharding_fallback>warn</sharding_fallback>
        <materials><matrix mu="1" /><inc mu="2" /></materials>
      </solver>
      <actions>
        <select_material name="inc" />
        <place_fiber R="0.3" />
        <run_load_case e1="1" />
      </actions>
    </settings>""")
    assert f.run() == 0
    assert f.solver.opt.use_sweep == "off"
    assert f.solver.opt.sharding_fallback == "warn"


def test_distance_evals_counted_per_instance():
    """A fresh FG reports 0 distance evals even after another instance
    voxelized (the counter is module-global; the API view is per-FG)."""
    xml = """
    <settings>
      <solver n="4" mode="heat">
        <materials><matrix mu="1" /><inc mu="2" /></materials>
      </solver>
      <actions>
        <select_material name="inc" />
        <place_fiber R="0.3" />
        <init_phase />
      </actions>
    </settings>"""
    f1 = fg.FG()
    f1.set_xml(xml)
    assert f1.run() == 0
    assert f1.get_distance_evals() > 0
    f2 = fg.FG()
    assert f2.get_distance_evals() == 0


def test_settings_output_knobs(tmp_path):
    """tol_red / step_mode solver settings and the run_actions-level
    res_format / restype / print_precision output knobs (fibergen.cpp:
    15047, 15083, 25215, 25300, 26552) are read from the XML."""
    out = tmp_path / "phase_inc.vtk"
    f = fg.FG()
    f.set_xml(f"""
    <settings>
      <res_format>ascii</res_format>
      <restype>double</restype>
      <print_precision>6</print_precision>
      <solver n="4" mode="heat">
        <tol_red>0.25</tol_red>
        <step_mode>1</step_mode>
        <materials><matrix mu="1" /><inc mu="2" /></materials>
      </solver>
      <actions>
        <select_material name="inc" />
        <place_fiber R="0.3" />
        <init_phase normals="1" orientations="1" />
        <write_vtk_phase name="inc" outfile="{out}" />
      </actions>
    </settings>""")
    assert f.run() == 0
    assert f.solver.opt.tol_red == 0.25
    assert f.solver.opt.step_mode is True     # TTY-gated: no hang in CI
    data = out.read_bytes()
    assert b"ASCII" in data
    assert b"double" in data
    assert np.get_printoptions()["precision"] == 6
    np.set_printoptions(precision=8)


def test_vtk_restype_double_binary(tmp_path):
    """Binary VTK with restype=double writes big-endian float64 payloads."""
    from fibergen_tpu.core.grid import Grid
    from fibergen_tpu.io import vtk as vtkio

    grid = Grid(2, 2, 2)
    field = np.arange(8, dtype=np.float64).reshape(1, 2, 2, 2)
    path = tmp_path / "d.vtk"
    vtkio.write_vtk(str(path), grid, {"v": field}, binary=True,
                    dtype=np.float64)
    data = path.read_bytes()
    head, _, payload = data.partition(b"LOOKUP_TABLE default\n")
    assert b"SCALARS v double 1" in head
    vals = np.frombuffer(payload[:8 * 8], dtype=">f8")
    # x-fastest ordering of arange over (x, y, z)
    assert vals[0] == 0.0 and vals[1] == 4.0


def test_init_phase_warmup_as_first_action():
    """<init_phase normals="1"/> as the FIRST action must self-initialize
    the solver (the warm-up used to dereference a not-yet-built solver),
    and the warmed cache serves a later get_field without a second voxel
    sweep."""
    f = fg.FG()
    f.set_xml("""
    <settings>
      <solver n="4" mode="heat">
        <materials><matrix mu="1" /><inc mu="2" /></materials>
      </solver>
      <actions>
        <init_phase normals="1" orientations="1" />
      </actions>
    </settings>""")
    assert f.run() == 0
    cached = f._gfields_cache[1]
    arr = f.get_field("normals")
    assert arr.shape == (3, 4, 4, 4)
    assert f._gfields_cache[1] is cached   # served from the memo
