"""Experiment harness, PNG/pvpy/voxel-data writers, checkpoint/resume."""
import json
import os

import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.experiment import Experiment
from fibergen_tpu.io.png import write_png
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False

XML = """
<settings>
  <solver nx="8" ny="4" nz="4">
    <mode>heat</mode>
    <tol>1e-9</tol>
    <materials>
      <matrix mu="1" />
      <fiber mu="10" />
    </materials>
  </solver>
  <actions>
    <select_material name="fiber" />
    <place_fiber type="halfspace" cx="0.5" cy="0.5" cz="0.5"
                 ax="-1" ay="0" az="0" />
    <calc_effective_properties />
  </actions>
</settings>
"""


def test_experiment_sweep(tmp_path):
    out = tmp_path / "results.json"
    ex = Experiment(XML, results_dat=str(out), cache_dir=str(tmp_path / "cache"))
    ex.add_param("solver..nx", [8, 16])
    ex.add_result("effective_property")
    ex.add_result("num_iterations")
    rows = ex.run()
    assert len(rows) == 2
    for row in rows:
        K = np.array(row["effective_property"])
        np.testing.assert_allclose(K[0, 0], 20 / 11, rtol=1e-5)
    assert out.exists()
    # cache hit: rerun loads results without solving
    rows2 = Experiment(XML, cache_dir=str(tmp_path / "cache")) \
        .add_param("solver..nx", [8, 16]) \
        .add_result("effective_property").run()
    K = np.array(rows2[0]["effective_property"])
    np.testing.assert_allclose(K[0, 0], 20 / 11, rtol=1e-5)


def test_png_writer(tmp_path):
    img = np.linspace(0, 1, 32 * 16).reshape(32, 16)
    path = tmp_path / "t.png"
    write_png(str(path), img)
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data


def test_write_png_action(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    xml = XML.replace(
        "<calc_effective_properties />",
        '<write_png filename="slice.png" a0z="0.5" />')
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    assert (tmp_path / "slice.png").exists()


def test_write_pvpy_and_voxel_data(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    xml = """
    <settings>
      <solver n="4">
        <mode>heat</mode>
        <materials><matrix mu="1" /><fiber mu="2" /></materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber R="0.2" />
        <init_phase />
        <write_pvpy filename="geo.py" />
        <write_voxel_data filename="vox.txt" />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    assert "Sphere" in (tmp_path / "geo.py").read_text()
    lines = (tmp_path / "vox.txt").read_text().splitlines()
    assert len(lines) == 4 * 4 * 4 + 1


def test_checkpoint_resume(tmp_path):
    f = fg.FG()
    f.set_xml(XML)
    assert f.run() == 0
    ck = str(tmp_path / "state.npz")
    f.solver.save_state(ck)

    # resume in a fresh process-equivalent: rebuild the geometry (the
    # checkpoint holds solver state, not the project), then load
    f2 = fg.FG()
    f2.set_xml(XML.replace("<calc_effective_properties />", "<init_phase />"))
    assert f2.run() == 0   # places the halfspace + discretizes phases
    f2.solver.load_state(ck)
    np.testing.assert_allclose(np.asarray(f2.solver.eps),
                               np.asarray(f.solver.eps))
    assert f2.solver.mu_0 == f.solver.mu_0
    np.testing.assert_allclose(f2.solver.calc_mean_stress(),
                               f.solver.calc_mean_stress(), rtol=1e-12)


def test_checkpoint_mode_mismatch(tmp_path):
    f = fg.FG()
    f.set_xml(XML)
    assert f.run() == 0
    ck = str(tmp_path / "state.npz")
    f.solver.save_state(ck)
    xml_el = XML.replace("<mode>heat</mode>", "").replace('mu="1"', 'mu="1" lambda="1"').replace('mu="10"', 'mu="10" lambda="2"')
    f3 = fg.FG()
    f3.set_xml(xml_el)
    f3.init_lss()
    with pytest.raises(Exception):
        f3.solver.load_state(ck)
