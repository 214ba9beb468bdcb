"""Demo-project regression tests: every demo must run end-to-end at reduced
resolution; demos with published oracle values are checked against them
(the reference's 'demos as integration tests' strategy, SURVEY.md section 4)."""
import os

import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False

DEMO_DIR = os.path.join(os.path.dirname(__file__), "..", "demo")


def run_demo(rel_path, res=None, tol=None, extra=None):
    f = fg.FG()
    f.load_xml(os.path.join(DEMO_DIR, rel_path))
    if res is not None and f.project.has("variables.res"):
        f.set("variables.res..value", res)
    if res is not None and f.project.get("solver..n"):
        try:
            int(f.project.get("solver..n"))
            f.set("solver..n", res)
        except ValueError:
            pass  # expression like 'res': already handled via variables
    if tol is not None:
        f.set("solver.tol", tol)
    if extra:
        extra(f)
    assert f.run() == 0, rel_path
    return f


def test_demo_hashin():
    f = run_demo("elasticity/hashin/project.xml", res=32)
    sig = np.array(f.get_mean_stress())
    k_eff = sig[:3].sum() / 9.0
    k_star = 3.63867684478 + 2.0 / 3.0
    assert abs(k_eff - k_star) / k_star < 2e-3


def test_demo_laminate():
    f = run_demo("elasticity/laminate/project.xml")
    C = np.array(f.get_effective_property())
    C_exact = fg.isotropic_laminate_stiffness([(1, 1, 0.5), (5, 2, 0.5)])
    # run() leaves _Ceff at the closed form; equality with Milton Eq. 9.9
    np.testing.assert_allclose(C, C_exact, atol=1e-12)


def test_demo_2d():
    f = run_demo("elasticity/2d/project.xml", res=32, tol=1e-5)
    sig = np.array(f.get_mean_stress())
    assert np.all(np.isfinite(sig))
    assert sig[0] > 0
    A2 = np.array(f.get_A2())
    assert A2[2, 2] < 1e-9  # planar orientations


def test_demo_heat():
    def shrink(f):
        f.set("n", 10)
    f = run_demo("heat/heat/project.xml", res=32, extra=shrink)
    K = np.array(f.get_effective_property())
    assert np.all(np.diag(K)[:2] > 1.0)
    assert np.all(np.diag(K) < 10.0)


def test_demo_nunan_keller():
    def shrink(f):
        f.set("solver..n", 16)
        f.set("solver.tol", 1e-4)
    f = run_demo("viscosity/nunan_keller/project.xml", extra=shrink)
    alpha, beta = f._nunan_keller
    # paper: alpha=1.0666, beta=0.49665 at V=0.20 (n=64); coarse grid ~10%
    assert abs(alpha - 1.0666) / 1.0666 < 0.1
    assert abs(beta - 0.49665) / 0.49665 < 0.1


def test_demo_porous():
    def shrink(f):
        f.set("actions.generate_fibers[1]..n", 20)
    f = run_demo("porous/porosity/project.xml", res=32, extra=shrink)
    K = np.array(f.get_effective_property())
    assert np.all(np.diag(K)[:2] > 0)
    assert np.all(np.diag(K)[:2] < 1.0)


def test_demo_hyper_mixed_bc():
    f = run_demo("hyperelasticity/mixed_bc/project.xml", res=8, tol=1e-8)
    F = np.array(f.get_mean_strain())
    P = np.array(f.get_mean_stress())
    assert abs(F[1] - 1.1) < 1e-6       # prescribed F22 = 1.1
    assert abs(P[0] - 1.0) < 1e-3       # prescribed P11 = 1.0


def test_demo_hyper_mixed_bc_full_resolution_pinned():
    """The demo at its shipped resolution (n=32, tol=1e-10) on CPU/f64
    converges fully; these digits are the oracle the TPU-f32 run (which
    stops at the precision floor) is compared against (PARITY.md).
    Recorded 2026-08-17 from a clean f64 run (57 CG+Newton iterations,
    final rel residual 1.97e-11).  Un-gated in round 4 (~21 s measured
    2026-08-19) so the default suite guards the flagship mixed-BC
    answer."""
    f = run_demo("hyperelasticity/mixed_bc/project.xml")
    F = np.array(f.get_mean_strain())
    P = np.array(f.get_mean_stress())
    assert abs(F[0] - 0.9886118258) < 1e-8   # free F11
    assert abs(F[1] - 1.1) < 1e-12           # prescribed F22
    assert abs(P[0] - 1.0) < 1e-8            # prescribed P11
    assert abs(P[1] - 3.6713797927) < 1e-7   # free P22
    assert abs(P[2] - 1.2379378454) < 1e-7   # free P33


def test_digital_rocks_64_crop_pinned(tmp_path):
    """Default-suite guard of the digital-rocks flagship answer: the
    Grosmont 128^3 rasters strided 2x to 64^3, full 6-load-case Ceff
    through calc_effective_properties, digits pinned from a clean CPU/f64
    run (2026-08-19; the batched and sequential load-case drivers agree to
    1.4e-7 relative).  The full-resolution C11 = 58.3185 oracle stays
    under FIBERGEN_TPU_SLOW_TESTS."""
    from fibergen_tpu.io import rawio
    data = os.path.join(DEMO_DIR, "elasticity", "digital_rocks", "data")
    for k in (1, 2):
        d = rawio.read_raw(
            os.path.join(data, f"grosmont_stanford_128x128x128_{k}.raw.gz"),
            (128, 128, 128))
        rawio.write_raw(str(tmp_path / f"g{k}.raw.gz"), d[::2, ::2, ::2])
    xml = open(os.path.join(DEMO_DIR, "elasticity", "digital_rocks",
                            "project.xml")).read()
    xml = xml.replace('n="128"', 'n="64"')
    for k in (1, 2):
        xml = xml.replace(f"data/grosmont_stanford_128x128x128_{k}.raw.gz",
                          str(tmp_path / f"g{k}.raw.gz"))
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    C = np.array(f.get_effective_property())
    assert abs(C[0, 0] - 58.716650) / 58.716650 < 5e-6
    assert abs(C[1, 1] - 57.403889) / 57.403889 < 5e-6
    assert abs(C[3, 3] - 25.239059) / 25.239059 < 5e-6
    assert abs(C[0, 1] - 6.073906) / 6.073906 < 5e-5


def test_demo_primitives(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_demo("geometry/primitives/project.xml", res=16)
    assert (tmp_path / "primitives.vtk").exists()


def test_demo_pure_python(tmp_path, monkeypatch, capsys):
    # run in-process (runpy) so the conftest's CPU/x64 config applies;
    # a subprocess would re-enter the TPU tunnel and pay remote compiles
    import runpy
    monkeypatch.chdir(tmp_path)
    script = os.path.join(DEMO_DIR, "python", "pure_python", "project.py")
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert "mean stress" in out


REF_ROCKS = "/root/reference/demo/elasticity/digital_rocks/data"


@pytest.mark.skipif(not os.path.isdir(REF_ROCKS),
                    reason="DRP benchmark data not available")
def test_digital_rocks_raw_ingestion():
    """Load the Grosmont CT rasters (public DRP benchmark) through the
    read_raw_data action and check the multi-material phase fields."""
    f = fg.FG()
    f.load_xml(os.path.join(DEMO_DIR, "elasticity", "digital_rocks",
                            "project.xml"))
    f._xml_dir = os.path.dirname(REF_ROCKS)
    f.init_lss()
    # run only the two read_raw_data actions (skip the 6-load-case solve)
    f._init_python()
    for action in f.project.root.find("actions"):
        if action.tag == "read_raw_data":
            from fibergen_tpu.config.xmlproject import SettingsReader
            f._dispatch_action("read_raw_data", action,
                               SettingsReader(f.engine, action))
    vols = [float(p.phi.mean()) for p in f.solver.mat.phases]
    assert abs(sum(vols) - 1.0) < 1e-6
    assert vols[1] > 0.3  # quartz-dominated carbonate sample
    assert 0.0 < vols[2] < 0.5


def test_demo_regular_polygon(tmp_path, monkeypatch, capsys):
    import runpy
    monkeypatch.chdir(tmp_path)
    script = os.path.join(DEMO_DIR, "python", "regular_polygon", "project.py")
    # shrink for test speed
    src = open(script).read().replace('n="64"', 'n="16"')
    small = tmp_path / "project.py"
    small.write_text(src)
    runpy.run_path(str(small), run_name="__main__")
    assert "effective flux" in capsys.readouterr().out


def test_demo_empty():
    f = fg.FG()
    f.load_xml(os.path.join(DEMO_DIR, "empty", "project.xml"))
    assert f.run() == 0


def test_demo_normals(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f = run_demo("geometry/normals/project.xml")
    assert (tmp_path / "normals.vtk").exists()
    n = np.asarray(f.get_field("normals"))
    mask = np.abs(np.asarray(f.get_field("distance"))).squeeze() < 0.1
    ln = np.sqrt((n * n).sum(0))
    # near the interface normals are unit vectors
    assert abs(float(ln[mask].mean()) - 1.0) < 1e-3


def test_demo_stl():
    f = run_demo("geometry/stl/project.xml")
    flux = np.array(f.get_mean_stress())
    assert flux[0] > 1.0          # conductive blob raises effective k
    v = f.get_volume_fraction("blob")
    # blob of mean radius 0.3 in the unit cell: V ~ 4/3 pi 0.3^3 ~ 0.11
    assert abs(v - 0.115) < 0.03


def test_demo_tetmesh():
    f = run_demo("geometry/tetmesh/project.xml")
    sig = np.array(f.get_mean_stress())
    assert np.all(np.isfinite(sig))
    assert sig[0] > 0 and sig[5] > 0
    # plus-sign occupies ~44% of area but only part of z: V in (0.1, 0.6)
    assert 0.1 < f.get_volume_fraction("core") < 0.6


def test_demo_transverse_isotropy():
    f = run_demo("elasticity/transverse_isotropy/project.xml", res=16)
    sig = np.array(f.get_mean_stress())
    assert np.all(np.isfinite(sig)) and sig[0] > 0
    # anisotropic fibers aligned mostly with x: sig_xx largest normal stress
    assert sig[0] > sig[1] and sig[0] > sig[2]


def test_demo_sfrp_hexagonal():
    f = run_demo("elasticity/sfrp_hexagonal/project.xml", res=16)
    sig = np.array(f.get_mean_stress())
    assert np.all(np.isfinite(sig)) and sig[0] > 0
    assert f.get_volume_fraction("fiber") > 0.4   # dense hexagonal packing


def test_demo_viscosity_analytical():
    f = run_demo("viscosity/viscosity_analytical/project.xml", res=16)
    sig = np.array(f.get_mean_stress())
    assert np.all(np.isfinite(sig))
    # dual (fluidity) solve: rigid fibers REDUCE the mean dual stress below
    # the pure-matrix value 0.5*e11 = 0.5
    assert 0.0 < sig[0] < 0.5 and abs(sig[0] + sig[1]) < 1e-3


def test_demo_orientation_average(capsys):
    import runpy
    script = os.path.join(DEMO_DIR, "python", "orientation_average",
                          "project.py")
    # shrink for test speed
    src = open(script).read().replace('n="16"', 'n="8"').replace(
        "iso_sphere_points(6, seed=3)", "iso_sphere_points(3, seed=3)")
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(src)
        path = f.name
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "isotropized k" in out
    mu = float(out.strip().split("mu = ")[-1])
    assert mu > 0.6   # stiff fibers raise shear above the matrix mu=0.61


def test_demo_sfrp_parameter_fit(monkeypatch, capsys):
    """Inverse parameter identification: sweep the forward model, then
    recover the fiber modulus from a synthetic measurement
    (demo/elasticity/sfrp_parameter_fit counterpart with the actual fit)."""
    import runpy
    script = os.path.join(DEMO_DIR, "python", "sfrp_parameter_fit",
                          "project.py")
    import sys
    monkeypatch.setattr(sys, "argv", [script, "16"])  # tiny res for CI
    mod = runpy.run_path(script, run_name="not_main")
    e_fit = mod["identify"](mod["forward_c11"](73.0))
    assert abs(e_fit - 73.0) / 73.0 < 0.02


@pytest.mark.skipif(not os.environ.get("FIBERGEN_TPU_SLOW_TESTS"),
                    reason="full 128^3 six-load-case solve (~minutes)")
@pytest.mark.skipif(not os.path.isdir(REF_ROCKS),
                    reason="DRP benchmark data not available")
def test_digital_rocks_effective_stiffness_pinned():
    """Grosmont 128^3 Ceff pinned to the round-3 oracle table (PARITY.md):
    C11 = 58.3185 was confirmed by an independent torch-f64 CPU
    implementation to < 1e-5 relative and lies within 0.71 % of the
    collocated-scheme solve; iso-fit K sits on the multiphase HS upper
    bound to 2e-4."""
    f = fg.FG()
    f.load_xml(os.path.join(DEMO_DIR, "elasticity", "digital_rocks",
                            "project.xml"))
    assert f.run() == 0
    C = np.array(f.get_effective_property())
    assert abs(C[0, 0] - 58.3185) / 58.3185 < 2e-3
    assert abs(C[3, 3] - 24.91) / 24.91 < 5e-3
