"""SFRP inverse parameter identification by sweep + fit.

Counterpart of the reference's demo/elasticity/sfrp_parameter_fit: a
hexagonally packed continuous-fiber composite (2D planar cell, laminate
composite voxels).  This demo adds the actual *identification* workflow:

1. forward model: transverse stiffness C11(E_fiber) of the hexagonal cell,
2. synthetic "measurement": C11 evaluated at a known E_fiber*,
3. inverse fit: recover E_fiber from the measurement alone by scalar
   root finding on the forward model.

Run:  python project.py [res]
"""
import sys

import numpy as np

import fibergen_tpu as fgt

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = 0.45
E_MATRIX, NU_MATRIX = 1.665, 0.36
NU_FIBER = 0.18
E_FIBER_TRUE = 73.0  # the value to recover


def forward_c11(e_fiber: float, res: int = RES) -> float:
    """Transverse stiffness C11 of the hexagonal cell for a fiber
    stiffness e_fiber (GPa-scale units like the reference demo)."""
    fg = fgt.FG()
    fg.set_xml(f"""
<settings>
  <variables>
    <res type="int" value="{res}" />
    <w type="float" value="3**0.5" />
  </variables>
  <dx>w</dx>
  <dy>1</dy>
  <dz>1.0/res</dz>
  <planar z="1" />
  <solver nx="int(w*res+0.5)" ny="res" nz="1">
    <materials>
      <matrix law="iso" E="{E_MATRIX}" nu="{NU_MATRIX}" />
      <fiber law="iso" E="{e_fiber}" nu="{NU_FIBER}" />
    </materials>
    <mode>elasticity</mode>
    <method>cg</method>
    <mixing_rule>laminate</mixing_rule>
    <tol>1e-7</tol>
  </solver>
  <actions>
    <select_material name="fiber" />
    <place_fiber R="{R}" cx="0.0"   cy="0.0" cz="0.5/res" ax="0" ay="0" az="1" L="2" />
    <place_fiber R="{R}" cx="0.0"   cy="1.0" cz="0.5/res" ax="0" ay="0" az="1" L="2" />
    <place_fiber R="{R}" cx="0.5*w" cy="0.5" cz="0.5/res" ax="0" ay="0" az="1" L="2" />
    <place_fiber R="{R}" cx="w"     cy="0.0" cz="0.5/res" ax="0" ay="0" az="1" L="2" />
    <place_fiber R="{R}" cx="w"     cy="1.0" cz="0.5/res" ax="0" ay="0" az="1" L="2" />
    <run_load_case e11="1.0" />
  </actions>
</settings>""")
    if fg.run() != 0:
        raise RuntimeError("forward solve failed")
    return float(np.array(fg.get_mean_stress())[0])


def identify(c11_measured: float, lo: float = 10.0, hi: float = 200.0,
             tol: float = 1e-3) -> float:
    """Recover E_fiber from a measured C11 by bisection on the (monotone)
    forward model."""
    f_lo = forward_c11(lo) - c11_measured
    f_hi = forward_c11(hi) - c11_measured
    if f_lo * f_hi > 0:
        raise ValueError("measurement outside the model range")
    while hi - lo > tol * hi:
        mid = 0.5 * (lo + hi)
        if (forward_c11(mid) - c11_measured) * f_lo <= 0:
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


def main():
    # 1) parameter sweep: stiffness vs fiber modulus
    sweep = [20.0, 40.0, 73.0, 120.0]
    print("# E_fiber   C11")
    table = {}
    for e in sweep:
        table[e] = forward_c11(e)
        print(f"{e:8.1f}  {table[e]:.5f}")

    # 2) synthetic measurement at the true parameter
    c11_meas = table[E_FIBER_TRUE]

    # 3) inverse identification
    e_fit = identify(c11_meas)
    err = abs(e_fit - E_FIBER_TRUE) / E_FIBER_TRUE
    print(f"identified E_fiber = {e_fit:.2f} (true {E_FIBER_TRUE}, "
          f"rel err {err:.2%})")
    return e_fit


if __name__ == "__main__":
    main()
