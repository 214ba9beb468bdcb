"""Orientation averaging with the Experiment harness.

Computes the effective stiffness of a unidirectional short-fiber cell for a
set of approximately uniform fiber directions (electrostatic sphere points)
and averages the rotated stiffnesses — the cheap isotropic estimate used in
SFRP parameter studies (the reference does the analogous sweep in
demo/elasticity/sfrp_parameter_fit via demo/common.py)."""
import numpy as np

import fibergen_tpu as fg
from fibergen_tpu.experiment import Experiment, iso_sphere_points

XML = """<settings>
  <variables>
    <ax type="float" value="0" />
    <ay type="float" value="0" />
    <az type="float" value="1" />
  </variables>
  <solver n="16">
    <materials>
      <matrix law="iso" E="1.665" nu="0.36" />
      <fiber law="iso" E="73.0" nu="0.18" />
    </materials>
    <mode>elasticity</mode>
    <method>cg</method>
    <tol>1e-5</tol>
  </solver>
  <actions>
    <select_material name="fiber" />
    <place_fiber R="0.18" cx="0.5" cy="0.5" cz="0.5" ax="ax" ay="ay" az="az" L="0.6" />
    <calc_effective_properties />
  </actions>
</settings>"""


def rotation_to(z_to):
    """Rotation matrix taking e_z to the unit vector z_to."""
    z = np.asarray(z_to, dtype=float)
    z = z / np.linalg.norm(z)
    a = np.array([1.0, 0.0, 0.0]) if abs(z[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(a, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)


VI = [0, 1, 2, 1, 0, 0]
VJ = [0, 1, 2, 2, 2, 1]


def rotate_voigt6(C, R):
    """Rotate a 6x6 stiffness stored in tensor-component Voigt form
    (C[a,b] = C_ijkl, shear weight handled by the contraction) via the full
    3x3x3x3 tensor — convention-proof."""
    T = np.zeros((3, 3, 3, 3))
    for a in range(6):
        i, j = VI[a], VJ[a]
        for b in range(6):
            k, l = VI[b], VJ[b]
            for p, q in {(i, j), (j, i)}:
                for r, s in {(k, l), (l, k)}:
                    T[p, q, r, s] = C[a, b]
    T = np.einsum("ip,jq,kr,ls,pqrs->ijkl", R, R, R, R, T)
    return np.array([[T[VI[a], VJ[a], VI[b], VJ[b]] for b in range(6)]
                     for a in range(6)])


def main():
    dirs = iso_sphere_points(6, seed=3)
    ex = Experiment(XML)
    ex.add_param("variables.ax..value", [float(d[0]) for d in dirs], record=False)
    ex.add_result("effective_property")

    # sweep manually (directions are vectors, not an outer product)
    Cs = []
    for d in dirs:
        f = fg.FG()
        f.set_xml(XML)
        f.set("variables.ax..value", float(d[0]))
        f.set("variables.ay..value", float(d[1]))
        f.set("variables.az..value", float(d[2]))
        assert f.run() == 0
        C = np.array(f.get_effective_property())
        # rotate the (e_z-aligned cell's) stiffness into the lab frame
        Cs.append(rotate_voigt6(C, rotation_to(d)))
    Cavg = np.mean(Cs, axis=0)
    # isotropy check of the orientation average
    # in this convention C44 = mu (tensor shear strain, weight-2 contraction)
    mu = Cavg[3:, 3:].diagonal().mean()
    lam = (Cavg[:3, :3].sum() - np.trace(Cavg[:3, :3])) / 6.0
    k = lam + 2.0 / 3.0 * mu
    print("orientation-averaged stiffness (Voigt):")
    print(np.array_str(Cavg, precision=3, suppress_small=True))
    print(f"isotropized k = {k:.3f}, mu = {mu:.3f}")


if __name__ == "__main__":
    main()
