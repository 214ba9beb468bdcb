"""Generate the procedural 'blob' STL used by this demo (run once; the
generated blob.stl is committed).  A bumpy sphere r(theta,phi) =
0.3 + 0.04 sin(3 theta) cos(2 phi), triangulated on a lat-long grid."""
import numpy as np


def main(path="blob.stl", nu=24, nv=48):
    th = np.linspace(0, np.pi, nu)
    ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    R = 0.3 + 0.04 * np.sin(3 * T) * np.cos(2 * P)
    X = 0.5 + R * np.sin(T) * np.cos(P)
    Y = 0.5 + R * np.sin(T) * np.sin(P)
    Z = 0.5 + R * np.cos(T)
    tris = []
    for i in range(nu - 1):
        for j in range(nv):
            j2 = (j + 1) % nv
            a = (X[i, j], Y[i, j], Z[i, j])
            b = (X[i + 1, j], Y[i + 1, j], Z[i + 1, j])
            c = (X[i + 1, j2], Y[i + 1, j2], Z[i + 1, j2])
            d = (X[i, j2], Y[i, j2], Z[i, j2])
            if i > 0:
                tris.append((a, b, d))
            if i < nu - 2:
                tris.append((b, c, d))
    with open(path, "w") as f:
        f.write("solid blob\n")
        for a, b, c in tris:
            n = np.cross(np.subtract(b, a), np.subtract(c, a))
            n = n / (np.linalg.norm(n) + 1e-30)
            f.write(f"facet normal {n[0]:.6e} {n[1]:.6e} {n[2]:.6e}\n")
            f.write(" outer loop\n")
            for p in (a, b, c):
                f.write(f"  vertex {p[0]:.6e} {p[1]:.6e} {p[2]:.6e}\n")
            f.write(" endloop\nendfacet\n")
        f.write("endsolid blob\n")


if __name__ == "__main__":
    main()
