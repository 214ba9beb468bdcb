"""Generate the plus-sign Dolfin XML tet mesh for this demo (run once; the
generated plus.xml is committed).  A 2D plus/cross shape extruded in z,
each hexahedral cell split into 6 tetrahedra."""
import numpy as np

N = 8           # cells per unit in x/y
NZ = 2          # cells in z
W = 0.18        # half-width of the cross arms


def inside(cx, cy):
    return abs(cx - 0.5) < W or abs(cy - 0.5) < W


def main(path="plus.xml"):
    # vertex grid over [0.1,0.9]^2 x [0.4,0.6]
    xs = np.linspace(0.1, 0.9, N + 1)
    zs = np.linspace(0.4, 0.6, NZ + 1)
    vid = {}
    verts = []

    def v(i, j, k):
        key = (i, j, k)
        if key not in vid:
            vid[key] = len(verts)
            verts.append((xs[i], xs[j], zs[k]))
        return vid[key]

    tets = []
    # 6-tet decomposition of the cube (i,j,k)..(i+1,j+1,k+1)
    corners = lambda i, j, k: [v(i, j, k), v(i + 1, j, k), v(i + 1, j + 1, k),
                               v(i, j + 1, k), v(i, j, k + 1),
                               v(i + 1, j, k + 1), v(i + 1, j + 1, k + 1),
                               v(i, j + 1, k + 1)]
    SIX = [(0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
           (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6)]
    for i in range(N):
        for j in range(N):
            cx = 0.5 * (xs[i] + xs[i + 1])
            cy = 0.5 * (xs[j] + xs[j + 1])
            if not inside(cx, cy):
                continue
            for k in range(NZ):
                c = corners(i, j, k)
                for t in SIX:
                    tets.append([c[a] for a in t])

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<dolfin>\n')
        f.write(f'  <mesh celltype="tetrahedron" dim="3">\n')
        f.write(f'    <vertices size="{len(verts)}">\n')
        for i, (x, y, z) in enumerate(verts):
            f.write(f'      <vertex index="{i}" x="{x:.9g}" y="{y:.9g}" z="{z:.9g}" />\n')
        f.write('    </vertices>\n')
        f.write(f'    <cells size="{len(tets)}">\n')
        for i, t in enumerate(tets):
            f.write(f'      <tetrahedron index="{i}" v0="{t[0]}" v1="{t[1]}"'
                    f' v2="{t[2]}" v3="{t[3]}" />\n')
        f.write('    </cells>\n  </mesh>\n</dolfin>\n')
    print(len(verts), "verts,", len(tets), "tets")


if __name__ == "__main__":
    main()
