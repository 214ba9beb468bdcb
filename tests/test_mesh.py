"""Mesh primitives and readers: STL/VTK/Dolfin ingestion, tetrahedron and
triangle-surface voxelization volumes."""
import struct

import jax.numpy as jnp
import numpy as np
import pytest

import fibergen_tpu as fg
from fibergen_tpu.geometry import discretize, mesh
from fibergen_tpu.geometry.primitives import Tetrahedron, TetMesh, TriangleSurface
from fibergen_tpu.utils.logging import LOG

LOG.enabled = False


def unit_cube_triangles(lo=0.3, hi=0.7):
    """12 triangles of an axis-aligned cube with outward normals."""
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)])
    # faces as quads (outward), split into triangles
    quads = [
        (0, 1, 3, 2, [-1, 0, 0]), (4, 6, 7, 5, [1, 0, 0]),
        (0, 4, 5, 1, [0, -1, 0]), (2, 3, 7, 6, [0, 1, 0]),
        (0, 2, 6, 4, [0, 0, -1]), (1, 5, 7, 3, [0, 0, 1]),
    ]
    tris = []
    for a, b, c, d, n in quads:
        for t in ((a, b, c), (a, c, d)):
            p0, p1, p2 = v[t[0]], v[t[1]], v[t[2]]
            nn = np.cross(p1 - p0, p2 - p0)
            if nn @ np.array(n) < 0:
                p1, p2 = p2, p1
            tris.append((p0, p1, p2))
    a = np.asarray(tris)
    return a[:, 0], a[:, 1], a[:, 2]


def test_stl_binary_roundtrip(tmp_path):
    V0, V1, V2 = unit_cube_triangles()
    path = tmp_path / "cube.stl"
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(V0)))
        for i in range(len(V0)):
            n = np.cross(V1[i] - V0[i], V2[i] - V0[i])
            n = n / np.linalg.norm(n)
            f.write(np.asarray([*n, *V0[i], *V1[i], *V2[i]],
                               dtype="<f4").tobytes())
            f.write(b"\0\0")
    W0, W1, W2 = mesh.read_stl(str(path))
    np.testing.assert_allclose(W0, V0, atol=1e-6)
    assert len(W0) == 12


def test_stl_ascii(tmp_path):
    V0, V1, V2 = unit_cube_triangles()
    path = tmp_path / "cube_ascii.stl"
    with open(path, "w") as f:
        f.write("solid cube\n")
        for i in range(len(V0)):
            f.write("facet normal 0 0 0\nouter loop\n")
            for v in (V0[i], V1[i], V2[i]):
                f.write(f"vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("endloop\nendfacet\n")
        f.write("endsolid cube\n")
    W0, _, _ = mesh.read_stl(str(path))
    assert len(W0) == 12


def test_triangle_surface_voxel_volume():
    V0, V1, V2 = unit_cube_triangles(0.25, 0.75)
    surf = TriangleSurface(V0=V0, V1=V1, V2=V2)
    assert abs(surf.volume() - 0.125) < 1e-12
    grid = fg.Grid(16, 16, 16)
    phi = discretize.phi_field(grid, [surf], dtype=jnp.float64)
    assert abs(float(phi.mean()) - 0.125) < 2e-3


def test_tetrahedron_voxel_volume():
    verts = np.array([[0.2, 0.2, 0.2], [0.8, 0.2, 0.2],
                      [0.2, 0.8, 0.2], [0.2, 0.2, 0.8]])
    tet = Tetrahedron(verts=verts)
    exact = abs(np.linalg.det(verts[1:] - verts[0])) / 6.0
    assert abs(tet.volume() - exact) < 1e-12
    grid = fg.Grid(24, 24, 24)
    phi = discretize.phi_field(grid, [tet], dtype=jnp.float64)
    assert abs(float(phi.mean()) - exact) / exact < 0.05
    # signed distance signs
    assert tet.distance(np.array([0.3, 0.3, 0.3])) < 0
    assert tet.distance(np.array([0.9, 0.9, 0.9])) > 0


def test_tet_vtk_reader(tmp_path):
    path = tmp_path / "mesh.vtk"
    path.write_text("""# vtk DataFile Version 2.0
tet
ASCII
DATASET UNSTRUCTURED_GRID
POINTS 4 float
0 0 0
1 0 0
0 1 0
0 0 1
CELLS 1 5
4 0 1 2 3
CELL_TYPES 1
10
""")
    pts, tets = mesh.read_tet_vtk(str(path))
    assert pts.shape == (4, 3)
    assert tets.shape == (1, 4)
    tm = TetMesh(points=pts, tets=tets)
    assert abs(tm.volume() - 1.0 / 6.0) < 1e-12


def test_dolfin_reader(tmp_path):
    path = tmp_path / "mesh.xml"
    path.write_text("""<?xml version="1.0"?>
<dolfin>
  <mesh celltype="tetrahedron" dim="3">
    <vertices size="4">
      <vertex index="0" x="0" y="0" z="0"/>
      <vertex index="1" x="1" y="0" z="0"/>
      <vertex index="2" x="0" y="1" z="0"/>
      <vertex index="3" x="0" y="0" z="1"/>
    </vertices>
    <cells size="1">
      <tetrahedron index="0" v0="0" v1="1" v2="2" v3="3"/>
    </cells>
  </mesh>
</dolfin>
""")
    pts, tets = mesh.read_tet_dolfin(str(path))
    assert pts.shape == (4, 3) and tets.shape == (1, 4)


def test_place_tetrahedron_project():
    xml = """
    <settings>
      <solver n="16">
        <mode>heat</mode>
        <tol>1e-6</tol>
        <materials>
          <matrix mu="1" />
          <solid mu="5" />
        </materials>
      </solver>
      <actions>
        <select_material name="solid" />
        <place_tetrahedron p1x="0.2" p1y="0.2" p1z="0.2"
                           p2x="0.8" p2y="0.2" p2z="0.2"
                           p3x="0.2" p3y="0.8" p3z="0.2"
                           p4x="0.2" p4y="0.2" p4z="0.8" />
        <init_phase />
      </actions>
    </settings>
    """
    f = fg.FG()
    f.set_xml(xml)
    assert f.run() == 0
    vf = f.get_volume_fraction("solid")
    exact = 0.6 ** 3 / 6.0
    assert abs(vf - exact) / exact < 0.1
