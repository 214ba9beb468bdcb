"""Legacy-VTK structured-points writer.

Equivalent of VTKCubeWriter (fibergen.cpp:5714-6073): writes voxel fields as
legacy VTK STRUCTURED_POINTS with binary (big-endian) or ASCII encoding.
Vector/tensor fields with a leading component axis are written as one
SCALARS record per component named '<field>_<k>' plus a VECTORS record for
3-component fields.  ``dtype`` selects the written scalar type (float32 /
float64 — the reference's <restype>float/double</restype>, fibergen.cpp:
26552, template parameter R of FG<T, R, DIM>).
"""
from __future__ import annotations

import numpy as np


def write_vtk(path: str, grid, fields: dict, binary: bool = True,
              dtype=np.float32):
    """fields: name -> array of shape (ncomp, nx, ny, nz)."""
    nx, ny, nz = grid.shape
    sx, sy, sz = grid.spacing
    ox, oy, oz = grid.x0
    dtype = np.dtype(dtype)
    vtype = "double" if dtype == np.float64 else "float"

    with open(path, "wb") as f:
        def w(text):
            f.write(text.encode("ascii"))

        w("# vtk DataFile Version 3.0\n")
        w("fibergen_tpu\n")
        w("BINARY\n" if binary else "ASCII\n")
        w("DATASET STRUCTURED_POINTS\n")
        # VTK is column-major (x fastest); our arrays are (c, x, y, z)
        w(f"DIMENSIONS {nx} {ny} {nz}\n")
        w(f"ORIGIN {ox + 0.5 * sx} {oy + 0.5 * sy} {oz + 0.5 * sz}\n")
        w(f"SPACING {sx} {sy} {sz}\n")
        w(f"POINT_DATA {nx * ny * nz}\n")

        for name, arr in fields.items():
            arr = np.asarray(arr, dtype=dtype)
            if arr.ndim == 3:
                arr = arr[None]
            ncomp = arr.shape[0]
            if ncomp == 3:
                w(f"VECTORS {name} {vtype}\n")
                # (3, x, y, z) -> (z, y, x, 3) with x fastest
                data = np.moveaxis(arr, 0, -1).transpose(2, 1, 0, 3)
                _write_block(f, data, binary, dtype)
            for k in range(ncomp):
                cname = name if ncomp == 1 else f"{name}_{k}"
                w(f"SCALARS {cname} {vtype} 1\n")
                w("LOOKUP_TABLE default\n")
                data = arr[k].transpose(2, 1, 0)
                _write_block(f, data, binary, dtype)


def _write_block(f, data, binary, dtype=np.float32):
    be = np.dtype(dtype).newbyteorder(">")
    flat = np.ascontiguousarray(data, dtype=be if binary else dtype)
    if binary:
        f.write(flat.tobytes())
        f.write(b"\n")
    else:
        # round-trip-exact significant digits for the declared scalar type
        fmt = "%.17g" if np.dtype(dtype) == np.float64 else "%.9g"
        np.savetxt(f, flat.reshape(-1, 1), fmt=fmt)
