"""Legacy-VTK structured-points writer.

Equivalent of VTKCubeWriter (fibergen.cpp:5714-6073): writes voxel fields as
legacy VTK STRUCTURED_POINTS with binary (big-endian) or ASCII encoding.
Vector/tensor fields with a leading component axis are written as one
SCALARS record per component named '<field>_<k>' plus a VECTORS record for
3-component fields.
"""
from __future__ import annotations

import numpy as np


def write_vtk(path: str, grid, fields: dict, binary: bool = True):
    """fields: name -> array of shape (ncomp, nx, ny, nz)."""
    nx, ny, nz = grid.shape
    sx, sy, sz = grid.spacing
    ox, oy, oz = grid.x0

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
            arr = np.asarray(arr, dtype=np.float32)
            if arr.ndim == 3:
                arr = arr[None]
            ncomp = arr.shape[0]
            if ncomp == 3:
                w(f"VECTORS {name} float\n")
                # (3, x, y, z) -> (z, y, x, 3) with x fastest
                data = np.moveaxis(arr, 0, -1).transpose(2, 1, 0, 3)
                _write_block(f, data, binary)
            for k in range(ncomp):
                cname = name if ncomp == 1 else f"{name}_{k}"
                w(f"SCALARS {cname} float 1\n")
                w("LOOKUP_TABLE default\n")
                data = arr[k].transpose(2, 1, 0)
                _write_block(f, data, binary)


def _write_block(f, data, binary):
    flat = np.ascontiguousarray(data, dtype=">f4" if binary else np.float32)
    if binary:
        f.write(flat.tobytes())
        f.write(b"\n")
    else:
        np.savetxt(f, flat.reshape(-1, 1), fmt="%g")
