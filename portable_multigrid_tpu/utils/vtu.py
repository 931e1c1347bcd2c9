"""VTU output for structured-grid solutions (pure Python, zlib-compressed).

TPU-native replacement for the reference's DataOut VTU output with
best-speed compression (reference: source/geometric_multigrid/program.cc:368-380).
Writes VTK ImageData (.vti) — the natural format for a structured DoF grid —
with appended zlib-compressed binary data, readable by ParaView/VisIt.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np

from ..fem.space import FESpace


def _encode_block(data: bytes, level: int = 1) -> bytes:
    """VTK compressed-binary encoding: one-block zlib with a 4-word header."""
    comp = zlib.compress(data, level)
    header = struct.pack("<4I", 1, len(data), len(data), len(comp))
    return base64.b64encode(header) + base64.b64encode(comp)


def write_vti(
    filename: str,
    space: FESpace,
    fields: dict[str, np.ndarray],
    compression_level: int = 1,
) -> None:
    """Write nodal grid fields to a .vti file.

    fields: name -> array of shape space.grid_shape (scalar) or
    (k,) + grid_shape (k-component vector field).

    Note: the DoF grid is written as a uniform-spacing image grid; for
    Gauss–Lobatto nodal points (p > 1) the in-cell spacing is approximated as
    uniform, which is the standard "patches" visualization the reference's
    build_patches performs too.
    """
    dim = space.dim
    N = space.points_per_axis
    n = [N - 1] * dim + [0] * (3 - dim)
    spacing = [(space.mesh.b - space.mesh.a) / max(N - 1, 1)] * 3

    pieces = []
    names = []
    for name, arr in fields.items():
        arr = np.asarray(arr, dtype=np.float32)
        if arr.shape == space.grid_shape:
            comps = 1
            # VTK expects x fastest; our axis 0 is slowest -> transpose
            flat = np.ascontiguousarray(arr.transpose()).reshape(-1)
        elif arr.ndim == dim + 1:
            comps = arr.shape[0]
            flat = np.stack(
                [np.ascontiguousarray(c.transpose()).reshape(-1) for c in arr],
                axis=-1,
            ).reshape(-1)
        else:
            raise ValueError(f"bad field shape for {name}: {arr.shape}")
        names.append((name, comps))
        pieces.append(_encode_block(flat.tobytes(), compression_level))

    extent = f"0 {n[0]} 0 {n[1]} 0 {n[2]}"
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" '
        'header_type="UInt32" compressor="vtkZLibDataCompressor">',
        f'  <ImageData WholeExtent="{extent}" Origin="{space.mesh.a} '
        f'{space.mesh.a} {space.mesh.a}" '
        f'Spacing="{spacing[0]} {spacing[1]} {spacing[2]}">',
        f'    <Piece Extent="{extent}">',
        f'      <PointData Scalars="{names[0][0]}">',
    ]
    for (name, comps), blob in zip(names, pieces):
        lines.append(
            f'        <DataArray type="Float32" Name="{name}" '
            f'NumberOfComponents="{comps}" format="binary">'
        )
        lines.append("          " + blob.decode("ascii"))
        lines.append("        </DataArray>")
    lines += [
        "      </PointData>",
        "    </Piece>",
        "  </ImageData>",
        "</VTKFile>",
    ]
    with open(filename, "w") as f:
        f.write("\n".join(lines) + "\n")
