"""Structured hex-mesh generation.

The reference ships only pre-made example meshes; scaling its cases up
(e.g. the multi-million-cell lid-driven-cavity benchmark) requires
generating meshes. Two paths:

- `structured_box_mesh`: builds the CompiledMesh arrays analytically —
  no text parsing, scales to tens of millions of cells in seconds.
- `write_tgrid`: emits a TGRID .msh text file for a structured box, used
  to round-trip-test the parser and to produce reference-compatible
  fixtures (grammar per io.rs:78-284 of the reference's reader).

Zone naming follows the reference's couette fixtures
(couette_flow_*.msh): INLET (x-), OUTLET (x+), BOTTOM_WALL (y-),
TOP_WALL (y+), PERIODIC_-Z (z-), PERIODIC_+Z (z+), FLUID interior.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from orc_tpu.mesh.compile import CompiledMesh, compile_from_arrays
from orc_tpu.mesh.zones import BoundaryTable, FaceCondition, FaceZone

DEFAULT_ZONE_NAMES = {
    "interior": "FLUID",
    "x-": "INLET",
    "x+": "OUTLET",
    "y-": "BOTTOM_WALL",
    "y+": "TOP_WALL",
    "z-": "PERIODIC_-Z",
    "z+": "PERIODIC_+Z",
}


def structured_box_mesh(
    nx: int,
    ny: int,
    nz: int = 1,
    lengths: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    zone_names: Dict[str, str] | None = None,
    dtype=jnp.float64,
):
    """Uniform structured hex mesh of nx*ny*nz cells.

    Cell (i,j,k) has id ``i + nx*(j + ny*k)`` (x fastest). Returns
    (CompiledMesh, BoundaryTable); boundary zones default to
    Wall/Interior types — set the actual BCs on the table afterwards.
    """
    names = dict(DEFAULT_ZONE_NAMES)
    if zone_names:
        names.update(zone_names)
    lx, ly, lz = lengths
    ox, oy, oz = origin
    hx, hy, hz = lx / nx, ly / ny, lz / nz
    C = nx * ny * nz

    def cid(i, j, k):
        return i + nx * (j + ny * k)

    # Cell centroids / volumes.
    i, j, k = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    flat = cid(i, j, k).ravel()
    cc = np.zeros((C, 3))
    cc[flat, 0] = (ox + (i.ravel() + 0.5) * hx)
    cc[flat, 1] = (oy + (j.ravel() + 0.5) * hy)
    cc[flat, 2] = (oz + (k.ravel() + 0.5) * hz)
    vol = np.full(C, hx * hy * hz)

    # Zone table: 0 interior, 1..6 boundaries.
    zones = {
        1: FaceZone(1, FaceCondition.INTERIOR, names["interior"]),
        2: FaceZone(2, FaceCondition.WALL, names["x-"]),
        3: FaceZone(3, FaceCondition.WALL, names["x+"]),
        4: FaceZone(4, FaceCondition.WALL, names["y-"]),
        5: FaceZone(5, FaceCondition.WALL, names["y+"]),
        6: FaceZone(6, FaceCondition.WALL, names["z-"]),
        7: FaceZone(7, FaceCondition.WALL, names["z+"]),
    }
    table = BoundaryTable(zones)

    owners, neighbors, areas, normals, cents, zslots = [], [], [], [], [], []

    def add_direction(axis, n_axis, h_axis, area, lo_zone, hi_zone):
        """Faces perpendicular to `axis` at planes 0..n_axis."""
        ax_counts = [nx, ny, nz]
        ax_counts[axis] = n_axis + 1
        pi, pj, pk = np.meshgrid(
            np.arange(ax_counts[0]),
            np.arange(ax_counts[1]),
            np.arange(ax_counts[2]),
            indexing="ij",
        )
        plane = (pi, pj, pk)[axis].ravel()
        others = [p.ravel() for p in (pi, pj, pk)]

        lo_idx = list(others)
        lo_idx[axis] = plane - 1  # cell below the plane
        hi_idx = list(others)
        hi_idx[axis] = plane  # cell above the plane
        has_lo = plane > 0
        has_hi = plane < n_axis
        lo_cell = cid(*[np.clip(x, 0, None) for x in lo_idx])
        hi_cell = cid(*hi_idx)

        own = np.where(has_lo, lo_cell, hi_cell)
        nbr = np.where(has_lo & has_hi, hi_cell, -1)
        # Outward (from owner) normal: +e_axis for interior & high
        # boundary (owner below), -e_axis for the low boundary.
        sign = np.where(has_lo, 1.0, -1.0)
        nrm = np.zeros((own.shape[0], 3))
        nrm[:, axis] = sign

        cen = np.zeros((own.shape[0], 3))
        h = [hx, hy, hz]
        o = [ox, oy, oz]
        for a in range(3):
            if a == axis:
                cen[:, a] = o[a] + plane * h[a]
            else:
                cen[:, a] = o[a] + (others[a] + 0.5) * h[a]

        zs = np.where(
            has_lo & has_hi,
            table.slot_of_zone[1],
            np.where(
                has_lo,
                table.slot_of_zone[hi_zone],
                table.slot_of_zone[lo_zone],
            ),
        )
        owners.append(own)
        neighbors.append(nbr)
        areas.append(np.full(own.shape[0], area))
        normals.append(nrm)
        cents.append(cen)
        zslots.append(zs)

    add_direction(0, nx, hx, hy * hz, 2, 3)
    add_direction(1, ny, hy, hx * hz, 4, 5)
    add_direction(2, nz, hz, hx * hy, 6, 7)

    mesh = compile_from_arrays(
        dim=3,
        face_owner=np.concatenate(owners),
        face_neighbor=np.concatenate(neighbors),
        face_area=np.concatenate(areas),
        face_normal=np.concatenate(normals),
        face_centroid=np.concatenate(cents),
        face_zone_slot=np.concatenate(zslots),
        cell_centroid=cc,
        cell_volume=vol,
        dtype=dtype,
    )
    return mesh, table


def write_tgrid(
    path: str,
    nx: int,
    ny: int,
    nz: int = 1,
    lengths: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    zone_names: Dict[str, str] | None = None,
):
    """Write a structured box as a TGRID .msh text file."""
    names = dict(DEFAULT_ZONE_NAMES)
    if zone_names:
        names.update(zone_names)
    lx, ly, lz = lengths
    ox, oy, oz = origin
    hx, hy, hz = lx / nx, ly / ny, lz / nz
    npx, npy, npz = nx + 1, ny + 1, nz + 1
    n_nodes = npx * npy * npz
    n_cells = nx * ny * nz

    def nid(i, j, k):  # 1-based node id
        return 1 + i + npx * (j + npy * k)

    def cid(i, j, k):  # 1-based cell id
        return 1 + i + nx * (j + ny * k)

    # Count faces per zone.
    n_int = (nx - 1) * ny * nz + nx * (ny - 1) * nz + nx * ny * (nz - 1)
    zone_faces = {
        "interior": [],
        "x-": [],
        "x+": [],
        "y-": [],
        "y+": [],
        "z-": [],
        "z+": [],
    }

    # Quad faces with nodes ordered counterclockwise seen from +axis.
    for i in range(npx):
        for j in range(ny):
            for k in range(nz):
                nodes = (
                    nid(i, j, k),
                    nid(i, j + 1, k),
                    nid(i, j + 1, k + 1),
                    nid(i, j, k + 1),
                )
                c_lo = cid(i - 1, j, k) if i > 0 else 0
                c_hi = cid(i, j, k) if i < nx else 0
                key = "interior" if (c_lo and c_hi) else ("x-" if i == 0 else "x+")
                zone_faces[key].append((nodes, c_hi, c_lo))
    for j in range(npy):
        for i in range(nx):
            for k in range(nz):
                nodes = (
                    nid(i, j, k),
                    nid(i + 1, j, k),
                    nid(i + 1, j, k + 1),
                    nid(i, j, k + 1),
                )
                c_lo = cid(i, j - 1, k) if j > 0 else 0
                c_hi = cid(i, j, k) if j < ny else 0
                key = "interior" if (c_lo and c_hi) else ("y-" if j == 0 else "y+")
                zone_faces[key].append((nodes, c_hi, c_lo))
    for k in range(npz):
        for i in range(nx):
            for j in range(ny):
                nodes = (
                    nid(i, j, k),
                    nid(i + 1, j, k),
                    nid(i + 1, j + 1, k),
                    nid(i, j + 1, k),
                )
                c_lo = cid(i, j, k - 1) if k > 0 else 0
                c_hi = cid(i, j, k) if k < nz else 0
                key = "interior" if (c_lo and c_hi) else ("z-" if k == 0 else "z+")
                zone_faces[key].append((nodes, c_hi, c_lo))

    n_faces = sum(len(v) for v in zone_faces.values())
    bc_code = {
        "interior": 2,
        "x-": 3,
        "x+": 3,
        "y-": 3,
        "y+": 3,
        "z-": 3,
        "z+": 3,
    }

    with open(path, "w") as f:
        f.write('(0 "Generated by orc_tpu structured_box_mesh")\n')
        f.write('(0 "Units: Meters")\n')
        f.write("(2 3)\n")
        f.write(f"(10 (0 1 {n_nodes:x} 0 3))\n")
        f.write(f"(10 (1 1 {n_nodes:x} 1 3)\n(\n")
        # Emit nodes in id order (i fastest).
        for idx in range(n_nodes):
            i = idx % npx
            j = (idx // npx) % npy
            k = idx // (npx * npy)
            f.write(f"{ox + i * hx:.17g} {oy + j * hy:.17g} {oz + k * hz:.17g}\n")
        f.write("))\n")
        f.write(f"(12 (0 1 {n_cells:x} 0 0))\n")
        f.write(f"(12 (2 1 {n_cells:x} 1 4))\n")
        f.write(f"(13 (0 1 {n_faces:x} 0 0))\n")

        zone_id = 10
        first = 1
        for key in ("interior", "x-", "x+", "y-", "y+", "z-", "z+"):
            faces = zone_faces[key]
            if not faces:
                continue
            last = first + len(faces) - 1
            f.write(f'(0 "Faces of zone {names[key]}")\n')
            f.write(
                f"(13 ({zone_id:x} {first:x} {last:x} {bc_code[key]:x} 4)(\n"
            )
            for nodes, c0, c1 in faces:
                f.write(
                    " ".join(f"{x:x}" for x in nodes)
                    + f" {c0:x} {c1:x}\n"
                )
            f.write(")\n)\n")
            first = last + 1
            zone_id += 1
