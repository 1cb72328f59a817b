"""Structured mesh generators (host-side numpy; cold path).

The reference ships meshes as input files; for demos, tests, and benchmarks we
generate boxes directly: each grid cell is split into 5 tetrahedra (parity
orientation alternated so faces match), and TET4 meshes are upgraded to TET10
by edge-midpoint insertion (Gmsh edge ordering, SURVEY.md §5.2 A4).
"""

from __future__ import annotations

import numpy as np

from fea_large_tpu.elements.reference import TET10_EDGES
from fea_large_tpu.mesh.core import Mesh, make_node_sets

# 5-tet decomposition of the unit cube, two mirror variants so that
# neighbouring cells share diagonals (conforming mesh).
_CUBE_TETS_EVEN = np.array(
    [
        [0, 1, 2, 5],
        [0, 2, 3, 7],
        [0, 5, 7, 4],
        [2, 7, 5, 6],
        [0, 2, 7, 5],
    ]
)
_CUBE_TETS_ODD = np.array(
    [
        [1, 3, 0, 4],
        [1, 2, 3, 6],
        [1, 6, 4, 5],
        [3, 4, 6, 7],
        [1, 3, 6, 4],
    ]
)


def box_mesh(
    nx: int,
    ny: int,
    nz: int,
    lx: float = 1.0,
    ly: float = 1.0,
    lz: float = 1.0,
    element_type: str = "tet4",
    tol: float = 1e-9,
) -> Mesh:
    """Structured box [0,lx]x[0,ly]x[0,lz] with nx*ny*nz cells, 5 tets each.

    Node sets: xmin/xmax/ymin/ymax/zmin/zmax faces (of the final node cloud,
    so TET10 midside nodes are included in face sets).
    """
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, ly, ny + 1)
    zs = np.linspace(0.0, lz, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def nid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    cells = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                corner = np.array(
                    [
                        nid(i, j, k),
                        nid(i + 1, j, k),
                        nid(i + 1, j + 1, k),
                        nid(i, j + 1, k),
                        nid(i, j, k + 1),
                        nid(i + 1, j, k + 1),
                        nid(i + 1, j + 1, k + 1),
                        nid(i, j + 1, k + 1),
                    ]
                )
                tets = _CUBE_TETS_EVEN if (i + j + k) % 2 == 0 else _CUBE_TETS_ODD
                cells.append(corner[tets])
    conn = np.concatenate(cells, axis=0).astype(np.int32)

    # enforce positive orientation (det of edge matrix > 0)
    v = coords[conn]
    det = np.linalg.det(v[:, 1:4] - v[:, :1])
    flip = det < 0
    conn[flip] = conn[flip][:, [0, 2, 1, 3]]

    if element_type == "tet10":
        coords, conn = tet4_to_tet10(coords, conn)

    sets = make_node_sets(
        coords,
        {
            "xmin": lambda c: c[:, 0] < tol,
            "xmax": lambda c: c[:, 0] > lx - tol,
            "ymin": lambda c: c[:, 1] < tol,
            "ymax": lambda c: c[:, 1] > ly - tol,
            "zmin": lambda c: c[:, 2] < tol,
            "zmax": lambda c: c[:, 2] > lz - tol,
        },
    )
    return Mesh.create(coords, conn, element_type, sets)


def box_mesh_kuhn(
    nx: int,
    ny: int,
    nz: int,
    lx: float = 1.0,
    ly: float = 1.0,
    lz: float = 1.0,
    element_type: str = "tet4",
    tol: float = 1e-9,
) -> Mesh:
    """Structured box with the uniform Kuhn/Freudenthal 6-tet decomposition
    and class-contiguous node numbering, carrying a `BoxStructure`
    descriptor (mesh/structure.py): on this mesh the SoA hot path replaces
    every indexed gather/scatter with static slices/pads — the structured
    fast path. Same node sets as `box_mesh`; 6 tets/cell instead of 5 (the
    Kuhn pattern is translation-uniform, which is what makes the
    connectivity affine in the cell index — the 5-tet pattern needs parity
    mirroring and is not).
    """
    from fea_large_tpu.mesh.structure import (
        build_box_structure,
        class_coords,
        structure_conn,
    )

    st = build_box_structure(nx, ny, nz, element_type)
    coords = class_coords(st, lx, ly, lz)
    conn = structure_conn(st)
    sets = make_node_sets(
        coords,
        {
            "xmin": lambda c: c[:, 0] < tol,
            "xmax": lambda c: c[:, 0] > lx - tol,
            "ymin": lambda c: c[:, 1] < tol,
            "ymax": lambda c: c[:, 1] > ly - tol,
            "zmin": lambda c: c[:, 2] < tol,
            "zmax": lambda c: c[:, 2] > lz - tol,
        },
    )
    return Mesh.create(coords, conn, element_type, sets, structure=st)


def tet4_to_tet10(coords: np.ndarray, conn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Insert unique mid-edge nodes, producing TET10 connectivity in the
    canonical (Gmsh) edge order of `TET10_EDGES`."""
    coords = np.asarray(coords, np.float64)
    conn = np.asarray(conn, np.int64)
    E = conn.shape[0]

    # all element edges as sorted node pairs
    pairs = np.stack(
        [np.stack([conn[:, i], conn[:, j]], axis=1) for i, j in TET10_EDGES], axis=1
    )  # [E, 6, 2]
    flat = np.sort(pairs.reshape(-1, 2), axis=1)
    uniq, inverse = np.unique(flat, axis=0, return_inverse=True)

    mid_coords = 0.5 * (coords[uniq[:, 0]] + coords[uniq[:, 1]])
    mid_ids = coords.shape[0] + np.arange(uniq.shape[0])

    new_coords = np.concatenate([coords, mid_coords], axis=0)
    new_conn = np.concatenate(
        [conn, mid_ids[inverse].reshape(E, 6)], axis=1
    ).astype(np.int32)
    return new_coords, new_conn
