"""Mesh data model (SURVEY.md C1).

A `Mesh` is a pytree of device arrays (SoA layout, int32 indices) plus static
host-side metadata: the element type name and named node sets used to attach
boundary conditions. Coordinates are f64 on the parity path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import numpy as np
import jax.numpy as jnp

from fea_large_tpu.config import DTYPE, INDEX_DTYPE
from fea_large_tpu.elements.reference import ElementType, get_element


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Mesh:
    """Unstructured tetrahedral mesh.

    coords   f64[N, 3]   material (undeformed) nodal coordinates
    conn     i32[E, npe] element connectivity (npe = 4 or 10)
    element_type  static str, "tet4" | "tet10"
    node_sets     static dict[str, np.ndarray] — named node index sets
                  (host-side; used to build BC masks at setup time)
    """

    coords: jnp.ndarray
    conn: jnp.ndarray
    element_type: str = "tet4"
    node_sets: dict = dataclasses.field(default_factory=dict)
    n_quad: int | None = None  # quadrature override (SURVEY.md ambiguity A2)
    #: optional BoxStructure (mesh/structure.py): present on meshes whose
    #: connectivity is affine in a cell lattice (box_mesh_kuhn); lets the
    #: SoA hot path replace indexed gathers/scatters with slices/pads.
    structure: object | None = None

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        aux = (
            self.element_type,
            tuple(sorted(self.node_sets.items(), key=lambda kv: kv[0])),
            self.n_quad,
            self.structure,
        )
        return (self.coords, self.conn), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        element_type, node_sets, n_quad, structure = aux
        return cls(
            children[0], children[1], element_type, dict(node_sets), n_quad,
            structure,
        )

    # -- convenience --------------------------------------------------------
    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_elements(self) -> int:
        return self.conn.shape[0]

    @property
    def n_dof(self) -> int:
        return 3 * self.n_nodes

    @property
    def element(self) -> ElementType:
        return get_element(self.element_type, self.n_quad)

    def with_node_sets(self, **sets) -> "Mesh":
        ns = dict(self.node_sets)
        ns.update({k: np.asarray(v, np.int32) for k, v in sets.items()})
        return dataclasses.replace(self, node_sets=ns)

    @property
    def conn_host(self) -> np.ndarray:
        """Host (numpy) copy of connectivity, cached: setup code (scatter
        maps, sparsity, partitioning) runs on host, and device->host
        transfers have a large first-use latency on tunneled TPU backends."""
        cached = getattr(self, "_conn_host", None)
        if cached is None:
            cached = np.asarray(self.conn)
            object.__setattr__(self, "_conn_host", cached)
        return cached

    @property
    def coords_host(self) -> np.ndarray:
        cached = getattr(self, "_coords_host", None)
        if cached is None:
            cached = np.asarray(self.coords)
            object.__setattr__(self, "_coords_host", cached)
        return cached

    @staticmethod
    def create(coords, conn, element_type: str, node_sets: dict | None = None,
               structure=None) -> "Mesh":
        coords_np = np.asarray(coords, np.float64)
        conn_np = np.asarray(conn, np.int32)
        npe = {"tet4": 4, "tet10": 10}[element_type]
        if conn_np.shape[1] != npe:
            raise ValueError(
                f"{element_type} expects {npe} nodes/element, conn has {conn_np.shape[1]}"
            )
        mesh = Mesh(
            jnp.asarray(coords_np, DTYPE),
            jnp.asarray(conn_np, INDEX_DTYPE),
            element_type,
            dict(node_sets or {}),
            None,
            structure,
        )
        object.__setattr__(mesh, "_conn_host", conn_np)
        object.__setattr__(mesh, "_coords_host", coords_np)
        return mesh


def make_node_sets(
    coords: np.ndarray, predicates: dict[str, Callable[[np.ndarray], np.ndarray]]
) -> dict[str, np.ndarray]:
    """Build named node sets from coordinate predicates (host-side).

    Each predicate maps coords [N,3] -> bool [N]; the set is the index array
    of true entries. This is how demo problems mark faces for BCs.
    """
    coords = np.asarray(coords)
    return {
        name: np.nonzero(np.asarray(pred(coords)))[0].astype(np.int32)
        for name, pred in predicates.items()
    }
