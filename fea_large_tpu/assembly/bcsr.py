"""Block-CSR (3x3 nodal blocks) global stiffness operator (SURVEY.md C9/C10).

The reference stores K in scalar CRS and inserts element entries by
binary-searching column indices per row — the classic serial assembly
bottleneck (SURVEY.md §4.2). The TPU-native design precomputes, once per
mesh, a **scatter map**: for every (element, a, b) node pair the flat index
of its 3x3 block slot in the BCSR `data` array. Runtime assembly is then a
single sorted `segment_sum` over the element tangents — deterministic
layout, no search, no dynamic shapes.

Storage (block rows = nodes, 3x3 blocks):
    indptr   i32[N+1]        block-row pointers
    indices  i32[nnzb]       block-column (node) index per stored block
    data     f64[nnzb, 3, 3] block values
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fea_large_tpu.config import INDEX_DTYPE
from fea_large_tpu.elements.kernels import ElementGeometry, element_stiffness
from fea_large_tpu.materials.base import Material


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BCSRStructure:
    """Static sparsity + precomputed assembly scatter map for one mesh.

    A pytree (arrays as leaves, static sizes as aux) so it can be a jit
    ARGUMENT — closure-capturing these multi-MB maps would bake them into
    the traced program as constants (slow trace/compile)."""

    indptr: jnp.ndarray  # i32[N+1]
    indices: jnp.ndarray  # i32[nnzb] block-column per slot
    row_ids: jnp.ndarray  # i32[nnzb] block-row per slot (expanded indptr)
    perm: jnp.ndarray  # i32[E*npe*npe] sort of flattened (e,a,b) by slot
    segment_ids: jnp.ndarray  # i32[E*npe*npe] slot id per sorted entry
    n_nodes: int  # static
    nnzb: int  # static

    def tree_flatten(self):
        return (
            (self.indptr, self.indices, self.row_ids, self.perm, self.segment_ids),
            (self.n_nodes, self.nnzb),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @staticmethod
    def build(conn: np.ndarray, n_nodes: int) -> "BCSRStructure":
        """Host-side sparsity construction from connectivity (cold path,
        SURVEY.md §4.5). Runs in O(E npe^2 log) numpy."""
        conn = np.asarray(conn)
        E, npe = conn.shape
        rows = np.repeat(conn, npe, axis=1).reshape(-1)  # (e,a,b) -> node a
        cols = np.tile(conn, (1, npe)).reshape(-1)  # (e,a,b) -> node b
        keys = rows.astype(np.int64) * n_nodes + cols
        uniq, slot_of_entry = np.unique(keys, return_inverse=True)
        nnzb = uniq.shape[0]
        u_rows = (uniq // n_nodes).astype(np.int64)
        u_cols = (uniq % n_nodes).astype(np.int64)
        indptr = np.zeros(n_nodes + 1, dtype=np.int64)
        np.add.at(indptr, u_rows + 1, 1)
        indptr = np.cumsum(indptr)
        perm = np.argsort(slot_of_entry, kind="stable")
        return BCSRStructure(
            indptr=jnp.asarray(indptr, INDEX_DTYPE),
            indices=jnp.asarray(u_cols, INDEX_DTYPE),
            row_ids=jnp.asarray(u_rows, INDEX_DTYPE),
            perm=jnp.asarray(perm, INDEX_DTYPE),
            segment_ids=jnp.asarray(slot_of_entry[perm], INDEX_DTYPE),
            n_nodes=int(n_nodes),
            nnzb=int(nnzb),
        )

    def assemble_blocks(self, Ke: jnp.ndarray) -> jnp.ndarray:
        """Ke [E, npe, 3, npe, 3] -> BCSR data [nnzb, 3, 3] (sorted,
        deterministic segment_sum — SURVEY.md §7.2)."""
        E, npe = Ke.shape[0], Ke.shape[1]
        blocks = jnp.transpose(Ke, (0, 1, 3, 2, 4)).reshape(E * npe * npe, 3, 3)
        return jax.ops.segment_sum(
            blocks[self.perm],
            self.segment_ids,
            num_segments=self.nnzb,
            indices_are_sorted=True,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BCSRMatrix:
    """Assembled BCSR stiffness: structure + block data + SpMV."""

    structure: BCSRStructure
    data: jnp.ndarray  # [nnzb, 3, 3]

    def tree_flatten(self):
        return (self.structure, self.data), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y [N,3] = K x, x [N,3]. Pure-XLA path: per-block 3x3 matvec +
        sorted segment_sum over block rows (rows are ascending by
        construction). The Pallas SpMV (`ops.pallas_spmv`) is the f32
        performance variant of this exact contraction."""
        s = self.structure
        contrib = jnp.einsum("kij,kj->ki", self.data, x[s.indices])
        return jax.ops.segment_sum(
            contrib, s.row_ids, num_segments=s.n_nodes, indices_are_sorted=True
        )

    def block_diagonal(self) -> jnp.ndarray:
        """Extract the nodal 3x3 diagonal blocks [N, 3, 3] (for the
        block-Jacobi preconditioner, SURVEY.md C12)."""
        s = self.structure
        is_diag = s.row_ids == s.indices
        # every node has a diagonal block (elements touch their own nodes)
        diag_slots = jnp.nonzero(
            is_diag, size=s.n_nodes, fill_value=0
        )[0]
        return self.data[diag_slots]

    def to_dense(self) -> jnp.ndarray:
        """Dense [3N, 3N] — test/debug only."""
        s = self.structure
        n = s.n_nodes
        K = jnp.zeros((n, 3, n, 3), dtype=self.data.dtype)
        K = K.at[s.row_ids, :, s.indices, :].add(self.data)
        return K.reshape(3 * n, 3 * n)


def assemble_bcsr(
    u: jnp.ndarray,
    conn: jnp.ndarray,
    geom: ElementGeometry,
    material: Material,
    structure: BCSRStructure,
    node_scatter,
) -> tuple[BCSRMatrix, jnp.ndarray]:
    """(K as BCSRMatrix, f_int [N,3]) — the config-2 assembly path."""
    ue = u[conn]
    Ke, fe = element_stiffness(ue, geom, material)
    data = structure.assemble_blocks(Ke)
    return BCSRMatrix(structure, data), node_scatter(fe)
