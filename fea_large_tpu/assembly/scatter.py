"""Deterministic node scatter-add (SURVEY.md C9, §7.2 hazard (a)).

Scatter-adding per-element nodal vectors (internal forces, matrix-free
tangent actions, diagonal blocks) into the global [N, 3] array is THE
assembly primitive. A naive ``.at[conn].add`` leaves the floating-point
accumulation order to the backend; instead the (element, local-node) pairs
are sorted by global node id ONCE at setup, and runtime assembly is a sorted
`segment_sum` — a fixed, deterministic reduction order on every backend,
which makes multi-device runs bitwise comparable to single-device runs
(SURVEY.md §6 "distributed tests").

`NodeScatter` is a pytree (arrays as leaves, the static node count as aux)
so it is passed as a jit ARGUMENT, never closure-captured: multi-MB captured
constants make tracing/compilation pathologically slow and bloat the
executable.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fea_large_tpu.config import INDEX_DTYPE


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NodeScatter:
    """Precomputed sorted scatter map from element-local nodal quantities
    [E, npe, ...] to global nodal arrays [n_nodes, ...]."""

    perm: jnp.ndarray  # i32[E*npe] stable sort of flattened (e,a) by node id
    segment_ids: jnp.ndarray  # i32[E*npe] node id per sorted slot (ascending)
    n_nodes: int  # static

    def tree_flatten(self):
        return (self.perm, self.segment_ids), self.n_nodes

    @classmethod
    def tree_unflatten(cls, n_nodes, children):
        return cls(children[0], children[1], n_nodes)

    @staticmethod
    def build(conn: np.ndarray, n_nodes: int) -> "NodeScatter":
        flat = np.asarray(conn).reshape(-1)
        perm = np.argsort(flat, kind="stable")
        return NodeScatter(
            perm=jnp.asarray(perm, INDEX_DTYPE),
            segment_ids=jnp.asarray(flat[perm], INDEX_DTYPE),
            n_nodes=int(n_nodes),
        )

    def __call__(self, values: jnp.ndarray) -> jnp.ndarray:
        """values [E, npe, ...] -> summed [n_nodes, ...]."""
        flat = values.reshape(-1, *values.shape[2:])
        return jax.ops.segment_sum(
            flat[self.perm],
            self.segment_ids,
            num_segments=self.n_nodes,
            indices_are_sorted=True,
        )
