"""Dirichlet boundary conditions and external loads (SURVEY.md C15).

The reference applies prescribed nodal displacements by modifying the global
system; the canonical TPU-native scheme here is **free-DOF masking** (survey
ambiguity A3): every array keeps its full static shape [N, 3] and fixed DOFs
are projected out by an elementwise mask. In exact arithmetic this yields the
same solution as explicit free-DOF reduction while keeping all shapes static
under `jit` (no dynamic gathers of unknown size).

For a masked operator the linear system solved per Newton iteration is

    A = M K M + (I - M),   b = M R          (M = diag(free mask))

which is SPD whenever K restricted to the free DOFs is, has du = 0 on fixed
DOFs by construction, and agrees with the reduced system on free DOFs.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from fea_large_tpu.config import DTYPE
from fea_large_tpu.mesh.core import Mesh

_COMP = {"x": 0, "y": 1, "z": 2}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DirichletBC:
    """Prescribed-displacement boundary conditions as a static-shape mask.

    free_mask  f64[N, 3]   1.0 on free DOFs, 0.0 on prescribed DOFs
    values     f64[N, 3]   total prescribed displacement at full load
                           (zero on free DOFs); scaled by the load factor
                           during incremental stepping (SURVEY.md §5.6)
    """

    free_mask: jnp.ndarray
    values: jnp.ndarray

    def tree_flatten(self):
        return (self.free_mask, self.values), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- application --------------------------------------------------------
    def impose(self, u: jnp.ndarray, scale) -> jnp.ndarray:
        """Set prescribed DOFs of u to scale * values (free DOFs untouched)."""
        return self.free_mask * u + (1.0 - self.free_mask) * (scale * self.values)

    def project(self, r: jnp.ndarray) -> jnp.ndarray:
        """Zero out prescribed DOFs (restrict a residual to free DOFs)."""
        return self.free_mask * r

    @property
    def n_fixed(self) -> int:
        return int(np.sum(np.asarray(self.free_mask) == 0.0))


class DirichletBuilder:
    """Host-side accumulation of prescribed-displacement specs into a
    `DirichletBC`. Mirrors the reference's task-file BC records (node set +
    component + value) — SURVEY.md C14/C15."""

    def __init__(self, mesh: Mesh):
        self._mesh = mesh
        self._free = np.ones((mesh.n_nodes, 3), dtype=bool)
        self._vals = np.zeros((mesh.n_nodes, 3))

    def _nodes(self, node_set) -> np.ndarray:
        if isinstance(node_set, str):
            return np.asarray(self._mesh.node_sets[node_set])
        return np.asarray(node_set)

    def fix(self, node_set, components: str = "xyz") -> "DirichletBuilder":
        """Clamp the given components to zero on a node set."""
        return self.prescribe(node_set, components, 0.0)

    def prescribe(self, node_set, components: str, value) -> "DirichletBuilder":
        """Prescribe displacement `value` (scalar, or per-node array) for the
        given components on a node set; `value` is the TOTAL displacement at
        full load."""
        nodes = self._nodes(node_set)
        for c in components:
            j = _COMP[c]
            self._free[nodes, j] = False
            self._vals[nodes, j] = value
        return self

    def build(self) -> DirichletBC:
        return DirichletBC(
            free_mask=jnp.asarray(self._free, DTYPE),
            values=jnp.asarray(self._vals, DTYPE),
        )


def body_forces(mesh: Mesh, vector) -> jnp.ndarray:
    """Consistent nodal forces f64[N, 3] for a DEAD body force b (force per
    unit REFERENCE volume — e.g. rho0 * g for self-weight):

        f[a] = sum_e sum_q w_q det(J_iso)_q N_a(xi_q) b

    Total-Lagrangian dead-load form: integrated over the undeformed
    configuration once at setup and scaled by the load factor during
    incremental stepping — the same constant-`f_ext` contract as
    `nodal_forces` and the surface loads (mesh/surface.py), so the
    external-load potential stays linear in u (no load stiffness).
    Host-side numpy: a cold setup path (SURVEY.md §4.5). Exactness: the
    integrand N_a det(J_iso) is degree-(p) on straight-edged tets, within
    both shipped quadrature rules' degree (TET4 1-pt/linear, TET10
    4-pt/degree-2)."""
    from fea_large_tpu.elements.reference import get_element

    et = get_element(mesh.element_type, mesh.n_quad)
    coords = np.asarray(mesh.coords_host, float)
    conn = np.asarray(mesh.conn_host)
    Xe = coords[conn]  # [E, npe, 3]
    J = np.einsum("eai,qad->eqid", Xe, et.shape_grad)  # [E, q, 3, 3]
    wdet = np.linalg.det(J) * et.quad_weights[None, :]  # [E, q]
    fa = np.einsum("eq,qa->ea", wdet, et.shape)[..., None] * np.asarray(
        vector, float
    )  # [E, npe, 3]
    f = np.zeros((mesh.n_nodes, 3))
    np.add.at(f, conn.reshape(-1), fa.reshape(-1, 3))
    return jnp.asarray(f, DTYPE)


def nodal_forces(mesh: Mesh, specs: dict) -> jnp.ndarray:
    """Build a total external nodal-force array f64[N, 3] from
    {node_set_name: force_vector} specs; the force vector is applied to EACH
    node in the set (scaled by the load factor during stepping)."""
    f = np.zeros((mesh.n_nodes, 3))
    for name, vec in specs.items():
        nodes = np.asarray(mesh.node_sets[name])
        f[nodes] += np.asarray(vec)
    return jnp.asarray(f, DTYPE)
