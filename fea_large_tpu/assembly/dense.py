"""Dense global assembly for small problems (SURVEY.md C9/C11, config 1).

At the ~1k-element scale of the driver's config 1 (BASELINE.json:7) the
global stiffness fits comfortably in HBM as a dense [3N, 3N] f64 matrix and a
dense Cholesky (`cho_solve`) is both the fastest and the only f64 direct
solve available on this TPU (no f64 LU — SURVEY.md §9 risk 5). Larger
problems use the BCSR or matrix-free operators instead.
"""

from __future__ import annotations

import jax.numpy as jnp

from fea_large_tpu.elements.kernels import ElementGeometry, element_stiffness
from fea_large_tpu.materials.base import Material


def element_dofs(conn: jnp.ndarray) -> jnp.ndarray:
    """Global DOF indices per element: [E, 3*npe] with DOF = 3*node + comp."""
    comp = jnp.arange(3, dtype=conn.dtype)
    return (3 * conn[:, :, None] + comp[None, None, :]).reshape(conn.shape[0], -1)


def assemble_dense(
    u: jnp.ndarray,
    conn: jnp.ndarray,
    geom: ElementGeometry,
    material: Material,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K [3N,3N], f_int [N,3]) by scatter-adding element tangents.

    u [N, 3] nodal displacements. Keeps the full [ndof, ndof] matrix — use
    only at config-1 scale.
    """
    n_nodes = u.shape[0]
    ue = u[conn]
    Ke, fe = element_stiffness(ue, geom, material)
    E, npe = conn.shape
    nd = 3 * npe
    Ke = Ke.reshape(E, nd, nd)
    dofs = element_dofs(conn)
    K = jnp.zeros((3 * n_nodes, 3 * n_nodes), dtype=u.dtype)
    K = K.at[dofs[:, :, None], dofs[:, None, :]].add(Ke)
    f_int = jnp.zeros((n_nodes, 3), dtype=u.dtype).at[conn].add(fe)
    return K, f_int


def mask_dense_system(K: jnp.ndarray, r: jnp.ndarray, free_mask: jnp.ndarray):
    """(A, b) for the masked system A = M K M + (I - M), b = M r.

    free_mask/r are [N, 3]; returns flattened [ndof, ndof] / [ndof]. A is SPD
    whenever the free-DOF block of K is (SURVEY.md C15, ambiguity A3).
    """
    m = free_mask.reshape(-1)
    A = K * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    return A, r.reshape(-1) * m
