"""Assembly-layer tests (SURVEY.md §6 unit battery): dense vs BCSR vs
matrix-free operators must agree; scatter maps must be deterministic."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import StVenantKirchhoff, NeoHookean
from fea_large_tpu.assembly.bcsr import BCSRStructure, assemble_bcsr
from fea_large_tpu.assembly.dense import assemble_dense, mask_dense_system
from fea_large_tpu.assembly.matfree import make_operator
from fea_large_tpu.assembly.scatter import NodeScatter
from fea_large_tpu.elements.kernels import precompute_geometry
from fea_large_tpu.mesh.generators import box_mesh


def _setup(element_type, rng, nx=2):
    mesh = box_mesh(nx, 2, 2, element_type=element_type)
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    mat = StVenantKirchhoff(jnp.asarray(2.0), jnp.asarray(1.0))
    u = jnp.asarray(0.05 * rng.standard_normal((mesh.n_nodes, 3)))
    return mesh, geom, mat, u


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_bcsr_matches_dense(element_type, rng):
    mesh, geom, mat, u = _setup(element_type, rng)
    scatter = NodeScatter.build(np.asarray(mesh.conn), mesh.n_nodes)
    structure = BCSRStructure.build(np.asarray(mesh.conn), mesh.n_nodes)

    K_dense, f_dense = assemble_dense(u, mesh.conn, geom, mat)
    K_bcsr, f_bcsr = assemble_bcsr(u, mesh.conn, geom, mat, structure, scatter)

    np.testing.assert_allclose(f_bcsr, f_dense, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(K_bcsr.to_dense(), K_dense, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_bcsr_spmv_matches_dense_matvec(element_type, rng):
    mesh, geom, mat, u = _setup(element_type, rng)
    scatter = NodeScatter.build(np.asarray(mesh.conn), mesh.n_nodes)
    structure = BCSRStructure.build(np.asarray(mesh.conn), mesh.n_nodes)
    K_dense, _ = assemble_dense(u, mesh.conn, geom, mat)
    K_bcsr, _ = assemble_bcsr(u, mesh.conn, geom, mat, structure, scatter)
    v = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)))
    y_ref = (K_dense @ v.reshape(-1)).reshape(-1, 3)
    y = K_bcsr.matvec(v)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    "element_type,mat_cls", [("tet4", StVenantKirchhoff), ("tet10", NeoHookean)]
)
def test_matfree_matches_assembled(element_type, mat_cls, rng):
    """apply_K(v) (SURVEY.md §5.5 matrix-free action) == assembled K @ v."""
    mesh = box_mesh(2, 2, 2, element_type=element_type)
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    mat = mat_cls(jnp.asarray(2.0), jnp.asarray(1.0))
    u = jnp.asarray(0.03 * rng.standard_normal((mesh.n_nodes, 3)))
    scatter = NodeScatter.build(np.asarray(mesh.conn), mesh.n_nodes)

    K_dense, f_dense = assemble_dense(u, mesh.conn, geom, mat)
    op = make_operator(u, mesh.conn, geom, mat, scatter)
    np.testing.assert_allclose(op.f_int, f_dense, rtol=1e-13, atol=1e-13)

    v = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)))
    y_ref = (K_dense @ v.reshape(-1)).reshape(-1, 3)
    np.testing.assert_allclose(op.matvec(v), y_ref, rtol=1e-11, atol=1e-11)


def test_matfree_diag_matches_dense_diag(rng):
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    mat = NeoHookean(jnp.asarray(1.3), jnp.asarray(0.8))
    u = jnp.asarray(0.02 * rng.standard_normal((mesh.n_nodes, 3)))
    scatter = NodeScatter.build(np.asarray(mesh.conn), mesh.n_nodes)
    K_dense, _ = assemble_dense(u, mesh.conn, geom, mat)
    op = make_operator(u, mesh.conn, geom, mat, scatter)
    Kd = np.asarray(K_dense).reshape(mesh.n_nodes, 3, mesh.n_nodes, 3)
    diag_ref = np.stack([Kd[n, :, n, :] for n in range(mesh.n_nodes)])
    np.testing.assert_allclose(op.diag_blocks, diag_ref, rtol=1e-12, atol=1e-12)


def test_bcsr_block_diagonal(rng):
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    mat = StVenantKirchhoff(jnp.asarray(2.0), jnp.asarray(1.0))
    u = jnp.asarray(0.02 * rng.standard_normal((mesh.n_nodes, 3)))
    scatter = NodeScatter.build(np.asarray(mesh.conn), mesh.n_nodes)
    structure = BCSRStructure.build(np.asarray(mesh.conn), mesh.n_nodes)
    K, _ = assemble_bcsr(u, mesh.conn, geom, mat, structure, scatter)
    Kd = np.asarray(K.to_dense()).reshape(mesh.n_nodes, 3, mesh.n_nodes, 3)
    diag_ref = np.stack([Kd[n, :, n, :] for n in range(mesh.n_nodes)])
    np.testing.assert_allclose(K.block_diagonal(), diag_ref, rtol=1e-13, atol=1e-13)


def test_node_scatter_deterministic_and_correct(rng):
    conn = np.asarray(rng.integers(0, 50, size=(40, 4)), np.int32)
    scatter = NodeScatter.build(conn, 50)
    vals = jnp.asarray(rng.standard_normal((40, 4, 3)))
    out = scatter(vals)
    ref = np.zeros((50, 3))
    np.add.at(ref, conn.reshape(-1), np.asarray(vals).reshape(-1, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-13, atol=1e-13)
    # bitwise-identical on repeat (fixed reduction order)
    out2 = scatter(vals)
    assert np.array_equal(np.asarray(out), np.asarray(out2))


def test_masked_system_solution_matches_reduction(rng):
    """Masked dense system (bc.py) == free-DOF reduction (ambiguity A3)."""
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.linear import dense_cholesky_solve

    mesh = box_mesh(2, 2, 2, element_type="tet4")
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    mat = StVenantKirchhoff(jnp.asarray(2.0), jnp.asarray(1.0))
    u = jnp.zeros((mesh.n_nodes, 3))
    bc = DirichletBuilder(mesh).fix("zmin").build()

    K, _ = assemble_dense(u, mesh.conn, geom, mat)
    r = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)))
    r = bc.project(r)
    A, b = mask_dense_system(K, r, bc.free_mask)
    du = np.asarray(dense_cholesky_solve(A, b))

    free = np.asarray(bc.free_mask).reshape(-1) > 0.5
    Kn = np.asarray(K)
    du_red = np.linalg.solve(Kn[np.ix_(free, free)], np.asarray(r).reshape(-1)[free])
    full = np.zeros(3 * mesh.n_nodes)
    full[free] = du_red
    np.testing.assert_allclose(du, full, rtol=1e-10, atol=1e-12)
