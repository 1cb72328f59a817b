"""Mesh model and generator tests (SURVEY.md C1, §6)."""

import jax
import jax.numpy as jnp
import numpy as np

from fea_large_tpu.elements.kernels import precompute_geometry
from fea_large_tpu.mesh import Mesh, box_mesh, tet4_to_tet10


def test_box_mesh_volume_tet4():
    m = box_mesh(3, 2, 2, 1.0, 0.5, 0.5)
    geom = precompute_geometry(m.coords, m.conn, m.element)
    assert abs(float(geom.detJxW.sum()) - 0.25) < 1e-12
    assert float(geom.detJxW.min()) > 0  # all positively oriented


def test_box_mesh_volume_tet10():
    m = box_mesh(2, 2, 2, element_type="tet10")
    geom = precompute_geometry(m.coords, m.conn, m.element)
    assert abs(float(geom.detJxW.sum()) - 1.0) < 1e-12
    assert float(geom.detJxW.min()) > 0


def test_box_mesh_counts():
    nx, ny, nz = 3, 2, 4
    m = box_mesh(nx, ny, nz)
    assert m.n_nodes == (nx + 1) * (ny + 1) * (nz + 1)
    assert m.n_elements == 5 * nx * ny * nz
    assert m.conn.dtype == jnp.int32


def test_face_node_sets():
    m = box_mesh(2, 2, 2)
    for name in ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax"):
        assert len(m.node_sets[name]) == 9  # 3x3 grid of face nodes
    coords = np.asarray(m.coords)
    assert np.all(coords[m.node_sets["xmax"], 0] == 1.0)


def test_tet10_midside_nodes_unique_and_shared():
    m4 = box_mesh(2, 1, 1)
    coords, conn = tet4_to_tet10(np.asarray(m4.coords), np.asarray(m4.conn))
    # no duplicated coordinates among inserted nodes
    uniq = np.unique(np.round(coords, 12), axis=0)
    assert uniq.shape[0] == coords.shape[0]
    # midside nodes: each is midpoint of its edge's endpoints
    for e in range(conn.shape[0]):
        from fea_large_tpu.elements.reference import TET10_EDGES

        for k, (i, j) in enumerate(TET10_EDGES):
            mid = (coords[conn[e, i]] + coords[conn[e, j]]) / 2
            assert np.allclose(coords[conn[e, 4 + k]], mid)


def test_mesh_is_pytree():
    m = box_mesh(1, 1, 1)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    assert len(leaves) == 2
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.element_type == "tet4"
    assert set(m2.node_sets) == set(m.node_sets)

    @jax.jit
    def f(mesh: Mesh):
        return mesh.coords.sum()

    f(m)  # must be jittable as an argument


def test_rcm_reorder_preserves_solution():
    """RCM renumbering (mesh/reorder.py; task option `mesh.reorder`) is a
    pure relabeling: the renumbered solve must produce the same nodal
    displacements up to the permutation, and node sets must follow."""
    import jax.numpy as jnp

    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.mesh.reorder import rcm_permutation, renumber_nodes
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh = box_mesh(2, 2, 2, element_type="tet10")
    perm = rcm_permutation(mesh)
    rmesh = renumber_nodes(mesh, perm)
    assert rmesh.n_nodes == mesh.n_nodes
    np.testing.assert_allclose(
        np.asarray(rmesh.coords)[perm], np.asarray(mesh.coords)
    )
    for k, ids in mesh.node_sets.items():
        assert np.array_equal(np.sort(perm[ids]), rmesh.node_sets[k])

    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    opts = SolverOptions(linear="direct", newton_rtol=1e-12)

    def solve(m):
        bc = (
            DirichletBuilder(m).fix("zmin").prescribe("zmax", "z", -0.08).build()
        )
        res = NewtonSolver(m, mat, bc, options=opts).solve()
        assert res.converged
        return np.asarray(res.u)

    u = solve(mesh)
    ur = solve(rmesh)
    scale = np.abs(u).max()
    np.testing.assert_allclose(ur[perm], u, rtol=0, atol=1e-11 * scale)
