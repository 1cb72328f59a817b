"""Pallas element-kernel tests (interpret mode on CPU — SURVEY.md §6;
the f32 Pallas path is diffed against the XLA SoA path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import NeoHookean, StVenantKirchhoff
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.ops.pallas_kernels import soa_apply_tangent_pallas
from fea_large_tpu.ops.soa import SoAProblem, soa_apply_tangent, soa_freeze


@pytest.mark.parametrize(
    "element_type,mat_cls",
    [("tet4", StVenantKirchhoff), ("tet10", NeoHookean)],
)
def test_pallas_apply_matches_soa(element_type, mat_cls, rng):
    mesh = box_mesh(2, 2, 2, element_type=element_type)
    mat = mat_cls(jnp.asarray(1.1, jnp.float32), jnp.asarray(0.8, jnp.float32))
    soa = SoAProblem.build(mesh, jnp.float32)
    u_T = jnp.asarray(
        0.03 * rng.standard_normal((mesh.n_nodes, 3)), jnp.float32
    ).T
    v_T = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32).T

    state = soa_freeze(soa, mat, u_T)
    y_ref = soa_apply_tangent(soa, state, v_T)
    y_pal = soa_apply_tangent_pallas(soa, state, v_T, block_e=128)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


def test_pallas_apply_nondivisible_block(rng):
    """Element count not a multiple of the block size (padding path)."""
    mesh = box_mesh(3, 1, 1, element_type="tet4")  # 15 elements
    mat = StVenantKirchhoff(jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32))
    soa = SoAProblem.build(mesh, jnp.float32)
    u_T = jnp.zeros((3, mesh.n_nodes), jnp.float32)
    v_T = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32).T
    state = soa_freeze(soa, mat, u_T)
    y_ref = soa_apply_tangent(soa, state, v_T)
    y_pal = soa_apply_tangent_pallas(soa, state, v_T, block_e=8)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize(
    "element_type,mat_cls",
    [
        ("tet4", StVenantKirchhoff),
        ("tet10", NeoHookean),
        ("tet4", "volumetric"),
    ],
)
def test_pallas_freeze_matches_soa(element_type, mat_cls, rng):
    """Fused Pallas kinematics+constitutive freeze == XLA SoA freeze for
    every registered material kind."""
    from fea_large_tpu.materials.neo_hookean import NeoHookeanVolumetric
    from fea_large_tpu.ops.pallas_kernels import soa_freeze_pallas

    if mat_cls == "volumetric":
        mat_cls = NeoHookeanVolumetric
    mesh = box_mesh(2, 2, 2, element_type=element_type)
    mat = mat_cls(jnp.asarray(1.1, jnp.float32), jnp.asarray(0.8, jnp.float32))
    soa = SoAProblem.build(mesh, jnp.float32)
    u_T = jnp.asarray(
        0.03 * rng.standard_normal((mesh.n_nodes, 3)), jnp.float32
    ).T
    ref = soa_freeze(soa, mat, u_T)
    pal = soa_freeze_pallas(soa, mat, u_T, block_e=64)
    for name in ("F", "S", "A", "alpha", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(pal, name)),
            np.asarray(getattr(ref, name)),
            rtol=3e-6, atol=3e-6, err_msg=name,
        )


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_pallas_internal_force_matches_soa(element_type, rng):
    from fea_large_tpu.ops.pallas_kernels import soa_internal_force_pallas
    from fea_large_tpu.ops.soa import soa_internal_force

    mesh = box_mesh(2, 2, 2, element_type=element_type)
    mat = NeoHookean(jnp.asarray(1.1, jnp.float32), jnp.asarray(0.8, jnp.float32))
    soa = SoAProblem.build(mesh, jnp.float32)
    u_T = jnp.asarray(
        0.03 * rng.standard_normal((mesh.n_nodes, 3)), jnp.float32
    ).T
    state = soa_freeze(soa, mat, u_T)
    f_ref = soa_internal_force(soa, state)
    f_pal = soa_internal_force_pallas(soa, state, block_e=64)
    np.testing.assert_allclose(
        np.asarray(f_pal), np.asarray(f_ref), rtol=2e-5, atol=2e-5
    )


def test_pallas_solver_end_to_end(rng):
    """NewtonSolver(pallas=True) reaches the same solution as the XLA SoA
    mixed path (the production wiring, VERDICT round-1 item 2)."""
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.08).build()
    kw = dict(
        linear="pcg", precision="mixed", preconditioner="jacobi",
        newton_rtol=1e-9, pcg_tol=1e-6, pcg_maxiter=400,
    )
    res_ref = NewtonSolver(mesh, mat, bc, options=SolverOptions(**kw)).solve()
    res_pal = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(pallas=True, **kw)
    ).solve()
    assert res_ref.converged and res_pal.converged
    np.testing.assert_allclose(
        np.asarray(res_pal.u), np.asarray(res_ref.u), rtol=0, atol=5e-8
    )


def test_pallas_requires_mixed():
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh = box_mesh(1, 1, 1, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").build()
    with pytest.raises(ValueError, match="pallas"):
        NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(pallas=True, precision="f64"),
        )


def test_pallas_bcsr_spmv_matches_xla(rng):
    """Pallas BCSR SpMV == BCSRMatrix.matvec (SURVEY.md C10)."""
    from fea_large_tpu.assembly.bcsr import BCSRStructure, assemble_bcsr
    from fea_large_tpu.assembly.scatter import NodeScatter
    from fea_large_tpu.elements.kernels import precompute_geometry
    from fea_large_tpu.ops.pallas_kernels import bcsr_spmv_pallas

    mesh = box_mesh(3, 2, 2, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(1.2), jnp.asarray(0.8))
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    scatter = NodeScatter.build(mesh.conn_host, mesh.n_nodes)
    structure = BCSRStructure.build(mesh.conn_host, mesh.n_nodes)
    u = jnp.asarray(0.03 * rng.standard_normal((mesh.n_nodes, 3)))
    K, _ = assemble_bcsr(u, mesh.conn, geom, mat, structure, scatter)
    v = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)))
    y_ref = K.matvec(v)
    y_pal = bcsr_spmv_pallas(K, v, block_k=256)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=1e-12, atol=1e-12
    )
