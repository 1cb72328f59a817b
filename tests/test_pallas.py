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
