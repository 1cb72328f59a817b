"""SoA (element-axis-last) kernel tests: must reproduce the AoS f64
reference kernels to f32 accuracy (SURVEY.md §6 — the performance path is
diffed against the parity path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import NeoHookean, NeoHookeanVolumetric, StVenantKirchhoff
from fea_large_tpu.assembly.matfree import TangentState, apply_tangent
from fea_large_tpu.assembly.scatter import NodeScatter
from fea_large_tpu.elements.kernels import element_diag_blocks, precompute_geometry
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.ops.soa import (
    SoAProblem,
    soa_apply_tangent,
    soa_diag_blocks,
    soa_freeze,
    soa_internal_force,
)


def _setup(element_type, mat_cls, rng):
    mesh = box_mesh(2, 2, 2, element_type=element_type)
    mat = mat_cls(jnp.asarray(1.3), jnp.asarray(0.7))
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    scatter = NodeScatter.build(mesh.conn_host, mesh.n_nodes)
    u = jnp.asarray(0.04 * rng.standard_normal((mesh.n_nodes, 3)))
    soa = SoAProblem.build(mesh, jnp.float64)  # f64 so the diff is tight
    return mesh, mat, geom, scatter, u, soa


@pytest.mark.parametrize(
    "element_type,mat_cls",
    [("tet4", StVenantKirchhoff), ("tet4", NeoHookean),
     ("tet4", NeoHookeanVolumetric),
     ("tet10", StVenantKirchhoff), ("tet10", NeoHookean),
     ("tet10", NeoHookeanVolumetric)],
)
def test_soa_matches_aos(element_type, mat_cls, rng):
    mesh, mat, geom, scatter, u, soa = _setup(element_type, mat_cls, rng)

    state_ref, fe_ref = TangentState.freeze(u, mesh.conn, geom, mat)
    f_ref = scatter(fe_ref)
    state = soa_freeze(soa, mat, u.T)
    f_soa = soa_internal_force(soa, state).T
    np.testing.assert_allclose(f_soa, f_ref, rtol=1e-12, atol=1e-12)

    v = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)))
    y_ref = apply_tangent(state_ref, v, mesh.conn, geom, mat, scatter)
    y_soa = soa_apply_tangent(soa, state, v.T).T
    np.testing.assert_allclose(y_soa, y_ref, rtol=1e-11, atol=1e-11)

    diag_ref = scatter(element_diag_blocks(u[mesh.conn], geom, mat))
    diag_soa = jnp.transpose(soa_diag_blocks(soa, state), (2, 0, 1))
    np.testing.assert_allclose(diag_soa, diag_ref, rtol=1e-11, atol=1e-11)


def test_soa_f32_accuracy(rng):
    """The f32 SoA path must agree with f64 AoS to f32 roundoff levels."""
    mesh = box_mesh(2, 2, 2, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    scatter = NodeScatter.build(mesh.conn_host, mesh.n_nodes)
    u = jnp.asarray(0.04 * rng.standard_normal((mesh.n_nodes, 3)))
    soa = SoAProblem.build(mesh, jnp.float32)
    mat32 = NeoHookean(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32))

    state_ref, fe_ref = TangentState.freeze(u, mesh.conn, geom, mat)
    f_ref = np.asarray(scatter(fe_ref))
    state = soa_freeze(soa, mat32, u.astype(jnp.float32).T)
    f_soa = np.asarray(soa_internal_force(soa, state).T)
    scale = np.abs(f_ref).max()
    assert np.abs(f_soa - f_ref).max() < 2e-5 * scale
