"""Stress-recovery tests (SURVEY.md C16): under a HOMOGENEOUS deformation
u = (A - I) X the recovered quad-point and nodal stresses must equal the
analytic S(A^T A) and sigma = J^-1 A S A^T exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import NeoHookean, StVenantKirchhoff
from fea_large_tpu.elements.kernels import precompute_geometry
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.postprocess import nodal_stress, quad_point_stress, von_mises


@pytest.mark.parametrize(
    "element_type,mat_cls",
    [("tet4", StVenantKirchhoff), ("tet10", NeoHookean)],
)
def test_homogeneous_deformation_stress(element_type, mat_cls):
    mesh = box_mesh(2, 2, 2, element_type=element_type)
    mat = mat_cls(jnp.asarray(1.3), jnp.asarray(0.7))
    A = jnp.asarray([[1.08, 0.02, 0.0], [0.0, 0.97, 0.01], [0.0, 0.0, 1.03]])
    u = mesh.coords @ (A - jnp.eye(3)).T

    C = A.T @ A
    S_ref = np.asarray(mat.pk2(C))
    J = float(jnp.linalg.det(A))
    sigma_ref = np.asarray(A @ S_ref @ A.T) / J

    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    S, sigma, Jq = quad_point_stress(u, mesh.conn, geom, mat)
    np.testing.assert_allclose(
        np.asarray(S), np.broadcast_to(S_ref, S.shape), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sigma), np.broadcast_to(sigma_ref, sigma.shape),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(Jq), np.full(Jq.shape, J), rtol=1e-12)

    sig_n, vm = nodal_stress(mesh, mat, u)
    np.testing.assert_allclose(
        np.asarray(sig_n), np.broadcast_to(sigma_ref, sig_n.shape),
        rtol=1e-11, atol=1e-12,
    )
    # von Mises of the analytic tensor
    dev = sigma_ref - np.trace(sigma_ref) / 3 * np.eye(3)
    vm_ref = np.sqrt(1.5 * np.sum(dev * dev))
    np.testing.assert_allclose(np.asarray(vm), vm_ref, rtol=1e-11)


def test_von_mises_pure_shear():
    tau = 2.5
    sigma = jnp.asarray([[0.0, tau, 0.0], [tau, 0.0, 0.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(von_mises(sigma)), np.sqrt(3.0) * tau, rtol=1e-12)
