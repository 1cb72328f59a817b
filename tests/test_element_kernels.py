"""Element-kernel tests (SURVEY.md §5.5, §6): the consistent tangent equals
the autodiff Jacobian of the internal force, is symmetric, and diagonal-block
extraction matches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fea_large_tpu.elements import get_element
from fea_large_tpu.elements.reference import TET10_EDGES
from fea_large_tpu.elements.kernels import (
    deformation_gradient,
    element_diag_blocks,
    element_internal_force,
    element_stiffness,
    precompute_geometry,
)
from fea_large_tpu.materials import make_material

CASES = [
    ("tet4", "svk"),
    ("tet4", "neo_hookean"),
    ("tet10", "svk"),
    ("tet10", "neo_hookean"),
]


def _random_element(rng, ename):
    V = rng.random((4, 3))
    if np.linalg.det(V[1:] - V[0]) < 0:
        V[[1, 2]] = V[[2, 1]]
    if ename == "tet4":
        return V
    mids = np.array([(V[i] + V[j]) / 2 for i, j in TET10_EDGES])
    mids += 0.01 * rng.random((6, 3))
    return np.concatenate([V, mids])


@pytest.fixture(params=CASES, ids=[f"{e}-{m}" for e, m in CASES])
def setup(request, rng):
    ename, mname = request.param
    elem = get_element(ename)
    mat = make_material(mname, lam=2.0, mu=1.3)
    coords = jnp.asarray(_random_element(rng, ename))
    conn = jnp.arange(elem.n_nodes, dtype=jnp.int32)[None, :]
    geom = precompute_geometry(coords, conn, elem)
    assert float(geom.detJxW.sum()) > 0
    ue = jnp.asarray(0.05 * rng.random((1, elem.n_nodes, 3)))
    return elem, mat, geom, ue


def test_tangent_is_force_jacobian(setup):
    elem, mat, geom, ue = setup
    npe = elem.n_nodes
    Ke, fe = element_stiffness(ue, geom, mat)
    fe2 = element_internal_force(ue, geom, mat)
    assert float(jnp.abs(fe - fe2).max()) < 1e-13
    J = jax.jacobian(lambda u: element_internal_force(u, geom, mat))(ue)
    Kad = J[0, :, :, 0, :, :].reshape(npe * 3, npe * 3)
    Kflat = Ke.reshape(npe * 3, npe * 3)
    rel = float(jnp.abs(Kflat - Kad).max() / jnp.abs(Kad).max())
    assert rel < 1e-12


def test_tangent_symmetry(setup):
    elem, mat, geom, ue = setup
    n = elem.n_dof
    Ke, _ = element_stiffness(ue, geom, mat)
    Kflat = Ke.reshape(n, n)
    assert float(jnp.abs(Kflat - Kflat.T).max() / jnp.abs(Kflat).max()) < 1e-13


def test_diag_blocks_match_tangent(setup):
    elem, mat, geom, ue = setup
    Ke, _ = element_stiffness(ue, geom, mat)
    db = element_diag_blocks(ue, geom, mat)[0]
    dd = jnp.stack([Ke[0, a, :, a, :] for a in range(elem.n_nodes)])
    assert float(jnp.abs(db - dd).max()) < 1e-12


def test_zero_displacement_zero_force(setup):
    elem, mat, geom, _ = setup
    ue = jnp.zeros((1, elem.n_nodes, 3), jnp.float64)
    fe = element_internal_force(ue, geom, mat)
    assert float(jnp.abs(fe).max()) < 1e-14


def test_rigid_translation_zero_force(setup):
    elem, mat, geom, _ = setup
    ue = jnp.broadcast_to(
        jnp.asarray([0.3, -0.1, 0.2], jnp.float64), (1, elem.n_nodes, 3)
    )
    fe = element_internal_force(ue, geom, mat)
    assert float(jnp.abs(fe).max()) < 1e-13


def test_deformation_gradient_identity(setup):
    elem, _, geom, _ = setup
    ue = jnp.zeros((1, elem.n_nodes, 3), jnp.float64)
    F = deformation_gradient(ue, geom.gradN)
    assert float(jnp.abs(F - jnp.eye(3)).max()) < 1e-14


def test_uniform_stretch_deformation_gradient(rng):
    """Affine displacement u = (A - I) X must reproduce F = A exactly."""
    elem = get_element("tet10")
    coords = jnp.asarray(_random_element(rng, "tet10"))
    conn = jnp.arange(10, dtype=jnp.int32)[None, :]
    geom = precompute_geometry(coords, conn, elem)
    A = jnp.asarray(np.eye(3) + 0.1 * rng.random((3, 3)))
    ue = (coords @ (A - jnp.eye(3)).T)[None]
    F = deformation_gradient(ue, geom.gradN)
    assert float(jnp.abs(F - A).max()) < 1e-12
