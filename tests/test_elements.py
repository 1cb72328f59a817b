"""Unit tests for shape functions and quadrature (SURVEY.md §5.2-5.3, §6)."""

from math import factorial

import numpy as np
import pytest

from fea_large_tpu.elements import get_element
from fea_large_tpu.elements.reference import (
    TET10_EDGES,
    tet4_shape,
    tet4_shape_grad,
    tet10_shape,
    tet10_shape_grad,
    tet_quadrature,
)

VERTS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
TET10_NODES = np.concatenate(
    [VERTS, np.array([(VERTS[i] + VERTS[j]) / 2 for i, j in TET10_EDGES])]
)


def _interior_points(rng, n=64):
    xi = rng.random((n, 3))
    return xi / (xi.sum(-1, keepdims=True) + 1.0)


@pytest.mark.parametrize(
    "shape,nodes",
    [(tet4_shape, VERTS), (tet10_shape, TET10_NODES)],
    ids=["tet4", "tet10"],
)
def test_partition_of_unity(shape, nodes, rng):
    xi = _interior_points(rng)
    assert np.abs(shape(xi).sum(-1) - 1.0).max() < 1e-12


@pytest.mark.parametrize(
    "shape,nodes",
    [(tet4_shape, VERTS), (tet10_shape, TET10_NODES)],
    ids=["tet4", "tet10"],
)
def test_kronecker_delta(shape, nodes):
    n = nodes.shape[0]
    assert np.abs(shape(nodes) - np.eye(n)).max() < 1e-12


@pytest.mark.parametrize(
    "shape,grad",
    [(tet4_shape, tet4_shape_grad), (tet10_shape, tet10_shape_grad)],
    ids=["tet4", "tet10"],
)
def test_shape_gradients_fd(shape, grad, rng):
    xi = _interior_points(rng, 16)
    g = grad(xi)
    eps = 1e-6
    for d in range(3):
        e = np.zeros(3)
        e[d] = eps
        fd = (shape(xi + e) - shape(xi - e)) / (2 * eps)
        assert np.abs(fd - g[..., d]).max() < 1e-8


def _exact_monomial(a, b, c):
    # int over ref tet of x^a y^b z^c = a! b! c! / (a+b+c+3)!
    return factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)


@pytest.mark.parametrize(
    "npts,degree",
    [(1, 1), (4, 2), (5, 3)],
    ids=["1pt-deg1", "4pt-deg2", "5pt-deg3"],
)
def test_quadrature_exactness(npts, degree):
    pts, wts = tet_quadrature(npts)
    assert abs(wts.sum() - 1.0 / 6.0) < 1e-15
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            for c in range(degree + 1 - a - b):
                val = float(np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c))
                assert abs(val - _exact_monomial(a, b, c)) < 1e-14, (a, b, c)


def test_element_factory_defaults():
    t4 = get_element("tet4")
    t10 = get_element("tet10")
    t10_5 = get_element("tet10", 5)
    assert (t4.n_nodes, t4.n_quad) == (4, 1)
    assert (t10.n_nodes, t10.n_quad) == (10, 4)  # degree-2 default (A2)
    assert t10_5.n_quad == 5
    assert t10.shape_grad.shape == (4, 10, 3)
    assert t4.n_dof == 12 and t10.n_dof == 30


def test_tet10_quadrature_sweep_consistency():
    """Survey ambiguity A2: the 4-pt (degree-2) and 5-pt (degree-3) TET10
    rules must give end-to-end solutions that agree to discretization
    accuracy (both rules shipped as config)."""
    import jax.numpy as jnp

    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.mesh.generators import box_mesh
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions
    import dataclasses

    mesh4 = box_mesh(2, 2, 2, element_type="tet10")
    mesh5 = dataclasses.replace(mesh4, n_quad=5)
    assert mesh5.element.n_quad == 5
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    us = {}
    for mesh, tag in [(mesh4, 4), (mesh5, 5)]:
        bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.1).build()
        res = NewtonSolver(
            mesh, mat, bc, options=SolverOptions(linear="direct", n_steps=1)
        ).solve()
        assert res.converged, tag
        us[tag] = np.asarray(res.u)
    diff = np.abs(us[4] - us[5]).max() / np.abs(us[4]).max()
    assert diff < 5e-3, diff  # same discrete space, different integration
    assert diff > 0.0  # the rules genuinely differ
