"""Autodiff-material tests: energy-only definitions must yield consistent
stress and tangents (finite-difference verified) and solve end-to-end with
quadratic Newton convergence through the generic tangent path."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.elements.kernels import element_stiffness, precompute_geometry
from fea_large_tpu.materials.autodiff import MooneyRivlin
from fea_large_tpu.materials.base import make_material
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def _rand_C(rng):
    F = np.eye(3) + 0.1 * rng.standard_normal((3, 3))
    return jnp.asarray(F.T @ F)


def test_registry():
    m = make_material("mooney_rivlin", E=2.0, nu=0.3)
    assert isinstance(m, MooneyRivlin)


def test_pk2_is_energy_gradient_fd(rng):
    mat = MooneyRivlin(jnp.asarray(1.2), jnp.asarray(0.8))
    C = _rand_C(rng)
    S = np.asarray(mat.pk2(C))
    # FD of W wrt C (symmetric perturbations): dW = 1/2 S : dC
    h = 1e-6
    for i in range(3):
        for j in range(i, 3):
            dC = np.zeros((3, 3))
            dC[i, j] = dC[j, i] = h
            dW = float(mat.energy((C + dC)[None])[0] - mat.energy((C - dC)[None])[0])
            lhs = dW / (2 * h)
            rhs = 0.5 * (S * dC / h).sum()
            np.testing.assert_allclose(lhs, rhs, rtol=1e-6, atol=1e-9)


def test_tangent_is_stress_derivative_fd(rng):
    mat = MooneyRivlin(jnp.asarray(1.2), jnp.asarray(0.8))
    C = _rand_C(rng)
    X = rng.standard_normal((3, 3))
    Xs = jnp.asarray(0.5 * (X + X.T))
    Y = np.asarray(mat.tangent_apply(C, Xs))
    h = 1e-6
    dS = (np.asarray(mat.pk2(C + 2 * h * Xs)) - np.asarray(mat.pk2(C - 2 * h * Xs))) / (
        2 * h
    )
    np.testing.assert_allclose(Y, dS, rtol=1e-5, atol=1e-7)


def test_element_tangent_consistency_fd(rng):
    """Ke == dfe/du through the GENERIC (non-factored) tangent path."""
    from fea_large_tpu.elements.kernels import element_internal_force

    mesh = box_mesh(1, 1, 1, element_type="tet4")
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    mat = MooneyRivlin(jnp.asarray(1.0), jnp.asarray(0.6))
    assert mat.iso_tangent_factors(None, jnp.eye(3)[None, None]) is None
    u = jnp.asarray(0.03 * rng.standard_normal((mesh.n_nodes, 3)))
    ue = u[mesh.conn]
    Ke, fe = element_stiffness(ue, geom, mat)
    h = 1e-6
    for (a, i) in [(0, 0), (2, 1), (3, 2)]:
        du = jnp.zeros_like(ue).at[:, a, i].set(h)
        f_p = element_internal_force(ue + du, geom, mat)
        f_m = element_internal_force(ue - du, geom, mat)
        fd = np.asarray((f_p - f_m) / (2 * h))
        np.testing.assert_allclose(
            np.asarray(Ke[:, :, :, a, i]), fd, rtol=2e-5, atol=1e-7
        )


def test_mooney_rivlin_end_to_end():
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = MooneyRivlin(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.15).build()
    res = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(linear="direct", n_steps=2)
    ).solve()
    assert res.converged
    norms = res.history[-1].residual_norms
    assert len(norms) <= 8  # consistent (autodiff) tangent -> fast Newton
    u = np.asarray(res.u)
    assert u[:, 0].max() > 1e-3  # lateral bulge under compression
