"""Method-of-manufactured-solutions convergence tests (SURVEY.md §6
"cross-check of the oracle itself"): on a smooth manufactured displacement
field, the discrete solution must converge at O(h^2) for TET4 and O(h^3)
for TET10 in the displacement L2 norm. This validates discretization order
independently of the oracle (so oracle parity is not 'the same wrong code
twice')."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import StVenantKirchhoff
from fea_large_tpu.bc import DirichletBC
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

LAM, MU = 1.2, 0.8
AMP = 0.02  # keep strains small-ish but finite (still a nonlinear solve)


def u_star(X):
    """Smooth manufactured displacement (cubic — outside both FE spaces)."""
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    return AMP * np.stack(
        [x * x * y + z * z * z, y * y * z + x * y * z, z * z * x + y * y * y],
        axis=-1,
    )


def grad_u_star(X):
    """Analytic grad of u_star: G[i, J] = du_i/dX_J."""
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    zero = np.zeros_like(x)
    G = np.stack(
        [
            np.stack([2 * x * y, x * x, 3 * z * z], axis=-1),
            np.stack([y * z, 2 * y * z + x * z, y * y + x * y], axis=-1),
            np.stack([z * z, 3 * y * y, 2 * z * x], axis=-1),
        ],
        axis=-2,
    )
    return AMP * G


def pk1(X):
    """P = F S for SVK at the manufactured field (analytic F)."""
    G = grad_u_star(X)
    F = np.eye(3) + G
    C = np.swapaxes(F, -1, -2) @ F
    E = 0.5 * (C - np.eye(3))
    trE = np.trace(E, axis1=-2, axis2=-1)
    S = LAM * trE[..., None, None] * np.eye(3) + 2 * MU * E
    return F @ S


def body_force(X, h=1e-6):
    """f_b = -Div P via high-order central differences of the analytic P
    (FD error ~1e-12, far below discretization error)."""
    f = np.zeros_like(X)
    for J in range(3):
        dX = np.zeros(3)
        dX[J] = h
        dP = (pk1(X + dX) - pk1(X - dX)) / (2 * h)
        f -= dP[..., :, J]
    return f


def _solve_mms(n, element_type):
    mesh = box_mesh(n, n, n, element_type=element_type)
    coords = mesh.coords_host
    conn = mesh.conn_host
    elem = mesh.element

    # Dirichlet: u* on every boundary node
    lo, hi = coords.min(0), coords.max(0)
    on_bdry = np.any((coords < lo + 1e-12) | (coords > hi - 1e-12), axis=1)
    free = np.ones((mesh.n_nodes, 3))
    free[on_bdry] = 0.0
    vals = np.zeros((mesh.n_nodes, 3))
    vals[on_bdry] = u_star(coords[on_bdry])
    bc = DirichletBC(jnp.asarray(free), jnp.asarray(vals))

    # consistent nodal body-force load: fe[a] = sum_q w_q detJ N_a f_b(X_q)
    N = np.asarray(elem.shape)  # [q, npe]
    dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
    w = np.asarray(elem.quad_weights)
    Xe = coords[conn]  # [E, npe, 3]
    J = np.einsum("eai,qaj->eqij", Xe, dN)
    detJ = np.linalg.det(J)  # [E, q]
    Xq = np.einsum("qa,eai->eqi", N, Xe)  # [E, q, 3]
    fb = body_force(Xq.reshape(-1, 3)).reshape(Xq.shape)
    fe = np.einsum("eq,q,qa,eqi->eai", detJ, w, N, fb)
    f_ext = np.zeros((mesh.n_nodes, 3))
    np.add.at(f_ext, conn.reshape(-1), fe.reshape(-1, 3))

    solver = NewtonSolver(
        mesh,
        StVenantKirchhoff(jnp.asarray(LAM), jnp.asarray(MU)),
        bc,
        f_ext=jnp.asarray(f_ext),
        options=SolverOptions(
            linear="pcg_bcsr", n_steps=1, newton_rtol=1e-12, pcg_tol=1e-13
        ),
    )
    res = solver.solve()
    assert res.converged

    # L2 displacement error via quadrature
    err_nodal = np.asarray(res.u) - u_star(coords)
    ee = err_nodal[conn]  # [E, npe, 3]
    eq = np.einsum("qa,eai->eqi", N, ee)
    l2 = np.sqrt(np.einsum("eq,q,eqi,eqi->", detJ, w, eq, eq))
    return l2


@pytest.mark.slow
@pytest.mark.parametrize(
    "element_type,expected_rate", [("tet4", 2.0), ("tet10", 3.0)]
)
def test_mms_convergence_rate(element_type, expected_rate):
    sizes = [4, 8, 16] if element_type == "tet4" else [2, 4]
    errors = [_solve_mms(n, element_type) for n in sizes]
    rates = [
        np.log2(errors[i] / errors[i + 1]) for i in range(len(errors) - 1)
    ]
    # observed rate must be within 0.4 of the theoretical order
    assert rates[-1] > expected_rate - 0.4, (errors, rates)
