"""End-to-end displacement parity vs the NumPy oracle (SURVEY.md §6,
BASELINE.json:5: nodal displacements within 1e-8 relative).

The oracle (tests/oracle/) is a deliberately naive loop-style implementation
of the same total-Lagrangian spec; the TPU solver must reproduce its
converged displacement field to 1e-8 relative on the driver's config-style
problems.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import NeoHookean, StVenantKirchhoff
from fea_large_tpu.bc import DirichletBuilder, nodal_forces
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

from tests.oracle import oracle


def _bc_arrays(mesh, bc):
    fixed_mask = np.asarray(bc.free_mask) == 0.0
    fixed_vals = np.asarray(bc.values)
    return fixed_mask, fixed_vals


def _rel_err(u, u_ref):
    u, u_ref = np.asarray(u), np.asarray(u_ref)
    return np.linalg.norm(u - u_ref) / max(np.linalg.norm(u_ref), 1e-300)


@pytest.mark.parametrize("linear", ["direct", "pcg"])
def test_parity_uniaxial_tension_tet4_svk(linear):
    """Config 1 (BASELINE.json:7): uniaxial tension, SVK, TET4."""
    mesh = box_mesh(3, 2, 2, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(1.2), jnp.asarray(0.8))
    bc = (
        DirichletBuilder(mesh)
        .prescribe("zmin", "z", 0.0)
        .prescribe("zmax", "z", 0.25)
        .fix("xmin", "x")
        .fix("ymin", "y")
        .build()
    )
    solver = NewtonSolver(
        mesh,
        mat,
        bc,
        options=SolverOptions(linear=linear, n_steps=1, pcg_tol=1e-13),
    )
    res = solver.solve()
    assert res.converged

    fixed_mask, fixed_vals = _bc_arrays(mesh, bc)
    u_ref, _ = oracle.solve(
        np.asarray(mesh.coords),
        np.asarray(mesh.conn),
        "tet4",
        "svk",
        1.2,
        0.8,
        fixed_mask,
        fixed_vals,
        n_steps=1,
    )
    assert _rel_err(res.u, u_ref) < 1e-8


def test_parity_block_compression_tet10_nh():
    """Config 2 (BASELINE.json:8): neo-Hookean block compression, TET10,
    Jacobi-PCG."""
    mesh = box_mesh(2, 2, 2, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = (
        DirichletBuilder(mesh)
        .fix("zmin")
        .prescribe("zmax", "z", -0.2)
        .build()
    )
    solver = NewtonSolver(
        mesh,
        mat,
        bc,
        options=SolverOptions(linear="pcg_bcsr", n_steps=2, pcg_tol=1e-13),
    )
    res = solver.solve()
    assert res.converged

    fixed_mask, fixed_vals = _bc_arrays(mesh, bc)
    u_ref, _ = oracle.solve(
        np.asarray(mesh.coords),
        np.asarray(mesh.conn),
        "tet10",
        "neo_hookean",
        1.0,
        0.6,
        fixed_mask,
        fixed_vals,
        n_steps=2,
    )
    assert _rel_err(res.u, u_ref) < 1e-8


def test_parity_beam_bending_multistep():
    """Config 3 (BASELINE.json:9): multi-load-step beam bending with
    convergence tracking, force-driven."""
    mesh = box_mesh(4, 1, 1, lx=4.0, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(20.0), jnp.asarray(10.0))
    bc = DirichletBuilder(mesh).fix("xmin").build()
    f = nodal_forces(mesh, {"xmax": [0.0, 0.0, -0.05]})
    solver = NewtonSolver(
        mesh, mat, bc, f_ext=f, options=SolverOptions(linear="direct", n_steps=3)
    )
    res = solver.solve()
    assert res.converged
    assert len(res.history) == 3

    fixed_mask, fixed_vals = _bc_arrays(mesh, bc)
    u_ref, hist_ref = oracle.solve(
        np.asarray(mesh.coords),
        np.asarray(mesh.conn),
        "tet4",
        "svk",
        20.0,
        10.0,
        fixed_mask,
        fixed_vals,
        f_ext=np.asarray(f),
        n_steps=3,
    )
    assert _rel_err(res.u, u_ref) < 1e-8
    # convergence tracking parity: same number of load steps recorded
    assert len(hist_ref) == len(res.history)


@pytest.mark.slow
def test_parity_config1_scale_1k_elements():
    """Config 1 at the stated ~1k-TET4 scale with the dense direct solve."""
    mesh = box_mesh(6, 6, 6, element_type="tet4")  # 1080 elements
    assert mesh.n_elements >= 1000
    mat = StVenantKirchhoff(jnp.asarray(1.2, jnp.float64), jnp.asarray(0.8))
    bc = (
        DirichletBuilder(mesh)
        .fix("zmin")
        .prescribe("zmax", "z", 0.2)
        .build()
    )
    solver = NewtonSolver(mesh, mat, bc, options=SolverOptions(linear="direct"))
    res = solver.solve()
    assert res.converged

    fixed_mask, fixed_vals = _bc_arrays(mesh, bc)
    u_ref, _ = oracle.solve(
        np.asarray(mesh.coords),
        np.asarray(mesh.conn),
        "tet4",
        "svk",
        1.2,
        0.8,
        fixed_mask,
        fixed_vals,
        n_steps=1,
    )
    assert _rel_err(res.u, u_ref) < 1e-8


def test_parity_tet10_5pt_quadrature():
    """Ambiguity A2 sweep (SURVEY.md §5.7): the 5-pt degree-3 TET10 rule
    must also match the oracle run with the same rule to 1e-8."""
    import dataclasses

    mesh = dataclasses.replace(
        box_mesh(2, 2, 2, element_type="tet10"), n_quad=5
    )
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.15).build()
    res = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(linear="direct", n_steps=1)
    ).solve()
    assert res.converged

    fixed_mask, fixed_vals = _bc_arrays(mesh, bc)
    u_ref, _ = oracle.solve(
        np.asarray(mesh.coords),
        np.asarray(mesh.conn),
        "tet10",
        "neo_hookean",
        1.0,
        0.6,
        fixed_mask,
        fixed_vals,
        n_steps=1,
        n_quad=5,
    )
    assert _rel_err(res.u, u_ref) < 1e-8
