"""Surface-load tests: boundary extraction, consistent tractions, pressure.

Validation ladder (SURVEY.md §6 style): exact geometric identities first
(face counts, outward orientation, total-force = traction x area, the
classic TRI6 corner-zero/mid-third consistent-load distribution, closed-
surface pressure balance), then an oracle parity solve and a small-strain
physics check against the analytic Young's modulus.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fea_large_tpu import NeoHookean, StVenantKirchhoff
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.mesh.surface import (
    boundary_faces,
    face_area_normals,
    pressure_forces,
    traction_forces,
)


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_boundary_face_count_and_orientation(etype):
    mesh = box_mesh(2, 2, 2, element_type=etype)
    faces = boundary_faces(mesh)
    # 2x2x2 box: 6 cube faces x 4 squares x 2 triangles = 48 boundary tris
    assert faces.shape == (48, 3 if etype == "tet4" else 6)
    coords = np.asarray(mesh.coords_host)
    dA, n = face_area_normals(coords, faces)
    # total boundary area of the unit cube
    assert abs(dA.sum() - 6.0) < 1e-12
    # outward orientation: normal . (face centroid - cube center) > 0
    cen = coords[faces[:, :3]].mean(axis=1) - 0.5  # [F, 3]
    dots = np.einsum("fk,fqk->fq", cen, n)
    assert (dots > 0).all()


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_traction_total_force(etype):
    mesh = box_mesh(3, 2, 2, lx=3.0, element_type=etype)
    t = [0.3, -0.2, 1.7]
    f = np.asarray(traction_forces(mesh, {"zmax": t}))
    # zmax face has reference area lx*ly = 3.0
    np.testing.assert_allclose(f.sum(axis=0), 3.0 * np.asarray(t), rtol=1e-13)
    # forces live only on zmax nodes
    on = np.zeros(mesh.n_nodes, bool)
    on[np.asarray(mesh.node_sets["zmax"])] = True
    assert np.abs(f[~on]).max() == 0.0


def test_tri6_consistent_load_distribution():
    """Flat TRI6 under constant traction: corners get ZERO, mid-edges get
    A/3 each — the classic quadratic consistent-load result that any naive
    per-node lumping gets wrong."""
    mesh = box_mesh(1, 1, 1, element_type="tet10")
    f = np.asarray(traction_forces(mesh, {"zmax": [0.0, 0.0, 1.0]}))
    coords = np.asarray(mesh.coords_host)
    top = coords[:, 2] > 1 - 1e-9
    fz = f[:, 2]
    # corner nodes of the unit square face
    corner = top & (
        (np.isin(coords[:, 0], (0.0, 1.0))) & (np.isin(coords[:, 1], (0.0, 1.0)))
    )
    assert np.abs(fz[corner]).max() < 1e-14
    # every loaded node is a mid-edge node; total = area = 1, each face
    # contributes A_face/3 per mid-edge node
    np.testing.assert_allclose(fz.sum(), 1.0, rtol=1e-14)
    assert (fz[top & ~corner] > 0).all()


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_pressure_closed_surface_balance(etype):
    """Uniform dead pressure over the ENTIRE closed boundary: the resultant
    force vanishes (divergence theorem) and the zmax patch alone carries
    -p * A * z_hat."""
    mesh = box_mesh(2, 2, 2, element_type=etype)
    all_nodes = np.arange(mesh.n_nodes, dtype=np.int32)
    mesh = mesh.with_node_sets(all=all_nodes)
    f = np.asarray(pressure_forces(mesh, {"all": 2.5}))
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-12)
    f_top = np.asarray(pressure_forces(mesh, {"zmax": 2.5}))
    np.testing.assert_allclose(
        f_top.sum(axis=0), [0.0, 0.0, -2.5], atol=1e-12
    )


def test_traction_matches_pressure_on_flat_face():
    """On the flat zmax face, pressure p equals traction -p*z_hat."""
    mesh = box_mesh(2, 2, 1, element_type="tet10")
    fp = np.asarray(pressure_forces(mesh, {"zmax": 0.7}))
    ft = np.asarray(traction_forces(mesh, {"zmax": [0.0, 0.0, -0.7]}))
    np.testing.assert_allclose(fp, ft, atol=1e-14)


def test_traction_unknown_or_empty_set_raises():
    mesh = box_mesh(1, 1, 1)
    with pytest.raises(KeyError):
        traction_forces(mesh, {"nope": [1.0, 0.0, 0.0]})
    # a set with too few nodes to cover any face
    mesh = mesh.with_node_sets(lonely=np.array([0], np.int32))
    with pytest.raises(ValueError):
        traction_forces(mesh, {"lonely": [1.0, 0.0, 0.0]})


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_traction_solve_matches_oracle(etype):
    """End-to-end: traction-loaded block, TPU solver vs the independent
    loop-style oracle on the SAME consistent f_ext (1e-8 parity bar)."""
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions
    from tests.oracle.oracle import solve as oracle_solve

    mesh = box_mesh(2, 2, 2, element_type=etype)
    mat = StVenantKirchhoff(jnp.asarray(1.2), jnp.asarray(0.8))
    bc = DirichletBuilder(mesh).fix("zmin").build()
    f_ext = traction_forces(mesh, {"zmax": [0.05, 0.0, -0.12]})
    solver = NewtonSolver(
        mesh, mat, bc, f_ext=f_ext,
        options=SolverOptions(
            linear="direct" if etype == "tet4" else "pcg",
            pcg_tol=1e-13, newton_rtol=1e-12,
        ),
    )
    res = solver.solve()
    assert res.converged
    fixed_mask = np.asarray(bc.free_mask) == 0.0
    fixed_vals = np.asarray(bc.values)
    u_ref, _hist = oracle_solve(
        np.asarray(mesh.coords), np.asarray(mesh.conn), etype, "svk",
        1.2, 0.8, fixed_mask, fixed_vals,
        f_ext=np.asarray(f_ext), n_steps=1,
    )
    err = np.linalg.norm(np.asarray(res.u) - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-8, err


def test_traction_small_strain_physics():
    """Uniaxial stress via rollers + top traction: mean top displacement
    matches the analytic small-strain answer u_z = t * h / E with
    E = mu(3 lam + 2 mu)/(lam + mu), to the nonlinear correction O(t/E)."""
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    lam, mu = 1.0, 0.6
    E = mu * (3 * lam + 2 * mu) / (lam + mu)
    t = 1e-4  # small enough that the finite-strain correction is ~t/E
    mesh = box_mesh(3, 3, 3, element_type="tet10")
    bc = (
        DirichletBuilder(mesh)
        .prescribe("zmin", "z", 0.0)
        .prescribe("xmin", "x", 0.0)
        .prescribe("ymin", "y", 0.0)
        .build()
    )
    f_ext = traction_forces(mesh, {"zmax": [0.0, 0.0, t]})
    solver = NewtonSolver(
        mesh, NeoHookean(jnp.asarray(lam), jnp.asarray(mu)), bc, f_ext=f_ext,
        options=SolverOptions(linear="pcg", pcg_tol=1e-12, newton_rtol=1e-10),
    )
    res = solver.solve()
    assert res.converged
    top = np.asarray(mesh.node_sets["zmax"])
    uz = float(np.asarray(res.u)[top, 2].mean())
    expect = t / E  # h = 1
    assert abs(uz - expect) / expect < 5e-3, (uz, expect)


def test_task_schema_tractions(tmp_path):
    """Task-file route: tractions + pressures parse, integrate, and sum."""
    import json

    from fea_large_tpu.io.task import load_task

    spec = {
        "mesh": {"box": {"nx": 2, "ny": 2, "nz": 2}},
        "element_type": "tet4",
        "material": {"model": "svk", "lambda": 1.0, "mu": 0.5},
        "loading": {
            "n_steps": 1,
            "dirichlet": [{"set": "zmin"}],
            "tractions": [{"set": "zmax", "vector": [0.0, 0.0, -0.3]}],
            "pressures": [{"set": "xmax", "value": 0.2}],
        },
    }
    p = tmp_path / "t.json"
    p.write_text(json.dumps(spec))
    task = load_task(p)
    f = np.asarray(task.build_forces())
    # zmax traction resultant + xmax pressure resultant
    np.testing.assert_allclose(
        f.sum(axis=0), [-0.2, 0.0, -0.3], atol=1e-12
    )


# ---- body forces (volume dead loads; bc.body_forces) ----------------------


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_body_force_total_resultant(etype):
    """Partition of unity => the consistent body-force resultant is exactly
    b * V_total, independent of element type and mesh grading."""
    from fea_large_tpu.bc import body_forces

    mesh = box_mesh(3, 2, 2, lx=2.0, ly=1.0, lz=3.0, element_type=etype)
    b = [0.4, -0.2, -1.1]
    f = np.asarray(body_forces(mesh, b))
    np.testing.assert_allclose(
        f.sum(axis=0), np.asarray(b) * (2.0 * 1.0 * 3.0), rtol=1e-13
    )


def test_body_force_single_tet_analytic():
    """Exact per-node fractions on one straight-edged tet: TET4 nodes get
    b*V/4; TET10 vertices get -b*V/20 and mid-edges b*V/5 (the classic
    quadratic consistent-load table: int N_vert dV = -V/20,
    int N_mid dV = V/5)."""
    from fea_large_tpu.bc import body_forces
    from fea_large_tpu.mesh.core import Mesh

    X4 = np.array(
        [[0.0, 0, 0], [2.0, 0, 0], [0.0, 1.5, 0], [0.0, 0, 1.0]]
    )
    V = abs(np.linalg.det(X4[1:] - X4[0])) / 6.0
    b = np.array([0.3, 0.7, -0.5])

    m4 = Mesh.create(X4, np.arange(4)[None, :], "tet4")
    f4 = np.asarray(body_forces(m4, b))
    np.testing.assert_allclose(f4, np.tile(b * V / 4.0, (4, 1)), rtol=1e-13)

    from fea_large_tpu.elements.reference import TET10_EDGES

    mids = np.array([(X4[i] + X4[j]) / 2.0 for i, j in TET10_EDGES])
    X10 = np.vstack([X4, mids])
    m10 = Mesh.create(X10, np.arange(10)[None, :], "tet10")
    f10 = np.asarray(body_forces(m10, b))
    expect = np.vstack(
        [np.tile(-b * V / 20.0, (4, 1)), np.tile(b * V / 5.0, (6, 1))]
    )
    np.testing.assert_allclose(f10, expect, rtol=1e-12, atol=1e-15)


def test_body_force_small_strain_physics():
    """Hanging column under self-weight in CONFINED (uniaxial-strain)
    conditions — rollers on all four side faces, clamped-z top, free
    bottom: the exact small-strain solution u_z = -rho g (h^2 - z^2)/(2M)
    with M = lam + 2 mu is purely quadratic in z, so TET10 represents it
    exactly and the only residual error is the O(g/M) finite-strain
    correction."""
    from fea_large_tpu.bc import body_forces
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    lam, mu = 1.0, 0.6
    M = lam + 2 * mu
    g = 1e-4  # small enough that finite-strain corrections are ~g/M
    mesh = box_mesh(2, 2, 4, lz=1.0, element_type="tet10")
    bc = (
        DirichletBuilder(mesh)
        .prescribe("zmax", "z", 0.0)
        .prescribe("xmin", "x", 0.0)
        .prescribe("xmax", "x", 0.0)
        .prescribe("ymin", "y", 0.0)
        .prescribe("ymax", "y", 0.0)
        .build()
    )
    f_ext = body_forces(mesh, [0.0, 0.0, -g])
    solver = NewtonSolver(
        mesh, NeoHookean(jnp.asarray(lam), jnp.asarray(mu)), bc,
        f_ext=f_ext,
        options=SolverOptions(linear="pcg", pcg_tol=1e-12, newton_rtol=1e-10),
    )
    res = solver.solve()
    assert res.converged
    bot = np.asarray(mesh.node_sets["zmin"])
    uz = float(np.asarray(res.u)[bot, 2].mean())
    expect = -g * 1.0**2 / (2.0 * M)
    assert abs(uz - expect) / abs(expect) < 1e-3, (uz, expect)


def test_task_schema_body_force(tmp_path):
    """Task-file route: body_force parses and integrates to b*V."""
    import json

    from fea_large_tpu.io.task import load_task

    spec = {
        "mesh": {"box": {"nx": 2, "ny": 2, "nz": 2}},
        "element_type": "tet10",
        "material": {"model": "neo_hookean", "lambda": 1.0, "mu": 0.5},
        "loading": {
            "n_steps": 1,
            "dirichlet": [{"set": "zmin"}],
            "body_force": [0.0, 0.1, -0.9],
        },
    }
    p = tmp_path / "t.json"
    p.write_text(json.dumps(spec))
    task = load_task(p)
    f = np.asarray(task.build_forces())
    np.testing.assert_allclose(f.sum(axis=0), [0.0, 0.1, -0.9], atol=1e-13)
