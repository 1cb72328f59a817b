"""Structured-box fast path (mesh/structure.py + ops/soa.py structured
gather/scatter): mesh validity, exact equivalence with the general indexed
path, and end-to-end solver agreement.

The structured path exists because indexed gathers/scatters are the
measured per-iteration floor on TPU (BENCH_NOTES); on box_mesh_kuhn meshes
the same math runs as static slices / padded adds. These tests pin that
the two implementations are the SAME operator.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh_kuhn
from fea_large_tpu.ops import soa as S


def _strip_structure(mesh):
    """The same mesh routed through the general indexed path."""
    mg = dataclasses.replace(mesh, structure=None)
    object.__setattr__(mg, "_conn_host", mesh.conn_host)
    object.__setattr__(mg, "_coords_host", mesh.coords_host)
    return mg


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_kuhn_mesh_valid(etype):
    """Positive orientations, exact volume fill, conforming faces, and the
    class-lattice node count (n+1)^3 + mid-edge classes."""
    nx, ny, nz = 3, 2, 4
    m = box_mesh_kuhn(nx, ny, nz, lx=1.5, ly=0.9, lz=2.2, element_type=etype)
    assert m.n_elements == 6 * nx * ny * nz
    X = np.asarray(m.coords_host)[np.asarray(m.conn_host)[:, :4]]
    dets = np.linalg.det(X[:, 1:4] - X[:, :1])
    assert (dets > 0).all()
    np.testing.assert_allclose(dets.sum() / 6.0, 1.5 * 0.9 * 2.2, rtol=1e-13)
    # conforming: every face is on the boundary or shared by exactly 2 tets
    from fea_large_tpu.mesh.surface import TET_FACES

    conn = m.conn_host[:, :4]
    faces = np.sort(conn[:, np.asarray(TET_FACES)].reshape(-1, 3), axis=1)
    _, counts = np.unique(faces, axis=0, return_counts=True)
    assert set(counts.tolist()) == {1, 2}
    corners = (nx + 1) * (ny + 1) * (nz + 1)
    if etype == "tet4":
        assert m.n_nodes == corners
    else:
        mids = (
            nx * (ny + 1) * (nz + 1)
            + (nx + 1) * ny * (nz + 1)
            + (nx + 1) * (ny + 1) * nz
            + nx * ny * (nz + 1)
            + nx * (ny + 1) * nz
            + (nx + 1) * ny * nz
            + nx * ny * nz
        )
        assert m.n_nodes == corners + mids


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_structured_gather_scatter_match_indexed(etype):
    """soa_gather is bitwise equal to the conn_T gather; the padded-add
    scatter equals the segment-sum scatter to f64 roundoff (different but
    both deterministic summation orders)."""
    m = box_mesh_kuhn(3, 2, 4, element_type=etype)
    p = S.SoAProblem.build(m, jnp.float64)
    assert p.structure is not None and p.buckets is None
    q = S.SoAProblem.build(_strip_structure(m), jnp.float64)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((3, m.n_nodes)))
    gs, gg = S.soa_gather(p, v), S.soa_gather(q, v)
    for i in range(3):
        for a in range(p.conn_T.shape[0]):
            np.testing.assert_array_equal(
                np.asarray(gs[i][a]), np.asarray(gg[i][a])
            )
    npe = p.conn_T.shape[0]
    ch = [
        [jnp.asarray(rng.standard_normal(m.n_elements)) for _ in range(npe)]
        for _ in range(3)
    ]
    np.testing.assert_allclose(
        np.asarray(S.soa_scatter_channels(p, ch)),
        np.asarray(S.soa_scatter_channels(q, ch)),
        rtol=1e-13,
        atol=1e-13,
    )


@pytest.mark.parametrize("etype", ["tet4", "tet10"])
def test_structured_element_ops_match(etype):
    """freeze + internal force + tangent action + diag blocks agree with
    the general path to f64 roundoff on a random deformed state."""
    m = box_mesh_kuhn(2, 3, 2, element_type=etype)
    p = S.SoAProblem.build(m, jnp.float64)
    q = S.SoAProblem.build(_strip_structure(m), jnp.float64)
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    rng = np.random.default_rng(1)
    u = jnp.asarray(0.03 * rng.standard_normal((3, m.n_nodes)))
    v = jnp.asarray(rng.standard_normal((3, m.n_nodes)))
    sts, stg = S.soa_freeze(p, mat, u), S.soa_freeze(q, mat, u)
    np.testing.assert_allclose(
        np.asarray(S.soa_internal_force(p, sts)),
        np.asarray(S.soa_internal_force(q, stg)),
        rtol=1e-12, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(S.soa_apply_tangent(p, sts, v)),
        np.asarray(S.soa_apply_tangent(q, stg, v)),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(S.soa_diag_blocks(p, sts)),
        np.asarray(S.soa_diag_blocks(q, stg)),
        rtol=1e-11, atol=1e-12,
    )


def test_structured_solve_matches_general():
    """Full mixed-precision two-level solve on the Kuhn mesh, structured
    vs general path: same converged displacements.

    Since round 4 the structured path builds a DIFFERENT (lattice-block
    pooled) coarse space than the generic coordinate-binned one, so the
    two solves follow different inexact-Newton trajectories toward the
    same fixed point — agreement is bounded by the newton_rtol=1e-8
    residual contract (measured 1.4e-7 relative u), not by arithmetic
    identity as in rounds 1-3. The trajectory-identical comparison lives
    in the jacobi run below (same preconditioner on both paths)."""
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh = box_mesh_kuhn(4, 4, 4, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))

    def solve(m, precond):
        bc = (
            DirichletBuilder(m)
            .fix("zmin")
            .prescribe("zmax", "z", -0.08)
            .build()
        )
        s = NewtonSolver(
            m, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", preconditioner=precond,
                coarse_modes=6, forcing="ew", ew_eta_min=1e-2,
                newton_rtol=1e-8, pcg_tol=1e-6, pcg_maxiter=2000,
            ),
        )
        res = s.solve()
        assert res.converged
        return np.asarray(res.u)

    u_s = solve(mesh, "two_level")
    u_g = solve(_strip_structure(mesh), "two_level")
    err = np.linalg.norm(u_s - u_g) / np.linalg.norm(u_g)
    assert err < 1e-6, err
    # jacobi: identical preconditioner on both paths -> same trajectory,
    # tight agreement (the round-1-3 form of this test)
    u_sj = solve(mesh, "jacobi")
    u_gj = solve(_strip_structure(mesh), "jacobi")
    errj = np.linalg.norm(u_sj - u_gj) / np.linalg.norm(u_gj)
    assert errj < 1e-8, errj


def test_structured_oracle_parity():
    """f64 parity bar (SURVEY.md B:5) holds on the structured mesh: the
    TPU-path solve matches the independent scipy oracle to 1e-8."""
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions
    from tests.oracle import oracle

    mesh = box_mesh_kuhn(2, 2, 2, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = (
        DirichletBuilder(mesh)
        .fix("zmin")
        .prescribe("zmax", "z", -0.1)
        .build()
    )
    s = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(linear="pcg", pcg_tol=1e-13, newton_rtol=1e-11),
    )
    res = s.solve()
    assert res.converged
    fixed_mask = np.asarray(bc.free_mask) == 0.0
    fixed_vals = np.asarray(bc.values)
    u_ref, _ = oracle.solve(
        np.asarray(mesh.coords_host),
        np.asarray(mesh.conn_host),
        "tet10",
        "neo_hookean",
        1.0,
        0.6,
        fixed_mask,
        fixed_vals,
        n_steps=1,
    )
    err = np.linalg.norm(np.asarray(res.u) - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-8, err
