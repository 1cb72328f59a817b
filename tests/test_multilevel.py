"""Two-level preconditioner tests (solvers/multilevel.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.multilevel import (
    CoarseSpace,
    aggregate_nodes,
    build_coarse_space,
)
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def test_aggregate_nodes_partition():
    mesh = box_mesh(4, 4, 4, element_type="tet4")
    agg = aggregate_nodes(mesh.coords_host, agg_size=16)
    assert agg.min() == 0
    n_agg = agg.max() + 1
    assert 2 <= n_agg <= mesh.n_nodes
    counts = np.bincount(agg)
    assert counts.min() >= 1


@pytest.mark.parametrize("modes", [3, 6, 12])
def test_transfer_operators_adjoint(modes, rng):
    """restrict must be the exact adjoint of prolong: <P^T r, xc> == <r, P xc>."""
    mesh = box_mesh(3, 3, 3, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").build()
    kw = {}
    if modes == 12:  # experimental basis: probing assembly only
        from fea_large_tpu.ops.soa import SoAProblem

        kw["soa"] = SoAProblem.build(mesh, jnp.float32)
    coarse = build_coarse_space(mesh, mat, bc, agg_size=16, modes=modes, **kw)
    r = jnp.asarray(rng.standard_normal((mesh.n_nodes, 3)), jnp.float32)
    xc = jnp.asarray(rng.standard_normal((coarse.n_agg, modes)), jnp.float32)
    lhs = float(jnp.vdot(coarse.restrict(r), xc))
    rhs = float(jnp.vdot(r, coarse.prolong(xc)))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0)


def test_rbm_coarse_matrix_matches_direct_galerkin(rng):
    """The factored RBM coarse assembly must equal the direct Galerkin
    triple product P^T (M K0 M) P with the explicit rigid-body-mode
    prolongator and the device-assembled tangent at u=0."""
    from fea_large_tpu.assembly.dense import assemble_dense
    from fea_large_tpu.elements.kernels import precompute_geometry
    from fea_large_tpu.solvers.multilevel import (
        _host_coarse_matrix_rbm,
    )

    mesh = box_mesh(3, 3, 3, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.3), jnp.asarray(0.7))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("xmax", "x", 0.1).build()
    N = mesh.n_nodes
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    u0 = jnp.zeros((N, 3), mesh.coords.dtype)
    K, _ = assemble_dense(u0, mesh.conn, geom, mat)
    K = np.asarray(K).reshape(3 * N, 3 * N)
    m = np.asarray(bc.free_mask).reshape(-1)
    K = K * m[:, None] * m[None, :]

    coords = mesh.coords_host
    agg = aggregate_nodes(coords, agg_size=12)
    n_agg = int(agg.max()) + 1
    cnt = np.bincount(agg, minlength=n_agg).astype(float)
    cent = np.stack(
        [np.bincount(agg, weights=coords[:, d], minlength=n_agg) / cnt
         for d in range(3)], axis=1,
    )
    # explicit prolongator: B_n = [I | cross-matrix(d_n)] with the
    # RMS-normalized rotational arms (multilevel._rbm_dvec)
    from fea_large_tpu.solvers.multilevel import _rbm_dvec

    dvec = _rbm_dvec(coords, agg, cent, n_agg)
    P = np.zeros((3 * N, 6 * n_agg))
    for n in range(N):
        A = agg[n]
        d = dvec[n]
        B = np.zeros((3, 6))
        B[0, 0] = B[1, 1] = B[2, 2] = 1.0
        B[1, 3], B[2, 3] = -d[2], d[1]
        B[0, 4], B[2, 4] = d[2], -d[0]
        B[0, 5], B[1, 5] = -d[1], d[0]
        P[3 * n : 3 * n + 3, 6 * A : 6 * A + 6] = B
    Ac_direct = P.T @ K @ P
    Ac_fact = _host_coarse_matrix_rbm(
        mesh, 1.3, 0.7, agg, dvec, n_agg, np.asarray(bc.free_mask)
    )
    np.testing.assert_allclose(Ac_fact, Ac_direct, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("modes", [3, 6])
def test_probing_coarse_matches_host(modes, rng):
    """The on-device graph-coloring probing assembly must reproduce the
    host sparse Galerkin product to f32 accuracy (the distance-2 coloring
    attribution is exact; only the arithmetic dtype differs)."""
    from fea_large_tpu.ops.soa import SoAProblem
    from fea_large_tpu.solvers.multilevel import (
        _device_coarse_matrix_probing,
        _host_coarse_matrix,
        _host_coarse_matrix_rbm,
    )

    mesh = box_mesh(4, 4, 4, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.3), jnp.asarray(0.7))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("xmax", "x", 0.1).build()
    coords = mesh.coords_host
    agg = aggregate_nodes(coords, agg_size=16)
    n_agg = int(agg.max()) + 1
    cnt = np.bincount(agg, minlength=n_agg).astype(float)
    cent = np.stack(
        [np.bincount(agg, weights=coords[:, d], minlength=n_agg) / cnt
         for d in range(3)], axis=1,
    )
    m = np.asarray(bc.free_mask)
    from fea_large_tpu.solvers.multilevel import _rbm_dvec

    dvec = _rbm_dvec(coords, agg, cent, n_agg) if modes == 6 else None
    if modes == 3:
        Ac_host = _host_coarse_matrix(mesh, 1.3, 0.7, agg, n_agg, m)
    else:
        Ac_host = _host_coarse_matrix_rbm(mesh, 1.3, 0.7, agg, dvec, n_agg, m)
    soa = SoAProblem.build(mesh, jnp.float32)
    mat32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), mat)
    Ac_dev = _device_coarse_matrix_probing(
        soa, mat32, bc.free_mask, coords, agg, dvec, n_agg, modes,
        mesh.conn_host,
    )
    scale = np.abs(Ac_host).max()
    np.testing.assert_allclose(Ac_dev, Ac_host, rtol=0, atol=2e-5 * scale)


def test_rbm_coarse_cuts_iterations():
    """modes=6 (rigid-body) coarse must converge to the same solution with
    fewer PCG iterations than the translation-only coarse at comparable
    coarse-space size."""
    mesh = box_mesh(12, 12, 12, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    u0 = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u0 = u0.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    def run(modes, agg):
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", preconditioner="two_level",
                agg_size=agg, coarse_modes=modes, pcg_tol=1e-6,
                newton_rtol=1e-9, max_newton=60,
            ),
        )
        res = solver.solve(u0=u0)
        assert res.converged, modes
        assert len(res.history) == 1
        return np.asarray(res.u), sum(sum(r.pcg_iters) for r in res.history)

    # same coarse DOF budget: 6 modes x (2x node aggregate size)
    u_t, it_t = run(3, 32)
    u_r, it_r = run(6, 64)
    scale = np.abs(u_t).max()
    np.testing.assert_allclose(u_r, u_t, rtol=0, atol=2e-7 * scale)
    assert it_r < it_t, (it_r, it_t)


def test_two_level_cuts_iterations_and_matches():
    """Mixed solver with the two-level preconditioner must converge to the
    same solution with fewer total PCG iterations than Jacobi (the gap
    grows with mesh size: Jacobi iteration counts are O(h^-1), the coarse
    correction caps the low-frequency modes)."""
    mesh = box_mesh(12, 12, 12, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    # smooth affine start: the raw BC-jump state has a genuinely indefinite
    # tangent (PCG breakdown -> bisection), which would make the iteration
    # comparison measure bisection luck instead of preconditioner quality
    u0 = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u0 = u0.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    def run(precond):
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", preconditioner=precond,
                agg_size=32, pcg_tol=1e-6, newton_rtol=1e-9, max_newton=60,
            ),
        )
        res = solver.solve(u0=u0)
        assert res.converged, precond
        assert len(res.history) == 1, precond  # no bisection: SPD throughout
        total_pcg = sum(sum(r.pcg_iters) for r in res.history)
        return np.asarray(res.u), total_pcg

    u_j, iters_j = run("jacobi")
    u_2l, iters_2l = run("two_level")
    scale = np.abs(u_j).max()
    np.testing.assert_allclose(u_2l, u_j, rtol=0, atol=2e-7 * scale)
    assert iters_2l < 0.75 * iters_j, (iters_2l, iters_j)


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_factored_coarse_matrix_matches_reference(element_type):
    """The factored (per-aggregate-sum) coarse assembly must equal the
    direct element-tangent assembly exactly."""
    from fea_large_tpu.solvers.multilevel import (
        _host_coarse_matrix,
        _host_coarse_matrix_reference,
        aggregate_nodes,
    )

    mesh = box_mesh(3, 3, 3, element_type=element_type)
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.1).build()
    agg = aggregate_nodes(mesh.coords_host, agg_size=12)
    n_agg = int(agg.max()) + 1
    m = np.asarray(bc.free_mask)
    A1 = _host_coarse_matrix(mesh, 1.3, 0.7, agg, n_agg, m)
    A2 = _host_coarse_matrix_reference(mesh, 1.3, 0.7, agg, n_agg, m)
    np.testing.assert_allclose(A1, A2, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("modes", [3, 6])
def test_component_first_applies_match_aos(modes, rng):
    """The component-first ([3, N]) coarse correction and block-Jacobi
    applies must agree with the production AoS forms (they are the
    measured-alternative bench subjects — BENCH_NOTES round-3 layout
    study; any drift would silently invalidate the comparison)."""
    from fea_large_tpu.solvers.linear import (
        apply_block_jacobi,
        apply_block_jacobi_T,
    )

    mesh = box_mesh(4, 4, 4, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").build()
    coarse = build_coarse_space(mesh, mat, bc, agg_size=16, modes=modes)
    N = mesh.n_nodes
    r = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    za = np.asarray(coarse.apply(r))
    zt = np.asarray(coarse.apply_T(r.T).T)
    scale = np.abs(za).max()
    np.testing.assert_allclose(zt, za, rtol=0, atol=1e-5 * scale)

    blocks = rng.standard_normal((N, 3, 3))
    inv_blocks = jnp.asarray(
        blocks @ blocks.transpose(0, 2, 1) + 3.0 * np.eye(3), jnp.float32
    )
    free = bc.free_mask.astype(jnp.float32)
    ja = np.asarray(apply_block_jacobi(inv_blocks, free, r))
    jt = np.asarray(apply_block_jacobi_T(inv_blocks, free.T, r.T).T)
    np.testing.assert_allclose(jt, ja, rtol=1e-5, atol=1e-6 * np.abs(ja).max())


def test_three_level_cuts_iterations_and_matches():
    """Three-level additive hierarchy: same solution, at most as many total
    PCG iterations as two-level on a mesh large enough to matter."""
    mesh = box_mesh(12, 12, 12, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    # smooth affine start — see test_two_level_cuts_iterations_and_matches
    u0 = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u0 = u0.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    def run(precond, agg):
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", preconditioner=precond,
                agg_size=agg, pcg_tol=1e-6, newton_rtol=1e-9, max_newton=60,
            ),
        )
        res = solver.solve(u0=u0)
        assert res.converged, precond
        assert len(res.history) == 1, precond
        return np.asarray(res.u), sum(sum(r.pcg_iters) for r in res.history)

    u_2l, it_2l = run("two_level", 32)
    u_3l, it_3l = run("three_level", 8)
    scale = np.abs(u_2l).max()
    np.testing.assert_allclose(u_3l, u_2l, rtol=0, atol=2e-7 * scale)
    assert it_3l <= 1.05 * it_2l, (it_3l, it_2l)


def test_probing_coarse_modes12_matches_direct_galerkin(rng):
    """The probed 12-mode (RBM + linear strain) coarse matrix must equal
    the direct Galerkin triple product P^T (M K0 M) P with the explicit
    [I | cross(d) | S(d)] prolongator and the dense tangent at u=0."""
    from fea_large_tpu.assembly.dense import assemble_dense
    from fea_large_tpu.elements.kernels import precompute_geometry
    from fea_large_tpu.ops.soa import SoAProblem
    from fea_large_tpu.solvers.multilevel import (
        _device_coarse_matrix_probing,
        _rbm_dvec,
    )

    mesh = box_mesh(3, 3, 3, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.3), jnp.asarray(0.7))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("xmax", "x", 0.1).build()
    N = mesh.n_nodes
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    u0 = jnp.zeros((N, 3), mesh.coords.dtype)
    K, _ = assemble_dense(u0, mesh.conn, geom, mat)
    K = np.asarray(K).reshape(3 * N, 3 * N)
    m = np.asarray(bc.free_mask).reshape(-1)
    K = K * m[:, None] * m[None, :]

    coords = mesh.coords_host
    agg = aggregate_nodes(coords, agg_size=12)
    n_agg = int(agg.max()) + 1
    cnt = np.bincount(agg, minlength=n_agg).astype(float)
    cent = np.stack(
        [np.bincount(agg, weights=coords[:, d], minlength=n_agg) / cnt
         for d in range(3)], axis=1,
    )
    dvec = _rbm_dvec(coords, agg, cent, n_agg)
    P = np.zeros((3 * N, 12 * n_agg))
    for n in range(N):
        A = agg[n]
        d = dvec[n]
        B = np.zeros((3, 12))
        B[0, 0] = B[1, 1] = B[2, 2] = 1.0
        B[1, 3], B[2, 3] = -d[2], d[1]
        B[0, 4], B[2, 4] = d[2], -d[0]
        B[0, 5], B[1, 5] = -d[1], d[0]
        B[0, 6], B[1, 7], B[2, 8] = d[0], d[1], d[2]
        B[0, 9], B[1, 9] = d[1], d[0]
        B[0, 10], B[2, 10] = d[2], d[0]
        B[1, 11], B[2, 11] = d[2], d[1]
        P[3 * n : 3 * n + 3, 12 * A : 12 * A + 12] = B
    Ac_direct = P.T @ K @ P

    soa = SoAProblem.build(mesh, jnp.float32)
    mat32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), mat)
    Ac_probed = np.asarray(
        _device_coarse_matrix_probing(
            soa, mat32, bc.free_mask, coords, agg, dvec, n_agg, 12,
            mesh.conn_host,
        )
    )
    scale = np.abs(Ac_direct).max()
    np.testing.assert_allclose(
        Ac_probed, Ac_direct, rtol=0, atol=3e-5 * scale
    )


def test_modes12_solves_and_needs_no_more_iterations_than_rbm():
    """The 12-mode coarse space CONTAINS the 6-mode RBM space on the same
    aggregates, so at equal agg_size the mixed solve must converge to the
    same solution with at most as many total PCG iterations."""
    mesh = box_mesh(10, 10, 10, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    u0 = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u0 = u0.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    def run(modes):
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", preconditioner="two_level",
                agg_size=48, coarse_modes=modes, pcg_tol=1e-6,
                newton_rtol=1e-9, max_newton=60,
            ),
        )
        res = solver.solve(u0=u0)
        assert res.converged, modes
        total_pcg = sum(sum(r.pcg_iters) for r in res.history)
        return np.asarray(res.u), total_pcg

    u_6, it_6 = run(6)
    u_12, it_12 = run(12)
    scale = np.abs(u_6).max()
    np.testing.assert_allclose(u_12, u_6, rtol=0, atol=2e-7 * scale)
    assert it_12 <= it_6, (it_12, it_6)


def test_host_invert_fallback_matches_device(monkeypatch):
    """`_host_invert_coarse` (the setup fallback when the on-device
    explicit-inverse build exhausts HBM — BENCH_NOTES round 3) must
    produce the same coarse correction as the device build: same ridge,
    same symmetric Gram form, f32 LAPACK vs f32 XLA."""
    from fea_large_tpu.ops.soa import SoAProblem

    mesh = box_mesh(3, 3, 3, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    soa = SoAProblem.build(mesh, jnp.float32)
    dev = build_coarse_space(mesh, mat, bc, agg_size=16, modes=6, soa=soa)
    monkeypatch.setenv("FEA_COARSE_INVERT", "host")
    host = build_coarse_space(mesh, mat, bc, agg_size=16, modes=6, soa=soa)
    # both are f32 inverses of the same mildly-conditioned SPD matrix:
    # entrywise agreement to f32 rounding x a small conditioning factor
    a, b = np.asarray(dev.acinv), np.asarray(host.acinv)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < 5e-5 * scale
    # and the applied correction agrees on a vector
    r = jnp.asarray(
        np.random.default_rng(0).standard_normal((mesh.n_nodes, 3)),
        jnp.float32,
    )
    ya, yb = np.asarray(dev.apply(r)), np.asarray(host.apply(r))
    assert np.abs(ya - yb).max() < 1e-4 * max(np.abs(ya).max(), 1e-30)
