"""Structured slab partition (dist/structured.py): host-side invariants.

The distributed structured fast path stands on three host-verifiable
facts: (1) slab ownership is a partition of the global nodes, (2) the
local class-grid connectivity realizes exactly the global elements of the
slab, and (3) the halo relation is precisely "left plane of shard p ==
right plane of shard p-1" so a single plane ppermute is a complete
exchange. These tests pin all three against the general global mesh."""

import numpy as np
import pytest

from fea_large_tpu.dist.structured import (
    add_right_planes,
    left_planes,
    right_planes,
    set_left_planes,
    structured_partition,
)
from fea_large_tpu.mesh.generators import box_mesh_kuhn
from fea_large_tpu.mesh.structure import structure_conn


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_ownership_partitions_nodes(element_type):
    from fea_large_tpu.mesh.structure import class_coords

    mesh = box_mesh_kuhn(8, 3, 2, element_type=element_type)
    sp = structured_partition(mesh.structure, 4)
    counts = np.zeros(mesh.n_nodes)
    for p in range(4):
        np.add.at(counts, sp.local_to_global[p], sp.own_mask[p])
    assert (counts == 1.0).all()  # every node owned exactly once
    # local_to_global maps each local grid node onto the global node at
    # the same physical point: local coords + slab x-offset == global
    coords = mesh.coords_host
    h = 1.0 / 8  # unit box, 8 x-cells
    local_xyz = class_coords(
        sp.local, lx=sp.cells_per_shard * h, ly=1.0, lz=1.0
    )
    for p in range(4):
        shifted = local_xyz + np.array([p * sp.cells_per_shard * h, 0, 0])
        np.testing.assert_allclose(
            coords[sp.local_to_global[p]], shifted, atol=1e-12
        )


def test_from_to_global_roundtrip():
    mesh = box_mesh_kuhn(6, 2, 2, element_type="tet10")
    sp = structured_partition(mesh.structure, 3)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(mesh.n_nodes, 3))
    loc = sp.from_global(x)
    assert loc.shape == (3, sp.n_local, 3)
    np.testing.assert_array_equal(sp.to_global(loc), x)


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_local_conn_realizes_global_elements(element_type):
    mesh = box_mesh_kuhn(4, 2, 3, element_type=element_type)
    sp = structured_partition(mesh.structure, 2)
    conn_g = mesh.conn_host.astype(np.int64)
    conn_l = structure_conn(sp.local)  # [El, npe] in local node space
    eg = sp.elem_global()
    for p in range(2):
        np.testing.assert_array_equal(
            sp.local_to_global[p][conn_l], conn_g[eg[p]]
        )
    # elements partition exactly: no repeats, full coverage
    allg = np.sort(eg.ravel())
    np.testing.assert_array_equal(allg, np.arange(mesh.n_elements))


def test_halo_is_exactly_the_neighbor_plane():
    mesh = box_mesh_kuhn(8, 2, 2, element_type="tet10")
    sp = structured_partition(mesh.structure, 4)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(mesh.n_nodes, 3))
    loc = sp.from_global(x)
    for p in range(1, 4):
        lp = np.asarray(left_planes(sp, loc[p]))
        rp = np.asarray(right_planes(sp, loc[p - 1]))
        np.testing.assert_array_equal(lp, rp)
    # halo slots are exactly the unowned slots
    for p in range(4):
        halo = np.zeros(sp.n_local, bool)
        got = np.asarray(left_planes(sp, np.arange(sp.n_local)[:, None]))
        if p > 0:
            halo[got[:, 0].astype(int)] = True
        np.testing.assert_array_equal(sp.own_mask[p] == 0.0, halo)


def test_plane_set_and_add_are_inverse_slices():
    mesh = box_mesh_kuhn(4, 3, 2, element_type="tet10")
    sp = structured_partition(mesh.structure, 2)
    rng = np.random.default_rng(2)
    v = rng.normal(size=(sp.n_local, 3))
    pl = rng.normal(size=(sp.plane_size, 3))
    out = np.asarray(set_left_planes(sp, v, pl))
    np.testing.assert_array_equal(np.asarray(left_planes(sp, out)), pl)
    # untouched everywhere else
    mask = np.ones(sp.n_local, bool)
    idx = np.asarray(
        left_planes(sp, np.arange(sp.n_local)[:, None])
    )[:, 0].astype(int)
    mask[idx] = False
    np.testing.assert_array_equal(out[mask], v[mask])

    out2 = np.asarray(add_right_planes(sp, v, pl))
    ridx = np.asarray(
        right_planes(sp, np.arange(sp.n_local)[:, None])
    )[:, 0].astype(int)
    expect = v.copy()
    expect[ridx] += pl
    np.testing.assert_allclose(out2, expect)


def test_indivisible_cell_count_rejected():
    mesh = box_mesh_kuhn(6, 2, 2, element_type="tet4")
    with pytest.raises(ValueError):
        structured_partition(mesh.structure, 4)


# ---------------------------------------------------------------------------
# end-to-end structured-sharded parity (8-virtual-device CPU mesh)
# ---------------------------------------------------------------------------

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fea_large_tpu import NeoHookean, StVenantKirchhoff  # noqa: E402
from fea_large_tpu.bc import DirichletBuilder  # noqa: E402
from fea_large_tpu.dist.sharded import ShardedNewtonSolver  # noqa: E402
from fea_large_tpu.dist.structured_solver import (  # noqa: E402
    StructuredShardedSolver,
    make_sharded_solver,
    structured_shardable,
)
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions  # noqa: E402


def _devices(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return devs[:n]


@pytest.mark.parametrize("n_shards", [2, 4])
def test_structured_sharded_matches_single_device_tet4(n_shards):
    devs = _devices(n_shards)
    mesh = box_mesh_kuhn(4, 2, 2, lx=4.0, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(1.0), jnp.asarray(1.0))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", 0.2).build()
    opts = SolverOptions(linear="pcg", n_steps=1, pcg_tol=1e-13)

    ref = NewtonSolver(mesh, mat, bc, options=opts).solve()
    assert ref.converged
    sharded = StructuredShardedSolver(mesh, mat, bc, options=opts, devices=devs)
    res = sharded.solve()
    assert res.converged
    u = sharded.u_global(res.u)
    scale = np.abs(np.asarray(ref.u)).max()
    np.testing.assert_allclose(u, np.asarray(ref.u), rtol=0, atol=1e-10 * scale)


def test_structured_sharded_tet10_nh_two_level():
    """TET10 neo-Hookean with the RBM two-level coarse — the full config-5
    program matrix on the structured exchange."""
    devs = _devices(4)
    mesh = box_mesh_kuhn(4, 2, 2, lx=4.0, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", -0.1).build()
    opts = SolverOptions(
        linear="pcg", n_steps=2, pcg_tol=1e-13,
        preconditioner="two_level", agg_size=16, coarse_modes=6,
    )
    ref = NewtonSolver(mesh, mat, bc, options=opts).solve()
    assert ref.converged
    sharded = StructuredShardedSolver(mesh, mat, bc, options=opts, devices=devs)
    res = sharded.solve()
    assert res.converged
    u = sharded.u_global(res.u)
    scale = np.abs(np.asarray(ref.u)).max()
    np.testing.assert_allclose(u, np.asarray(ref.u), rtol=0, atol=1e-10 * scale)


def test_structured_sharded_matches_general_sharded():
    """The two sharded paths (indexed halo maps vs boundary-plane
    ppermute) solve the same problem to the same displacements."""
    devs = _devices(4)
    mesh = box_mesh_kuhn(4, 2, 2, lx=4.0, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.08).build()
    opts = SolverOptions(linear="pcg", n_steps=1, pcg_tol=1e-13)
    a = StructuredShardedSolver(mesh, mat, bc, options=opts, devices=devs)
    b = ShardedNewtonSolver(mesh, mat, bc, options=opts, devices=devs)
    ra, rb = a.solve(), b.solve()
    assert ra.converged and rb.converged
    ua, ub = a.u_global(ra.u), b.u_global(rb.u)
    scale = np.abs(ub).max()
    np.testing.assert_allclose(ua, ub, rtol=0, atol=1e-10 * scale)


def test_structured_sharded_deterministic_repeat():
    devs = _devices(4)
    mesh = box_mesh_kuhn(4, 2, 2, lx=4.0, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(1.0), jnp.asarray(1.0))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", 0.15).build()
    opts = SolverOptions(linear="pcg", n_steps=1, pcg_tol=1e-13)
    s1 = StructuredShardedSolver(mesh, mat, bc, options=opts, devices=devs).solve()
    s2 = StructuredShardedSolver(mesh, mat, bc, options=opts, devices=devs).solve()
    np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(s2.u))


def test_buckled_beam_breakdown_fallback_converges():
    """The r03 failure configuration as a passing named test (VERDICT r04
    item 2): the 16x2x2 Kuhn beam at 5% axial compression is past its
    Euler threshold (tangent min-eig -2.3e-4, measured by dense assembly),
    and the RBM two-level coarse aims CG at the negative bending mode — the
    f64 solve breaks down at rel ~2e-6. The two-level -> jacobi fallback
    (ShardedNewtonSolver._newton) must catch the breakdown and Newton must
    still converge (to the unstable symmetric equilibrium: the residual is
    orthogonal to the bending mode, so jacobi-CG never excites it)."""
    devs = _devices(8)
    mesh = box_mesh_kuhn(16, 2, 2, lx=4.0, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", -0.05).build()
    solver = StructuredShardedSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", precision="f64", preconditioner="two_level",
            agg_size=32, coarse_modes=6, pcg_tol=1e-8, pcg_maxiter=600,
        ),
        devices=devs,
    )
    coords = np.asarray(mesh.coords_host)
    u_aff = np.zeros((mesh.n_nodes, 3))
    u_aff[:, 0] = -0.05 * coords[:, 0] / coords[:, 0].max()
    u_new, ok, rec = solver._newton(solver.u_from_global(u_aff), 1.0)
    assert ok, f"Newton did not converge: norms={rec.residual_norms}"
    assert solver.precond_fallbacks >= 1, (
        "expected the two-level CG breakdown to trigger the jacobi fallback"
    )
    # the converged state is a genuine equilibrium of the FULL residual
    norm = float(
        solver._residual_norm(solver.data, solver.soa, u_new, jnp.asarray(1.0))
    )
    assert norm <= 1e-9


@pytest.mark.slow
def test_buckled_beam_full_solve_completes():
    """Full incremental `.solve()` through the buckling threshold must
    terminate with a structured SolveResult (converged, or a loud
    not-converged after bisection exhaustion) — never an exception
    (SURVEY.md §7.3 failure-detection contract)."""
    devs = _devices(8)
    mesh = box_mesh_kuhn(16, 2, 2, lx=4.0, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", -0.05).build()
    solver = StructuredShardedSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", precision="f64", preconditioner="two_level",
            agg_size=32, coarse_modes=6, pcg_tol=1e-8, pcg_maxiter=600,
            n_steps=2,
        ),
        devices=devs,
    )
    res = solver.solve()
    assert res.history, "solve returned no increment records"
    # pin the KNOWN-GOOD outcome (round-5 VERDICT weak 4): today the
    # solve CONVERGES via the two-level -> jacobi breakdown fallback; a
    # regression that silently exhausts bisection instead must fail here,
    # not hide behind an `if res.converged` guard
    assert res.converged, (
        f"buckled-beam solve regressed to non-convergence: "
        f"{[r.residual_norms for r in res.history]}"
    )
    assert solver.precond_fallbacks >= 1, (
        "expected the two-level CG breakdown fallback on the way through "
        "the buckling threshold"
    )
    norm = float(
        solver._residual_norm(
            solver.data, solver.soa, res.u, jnp.asarray(1.0)
        )
    )
    assert norm <= 1e-8 * max(1.0, res.history[0].residual_norms[0])


def test_factory_routes_by_structure():
    from fea_large_tpu.mesh.generators import box_mesh

    devs = _devices(4)
    mat = StVenantKirchhoff(jnp.asarray(1.0), jnp.asarray(1.0))
    opts = SolverOptions(linear="pcg", pcg_tol=1e-12)
    km = box_mesh_kuhn(4, 2, 2, element_type="tet4")
    bc = DirichletBuilder(km).fix("zmin").prescribe("zmax", "z", 0.05).build()
    s = make_sharded_solver(km, mat, bc, options=opts, devices=devs)
    assert isinstance(s, StructuredShardedSolver)
    # indivisible x cell count -> general path
    km6 = box_mesh_kuhn(6, 2, 2, element_type="tet4")
    assert not structured_shardable(km6, 4)
    bc6 = DirichletBuilder(km6).fix("zmin").prescribe("zmax", "z", 0.05).build()
    s6 = make_sharded_solver(km6, mat, bc6, options=opts, devices=devs)
    assert type(s6) is ShardedNewtonSolver
    # unstructured mesh -> general path
    um = box_mesh(4, 2, 2, element_type="tet4")
    bcu = DirichletBuilder(um).fix("zmin").prescribe("zmax", "z", 0.05).build()
    su = make_sharded_solver(um, mat, bcu, options=opts, devices=devs)
    assert type(su) is ShardedNewtonSolver
