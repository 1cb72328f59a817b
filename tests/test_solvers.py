"""Linear and nonlinear solver tests (SURVEY.md §6)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu import NeoHookean, StVenantKirchhoff
from fea_large_tpu.bc import DirichletBuilder, nodal_forces
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.ops.smallmat import inv3
from fea_large_tpu.solvers.linear import (
    block_jacobi_preconditioner,
    dense_cholesky_solve,
    pcg,
)
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def _random_spd_block_system(rng, n_nodes=40):
    """Random SPD block system with [N,3] unknowns (SURVEY.md §6: 'PCG vs
    scipy on random SPD block systems')."""
    n = 3 * n_nodes
    B = rng.standard_normal((n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_dense_cholesky(rng):
    A, b = _random_spd_block_system(rng)
    x = dense_cholesky_solve(A, b)
    np.testing.assert_allclose(A @ x, b, rtol=1e-10, atol=1e-10)


def test_pcg_matches_direct(rng):
    A, b = _random_spd_block_system(rng)
    n_nodes = b.shape[0] // 3
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    mv = lambda v: (A @ v.reshape(-1)).reshape(n_nodes, 3)  # noqa: E731
    res = pcg(mv, b.reshape(n_nodes, 3), tol=1e-14, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x.reshape(-1), x_ref, rtol=1e-9, atol=1e-9)


def test_pcg_block_jacobi_accelerates(rng):
    """Block-Jacobi must cut iteration counts on a block-diagonally-dominant
    system (and still converge to the same solution)."""
    n_nodes = 60
    blocks = rng.standard_normal((n_nodes, 3, 3))
    blocks = np.einsum("nij,nkj->nik", blocks, blocks) + 10.0 * np.eye(3)
    # off-diagonal coupling
    C = rng.standard_normal((3 * n_nodes, 3 * n_nodes)) * 0.1
    A = np.kron(np.eye(n_nodes), np.ones((3, 3))) * 0.0
    A = C @ C.T * 0.01
    for i in range(n_nodes):
        A[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] += blocks[i]
    A = jnp.asarray(0.5 * (A + A.T))
    b = jnp.asarray(rng.standard_normal((n_nodes, 3)))
    mv = lambda v: (A @ v.reshape(-1)).reshape(n_nodes, 3)  # noqa: E731

    diag = jnp.stack([A[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] for i in range(n_nodes)])
    mask = jnp.ones((n_nodes, 3))
    precond = block_jacobi_preconditioner(diag, mask)

    plain = pcg(mv, b, tol=1e-12, maxiter=2000)
    pre = pcg(mv, b, preconditioner=precond, tol=1e-12, maxiter=2000)
    assert bool(pre.converged)
    assert int(pre.iterations) <= int(plain.iterations)
    np.testing.assert_allclose(pre.x, plain.x, rtol=1e-8, atol=1e-8)


def test_block_jacobi_respects_mask(rng):
    diag = jnp.asarray(rng.standard_normal((5, 3, 3)))
    diag = jnp.einsum("nij,nkj->nik", diag, diag) + 5.0 * jnp.eye(3)
    mask = jnp.ones((5, 3)).at[0, 1].set(0.0).at[3].set(0.0)
    precond = block_jacobi_preconditioner(diag, mask)
    r = jnp.asarray(rng.standard_normal((5, 3)))
    z = precond(r)
    assert float(z[0, 1]) == 0.0
    assert np.all(np.asarray(z[3]) == 0.0)
    # free rows of an unmasked node see the plain 3x3 inverse
    z_ref = inv3(diag[1]) @ r[1]
    np.testing.assert_allclose(z[1], z_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("linear", ["direct", "pcg", "pcg_bcsr"])
def test_newton_quadratic_convergence(linear, rng):
    """SURVEY.md §5.6: residual sequence must contract quadratically on the
    clamped-stretch unit-cube problem, for every linear-solver backend."""
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(1.0), jnp.asarray(1.0))
    bc = (
        DirichletBuilder(mesh)
        .fix("zmin")
        .prescribe("zmax", "z", 0.2)
        .build()
    )
    solver = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(linear=linear, n_steps=1)
    )
    result = solver.solve()
    assert result.converged
    norms = result.history[-1].residual_norms
    assert norms[-1] <= 1e-10 * max(norms[0], 1e-300) or norms[-1] < 1e-12
    # quadratic tail: each of the last contractions at least squares-ish
    assert len(norms) <= 7  # quadratic convergence reaches 1e-10 fast


def test_newton_all_backends_agree(rng):
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.5), jnp.asarray(0.9))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.15).build()
    results = {}
    for linear in ["direct", "pcg", "pcg_bcsr"]:
        solver = NewtonSolver(
            mesh, mat, bc, options=SolverOptions(linear=linear, n_steps=1)
        )
        res = solver.solve()
        assert res.converged, linear
        results[linear] = np.asarray(res.u)
    scale = np.abs(results["direct"]).max()
    for linear in ["pcg", "pcg_bcsr"]:
        np.testing.assert_allclose(
            results[linear], results["direct"], rtol=0, atol=1e-9 * scale
        )


def test_newton_with_external_load(rng):
    """Force-driven problem: cantilever-ish block pulled by nodal forces."""
    mesh = box_mesh(3, 1, 1, lx=3.0, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(10.0), jnp.asarray(5.0))
    bc = DirichletBuilder(mesh).fix("xmin").build()
    f = nodal_forces(mesh, {"xmax": [0.0, 0.0, -0.02]})
    solver = NewtonSolver(
        mesh, mat, bc, f_ext=f, options=SolverOptions(linear="direct", n_steps=2)
    )
    res = solver.solve()
    assert res.converged
    tip = np.asarray(res.u)[np.asarray(mesh.node_sets["xmax"])]
    assert np.all(tip[:, 2] < 0.0)  # tip deflects downward


def test_incremental_loading_records(rng):
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(1.0))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", 0.3).build()
    solver = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(linear="direct", n_steps=3)
    )
    res = solver.solve()
    assert res.converged
    assert len(res.history) == 3
    factors = [r.load_factor for r in res.history]
    np.testing.assert_allclose(factors, [1 / 3, 2 / 3, 1.0], rtol=1e-12)
    for rec in res.history:
        assert rec.residual_norms[-1] < rec.residual_norms[0] or rec.residual_norms[0] < 1e-12


def test_mixed_precision_matches_f64(rng):
    """precision='mixed' (f32 tangent/PCG + f64 residual) must converge to
    the f64 solution to ~1e-8 relative (SURVEY.md §9 risk 2: the mixed
    path is the TPU performance path; the f64 residual pins the fixed
    point)."""
    mesh = box_mesh(3, 3, 3, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.15).build()
    ref = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(linear="pcg", n_steps=2, pcg_tol=1e-13),
    ).solve()
    assert ref.converged
    mixed = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", n_steps=2, precision="mixed",
            pcg_tol=1e-6, newton_rtol=1e-9, max_newton=60,
        ),
    ).solve()
    assert mixed.converged
    scale = float(np.abs(np.asarray(ref.u)).max())
    err = float(np.abs(np.asarray(mixed.u) - np.asarray(ref.u)).max()) / scale
    assert err < 1e-8, err


def test_eisenstat_walker_forcing(rng):
    """EW adaptive forcing must reach the same solution with fewer total
    PCG iterations than fixed-tolerance inexact Newton."""
    mesh = box_mesh(6, 6, 6, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.08).build()

    def run(forcing):
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", forcing=forcing,
                pcg_tol=1e-6, newton_rtol=1e-9, max_newton=60,
            ),
        )
        res = solver.solve()
        assert res.converged, forcing
        return np.asarray(res.u), sum(sum(r.pcg_iters) for r in res.history)

    u_fix, it_fix = run("fixed")
    u_ew, it_ew = run("ew")
    scale = np.abs(u_fix).max()
    np.testing.assert_allclose(u_ew, u_fix, rtol=0, atol=1e-6 * scale)
    assert it_ew < it_fix, (it_ew, it_fix)


def test_load_step_bisection_recovers():
    """SURVEY.md §7.3: a load increment too large for Newton (indefinite
    tangent / iteration blow-up at the raw BC jump) must trigger automatic
    bisection and the solve must still reach full load with the halved
    schedule recorded."""
    mesh = box_mesh(4, 4, 4, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.35).build()
    solver = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", n_steps=1, max_newton=5, pcg_tol=1e-10,
            newton_rtol=1e-9, max_bisections=8,
        ),
    )
    res = solver.solve()
    assert res.converged
    lams = [r.load_factor for r in res.history]
    # first attempt at full load, at least one failed/bisected station, and
    # the final converged increment back at full load
    assert lams[0] == 1.0
    assert len(lams) >= 3, lams
    assert any(l < 1.0 for l in lams), lams
    assert lams[-1] == 1.0
    # the recorded schedule must show a strict halving after the failure
    assert abs(lams[1] - 0.5) < 1e-12 or abs(lams[1] - 0.75) < 1e-12, lams


def test_pcg_chunk_continuation_bitwise():
    """The chunked CG recurrence (bounded device executions, SURVEY.md
    §7.7/backend execution limits) must continue EXACTLY across chunk
    boundaries: a pcg_chunk=7 solve is bitwise-identical to one big chunk."""
    mesh = box_mesh(5, 5, 5, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()

    def run(chunk):
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", pcg_chunk=chunk,
                pcg_tol=1e-6, newton_rtol=1e-9, max_newton=40,
            ),
        )
        res = solver.solve()
        assert res.converged, chunk
        iters = sum(sum(r.pcg_iters) for r in res.history)
        assert iters > 7  # the small chunk must actually cross boundaries
        return np.asarray(res.u)

    u_small = run(7)
    u_big = run(100000)
    assert np.array_equal(u_small, u_big)


@pytest.mark.slow
def test_mixed_pcg_returns_best_iterate_on_floor():
    """On a mesh where the f32 RBM-preconditioned recurrence hits its
    rounding floor and breaks down (elongated beam — BENCH_NOTES round 2),
    the chunked driver must return a USABLE direction: the best iterate
    seen, with rel far below the breakdown point, and the Newton step must
    still reduce the nonlinear residual."""
    import numpy as np

    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.mesh.generators import box_mesh
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh = box_mesh(16, 2, 2, lx=4.0, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", -0.05).build()
    solver = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", precision="mixed", preconditioner="two_level",
            agg_size=32, coarse_modes=6, pcg_tol=1e-8, pcg_maxiter=300,
        ),
    )
    coords = np.asarray(mesh.coords_host)
    u = jnp.zeros((mesh.n_nodes, 3)).at[:, 0].set(
        -0.05 * jnp.asarray(coords[:, 0]) / coords[:, 0].max()
    )
    u = solver.bc.impose(u, 1.0)
    r0, n0 = solver._residual(u, jnp.asarray(1.0))
    u2, iters, ok, rel = solver._step_mixed(u, jnp.asarray(1.0), r64=r0)
    # tol 1e-8 is unreachable in f32: the solve must stop without
    # converging but hand back the best direction, not the post-breakdown
    # one. The reported rel is the HONEST floor: rounding-breakdown
    # restarts (round 3) rebuild from the best iterate with a FRESH
    # residual b - A x, so rel is the true relative residual — measured
    # 1.0e-3/2.2e-3 on this mesh across f32 summation orderings
    # (BENCH_NOTES round-3 layout study), where the drifted recurrence
    # value used to claim <=1e-3. The direction's usefulness is pinned
    # functionally below (20x nonlinear-residual reduction).
    assert not bool(ok)
    assert float(rel) <= 2.5e-3
    _, n1 = solver._residual(u2, jnp.asarray(1.0))
    assert float(n1) < 0.05 * float(n0)


def test_pcg_chunk_reports_nonfinite_rr_as_breakdown():
    """A chunk whose recurrence overflowed (rr = inf/NaN, ok still True —
    the cond guard stops BEFORE the pq<=0 guard can flip ok) must come
    back flagged as breakdown, or the host chunk loops would re-dispatch
    no-op chunks forever (round-2 review finding, reproduced)."""
    import numpy as np

    from fea_large_tpu.solvers.linear import PCGState, pcg_chunk

    n = 8
    st = PCGState(
        x=jnp.zeros((n, 3)), r=jnp.full((n, 3), jnp.inf),
        z=jnp.zeros((n, 3)), p=jnp.zeros((n, 3)),
        rz=jnp.asarray(1.0), rr=jnp.asarray(jnp.inf),
        k=jnp.int32(3), ok=jnp.bool_(True), stop=jnp.asarray(1e-8),
    )
    out = pcg_chunk(lambda v: v, st, maxiter=5)
    assert not bool(out.ok)
    assert int(out.k) == 3  # no iterations were run on the poisoned state


def test_pcg_negative_selfdot_clamped(rng):
    """TPU's emulated dot reductions can round a self-dot to a TINY
    NEGATIVE near the recurrence floor (measured vdot(r,r) = -6.2e-33 on
    v5e at true rel ~5e-12), after which sqrt(rr) is NaN, the while_loop
    cond goes permanently False, and the solve reports a poisoned rel with
    ok=True (round-3 finding: the f64 pressure task FAILED on TPU while
    converging on CPU). Simulate that dot here: clamped rr/rz must keep
    the recurrence finite and report convergence once the floor noise
    drops below the stop target."""
    A, b = _random_spd_block_system(rng)
    n_nodes = b.shape[0] // 3
    mv = lambda v: (A @ v.reshape(-1)).reshape(n_nodes, 3)  # noqa: E731
    noise = 1e-20  # sign-noise scale sitting ABOVE the requested stop^2

    def noisy_dot(a, c):
        return jnp.vdot(a, c) - noise

    res = pcg(mv, b.reshape(n_nodes, 3), tol=1e-14, maxiter=2000,
              dot=noisy_dot)
    assert bool(jnp.isfinite(res.residual_norm))
    assert bool(res.converged)  # clamped floor noise => exact-zero rr
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(res.x.reshape(-1), x_ref, rtol=1e-8, atol=1e-8)


def test_newton_accepts_flagged_direction_on_progress():
    """A linear solve that self-reports failure (recurrence floor short of
    an over-tight tolerance) but still yields a residual-halving direction
    must NOT abort the increment: the Newton residual is the arbiter
    (round-3 TPU pressure-task finding). Force the failure report by
    giving PCG a tolerance below f64's attainable floor with a maxiter
    that strands it mid-solve."""
    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = StVenantKirchhoff(jnp.asarray(1.2), jnp.asarray(0.8))
    bc = (
        DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.1).build()
    )
    solver = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", newton_rtol=1e-9, pcg_tol=1e-30, pcg_maxiter=400,
        ),
    )
    res = solver.solve()
    # every linear solve "fails" (tol 1e-30 is unreachable), yet each
    # direction is near-exact: Newton must converge anyway
    assert res.converged
    assert res.history[-1].residual_norms[-1] <= 1e-9 * max(
        res.history[-1].residual_norms[0], 1e-300
    )


def _device_loop_problem():
    mesh = box_mesh(4, 4, 4, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.1).build()
    return mesh, mat, bc


def test_device_loop_matches_host_loop():
    """The device-resident Newton solve (`_mixed_solve_fn`: the whole
    increment in ONE dispatch) must follow the same Newton trajectory as
    the host-orchestrated fused-iteration loop — identical iteration
    counts and a solution agreeing to the mixed-path accuracy. The two
    paths share their per-iteration arithmetic (same EW f64 forcing, same
    f32-residual gate), differing only in orchestration."""
    mesh, mat, bc = _device_loop_problem()
    base = dict(
        linear="pcg", precision="mixed", preconditioner="two_level",
        coarse_modes=6, forcing="ew", pcg_tol=1e-6, newton_rtol=1e-9,
        max_newton=60,
    )
    res_d = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(device_loop=True, **base)
    ).solve()
    res_h = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(device_loop=False, **base)
    ).solve()
    assert res_d.converged and res_h.converged
    assert [r.newton_iters for r in res_d.history] == [
        r.newton_iters for r in res_h.history
    ]
    assert [r.pcg_iters for r in res_d.history] == [
        r.pcg_iters for r in res_h.history
    ]
    scale = float(np.abs(np.asarray(res_h.u)).max())
    err = float(np.abs(np.asarray(res_d.u) - np.asarray(res_h.u)).max())
    assert err < 1e-8 * scale, err


def test_device_loop_budget_continuation():
    """Exhausting `device_loop_budget` mid-solve must hand the SAME Newton
    sequence to the host loop (warm-started u / norms / eta / norm0) and
    still converge to the unconstrained-device-loop solution."""
    mesh, mat, bc = _device_loop_problem()
    base = dict(
        linear="pcg", precision="mixed", preconditioner="two_level",
        coarse_modes=6, forcing="ew", pcg_tol=1e-6, newton_rtol=1e-9,
        max_newton=60, device_loop=True,
    )
    full = NewtonSolver(mesh, mat, bc, options=SolverOptions(**base)).solve()
    tiny = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(device_loop_budget=5, **base)
    ).solve()
    assert full.converged and tiny.converged
    scale = float(np.abs(np.asarray(full.u)).max())
    err = float(np.abs(np.asarray(tiny.u) - np.asarray(full.u)).max())
    assert err < 1e-7 * scale, err


@pytest.mark.slow
def test_device_loop_matches_host_on_floor_mesh():
    """Device-loop vs host-loop equivalence on the elongated floor mesh
    (f32-unreachable pcg_tol, recurrence floors every late solve): both
    paths must converge to the same solution. The explicit CG-failure ->
    host-fallback branch is pinned by
    test_device_loop_cg_breakdown_is_not_terminal below."""
    mesh = box_mesh(16, 2, 2, lx=4.0, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", -0.05).build()
    base = dict(
        linear="pcg", precision="mixed", preconditioner="two_level",
        agg_size=32, coarse_modes=6, forcing="ew", pcg_tol=1e-8,
        pcg_maxiter=300, newton_rtol=1e-8, max_newton=40,
    )
    res_d = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(device_loop=True, **base)
    ).solve()
    res_h = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(device_loop=False, **base)
    ).solve()
    assert res_d.converged and res_h.converged
    scale = float(np.abs(np.asarray(res_h.u)).max())
    err = float(np.abs(np.asarray(res_d.u) - np.asarray(res_h.u)).max())
    assert err < 1e-6 * scale, err


def test_device_loop_cg_breakdown_is_not_terminal(monkeypatch):
    """Mechanism pin for the round-3 fix: when the device-resident solve
    reports a CG breakdown (failed=True, poisoned=False), _newton_mixed
    must CONTINUE on the host loop (which owns the rounding-breakdown
    restart machinery) instead of returning failure -> bisection. The
    device solve is wrapped to report a breakdown after its 2nd Newton
    iteration exactly once; the increment must still converge with no
    bisection recorded."""
    from fea_large_tpu.solvers import newton as nm

    mesh, mat, bc = _device_loop_problem()
    real = nm._mixed_solve_jit
    fired = {}

    def fake(*args, **kwargs):
        out = real(*args, **kwargs)
        if fired:
            return out
        fired["yes"] = True
        (u, norms, cgs, n_it, conv, failed, exhausted, poisoned, eta,
         norm0, total) = out
        return (
            u, norms, cgs, jnp.minimum(n_it, 2), jnp.bool_(False),
            jnp.bool_(True), jnp.bool_(False), jnp.bool_(False), eta,
            norm0, total,
        )

    monkeypatch.setattr(nm, "_mixed_solve_jit", fake)
    res = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", precision="mixed", preconditioner="two_level",
            coarse_modes=6, forcing="ew", pcg_tol=1e-6, newton_rtol=1e-9,
            device_loop=True,
        ),
    ).solve()
    assert fired
    assert res.converged
    # no bisection: ONE increment record, at the full load factor
    assert len(res.history) == 1
    assert res.history[0].load_factor == 1.0


def test_device_forcing_mirrors_host_newton_lin_tol():
    """`device_forcing` (the device-side EW mirror used by the fused
    iteration, the device-resident solve, and the sharded fused iteration)
    must produce bit-identical forcing values to the host `newton_lin_tol`
    on the same residual history — the device/host trajectory-pinning
    tests rest on this equality (round-3 review: it was four
    hand-synchronized copies)."""
    from fea_large_tpu.solvers.newton import device_forcing, newton_lin_tol

    norms = [1.0, 0.31, 4.1e-2, 8.3e-4, 2.7e-6, 9.9e-9]
    for forcing, eta_min in (("ew", 0.0), ("ew", 1e-2), ("fixed", 0.0)):
        opts = SolverOptions(
            forcing=forcing, precision="mixed", pcg_tol=1e-6,
            ew_eta_min=eta_min,
        )
        stop_n = max(opts.newton_rtol * norms[0], opts.newton_atol)
        eta_h = 0.5
        eta_d = jnp.full((), 0.5, jnp.float64)
        saw_safeguard = False
        saw_eta_min = False
        for it in range(1, len(norms)):
            hist = norms[: it + 1]
            tol_h, eta_h = newton_lin_tol(opts, it, hist, norms[0], eta_h)
            eta_d, tol_d = device_forcing(
                jnp.asarray(hist[-1], jnp.float64),
                jnp.asarray(hist[-2], jnp.float64),
                eta_d,
                jnp.asarray(False),
                jnp.asarray(opts.pcg_tol, jnp.float64),
                forcing == "ew",
                1.2e-6,
                jnp.asarray(stop_n, jnp.float64),
                jnp.asarray(eta_min, jnp.float64),
            )
            assert float(tol_d) == tol_h, (forcing, it, float(tol_d), tol_h)
            assert float(eta_d) == eta_h, (forcing, it, float(eta_d), eta_h)
            # the final history entry sits within a decade of stop_n: the
            # termination safeguard must have LOOSENED eta to exactly the
            # remaining half-reduction (oversolving the last system was
            # round 3's single largest measured waste: 25 of 91 CG iters)
            if forcing == "ew" and 0.5 * stop_n / hist[-1] > float(eta_d) * 0.999:
                saw_safeguard = float(eta_d) == min(
                    0.5, max(0.5 * stop_n / hist[-1], opts.pcg_tol)
                )
            # fast contraction (0.31 -> 4.1e-2) drives the raw EW eta to
            # 0.9*(0.041/0.31)^2 ~ 1.6e-2... then 8.3e-4/4.1e-2 -> 3.7e-4,
            # far below the 1e-2 cap: the cap must bind mid-history
            if eta_min > 0.0 and float(eta_d) == eta_min:
                saw_eta_min = True
        if forcing == "ew" and eta_min == 0.0:
            # (with the 1e-2 cap the safeguard value 0.5*stop/||R|| ~ 5e-3
            # sits BELOW the cap and can never bind on this history)
            assert saw_safeguard
        if eta_min > 0.0:
            assert saw_eta_min


def test_two_level_breakdown_falls_back_to_jacobi():
    """Single-device mirror of the sharded two-level -> jacobi fallback
    (round-4 ADVICE item 1): a CORRUPTED coarse inverse (indefinite
    -identity) guarantees CG breakdown through the two-level
    preconditioner; the host loop must retry the linear solve with plain
    block-Jacobi, count the fallback, and still converge Newton."""
    import dataclasses

    mesh, mat, bc = _device_loop_problem()
    solver = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", precision="mixed", preconditioner="two_level",
            forcing="ew", newton_rtol=1e-9, device_loop=False,
        ),
    )
    # poison the coarse term: -I makes M indefinite -> rz < 0 breakdown
    nc = solver._coarse.acinv.shape[0]
    solver._coarse = dataclasses.replace(
        solver._coarse,
        acinv=-jnp.eye(nc, dtype=solver._coarse.acinv.dtype) * 1e3,
    )
    u, ok, rec = solver._newton(
        jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype), 1.0
    )
    assert ok, f"Newton failed even with the fallback: {rec.residual_norms}"
    assert solver.precond_fallbacks >= 1, (
        "corrupted two-level coarse should have triggered the jacobi "
        "fallback"
    )
