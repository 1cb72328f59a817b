"""Nonlinear driver: Newton-Raphson with incremental load stepping
(SURVEY.md C13, §5.6; configs 1-3 of BASELINE.json:7-9).

Control structure mirrors the reference's main solve loop (SURVEY.md §4.1):
a host-side Python loop over load increments and Newton iterations (a few
dozen iterations total — host control is free) driving two jitted device
regions per iteration:

    residual(u, scale)  ->  ||R_free||            (one element pass)
    step(u, scale)      ->  u + du                (assemble + linear solve)

The jitted functions are MODULE-LEVEL and take every array (geometry,
scatter maps, BC masks, material constants) as an argument: closure-captured
arrays become baked-in constants, which makes tracing/compilation scale with
mesh size and defeats jit caching across solver instances.

Auxiliary behaviors required by the spec:
  * convergence tracking (BASELINE.json:9): per-increment residual history,
    Newton counts, PCG iteration counts — returned as structured records
    (SURVEY.md §7.5).
  * automatic load-step bisection on Newton failure (SURVEY.md §7.3): the
    increment is halved (up to `max_bisections` times) and retried from the
    last converged state.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from fea_large_tpu.assembly.bcsr import BCSRStructure, assemble_bcsr
from fea_large_tpu.assembly.dense import assemble_dense, mask_dense_system
from fea_large_tpu.assembly.matfree import TangentState, apply_tangent
from fea_large_tpu.assembly.scatter import NodeScatter
from fea_large_tpu.bc import DirichletBC
from fea_large_tpu.elements.kernels import (
    element_diag_blocks,
    element_internal_force,
    precompute_geometry,
)
from fea_large_tpu.materials.base import Material
from fea_large_tpu.mesh.core import Mesh
from fea_large_tpu.ops.soa import (
    soa_apply_tangent,
    soa_diag_blocks,
    soa_freeze,
    soa_internal_force,
)
from fea_large_tpu.solvers.linear import (
    PCGResult,
    apply_block_jacobi,
    block_jacobi_preconditioner,
    dense_cholesky_solve,
    drive_chunked_pcg,
    jacobi_inverse_blocks,
    pcg,
    pcg_chunk,
    pcg_init,
)


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Solver configuration (the reference task file's `solution` section —
    SURVEY.md C14/§7.6)."""

    linear: str = "pcg"  # "direct" | "pcg" (matrix-free) | "pcg_bcsr"
    n_steps: int = 1  # load increments
    newton_rtol: float = 1e-10
    newton_atol: float = 1e-12
    max_newton: int = 30
    pcg_tol: float = 1e-12
    #: iteration budget — a HARD bound on every path (the chunk programs,
    #: single-device and sharded, take the remaining budget as a traced
    #: scalar; it only feeds the CG while-loop cond, so no second program).
    pcg_maxiter: int = 5000
    pcg_chunk: int = 250  # CG iterations per device call (mixed path)
    max_bisections: int = 5
    #: "jacobi" (the reference's preconditioner, SURVEY.md C12) or
    #: "two_level" (net-new coarse aggregation correction — cuts the
    #: O(h^-1) iteration growth; solvers/multilevel.py). Mixed path only.
    preconditioner: str = "jacobi"
    agg_size: int | None = None  # nodes/aggregate ("two_level"; None = auto)
    #: coarse basis per aggregate: 3 (translations), 6 (full rigid-body
    #: modes — the elasticity near-kernel; cuts CG iterations, see
    #: solvers/multilevel.py::CoarseSpace), or 12 (EXPERIMENTAL, RBM +
    #: linear strain fields; single-device only). "two_level" only.
    coarse_modes: int = 3
    #: linear-solve forcing: "fixed" solves every Newton system to pcg_tol;
    #: "ew" uses Eisenstat-Walker (choice 2) adaptive forcing — early Newton
    #: systems are solved loosely (the direction is inexact anyway far from
    #: the root), late ones tightly; cuts total PCG work ~2-3x per solve
    #: without changing the converged solution (inexact-Newton theory).
    forcing: str = "fixed"
    #: lower cap on the EW forcing eta: local quadratic Newton convergence
    #: tolerates eta up to ~0.1 with little iteration inflation, so solving
    #: a MIDDLE Newton system tighter than this floor wastes CG iterations
    #: Newton's own contraction would recover for free (same waste class
    #: the termination safeguard removes for the LAST system). 0.0 =
    #: uncapped (the raw EW choice-2 schedule). "ew" only.
    ew_eta_min: float = 0.0
    #: run the f32 element hot ops (freeze + per-iteration tangent action)
    #: as Pallas TPU kernels (ops/pallas_kernels.py; BASELINE.json:5
    #: "batched dense Pallas kernels over element blocks") instead of the
    #: XLA-fused SoA path. Identical math — tests assert agreement; the
    #: default is whichever measures faster in-loop (BENCH_NOTES.md).
    #: Mixed path only (Pallas is f32-only on this platform, SURVEY.md §9).
    pallas: bool = False
    #: run the ENTIRE bounded Newton solve of an increment as ONE device
    #: program (`_mixed_solve_fn`: lax.while_loop over fused Newton
    #: iterations). Each host-orchestrated Newton iteration costs a ~30 ms
    #: tunnel dispatch + a ~30 ms blocking fetch; a 4-iteration solve pays
    #: ~0.24 s of pure round-trip latency that the device loop removes.
    #: The device program is bounded by `device_loop_budget` total CG
    #: iterations (backend executions >~5 min are killed); if the budget
    #: is exhausted mid-solve the host loop continues the SAME Newton
    #: sequence warm-started from the device state. Rounding-breakdown
    #: restarts and best-iterate polishing are host-loop-only (the device
    #: loop exits to the host path on any CG failure). Mixed path only.
    device_loop: bool = True
    #: total CG iterations per device-resident solve call (None = auto:
    #: sized so one call stays well under the backend execution limit,
    #: ~2.3e8 element-iterations ≈ 60 s).
    device_loop_budget: int | None = None
    #: in-increment Newton residuals via the DOUBLE-WORD f32 fused Pallas
    #: element pass (ops/pallas_residual.py; ~1e-13 relative agreement
    #: with the f64 pass, measured) instead of the fragmented f64 XLA
    #: graph (45 ms vs ~3 ms at 1M DOF, round-5). The pure-f64 pass
    #: REMAINS the authority: any residual that claims convergence is
    #: re-evaluated in f64 before acceptance, preserving the 1e-8 parity
    #: contract. None = auto (TPU + structured lattice + registered
    #: material); True forces it where supported (interpret mode off-TPU
    #: — tests); False disables. Mixed path only.
    resid_df: bool | None = None
    #: "f64" — everything in f64 (the parity path, BASELINE.json:5).
    #: "mixed" — f64 residuals/updates + f32 tangent/PCG (SURVEY.md §9
    #: risk 2/5): the linear solve is a Newton DIRECTION, so f32 error there
    #: only perturbs the step, not the fixed point; the f64 residual keeps
    #: convergence checks and the converged u at f64 accuracy. This is the
    #: TPU performance path (f64 is software-emulated on TPU: ~10x slower
    #: and pathologically slow to compile at scale).
    precision: str = "f64"


@dataclasses.dataclass
class IncrementRecord:
    """Convergence record for one converged load increment (§7.5)."""

    load_factor: float
    newton_iters: int
    residual_norms: list
    pcg_iters: list
    wall_time: float


@dataclasses.dataclass
class SolveResult:
    u: jnp.ndarray  # [N, 3] converged displacement
    converged: bool
    history: list  # list[IncrementRecord]

    @property
    def total_newton_iters(self) -> int:
        return sum(r.newton_iters for r in self.history)


# ---------------------------------------------------------------------------
# jitted device programs (module-level: shared compile cache across solver
# instances, no captured array constants)
# ---------------------------------------------------------------------------


def _residual_fn(u, scale, conn, geom, material, bc, f_ext, scatter):
    fe = element_internal_force(u[conn], geom, material)
    r = bc.project(scale * f_ext - scatter(fe))
    return r, jnp.linalg.norm(r)


def _step_direct_fn(u, scale, conn, geom, material, bc, f_ext):
    K, f_int = assemble_dense(u, conn, geom, material)
    r = bc.project(scale * f_ext - f_int)
    A, b = mask_dense_system(K, r, bc.free_mask)
    du = dense_cholesky_solve(A, b).reshape(u.shape)
    return u + du, jnp.int32(1), jnp.bool_(True), jnp.zeros((), u.dtype)


def _step_matfree_fn(
    u, scale, conn, geom, material, bc, f_ext, scatter, pcg_tol, pcg_maxiter
):
    state, fe = TangentState.freeze(u, conn, geom, material)
    r = bc.project(scale * f_ext - scatter(fe))
    diag = scatter(element_diag_blocks(u[conn], geom, material))
    precond = block_jacobi_preconditioner(diag, bc.free_mask)

    def matvec(v):
        vm = bc.project(v)
        return bc.project(apply_tangent(state, vm, conn, geom, material, scatter)) + (
            v - vm
        )

    res = _pcg_with_restart(matvec, r, precond, pcg_tol, pcg_maxiter)
    rel = res.residual_norm / jnp.maximum(jnp.linalg.norm(r), 1e-300)
    return u + res.x, res.iterations, res.converged, rel


def _pcg_with_restart(matvec, r, precond, pcg_tol, pcg_maxiter):
    """PCG + one unconditional restart from the final iterate.

    A pq<=0 breakdown can be pure rounding near stagnation (the Krylov
    recurrence drifts from the true residual); restarting from x rebuilds
    the recurrence from the TRUE residual and recovers, while a genuinely
    indefinite operator breaks down again immediately. If the first solve
    already converged, the restart's while_loop exits after 0 iterations
    (cost: one matvec + one preconditioner apply)."""
    res = pcg(matvec, r, preconditioner=precond, tol=pcg_tol, maxiter=pcg_maxiter)
    # the restart only gets the REMAINING budget: pcg_maxiter is a hard
    # bound on total iterations (a stagnating solve that burned the full
    # budget restarts with 0 iterations — one matvec + precond apply)
    res2 = pcg(
        matvec, r, preconditioner=precond, x0=res.x, tol=pcg_tol,
        maxiter=jnp.maximum(pcg_maxiter - res.iterations, 0),
    )
    return PCGResult(
        x=res2.x,
        iterations=res.iterations + res2.iterations,
        residual_norm=res2.residual_norm,
        converged=res2.converged,
    )


def _step_bcsr_fn(
    u, scale, conn, geom, material, bc, f_ext, scatter, structure, pcg_tol, pcg_maxiter
):
    K, f_int = assemble_bcsr(u, conn, geom, material, structure, scatter)
    r = bc.project(scale * f_ext - f_int)
    precond = block_jacobi_preconditioner(K.block_diagonal(), bc.free_mask)

    def matvec(v):
        vm = bc.project(v)
        return bc.project(K.matvec(vm)) + (v - vm)

    res = _pcg_with_restart(matvec, r, precond, pcg_tol, pcg_maxiter)
    rel = res.residual_norm / jnp.maximum(jnp.linalg.norm(r), 1e-300)
    return u + res.x, res.iterations, res.converged, rel


def _residual_soa_fn(u, scale, soa64, material, bc, f_ext):
    """f64 residual via the SoA element kernels. The AoS [E,q,3,3] layout
    pads its trailing (3,3) dims onto (4,128) TPU tiles — 57x memory
    expansion, OOM at 1M DOF — so the f64 residual uses the element-last
    layout too."""
    state = soa_freeze(soa64, material, u.T)
    f_int = soa_internal_force(soa64, state).T
    r = bc.project(scale * f_ext - f_int)
    return r, jnp.linalg.norm(r)


#: rigorous-with-margin bound on the double-word residual pass's error,
#: RELATIVE to ||f_int||: measured 1e-13 (4^3) to 5e-13 (238k DOF,
#: sqrt(1/h) growth from the f64 reference's interior cancellation —
#: bench.py --check records it every round); 1e-11 carries >20x margin.
#: Used to skip the f64 confirmation pass when even a worst-case
#: double-word error could not flip the convergence decision.
_DF_ERR_REL = 1e-11


def _residual_df_fn(u, scale, soa, soa64, material, bc, f_ext):
    """In-increment residual via the double-word f32 fused element pass
    (ops/pallas_residual.py): same (r [N,3] f64, ||r||) contract as
    `_residual_soa_fn` plus the absolute error bound of the pass
    (_DF_ERR_REL * ||f_int||), ~1e-13 relative agreement, ~15x cheaper
    on TPU. `soa` is the F32 SoAProblem (structured lattices bake its
    f64 tables_host aux; unstructured meshes stream `soa64`'s f64
    geometry); `material` the f64 material."""
    from fea_large_tpu.ops.pallas_residual import soa_internal_force_df

    f_int = soa_internal_force_df(soa, material, u.T, p64=soa64).T
    r = bc.project(scale * f_ext - f_int)
    err = _DF_ERR_REL * jnp.linalg.norm(f_int)
    return r, jnp.linalg.norm(r), err


def _mixed_matvec(soa, state, free32_T, v, use_pallas=False):
    """Masked tangent action in f32 SoA layout; v [N, 3]. `use_pallas`
    (static) selects the Pallas element-block kernel over the XLA SoA
    path — same math, benchmarked head-to-head in BENCH_NOTES.md."""
    vm_T = v.T * free32_T
    if use_pallas:
        from fea_large_tpu.ops.pallas_kernels import soa_apply_tangent_pallas

        y_T = soa_apply_tangent_pallas(soa, state, vm_T) * free32_T
    else:
        y_T = soa_apply_tangent(soa, state, vm_T) * free32_T
    return y_T.T + (v - vm_T.T)


def _mixed_precond(inv_blocks, free32, coarse):
    """Block-Jacobi, optionally augmented by the two-level coarse
    correction (solvers/multilevel.py). `coarse=None` selects plain Jacobi
    at trace time."""

    def apply(r):
        z = apply_block_jacobi(inv_blocks, free32, r)
        if coarse is not None:
            z = z + free32 * coarse.apply(r)
        return z

    return apply


def _mixed_prepare_fn(
    u, scale, soa64, soa, material, material32, bc, f_ext, pcg_tol, coarse,
    x0=None, use_pallas=False, r64=None,
):
    """Phase 1 of the mixed-precision Newton step: f64 residual (SoA element
    pass), f32 frozen tangent state, block-Jacobi blocks, PCG init. `x0`
    restarts the Krylov recurrence from a previous iterate (breakdown
    recovery — see `_pcg_with_restart`). `use_pallas` (static) runs the f32
    freeze and tangent action as Pallas element-block kernels; the f64
    residual stays XLA (Pallas is f32-only on this platform). `r64` feeds
    in a residual the caller already computed (the Newton convergence
    check) — at 1M DOF the f64 element pass is ~100 ms, worth one per
    iteration, not two."""
    if r64 is None:
        r64, _ = _residual_soa_fn(u, scale, soa64, material, bc, f_ext)
    u32_T = u.astype(jnp.float32).T  # [3, N]
    free32 = bc.free_mask.astype(jnp.float32)
    if use_pallas:
        from fea_large_tpu.ops.pallas_kernels import soa_freeze_pallas

        state = soa_freeze_pallas(soa, material32, u32_T)
    else:
        state = soa_freeze(soa, material32, u32_T)
    diag = jnp.transpose(soa_diag_blocks(soa, state), (2, 0, 1))
    inv_blocks = jacobi_inverse_blocks(diag, free32)
    pcg_state = pcg_init(
        lambda v: _mixed_matvec(soa, state, free32.T, v, use_pallas),
        r64.astype(jnp.float32),
        preconditioner=_mixed_precond(inv_blocks, free32, coarse),
        tol=pcg_tol,
        x0=x0,
    )
    return pcg_state, state, inv_blocks


def _mixed_chunk_fn(pcg_state, soa, state, inv_blocks, free32, coarse, n_iters,
                    use_pallas=False):
    """Phase 2 (repeated): a bounded chunk of CG iterations. Bounded device
    executions keep each call under backend execution limits; the Krylov
    recurrence continues exactly across chunks (PCGState). `n_iters` is a
    TRACED scalar (it only feeds the CG while-loop cond): the host loop's
    remaining budget makes pcg_maxiter a hard bound with no second compiled
    program and no recompile on the final partial chunk."""
    return pcg_chunk(
        lambda v: _mixed_matvec(soa, state, free32.T, v, use_pallas),
        pcg_state,
        preconditioner=_mixed_precond(inv_blocks, free32, coarse),
        maxiter=n_iters,
    )


def device_forcing(norm, prev_norm, eta_prev, first_it, pcg_tol, use_ew,
                   floor, stop_newton, eta_min=0.0):
    """Eisenstat-Walker choice-2 forcing + mixed-precision floor — the
    DEVICE mirror of `newton_lin_tol` (identical f64 arithmetic ->
    identical values; the device/host trajectory-pinning tests depend on
    it). The ONE shared implementation for the fused single-device
    iteration, the device-resident solve, and the sharded fused iteration
    (`dist/sharded.py`) — these were four hand-synchronized copies before
    (round-3 review). `floor` is the caller's precision floor (1.2e-6 for
    the f32 recurrence; the f64 sharded path passes its norm-dependent
    form). `stop_newton` is the outer Newton stop target: the TERMINATION
    safeguard (Eisenstat-Walker 1996 §6; the same form PETSc SNES uses)
    loosens eta to 0.5*stop/||R|| when EW asks for more reduction than the
    Newton solve still needs — without it the final linear solve of every
    increment oversolves by the gap between eta and stop/||R|| (measured
    round 3: the last step burned 25 of 91 total CG iterations to land
    6.2x BELOW the convergence contract). `eta_min` is the optional EW
    lower cap (`SolverOptions.ew_eta_min`; 0.0 = uncapped — exact
    pre-cap arithmetic). Returns (eta, lin_tol), f64."""
    if use_ew:
        cand = 0.9 * (norm / jnp.maximum(prev_norm, 1e-300)) ** 2
        safe = 0.9 * eta_prev**2
        eta = jnp.where(safe > 0.1, jnp.maximum(cand, safe), cand)
        eta = jnp.where(first_it, 0.5, eta)
        eta = jnp.maximum(eta, eta_min)
        eta = jnp.maximum(
            eta, 0.5 * stop_newton / jnp.maximum(norm, 1e-300)
        )
        eta = jnp.clip(eta, pcg_tol.astype(jnp.float64), 0.5)
        lin_tol = jnp.maximum(eta, floor)
    else:
        eta = jnp.full((), 0.5, jnp.float64)
        lin_tol = jnp.maximum(pcg_tol.astype(jnp.float64), floor)
    return eta, lin_tol


def newton_lin_tol(opts, it, norms, norm0, eta):
    """(lin_tol, eta') for Newton iteration `it`: Eisenstat-Walker
    choice-2 forcing (gamma=0.9, alpha=2, over-tightening safeguard) when
    opts.forcing == "ew", then the precision floor. Shared by
    NewtonSolver._newton and ShardedNewtonSolver._newton.

    Precision floor: the PCG target is tol*||R||; late in Newton ||R|| is
    tiny and a fixed relative tol can demand an absolute residual below
    floating-point rounding — CG then stagnates (or breaks down) chasing
    it. The achievable ABSOLUTE residual is ~eps * problem scale: for the
    f64 path that scale is ||R0|| (fixed tangent/residual scale), so floor
    the relative tol at 100 eps64 ||R0||/||R||; for the mixed path the f32
    system is re-initialized from the f64 residual each step (its own
    scale), so the floor is a constant ~10 eps32."""
    lin_tol = None
    if opts.forcing == "ew":
        if it > 0:
            cand = 0.9 * (norms[-1] / norms[-2]) ** 2
            safe = 0.9 * eta**2
            eta = max(cand, safe) if safe > 0.1 else cand
        # optional EW lower cap (see SolverOptions.ew_eta_min), then the
        # termination safeguard — mirror of `device_forcing`: never solve
        # tighter than half the reduction the Newton stop still requires
        eta = max(eta, opts.ew_eta_min)
        stop_n = max(opts.newton_rtol * norm0, opts.newton_atol)
        eta = max(eta, 0.5 * stop_n / max(norms[-1], 1e-300))
        eta = min(max(eta, opts.pcg_tol), 0.5)
        lin_tol = eta
    if opts.precision == "mixed":
        floor = 1.2e-6
    else:
        floor = min(2.2e-14 * norm0 / norms[-1], 0.1)
    return max(lin_tol if lin_tol is not None else opts.pcg_tol, floor), eta


def _mixed_update_fn(u, x):
    """u + du in one fused device call (two eager ops would cost two
    ~30 ms tunnel dispatches per Newton step)."""
    return u + x.astype(u.dtype)


def _mixed_newton_iter_fn(
    u, x_prev, scale, prev_norm, eta_prev, first_it, stop_newton, pcg_tol,
    eta_min, soa64, soa, material, material32, bc, f_ext, coarse,
    *, chunk_iters, use_pallas, use_ew, resid32, resid_df=False,
):
    """ONE fused device program per mixed-precision Newton iteration
    (round-3 host-orchestration cut): update the iterate with the previous
    direction, evaluate the residual + its norm, derive the
    Eisenstat-Walker forcing tolerance ON DEVICE from the previous norms,
    freeze the f32 tangent, build block-Jacobi, and run the first bounded
    CG chunk — all in a single dispatch. The host then needs exactly one
    batched device_get per Newton iteration (norm, eta, tol + the chunk
    control scalars) instead of two dispatch+fetch pairs; at ~30 ms per
    tunnel round trip that is ~10% of a 1M-DOF step.

    `resid32` (static) evaluates the residual with the f32 element pass
    reusing the tangent freeze state — exact enough while the Newton
    residual is far above the f32 rounding floor (the host enables it only
    while ||R|| > 3e-2 ||R0||; the convergence-determining late iterations
    always use the f64 pass, preserving the 1e-8 parity contract).

    When the new norm already satisfies `stop_newton`, the PCG stop target
    is inflated (1e30 * ||b||) so the primed Krylov state exits after zero
    iterations and the host discards it — the wasted freeze costs ~40 ms
    once per solve, far less than a separate residual program round trip
    every iteration."""
    u = u + x_prev.astype(u.dtype)
    free32 = bc.free_mask.astype(jnp.float32)
    u32_T = u.astype(jnp.float32).T
    if use_pallas:
        from fea_large_tpu.ops.pallas_kernels import soa_freeze_pallas

        state = soa_freeze_pallas(soa, material32, u32_T)
    else:
        state = soa_freeze(soa, material32, u32_T)
    if resid32:
        f_int_T = soa_internal_force(soa, state)  # [3, N] f32, from state
        b = (
            scale.astype(jnp.float32) * f_ext.astype(jnp.float32) - f_int_T.T
        ) * free32
        norm = jnp.linalg.norm(b).astype(jnp.float64)
    elif resid_df:
        # double-word f32 element pass. A convergence claim is confirmed
        # by the pure-f64 pass ONLY when the claim is within the pass's
        # rigorous error bound of the threshold — when norm_df clears
        # stop by more than `err`, no admissible double-word error could
        # flip the decision and the 48 ms f64 pass is provably redundant
        # (the confirm fires on the knife-edge cases alone).
        b64, norm, err = _residual_df_fn(
            u, scale, soa, soa64, material, bc, f_ext
        )
        b64, norm = jax.lax.cond(
            (norm <= stop_newton) & (norm > stop_newton - err),
            lambda _: _residual_soa_fn(u, scale, soa64, material, bc, f_ext),
            lambda _: (b64, norm),
            None,
        )
        b = b64.astype(jnp.float32)
    else:
        b64, norm = _residual_soa_fn(u, scale, soa64, material, bc, f_ext)
        b = b64.astype(jnp.float32)
    eta, lin_tol = device_forcing(
        norm, prev_norm, eta_prev, first_it, pcg_tol, use_ew, 1.2e-6,
        stop_newton, eta_min,
    )
    diag = jnp.transpose(soa_diag_blocks(soa, state), (2, 0, 1))
    inv_blocks = jacobi_inverse_blocks(diag, free32)
    tol_eff = jnp.where(norm <= stop_newton, 1e30, lin_tol).astype(jnp.float32)
    matvec = lambda v: _mixed_matvec(soa, state, free32.T, v, use_pallas)  # noqa: E731
    precond = _mixed_precond(inv_blocks, free32, coarse)
    st = pcg_init(matvec, b, preconditioner=precond, tol=tol_eff)
    st = pcg_chunk(matvec, st, preconditioner=precond, maxiter=chunk_iters)
    return u, st, state, inv_blocks, b, norm, eta, lin_tol


def _mixed_solve_fn(
    u0, scale, stop_rtol, stop_atol, pcg_tol, eta_min, pcg_maxiter,
    cg_budget, soa64, soa, material, material32, bc, f_ext, coarse,
    *, max_newton, use_pallas, use_ew, resid_df=False,
):
    """DEVICE-RESIDENT mixed-precision Newton solve of one load increment:
    a `lax.while_loop` over the same fused iteration body as
    `_mixed_newton_iter_fn` — residual (f32 while far from convergence, f64
    for the decisions), Eisenstat-Walker forcing, tangent freeze,
    block-Jacobi, and a full bounded CG solve per Newton iteration — so the
    whole increment costs ONE dispatch and ONE batched fetch instead of a
    ~60 ms tunnel round trip per Newton iteration (round-3 measurement:
    ~0.24 s of a 4.3 s solve at 1M DOF).

    Semantics relative to the host loop (`NewtonSolver._newton_mixed`):
      * identical arithmetic per iteration (same EW f64 forcing, same
        3e-2||R0|| f32-residual gate, same acceptance rule lin_ok or
        rel<=1e-3) — the common no-breakdown trajectory matches;
      * NO rounding-breakdown restarts or best-iterate polishing on
        device — a CG breakdown exits with `failed=True` and the HOST loop
        redoes that Newton iteration with its restart + best-iterate
        machinery (`_newton_mixed`); only a non-finite residual
        (`poisoned=True`) is terminal -> bisection;
      * bounded: at most `cg_budget` TOTAL CG iterations per call (device
        executions >~5 min are killed — CLAUDE.md); on exhaustion it
        returns `exhausted=True` and the host loop continues the same
        Newton sequence warm-started (u, norms, eta, norm0).

    Returns (u, norms[max_newton], cgs[max_newton], n_iters, converged,
    failed, exhausted, poisoned, eta, norm0, total_cg)."""
    free32 = bc.free_mask.astype(jnp.float32)

    def freeze(u32_T):
        if use_pallas:
            from fea_large_tpu.ops.pallas_kernels import soa_freeze_pallas

            return soa_freeze_pallas(soa, material32, u32_T)
        return soa_freeze(soa, material32, u32_T)

    def body(c):
        (u, x_prev, prev_norm, eta, norm0, it, total_cg, norms, cgs,
         done, conv, failed, exhausted, poisoned) = c
        u = u + x_prev.astype(u.dtype)
        state = freeze(u.astype(jnp.float32).T)

        def resid_f32(_):
            f_int_T = soa_internal_force(soa, state)
            b = (
                scale.astype(jnp.float32) * f_ext.astype(jnp.float32)
                - f_int_T.T
            ) * free32
            return b, jnp.linalg.norm(b).astype(jnp.float64)

        def resid_f64(_):
            b64, n64 = _residual_soa_fn(u, scale, soa64, material, bc, f_ext)
            return b64.astype(jnp.float32), n64

        def resid_dw(_):
            b64, n64, e64 = _residual_df_fn(
                u, scale, soa, soa64, material, bc, f_ext
            )
            return b64.astype(jnp.float32), n64, e64

        # the double-word pass replaces the f64 pass for in-increment
        # residuals (static routing — same flag as the host loop)
        def resid_f64_e(_):
            b, n = resid_f64(None)
            return b, n, jnp.zeros((), jnp.float64)

        def resid_f32_e(_):
            b, n = resid_f32(None)
            return b, n, jnp.zeros((), jnp.float64)

        resid_full = resid_dw if resid_df else resid_f64_e
        if use_ew:
            # f32 residual only while far above the f32 rounding floor —
            # same gate as the host loop; cond executes ONE branch on TPU
            use32 = (it > 0) & (prev_norm > 3e-2 * norm0)
            b, norm, dferr = jax.lax.cond(
                use32, resid_f32_e, resid_full, None
            )
        else:
            use32 = jnp.bool_(False)
            b, norm, dferr = resid_full(None)
        if resid_df:
            # knife-edge convergence claims are confirmed by the f64
            # authority before they are acted on (mirror of
            # _mixed_newton_iter_fn — see the margin rule there)
            n0_est = jnp.where(it == 0, norm, norm0)
            stop_est = jnp.maximum(stop_rtol * n0_est, stop_atol)
            b, norm = jax.lax.cond(
                ~use32 & (norm <= stop_est) & (norm > stop_est - dferr),
                resid_f64,
                lambda _, _b=b, _n=norm: (_b, _n),
                None,
            )
        norm0 = jnp.where(it == 0, norm, norm0)
        stop_n = jnp.maximum(stop_rtol * norm0, stop_atol)
        norms = norms.at[it].set(norm)
        bad = ~jnp.isfinite(norm)
        conv = (norm <= stop_n) & ~bad
        eta_n, lin_tol = device_forcing(
            norm, prev_norm, eta, it == 0, pcg_tol, use_ew, 1.2e-6, stop_n,
            eta_min,
        )
        skip = conv | bad
        # converged/NaN: inflate the stop target so CG exits at 0
        # iterations (the wasted freeze+Jacobi is ~40 ms once per solve).
        # Same for the LAST allowed iteration: the deferred-update scheme
        # applies x at the start of the NEXT iteration, so its solve could
        # never be applied — skipping it changes no terminal flag
        # (max_newton exhaustion -> bisection either way) but saves a full
        # discarded CG solve on every bisection-bound increment
        discard = (it + 1 >= max_newton) & ~skip
        tol_eff = jnp.where(skip | discard, 1e30, lin_tol).astype(jnp.float32)
        diag = jnp.transpose(soa_diag_blocks(soa, state), (2, 0, 1))
        inv_blocks = jacobi_inverse_blocks(diag, free32)
        matvec = lambda v: _mixed_matvec(soa, state, free32.T, v, use_pallas)  # noqa: E731
        precond = _mixed_precond(inv_blocks, free32, coarse)
        st = pcg_init(matvec, b, preconditioner=precond, tol=tol_eff)
        iter_cap = jnp.minimum(pcg_maxiter, cg_budget - total_cg)
        st = pcg_chunk(matvec, st, preconditioner=precond, maxiter=iter_cap)
        total_cg = total_cg + st.k
        # clamped self-dot: see solvers/linear.pcg_init (TPU sign-noise)
        bnorm = jnp.sqrt(jnp.maximum(jnp.vdot(b, b), 0.0))
        rel = (jnp.sqrt(st.rr) / jnp.maximum(bnorm, 1e-30)).astype(jnp.float64)
        lin_ok = st.ok & (jnp.sqrt(st.rr) <= st.stop)
        # ran out of the per-call budget before reaching lin_tol (NOT a
        # pcg_maxiter exhaustion, which keeps the host loop's acceptance
        # semantics): hand the solve back to the host loop
        hit_budget = (
            ~skip & ~lin_ok & st.ok & (total_cg >= cg_budget)
            & (st.k < pcg_maxiter)
        )
        accept = lin_ok | (rel <= 1e-3)
        failed_n = ~skip & ~accept & ~hit_budget
        cgs = cgs.at[it].set(st.k)
        it_n = it + 1
        done = skip | failed_n | hit_budget | (it_n >= max_newton)
        # on budget exhaustion OR CG breakdown the host loop REDOES this
        # Newton iteration (for breakdown: with its restart + best-iterate
        # machinery, which this device loop deliberately lacks — the
        # 'host-loop fallback on CG failure' of the SolverOptions
        # docstring); the partial CG solution is discarded, so hand back
        # the PRE-iteration forcing value so the redo computes the same eta
        eta_out = jnp.where(hit_budget | failed_n, eta, eta_n)
        return (
            u, st.x, norm, eta_out, norm0, it_n, total_cg, norms, cgs,
            done, conv, failed_n, hit_budget, bad,
        )

    n = u0.shape[0]
    init = (
        u0, jnp.zeros((n, 3), jnp.float32), jnp.ones((), jnp.float64),
        jnp.full((), 0.5, jnp.float64), jnp.ones((), jnp.float64),
        jnp.int32(0), jnp.int32(0), jnp.zeros((max_newton,), jnp.float64),
        jnp.zeros((max_newton,), jnp.int32), jnp.bool_(False),
        jnp.bool_(False), jnp.bool_(False), jnp.bool_(False),
        jnp.bool_(False),
    )
    out = jax.lax.while_loop(lambda c: ~c[9], body, init)
    (u, _x, _pn, eta, norm0, it_n, total_cg, norms, cgs,
     _done, conv, failed, exhausted, poisoned) = out
    return (
        u, norms, cgs, it_n, conv, failed, exhausted, poisoned, eta, norm0,
        total_cg,
    )


_residual_jit = jax.jit(_residual_fn)
_residual_soa_jit = jax.jit(_residual_soa_fn)
_mixed_update_jit = jax.jit(_mixed_update_fn)
_step_direct_jit = jax.jit(_step_direct_fn)
_step_matfree_jit = jax.jit(_step_matfree_fn)
_step_bcsr_jit = jax.jit(_step_bcsr_fn)
_mixed_prepare_jit = jax.jit(_mixed_prepare_fn, static_argnames="use_pallas")
_mixed_chunk_jit = jax.jit(_mixed_chunk_fn, static_argnames="use_pallas")
_mixed_newton_iter_jit = jax.jit(
    _mixed_newton_iter_fn,
    static_argnames=(
        "chunk_iters", "use_pallas", "use_ew", "resid32", "resid_df",
    ),
)
_mixed_solve_jit = jax.jit(
    _mixed_solve_fn,
    static_argnames=("max_newton", "use_pallas", "use_ew", "resid_df"),
)


class NewtonSolver:
    """Total-Lagrangian quasi-static solver for one mesh/material/BC setup.

    Precomputes (host, once): element geometry (gradN, detJxW), the
    deterministic node scatter map, and — for the BCSR path — the sparsity
    structure and assembly scatter map (SURVEY.md §4.5).
    """

    def __init__(
        self,
        mesh: Mesh,
        material: Material,
        bc: DirichletBC,
        f_ext: jnp.ndarray | None = None,
        options: SolverOptions | None = None,
    ):
        self.mesh = mesh
        self.material = material
        self.bc = bc
        self.options = options or SolverOptions()
        #: count of two-level -> block-Jacobi preconditioner fallbacks
        #: taken on CG breakdown (mirror of the sharded solvers' counter)
        self.precond_fallbacks = 0
        if self.options.linear not in ("direct", "pcg", "pcg_bcsr"):
            raise ValueError(f"unknown linear solver {self.options.linear!r}")
        if self.options.pallas and self.options.precision != "mixed":
            raise ValueError(
                "pallas=True requires precision='mixed' (Pallas kernels are "
                "f32-only on this platform — SURVEY.md §9 risk 5)"
            )
        self.element = mesh.element
        self.f_ext = (
            jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype) if f_ext is None else f_ext
        )
        if self.options.linear == "pcg_bcsr":
            self.bcsr = BCSRStructure.build(mesh.conn_host, mesh.n_nodes)
        else:
            self.bcsr = None
        self._pcg_tol = jnp.asarray(self.options.pcg_tol, mesh.coords.dtype)
        self._pcg_maxiter = jnp.asarray(self.options.pcg_maxiter, jnp.int32)
        self._geom = None
        self._scatter = None
        if self.options.precision == "mixed":
            if self.options.linear != "pcg":
                raise ValueError("precision='mixed' requires linear='pcg'")
            from fea_large_tpu.ops.soa import SoAProblem

            import os as _os
            import time as _time

            _timing = _os.environ.get("FEA_SETUP_TIMING")
            _t0 = _time.perf_counter()
            self._soa = SoAProblem.build(mesh, jnp.float32)
            self._soa64 = SoAProblem.build(
                mesh, jnp.float64, share_maps_from=self._soa
            )
            if _timing:
                import sys as _sys

                print(
                    f"[setup] SoAProblem builds: "
                    f"{_time.perf_counter() - _t0:.1f}s",
                    file=_sys.stderr, flush=True,
                )
            # structured-lattice meshes default the f32 tangent action to
            # the FUSED Pallas kernel on the TPU (measured 4.66 -> 0.99
            # ms/matvec at 1M DOF, round 4 — ops/pallas_structured.py);
            # the XLA slice/pad graph fragments into ~155 fusions. Off-TPU
            # the kernel only exists in (slow) interpret mode, so the XLA
            # path remains the default there and `pallas=True` opts in.
            from fea_large_tpu.config import on_tpu
            from fea_large_tpu.ops.pallas_structured import (
                struct_pallas_supported,
            )

            self._pallas = self.options.pallas or (
                on_tpu() and struct_pallas_supported(self._soa)
            )
            # double-word residual routing: auto on TPU where the fused
            # kernel applies; opts.resid_df=True opts in off-TPU
            # (interpret mode — tests), False disables
            from fea_large_tpu.ops.pallas_residual import (
                resid_df_supported,
            )

            supported = resid_df_supported(self._soa, material)
            if self.options.resid_df is None:
                self._resid_df = on_tpu() and supported
            else:
                self._resid_df = self.options.resid_df and supported
            self._material32 = jax.tree.map(
                lambda x: x.astype(jnp.float32), material
            )
            self._pcg_tol32 = jnp.asarray(self.options.pcg_tol, jnp.float32)
            if self.options.preconditioner == "two_level":
                from fea_large_tpu.solvers.multilevel import build_coarse_space

                self._coarse = build_coarse_space(
                    mesh, material, bc, agg_size=self.options.agg_size,
                    modes=self.options.coarse_modes,
                    soa=self._soa,  # device probing assembly (multilevel.py)
                )
            elif self.options.preconditioner == "three_level":
                from fea_large_tpu.solvers.multilevel import build_multilevel_space

                self._coarse = build_multilevel_space(
                    mesh, material, bc,
                    agg_size1=self.options.agg_size or 16,
                )
            else:
                self._coarse = None

    # AoS geometry/scatter are built lazily: the mixed path never needs them
    # (the AoS [E,q,npe,3] f64 gradN table alone pads to ~17x its size on
    # TPU tiles — gigabytes at 1M DOF).
    @property
    def geom(self):
        if self._geom is None:
            self._geom = precompute_geometry(
                self.mesh.coords, self.mesh.conn, self.element
            )
        return self._geom

    @property
    def scatter(self):
        if self._scatter is None:
            self._scatter = NodeScatter.build(self.mesh.conn_host, self.mesh.n_nodes)
        return self._scatter

    # -- device-program wrappers --------------------------------------------
    def _residual(self, u, scale):
        if self.options.precision == "mixed":
            return _residual_soa_jit(
                u, scale, self._soa64, self.material, self.bc, self.f_ext
            )
        return _residual_jit(
            u, scale, self.mesh.conn, self.geom, self.material, self.bc,
            self.f_ext, self.scatter,
        )

    def _step(self, u, scale, lin_tol=None, r64=None):
        if self.options.linear == "direct":
            return _step_direct_jit(
                u, scale, self.mesh.conn, self.geom, self.material, self.bc,
                self.f_ext,
            )
        if self.options.linear == "pcg":
            if self.options.precision == "mixed":
                return self._step_mixed(u, scale, lin_tol, r64=r64)
            tol = self._pcg_tol if lin_tol is None else jnp.asarray(
                lin_tol, self._pcg_tol.dtype
            )
            return _step_matfree_jit(
                u, scale, self.mesh.conn, self.geom, self.material, self.bc,
                self.f_ext, self.scatter, tol, self._pcg_maxiter,
            )
        tol = self._pcg_tol if lin_tol is None else jnp.asarray(
            lin_tol, self._pcg_tol.dtype
        )
        return _step_bcsr_jit(
            u, scale, self.mesh.conn, self.geom, self.material, self.bc,
            self.f_ext, self.scatter, self.bcsr, tol, self._pcg_maxiter,
        )

    def _step_mixed(self, u, scale, lin_tol=None, r64=None):
        """Chunked mixed-precision step: one prepare call, then bounded CG
        chunks driven by the shared host loop (`linear.drive_chunked_pcg`
        — batched syncs, rounding-breakdown restarts, best-iterate
        tracking; the sharded solver reuses the same loop)."""
        free32 = self.bc.free_mask.astype(jnp.float32)
        tol = self._pcg_tol32 if lin_tol is None else jnp.asarray(
            lin_tol, jnp.float32
        )
        cell = {}

        def prepare(x0):
            st, cell["state"], cell["inv_blocks"] = _mixed_prepare_jit(
                u, scale, self._soa64, self._soa, self.material,
                self._material32, self.bc, self.f_ext, tol,
                self._coarse, x0, use_pallas=self._pallas,
                r64=r64,  # u unchanged within the step: stays valid
            )
            return st

        def chunk(st, n):
            return _mixed_chunk_jit(
                st, self._soa, cell["state"], cell["inv_blocks"], free32,
                self._coarse, jnp.int32(n), use_pallas=self._pallas,
            )

        x, total, converged, rel = drive_chunked_pcg(
            prepare, chunk, tol=tol, chunk_iters=self.options.pcg_chunk,
            maxiter=self.options.pcg_maxiter,
        )
        return _mixed_update_jit(u, x), total, converged, rel

    def step_fn(self, u, scale):
        """One jittable Newton step (also used by the driver's compile
        check, __graft_entry__.entry)."""
        if self.options.precision == "mixed":
            # the chunked mixed step is host-orchestrated; expose a single
            # bounded-chunk jittable equivalent for compile checks
            free32 = self.bc.free_mask.astype(jnp.float32)
            st, state, inv_blocks = _mixed_prepare_fn(
                u, scale, self._soa64, self._soa, self.material,
                self._material32, self.bc, self.f_ext, self._pcg_tol32,
                self._coarse, use_pallas=self._pallas,
            )
            st = _mixed_chunk_fn(
                st, self._soa, state, inv_blocks, free32, self._coarse,
                self.options.pcg_chunk, use_pallas=self._pallas,
            )
            return u + st.x.astype(u.dtype), st.k, st.ok, jnp.sqrt(st.rr)
        return self._step(u, scale)

    # -- host control loop ---------------------------------------------------
    def _newton_mixed(self, u, scale) -> tuple[jnp.ndarray, bool, IncrementRecord]:
        """Mixed-precision Newton loop on the FUSED per-iteration program
        (`_mixed_newton_iter_fn`): one device dispatch + one batched
        device_get per Newton iteration. Semantically identical to the
        generic loop below (same EW forcing values — the device mirror
        computes them in the same f64 arithmetic; same convergence and
        bisection behavior), minus two tunnel round trips and one f64
        element pass per iteration."""
        opts = self.options
        t0 = time.perf_counter()
        u = self.bc.impose(u, scale)
        scale = jnp.asarray(scale, u.dtype)
        free32 = self.bc.free_mask.astype(jnp.float32)
        use_ew = opts.forcing == "ew"
        norms, pcg_iters = [], []
        norm0 = None
        stop_n = None
        eta = 0.5
        prev_norm = 1.0
        it0 = 0
        if opts.device_loop:
            budget = opts.device_loop_budget or max(
                50, min(1000, int(2.3e8 / max(self.mesh.n_elements, 1)))
            )
            out = _mixed_solve_jit(
                u, scale, jnp.asarray(opts.newton_rtol, jnp.float64),
                jnp.asarray(opts.newton_atol, jnp.float64), self._pcg_tol32,
                jnp.asarray(opts.ew_eta_min, jnp.float64),
                jnp.asarray(opts.pcg_maxiter, jnp.int32),
                jnp.asarray(budget, jnp.int32),
                self._soa64, self._soa, self.material, self._material32,
                self.bc, self.f_ext, self._coarse,
                max_newton=opts.max_newton, use_pallas=self._pallas,
                use_ew=use_ew, resid_df=self._resid_df,
            )
            u_d = out[0]
            (norms_a, cgs_a, n_it, conv, failed_d, exhausted, poisoned,
             eta_d, norm0_d, _tot) = jax.device_get(out[1:])
            n_it = int(n_it)
            if bool(conv) or bool(poisoned) or (
                not bool(exhausted) and not bool(failed_d)
            ):
                # terminal on device: converged, NaN residual
                # (-> bisection), or max_newton exhausted — the mirror of
                # the host loop's terminal exits. A CG BREAKDOWN is NOT
                # terminal: it falls through to the host loop below, which
                # owns the rounding-breakdown restart + best-iterate
                # machinery the device loop deliberately lacks
                norms = [float(x) for x in norms_a[:n_it]]
                pcg_list = [int(x) for x in cgs_a[:n_it]]
                if bool(conv) or n_it >= opts.max_newton:
                    # converged check ran 0 iters; ditto the skipped
                    # never-applied solve of the max_newton-th iteration
                    pcg_list = pcg_list[:-1]
                rec = IncrementRecord(
                    float(scale), n_it - 1 if bool(conv) else n_it, norms,
                    pcg_list, time.perf_counter() - t0,
                )
                return u_d, bool(conv), rec
            # budget exhausted or CG breakdown mid-solve: continue the SAME
            # Newton sequence on the host-orchestrated loop below, warm-
            # started (the last device iteration is redone; its partial CG
            # is discarded and eta_d is the pre-iteration forcing value)
            u = u_d
            n_use = max(n_it - 1, 0)
            norms = [float(x) for x in norms_a[:n_use]]
            pcg_iters = [int(x) for x in cgs_a[:n_use]]
            if norms:
                norm0 = max(norms[0], 1e-300)
                stop_n = max(opts.newton_rtol * norm0, opts.newton_atol)
                prev_norm = norms[-1]
            eta = float(eta_d)
            it0 = n_use
        x_prev = jnp.zeros((self.mesh.n_nodes, 3), jnp.float32)
        for it in range(it0, opts.max_newton):
            # f32 residual only while far above the f32 rounding floor
            # (see _mixed_newton_iter_fn docstring); late iterations that
            # decide convergence always take the f64 element pass
            resid32 = bool(
                use_ew and norm0 is not None and norms[-1] > 3e-2 * norm0
            )
            stop_dev = jnp.asarray(
                opts.newton_atol if norm0 is None else stop_n, jnp.float64
            )
            u_new, st0, state, inv_blocks, b, norm_a, eta_a, tol_a = (
                _mixed_newton_iter_jit(
                    u, x_prev, scale, jnp.asarray(prev_norm, jnp.float64),
                    jnp.asarray(eta, jnp.float64),
                    jnp.asarray(norm0 is None), stop_dev, self._pcg_tol32,
                    jnp.asarray(opts.ew_eta_min, jnp.float64),
                    self._soa64, self._soa, self.material, self._material32,
                    self.bc, self.f_ext, self._coarse,
                    chunk_iters=min(opts.pcg_chunk, opts.pcg_maxiter),
                    use_pallas=self._pallas,
                    use_ew=use_ew, resid32=resid32,
                    resid_df=self._resid_df,
                )
            )
            # the ONE blocking tunnel round trip of this Newton iteration
            norm, eta_v, tol_v, k0, rr0, ok0, stop0 = jax.device_get(
                (norm_a, eta_a, tol_a, st0.k, st0.rr, st0.ok, st0.stop)
            )
            norm = float(norm)
            u = u_new  # the iterate whose residual was just measured
            if norm != norm:  # NaN: poisoned state; fail -> bisection
                break
            norms.append(norm)
            if norm0 is None:
                norm0 = max(norm, 1e-300)
                stop_n = max(opts.newton_rtol * norm0, opts.newton_atol)
            if norm <= stop_n:
                rec = IncrementRecord(
                    float(scale), it, norms, pcg_iters,
                    time.perf_counter() - t0,
                )
                return u, True, rec
            if it == opts.max_newton - 1:
                # the deferred-update scheme applies x at the start of the
                # NEXT iteration — the final allowed iteration's solve
                # could never be applied, so don't run its continuation
                # (the fused program's first chunk already ran; that part
                # is unavoidable without a second compiled program)
                break
            prev_norm = norm
            eta = float(eta_v)
            cell = {"state": state, "inv_blocks": inv_blocks}

            def prepare(x0, _u=u, _b=b, _tol=float(tol_v)):
                if x0 is None:
                    return st0
                # rounding-breakdown restart (rare): rebuild the Krylov
                # state from the best iterate via the standalone prepare
                st, cell["state"], cell["inv_blocks"] = _mixed_prepare_jit(
                    _u, scale, self._soa64, self._soa, self.material,
                    self._material32, self.bc, self.f_ext,
                    jnp.asarray(_tol, jnp.float32), self._coarse, x0,
                    use_pallas=self._pallas, r64=_b,
                )
                return st

            def chunk(st, n):
                return _mixed_chunk_jit(
                    st, self._soa, cell["state"], cell["inv_blocks"],
                    free32, self._coarse, jnp.int32(n),
                    use_pallas=self._pallas,
                )

            x, lin_iters, lin_ok, lin_rel = drive_chunked_pcg(
                prepare, chunk, tol=float(tol_v),
                chunk_iters=opts.pcg_chunk, maxiter=opts.pcg_maxiter,
                first_fetch=(k0, rr0, ok0, stop0),
            )
            accept = bool(lin_ok) or float(lin_rel) <= 1e-3
            if not accept and self._coarse is not None:
                # two-level CG breakdown: retry THIS solve with plain
                # block-Jacobi (round-4 ADVICE: a bf16/near-indefinite
                # coarse term can break CG while Jacobi alone stays SPD —
                # mirror of the sharded solver's fallback, which this
                # path also serves as the device loop's failure handler)
                def prepare_fb(x0, _u=u, _b=b, _tol=float(tol_v)):
                    st, cell["state"], cell["inv_blocks"] = (
                        _mixed_prepare_jit(
                            _u, scale, self._soa64, self._soa,
                            self.material, self._material32, self.bc,
                            self.f_ext, jnp.asarray(_tol, jnp.float32),
                            None, x0, use_pallas=self._pallas, r64=_b,
                        )
                    )
                    return st

                def chunk_fb(st, n):
                    return _mixed_chunk_jit(
                        st, self._soa, cell["state"], cell["inv_blocks"],
                        free32, None, jnp.int32(n),
                        use_pallas=self._pallas,
                    )

                x_fb, it_fb, ok_fb, rel_fb = drive_chunked_pcg(
                    prepare_fb, chunk_fb, tol=float(tol_v),
                    chunk_iters=opts.pcg_chunk, maxiter=opts.pcg_maxiter,
                )
                self.precond_fallbacks += 1
                lin_iters = int(lin_iters) + int(it_fb)
                accept = bool(ok_fb) or float(rel_fb) <= 1e-3
                if accept:
                    x = x_fb
            pcg_iters.append(int(lin_iters))
            x_prev = x
            # acceptance: see the generic loop below (inexact Newton
            # tolerates stagnation that made substantial progress)
            if not accept:
                break
        rec = IncrementRecord(
            float(scale), len(norms), norms, pcg_iters,
            time.perf_counter() - t0,
        )
        return u, False, rec

    def _newton(self, u, scale) -> tuple[jnp.ndarray, bool, IncrementRecord]:
        """Newton iteration at fixed load factor `scale` (§5.6)."""
        opts = self.options
        if opts.precision == "mixed" and opts.linear == "pcg":
            return self._newton_mixed(u, scale)
        t0 = time.perf_counter()
        u = self.bc.impose(u, scale)
        norms, pcg_iters = [], []
        norm0 = None
        eta = 0.5  # Eisenstat-Walker initial forcing
        lin_failed = False
        for it in range(opts.max_newton):
            r64, norm = self._residual(u, scale)
            norm = float(norm)
            if norm != norm:  # NaN: poisoned state; fail -> bisection retries
                break
            norms.append(norm)
            if norm0 is None:
                norm0 = max(norm, 1e-300)
            stop_n = max(opts.newton_rtol * norm0, opts.newton_atol)
            if norm <= stop_n:
                rec = IncrementRecord(
                    float(scale), it, norms, pcg_iters, time.perf_counter() - t0
                )
                return u, True, rec
            # The previous linear solve self-reported failure — but the
            # Newton residual is the real arbiter: if that direction still
            # halved |R| (typical when PCG merely hit its rounding floor
            # short of an over-tight requested tolerance), keep iterating;
            # abort only when a flagged direction also made no real
            # progress (genuinely indefinite tangent -> bisection, §7.3).
            if lin_failed and norm > 0.5 * norms[-2]:
                break
            lin_tol = None
            if opts.linear != "direct":
                lin_tol, eta = newton_lin_tol(opts, it, norms, norm0, eta)
            u, lin_iters, lin_ok, lin_rel = self._step(
                u, scale, lin_tol, r64=r64
            )
            pcg_iters.append(int(lin_iters))
            # Inexact-Newton tolerance to stagnation: a PCG stop before the
            # requested tolerance (rounding-level breakdown when tol*||b||
            # sits below achievable precision, or maxiter) still yields a
            # usable direction if it reduced the linear residual
            # substantially (checked here), or if the next Newton residual
            # shows real progress (checked above). `lin_rel` is NaN-safe
            # False on comparison, so a poisoned recurrence is never
            # accepted on its own say-so.
            lin_failed = not (bool(lin_ok) or float(lin_rel) <= 1e-3)
        rec = IncrementRecord(
            float(scale), len(norms), norms, pcg_iters, time.perf_counter() - t0
        )
        return u, False, rec

    def solve(
        self,
        u0: jnp.ndarray | None = None,
        callback=None,
        start_factor: float = 0.0,
    ) -> SolveResult:
        """Incremental loading from `start_factor` to 1 in `n_steps`
        increments, with automatic bisection on Newton failure (§7.3).
        `callback(record, u)` fires after each converged increment — the
        checkpoint hook (§7.4)."""
        opts = self.options
        u = (
            jnp.zeros((self.mesh.n_nodes, 3), self.mesh.coords.dtype)
            if u0 is None
            else u0
        )
        history: list[IncrementRecord] = []
        lam = float(start_factor)
        # nominal increment of the GLOBAL schedule — resume continues the
        # same load stations as the uninterrupted run (§7.4 bit-match)
        dlam_nominal = 1.0 / opts.n_steps
        dlam = dlam_nominal
        bisections = 0
        while lam < 1.0 - 1e-12:
            target = min(lam + dlam, 1.0)
            u_try, ok, rec = self._newton(u, target)
            if ok:
                u, lam = u_try, target
                history.append(rec)
                if callback is not None:
                    callback(rec, u)
                # recover the nominal increment after a successful bisected step
                dlam = min(2.0 * dlam, dlam_nominal, 1.0 - lam)
                if dlam <= 0.0:
                    dlam = 1.0 - lam
                bisections = 0
            else:
                history.append(rec)
                bisections += 1
                if bisections > opts.max_bisections:
                    return SolveResult(u=u, converged=False, history=history)
                dlam *= 0.5
        return SolveResult(u=u, converged=True, history=history)
