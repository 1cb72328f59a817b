"""Linear solvers: dense Cholesky and Jacobi-preconditioned CG (SURVEY.md
C11/C12).

* Dense direct (config 1, BASELINE.json:7): masked SPD system via
  `jax.scipy.linalg.cho_solve`. Cholesky is the ONLY f64 dense factorization
  available on this TPU (f64 LU unimplemented — SURVEY.md §9 risk 5); K
  restricted to free DOFs is SPD for the stable problems in scope, so this is
  also the right factorization.

* PCG (configs 2/4/5, BASELINE.json:8,10,11): `lax.while_loop` over an
  abstract SPD operator (assembled BCSR SpMV, matrix-free tangent action, or
  their sharded variants), preconditioned by the inverse nodal 3x3 diagonal
  blocks (block-Jacobi — the binding preconditioner, BASELINE.json:8; ILU is
  deliberately NOT ported: sequential triangular solves are TPU-hostile,
  SURVEY.md C12).

The reference's PCG loop structure (SURVEY.md §4.3) is preserved exactly;
only the hosting changes (while_loop + fused XLA axpy/dots, `psum` for the
dots when sharded).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from fea_large_tpu.ops.smallmat import inv3


def dense_cholesky_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD A x = b (flattened DOF vectors) by Cholesky."""
    c, low = jsl.cho_factor(A, lower=True)
    return jsl.cho_solve((c, low), b)


def jacobi_inverse_blocks(
    diag_blocks: jnp.ndarray, free_mask: jnp.ndarray
) -> jnp.ndarray:
    """Inverted (masked) nodal 3x3 diagonal blocks [N,3,3].

    Fixed DOFs are handled by masking: rows/cols of prescribed DOFs are
    replaced by identity before the 3x3 inversion, so M^{-1} acts as the
    identity there and preserves the masked-system structure (bc.py).
    """
    m = free_mask  # [N, 3]
    outer = m[:, :, None] * m[:, None, :]
    eye = jnp.eye(3, dtype=diag_blocks.dtype)
    masked = diag_blocks * outer + (eye - eye * outer)
    return inv3(masked)


def apply_block_jacobi(inv_blocks, free_mask, r):
    return jnp.einsum("nij,nj->ni", inv_blocks, r * free_mask) * free_mask


def apply_block_jacobi_T(inv_blocks, free_T, r_T):
    """Component-first mirror of `apply_block_jacobi`: r_T/free_T [3, N],
    inv_blocks [N, 3, 3] unchanged (the einsum contracts equally fast
    from either operand layout — measured 0.61 vs 0.68 ms at 1M DOF).
    Production PCG stays AoS (the [3, N]-state variant benched 2.4%
    slower end-to-end — CoarseSpace.apply_T docstring); this is the
    breakdown-bench subject for that comparison."""
    return jnp.einsum("nij,jn->in", inv_blocks, r_T * free_T) * free_T


def block_jacobi_preconditioner(
    diag_blocks: jnp.ndarray, free_mask: jnp.ndarray
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Preconditioner apply closure (see `jacobi_inverse_blocks`)."""
    inv_blocks = jacobi_inverse_blocks(diag_blocks, free_mask)

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        return apply_block_jacobi(inv_blocks, free_mask, r)

    return apply


class PCGResult(NamedTuple):
    x: jnp.ndarray  # solution [N, 3]
    iterations: jnp.ndarray  # i32 scalar
    residual_norm: jnp.ndarray  # final ||r||_2
    converged: jnp.ndarray  # bool scalar


class PCGState(NamedTuple):
    """Exact CG state, resumable across device calls (chunked execution:
    long single device executions are killed on tunneled TPU backends, and
    the host loop costs one dispatch per chunk)."""

    x: jnp.ndarray
    r: jnp.ndarray
    z: jnp.ndarray
    p: jnp.ndarray
    rz: jnp.ndarray
    rr: jnp.ndarray
    k: jnp.ndarray  # i32 iteration count
    ok: jnp.ndarray  # bool: no breakdown
    stop: jnp.ndarray  # cached max(tol*||b||, atol)


def pcg_init(matvec, b, preconditioner=None, x0=None, tol=1e-10, atol=0.0, dot=None):
    if preconditioner is None:
        preconditioner = lambda r: r  # noqa: E731
    if dot is None:
        dot = lambda a, c: jnp.vdot(a, c)  # noqa: E731
    # Self-dots are mathematically non-negative, but TPU's emulated f64/f32
    # dot reductions can round them to TINY NEGATIVES near the recurrence
    # floor (measured: vdot(r, r) = -6.2e-33 at true rel ~5e-12 on v5e),
    # after which sqrt(rr) is NaN, the while_loop cond goes permanently
    # False, and the solve reports a poisoned rel. Clamping to 0 is exact:
    # a clamped value only ever replaces sign-noise around zero.
    b_norm = jnp.sqrt(jnp.maximum(dot(b, b), 0.0))
    stop = jnp.maximum(tol * b_norm, atol)
    if x0 is None:
        # from-zero start: r0 = b exactly — skip the matvec of zeros
        # (34 ms of pure scalar-core gather/scatter per 1M-DOF Newton step)
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - matvec(x0)
    z0 = preconditioner(r0)
    return PCGState(
        x=x0, r=r0, z=z0, p=z0,
        rz=jnp.maximum(dot(r0, z0), 0.0),
        rr=jnp.maximum(dot(r0, r0), 0.0),
        k=jnp.int32(0), ok=jnp.bool_(True), stop=stop,
    )


def pcg_chunk(matvec, state: PCGState, preconditioner=None, dot=None,
              maxiter=100) -> PCGState:
    """Run up to `maxiter` further CG iterations (stops early on
    convergence/breakdown); exact continuation of the Krylov recurrence."""
    if preconditioner is None:
        preconditioner = lambda r: r  # noqa: E731
    if dot is None:
        dot = lambda a, c: jnp.vdot(a, c)  # noqa: E731
    k0 = state.k

    def cond(s):
        # isfinite: stop immediately if rounding blew the recurrence up
        # (e.g. a stop target below achievable precision) instead of
        # churning to maxiter on NaNs
        return (
            s.ok & (s.k < k0 + maxiter) & (jnp.sqrt(s.rr) > s.stop)
            & jnp.isfinite(s.rr)
        )

    def body(s):
        q = matvec(s.p)
        pq = dot(s.p, q)
        ok = s.ok & (pq > 0.0)  # breakdown guard: K must be SPD
        # scalar coefficients are cast to the VECTOR dtype (no-op for the
        # shipped dots): an injected f64-accumulating `dot` must not
        # promote the f32 iterates to f64 arrays through the axpys
        alpha = jnp.where(pq > 0.0, s.rz / pq, 0.0).astype(s.p.dtype)
        x = s.x + alpha * s.p
        r = s.r - alpha * q
        z = preconditioner(r)
        # clamp the non-negative-by-math dots: see pcg_init (TPU emulated
        # dots can produce sign-noise negatives at the recurrence floor,
        # and sqrt(negative) freezes the cond with a NaN)
        rz_new = jnp.maximum(dot(r, z), 0.0)
        rr_new = jnp.maximum(dot(r, r), 0.0)
        beta = jnp.where(s.rz != 0.0, rz_new / s.rz, 0.0).astype(s.p.dtype)
        p = z + beta * s.p
        return PCGState(x, r, z, p, rz_new, rr_new, s.k + 1, ok, s.stop)

    st = jax.lax.while_loop(cond, body, state)
    # a non-finite rr (overflow from a near-breakdown huge alpha) exits the
    # cond above with ok still True; report it AS a breakdown so host chunk
    # loops take their restart/abort path instead of re-dispatching no-op
    # chunks forever (found by review: the cond is immediately False again)
    return st._replace(ok=st.ok & jnp.isfinite(st.rr))


def drive_chunked_pcg(prepare, chunk, *, tol, chunk_iters, maxiter,
                      first_fetch=None):
    """Host-orchestrated chunked PCG: the SHARED control loop of the
    single-device mixed path and the sharded path (they previously
    duplicated ~80 lines and drifted — round-2 review).

    `prepare(x0)` (re)builds the Krylov state (x0=None → from zero);
    `chunk(st, n)` runs up to n further iterations (a fixed-size chunk
    program may ignore n). Behavior:
      * ONE batched device->host fetch of (k, rr, ok, stop) per chunk
        (each blocking float() is a ~30 ms tunnel round trip);
      * up to 2 restarts on rounding-level breakdown (substantial
        reduction achieved, rel <= 1e-2) — a restart rebuilds the Krylov
        state from the best iterate with a FRESH residual b - A x, the
        standard remedy when the f32 recurrence hits its rounding floor
        (the drifted recurrence residual, not the operator, is what broke
        down); an early breakdown at rel ~O(1) signals a genuinely
        indefinite operator and is the caller's load-step-bisection case;
      * best-iterate tracking: f32 CG can LOSE ground after hitting its
        rounding floor; the best chunk-boundary iterate is returned when
        the final one is worse (NaN-safe), and restarts resume from it.

    `first_fetch=(k, rr, ok, stop)` hands in control scalars the caller
    already fetched for the state `prepare(None)` returns (the fused
    Newton-iteration program batches them with its own outputs — one
    blocking tunnel round trip per Newton iteration instead of two).

    Returns (x, total_iters i32, converged bool_, rel float).
    """
    import math

    st = prepare(None)
    done_iters = 0
    restarts = 0
    bnorm = None
    best = None
    while True:
        if first_fetch is not None:
            st_k, st_rr, st_ok, st_stop = first_fetch
            first_fetch = None
        else:
            st_k, st_rr, st_ok, st_stop = jax.device_get(
                (st.k, st.rr, st.ok, st.stop)
            )
        if bnorm is None:  # pcg_init: stop = tol * ||b||
            bnorm = float(st_stop) / float(tol)
        k = done_iters + int(st_k)
        rnorm = math.sqrt(float(st_rr))
        rel = rnorm / max(bnorm, 1e-300)
        if best is None or rel < best[0]:
            best = (rel, st.x)
        if (bool(st_ok) and rnorm <= float(st_stop)) or (k >= maxiter):
            break
        if not bool(st_ok):
            if restarts >= 2 or rel > 1e-2:
                break
            restarts += 1
            done_iters = k
            st = prepare(best[1] if best else st.x)
            continue
        st = chunk(st, min(chunk_iters, maxiter - k))
    converged = bool(st_ok) and rnorm <= float(st_stop)
    total = jnp.int32(done_iters) + st.k
    x = st.x
    # `not (rel <= best)` rather than `best < rel`: a NaN rel (overflow
    # breakdown) must also fall back to the best finite iterate
    if best is not None and not (rel <= best[0]):
        rel, x = best
    return x, total, jnp.bool_(converged), rel


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    preconditioner: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 1000,
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
) -> PCGResult:
    """Preconditioned conjugate gradients under `lax.while_loop`.

    `matvec` must be the MASKED operator (identity on fixed DOFs) and `b`
    masked accordingly; then the iterates never leave the free subspace.
    `dot` is injectable so the sharded path can use a `psum`-reducing dot
    (SURVEY.md §4.3 "+psum across shards").

    Termination: ||r|| <= max(tol * ||b||, atol), plus a breakdown guard on
    p^T K p <= 0 (SURVEY.md §7.3).
    """
    state = pcg_init(
        matvec, b, preconditioner=preconditioner, x0=x0, tol=tol, atol=atol, dot=dot
    )
    state = pcg_chunk(
        matvec, state, preconditioner=preconditioner, dot=dot, maxiter=maxiter
    )
    r_norm = jnp.sqrt(state.rr)
    return PCGResult(
        x=state.x,
        iterations=state.k,
        residual_norm=r_norm,
        converged=state.ok & (r_norm <= state.stop),
    )
