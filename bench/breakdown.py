"""Phase-level benchmark breakdown (SURVEY.md C21): times the residual
pass, tangent freeze, PCG matvec, and preconditioner apply separately at a
given problem size, and emits a regression-trackable JSON record.

Run: python bench/breakdown.py [n]   (TET10 box resolution, default 16)
Timings use in-loop repetition (standalone dispatch costs ~30 ms on the
tunneled backend — CLAUDE.md).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.ops.soa import (
    SoAProblem,
    soa_apply_tangent,
    soa_diag_blocks,
    soa_freeze,
    soa_internal_force,
)
from fea_large_tpu.ops.pallas_structured import (
    soa_apply_tangent_struct_pallas as _struct_pallas,
    struct_pallas_supported as _struct_ok,
)
from fea_large_tpu.ops.pallas_residual import (
    resid_df_supported as _df_ok,
    soa_internal_force_df as _df_force,
)
from fea_large_tpu.ops.pallas_kernels import (
    soa_apply_tangent_pallas as _apply_pallas,
    soa_freeze_pallas as _freeze_pallas,
    soa_internal_force_pallas as _force_pallas,
)
from fea_large_tpu.solvers.linear import apply_block_jacobi, jacobi_inverse_blocks


def loop_time(body, v0, reps=20):
    @jax.jit
    def run(v):
        # loop over the ARGUMENT (an earlier version looped over the
        # closure-captured v0, letting XLA constant-fold entire phases —
        # the matvec_f32 row once "measured" 10 us)
        return jax.lax.fori_loop(0, reps, lambda i, vv: body(vv), v)

    jax.block_until_ready(run(v0))
    t1 = time.perf_counter()
    jax.block_until_ready(run(v0))
    return (time.perf_counter() - t1) / reps


def _xla_matvec_time(soa32, state, v0):
    from fea_large_tpu.ops import soa as _soa_mod

    orig = _soa_mod._struct_fused
    _soa_mod._struct_fused = lambda p: False
    try:

        def dep(v, x):
            return v * 0.999 + (1e-12 * jnp.sum(x)).astype(v.dtype)

        return loop_time(
            lambda v: dep(v, soa_apply_tangent(soa32, state, v.T)), v0
        )
    finally:
        _soa_mod._struct_fused = orig


def main(n=16):
    import os

    if os.environ.get("FEA_BENCH_MESH") == "kuhn":
        from fea_large_tpu.mesh.generators import box_mesh_kuhn

        mesh = box_mesh_kuhn(n, n, n, element_type="tet10")
    else:
        mesh = box_mesh(n, n, n, element_type="tet10")
    mat64 = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    mat32 = NeoHookean(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    soa64 = SoAProblem.build(mesh, jnp.float64)
    soa32 = SoAProblem.build(mesh, jnp.float32)
    u = jnp.zeros((mesh.n_nodes, 3)).at[:, 2].set(-0.05 * mesh.coords[:, 2])
    u = bc.impose(u, 1.0)
    u32_T = u.astype(jnp.float32).T
    free32 = bc.free_mask.astype(jnp.float32)

    state = jax.block_until_ready(jax.jit(soa_freeze)(soa32, mat32, u32_T))
    diag = jnp.transpose(soa_diag_blocks(soa32, state), (2, 0, 1))
    inv_blocks = jax.block_until_ready(jacobi_inverse_blocks(diag, free32))
    v0 = jnp.ones((mesh.n_nodes, 3), jnp.float32)

    def dep(v, x):  # consume x so nothing is dead-code-eliminated
        return v * 0.999 + (1e-12 * jnp.sum(x)).astype(v.dtype)

    phases = {
        "residual_f64_element_pass": loop_time(
            lambda v: dep(
                v,
                soa_internal_force(
                    soa64, soa_freeze(soa64, mat64, v.T.astype(jnp.float64))
                ),
            ),
            v0,
            reps=5,
        ),
        "freeze_f32": loop_time(
            lambda v: dep(v, soa_freeze(soa32, mat32, v.T).S), v0, reps=10
        ),
        # the XLA mirror explicitly (soa_apply_tangent routes to the fused
        # kernel on TPU lattices since round 5 — keep this row's meaning)
        "matvec_f32": _xla_matvec_time(soa32, state, v0),
        # the fused structured Pallas kernel when the mesh supports it
        # (ops/pallas_structured.py — the round-4 TPU default)
        **(
            {
                "matvec_pallas_fused": loop_time(
                    lambda v: dep(
                        v, _struct_pallas(soa32, state, v.T)
                    ),
                    v0,
                )
            }
            if _struct_ok(soa32)
            else {}
        ),
        "jacobi_apply": loop_time(
            lambda v: dep(v, apply_block_jacobi(inv_blocks, free32, v)), v0
        ),
        # double-word residual pass (ops/pallas_residual.py, round 5):
        # the in-increment replacement for the f64 element pass above
        **(
            {
                "residual_df_pass": loop_time(
                    lambda v: dep(
                        v,
                        _df_force(
                            soa32, mat64, v.T.astype(jnp.float64),
                            p64=soa64,
                        ),
                    ),
                    v0,
                    reps=5,
                )
            }
            if _df_ok(soa32, mat64)
            else {}
        ),
        # unstructured Pallas element kernels head-to-head (round-5 item
        # 6 adjudication; on structured meshes these route to the fused
        # kernels and duplicate rows above, so only bench them on 5tet)
        **(
            {
                "freeze_pallas": loop_time(
                    lambda v: dep(
                        v, _freeze_pallas(soa32, mat32, v.T).S
                    ),
                    v0,
                    reps=10,
                ),
                "matvec_pallas_unstr": loop_time(
                    lambda v: dep(
                        v, _apply_pallas(soa32, state, v.T)
                    ),
                    v0,
                ),
                "force_pallas_from_state": loop_time(
                    lambda v: dep(v, _force_pallas(soa32, state)),
                    v0,
                    reps=10,
                ),
            }
            if soa32.structure is None
            else {}
        ),
        # f32 internal force from an existing freeze state — the cost of a
        # resid32 residual pass (round-3 fused Newton iteration) on top of
        # the freeze the tangent needs anyway
        "force_f32_from_state": loop_time(
            lambda v: dep(v, soa_internal_force(soa32, state)), v0, reps=10
        ),
        # prepare-phase cost: nodal 3x3 diagonal blocks for block-Jacobi
        "diag_blocks_f32": loop_time(
            lambda v: dep(v, soa_diag_blocks(soa32, state)), v0, reps=10
        ),
    }
    import os

    if os.environ.get("FEA_BREAKDOWN_COARSE"):
        # two-level RBM coarse apply + a full PCG iteration body (matvec +
        # coarse + Jacobi + the 3 dots/axpys) — the round-3 profile memo's
        # per-iteration phase table. The coarse pytree (1 GB dense factor
        # at 1M DOF) must be an ARGUMENT, not a closure constant — baked
        # constants blow the remote-compile request limit (CLAUDE.md).
        from fea_large_tpu.solvers.multilevel import build_coarse_space

        coarse = build_coarse_space(mesh, mat64, bc, modes=6, soa=soa32)

        def loop_time_args(body, v0, a, reps=20):
            @jax.jit
            def run(v, a):
                return jax.lax.fori_loop(0, reps, lambda i, v: body(v, a), v)

            jax.block_until_ready(run(v0, a))
            t1 = time.perf_counter()
            jax.block_until_ready(run(v0, a))
            return (time.perf_counter() - t1) / reps

        phases["coarse_apply"] = loop_time_args(
            lambda v, c: dep(v, c.apply(v)), v0, coarse
        )

        def pcg_iter_body(v, a):
            c, st, ib = a
            q = soa_apply_tangent(soa32, st, v.T).T
            pq = jnp.vdot(v, q)
            alpha = 1.0 / jnp.maximum(pq, 1e-30)
            r = v - alpha * q
            z = apply_block_jacobi(ib, free32, r) + free32 * c.apply(r)
            rz = jnp.vdot(r, z)
            return z + (1e-12 * rz).astype(v.dtype) * v

        phases["full_pcg_iteration"] = loop_time_args(
            pcg_iter_body, v0, (coarse, state, inv_blocks)
        )

        # component-first mirrors (measured ALTERNATIVE, not production:
        # the [3, N]-state PCG benched 2.4% slower end-to-end despite
        # these bodies tying — CoarseSpace.apply_T docstring /
        # BENCH_NOTES.md round-3 layout study): coarse apply_T and the
        # [3, N] body with f64-accumulated dots
        from fea_large_tpu.solvers.linear import apply_block_jacobi_T

        def _dot64(a, b):
            # f32 products, f64-accumulating fused reduce (the form that
            # is standalone-free; f64 OPERANDS cost 6.9 ms/dot)
            return jnp.sum(a * b, dtype=jnp.float64)

        v0T = v0.T.copy()
        free32_T = free32.T.copy()

        phases["coarse_apply_T"] = loop_time_args(
            lambda v, c: dep(v, c.apply_T(v)), v0T, coarse
        )

        def pcg_iter_body_T(v, a):
            c, st, ib = a
            q = soa_apply_tangent(soa32, st, v)
            pq = _dot64(v, q)
            alpha = (1.0 / jnp.maximum(pq, 1e-30)).astype(v.dtype)
            r = v - alpha * q
            z = apply_block_jacobi_T(ib, free32_T, r) + free32_T * c.apply_T(r)
            rz = _dot64(r, z)
            return z + (1e-12 * rz).astype(v.dtype) * v

        phases["full_pcg_iteration_T"] = loop_time_args(
            pcg_iter_body_T, v0T, (coarse, state, inv_blocks)
        )
    if jax.default_backend() == "tpu":
        # Pallas element-block kernels vs the XLA SoA path, in-loop
        # (interpret mode off-TPU is orders slower — skip there)
        from fea_large_tpu.ops.pallas_kernels import (
            soa_apply_tangent_pallas,
            soa_freeze_pallas,
        )

        phases["matvec_f32_pallas"] = loop_time(
            lambda v: dep(v, soa_apply_tangent_pallas(soa32, state, v.T)), v0
        )
        phases["freeze_f32_pallas"] = loop_time(
            lambda v: dep(v, soa_freeze_pallas(soa32, mat32, v.T).S), v0,
            reps=10,
        )
    record = {
        "n_dof": mesh.n_dof,
        "n_elements": mesh.n_elements,
        "backend": jax.default_backend(),
        "phase_seconds": {k: round(v, 5) for k, v in phases.items()},
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
