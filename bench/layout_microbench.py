"""Layout microbench: PCG vector ops in AoS [N, 3] vs component-first
[3, N] on TPU.

Motivation (CLAUDE.md): rank-2 f32 arrays tile onto (8, 128) — a minor
dim of 3 pads 3 -> 128 lanes (~42x memory stream blowup), while [3, N]
pads only 3 -> 8 sublanes (~2.7x). The mixed-PCG state (x, r, z, p) and
every axpy/dot/Jacobi touch stream these vectors once per CG iteration,
so the layout sets the non-matvec per-iteration floor.

Run: python bench/layout_microbench.py [n]   (TET10 box resolution)
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def loop_time(body, v0, reps=50):
    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, reps, lambda i, vv: body(vv), v)

    jax.block_until_ready(run(v0))
    t1 = time.perf_counter()
    jax.block_until_ready(run(v0))
    return (time.perf_counter() - t1) / reps


def main(n_nodes=342_361):
    key = jax.random.PRNGKey(0)
    a_aos = jax.random.normal(key, (n_nodes, 3), jnp.float32)
    b_aos = jax.random.normal(key, (n_nodes, 3), jnp.float32)
    a_t = a_aos.T.copy()
    b_t = b_aos.T.copy()
    inv_aos = jax.random.normal(key, (n_nodes, 3, 3), jnp.float32)
    inv_t = jnp.transpose(inv_aos, (1, 2, 0)).copy()
    m_aos = jnp.ones((n_nodes, 3), jnp.float32)
    m_t = m_aos.T.copy()

    phases = {
        # axpy + dot pair: the per-CG-iteration vector work unit
        "axpy_dot_aos_N3": loop_time(
            lambda v: v * 0.999 + 1e-12 * jnp.vdot(v, b_aos) + 1e-30 * b_aos,
            a_aos,
        ),
        "axpy_dot_t_3N": loop_time(
            lambda v: v * 0.999 + 1e-12 * jnp.vdot(v, b_t) + 1e-30 * b_t,
            a_t,
        ),
        # block-Jacobi apply in each layout
        "jacobi_aos_N3": loop_time(
            lambda v: jnp.einsum("nij,nj->ni", inv_aos, v * m_aos) * m_aos
            + 1e-30 * b_aos,
            a_aos,
        ),
        "jacobi_t_3N": loop_time(
            lambda v: jnp.einsum("ijn,jn->in", inv_t, v * m_t) * m_t
            + 1e-30 * b_t,
            a_t,
        ),
        # the transpose itself (what the matvec pays per call today)
        "transpose_N3_to_3N": loop_time(
            lambda v: (v.T * 0.999).T + 1e-30 * b_aos, a_aos
        ),
    }
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "backend": jax.default_backend(),
                "phase_ms": {k: round(v * 1e3, 3) for k, v in phases.items()},
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 342_361)
