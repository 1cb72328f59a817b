"""Node/element-reordering experiment (VERDICT round-1 weak item 1d).

Hypothesis: RCM-style node renumbering improves scalar-core gather/scatter
locality in the per-iteration tangent action (the measured per-PCG-iteration
floor — CLAUDE.md). Measures the in-loop f32 matvec under three orderings:

  natural  — the box-mesh generator order (lexicographic: already local)
  rcm      — reverse Cuthill-McKee on the node adjacency, elements sorted
             by their minimum renumbered node
  random   — a random node permutation (locality worst case, bounds the
             sensitivity of the hardware to ordering)

Run: python bench/reorder_experiment.py [n]  (TET10 box, default 36 = 1M DOF)
Result recorded in BENCH_NOTES.md whether it wins or loses.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.mesh.core import Mesh
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.ops.soa import SoAProblem, soa_apply_tangent, soa_freeze


def loop_time(body, v0, reps=20):
    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, reps, lambda i, v: body(v), v0)

    jax.block_until_ready(run(v0))
    t1 = time.perf_counter()
    jax.block_until_ready(run(v0))
    return (time.perf_counter() - t1) / reps


from fea_large_tpu.mesh.reorder import renumber_nodes as renumber
from fea_large_tpu.mesh.reorder import rcm_permutation as rcm_perm


def time_matvec(mesh: Mesh) -> float:
    mat32 = NeoHookean(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32))
    soa = SoAProblem.build(mesh, jnp.float32)
    u32_T = jnp.zeros((3, mesh.n_nodes), jnp.float32)
    state = jax.block_until_ready(jax.jit(soa_freeze)(soa, mat32, u32_T))

    def body(v):
        y = soa_apply_tangent(soa, state, v)
        return y * 0.999

    v0 = jnp.ones((3, mesh.n_nodes), jnp.float32)
    return loop_time(body, v0)


def main(n=36):
    mesh = box_mesh(n, n, n, element_type="tet10")
    rng = np.random.default_rng(0)
    results = {}
    t0 = time.perf_counter()
    results["natural"] = time_matvec(mesh)
    print(f"natural: {results['natural']*1e3:.1f} ms "
          f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)
    results["rcm"] = time_matvec(renumber(mesh, rcm_perm(mesh)))
    print(f"rcm: {results['rcm']*1e3:.1f} ms", file=sys.stderr, flush=True)
    results["random"] = time_matvec(
        renumber(mesh, rng.permutation(mesh.n_nodes))
    )
    print(f"random: {results['random']*1e3:.1f} ms", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "n_dof": mesh.n_dof,
                "backend": jax.default_backend(),
                "matvec_ms": {k: round(v * 1e3, 2) for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 36)
