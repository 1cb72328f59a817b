"""Per-iteration cost of the STRUCTURED sharded PCG program vs the general
(indexed) sharded program, same Kuhn mesh, same process — the distributed
analog of the single-device structured-vs-unstructured measurement
(BENCH_NOTES round 3: 11.2 vs 35.6 ms/iter at ~1M DOF).

On the TPU this runs both programs over a 1-device mesh (the only real
chip): the boundary-plane ppermutes are self-hops, but the element passes,
ownership-weighted dots, and coarse machinery are the full config-5 code
paths, so the delta isolates the per-shard compute cost (indexed
gather/scatter + halo maps vs static slices/pads). On CPU with virtual
devices it exercises the real multi-hop exchange (relative numbers only).

agg_size is pinned so the coarse dimension stays small (~500 aggregates):
the coarse APPLY cost is identical on both paths by construction, and a
small coarse keeps the setup (probe + inverse build) out of the way of the
per-iteration measurement.

Run: python bench/structured_sharded_iteration.py [n]  (Kuhn box resolution,
default 22 -> ~260k DOF TET10)
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
from fea_large_tpu.dist.sharded import ShardedNewtonSolver
from fea_large_tpu.dist.structured_solver import StructuredShardedSolver
from fea_large_tpu.mesh.generators import box_mesh_kuhn
from fea_large_tpu.solvers.newton import SolverOptions


def timed(fn, *args, reps=3, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def measure(solver, u_glob, scale, label, rec):
    t1 = time.perf_counter()
    u = solver.u_from_global(jnp.asarray(u_glob))
    u = solver._impose(solver.data, u, scale)
    sst, sstate, sinv = solver._prepare(
        solver.data, solver.soa, solver.coarse, u, scale,
        jnp.asarray(1e-30, solver._pcg_dtype), jnp.zeros_like(u),
    )
    sst = jax.block_until_ready(sst)
    print(
        f"{label} prepare: ({time.perf_counter()-t1:.1f}s incl. compile)",
        file=sys.stderr, flush=True,
    )

    def chunk50(s):
        return solver._chunk(
            solver.data, solver.soa, solver.coarse, s, sstate, sinv,
            jnp.int32(50),
        )

    dt, sout = timed(chunk50, sst, reps=3)
    rec[f"{label}_ms_per_iter"] = round(dt / int(sout.k - sst.k) * 1e3, 2)
    print(
        f"{label} chunk: {rec[f'{label}_ms_per_iter']} ms/iter",
        file=sys.stderr, flush=True,
    )


def main(n=22):
    devices = jax.devices()
    # ~500 aggregates at any n: agg_size scales with nodes (see module doc)
    n_nodes_est = (n + 1) ** 3 + 7 * n**3
    opts = SolverOptions(
        linear="pcg", precision="mixed", preconditioner="two_level",
        coarse_modes=6, agg_size=max(n_nodes_est // 512, 16),
        pcg_tol=1e-12, pcg_maxiter=2000,
    )
    t0 = time.perf_counter()
    mesh = box_mesh_kuhn(n, n, n, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    rec = {"n_dof": mesh.n_dof, "backend": jax.default_backend(),
           "n_devices": len(devices)}
    print(
        f"mesh: {mesh.n_dof} DOFs (kuhn) on {len(devices)} "
        f"{jax.default_backend()} device(s) ({time.perf_counter()-t0:.1f}s)",
        file=sys.stderr, flush=True,
    )
    scale = jnp.asarray(1.0, mesh.coords.dtype)
    import numpy as np

    coords = np.asarray(mesh.coords_host)
    u_glob = np.zeros((mesh.n_nodes, 3))
    u_glob[:, 2] = -0.05 * coords[:, 2] / coords[:, 2].max()

    t1 = time.perf_counter()
    s_struct = StructuredShardedSolver(mesh, mat, bc, options=opts, devices=devices)
    print(
        f"structured setup {time.perf_counter()-t1:.1f}s "
        f"(coarse Nc={s_struct._n_agg})", file=sys.stderr, flush=True,
    )
    measure(s_struct, u_glob, scale, "structured", rec)
    del s_struct

    t1 = time.perf_counter()
    s_gen = ShardedNewtonSolver(mesh, mat, bc, options=opts, devices=devices)
    print(
        f"general setup {time.perf_counter()-t1:.1f}s "
        f"(halo={s_gen.part.n_halo})", file=sys.stderr, flush=True,
    )
    measure(s_gen, u_glob, scale, "general", rec)
    print(json.dumps(rec))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 22)
