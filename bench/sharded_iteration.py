"""Per-iteration cost of the SHARDED PCG program vs the single-device
production chunk, same mesh, same process (round-2 VERDICT item 3's
measurement: the sharded path now uses the valence-bucketed
scatter-as-gather maps, so its per-iteration cost should match the
single-chip program up to the shard_map/halo bookkeeping).

On the TPU this runs the sharded program over a 1-device mesh (the only
real chip) — the halo tables are empty but the program is the full
config-5 code path (shard_map, psum dots, bucketed scatter, two-level
coarse). On CPU (FEA_PLATFORM=cpu + xla_force_host_platform_device_count)
it runs over all virtual devices; those times are CPU-backend numbers,
useful only for relative comparisons within the same backend.

Run: python bench/sharded_iteration.py [n]   (TET10 box resolution, default 35)
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
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import (
    NewtonSolver,
    SolverOptions,
    _mixed_prepare_jit,
    _mixed_chunk_jit,
)


def timed(fn, *args, reps=3, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main(n=35):
    devices = jax.devices()
    opts = SolverOptions(
        linear="pcg", precision="mixed", preconditioner="two_level",
        coarse_modes=6, forcing="ew", newton_rtol=1e-6,
        pcg_tol=1e-6, pcg_maxiter=2000,
    )
    t0 = time.perf_counter()
    mesh = box_mesh(n, n, n, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    rec = {"n_dof": mesh.n_dof, "backend": jax.default_backend(),
           "n_devices": len(devices)}
    print(
        f"mesh: {mesh.n_dof} DOFs on {len(devices)} {jax.default_backend()} "
        f"device(s) ({time.perf_counter()-t0:.1f}s)",
        file=sys.stderr, flush=True,
    )

    scale = jnp.asarray(1.0, mesh.coords.dtype)
    u_glob = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u_glob = u_glob.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    # --- single-device production chunk (the reference per-iteration cost)
    solver1 = NewtonSolver(mesh, mat, bc, options=opts)
    u1 = solver1.bc.impose(u_glob, scale)
    st, state, inv_blocks = _mixed_prepare_jit(
        u1, scale, solver1._soa64, solver1._soa, solver1.material,
        solver1._material32, solver1.bc, solver1.f_ext,
        jnp.asarray(1e-30, jnp.float32), solver1._coarse, None,
        use_pallas=False,
    )
    st = jax.block_until_ready(st)
    free32 = solver1.bc.free_mask.astype(jnp.float32)

    def chunk50_single(s):
        return _mixed_chunk_jit(
            s, solver1._soa, state, inv_blocks, free32, solver1._coarse,
            jnp.int32(50), use_pallas=False,
        )

    dt, out = timed(chunk50_single, st, reps=3)
    rec["single_ms_per_iter"] = round(dt / int(out.k - st.k) * 1e3, 2)
    print(
        f"single-device chunk: {rec['single_ms_per_iter']} ms/iter",
        file=sys.stderr, flush=True,
    )
    del solver1, st, state, inv_blocks, out

    # --- the sharded program over the available device mesh
    t1 = time.perf_counter()
    solver = ShardedNewtonSolver(mesh, mat, bc, options=opts, devices=devices)
    u = solver.u_from_global(jnp.asarray(u_glob))
    u = solver._impose(solver.data, u, scale)
    tol = jnp.asarray(opts.pcg_tol, solver._pcg_dtype)
    sst, sstate, sinv = solver._prepare(
        solver.data, solver.soa, solver.coarse, u, scale,
        jnp.asarray(1e-30, solver._pcg_dtype), jnp.zeros_like(u),
    )
    sst = jax.block_until_ready(sst)
    print(
        f"sharded setup: shards={solver.part.n_shards} halo={solver.part.n_halo} "
        f"({time.perf_counter()-t1:.1f}s)", file=sys.stderr, flush=True,
    )

    def chunk50_sharded(s):
        return solver._chunk(
            solver.data, solver.soa, solver.coarse, s, sstate, sinv,
            jnp.int32(50),
        )

    dt, sout = timed(chunk50_sharded, sst, reps=3)
    rec["sharded_ms_per_iter"] = round(dt / int(sout.k - sst.k) * 1e3, 2)
    rec["n_shards"] = solver.part.n_shards
    print(
        f"sharded chunk: {rec['sharded_ms_per_iter']} ms/iter",
        file=sys.stderr, flush=True,
    )
    _ = tol
    print(json.dumps(rec))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 35)
