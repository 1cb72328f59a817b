"""Config-5 style demo (BASELINE.json:11): domain-decomposed block
compression across a device mesh with ppermute halo exchange in assembly
and PCG, psum dot products, mixed precision, and the two-level coarse
correction.

Run on 8 virtual CPU devices (no cluster needed — SURVEY.md §6):
    FEA_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_compression.py
On a real multi-chip TPU slice it uses all local devices.
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import fea_large_tpu.config  # noqa: F401
import jax
import numpy as np
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.dist.sharded import ShardedNewtonSolver
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def main():
    devices = jax.devices()
    t0 = time.perf_counter()
    print(f"backend: {jax.default_backend()}, {len(devices)} devices", flush=True)

    mesh = box_mesh(12, 4, 4, lx=3.0, element_type="tet10")
    print(f"mesh: {mesh.n_nodes} nodes, {mesh.n_elements} TET10, {mesh.n_dof} DOFs")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("xmin").prescribe("xmax", "x", -0.15).build()
    opts = SolverOptions(
        linear="pcg", n_steps=2, precision="mixed", preconditioner="two_level",
        agg_size=64, pcg_tol=1e-6, newton_rtol=1e-9, max_newton=60,
    )

    sharded = ShardedNewtonSolver(mesh, mat, bc, options=opts, devices=devices)
    print(
        f"partition: {sharded.part.n_shards} shards, "
        f"{sharded.part.n_owned} owned / {sharded.part.n_halo} halo nodes per "
        f"shard (padded), kmax={sharded.part.kmax} ring hops",
        flush=True,
    )
    res = sharded.solve()
    print(f"converged: {res.converged} in {time.perf_counter() - t0:.1f}s")
    for rec in res.history:
        print(
            f"  lam={rec.load_factor:.2f} newton={rec.newton_iters} "
            f"pcg={rec.pcg_iters}"
        )
    u = sharded.u_global(res.u)

    # cross-check against the single-device solver
    ref = NewtonSolver(mesh, mat, bc, options=opts).solve()
    err = np.abs(u - np.asarray(ref.u)).max() / np.abs(np.asarray(ref.u)).max()
    print(f"max relative difference vs single-device solve: {err:.2e}")
    assert res.converged and err < 1e-6
    print("OK")


if __name__ == "__main__":
    main()
