"""Coarse-basis experiment: RBM (modes=6) vs RBM+strain (modes=12).

Iteration counts are backend-independent (same arithmetic up to f32
rounding), so this runs on CPU too; per-step WALL TIME is only meaningful
on the TPU. Variants, at FEA_EXP_DOF (default ~100k) TET10:

  A. modes=6,  agg_size=S        (baseline: 6*Nc coarse dofs)
  B. modes=12, agg_size=2*S      (matched coarse dimension: fewer, larger
                                  aggregates with the richer basis)
  C. modes=12, agg_size=S        (2x coarse dimension: upper bound on what
                                  the richer basis buys at this Nc scale)

Each variant runs ONE fixed-tol-1e-6 mixed Newton step from the smooth 5%
affine compression (bench.py's step mode) and reports pcg_iters.

Usage: [FEA_PLATFORM=cpu] FEA_EXP_DOF=100000 python bench/coarse_modes_experiment.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fea_large_tpu.config  # noqa: F401
import jax
import jax.numpy as jnp

from bench import pick_box_n  # noqa: E402  (bench.py at the repo root)


def main():
    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    target_dof = int(os.environ.get("FEA_EXP_DOF", 100_000))
    agg = int(os.environ.get("FEA_EXP_AGG", 64))
    n, mesh = pick_box_n(target_dof)
    print(
        f"experiment mesh: n={n}, {mesh.n_dof} DOFs, backend="
        f"{jax.default_backend()}",
        flush=True,
    )
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    scale = jnp.asarray(1.0, mesh.coords.dtype)
    u = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u = u.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    for label, modes, size in (
        ("A  modes=6  agg=S ", 6, agg),
        ("B  modes=12 agg=2S", 12, 2 * agg),
        ("C  modes=12 agg=S ", 12, agg),
    ):
        t0 = time.perf_counter()
        solver = NewtonSolver(
            mesh, mat, bc,
            options=SolverOptions(
                linear="pcg", precision="mixed", preconditioner="two_level",
                agg_size=size, coarse_modes=modes, forcing="fixed",
                pcg_tol=1e-6, newton_rtol=1e-6, pcg_maxiter=2000,
            ),
        )
        ub = solver.bc.impose(u, scale)
        setup = time.perf_counter() - t0
        t0 = time.perf_counter()
        u2, iters, ok, rel = solver._step_mixed(ub, scale)
        jax.block_until_ready(u2)
        step = time.perf_counter() - t0
        nc = solver._coarse.n_agg
        print(
            f"{label}: Nc={nc} coarse_dof={modes * nc} "
            f"pcg_iters={int(iters)} ok={bool(ok)} rel={float(rel):.2e} "
            f"(setup {setup:.1f}s, step {step:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
