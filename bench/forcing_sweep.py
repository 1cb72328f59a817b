"""Sweep of the Eisenstat-Walker lower cap `ew_eta_min` on the headline
EW solve (SolverOptions.ew_eta_min; see newton.device_forcing): does
capping the MIDDLE Newton systems' forcing from below cut total solve
wall-clock the way the termination safeguard did for the LAST system?

The cap is a traced scalar, so all values share one compiled program;
one process, one solver build, N values x reps solves.

Run: python bench/forcing_sweep.py [n] [reps]   (default n=36, reps=2)
"""

import dataclasses
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
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def main(n=36, reps=2):
    t0 = time.perf_counter()
    mesh = box_mesh(n, n, n, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    solver = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(
            linear="pcg", precision="mixed", preconditioner="two_level",
            coarse_modes=6, forcing="ew", newton_rtol=1e-6,
            pcg_tol=1e-6, pcg_maxiter=2000,
        ),
    )
    print(
        f"setup: {mesh.n_dof} DOFs ({time.perf_counter()-t0:.1f}s)",
        file=sys.stderr, flush=True,
    )
    scale = jnp.asarray(1.0, mesh.coords.dtype)
    u = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u = u.at[:, 2].set(-0.05 * mesh.coords[:, 2])
    u = solver.bc.impose(u, scale)

    solver._newton(u, scale)  # warmup: compile every program variant
    print(
        f"warmup done ({time.perf_counter()-t0:.1f}s)",
        file=sys.stderr, flush=True,
    )
    rows = []
    for eta_min in (0.0, 3e-3, 1e-2, 3e-2, 1e-1):
        solver.options = dataclasses.replace(
            solver.options, ew_eta_min=eta_min
        )
        best, best_row = None, None
        for _ in range(reps):
            t1 = time.perf_counter()
            _, ok, rec = solver._newton(u, scale)
            dt = time.perf_counter() - t1
            red = rec.residual_norms[-1] / rec.residual_norms[0]
            row = {
                "eta_min": eta_min, "solve_s": round(dt, 3),
                "s_per_step": round(dt / max(rec.newton_iters, 1), 4),
                "newton": rec.newton_iters, "pcg": rec.pcg_iters,
                "total_pcg": int(sum(rec.pcg_iters)),
                "reduction": float(f"{red:.3g}"), "ok": bool(ok),
            }
            print(f"  {row}", file=sys.stderr, flush=True)
            if best is None or dt < best:
                best, best_row = dt, row
        rows.append(best_row)
    print(json.dumps(rows))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 36,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
    )
