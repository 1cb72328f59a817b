"""Config-3 demo (BASELINE.json:9): multi-load-step Newton-Raphson with
incremental loading and convergence tracking — cantilever beam bending
under an end load.

Run: python examples/beam_bending.py
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import jax.numpy as jnp

from fea_large_tpu import StVenantKirchhoff
from fea_large_tpu.bc import DirichletBuilder, nodal_forces
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def main():
    t0 = time.perf_counter()
    print(f"backend: {jax.default_backend()}", flush=True)
    mesh = box_mesh(10, 2, 2, lx=5.0, element_type="tet4")
    mat = StVenantKirchhoff(*[jnp.asarray(v) for v in (57.7, 38.5)])  # E=100, nu=0.3
    bc = DirichletBuilder(mesh).fix("xmin").build()
    f = nodal_forces(mesh, {"xmax": [0.0, 0.0, -0.15]})
    solver = NewtonSolver(
        mesh, mat, bc, f_ext=f,
        options=SolverOptions(linear="pcg", n_steps=5, pcg_tol=1e-12),
    )
    res = solver.solve()
    print(f"converged: {res.converged}  total {time.perf_counter() - t0:.1f}s")
    print("convergence tracking (per increment):")
    for rec in res.history:
        norms = " -> ".join(f"{x:.2e}" for x in rec.residual_norms)
        print(f"  lam={rec.load_factor:.2f} newton={rec.newton_iters}  |R|: {norms}")
    u = np.asarray(res.u)
    tip = u[np.asarray(mesh.node_sets["xmax"])]
    print(f"tip deflection: mean uz = {tip[:, 2].mean():.4f}")
    assert res.converged and tip[:, 2].mean() < -0.05
    print("OK")


if __name__ == "__main__":
    main()
