"""Config-1 demo (BASELINE.json:7): uniaxial tension of a unit cube,
St. Venant-Kirchhoff, TET4, single load step, dense direct solve.

Run: python examples/uniaxial_tension.py  (TPU by default; FEA_PLATFORM=cpu
to force CPU). Prints the convergence table and checks the physics:
prescribed top-face stretch, Poisson lateral contraction, quadratic Newton
convergence (SURVEY.md §5.6).
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import jax.numpy as jnp

from fea_large_tpu import StVenantKirchhoff
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def main():
    t0 = time.perf_counter()
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    mesh = box_mesh(6, 6, 6, element_type="tet4")
    print(
        f"mesh: {mesh.n_nodes} nodes, {mesh.n_elements} TET4 elements, "
        f"{mesh.n_dof} DOFs",
        flush=True,
    )
    mat = StVenantKirchhoff(jnp.asarray(1.2), jnp.asarray(0.8))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", 0.2).build()
    solver = NewtonSolver(mesh, mat, bc, options=SolverOptions(linear="direct"))
    print(f"setup: {time.perf_counter() - t0:.1f}s", flush=True)

    res = solver.solve()
    print(f"converged: {res.converged}  total {time.perf_counter() - t0:.1f}s")
    for rec in res.history:
        norms = " -> ".join(f"{n:.3e}" for n in rec.residual_norms)
        print(f"  lam={rec.load_factor:.3f} newton={rec.newton_iters}  |R|: {norms}")

    u = np.asarray(res.u)
    top = u[np.asarray(mesh.node_sets["zmax"])]
    print(f"top-face uz (prescribed 0.2): mean={top[:, 2].mean():.6f}")
    print(f"lateral contraction ux: [{u[:, 0].min():.4f}, {u[:, 0].max():.4f}]")
    assert res.converged
    assert abs(top[:, 2].mean() - 0.2) < 1e-12
    assert u[:, 0].min() < -1e-3 and u[:, 0].max() > 1e-3  # Poisson effect
    print("OK")


if __name__ == "__main__":
    main()
