"""Config-2 demo (BASELINE.json:8): neo-Hookean block compression, TET10
quadratic elements, block-Jacobi PCG, incremental loading.

Run: python examples/block_compression.py [n]   (box resolution, default 4)
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.bc import DirichletBuilder
from fea_large_tpu.mesh.generators import box_mesh
from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions


def main(n=4):
    t0 = time.perf_counter()
    print(f"backend: {jax.default_backend()}", flush=True)
    mesh = box_mesh(n, n, n, element_type="tet10")
    print(f"mesh: {mesh.n_nodes} nodes, {mesh.n_elements} TET10, {mesh.n_dof} DOFs")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.3).build()
    solver = NewtonSolver(
        mesh, mat, bc,
        options=SolverOptions(linear="pcg_bcsr", n_steps=4, pcg_tol=1e-12),
    )
    res = solver.solve()
    print(f"converged: {res.converged}  total {time.perf_counter() - t0:.1f}s")
    for rec in res.history:
        print(
            f"  lam={rec.load_factor:.2f} newton={rec.newton_iters} "
            f"pcg={rec.pcg_iters} |R|end={rec.residual_norms[-1]:.2e}"
        )
    u = np.asarray(res.u)
    print(f"max |u| = {np.abs(u).max():.4f}  (30% compression prescribed)")
    # volume can only be conserved approximately; barrel-shaped bulge expected
    assert res.converged
    assert u[:, 0].max() > 0.01  # lateral bulge
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
