"""End-to-end anatomy of the device-resident EW Newton solve (round-3
floor memo follow-up): times the REAL production programs — `pcg_chunk`
on the real Krylov state, the fused Newton-iteration overheads, and the
complete `_mixed_solve_fn` — in ONE process at the headline problem size,
so the per-phase sum can be compared against the measured solve time.

The earlier bench/breakdown.py rows time simplified iteration BODIES
(matvec + precond + 2 dots) under fori_loop; the production CG body has 3
dots + 3 axpys + masked matvec wrappers and lives inside a while_loop
with a 9-field carry. This script measures that real body, closing the
~0.6 s/solve gap the simplified model left unexplained.

Run: python bench/solve_anatomy.py [n]   (TET10 box resolution, default 35)
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
        f"setup: {mesh.n_dof} DOFs, {mesh.n_elements} el "
        f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True,
    )
    scale = jnp.asarray(1.0, mesh.coords.dtype)
    u = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u = u.at[:, 2].set(-0.05 * mesh.coords[:, 2])
    u = solver.bc.impose(u, scale)

    rec = {}

    # 1) the complete production solve (what bench.py times)
    dt, (_, ok, r) = timed(lambda: solver._newton(u, scale), reps=3)
    total_cg = sum(r.pcg_iters)
    rec["full_solve_s"] = round(dt, 4)
    rec["newton_iters"] = r.newton_iters
    rec["pcg_iters"] = r.pcg_iters
    print(
        f"full solve: {dt:.3f}s ok={ok} pcg={r.pcg_iters}",
        file=sys.stderr, flush=True,
    )

    # 2) the REAL chunked-CG program on the real state: prepare once, then
    #    time a 50-iteration pcg_chunk (tol tiny so it never exits early)
    free32 = solver.bc.free_mask.astype(jnp.float32)
    st, state, inv_blocks = _mixed_prepare_jit(
        u, scale, solver._soa64, solver._soa, solver.material,
        solver._material32, solver.bc, solver.f_ext,
        jnp.asarray(1e-30, jnp.float32), solver._coarse, None,
        use_pallas=False,
    )
    st = jax.block_until_ready(st)

    def chunk50(s):
        return _mixed_chunk_jit(
            s, solver._soa, state, inv_blocks, free32, solver._coarse,
            jnp.int32(50), use_pallas=False,
        )

    dt, out = timed(chunk50, st, reps=3)
    rec["pcg_chunk50_s"] = round(dt, 4)
    rec["pcg_ms_per_iter"] = round(dt / int(out.k - st.k) * 1e3, 2)
    print(
        f"pcg_chunk: {dt:.3f}s / {int(out.k-st.k)} iters = "
        f"{rec['pcg_ms_per_iter']} ms/iter", file=sys.stderr, flush=True,
    )

    # 3) Newton-iteration overhead: the prepare program (f64 residual +
    #    freeze + diag + Jacobi inverse + pcg_init) — everything a Newton
    #    iteration pays besides its CG iterations
    def prep():
        return _mixed_prepare_jit(
            u, scale, solver._soa64, solver._soa, solver.material,
            solver._material32, solver.bc, solver.f_ext,
            jnp.asarray(1e-30, jnp.float32), solver._coarse, None,
            use_pallas=False,
        )

    dt, _ = timed(prep, reps=3)
    rec["newton_prepare_s"] = round(dt, 4)

    # modeled vs measured: CG iters at the real per-iteration rate + per-
    # Newton prepare-scale overheads vs the measured full solve
    model = total_cg * rec["pcg_ms_per_iter"] / 1e3 + rec[
        "newton_prepare_s"
    ] * rec["newton_iters"]
    rec["model_s"] = round(model, 3)
    rec["unaccounted_s"] = round(rec["full_solve_s"] - model, 3)
    rec["n_dof"] = mesh.n_dof
    print(json.dumps(rec))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 35)
