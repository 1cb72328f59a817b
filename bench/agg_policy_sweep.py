"""Coarse-aggregate policy sweep across mesh sizes (round-3/4 queue item).

The round-2 `default_agg_size` policy (target ~2.5k RBM aggregates,
sqrt(N)-scaled beyond 1M DOF) was calibrated when the coarse apply was a
factored `cho_solve` (11.8 ms at dim 16.5k) and the inverse build was
device-only (feasibility boundary ~dim 16.5k on the v5e). Round 3 changed
both terms: the apply is a bandwidth-bound dense matvec against a
precomputed explicit inverse (~1.5 ms), and `_host_invert_coarse` builds
inverses past the on-device boundary. Finer coarse spaces therefore got
cheaper twice over, and the 1M-DOF optimum moved from dim 16464 to 20250
(0.732 -> 0.675 s/step; BENCH_NOTES round 3). This harness re-measures the
optimum across sizes so the LIBRARY default policy can be recalibrated,
instead of the bench pinning `FEA_BENCH_AGG=100` at headline scale only.

Usage:
    python bench/agg_policy_sweep.py TARGET_DOF AGG1,AGG2,... [reps]

AGG values are nodes/aggregate as in `SolverOptions.agg_size`; the word
`default` runs the current `default_agg_size` policy. Prints one JSON line
per row (plus a final table) so results can be grepped into BENCH_NOTES.

Metric: the bench.py "newton" mode — complete Eisenstat-Walker solve
(1e-6 residual reduction from the smooth 5% affine compression state),
wall / Newton steps, best of `reps`.
"""

import gc
import json
import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run():
    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions
    from fea_large_tpu.solvers.multilevel import (
        aggregate_nodes,
        default_agg_size,
    )

    from bench import pick_box_n  # noqa: E402  (bench.py at the repo root)

    target_dof = int(sys.argv[1])
    aggs = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    modes = int(os.environ.get("FEA_SWEEP_MODES", 6))

    t0 = time.perf_counter()
    log(f"sweep: backend={jax.default_backend()}")
    n, mesh = pick_box_n(target_dof)
    log(
        f"sweep: TET10 box n={n}: {mesh.n_nodes} nodes, {mesh.n_dof} DOFs "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.05).build()
    coords_host = mesh.coords_host

    u0 = jnp.zeros((mesh.n_nodes, 3), mesh.coords.dtype)
    u0 = u0.at[:, 2].set(-0.05 * mesh.coords[:, 2])

    rows = []
    for spec in aggs:
        if spec == "default":
            agg_size = default_agg_size(
                mesh.n_nodes, target_coarse={3: 5000, 6: 2500, 12: 1250}[modes]
            )
            label = f"default({agg_size})"
        else:
            agg_size = int(spec)
            label = str(agg_size)
        # exact coarse dimension this agg_size yields (host, O(N))
        agg_labels = aggregate_nodes(coords_host, agg_size)
        nc = int(agg_labels.max()) + 1
        dim = modes * nc
        del agg_labels
        # v5e host-build Gram matmul needs ~3 [dim, dim] f32 buffers
        if dim * dim * 4 * 3 > 13e9:
            log(f"sweep: agg={label}: dim {dim} infeasible on this HBM, skip")
            rows.append({"agg": label, "nc": nc, "dim": dim, "skip": True})
            continue
        # past the on-device inverse boundary, go straight to the host build
        if dim > 16000:
            os.environ["FEA_COARSE_INVERT"] = "host"
        else:
            os.environ.pop("FEA_COARSE_INVERT", None)
        t1 = time.perf_counter()
        solver = NewtonSolver(
            mesh,
            mat,
            bc,
            options=SolverOptions(
                linear="pcg",
                precision="mixed",
                preconditioner="two_level",
                agg_size=agg_size,
                coarse_modes=modes,
                forcing="ew",
                ew_eta_min=1e-2,
                newton_rtol=1e-6,
                pcg_tol=1e-6,
                pcg_maxiter=2000,
            ),
        )
        setup_s = time.perf_counter() - t1
        u = solver.bc.impose(u0, jnp.asarray(1.0, mesh.coords.dtype))
        _, ok0, rec0 = solver._newton(u, jnp.asarray(1.0, mesh.coords.dtype))
        log(
            f"sweep: agg={label} warmup ok={ok0} newton={rec0.newton_iters} "
            f"pcg={rec0.pcg_iters} ({time.perf_counter() - t0:.1f}s)"
        )
        times, recs = [], []
        for r in range(reps):
            t1 = time.perf_counter()
            _, ok, rec = solver._newton(
                u, jnp.asarray(1.0, mesh.coords.dtype)
            )
            dt = time.perf_counter() - t1
            times.append(dt / max(rec.newton_iters, 1))
            recs.append(rec)
            log(f"sweep: agg={label} rep{r}: {dt:.3f}s pcg={rec.pcg_iters}")
        best = int(np.argmin(times))
        rec = recs[best]
        row = {
            "agg": label,
            "nc": nc,
            "dim": dim,
            "setup_s": round(setup_s, 1),
            "s_per_step": round(min(times), 4),
            "newton": rec.newton_iters,
            "total_pcg": int(sum(rec.pcg_iters)),
            "pcg": [int(i) for i in rec.pcg_iters],
            "reduction": float(rec.residual_norms[-1] / rec.residual_norms[0]),
            "ok": bool(ok),
        }
        rows.append(row)
        print(json.dumps({"n_dof": mesh.n_dof, **row}), flush=True)
        del solver, rec, recs
        gc.collect()

    log(f"\nsweep: n_dof={mesh.n_dof} ({mesh.n_nodes} nodes)")
    log(f"{'agg':>12} {'Nc':>6} {'dim':>7} {'s/step':>8} {'CG':>4} setup_s")
    for r in rows:
        if r.get("skip"):
            log(f"{r['agg']:>12} {r['nc']:>6} {r['dim']:>7}    (skipped)")
        else:
            log(
                f"{r['agg']:>12} {r['nc']:>6} {r['dim']:>7} "
                f"{r['s_per_step']:>8.4f} {r['total_pcg']:>4} {r['setup_s']}"
            )


if __name__ == "__main__":
    run()
