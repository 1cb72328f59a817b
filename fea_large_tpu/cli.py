"""Command-line entry point (SURVEY.md C18): `python -m fea_large_tpu ...`.

Subcommands:
  run <task.json> [--resume] [--out DIR]   solve a task file end-to-end
  info <task.json>                         print the parsed problem summary
  bench <task.json> [--reps N]             time repeated solves of a task
                                           (one JSON line; the headline 1M-DOF
                                           harness is the repo-root bench.py)

Mirrors the reference's `fea_solver <task>` single-binary interface
(SURVEY.md §4.1) with per-iteration convergence prints (§7.5) and per-step
checkpoint/VTK output (§7.4, C16).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time


def _cmd_run(args) -> int:
    # import here so `--help` stays instant
    import numpy as np

    from fea_large_tpu.io.export import export_npz, export_vtk, load_checkpoint
    from fea_large_tpu.io.task import load_task
    from fea_large_tpu.solvers.newton import NewtonSolver

    task = load_task(args.task)
    out_dir = pathlib.Path(args.out or task.output.dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    mesh = task.mesh
    n_shards = task.partition.n_shards
    print(
        f"[{task.name}] {mesh.element_type} mesh: {mesh.n_nodes} nodes, "
        f"{mesh.n_elements} elements, {mesh.n_dof} DOFs; "
        f"material={task.material.name}, linear={task.solver.linear}, "
        f"steps={task.loading.n_steps}"
        + (f", shards={n_shards} ({task.partition.method})" if n_shards > 1 else "")
    )
    bc = task.build_bc()
    if n_shards > 1:
        # config 5 (BASELINE.json:11): domain-decomposed solve over a device
        # mesh, driven by the same task file (SURVEY.md §4.1 single-binary
        # interface)
        import jax

        from fea_large_tpu.dist.structured_solver import make_sharded_solver

        devices = jax.devices()
        if len(devices) < n_shards:
            print(
                f"[{task.name}] ERROR: task requests {n_shards} shards but "
                f"only {len(devices)} devices are visible "
                "(XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
                "virtual CPU mesh)"
            )
            return 2
        # structured Kuhn-lattice meshes route to the boundary-plane
        # exchange solver; anything else takes the general indexed path
        solver = make_sharded_solver(
            mesh, task.material, bc, task.build_forces(), task.solver,
            devices=devices[:n_shards],
            partition_method=task.partition.method,
        )
        to_global = solver.u_global
        from_global = solver.u_from_global
    else:
        solver = NewtonSolver(
            mesh, task.material, bc, task.build_forces(), task.solver
        )
        to_global = np.asarray
        from_global = lambda u: u  # noqa: E731

    u0, start = None, 0.0
    ckpt = out_dir / f"{task.name}_checkpoint.npz"
    conv_path = out_dir / f"{task.name}_convergence.json"
    records = []
    if args.resume and ckpt.exists():
        data = load_checkpoint(ckpt)
        u0 = from_global(data["u"])
        start = float(data["load_factor"])
        print(f"[{task.name}] resuming from load factor {start:.4f}")
        # keep the convergence artifact cumulative across resumes: seed from
        # the sidecar's already-converged increments (SURVEY.md §7.4/§7.5)
        if conv_path.exists():
            prior = json.loads(conv_path.read_text())
            records = [
                r for r in prior.get("steps", [])
                if r.get("load_factor", 0.0) <= start + 1e-12
            ]

    def on_step(rec, u):
        line = (
            f"  step lam={rec.load_factor:.4f} newton={rec.newton_iters} "
            f"|R|={rec.residual_norms[0]:.3e}->{rec.residual_norms[-1]:.3e} "
            f"t={rec.wall_time:.3f}s"
        )
        if rec.pcg_iters:
            line += f" pcg={rec.pcg_iters}"
        print(line)
        records.append(
            {
                "load_factor": rec.load_factor,
                "newton_iters": rec.newton_iters,
                "residual_norms": rec.residual_norms,
                "pcg_iters": rec.pcg_iters,
                "wall_time": rec.wall_time,
            }
        )
        export_npz(
            ckpt, to_global(u), len(records), rec.residual_norms,
            load_factor=rec.load_factor,
        )

    t0 = time.perf_counter()
    result = solver.solve(u0=u0, callback=on_step, start_factor=start)
    wall = time.perf_counter() - t0
    u = np.asarray(to_global(result.u))
    print(
        f"[{task.name}] {'converged' if result.converged else 'FAILED'} in "
        f"{wall:.2f}s; |u|_max={np.abs(u).max():.6g}"
    )

    # structured convergence sidecar (SURVEY.md §7.5) — this IS the
    # "convergence tracking" artifact of BASELINE.json:9
    conv_path.write_text(
        json.dumps(
            {"task": task.name, "converged": result.converged, "steps": records},
            indent=2,
        )
    )
    if task.output.npz:
        export_npz(out_dir / f"{task.name}_final.npz", u, len(records))
    if task.output.msh:
        from fea_large_tpu.io.export import export_msh

        export_msh(out_dir / f"{task.name}_deformed.msh", mesh, u)
    if task.output.vtk:
        from fea_large_tpu.postprocess import nodal_stress

        import jax.numpy as jnp

        sigma, vm = nodal_stress(mesh, task.material, jnp.asarray(u))
        export_vtk(
            out_dir / f"{task.name}_deformed.vtk",
            mesh,
            u,
            point_data={"von_mises": np.asarray(vm)},
        )
    return 0 if result.converged else 1


def _cmd_bench(args) -> int:
    """Benchmark a task file: warmup solve (compiles), then `--reps` timed
    full solves; prints ONE JSON line (wall seconds per Newton step plus
    totals) — the task-level analog of the repo-root headline bench."""
    from fea_large_tpu.io.task import load_task
    from fea_large_tpu.solvers.newton import NewtonSolver

    task = load_task(args.task)
    n_shards = task.partition.n_shards
    if n_shards > 1:
        # bench the task the way `run` executes it (config 5 included)
        import jax

        from fea_large_tpu.dist.structured_solver import make_sharded_solver

        devices = jax.devices()
        if len(devices) < n_shards:
            print(json.dumps({
                "task": task.name,
                "error": f"needs {n_shards} devices, have {len(devices)}",
            }))
            return 2
        solver = make_sharded_solver(
            task.mesh, task.material, task.build_bc(), task.build_forces(),
            task.solver, devices=devices[:n_shards],
            partition_method=task.partition.method,
        )
    else:
        solver = NewtonSolver(
            task.mesh, task.material, task.build_bc(), task.build_forces(),
            task.solver,
        )
    res = solver.solve()  # warmup: compiles every program variant
    if not res.converged:
        print(json.dumps({"task": task.name, "error": "did not converge"}))
        return 1
    times, steps, pcg = [], 0, 0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        res = solver.solve()
        times.append(time.perf_counter() - t0)
        steps = res.total_newton_iters
        pcg = int(sum(sum(r.pcg_iters) for r in res.history))
    best = min(times)
    print(
        json.dumps(
            {
                "task": task.name,
                "n_dof": task.mesh.n_dof,
                "n_shards": n_shards,
                "wall_s": round(best, 4),
                "newton_steps": steps,
                "s_per_newton_step": round(best / max(steps, 1), 4),
                "total_pcg_iters": pcg,
                "reps": [round(t, 4) for t in times],
            }
        )
    )
    return 0


def _cmd_info(args) -> int:
    from fea_large_tpu.io.task import load_task

    task = load_task(args.task)
    m = task.mesh
    print(
        json.dumps(
            {
                "name": task.name,
                "element_type": m.element_type,
                "n_nodes": m.n_nodes,
                "n_elements": m.n_elements,
                "n_dof": m.n_dof,
                "material": task.material.name,
                "lam": float(task.material.lam),
                "mu": float(task.material.mu),
                "n_steps": task.loading.n_steps,
                "linear": task.solver.linear,
                "node_sets": {k: int(len(v)) for k, v in m.node_sets.items()},
            },
            indent=2,
        )
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fea_large_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="solve a task file")
    pr.add_argument("task")
    pr.add_argument("--resume", action="store_true", help="resume from checkpoint")
    pr.add_argument("--out", default=None, help="output directory override")
    pr.set_defaults(fn=_cmd_run)

    pi = sub.add_parser("info", help="print parsed task summary")
    pi.add_argument("task")
    pi.set_defaults(fn=_cmd_info)

    pb = sub.add_parser("bench", help="time repeated solves of a task file")
    pb.add_argument("task")
    pb.add_argument("--reps", type=int, default=3, help="timed repetitions")
    pb.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
