"""I/O-layer tests: task parsing, mesh round-trips, export, checkpoint/resume
(SURVEY.md C14/C16, §7.4)."""

import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from fea_large_tpu.io.export import (
    export_msh,
    export_npz,
    export_vtk,
    load_checkpoint,
)
from fea_large_tpu.io.meshio import load_gmsh, save_mesh_file
from fea_large_tpu.io.task import load_task
from fea_large_tpu.mesh.generators import box_mesh


def test_load_task_json(tmp_path):
    task_file = tmp_path / "t.json"
    task_file.write_text(
        json.dumps(
            {
                "mesh": {"box": {"nx": 2, "ny": 2, "nz": 2}},
                "element_type": "tet4",
                "material": {"model": "svk", "lambda": 1.5, "mu": 0.7},
                "loading": {
                    "n_steps": 2,
                    "dirichlet": [
                        {"set": "zmin", "components": "xyz", "value": 0.0},
                        {"set": "zmax", "components": "z", "value": 0.1},
                    ],
                },
                "solver": {
                    "linear": "direct",
                    "forcing": "ew",
                    "ew_eta_min": 0.01,
                },
            }
        )
    )
    task = load_task(task_file)
    assert task.mesh.n_elements == 40
    assert float(task.material.lam) == 1.5
    assert task.solver.n_steps == 2
    assert task.solver.forcing == "ew"
    assert task.solver.ew_eta_min == 0.01
    bc = task.build_bc()
    assert bc.n_fixed > 0


def test_quadrature_override(tmp_path):
    task_file = tmp_path / "t.json"
    task_file.write_text(
        json.dumps(
            {
                "mesh": {"box": {"nx": 1, "ny": 1, "nz": 1}},
                "element_type": "tet10",
                "quadrature": 5,
                "material": {"model": "neo_hookean", "E": 1.0, "nu": 0.3},
            }
        )
    )
    task = load_task(task_file)
    assert task.mesh.element.n_quad == 5


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_gmsh_roundtrip(tmp_path, element_type):
    mesh = box_mesh(2, 1, 1, element_type=element_type)
    path = tmp_path / "m.msh"
    save_mesh_file(path, mesh)
    mesh2 = load_gmsh(path)
    assert mesh2.element_type == element_type
    np.testing.assert_allclose(mesh2.coords, mesh.coords, atol=1e-15)
    np.testing.assert_array_equal(np.asarray(mesh2.conn), np.asarray(mesh.conn))
    # node sets rebuilt from the bounding box must match the generator's
    for k in mesh.node_sets:
        np.testing.assert_array_equal(
            np.sort(mesh2.node_sets[k]), np.sort(mesh.node_sets[k])
        )


def test_vtk_export(tmp_path):
    mesh = box_mesh(1, 1, 1, element_type="tet4")
    u = jnp.zeros((mesh.n_nodes, 3)).at[:, 2].set(0.1)
    path = tmp_path / "out.vtk"
    export_vtk(path, mesh, u)
    text = path.read_text()
    assert "UNSTRUCTURED_GRID" in text
    assert f"POINTS {mesh.n_nodes} double" in text
    assert "VECTORS displacement double" in text


@pytest.mark.parametrize("element_type", ["tet4", "tet10"])
def test_msh_deformed_export_roundtrip(tmp_path, element_type):
    """export_msh (the reference's deformed-mesh format, C16 [R]) must
    round-trip through load_gmsh with DISPLACED node positions, identical
    connectivity (incl. the canonical<->Gmsh TET10 edge permutation), and
    carry the displacement $NodeData view."""
    mesh = box_mesh(2, 1, 1, element_type=element_type)
    u = np.zeros((mesh.n_nodes, 3))
    u[:, 2] = 0.1 * np.asarray(mesh.coords)[:, 0]
    path = tmp_path / "deformed.msh"
    export_msh(path, mesh, jnp.asarray(u))
    mesh2 = load_gmsh(path)
    np.testing.assert_allclose(
        np.asarray(mesh2.coords), np.asarray(mesh.coords) + u, atol=1e-15
    )
    np.testing.assert_array_equal(np.asarray(mesh2.conn), np.asarray(mesh.conn))
    text = path.read_text()
    assert '"displacement"' in text and "$NodeData" in text
    # undeformed variant keeps reference coordinates
    path2 = tmp_path / "ref.msh"
    export_msh(path2, mesh, jnp.asarray(u), deformed=False)
    mesh3 = load_gmsh(path2)
    np.testing.assert_allclose(
        np.asarray(mesh3.coords), np.asarray(mesh.coords), atol=1e-15
    )


def test_checkpoint_roundtrip(tmp_path):
    u = np.random.default_rng(0).standard_normal((10, 3))
    path = tmp_path / "ckpt.npz"
    export_npz(path, u, 3, [1.0, 0.1, 1e-8], load_factor=0.6)
    data = load_checkpoint(path)
    np.testing.assert_array_equal(data["u"], u)
    assert float(data["load_factor"]) == 0.6


def test_resume_bit_matches_uninterrupted():
    """SURVEY.md §7.4: resume at step k must bit-match the uninterrupted run
    (deterministic assembly)."""
    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh = box_mesh(2, 2, 2, element_type="tet4")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(1.0))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", 0.2).build()
    opts = SolverOptions(linear="direct", n_steps=2)

    full = NewtonSolver(mesh, mat, bc, options=opts).solve()
    assert full.converged

    # run step 1 only, "checkpoint", then resume
    solver = NewtonSolver(mesh, mat, bc, options=opts)
    states = []
    partial = solver.solve(callback=lambda rec, u: states.append((rec.load_factor, u)))
    assert partial.converged
    lam0, u0 = states[0]
    resumed = solver.solve(u0=u0, start_factor=lam0)
    assert resumed.converged
    assert np.array_equal(np.asarray(resumed.u), np.asarray(full.u))


def test_cli_run_and_resume(tmp_path):
    """Drive the real CLI end-to-end on a tiny task (SURVEY.md C18)."""
    task = {
        "mesh": {"box": {"nx": 2, "ny": 2, "nz": 2}},
        "element_type": "tet4",
        "material": {"model": "svk", "E": 2.0, "nu": 0.3},
        "loading": {
            "n_steps": 2,
            "dirichlet": [
                {"set": "zmin", "components": "xyz", "value": 0.0},
                {"set": "zmax", "components": "z", "value": 0.15},
            ],
        },
        "solver": {"linear": "direct"},
        "output": {"dir": str(tmp_path / "out")},
    }
    task_file = tmp_path / "tiny.json"
    task_file.write_text(json.dumps(task))
    import os

    env = {
        **os.environ,
        "FEA_PLATFORM": "cpu",
        "XLA_FLAGS": os.environ.get("XLA_FLAGS", ""),
    }
    proc = subprocess.run(
        [sys.executable, "-m", "fea_large_tpu", "run", str(task_file)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "converged" in proc.stdout
    out = tmp_path / "out"
    conv = json.loads((out / "tiny_convergence.json").read_text())
    assert conv["converged"] and len(conv["steps"]) == 2
    assert (out / "tiny_deformed.vtk").exists()
    assert (out / "tiny_final.npz").exists()


def test_cli_bench_subcommand(tmp_path):
    """`bench` times repeated solves of a task file and prints one JSON
    line (the task-level analog of the repo-root headline bench)."""
    task = {
        "mesh": {"box": {"nx": 2, "ny": 2, "nz": 2}},
        "element_type": "tet4",
        "material": {"model": "svk", "E": 2.0, "nu": 0.3},
        "loading": {
            "n_steps": 1,
            "dirichlet": [
                {"set": "zmin", "components": "xyz", "value": 0.0},
                {"set": "zmax", "components": "z", "value": 0.1},
            ],
        },
        "solver": {"linear": "direct"},
        "output": {"dir": str(tmp_path / "out")},
    }
    task_file = tmp_path / "tiny.json"
    task_file.write_text(json.dumps(task))
    import os

    env = {**os.environ, "FEA_PLATFORM": "cpu"}
    proc = subprocess.run(
        [
            sys.executable, "-m", "fea_large_tpu", "bench", str(task_file),
            "--reps", "1",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["task"] == "tiny" and out["newton_steps"] >= 1
    assert out["s_per_newton_step"] > 0


def test_sexp_task_equivalent_to_json(tmp_path):
    """The reference's native S-expression task format loads to the same
    problem as the JSON schema (SURVEY.md C14)."""
    from fea_large_tpu.io.task import load_task

    json_task = load_task("tasks/block_compression_tet10.json")
    sexp_task = load_task("tasks/block_compression_tet10.sexp")
    assert sexp_task.mesh.n_nodes == json_task.mesh.n_nodes
    assert sexp_task.mesh.element_type == "tet10"
    assert float(sexp_task.material.lam) == float(json_task.material.lam)
    assert float(sexp_task.material.mu) == float(json_task.material.mu)
    assert sexp_task.loading.n_steps == 4
    assert sexp_task.solver.linear == "pcg_bcsr"
    assert sexp_task.solver.pcg_tol == 1e-12
    d_json = {(d.set, d.components, d.value) for d in json_task.loading.dirichlet}
    d_sexp = {(d.set, d.components, d.value) for d in sexp_task.loading.dirichlet}
    assert d_json == d_sexp


def test_sexp_forces_and_comments(tmp_path):
    from fea_large_tpu.io.task import load_task

    p = tmp_path / "t.sexp"
    p.write_text(
        """
; a comment
(task
  (mesh (box (nx 2) (ny 1) (nz 1) (lx 2.0)))
  (element-type tet4)
  (material (model svk) (lambda 1.5) (mu 0.7))
  (loading
    (n-steps 2)
    (dirichlet (set xmin))
    (forces (set xmax) (vector 0.0 0.0 -0.1))))
"""
    )
    task = load_task(p)
    assert task.mesh.n_elements == 10
    assert float(task.material.lam) == 1.5
    assert task.loading.forces[0].vector == (0.0, 0.0, -0.1)
    f = task.build_forces()
    assert f is not None and float(f.sum()) != 0.0


def test_cli_distributed_run(tmp_path):
    """The CLI must honor partition.n_shards by running the domain-
    decomposed solver (config 5 via the single-binary interface)."""
    task = {
        "mesh": {"box": {"nx": 8, "ny": 3, "nz": 3, "lx": 2.0}},
        "element_type": "tet4",
        "material": {"model": "neo_hookean", "lam": 1.0, "mu": 0.6},
        "loading": {
            "n_steps": 2,
            "dirichlet": [
                {"set": "xmin", "components": "xyz", "value": 0.0},
                {"set": "xmax", "components": "x", "value": -0.05},
            ],
        },
        "solver": {
            "linear": "pcg", "precision": "mixed",
            "preconditioner": "two_level", "forcing": "ew",
            "pcg_tol": 1e-6, "newton_rtol": 1e-8,
        },
        "partition": {"n_shards": 4, "method": "slab"},
        "output": {"dir": str(tmp_path / "out")},
    }
    task_file = tmp_path / "dist.json"
    task_file.write_text(json.dumps(task))
    import os

    env = {
        **os.environ,
        "FEA_PLATFORM": "cpu",
        "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8",
    }
    proc = subprocess.run(
        [sys.executable, "-m", "fea_large_tpu", "run", str(task_file)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "shards=4" in proc.stdout
    conv = json.loads(
        (tmp_path / "out" / "dist_convergence.json").read_text()
    )
    assert conv["converged"] and len(conv["steps"]) == 2
