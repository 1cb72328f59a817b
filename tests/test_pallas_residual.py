"""Double-word fused residual pass vs the pure-f64 XLA element pass.

The contract (round-5 VERDICT item 1): on physical states,
||f_df - f_64|| / ||f_64|| <= ~1e-13 — under the 1e-8 parity budget by
five orders, so routing in-increment Newton residuals through the
double-word pass cannot move the converged solution. Off-TPU the kernel
runs in interpret mode, which compiles the unrolled body as plain XLA:
TET4 (q=1, npe=4) keeps that tractable for CI; the TET10 headline
configuration (whose interpret-mode compile runs tens of minutes) is
covered on the real TPU by `python bench.py --check` every round — the
on-TPU equivalence gate of VERDICT item 4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fea_large_tpu import NeoHookean, NeoHookeanVolumetric, StVenantKirchhoff
from fea_large_tpu.mesh.generators import box_mesh_kuhn
from fea_large_tpu.ops.soa import SoAProblem, soa_freeze, soa_internal_force

jax.config.update("jax_enable_x64", True)

pytestmark = pytest.mark.slow  # interpret-mode kernels: ~minutes on CPU


def _smooth_u(mesh):
    coords = np.asarray(mesh.coords_host)
    x, y, z = coords.T
    # smooth field: random nodal values invert elements and poison the
    # NH log in BOTH paths (round-4 lesson — CLAUDE.md)
    return np.stack(
        [0.03 * np.sin(x) * y, -0.02 * z * z + 0.01 * x,
         -0.05 * z + 0.02 * np.cos(y)], 1,
    )


@pytest.fixture(scope="module")
def lattice():
    mesh = box_mesh_kuhn(4, 4, 4, element_type="tet4")
    p32 = SoAProblem.build(mesh, jnp.float32)
    p64 = SoAProblem.build(mesh, jnp.float64, share_maps_from=p32)
    return mesh, p32, p64, jnp.asarray(_smooth_u(mesh).T)


@pytest.mark.parametrize(
    "mat",
    [
        NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6)),
        NeoHookeanVolumetric(jnp.asarray(1.2), jnp.asarray(0.7)),
        StVenantKirchhoff(jnp.asarray(0.9), jnp.asarray(0.5)),
    ],
    ids=["neohookean", "nh_volumetric", "svk"],
)
def test_df_force_matches_f64(lattice, mat):
    from fea_large_tpu.ops.pallas_residual import (
        soa_internal_force_df,
        struct_resid_supported,
    )

    mesh, p32, p64, u_T = lattice
    assert struct_resid_supported(p32, mat)
    f_df = soa_internal_force_df(p32, mat, u_T)
    f_64 = soa_internal_force(p64, soa_freeze(p64, mat, u_T))
    rel = float(jnp.linalg.norm(f_df - f_64) / jnp.linalg.norm(f_64))
    assert rel < 1e-13, rel


def test_df_tet_group_split_invariant(lattice):
    # the Mosaic-compile-size split over tet-slot groups must not change
    # the result beyond double-word rounding: tgroup=6 accumulates all
    # pair-row contributions in ONE double-word chain, tgroup=2 sums
    # three partials exactly in f64 — they differ at the ~u_dw^2 level
    # of the row magnitudes, far under the 1e-13 class of the pass
    from fea_large_tpu.ops.pallas_residual import soa_internal_force_df

    mesh, p32, p64, u_T = lattice
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    a = soa_internal_force_df(p32, mat, u_T, tgroup=2)
    b = soa_internal_force_df(p32, mat, u_T, tgroup=6)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 1e-12, rel


def test_df_force_unstructured_matches_f64():
    # the streamed-geometry variant (any mesh): TET4 5-tet box — the
    # unstructured code path (conn_T gathers, bucketed scatter)
    from fea_large_tpu.mesh.generators import box_mesh
    from fea_large_tpu.ops.pallas_residual import (
        resid_df_supported,
        soa_internal_force_df,
        struct_resid_supported,
    )

    mesh = box_mesh(3, 3, 3, element_type="tet4")
    p32 = SoAProblem.build(mesh, jnp.float32)
    p64 = SoAProblem.build(mesh, jnp.float64, share_maps_from=p32)
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    assert not struct_resid_supported(p32, mat)
    # correct but NOT routed: measured slower than the f64 pass it would
    # replace (indexed-op-bound — see resid_df_supported docstring)
    assert not resid_df_supported(p32, mat)
    u_T = jnp.asarray(_smooth_u(mesh).T)
    f_df = soa_internal_force_df(p32, mat, u_T, p64=p64)
    f_64 = soa_internal_force(p64, soa_freeze(p64, mat, u_T))
    rel = float(jnp.linalg.norm(f_df - f_64) / jnp.linalg.norm(f_64))
    assert rel < 1e-13, rel


def test_newton_resid_df_same_solution(lattice):
    # a full mixed Newton solve with resid_df forced on (interpret mode)
    # must converge to the SAME solution as the default mixed path: the
    # f64 authority confirms every acceptance, so the fixed point is
    # identical to 1e-8-parity accuracy
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers.newton import NewtonSolver, SolverOptions

    mesh, p32, p64, u_T = lattice
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = (
        DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.08).build()
    )
    common = dict(
        linear="pcg", precision="mixed", forcing="ew", newton_rtol=1e-9,
        device_loop=False,
    )
    res_ref = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(resid_df=False, **common)
    ).solve()
    res_df = NewtonSolver(
        mesh, mat, bc, options=SolverOptions(resid_df=True, **common)
    ).solve()
    assert res_ref.converged and res_df.converged
    scale = float(jnp.max(jnp.abs(res_ref.u)))
    diff = float(jnp.max(jnp.abs(res_ref.u - res_df.u)))
    assert diff <= 1e-8 * scale, (diff, scale)


def test_resid_df_fn_contract():
    # _residual_df_fn mirrors _residual_soa_fn's (r [N,3] f64, ||r||)
    # contract on the same inputs
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.solvers import newton as newton_mod

    mesh = box_mesh_kuhn(4, 4, 4, element_type="tet4")
    p32 = SoAProblem.build(mesh, jnp.float32)
    p64 = SoAProblem.build(mesh, jnp.float64, share_maps_from=p32)
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").build()
    u = jnp.asarray(_smooth_u(mesh))
    f_ext = jnp.zeros_like(u)
    scale = jnp.asarray(1.0)
    r_df, n_df, err = newton_mod._residual_df_fn(
        u, scale, p32, p64, mat, bc, f_ext
    )
    r_64, n_64 = newton_mod._residual_soa_fn(u, scale, p64, mat, bc, f_ext)
    assert r_df.shape == r_64.shape and r_df.dtype == r_64.dtype
    assert float(jnp.linalg.norm(r_df - r_64)) <= 1e-13 * float(n_64)
    # the returned error bound must dominate the actual deviation with
    # its design margin (it guards the skip-f64-confirm decision)
    assert float(jnp.abs(n_df - n_64)) < 0.05 * float(err)
