"""Fused structured Pallas tangent action (ops/pallas_structured.py):
equivalence with the XLA slice/pad path on uniform Kuhn lattices.

Runs in Pallas interpret mode off-TPU (config.pallas_interpret). States are
SMOOTH physical fields — random nodal displacements can invert elements
(detC < 0), which NaNs the frozen neo-Hookean state in BOTH paths and
proves nothing about the kernel (round-4 finding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fea_large_tpu import NeoHookean
from fea_large_tpu.mesh.generators import box_mesh_kuhn
from fea_large_tpu.ops.pallas_structured import (
    _cell_split,
    struct_pairs,
    struct_pallas_supported,
    soa_apply_tangent_struct_pallas,
)
from fea_large_tpu.ops.soa import SoAProblem, soa_apply_tangent, soa_freeze


def _smooth_problem(cells, et="tet10"):
    mesh = box_mesh_kuhn(*cells, element_type=et)
    mat = NeoHookean(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32))
    p = SoAProblem.build(mesh, jnp.float32)
    coords = np.asarray(mesh.coords_host).T
    u = np.zeros((3, mesh.n_nodes))
    u[2] = -0.05 * coords[2]
    u[0] = 0.01 * np.sin(np.pi * coords[0]) * coords[2]
    v = np.cos(np.pi * coords) * (1.0 + coords[::-1])
    u, v = jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32)
    state = jax.jit(lambda uu: soa_freeze(p, mat, uu))(u)
    return p, state, v


@pytest.mark.parametrize(
    "cells",
    [
        (8, 4, 4),   # C=128: c2=128, C1=1 -> single sub-8 tail block
        (12, 6, 6),  # C=432: c2=216, C1=2 -> tail block of 2 sublanes
    ],
)
def test_struct_pallas_matches_xla(cells):
    p, state, v = _smooth_problem(cells)
    assert struct_pallas_supported(p)
    a = np.asarray(jax.jit(lambda vv: soa_apply_tangent(p, state, vv))(v))
    b = np.asarray(soa_apply_tangent_struct_pallas(p, state, v))
    assert np.isfinite(b).all()
    # different summation order than the XLA path -> f32 roundoff-level
    # agreement (same tolerance class as tests/test_pallas.py)
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_struct_pallas_matches_xla_body_and_tail():
    """C1 > 8 with a remainder: exercises the full-8-sublane body grid AND
    the exact tail block in one call ((10,5,5): C=250, c2=125, C1=2 — no;
    pick (20,5,5): C=500, c2=125 -> C1=4... use (9,9,9): C=729, c2=243,
    C1=3; body+tail needs C1>8: (35,5,5) C=875 -> c2=125, C1=7 tail-only.
    (15,15,3): C=675 -> divisors>=64: 75,135,225,675>512 -> c2=225, C1=3.
    The body+tail combination at interpret-feasible size: (11,5,5) C=275
    -> no divisor in range -> unsupported. Use (25,5,5): C=625, c2=125,
    C1=5 (tail-only) plus TET4 (9,3,3): C=81, c2=81, C1=1. True body+tail
    (C1 >= 9) only occurs at >=~5k cells — covered on the real TPU by the
    1M-DOF bench and the n=35 kernel check (BENCH_NOTES round 4); here we
    pin the largest interpret-feasible mixed case."""
    p, state, v = _smooth_problem((25, 5, 5))
    a = np.asarray(jax.jit(lambda vv: soa_apply_tangent(p, state, vv))(v))
    b = np.asarray(soa_apply_tangent_struct_pallas(p, state, v))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


def test_struct_pallas_tet4():
    p, state, v = _smooth_problem((8, 4, 4), et="tet4")
    assert struct_pallas_supported(p)
    a = np.asarray(jax.jit(lambda vv: soa_apply_tangent(p, state, vv))(v))
    b = np.asarray(soa_apply_tangent_struct_pallas(p, state, v))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


def test_unsupported_small_lattice_falls_back():
    """C without a divisor in the safe range -> unsupported; the
    pallas_kernels router must fall back to the generic element kernel
    without error."""
    from fea_large_tpu.ops.pallas_kernels import soa_apply_tangent_pallas

    p, state, v = _smooth_problem((3, 3, 3))
    assert _cell_split(p.structure.n_cells) is None
    assert not struct_pallas_supported(p)
    a = np.asarray(jax.jit(lambda vv: soa_apply_tangent(p, state, vv))(v))
    b = np.asarray(
        jax.jit(lambda vv: soa_apply_tangent_pallas(p, state, vv))(v)
    )
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


def test_struct_pallas_force_diag_freeze_match_xla():
    """The fused force / diag-blocks / freeze kernels against their XLA
    mirrors (these are TPU defaults via ops.soa._struct_fused; off-TPU
    they run here in interpret mode)."""
    from fea_large_tpu.mesh.generators import box_mesh_kuhn as _box
    from fea_large_tpu.ops.pallas_structured import (
        soa_diag_blocks_struct_pallas,
        soa_freeze_struct_pallas,
        soa_internal_force_struct_pallas,
    )
    from fea_large_tpu.ops.soa import soa_diag_blocks, soa_internal_force

    p, state, v = _smooth_problem((8, 4, 4))
    mat = NeoHookean(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32))

    f_ref = np.asarray(jax.jit(lambda s: soa_internal_force(p, s))(state))
    f_pal = np.asarray(soa_internal_force_struct_pallas(p, state))
    np.testing.assert_allclose(f_pal, f_ref, rtol=2e-5, atol=2e-5)

    d_ref = np.asarray(jax.jit(lambda s: soa_diag_blocks(p, s))(state))
    d_pal = np.asarray(soa_diag_blocks_struct_pallas(p, state))
    np.testing.assert_allclose(d_pal, d_ref, rtol=2e-5, atol=2e-5)

    mesh = _box(8, 4, 4, element_type="tet10")
    coords = np.asarray(mesh.coords_host).T
    u = np.zeros((3, mesh.n_nodes))
    u[2] = -0.05 * coords[2]
    u = jnp.asarray(u, jnp.float32)
    st_ref = jax.jit(lambda uu: soa_freeze(p, mat, uu))(u)
    st_pal = soa_freeze_struct_pallas(p, mat, u)
    for name, a, b in zip(st_ref._fields, st_ref, st_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5,
            err_msg=name,
        )


def test_struct_pallas_freeze_svk_and_volumetric():
    """Material-kind branches 0 (SVK) and 2 (volumetric NH) of the fused
    freeze kernel."""
    from fea_large_tpu.materials.neo_hookean import NeoHookeanVolumetric
    from fea_large_tpu.materials.svk import StVenantKirchhoff
    from fea_large_tpu.ops.pallas_structured import soa_freeze_struct_pallas

    p, state, v = _smooth_problem((8, 4, 4))
    mesh_n = p.n_nodes
    rngless_u = jnp.zeros((3, mesh_n), jnp.float32).at[2].set(-0.03)
    for mat in (
        StVenantKirchhoff(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32)),
        NeoHookeanVolumetric(jnp.asarray(1.0, jnp.float32), jnp.asarray(0.6, jnp.float32)),
    ):
        st_ref = jax.jit(lambda uu, m=mat: soa_freeze(p, m, uu))(rngless_u)
        st_pal = soa_freeze_struct_pallas(p, mat, rngless_u)
        for name, a, b in zip(st_ref._fields, st_ref, st_pal):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5,
                err_msg=f"{type(mat).__name__}.{name}",
            )


def test_pair_index_covers_all_slots():
    from fea_large_tpu.mesh.structure import build_box_structure

    st = build_box_structure(4, 3, 2, "tet10")
    pairs, pair_of = struct_pairs(st)
    assert len(pairs) == len({k for row in pair_of for k in row} | set(range(len(pairs))))
    for t in range(st.n_tets):
        for a in range(st.npe):
            assert pairs[pair_of[t][a]] == (
                st.slot_class[t][a], st.slot_offset[t][a]
            )
