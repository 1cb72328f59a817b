"""Lattice-block pooled coarse transfer (ops/pooling.py): exact
equivalence with the indexed segment-sum/gather transfer over the same
aggregate assignment, single-device and slab-sharded.

The pooled restrict/prolong replace the indexed ops in the two-level
coarse apply on structured meshes (round-3 VERDICT item 3); these tests
pin that the reformulation is the SAME linear operator (sum order aside:
f64 test data keeps the comparison exact to roundoff)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fea_large_tpu.dist.structured import structured_partition
from fea_large_tpu.mesh.structure import build_box_structure
from fea_large_tpu.ops.pooling import (
    LatticePool,
    global_pool_of,
    make_lattice_pool,
    make_sharded_lattice_pool,
)


@pytest.mark.parametrize(
    "cells,et,target",
    [
        ((4, 3, 5), "tet10", 8),
        ((6, 2, 2), "tet4", 4),
        ((5, 5, 5), "tet10", 12),  # non-divisor block (b=2 over 5 cells)
        ((8, 8, 8), "tet10", 27),  # divisor block (fold path)
    ],
)
def test_pool_matches_indexed_transfer(cells, et, target):
    st = build_box_structure(*cells, et)
    pool = make_lattice_pool(st, target)
    agg = pool.agg_host()
    assert agg.min() == 0 and agg.max() == pool.n_agg - 1
    rng = np.random.default_rng(0)
    v = rng.normal(size=(st.n_nodes, 6))
    rc_ref = np.zeros((pool.n_agg, 6))
    np.add.at(rc_ref, agg, v)
    rc = np.asarray(pool.restrict(jnp.asarray(v)))
    np.testing.assert_allclose(rc, rc_ref, rtol=1e-12, atol=1e-12)
    w = rng.normal(size=(pool.n_agg, 6))
    np.testing.assert_array_equal(
        np.asarray(pool.prolong(jnp.asarray(w))), w[agg]
    )


def test_pool_transpose_pair():
    """<restrict(v), w> == <v, prolong(w)> — CG needs the exact transpose."""
    st = build_box_structure(5, 4, 3, "tet10")
    pool = make_lattice_pool(st, 10)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(st.n_nodes, 3)))
    w = jnp.asarray(rng.normal(size=(pool.n_agg, 3)))
    lhs = float(jnp.vdot(pool.restrict(v), w))
    rhs = float(jnp.vdot(v, pool.prolong(w)))
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), 1.0)


@pytest.mark.parametrize(
    "cells,S,target",
    [
        ((8, 3, 4), 4, 6),
        ((16, 2, 2), 8, 32),
        ((12, 5, 5), 4, 30),
    ],
)
def test_sharded_pool_matches_global(cells, S, target):
    devs = jax.devices()
    if len(devs) < S:
        pytest.skip(f"needs {S} devices")
    from jax import shard_map
    from jax.sharding import Mesh as JaxMesh, PartitionSpec as P

    st = build_box_structure(*cells, "tet10")
    sp = structured_partition(st, S)
    spool = make_sharded_lattice_pool(st, sp.local, target)
    gpool = global_pool_of(spool, st)
    agg = gpool.agg_host()
    rng = np.random.default_rng(2)
    v = rng.normal(size=(st.n_nodes, 6))
    rc_ref = np.zeros((gpool.n_agg, 6))
    np.add.at(rc_ref, agg, v)
    v_loc = sp.from_global(v) * sp.own_mask[:, :, None]  # owner-masked
    mesh = JaxMesh(np.array(devs[:S]), ("shard",))
    w = rng.normal(size=(gpool.n_agg, 6))

    def body(vl):
        rc = spool.restrict(vl[0])
        za = spool.prolong(jnp.asarray(w))
        return rc[None], za[None]

    rc, za = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=(P("shard"),),
            out_specs=(P("shard"), P("shard")), check_vma=False,
        )
    )(jnp.asarray(v_loc))
    expect = w[agg]
    for p in range(S):
        # restrict is psum-replicated; prolong reads each shard's slab
        np.testing.assert_allclose(
            np.asarray(rc[p]), rc_ref, rtol=1e-12, atol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(za[p]), expect[sp.local_to_global[p]]
        )


def test_coarse_space_pool_equals_indexed_apply():
    """build_coarse_space on a structured mesh (pooled transfer) applies
    the same preconditioner as the indexed CoarseSpace over the same
    aggregation (same acinv, same dvec)."""
    import dataclasses

    from fea_large_tpu import NeoHookean
    from fea_large_tpu.bc import DirichletBuilder
    from fea_large_tpu.mesh.generators import box_mesh_kuhn
    from fea_large_tpu.ops.soa import ScatterBuckets, SoAProblem
    from fea_large_tpu.solvers.multilevel import build_coarse_space
    from fea_large_tpu.config import INDEX_DTYPE

    mesh = box_mesh_kuhn(5, 3, 3, element_type="tet10")
    mat = NeoHookean(jnp.asarray(1.0), jnp.asarray(0.6))
    bc = DirichletBuilder(mesh).fix("zmin").prescribe("zmax", "z", -0.1).build()
    soa = SoAProblem.build(mesh, jnp.float32)
    coarse = build_coarse_space(mesh, mat, bc, agg_size=20, modes=6, soa=soa)
    assert coarse.pool is not None and coarse.buckets is None
    agg = coarse.pool.agg_host()
    indexed = dataclasses.replace(
        coarse,
        pool=None,
        buckets=ScatterBuckets.build(agg[None, :], coarse.n_agg),
        perm=jnp.asarray(np.argsort(agg, kind="stable"), INDEX_DTYPE),
        segids=jnp.asarray(np.sort(agg), INDEX_DTYPE),
    )
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.normal(size=(mesh.n_nodes, 3)), jnp.float32)
    za = np.asarray(coarse.apply(r))
    zb = np.asarray(indexed.apply(r))
    np.testing.assert_allclose(za, zb, rtol=1e-5, atol=1e-6 * np.abs(zb).max())
