"""Lattice-block coarse aggregation: pooled restrict/prolong, no indexed ops.

On an unstructured mesh the two-level coarse transfer operators are indexed
(`CoarseSpace.restrict`: a permuted gather + segment-sum; `prolong`: an
`xc[agg]` gather), and TPU lowers those to scalar-core loops — measured
6.3 ms of the 11.2 ms per-iteration breakdown on the 1M-DOF structured mesh
(BENCH_NOTES round 3), with the dense `acinv` matvec inside it. On a Kuhn
lattice box (`mesh.structure`, mesh/structure.py) the aggregation need not
be generic: take the aggregates to be BLOCKS of the cell lattice. Every
node class is a regular grid, so

  * the per-node aggregate id is an AFFINE function of the grid index
    (block = floor(index / block_size), clamped at the trailing boundary
    plane), and
  * restrict becomes a per-class RESHAPE-SUM over block windows (with a
    static concat-add folding the clamped boundary layer into the last
    block), and prolong its exact transpose — a broadcast + slice.

Pure vectorized memory ops, identical math to the indexed transfer over
the same aggregate assignment (pinned by tests/test_multilevel.py), zero
gathers. The same trick extends to the slab-sharded lattice
(`ShardedLatticePool`): each shard pools its local class grids — the x axis
with one OVERFLOW block slot so the owned right boundary plane lands in the
neighbor's first block — places the pooled block into the global coarse
grid at its slab offset (one contiguous `dynamic_update_slice`), and a
`psum` assembles the global coarse residual, replicated, exactly as the
generic sharded restrict's psum does.

Spec lineage: the aggregation-based two-level preconditioner itself is
net-new vs the reference (SURVEY.md C12 ships plain Jacobi-PCG); this
module only changes HOW the fixed transfer operators are evaluated.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp
from jax import lax

from fea_large_tpu.mesh.structure import BoxStructure


def _pool_axis(g: jnp.ndarray, ax: int, b: int, nb: int) -> jnp.ndarray:
    """Sum windows of `b` along axis `ax` into `nb` blocks.

    g.shape[ax] may be nb*b (exact), < nb*b (zero-pad: nodes that do not
    exist contribute nothing), or > nb*b (the clamped trailing boundary
    layer of a d=0 class when b divides the cell count: concat-add it into
    the last block). All three are static reshape/pad/concat ops."""
    size = g.shape[ax]
    core_len = nb * b
    extra = None
    if size > core_len:
        core = lax.slice_in_dim(g, 0, core_len, axis=ax)
        extra = lax.slice_in_dim(g, core_len, size, axis=ax)
    elif size < core_len:
        pad = [(0, 0)] * g.ndim
        pad[ax] = (0, core_len - size)
        core = jnp.pad(g, pad)
    else:
        core = g
    if b == 1:
        pooled = core
    else:
        shape = core.shape[:ax] + (nb, b) + core.shape[ax + 1 :]
        pooled = core.reshape(shape).sum(axis=ax + 1)
    if extra is not None:
        pooled = jnp.concatenate(
            [
                lax.slice_in_dim(pooled, 0, nb - 1, axis=ax),
                lax.slice_in_dim(pooled, nb - 1, nb, axis=ax)
                + extra.sum(axis=ax, keepdims=True),
            ],
            axis=ax,
        )
    return pooled


def _unpool_axis(w: jnp.ndarray, ax: int, b: int, size: int) -> jnp.ndarray:
    """Exact transpose of `_pool_axis`: broadcast each block value over its
    `b`-window (the clamped boundary layer reads the last block; padded
    positions are sliced off)."""
    nb = w.shape[ax]
    core_len = nb * b
    if b == 1:
        rep = w
    else:
        rep = jnp.broadcast_to(
            jnp.expand_dims(w, ax + 1),
            w.shape[: ax + 1] + (b,) + w.shape[ax + 1 :],
        ).reshape(w.shape[:ax] + (core_len,) + w.shape[ax + 1 :])
    if size > core_len:
        last = lax.slice_in_dim(w, nb - 1, nb, axis=ax)
        reps = size - core_len
        if reps > 1:  # unreachable for the shipped classes (layer depth 1)
            last = jnp.concatenate([last] * reps, axis=ax)
        rep = jnp.concatenate([rep, last], axis=ax)
    elif size < core_len:
        rep = lax.slice_in_dim(rep, 0, size, axis=ax)
    return rep


@dataclasses.dataclass(frozen=True)
class LatticePool:
    """Static lattice-block aggregation of a Kuhn box's nodes (hashable —
    carried as pytree AUX metadata on CoarseSpace).

    block  (bx, by, bz) cells per aggregate block
    nb     (nbx, nby, nbz) = ceil(cells / block) blocks per axis; the
           aggregate of the node at class-grid index (i, j, k) is
           ravel(min(i//bx, nbx-1), ..., nb) — trailing boundary planes
           clamp into the last block.
    """

    structure: BoxStructure
    block: tuple
    nb: tuple

    @property
    def n_agg(self) -> int:
        return self.nb[0] * self.nb[1] * self.nb[2]

    def agg_host(self) -> np.ndarray:
        """i64[N] aggregate id per node — the assignment the pooled
        transfer realizes (host-side: feeds dvec/centroids/probe plan)."""
        st = self.structure
        out = []
        for k in range(len(st.classes)):
            gx, gy, gz = st.class_dims[k]
            i, j, kz = np.meshgrid(
                np.arange(gx), np.arange(gy), np.arange(gz), indexing="ij"
            )
            bi = np.minimum(i // self.block[0], self.nb[0] - 1)
            bj = np.minimum(j // self.block[1], self.nb[1] - 1)
            bk = np.minimum(kz // self.block[2], self.nb[2] - 1)
            out.append(((bi * self.nb[1] + bj) * self.nb[2] + bk).ravel())
        return np.concatenate(out).astype(np.int64)

    def restrict(self, v: jnp.ndarray) -> jnp.ndarray:
        """[N, C] -> [n_agg, C]: per-class pooled block sums, summed over
        classes (all classes share the one block grid).

        Internally CHANNEL-FIRST: a class grid with the channel dim
        trailing tiles as (gz, C) -> (8, 128) lanes — ~24x padding at
        C=6 — while [C, gx, gy, gz] tiles (gy, gz) at ~3.7x (round 4;
        the two cheap [N, C] transposes replace that amplification on
        every pooling stage). Same per-axis summation order."""
        st = self.structure
        vT = v.T
        out = None
        for k in range(len(st.classes)):
            gx, gy, gz = st.class_dims[k]
            b0 = st.class_base[k]
            g = vT[:, b0 : b0 + gx * gy * gz].reshape(-1, gx, gy, gz)
            for ax in range(3):
                g = _pool_axis(g, ax + 1, self.block[ax], self.nb[ax])
            out = g if out is None else out + g
        return out.reshape(out.shape[0], self.n_agg).T

    def prolong(self, w: jnp.ndarray) -> jnp.ndarray:
        """[n_agg, C] -> [N, C]: each node reads its block's value (the
        exact transpose of `restrict`); channel-first internally."""
        st = self.structure
        wg = w.T.reshape(-1, *self.nb)
        parts = []
        for k in range(len(st.classes)):
            dims = st.class_dims[k]
            g = wg
            for ax in range(3):
                g = _unpool_axis(g, ax + 1, self.block[ax], dims[ax])
            parts.append(g.reshape(g.shape[0], -1))
        return jnp.concatenate(parts, axis=1).T


def _best_block(cells, target_agg: int, bx_choices=None) -> tuple:
    """Search per-axis block sizes for the combo whose aggregate count is
    closest (log-ratio) to `target_agg`, tie-breaking toward cubic blocks.
    A uniform cube quantizes too coarsely: on the 35^3 headline lattice the
    integer cube sizes straddle the target 8x apart (b=2 -> 5832 blocks,
    b=3 -> 1728) while mixed blocks like (2, 3, 3) land within 25%."""
    best = None
    xs = bx_choices or range(1, min(cells[0], 16) + 1)
    for bx in xs:
        for by in range(1, min(cells[1], 16) + 1):
            for bz in range(1, min(cells[2], 16) + 1):
                nb = tuple(
                    -(-c // b) for c, b in zip(cells, (bx, by, bz))
                )
                n_agg = nb[0] * nb[1] * nb[2]
                miss = abs(math.log(n_agg / max(target_agg, 1)))
                aspect = max(bx, by, bz) / min(bx, by, bz)
                # elongated blocks make weak aggregates (the RBM basis
                # assumes compact support): weigh anisotropy against
                # target-miss rather than tie-breaking on it
                key = (miss + 0.3 * math.log(aspect), -bx * by * bz)
                if best is None or key < best[0]:
                    best = (key, (bx, by, bz))
    return best[1]


def make_lattice_pool(st: BoxStructure, target_agg: int) -> LatticePool:
    """Pick a near-cubic block size hitting ~`target_agg` aggregates."""
    cells = st.cells
    block = _best_block(cells, target_agg)
    nb = tuple(-(-c // bb) for c, bb in zip(cells, block))
    return LatticePool(structure=st, block=block, nb=nb)


@dataclasses.dataclass(frozen=True)
class ShardedLatticePool:
    """Slab-sharded lattice pooling (dist/structured_solver.py): shard p
    holds the local box (cp, ny, nz) = slab p of the global lattice; its
    x-block range is [p*nbl, p*nbl + nbl] — one OVERFLOW slot (nbl) for
    the owned right boundary plane, which belongs to the NEXT slab's first
    block (or clamps into the global last block on the final shard, folded
    after the psum). Requires bx | cp so blocks never straddle shards.

    The transfer pair is the exact global transpose: `restrict` masks by
    ownership at the caller (each node summed once), `prolong` reads the
    psum-replicated coarse solution — boundary-plane slots on both
    touching shards read the same block, so prolonged vectors are
    consistent by construction (module convention, dist/structured.py)."""

    local: BoxStructure  # the per-shard local sub-box
    block: tuple
    nb_global: tuple  # (NBx, NBy, NBz) over the GLOBAL lattice
    nbl: int  # local x blocks = cells_per_shard // bx

    @property
    def n_agg(self) -> int:
        return self.nb_global[0] * self.nb_global[1] * self.nb_global[2]

    def _local_nb(self) -> tuple:
        return (self.nbl + 1, self.nb_global[1], self.nb_global[2])

    def restrict(self, v: jnp.ndarray, axis_name: str = "shard") -> jnp.ndarray:
        """Owner-masked local field [N_loc, C] -> psum-replicated
        [n_agg, C]. Caller masks v by ownership first. Channel-first
        internally (see LatticePool.restrict — trailing-channel class
        grids tile at ~24x lane padding)."""
        st = self.local
        nb = self._local_nb()
        vT = v.T
        out = None
        for k in range(len(st.classes)):
            gx, gy, gz = st.class_dims[k]
            b0 = st.class_base[k]
            g = vT[:, b0 : b0 + gx * gy * gz].reshape(-1, gx, gy, gz)
            for ax in range(3):
                g = _pool_axis(g, ax + 1, self.block[ax], nb[ax])
            out = g if out is None else out + g
        NBx = self.nb_global[0]
        p = lax.axis_index(axis_name)
        buf = jnp.zeros(
            (out.shape[0], NBx + 1) + out.shape[2:], out.dtype
        )
        zero = jnp.zeros((), p.dtype)
        buf = lax.dynamic_update_slice(
            buf, out, (zero, p * self.nbl) + (zero,) * (out.ndim - 2)
        )
        buf = lax.psum(buf, axis_name)
        # fold the global clamp: block NBx only receives the final shard's
        # trailing boundary plane, which belongs to block NBx-1
        rc = jnp.concatenate(
            [
                buf[:, : NBx - 1],
                buf[:, NBx - 1 : NBx] + buf[:, NBx:],
            ],
            axis=1,
        )
        return rc.reshape(rc.shape[0], self.n_agg).T

    def prolong(self, w: jnp.ndarray, axis_name: str = "shard") -> jnp.ndarray:
        """Replicated [n_agg, C] -> local consistent field [N_loc, C]."""
        NBx, NBy, NBz = self.nb_global
        wg = w.T.reshape(-1, NBx, NBy, NBz)
        # duplicate the last x-block: the final shard's overflow slot reads
        # it (the global clamp, transpose of the fold above)
        wg = jnp.concatenate([wg, wg[:, NBx - 1 : NBx]], axis=1)
        p = lax.axis_index(axis_name)
        zero = jnp.zeros((), p.dtype)
        loc = lax.dynamic_slice(
            wg,
            (zero, p * self.nbl, zero, zero),
            (wg.shape[0], self.nbl + 1, NBy, NBz),
        )
        st = self.local
        parts = []
        for k in range(len(st.classes)):
            dims = st.class_dims[k]
            g = loc
            for ax in range(3):
                g = _unpool_axis(g, ax + 1, self.block[ax], dims[ax])
            parts.append(g.reshape(g.shape[0], -1))
        return jnp.concatenate(parts, axis=1).T


def make_sharded_lattice_pool(
    global_st: BoxStructure,
    local_st: BoxStructure,
    target_agg: int,
) -> ShardedLatticePool:
    """Block choice for the slab-sharded lattice: near-cubic toward
    ~`target_agg` aggregates, with bx constrained to divide the per-shard
    slab depth (largest divisor <= the unconstrained choice)."""
    cells = global_st.cells
    cp = local_st.cells[0]
    block = _best_block(
        cells, target_agg,
        bx_choices=[d for d in range(1, cp + 1) if cp % d == 0],
    )
    nb = tuple(-(-c // bb) for c, bb in zip(cells, block))
    return ShardedLatticePool(
        local=local_st, block=block, nb_global=nb, nbl=cp // block[0]
    )


def global_pool_of(sp: ShardedLatticePool, global_st: BoxStructure) -> LatticePool:
    """The single-lattice pool realizing the SAME global aggregate
    assignment as `sp` (host-side agg ids for dvec/centroids/probe plan).

    The x assignment matches because global block g//bx with g = p*cp + i
    equals p*nbl + i//bx (bx | cp), and both clamp the global trailing
    plane into block NBx-1."""
    return LatticePool(structure=global_st, block=sp.block, nb=sp.nb_global)
