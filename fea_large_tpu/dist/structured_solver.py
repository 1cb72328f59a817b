"""Structured domain-decomposed solver: config 5 with NO indexed ops.

`ShardedNewtonSolver` (dist/sharded.py) distributes any mesh with general
indexed halo maps and per-shard indexed gather/scatter. On a Kuhn lattice
box the single-device path already replaced every indexed op with static
slices/pads (mesh/structure.py, ops/soa.py — measured 3.2x per PCG
iteration at 1M DOF, BENCH_NOTES round 3); this solver extends that to
the device mesh (SURVEY.md C19/C20, BASELINE.json:11):

  * slab partition of the CELL lattice (dist/structured.py) — every
    shard's local region is itself a Kuhn box, so each shard runs the
    SAME structured slice/pad element kernels on its local class grids;
  * the slot-compressed geometry tables ([q, npe, 3, 6] — translation-
    invariant) are REPLICATED, a few KB per shard;
  * halo exchange is ONE contiguous boundary-plane `ppermute` per
    direction (left plane of shard p == right plane of shard p-1; the
    send buffer is a static class-grid slice, the receive a static
    concat) — no index maps at all;
  * PCG dot products weight by the ownership mask and `psum`;
  * the two-level coarse transfer is LATTICE-BLOCK POOLED
    (ops/pooling.py): restrict/prolong are per-class reshape-sums /
    broadcasts at the slab offset — so element kernels, halo exchange,
    AND the coarse apply are all free of indexed gathers/scatters
    (round 4; the round-3 build still ran the generic indexed coarse).

Vector convention ("consistent" layout): every local nodal array holds
the TRUE global value at every local slot, including the shared boundary
planes (replicated between the two touching shards). Element passes
produce PARTIAL sums at both boundary planes; `reduce+gather` (one
backward hop adding left-plane partials into the owner's right plane,
one forward hop refreshing the non-owned left planes) restores
consistency. Dots weight by the ownership mask so replicated plane slots
count once. Axpy-type updates with psum-replicated scalars preserve
consistency, so PCG runs entirely on consistent vectors.

The host control loop (incremental loading, Eisenstat-Walker forcing,
chunked-PCG driving, bisection) is INHERITED from ShardedNewtonSolver —
this class only swaps the device programs and the partition shim, so the
two sharded paths cannot drift in solver semantics. Per-iteration device
arithmetic mirrors the generic bodies statement-for-statement (the EW
forcing lives in the one shared `newton.device_forcing` helper).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from fea_large_tpu.bc import DirichletBC
from fea_large_tpu.config import DTYPE
from fea_large_tpu.dist.sharded import (
    ShardedCoarse,
    ShardedNewtonSolver,
    ShardedProbe,
)
from fea_large_tpu.dist.structured import (
    StructuredPartition,
    add_right_planes,
    left_planes,
    right_planes,
    set_left_planes,
    structured_partition,
)
from fea_large_tpu.materials.base import Material
from fea_large_tpu.mesh.core import Mesh
from fea_large_tpu.ops.soa import (
    SoAProblem,
    SoAState,
    soa_apply_tangent,
    soa_diag_blocks,
    soa_freeze,
    soa_internal_force,
)
from fea_large_tpu.solvers.linear import (
    PCGState,
    apply_block_jacobi,
    jacobi_inverse_blocks,
    pcg_chunk,
    pcg_init,
)
from fea_large_tpu.solvers.newton import SolverOptions, device_forcing


class StructData(NamedTuple):
    """Device-resident per-shard arrays (leading axis = shard axis S); all
    nodal arrays are in the local CLASS-GRID layout and consistent (true
    values at boundary-plane slots on both touching shards)."""

    own_mask: jnp.ndarray  # f64[S, N_loc] 1 where this shard owns the node
    own_left: jnp.ndarray  # f64[S, plane] 1 where the left-plane slot is owned
    free_mask: jnp.ndarray  # f64[S, N_loc, 3]
    bc_values: jnp.ndarray  # f64[S, N_loc, 3]
    f_ext: jnp.ndarray  # f64[S, N_loc, 3]


class StructSoA(NamedTuple):
    """REPLICATED local SoA problems (identical on every shard: the local
    box is the same and the slot-compressed geometry tables are
    translation-invariant). p32 is 0-extent on the pure-f64 path."""

    p64: SoAProblem
    p32: SoAProblem


def _strip_index_maps(p: SoAProblem) -> SoAProblem:
    """The structured route never touches conn/perm/segids — replace them
    with 0-extent placeholders so the replicated pytree stays tiny."""
    npe = p.conn_T.shape[0]
    z = jnp.zeros((npe, 0), p.conn_T.dtype)
    z1 = jnp.zeros((0,), p.perm_T.dtype)
    return SoAProblem(
        gradN=p.gradN, detJxW=p.detJxW, conn_T=z, perm_T=z1, segids_T=z1,
        buckets=None, n_nodes=p.n_nodes, structure=p.structure,
        tables_host=p.tables_host,  # the fused Pallas kernel's constants
    )


@dataclasses.dataclass(frozen=True)
class _StructShim:
    """Partition-interface shim: the attributes/methods the inherited host
    control loop reads from `self.part`, backed by StructuredPartition
    (local layout has no [owned | halo] prefix split — ownership is the
    mask, `n_owned` is the full local layout size)."""

    sp: StructuredPartition

    @property
    def n_shards(self) -> int:
        return self.sp.n_shards

    @property
    def n_owned(self) -> int:
        return self.sp.n_local

    @property
    def n_halo(self) -> int:
        return self.sp.plane_size

    @property
    def kmax(self) -> int:
        return 1

    @property
    def own_mask(self) -> np.ndarray:
        return self.sp.own_mask

    def to_global(self, u_shards: np.ndarray, n_nodes: int) -> np.ndarray:
        return self.sp.to_global(u_shards)

    def from_global(self, x: np.ndarray) -> np.ndarray:
        return self.sp.from_global(x)


def structured_shardable(mesh: Mesh, n_shards: int) -> bool:
    """True when `mesh` can run on the structured sharded path: it carries
    a BoxStructure whose x cell count divides n_shards evenly, and its
    coordinates are the undeformed uniform lattice (the slot-compressed
    geometry replication assumes translation invariance)."""
    st = getattr(mesh, "structure", None)
    if st is None or st.cells[0] % n_shards != 0:
        return False
    from fea_large_tpu.mesh.structure import class_coords

    coords = mesh.coords_host
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    expect = class_coords(st, *(hi - lo)) + lo
    return bool(np.max(np.abs(coords - expect)) <= 1e-12 * max(np.max(hi - lo), 1.0))


def make_sharded_solver(
    mesh: Mesh,
    material: Material,
    bc: DirichletBC,
    f_ext=None,
    options: SolverOptions | None = None,
    devices=None,
    partition_method: str = "slab",
):
    """Factory: the structured sharded solver when the mesh supports it
    (Kuhn lattice, divisible slab count, undeformed lattice coords) and
    the options are in its program matrix, else the general
    ShardedNewtonSolver — same constructor surface, same result."""
    devices = list(jax.devices()) if devices is None else list(devices)
    opts = options or SolverOptions()
    if (
        partition_method == "slab"
        and opts.linear == "pcg"
        and opts.precision in ("f64", "mixed")
        and opts.preconditioner in ("jacobi", "two_level")
        and opts.coarse_modes in (3, 6)
        and structured_shardable(mesh, len(devices))
    ):
        return StructuredShardedSolver(
            mesh, material, bc, f_ext=f_ext, options=opts, devices=devices
        )
    return ShardedNewtonSolver(
        mesh, material, bc, f_ext=f_ext, options=opts, devices=devices,
        partition_method=partition_method,
    )


class StructuredShardedSolver(ShardedNewtonSolver):
    """Drop-in sharded solver for Kuhn lattice boxes (see module docstring).
    Inherits the entire host control loop from ShardedNewtonSolver; builds
    structured device programs instead of the indexed ones."""

    def __init__(
        self,
        mesh: Mesh,
        material: Material,
        bc: DirichletBC,
        f_ext=None,
        options: SolverOptions | None = None,
        devices=None,
    ):
        self.mesh = mesh
        self.material = material
        self.options = options or SolverOptions()
        if self.options.linear != "pcg":
            raise ValueError("sharded solver supports linear='pcg' only")
        if self.options.precision not in ("f64", "mixed"):
            raise ValueError(f"unknown precision {self.options.precision!r}")
        if self.options.preconditioner not in ("jacobi", "two_level"):
            raise ValueError(
                f"sharded preconditioner must be 'jacobi' or 'two_level', "
                f"got {self.options.preconditioner!r}"
            )
        devices = list(jax.devices()) if devices is None else list(devices)
        S = len(devices)
        if not structured_shardable(mesh, S):
            raise ValueError(
                "mesh is not structured-shardable (no BoxStructure, "
                "nx % n_shards != 0, or deformed lattice coords) — use "
                "make_sharded_solver / ShardedNewtonSolver"
            )
        sp = structured_partition(mesh.structure, S)
        self.spart = sp
        self.part = _StructShim(sp)

        self.jmesh = JaxMesh(np.array(devices), ("shard",))
        sh = NamedSharding(self.jmesh, P("shard"))
        repl = NamedSharding(self.jmesh, P())
        self._sharding = sh
        self._pcg_dtype = (
            jnp.float32 if self.options.precision == "mixed" else DTYPE
        )

        def put(x, dtype):
            return jax.device_put(jnp.asarray(x, dtype), sh)

        # consistent local-layout BC / load tables (ownership enters via
        # the own-weighted dots, not by masking the data)
        ol = np.stack(
            [
                np.asarray(left_planes(sp, sp.own_mask[p][:, None]))[:, 0]
                for p in range(S)
            ]
        )
        fext_g = (
            np.zeros((mesh.n_nodes, 3))
            if f_ext is None
            else np.asarray(f_ext)
        )
        self.data = StructData(
            own_mask=put(sp.own_mask, DTYPE),
            own_left=put(ol, DTYPE),
            free_mask=put(sp.from_global(np.asarray(bc.free_mask)), DTYPE),
            bc_values=put(sp.from_global(np.asarray(bc.values)), DTYPE),
            f_ext=put(sp.from_global(fext_g), DTYPE),
        )

        # replicated local SoA problems: the local box is identical on all
        # shards and the Kuhn lattice is translation-invariant, so ONE
        # slot-compressed table set serves every shard (a few KB)
        from fea_large_tpu.mesh.generators import box_mesh_kuhn

        coords = mesh.coords_host
        lo, hi = coords.min(axis=0), coords.max(axis=0)
        nx, ny, nz = mesh.structure.cells
        local_mesh = box_mesh_kuhn(
            sp.cells_per_shard, ny, nz,
            lx=(hi[0] - lo[0]) * sp.cells_per_shard / nx,
            ly=hi[1] - lo[1], lz=hi[2] - lo[2],
            element_type=mesh.element_type,
        )
        assert local_mesh.n_nodes == sp.n_local
        p64 = _strip_index_maps(SoAProblem.build(local_mesh, jnp.float64))
        mixed = self.options.precision == "mixed"
        p32 = _strip_index_maps(SoAProblem.build(local_mesh, jnp.float32))
        if not mixed:  # pure-f64 parity path never reads the f32 tables
            p32 = dataclasses.replace(
                p32, gradN=p32.gradN[:0], detJxW=p32.detJxW[:0]
            )
        self.soa = StructSoA(
            p64=jax.tree.map(lambda x: jax.device_put(x, repl), p64),
            p32=jax.tree.map(lambda x: jax.device_put(x, repl), p32),
        )
        self._material_p = (
            jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), material)
            if mixed
            else material
        )

        self._build_coarse_structured(put)
        self._build_programs_structured()
        self._run_coarse_probe()  # inherited: fills coarse.acinv

    # ------------------------------------------------------------------
    def _build_coarse_structured(self, put):
        """Coarse space via LATTICE-BLOCK pooling (ops/pooling.py): the
        aggregate assignment is slab-aligned cell blocks, so the device
        restrict/prolong are per-class reshape-sums/broadcasts plus one
        contiguous dynamic slice at the slab offset — no indexed ops,
        completing the module's no-indexed-ops claim for the coarse apply
        (round-3 VERDICT item 3). Same probe-plan machinery as the generic
        path on the SAME aggregate ids; the RESTRICT masks by ownership
        via `valid`, and the prolong is consistent by construction (both
        shards sharing a boundary plane read the same block)."""
        sp = self.spart
        S = sp.n_shards
        self.coarse = None
        self._probe = None
        self._probe_ctx = None
        self._n_agg = 0
        self._lattice_pool = None
        if self.options.preconditioner == "jacobi":
            return
        from fea_large_tpu.ops.pooling import (
            global_pool_of,
            make_sharded_lattice_pool,
        )
        from fea_large_tpu.solvers.multilevel import (
            _probe_plan,
            _rbm_dvec,
            default_agg_size,
        )

        modes = self.options.coarse_modes
        coords = self.mesh.coords_host
        agg_size = self.options.agg_size or default_agg_size(
            self.mesh.n_nodes, target_coarse=5000 if modes == 3 else 2500,
            structured=True,
        )
        spool = make_sharded_lattice_pool(
            self.mesh.structure, sp.local,
            max(1, self.mesh.n_nodes // agg_size),
        )
        self._lattice_pool = spool
        agg = global_pool_of(spool, self.mesh.structure).agg_host()
        n_agg = int(agg.max()) + 1
        assert n_agg == spool.n_agg
        dvec_np = None
        if modes == 6:
            cnt = np.bincount(agg, minlength=n_agg).astype(float)
            cent = np.stack(
                [
                    np.bincount(agg, weights=coords[:, d], minlength=n_agg)
                    / cnt
                    for d in range(3)
                ],
                axis=1,
            )
            dvec_np = _rbm_dvec(coords, agg, cent, n_agg)
        color, Bn, dv, cm, zsrc, dst, nc = _probe_plan(
            self.mesh.conn_host, agg, n_agg, modes, dvec_np
        )

        dvec_loc = (
            dvec_np[sp.local_to_global] if modes == 6 else np.zeros((S, 0, 3))
        )
        from fea_large_tpu.config import INDEX_DTYPE

        # the pooled transfer needs no index maps — 0-extent placeholders
        # keep the ShardedCoarse pytree structure shared with the generic
        # path (the host control loop and specs are inherited)
        z = np.zeros((S, 0), np.int64)
        self.coarse = ShardedCoarse(
            agg_own=put(z, INDEX_DTYPE),
            perm_own=put(z, INDEX_DTYPE),
            segids_own=put(z, INDEX_DTYPE),
            valid=put(sp.own_mask, jnp.float32),
            dvec_own=put(dvec_loc, jnp.float32),
            acinv=jnp.zeros((nc, nc), self._pcg_dtype),
        )
        self._n_agg = n_agg
        self._probe_ctx = {
            "cm": cm, "zsrc": zsrc, "dst": dst, "nc": nc,
            "tables": ShardedProbe(
                Bn_own=put(Bn[sp.local_to_global], jnp.float32),
                color_own=put(color[agg][sp.local_to_global], INDEX_DTYPE),
            ),
            "agg": agg, "dvec": dvec_np, "modes": modes,
        }

    # ------------------------------------------------------------------
    def _build_programs_structured(self):
        """The structured mirrors of dist/sharded._build_programs's bodies:
        same signatures (the inherited host loop calls them identically),
        same per-iteration arithmetic, exchange via boundary-plane
        ppermute instead of indexed halo maps."""
        sp, opts = self.spart, self.options
        S = sp.n_shards
        material = self.material
        material_p = self._material_p
        pdt = self._pcg_dtype
        n_local = sp.n_local
        n_agg = self._n_agg
        fwd = [(i, (i + 1) % S) for i in range(S)]
        bwd = [(i, (i - 1) % S) for i in range(S)]

        def _bm(m, x):
            """Broadcast a [n] mask over the trailing dims of x [n, ...]."""
            return m.astype(x.dtype).reshape(m.shape[0], *([1] * (x.ndim - 1)))

        def gather(d: StructData, x):
            """Refresh the non-owned left-plane slots of a local field from
            the neighbor's (complete) right plane — one forward hop."""
            recv = lax.ppermute(right_planes(sp, x), "shard", fwd)
            ol = _bm(d.own_left, recv)
            new_left = ol * left_planes(sp, x) + (1.0 - ol) * recv
            return set_left_planes(sp, x, new_left)

        def reduce_gather(d: StructData, y):
            """Element-pass output (partial at both boundary planes) ->
            consistent: return left-plane partials to the owner's right
            plane (backward hop), then refresh the left planes (forward
            hop). Shard 0's left plane is owned/domain-boundary: it sends
            zeros and keeps its own values."""
            buf = left_planes(sp, y) * (1.0 - _bm(d.own_left, y))
            y = add_right_planes(sp, y, lax.ppermute(buf, "shard", bwd))
            return gather(d, y)

        def make_dot(d: StructData):
            """Ownership-weighted global dot: boundary-plane slots are
            replicated on two shards and must count once."""
            def dot(a, b):
                return lax.psum(jnp.vdot(a * _bm(d.own_mask, a), b), "shard")

            return dot

        def _sq(t):
            return jax.tree.map(lambda x: x[0], t)

        def p_of(soa: StructSoA) -> SoAProblem:
            return soa.p32 if pdt == jnp.float32 else soa.p64

        def _residual64(d, soa, u, scale):
            u_c = gather(d, u)
            st64 = soa_freeze(soa.p64, material, u_c.T)
            f = reduce_gather(d, soa_internal_force(soa.p64, st64).T)
            return (scale * d.f_ext - f) * d.free_mask

        def residual_body(d, soa, u, scale):
            d = _sq(d)
            r = _residual64(d, soa, u[0], scale[()])
            dot = make_dot(d)
            # clamp: see solvers/linear.pcg_init (TPU emulated dot
            # reductions can round a self-dot negative near zero)
            return jnp.sqrt(jnp.maximum(dot(r, r), 0.0))

        def impose_body(d, u, scale):
            d = _sq(d)
            u, scale = u[0], scale[()]
            u = d.free_mask * u + (1.0 - d.free_mask) * (scale * d.bc_values)
            return u[None]

        def _sq_coarse(coarse):
            if coarse is None:
                return None
            return ShardedCoarse(
                agg_own=coarse.agg_own[0], perm_own=coarse.perm_own[0],
                segids_own=coarse.segids_own[0], valid=coarse.valid[0],
                dvec_own=coarse.dvec_own[0],
                acinv=coarse.acinv,  # replicated
            )

        pool = self._lattice_pool

        def coarse_restrict(coarse, t):
            # lattice-block pooled P^T (ops/pooling.py): per-class reshape-
            # sums + one slab-offset dynamic_update_slice + psum — the
            # indexed segment-sum of the generic path, with zero gathers
            return pool.restrict(t)

        def coarse_apply(coarse, r):
            """Identical arithmetic to the generic coarse_apply on the SAME
            aggregate assignment; `valid` is the ownership mask (restrict
            counts each node once), and the pooled prolong is consistent by
            construction (both shards sharing a boundary plane read the
            same block)."""
            modes = coarse.acinv.shape[0] // n_agg
            rp = r * coarse.valid[:, None]
            if modes == 6:
                dp = coarse.dvec_own.astype(r.dtype)
                rp = jnp.concatenate([rp, jnp.cross(dp, rp)], axis=1)
            rc = coarse_restrict(coarse, rp)
            xc = (
                coarse.acinv @ rc.reshape(-1).astype(coarse.acinv.dtype)
            ).reshape(n_agg, modes).astype(r.dtype)
            za = pool.prolong(xc)
            if modes == 6:
                return za[:, :3] + jnp.cross(
                    za[:, 3:], coarse.dvec_own.astype(r.dtype)
                )
            return za

        def _apply_tangent(p, state, v_T):
            """Shard-local tangent action: route the f32 path through the
            FUSED structured Pallas kernel on the TPU (ops/
            pallas_structured.py, round 4 — measured 4.7x the XLA slice/
            pad graph single-device; the support check reads only static
            pytree aux, so it resolves at trace time under shard_map)."""
            from fea_large_tpu.config import on_tpu
            from fea_large_tpu.ops.pallas_structured import (
                soa_apply_tangent_struct_pallas,
                struct_pallas_supported,
            )

            if (
                pdt == jnp.float32
                and on_tpu()
                and struct_pallas_supported(p)
            ):
                return soa_apply_tangent_struct_pallas(p, state, v_T)
            return soa_apply_tangent(p, state, v_T)

        def _make_ops(d, soa, coarse, state, inv_blocks, freeN):
            p = p_of(soa)

            def matvec(v):
                # v is consistent (PCG invariant) — halo values are present
                vm = v * freeN
                y = reduce_gather(d, _apply_tangent(p, state, vm.T).T)
                return y * freeN + (v - vm)

            def precond(r):
                z = apply_block_jacobi(inv_blocks, freeN, r)
                if coarse is not None:
                    z = z + freeN * coarse_apply(coarse, r)
                return z

            return matvec, precond

        def _prepare_common(d, soa, coarse, u, r64, tol, x0):
            freeN = d.free_mask.astype(pdt)
            u_c = gather(d, u)
            p = p_of(soa)
            state = soa_freeze(p, material_p, u_c.astype(pdt).T)
            diag = reduce_gather(
                d, jnp.transpose(soa_diag_blocks(p, state), (2, 0, 1))
            )
            inv_blocks = jacobi_inverse_blocks(diag, freeN)
            matvec, precond = _make_ops(d, soa, coarse, state, inv_blocks, freeN)
            if x0 is not None:
                x0 = gather(d, x0)  # defensive: accept owner-only layouts
            st = pcg_init(
                matvec, r64.astype(pdt), preconditioner=precond,
                tol=tol, x0=x0, dot=make_dot(d),
            )
            return st, state, inv_blocks, matvec, precond

        def prepare_body(d, soa, coarse, u, scale, tol, x0):
            d = _sq(d)
            coarse = _sq_coarse(coarse)
            u, scale = u[0], scale[()]
            r64 = _residual64(d, soa, u, scale)
            st, state, inv_blocks, _, _ = _prepare_common(
                d, soa, coarse, u, r64, tol.astype(pdt), x0[0].astype(pdt)
            )
            st_out = PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            return st_out, SoAState(*(x[None] for x in state)), inv_blocks[None]

        use_ew = opts.forcing == "ew"

        def newton_iter_body(
            d, soa, coarse, u, x_prev, scale, prev_norm, norm0_prev,
            eta_prev, first_it, stop_newton, pcg_tol,
        ):
            """Statement-for-statement mirror of the generic fused sharded
            Newton iteration (dist/sharded.newton_iter_body) on the
            structured exchange."""
            d = _sq(d)
            coarse = _sq_coarse(coarse)
            u, scale = u[0], scale[()]
            u = u + x_prev[0].astype(u.dtype)
            r64 = _residual64(d, soa, u, scale)
            dot = make_dot(d)
            norm = jnp.sqrt(jnp.maximum(dot(r64, r64), 0.0))
            norm0 = jnp.where(first_it, norm, norm0_prev)
            if pdt == jnp.float32:
                floor = jnp.full((), 1.2e-6, jnp.float64)
            else:
                floor = jnp.minimum(
                    2.2e-14 * norm0 / jnp.maximum(norm, 1e-300), 0.1
                )
            eta, lin_tol = device_forcing(
                norm, prev_norm, eta_prev, first_it, pcg_tol, use_ew, floor,
                stop_newton, opts.ew_eta_min,
            )
            tol_eff = jnp.where(norm <= stop_newton, 1e30, lin_tol)
            st, state, inv_blocks, matvec, precond = _prepare_common(
                d, soa, coarse, u, r64, tol_eff.astype(pdt), None
            )
            st = pcg_chunk(
                matvec, st, preconditioner=precond, dot=dot,
                maxiter=min(opts.pcg_chunk, opts.pcg_maxiter),
            )
            st_out = PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            return (
                u[None], st_out, SoAState(*(x[None] for x in state)),
                inv_blocks[None], r64[None], norm, eta, lin_tol,
            )

        def chunk_body(d, soa, coarse, st, state, inv_blocks, n):
            d = _sq(d)
            coarse = _sq_coarse(coarse)
            state = _sq(state)
            inv_blocks = inv_blocks[0]
            freeN = d.free_mask.astype(pdt)
            st = PCGState(
                st.x[0], st.r[0], st.z[0], st.p[0],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            matvec, precond = _make_ops(d, soa, coarse, state, inv_blocks, freeN)
            st = pcg_chunk(
                matvec, st, preconditioner=precond, dot=make_dot(d),
                maxiter=jnp.minimum(jnp.int32(opts.pcg_chunk), n),
            )
            return PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )

        def probe_body(d, soa, coarse, pt, cm):
            """Coarse-operator probing through the STRUCTURED tangent
            action (same plan/restriction as the generic probe_body)."""
            d = _sq(d)
            coarse = _sq_coarse(coarse)
            pt = _sq(pt)
            modes = pt.Bn_own.shape[2]
            freeN = d.free_mask.astype(pdt)
            p = p_of(soa)
            state0 = soa_freeze(p, material_p, jnp.zeros((3, n_local), pdt))

            def one(cm1):
                c, m = cm1[0], cm1[1]
                col = lax.dynamic_index_in_dim(
                    pt.Bn_own, m, axis=2, keepdims=False
                ).astype(pdt)
                v = jnp.where(pt.color_own == c, 1.0, 0.0).astype(pdt)[
                    :, None
                ] * col  # consistent: Bn/color sampled at all local slots
                vm = v * freeN
                y = reduce_gather(d, _apply_tangent(p, state0, vm.T).T)
                t = (y * freeN) * coarse.valid[:, None].astype(pdt)
                if modes == 6:
                    dp = coarse.dvec_own.astype(pdt)
                    t = jnp.concatenate([t, jnp.cross(dp, t)], axis=1)
                return coarse_restrict(coarse, t)

            return lax.map(one, cm)

        mesh = self.jmesh
        data_specs = StructData(*([P("shard")] * len(StructData._fields)))
        soa_specs = jax.tree.map(lambda _: P(), self.soa)
        if self.coarse is None:
            coarse_specs = None
        else:
            coarse_specs = ShardedCoarse(
                P("shard"), P("shard"), P("shard"), P("shard"), P("shard"),
                P(),
            )
        st_specs = PCGState(
            P("shard"), P("shard"), P("shard"), P("shard"),
            P(), P(), P(), P(), P(),
        )

        self._impose = jax.jit(
            shard_map(
                impose_body, mesh=mesh,
                in_specs=(data_specs, P("shard"), P()),
                out_specs=P("shard"), check_vma=False,
            )
        )
        self._residual_norm = jax.jit(
            shard_map(
                residual_body, mesh=mesh,
                in_specs=(data_specs, soa_specs, P("shard"), P()),
                out_specs=P(), check_vma=False,
            )
        )
        self._prepare = jax.jit(
            shard_map(
                prepare_body, mesh=mesh,
                in_specs=(
                    data_specs, soa_specs, coarse_specs, P("shard"), P(), P(),
                    P("shard"),
                ),
                out_specs=(st_specs, _state_out_specs(), P("shard")),
                check_vma=False,
            )
        )
        self._chunk = jax.jit(
            shard_map(
                chunk_body, mesh=mesh,
                in_specs=(
                    data_specs, soa_specs, coarse_specs, st_specs,
                    _state_out_specs(), P("shard"), P(),
                ),
                out_specs=st_specs, check_vma=False,
            )
        )
        self._newton_iter = jax.jit(
            shard_map(
                newton_iter_body, mesh=mesh,
                in_specs=(
                    data_specs, soa_specs, coarse_specs, P("shard"),
                    P("shard"), P(), P(), P(), P(), P(), P(), P(),
                ),
                out_specs=(
                    P("shard"), st_specs, _state_out_specs(), P("shard"),
                    P("shard"), P(), P(), P(),
                ),
                check_vma=False,
            )
        )
        if self.coarse is not None:
            self._probe = jax.jit(
                shard_map(
                    probe_body, mesh=mesh,
                    in_specs=(
                        data_specs, soa_specs, coarse_specs,
                        ShardedProbe(P("shard"), P("shard")), P(),
                    ),
                    out_specs=P(), check_vma=False,
                )
            )

    # ------------------------------------------------------------------
    def probe_coarse_matrix(self) -> jnp.ndarray:
        """Probed (pre-ridge) dense coarse matrix — test hook (see the
        generic override; local-layout probe tables here)."""
        from fea_large_tpu.config import INDEX_DTYPE
        from fea_large_tpu.solvers.multilevel import (
            _assemble_dense_coarse,
            _probe_plan,
        )

        ctx = self._probe_ctx
        agg, dvec, modes = ctx["agg"], ctx["dvec"], ctx["modes"]
        color, Bn, dv, cm, zsrc, dst, nc = _probe_plan(
            self.mesh.conn_host, agg, self._n_agg, modes, dvec
        )
        sp = self.spart
        sh = self._sharding
        tables = ShardedProbe(
            Bn_own=jax.device_put(
                jnp.asarray(Bn[sp.local_to_global], jnp.float32), sh
            ),
            color_own=jax.device_put(
                jnp.asarray(color[agg][sp.local_to_global], INDEX_DTYPE), sh
            ),
        )
        Z = self._probe(
            self.data, self.soa, self.coarse, tables, jnp.asarray(cm)
        )
        return _assemble_dense_coarse(
            Z.reshape(-1).astype(jnp.float32), zsrc, dst, nc=nc
        )

    # ------------------------------------------------------------------
    def memory_report(self) -> dict:
        """Per-shard device-memory budget (bytes) — structured layout: the
        SoA geometry tables are REPLICATED but slot-compressed (KB-scale,
        constant in N); nodal working arrays scale with the local grid."""
        S = self.spart.n_shards

        def nbytes(tree):
            return int(
                sum(
                    x.nbytes
                    for x in jax.tree.leaves(tree)
                    if hasattr(x, "nbytes")
                )
            )

        pdt_size = jnp.dtype(self._pcg_dtype).itemsize
        p = self.soa.p64
        q = p.gradN.shape[0]
        El = self.spart.local.n_tets * self.spart.local.n_cells
        N_loc = self.spart.n_local
        state_b = (3 * 9 + 2) * q * El * pdt_size
        pcg_b = 4 * N_loc * 3 * pdt_size
        jacobi_b = N_loc * 9 * pdt_size
        sharded_fields = {
            "agg_own", "perm_own", "segids_own", "valid", "dvec_own",
        }
        coarse_sharded = 0
        coarse_replicated = 0
        if self.coarse is not None:
            for name, x in zip(self.coarse._fields, self.coarse):
                if not hasattr(x, "nbytes"):
                    continue
                if name in sharded_fields:
                    coarse_sharded += x.nbytes // S
                else:
                    coarse_replicated += x.nbytes
        return {
            "n_shards": S,
            "owned_nodes": int(self.spart.own_mask.sum() / S),
            "halo_nodes": self.spart.plane_size,
            "elements": El,
            "static_partition_bc": nbytes(self.data) // S,
            "static_soa_tables": nbytes(self.soa),  # replicated, KB-scale
            "static_coarse_maps": coarse_sharded,
            "static_coarse_replicated": coarse_replicated,
            "work_frozen_state": state_b,
            "work_pcg_vectors": pcg_b,
            "work_jacobi_blocks": jacobi_b,
            "total_per_shard": (
                nbytes(self.data) // S
                + nbytes(self.soa)
                + coarse_sharded + coarse_replicated
                + state_b + pcg_b + jacobi_b
            ),
        }


def _state_out_specs():
    """SoAState produced inside the shard bodies is wrapped [1, ...] per
    shard (same convention as the generic path) -> sharded specs."""
    return SoAState(*([P("shard")] * len(SoAState._fields)))
