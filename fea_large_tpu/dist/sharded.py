"""Domain-decomposed solver over a JAX device mesh (SURVEY.md C19/C20, §7.8;
config 5, BASELINE.json:11).

TPU-native distribution: a 1-D `jax.sharding.Mesh` ("shard" axis), all
per-shard arrays laid out [S, ...] and `shard_map`-ped; communication is
exactly three XLA collectives, riding ICI:

  * halo GATHER  — `lax.ppermute` ring hops k=1..kmax delivering owned
    values to the shards whose elements touch them (PCG SpMV input);
  * halo REDUCE  — reverse `ppermute` hops returning partial element sums at
    halo nodes to their owners (assembly "halo reduce-scatter", B:5);
  * `lax.psum`  — PCG dot products, residual norms, and the coarse-space
    restriction (the coarse residual is psum-replicated, solved redundantly
    on every shard, prolonged locally).

The element kernels, matrix-free tangent action, and PCG are the SAME SoA
functions as the single-device mixed path (`ops.soa`, `solvers.linear`)
applied to shard-local arrays — the distributed layer only adds the
exchange, which is how the halo maps get to be testable in isolation
(tests/test_dist.py). Both precisions run the same chunked program set:

  precision="f64"    SoA f64 residual + f64 tangent/PCG (parity path)
  precision="mixed"  SoA f64 residual + f32 tangent/PCG (performance path)

Every device execution is bounded (`pcg_chunk` CG iterations per call) so
long solves never hit backend execution limits; the Krylov recurrence
continues exactly across chunks, with up to 2 restarts on rounding-level
breakdown (see solvers/newton.py::_pcg_with_restart).
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
import jax.scipy.linalg as jsl
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from fea_large_tpu.bc import DirichletBC
from fea_large_tpu.config import DTYPE, INDEX_DTYPE
from fea_large_tpu.dist.partition import Partition, partition_mesh
from fea_large_tpu.materials.base import Material
from fea_large_tpu.mesh.core import Mesh
from fea_large_tpu.ops.soa import (
    ScatterBuckets,
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
    drive_chunked_pcg,
    jacobi_inverse_blocks,
    pcg_chunk,
    pcg_init,
)
from fea_large_tpu.solvers.newton import (
    IncrementRecord,
    SolveResult,
    SolverOptions,
    device_forcing,
    newton_lin_tol,
)


class ShardedData(NamedTuple):
    """Device-resident per-shard arrays (leading axis = shard axis S)."""

    send_idx: jnp.ndarray  # i32[S, kmax, Hl]
    send_mask: jnp.ndarray  # f64[S, kmax, Hl]
    recv_mask: jnp.ndarray  # f64[S, kmax, Hl]
    own_mask: jnp.ndarray  # f64[S, No]
    free_mask: jnp.ndarray  # f64[S, No, 3]
    bc_values: jnp.ndarray  # f64[S, No, 3]
    f_ext: jnp.ndarray  # f64[S, No, 3]


class ShardedSoA(NamedTuple):
    """Per-shard SoA (element-axis-last) tables — the distributed analog of
    `ops.soa.SoAProblem` (f64 tables for the residual/parity path, f32 for
    the mixed tangent/PCG). `buckets` are the valence-bucketed
    scatter-as-gather maps (ScatterBuckets) with a leading shard axis —
    cap list and bucket node counts are unified across shards
    (`ScatterBuckets.build_stacked`) so the pytree stacks; they are shared
    by both dtypes (index maps are dtype-independent)."""

    gradN64: jnp.ndarray  # f64[S, q, npe, 3, El]
    detJxW64: jnp.ndarray  # f64[S, q, El]
    gradN32: jnp.ndarray  # f32[S, q, npe, 3, El]
    detJxW32: jnp.ndarray  # f32[S, q, El]
    conn_T: jnp.ndarray  # i32[S, npe, El] (into local node space)
    perm_T: jnp.ndarray  # i32[S, npe*El] sorted (a,e)-by-local-node
    segids_T: jnp.ndarray  # i32[S, npe*El]
    buckets: ScatterBuckets  # leaves [S, nb, cap] / inv [S, No+Hl]


class ShardedCoarse(NamedTuple):
    """Per-shard aggregation maps + replicated coarse factor (two-level
    preconditioner across the device mesh: restrict locally, psum the
    coarse residual, solve redundantly on every shard, prolong locally).
    Supports the translation (modes=3) and rigid-body-mode (modes=6)
    coarse bases — multilevel.CoarseSpace docstring; modes is recovered
    statically from acinv.shape[0] // Nc."""

    agg_own: jnp.ndarray  # i32[S, No] aggregate of each owned node
    perm_own: jnp.ndarray  # i32[S, No] sort of owned nodes by aggregate
    segids_own: jnp.ndarray  # i32[S, No] ascending (padded slots clamped)
    valid: jnp.ndarray  # f32[S, No] 1 for real owned nodes
    dvec_own: jnp.ndarray  # f32[S, No, 3] normalized rotational arm
    #   (multilevel._rbm_dvec; 0-extent [S, 0, 3] when modes=3 — never read)
    acinv: jnp.ndarray  # f32[modes*Nc, modes*Nc] replicated explicit inverse
    #   of Ac (applied as ONE dense matvec — multilevel.CoarseSpace.coarse_solve)


class ShardedProbe(NamedTuple):
    """Transient per-shard tables for the SHARDED coarse-operator probing
    assembly (freed after setup): the distance-2-coloring probe sweep runs
    through the already-sharded tangent action (halo exchange + psum
    restriction), so coarse setup peak memory is O(N/S) per device instead
    of a full single-device SoA table set (round-2 VERDICT item 4)."""

    Bn_own: jnp.ndarray  # f32[S, No, 3, modes] per-node RBM basis columns
    color_own: jnp.ndarray  # i32[S, No] aggregate color (-1 at padding)


@jax.jit
def _sharded_update_jit(u, x):
    """u + du in one fused device call (two eager ops cost two ~30 ms
    tunnel dispatches per Newton step — solvers/newton.py note)."""
    return u + x.astype(u.dtype)


def _host_geometry(mesh: Mesh, part: Partition):
    """Shard-ordered padded (gradN, detJxW) computed in host numpy (cold
    path; avoids device round-trips during setup — SURVEY.md §4.5)."""
    elem = mesh.element
    coords, conn = mesh.coords_host, mesh.conn_host
    dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
    w = np.asarray(elem.quad_weights)
    Xe = coords[conn]  # [E, npe, 3]
    J = np.einsum("eai,qaj->eqij", Xe, dN)
    from fea_large_tpu.ops.soa import _np_inv_det_3x3

    detJ, Jinv = _np_inv_det_3x3(J)
    gradN = np.einsum("qaj,eqji->eqai", dN, Jinv)
    detJxW = detJ * w[None, :]

    S, El = part.n_shards, part.n_elems
    q, npe = dN.shape[0], conn.shape[1]
    g = np.zeros((S, El, q, npe, 3))
    v = np.zeros((S, El, q))
    for p in range(S):
        real = part.elem_global[p] >= 0
        ids = part.elem_global[p][real]
        g[p, real] = gradN[ids]
        v[p, real] = detJxW[ids]
    return g, v


def _padded_sorted_maps(values, valid, n_segments):
    """(perm, segids): stable sort of each row by segment id with padded
    slots (valid==0) sorted last and their ids clamped into range — yields
    ASCENDING segids safe for indices_are_sorted=True segment sums (padded
    contributions must be zeroed by the caller via `valid`)."""
    offset = (values + (1 - valid) * n_segments).astype(np.int64)
    perm = np.argsort(offset, axis=1, kind="stable")
    segids = np.take_along_axis(offset, perm, axis=1)
    return perm, np.minimum(segids, n_segments - 1)


@dataclasses.dataclass
class ShardedNewtonSolver:
    """Drop-in distributed analog of `solvers.newton.NewtonSolver` using the
    matrix-free SoA PCG backend over a device mesh. The host control loop
    (incremental loading, Eisenstat-Walker forcing, bisection, records) is
    identical; the jitted programs are `shard_map`-ped with halo
    collectives."""

    #: count of two-level -> jacobi preconditioner fallbacks taken (see
    #: `_newton`); observability hook for tests and run records
    precond_fallbacks: int = 0

    def __init__(
        self,
        mesh: Mesh,
        material: Material,
        bc: DirichletBC,
        f_ext: jnp.ndarray | None = None,
        options: SolverOptions | None = None,
        devices=None,
        partition_method: str = "slab",
    ):
        self.mesh = mesh
        self.material = material
        self.options = options or SolverOptions()
        if self.options.linear != "pcg":
            raise ValueError("sharded solver supports linear='pcg' only")
        if self.options.precision not in ("f64", "mixed"):
            raise ValueError(f"unknown precision {self.options.precision!r}")
        if self.options.preconditioner not in ("jacobi", "two_level"):
            # three_level is an EXPERIMENTAL single-device option: it lost
            # to the RBM two-level at every measured size (BENCH_NOTES.md
            # 4M-DOF sweep: 14.98 vs 6.14 s/step) and is off the sharded
            # program matrix (round-2 VERDICT item 8).
            raise ValueError(
                f"sharded preconditioner must be 'jacobi' or 'two_level', "
                f"got {self.options.preconditioner!r}"
            )
        devices = list(jax.devices()) if devices is None else list(devices)
        S = len(devices)
        self.part = partition_mesh(mesh, S, method=partition_method)
        part = self.part

        gradN, detJxW = _host_geometry(mesh, part)
        own3 = part.own_mask[:, :, None]
        free = part.from_global(np.asarray(bc.free_mask)) * own3
        vals = part.from_global(np.asarray(bc.values)) * own3
        fext = (
            np.zeros((S, part.n_owned, 3))
            if f_ext is None
            else part.from_global(np.asarray(f_ext)) * own3
        )

        self.jmesh = JaxMesh(np.array(devices), ("shard",))
        sh = NamedSharding(self.jmesh, P("shard"))

        def put(x, dtype):
            return jax.device_put(jnp.asarray(x, dtype), sh)

        self.data = ShardedData(
            send_idx=put(part.send_idx, INDEX_DTYPE),
            send_mask=put(part.send_mask, DTYPE),
            recv_mask=put(part.recv_mask, DTYPE),
            own_mask=put(part.own_mask, DTYPE),
            free_mask=put(free, DTYPE),
            bc_values=put(vals, DTYPE),
            f_ext=put(fext, DTYPE),
        )
        self._sharding = sh
        self._pcg_dtype = (
            jnp.float32 if self.options.precision == "mixed" else DTYPE
        )
        self._build_soa_data(gradN, detJxW, put)
        self._build_coarse(bc, put)
        self._build_programs()
        # the coarse operator is probed THROUGH the sharded tangent action
        # (programs must exist first); fills self.coarse.acinv
        self._run_coarse_probe()

    # ------------------------------------------------------------------
    def _build_soa_data(self, gradN, detJxW, put):
        """SoA per-shard tables (element-axis-last — ops/soa.py)."""
        part = self.part
        S = part.n_shards
        g_soa = np.transpose(gradN, (0, 2, 3, 4, 1))  # [S, q, npe, 3, El]
        v_soa = np.transpose(detJxW, (0, 2, 1))  # [S, q, El]
        conn_T = np.transpose(part.local_conn, (0, 2, 1))  # [S, npe, El]
        npe, El = conn_T.shape[1], conn_T.shape[2]
        perms = np.zeros((S, npe * El), np.int32)
        segids = np.zeros((S, npe * El), np.int32)
        for p in range(S):
            flat = conn_T[p].reshape(-1)
            perm = np.argsort(flat, kind="stable")
            perms[p] = perm
            segids[p] = flat[perm]
        # the pure-f64 parity path never touches the f32 tables (p_of
        # selects by dtype); keep [S, ...0-extent] placeholders instead of
        # full copies so the per-shard static budget isn't inflated ~1/3.
        # (mixed needs BOTH: f64 residual + f32 tangent.)
        mixed = self.options.precision == "mixed"
        # valence-bucketed scatter-as-gather maps, shard-stacked: the same
        # ~3x-cheaper-than-scatter-add nodal reduction as the single-chip
        # path (ops/soa.py ScatterBuckets — round-2 VERDICT item 3), and
        # it makes the per-shard summation order deterministic by
        # construction (no reliance on backend scatter-add ordering).
        bk = ScatterBuckets.build_stacked(conn_T, part.n_owned + part.n_halo)
        buckets = ScatterBuckets(
            idx=tuple(put(i, INDEX_DTYPE) for i in bk.idx),
            mask=tuple(put(m, jnp.float32) for m in bk.mask),
            inv=put(bk.inv, INDEX_DTYPE),
        )
        self.soa = ShardedSoA(
            gradN64=put(g_soa, DTYPE),
            detJxW64=put(v_soa, DTYPE),
            gradN32=put(g_soa if mixed else g_soa[:, :0], jnp.float32),
            detJxW32=put(v_soa if mixed else v_soa[:, :0], jnp.float32),
            conn_T=put(conn_T, INDEX_DTYPE),
            perm_T=put(perms, INDEX_DTYPE),
            segids_T=put(segids, INDEX_DTYPE),
            buckets=buckets,
        )
        self._material_p = (
            jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), self.material)
            if self.options.precision == "mixed"
            else self.material
        )

    def _build_coarse(self, bc, put):
        """Host-side coarse maps for the two-level preconditioner (None for
        plain block-Jacobi): geometric aggregation, RBM arms, distance-2
        probe plan, and the per-shard node tables. All O(N) host numpy;
        the coarse OPERATOR itself is probed through the sharded tangent
        action afterwards (`_run_coarse_probe` — setup memory O(N/S) per
        device, round-2 VERDICT item 4)."""
        part = self.part
        S = part.n_shards
        self.coarse = None
        self._probe = None
        self._probe_ctx = None
        self._n_agg = 0
        if self.options.preconditioner == "jacobi":
            return
        from fea_large_tpu.solvers.multilevel import (
            _probe_plan,
            _rbm_dvec,
            aggregate_nodes,
            default_agg_size,
        )

        modes = self.options.coarse_modes
        if modes not in (3, 6):
            # coarse_modes=12 is an EXPERIMENTAL single-device basis
            # (solvers/multilevel.py); wire it here only once it earns a
            # measured win over the RBM two-level
            raise NotImplementedError(
                f"sharded coarse supports modes 3 or 6, got {modes}"
            )
        coords = self.mesh.coords_host
        agg_size = self.options.agg_size or default_agg_size(
            self.mesh.n_nodes, target_coarse=5000 if modes == 3 else 2500
        )
        agg = aggregate_nodes(coords, agg_size)
        n_agg = int(agg.max()) + 1
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

        agg_own = np.zeros((S, part.n_owned), np.int64)
        valid = np.zeros((S, part.n_owned))
        color_own = np.full((S, part.n_owned), -1, np.int64)
        for p in range(S):
            real = part.owned_global[p] >= 0
            gid = part.owned_global[p][real]
            agg_own[p, real] = agg[gid]
            valid[p, real] = 1.0
            color_own[p, real] = color[agg[gid]]
        perm_own, segids_own = _padded_sorted_maps(agg_own, valid, n_agg)
        dvec_local = (
            part.from_global(dv) if modes == 6
            # 0-extent placeholder: the modes=3 apply never reads it
            # (round-2 advisor finding)
            else np.zeros((S, 0, 3))
        )
        self.coarse = ShardedCoarse(
            agg_own=put(agg_own, INDEX_DTYPE),
            perm_own=put(perm_own, INDEX_DTYPE),
            segids_own=put(segids_own, INDEX_DTYPE),
            valid=put(valid, jnp.float32),
            dvec_own=put(dvec_local, jnp.float32),
            # placeholder with the real (static) shape/dtype;
            # `_run_coarse_probe` fills the factor after the sharded
            # programs exist. The factor dtype FOLLOWS the PCG dtype: an
            # f32 cho_solve inside an otherwise-f64 PCG makes the
            # preconditioner only f32-consistent and CG stalls at rel
            # ~2e-5 on ill-conditioned meshes (observed on the elongated
            # dryrun mesh) — the parity path must be f64 end-to-end.
            acinv=jnp.zeros((nc, nc), self._pcg_dtype),
        )
        self._n_agg = n_agg
        self._probe_ctx = {
            "cm": cm, "zsrc": zsrc, "dst": dst, "nc": nc,
            "tables": ShardedProbe(
                Bn_own=put(part.from_global(Bn), jnp.float32),
                color_own=put(color_own, INDEX_DTYPE),
            ),
            # retained for probe_coarse_matrix()'s host cross-check
            "agg": agg, "dvec": dvec_np, "modes": modes,
        }

    # ------------------------------------------------------------------
    def _build_programs(self):
        part, opts = self.part, self.options
        S, No, Hl, kmax = part.n_shards, part.n_owned, part.n_halo, part.kmax
        material = self.material
        material_p = self._material_p
        pdt = self._pcg_dtype
        n_local = No + Hl
        n_agg = self._n_agg
        fwd = [[(i, (i + k) % S) for i in range(S)] for k in range(1, kmax + 1)]
        bwd = [[(i, (i - k) % S) for i in range(S)] for k in range(1, kmax + 1)]

        def _bmask(m, x):
            """Broadcast a [Hl] mask over the trailing dims of x [Hl, ...]."""
            return m.astype(x.dtype).reshape(m.shape[0], *([1] * (x.ndim - 1)))

        def halo_gather(d: ShardedData, x_own):
            """[No, ...] owned -> [Hl, ...] halo values pulled from owners."""
            h = jnp.zeros((Hl, *x_own.shape[1:]), x_own.dtype)
            for k in range(kmax):
                buf = x_own[d.send_idx[k]] * _bmask(d.send_mask[k], x_own)
                buf = lax.ppermute(buf, "shard", fwd[k])
                h = h + buf * _bmask(d.recv_mask[k], h)
            return h

        def halo_reduce(d: ShardedData, partials):
            """[Hl, ...] partial sums at halo slots -> [No, ...] at owners."""
            y = jnp.zeros((No, *partials.shape[1:]), partials.dtype)
            for k in range(kmax):
                buf = partials * _bmask(d.recv_mask[k], partials)
                buf = lax.ppermute(buf, "shard", bwd[k])
                y = y.at[d.send_idx[k]].add(buf * _bmask(d.send_mask[k], buf))
            return y

        def pdot(a, b):
            return lax.psum(jnp.vdot(a, b), "shard")

        def _sq(t):
            """Slice the leading shard axis off every leaf (inside the
            shard body each per-shard arg arrives as [1, ...])."""
            return jax.tree.map(lambda x: x[0], t)

        def p_of(soa: ShardedSoA, dtype) -> SoAProblem:
            g, v = (
                (soa.gradN64, soa.detJxW64)
                if dtype == jnp.float64
                else (soa.gradN32, soa.detJxW32)
            )
            # shard-stacked ScatterBuckets (built with unified caps/counts,
            # ShardedSoA docstring): nodal reductions are the same
            # deterministic bucketed scatter-as-gather as the single-chip
            # hot path
            return SoAProblem(
                gradN=g, detJxW=v, conn_T=soa.conn_T,
                perm_T=soa.perm_T, segids_T=soa.segids_T,
                buckets=soa.buckets, n_nodes=n_local,
            )

        def _residual64(d, soa, u_own, scale):
            u_full = jnp.concatenate([u_own, halo_gather(d, u_own)], axis=0)
            p64 = p_of(soa, jnp.float64)
            state = soa_freeze(p64, material, u_full.T)
            f_loc = soa_internal_force(p64, state).T
            f_own = f_loc[:No] + halo_reduce(d, f_loc[No:])
            return (scale * d.f_ext - f_own) * d.free_mask

        def residual_body(d, soa, u_own, scale):
            d, soa = _sq(d), _sq(soa)
            r = _residual64(d, soa, u_own[0], scale[()])
            # clamp: TPU emulated dot reductions can round a self-dot to a
            # tiny NEGATIVE near zero (solvers/linear.pcg_init) — sqrt of
            # that is NaN and poisons the EW forcing scalars
            return jnp.sqrt(jnp.maximum(pdot(r, r), 0.0))

        def impose_body(d, u_own, scale):
            d = _sq(d)
            u_own, scale = u_own[0], scale[()]
            u = d.free_mask * u_own + (1.0 - d.free_mask) * (scale * d.bc_values)
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

        def coarse_restrict(coarse, t):
            """P^T with psum-replicated result: [No, 3] (or [No, modes]
            pre-extended) -> [n_agg, modes]. Padded owned slots must carry
            zeros (their clamped segment ids alias the last aggregate)."""
            rc = jax.ops.segment_sum(
                t[coarse.perm_own], coarse.segids_own, num_segments=n_agg,
                indices_are_sorted=True,
            )
            return lax.psum(rc, "shard")

        def coarse_apply(coarse, r):
            """Additive two-level coarse correction (restrict, redundant
            replicated dense solve, prolong locally)."""
            modes = coarse.acinv.shape[0] // n_agg  # static at trace
            rp = r * coarse.valid[:, None]
            if modes == 6:
                # RBM restrict: modes 3+k = sum (d_n x r_n)_k
                # (multilevel.CoarseSpace.restrict)
                dp = coarse.dvec_own.astype(r.dtype)
                rp = jnp.concatenate([rp, jnp.cross(dp, rp)], axis=1)
            rc = coarse_restrict(coarse, rp)
            xc = (
                coarse.acinv @ rc.reshape(-1).astype(coarse.acinv.dtype)
            ).reshape(n_agg, modes).astype(r.dtype)
            za = xc[coarse.agg_own]
            if modes == 6:
                # prolong: (P xc)_n = t_A + omega_A x d_n
                return za[:, :3] + jnp.cross(
                    za[:, 3:], coarse.dvec_own.astype(r.dtype)
                )
            return za

        def _make_ops(d, soa, coarse, state, inv_blocks, freeN):
            p = p_of(soa, pdt)

            def matvec(v):
                vm = v * freeN
                v_full = jnp.concatenate([vm, halo_gather(d, vm)], axis=0)
                y_loc = soa_apply_tangent(p, state, v_full.T).T
                y = y_loc[:No] + halo_reduce(d, y_loc[No:])
                return y * freeN + (v - vm)

            def precond(r):
                z = apply_block_jacobi(inv_blocks, freeN, r)
                if coarse is not None:
                    z = z + freeN * coarse_apply(coarse, r)
                return z

            return matvec, precond

        def _prepare_common(d, soa, coarse, u_own, r64, tol, x0):
            """Freeze + Jacobi + PCG init from an already-computed residual
            (shared by the restart prepare and the fused Newton program)."""
            freeN = d.free_mask.astype(pdt)
            u_full = jnp.concatenate([u_own, halo_gather(d, u_own)], axis=0)
            p = p_of(soa, pdt)
            state = soa_freeze(p, material_p, u_full.astype(pdt).T)
            diag_loc = jnp.transpose(soa_diag_blocks(p, state), (2, 0, 1))
            diag = diag_loc[:No] + halo_reduce(d, diag_loc[No:])
            inv_blocks = jacobi_inverse_blocks(diag, freeN)
            matvec, precond = _make_ops(d, soa, coarse, state, inv_blocks, freeN)
            st = pcg_init(
                matvec, r64.astype(pdt), preconditioner=precond,
                tol=tol, x0=x0, dot=pdot,
            )
            return st, state, inv_blocks, matvec, precond

        def prepare_body(d, soa, coarse, u_own, scale, tol, x0):
            d, soa = _sq(d), _sq(soa)
            coarse = _sq_coarse(coarse)
            u_own, scale = u_own[0], scale[()]
            r64 = _residual64(d, soa, u_own, scale)
            st, state, inv_blocks, _, _ = _prepare_common(
                d, soa, coarse, u_own, r64, tol.astype(pdt), x0[0].astype(pdt)
            )
            st_out = PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            return st_out, SoAState(*(x[None] for x in state)), inv_blocks[None]

        use_ew = opts.forcing == "ew"

        def newton_iter_body(
            d, soa, coarse, u_own, x_prev, scale, prev_norm, norm0_prev,
            eta_prev, first_it, stop_newton, pcg_tol,
        ):
            """Fused sharded Newton iteration (the distributed mirror of
            solvers.newton._mixed_newton_iter_fn): iterate update, ONE f64
            residual pass (the earlier split programs paid two per
            iteration), device-side Eisenstat-Walker forcing + precision
            floor (the mirror of newton.newton_lin_tol), freeze + Jacobi +
            first CG chunk — one dispatch, one batched fetch per Newton
            iteration."""
            d, soa = _sq(d), _sq(soa)
            coarse = _sq_coarse(coarse)
            u_own, scale = u_own[0], scale[()]
            x_prev = x_prev[0]
            u_own = u_own + x_prev.astype(u_own.dtype)
            r64 = _residual64(d, soa, u_own, scale)
            # clamped self-dot: see residual_body / solvers/linear.pcg_init
            norm = jnp.sqrt(jnp.maximum(pdot(r64, r64), 0.0))
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
            # x0=None: r0 = b exactly — an explicit zeros x0 paid a full
            # halo-exchange tangent matvec of a known-zero vector every
            # Newton iteration (round-3 review)
            st, state, inv_blocks, matvec, precond = _prepare_common(
                d, soa, coarse, u_own, r64, tol_eff.astype(pdt), None
            )
            st = pcg_chunk(
                matvec, st, preconditioner=precond, dot=pdot,
                maxiter=min(opts.pcg_chunk, opts.pcg_maxiter),
            )
            st_out = PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            return (
                u_own[None], st_out, SoAState(*(x[None] for x in state)),
                inv_blocks[None], r64[None], norm, eta, lin_tol,
            )

        def chunk_body(d, soa, coarse, st, state, inv_blocks, n):
            d, soa = _sq(d), _sq(soa)
            coarse = _sq_coarse(coarse)
            state = _sq(state)
            inv_blocks = inv_blocks[0]
            freeN = d.free_mask.astype(pdt)
            st = PCGState(
                st.x[0], st.r[0], st.z[0], st.p[0],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            matvec, precond = _make_ops(d, soa, coarse, state, inv_blocks, freeN)
            # `n` is the host loop's REMAINING iteration budget — a traced
            # scalar (maxiter only feeds the while-loop cond), so honoring
            # it costs no second compiled program and keeps pcg_maxiter a
            # hard bound, matching the single-device path (round-2 advisor)
            st = pcg_chunk(
                matvec, st, preconditioner=precond, dot=pdot,
                maxiter=jnp.minimum(jnp.int32(opts.pcg_chunk), n),
            )
            return PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )

        def probe_body(d, soa, coarse, pt, cm):
            """Coarse-operator probing THROUGH the sharded tangent action
            (round-2 VERDICT item 4): for each (color, mode) probe, build
            the masked probe vector from the per-shard tables, apply the
            u=0-frozen tangent with halo exchange, restrict per aggregate
            with a psum — the response stack Z [n_probes, n_agg, modes] is
            replicated; peak device memory O(N/S). Same math as the
            single-device `multilevel._probe_run` (guarded by
            tests/test_dist.py::test_sharded_probed_coarse_matches_host)."""
            d, soa = _sq(d), _sq(soa)
            coarse = _sq_coarse(coarse)
            pt = _sq(pt)
            modes = pt.Bn_own.shape[2]  # static at trace
            freeN = d.free_mask.astype(pdt)
            p = p_of(soa, pdt)
            state0 = soa_freeze(
                p, material_p, jnp.zeros((3, n_local), pdt)
            )

            def one(cm1):
                c, m = cm1[0], cm1[1]
                col = lax.dynamic_index_in_dim(
                    pt.Bn_own, m, axis=2, keepdims=False
                ).astype(pdt)  # [No, 3]
                v = jnp.where(pt.color_own == c, 1.0, 0.0).astype(pdt)[
                    :, None
                ] * col
                vm = v * freeN
                v_full = jnp.concatenate([vm, halo_gather(d, vm)], axis=0)
                y_loc = soa_apply_tangent(p, state0, v_full.T).T
                y = (y_loc[:No] + halo_reduce(d, y_loc[No:])) * freeN
                t = y * coarse.valid[:, None].astype(pdt)
                if modes == 6:
                    dp = coarse.dvec_own.astype(pdt)
                    t = jnp.concatenate([t, jnp.cross(dp, t)], axis=1)
                return coarse_restrict(coarse, t)

            return lax.map(one, cm)

        mesh = self.jmesh
        data_specs = ShardedData(*([P("shard")] * len(ShardedData._fields)))
        # per-leaf specs (the buckets leaves are nested tuples)
        soa_specs = jax.tree.map(lambda _: P("shard"), self.soa)
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
        state_specs = SoAState(*([P("shard")] * len(SoAState._fields)))

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
                out_specs=(st_specs, state_specs, P("shard")),
                check_vma=False,
            )
        )
        self._chunk = jax.jit(
            shard_map(
                chunk_body, mesh=mesh,
                in_specs=(
                    data_specs, soa_specs, coarse_specs, st_specs,
                    state_specs, P("shard"), P(),
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
                    P("shard"), st_specs, state_specs, P("shard"),
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
    def _run_coarse_probe(self):
        """Probe + assemble + factor the coarse operator (setup, once):
        sharded probe sweep -> replicated response stack Z -> on-device
        dense scatter/symmetrize (`multilevel._assemble_dense_coarse`) ->
        BC ridge + f32 Cholesky. Frees the transient probe tables."""
        if self.coarse is None:
            return
        from fea_large_tpu.solvers.multilevel import (
            _assemble_dense_coarse,
            _invert_factor,
            _ridge_and_factor,
            _store_acinv,
        )

        ctx = self._probe_ctx
        Z = self._probe(
            self.data, self.soa, self.coarse, ctx["tables"],
            jnp.asarray(ctx["cm"]),
        )
        Ac = _assemble_dense_coarse(
            Z.reshape(-1).astype(self._pcg_dtype), ctx["zsrc"], ctx["dst"],
            nc=ctx["nc"],
        )
        self.coarse = self.coarse._replace(
            acinv=_store_acinv(
                jax.jit(lambda a: _invert_factor(_ridge_and_factor(a)))(Ac),
                self._pcg_dtype,
            )
        )
        self._probe_ctx = {
            k: v for k, v in ctx.items() if k in ("agg", "dvec", "modes")
        }

    def probe_coarse_matrix(self) -> jnp.ndarray:
        """The probed (pre-ridge) dense coarse matrix Ac — test hook for
        the parity check against the host Galerkin product
        (`multilevel._host_coarse_matrix[_rbm]` on the same aggregation,
        tests/test_dist.py)."""
        from fea_large_tpu.solvers.multilevel import (
            _assemble_dense_coarse,
            _probe_plan,
        )

        ctx = self._probe_ctx
        agg, dvec, modes = ctx["agg"], ctx["dvec"], ctx["modes"]
        color, Bn, dv, cm, zsrc, dst, nc = _probe_plan(
            self.mesh.conn_host, agg, self._n_agg, modes, dvec
        )
        part = self.part
        S = part.n_shards
        color_own = np.full((S, part.n_owned), -1, np.int64)
        for p in range(S):
            real = part.owned_global[p] >= 0
            color_own[p, real] = color[agg[part.owned_global[p][real]]]
        sh = self._sharding
        tables = ShardedProbe(
            Bn_own=jax.device_put(
                jnp.asarray(part.from_global(Bn), jnp.float32), sh
            ),
            color_own=jax.device_put(
                jnp.asarray(color_own, INDEX_DTYPE), sh
            ),
        )
        Z = self._probe(
            self.data, self.soa, self.coarse, tables, jnp.asarray(cm)
        )
        return _assemble_dense_coarse(
            Z.reshape(-1).astype(jnp.float32), zsrc, dst, nc=nc
        )

    # ------------------------------------------------------------------
    def _step_pcg(self, u, scale_arr, lin_tol=None):
        """Host-orchestrated chunked PCG across the device mesh, on the
        SAME shared control loop as the single-device mixed path
        (`linear.drive_chunked_pcg`: batched syncs, rounding-breakdown
        restarts, best-iterate tracking). The chunk program takes the
        remaining budget as a traced scalar, so pcg_maxiter is a hard
        bound here exactly as on the single-device path."""
        opts = self.options
        tol = jnp.asarray(
            opts.pcg_tol if lin_tol is None else lin_tol, self._pcg_dtype
        )
        cell = {}

        def prepare(x0):
            x0 = jnp.zeros_like(u) if x0 is None else x0.astype(u.dtype)
            st, cell["state"], cell["inv_blocks"] = self._prepare(
                self.data, self.soa, self.coarse, u, scale_arr, tol, x0
            )
            return st

        def chunk(st, n):
            return self._chunk(
                self.data, self.soa, self.coarse, st, cell["state"],
                cell["inv_blocks"], jnp.int32(n),
            )

        x, total, converged, rel = drive_chunked_pcg(
            prepare, chunk, tol=tol, chunk_iters=opts.pcg_chunk,
            maxiter=opts.pcg_maxiter,
        )
        return _sharded_update_jit(u, x), total, converged, rel

    # ------------------------------------------------------------------
    def memory_report(self) -> dict:
        """Measured per-shard device-memory budget (bytes), by category —
        the config-5 scaling evidence (BASELINE.json:11): static tables
        (partition maps + BC data, SoA element tables, coarse maps) plus
        the per-solve working set (frozen tangent state, PCG vectors,
        Jacobi blocks). Extrapolation to other sizes is linear in owned
        nodes/elements per shard (halo terms scale as the slab surface,
        sub-linear — so linear extrapolation is conservative)."""
        S = self.part.n_shards

        def nbytes(tree):
            return int(
                sum(
                    x.nbytes
                    for x in jax.tree.leaves(tree)
                    if hasattr(x, "nbytes")
                )
            )

        pdt_size = jnp.dtype(self._pcg_dtype).itemsize
        # shape introspection from the f64 tables (always materialized;
        # the f32 tables are 0-extent placeholders on the pure-f64 path)
        q = self.soa.gradN64.shape[1]
        npe = self.soa.gradN64.shape[2]
        El = self.soa.gradN64.shape[-1]
        No, Hl = self.part.n_owned, self.part.n_halo
        # runtime working set (allocated during _prepare/_chunk, per shard):
        state_b = (3 * 9 + 2) * q * El * pdt_size  # F, S, A + alpha, beta
        pcg_b = 4 * No * 3 * pdt_size  # x, r, z, p
        jacobi_b = No * 9 * pdt_size
        # coarse: the per-shard aggregation maps shard with No; the dense
        # coarse inverse (acinv/ac2inv/dinv1/agg2...) is REPLICATED — every
        # shard holds the full copy, and its size is set by the aggregate
        # policy (~constant in N), not by the per-shard node count.
        # Classified by FIELD NAME: a replicated array can coincidentally
        # have leading dim == S (e.g. Nc1 == n_shards on a tiny mesh).
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
            "owned_nodes": No,
            "halo_nodes": Hl,
            "elements": El,
            "static_partition_bc": nbytes(self.data) // S,
            "static_soa_tables": nbytes(self.soa) // S,
            "static_coarse_maps": coarse_sharded,
            "static_coarse_replicated": coarse_replicated,
            "work_frozen_state": state_b,
            "work_pcg_vectors": pcg_b,
            "work_jacobi_blocks": jacobi_b,
            "total_per_shard": (
                nbytes(self.data) // S
                + nbytes(self.soa) // S
                + coarse_sharded + coarse_replicated
                + state_b + pcg_b + jacobi_b
            ),
        }

    def zero_u(self) -> jnp.ndarray:
        z = jnp.zeros((self.part.n_shards, self.part.n_owned, 3), DTYPE)
        return jax.device_put(z, self._sharding)

    def u_global(self, u_own) -> np.ndarray:
        return self.part.to_global(np.asarray(u_own), self.mesh.n_nodes)

    def u_from_global(self, u: np.ndarray) -> jnp.ndarray:
        """Global [N, 3] -> device-sharded owned layout [S, No, 3]
        (checkpoint resume across solver kinds, SURVEY.md §7.4)."""
        local = self.part.from_global(np.asarray(u)) * self.part.own_mask[:, :, None]
        return jax.device_put(jnp.asarray(local, DTYPE), self._sharding)

    def _newton(self, u, scale):
        """Newton loop on the FUSED sharded per-iteration program
        (`newton_iter_body`): one dispatch + one batched device_get per
        Newton iteration, one f64 residual pass per iteration (the earlier
        split-program loop paid two). Mirrors
        `solvers.newton.NewtonSolver._newton_mixed`."""
        opts = self.options
        t0 = time.perf_counter()
        scale_arr = jnp.asarray(scale, DTYPE)
        u = self._impose(self.data, u, scale_arr)
        norms, pcg_iters = [], []
        norm0 = None
        stop_n = None
        eta = 0.5  # Eisenstat-Walker initial forcing
        prev_norm = 1.0
        # two-level -> jacobi fallback (SURVEY.md §7.3): on near-critical
        # states the RBM coarse can aim the preconditioner at a negative
        # tangent direction and break CG down where plain block-Jacobi
        # still converges (measured, VERDICT r03: jacobi 215 iters vs
        # two-level breakdown on the 16x2x2 buckling beam). `coarse` is
        # swapped for a zero-acinv copy — the SAME compiled programs then
        # apply a pure-Jacobi preconditioner (the coarse term is exactly
        # zero), so the fallback costs no recompile.
        coarse = self.coarse
        x_prev = jnp.zeros(
            (self.part.n_shards, self.part.n_owned, 3), self._pcg_dtype
        )
        for it in range(opts.max_newton):
            stop_dev = jnp.asarray(
                opts.newton_atol if norm0 is None else stop_n, jnp.float64
            )
            u_new, st0, state, inv_blocks, r64, norm_a, eta_a, tol_a = (
                self._newton_iter(
                    self.data, self.soa, coarse, u, x_prev, scale_arr,
                    jnp.asarray(prev_norm, jnp.float64),
                    jnp.asarray(norm0 or 1.0, jnp.float64),
                    jnp.asarray(eta, jnp.float64),
                    jnp.asarray(norm0 is None), stop_dev,
                    jnp.asarray(opts.pcg_tol, jnp.float64),
                )
            )
            # the ONE blocking tunnel round trip of this Newton iteration
            norm, eta_v, tol_v, k0, rr0, ok0, stop0 = jax.device_get(
                (norm_a, eta_a, tol_a, st0.k, st0.rr, st0.ok, st0.stop)
            )
            norm = float(norm)
            u = u_new
            if norm != norm:  # NaN: poisoned state; fail -> bisection
                break
            norms.append(norm)
            if norm0 is None:
                norm0 = max(norm, 1e-300)
                stop_n = max(opts.newton_rtol * norm0, opts.newton_atol)
            if norm <= stop_n:
                rec = IncrementRecord(
                    float(scale), it, norms, pcg_iters, time.perf_counter() - t0
                )
                return u, True, rec
            if it == opts.max_newton - 1:
                # the deferred-update scheme applies x at the start of the
                # NEXT iteration — the final allowed iteration's solve
                # could never be applied (see solvers/newton.py)
                break
            prev_norm = norm
            eta = float(eta_v)
            cell = {"state": state, "inv_blocks": inv_blocks}

            def prepare(x0, _u=u, _tol=float(tol_v), _coarse=coarse):
                if x0 is None:
                    return st0
                tol = jnp.asarray(_tol, self._pcg_dtype)
                st, cell["state"], cell["inv_blocks"] = self._prepare(
                    self.data, self.soa, _coarse, _u, scale_arr, tol,
                    x0.astype(DTYPE),
                )
                return st

            def chunk(st, n, _coarse=coarse):
                return self._chunk(
                    self.data, self.soa, _coarse, st, cell["state"],
                    cell["inv_blocks"], jnp.int32(n),
                )

            x, lin_iters, lin_ok, lin_rel = drive_chunked_pcg(
                prepare, chunk, tol=float(tol_v),
                chunk_iters=opts.pcg_chunk, maxiter=opts.pcg_maxiter,
                first_fetch=(k0, rr0, ok0, stop0),
            )
            pcg_iters.append(int(lin_iters))
            x_prev = x
            # see solvers/newton.py: accept a stagnated PCG step that made
            # substantial progress (inexact Newton); an early breakdown at
            # rel ~ O(1) aborts the increment -> bisection
            accepted = bool(lin_ok) or float(lin_rel) <= 1e-3
            if not bool(lin_ok) and coarse is not None and coarse is self.coarse:
                # first two-level CG breakdown this increment: switch to
                # the jacobi-only fallback (zero-acinv coarse; see above)
                # for the REST of the increment; when the broken-down
                # direction was not even acceptable, retry THIS solve under
                # the fallback before giving up to bisection
                coarse = self.coarse._replace(
                    acinv=jnp.zeros_like(self.coarse.acinv)
                )
                self.precond_fallbacks += 1
                if not accepted:

                    def prepare_fb(x0, _u=u, _tol=float(tol_v), _c=coarse):
                        tol = jnp.asarray(_tol, self._pcg_dtype)
                        xx = (
                            jnp.zeros_like(_u).astype(DTYPE)
                            if x0 is None
                            else x0.astype(DTYPE)
                        )
                        st, cell["state"], cell["inv_blocks"] = self._prepare(
                            self.data, self.soa, _c, _u, scale_arr, tol, xx
                        )
                        return st

                    x, fb_iters, lin_ok, lin_rel = drive_chunked_pcg(
                        prepare_fb,
                        lambda st, n, _c=coarse: self._chunk(
                            self.data, self.soa, _c, st, cell["state"],
                            cell["inv_blocks"], jnp.int32(n),
                        ),
                        tol=float(tol_v), chunk_iters=opts.pcg_chunk,
                        maxiter=opts.pcg_maxiter,
                    )
                    pcg_iters[-1] += int(fb_iters)
                    x_prev = x
                    accepted = bool(lin_ok) or float(lin_rel) <= 1e-3
            if not accepted:
                break
        rec = IncrementRecord(
            float(scale), len(norms), norms, pcg_iters, time.perf_counter() - t0
        )
        return u, False, rec

    def solve(self, u0=None, callback=None, start_factor: float = 0.0) -> SolveResult:
        opts = self.options
        u = self.zero_u() if u0 is None else u0
        history = []
        lam = float(start_factor)
        dlam_nominal = 1.0 / opts.n_steps
        dlam = dlam_nominal
        bisections = 0
        while lam < 1.0 - 1e-12:
            target = min(lam + dlam, 1.0)
            u_try, ok, rec = self._newton(u, target)
            if ok:
                u, lam = u_try, target
                history.append(rec)
                if callback is not None:
                    callback(rec, u)
                dlam = min(2.0 * dlam, dlam_nominal, 1.0 - lam)
                if dlam <= 0.0:
                    dlam = 1.0 - lam
                bisections = 0
            else:
                history.append(rec)
                bisections += 1
                if bisections > opts.max_bisections:
                    return SolveResult(u=u, converged=False, history=history)
                dlam *= 0.5
        return SolveResult(u=u, converged=True, history=history)
