"""Domain-decomposed solver over a JAX device mesh (SURVEY.md C19/C20, §7.8;
config 5, BASELINE.json:11).

TPU-native distribution: a 1-D `jax.sharding.Mesh` ("shard" axis), all
per-shard arrays laid out [S, ...] and `shard_map`-ped; communication is
exactly three XLA collectives, riding ICI:

  * halo GATHER  — `lax.ppermute` ring hops k=1..kmax delivering owned
    values to the shards whose elements touch them (PCG SpMV input);
  * halo REDUCE  — reverse `ppermute` hops returning partial element sums at
    halo nodes to their owners (assembly "halo reduce-scatter", B:5);
  * `lax.psum`  — PCG dot products and residual norms.

The element kernels, matrix-free tangent, block-Jacobi PCG are the SAME
functions as the single-device path (`elements.kernels`,
`assembly.matfree`, `solvers.linear.pcg`) applied to shard-local arrays —
the distributed layer only adds the exchange, which is how the halo maps
get to be testable in isolation (tests/test_dist.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from fea_large_tpu.assembly.matfree import TangentState, apply_tangent
from fea_large_tpu.bc import DirichletBC
from fea_large_tpu.config import DTYPE, INDEX_DTYPE
from fea_large_tpu.dist.partition import Partition, partition_mesh
from fea_large_tpu.elements.kernels import element_diag_blocks
from fea_large_tpu.materials.base import Material
from fea_large_tpu.mesh.core import Mesh
from fea_large_tpu.solvers.linear import block_jacobi_preconditioner, pcg
from fea_large_tpu.solvers.newton import IncrementRecord, SolveResult, SolverOptions


class ShardedData(NamedTuple):
    """Device-resident per-shard arrays (leading axis = shard axis S)."""

    local_conn: jnp.ndarray  # i32[S, El, npe]
    gradN: jnp.ndarray  # f64[S, El, q, npe, 3]
    detJxW: jnp.ndarray  # f64[S, El, q] (0 on padded elements)
    send_idx: jnp.ndarray  # i32[S, kmax, Hl]
    send_mask: jnp.ndarray  # f64[S, kmax, Hl]
    recv_mask: jnp.ndarray  # f64[S, kmax, Hl]
    own_mask: jnp.ndarray  # f64[S, No]
    free_mask: jnp.ndarray  # f64[S, No, 3]
    bc_values: jnp.ndarray  # f64[S, No, 3]
    f_ext: jnp.ndarray  # f64[S, No, 3]


class ShardedSoA(NamedTuple):
    """Per-shard SoA (element-axis-last) arrays for the mixed-precision
    path — the distributed analog of `ops.soa.SoAProblem` (f64 tables for
    the residual, f32 for the tangent/PCG)."""

    gradN64: jnp.ndarray  # f64[S, q, npe, 3, El]
    detJxW64: jnp.ndarray  # f64[S, q, El]
    gradN32: jnp.ndarray  # f32[S, q, npe, 3, El]
    detJxW32: jnp.ndarray  # f32[S, q, El]
    conn_T: jnp.ndarray  # i32[S, npe, El] (into local node space)
    perm_T: jnp.ndarray  # i32[S, npe*El] sorted (a,e)-by-local-node
    segids_T: jnp.ndarray  # i32[S, npe*El]


class ShardedCoarse(NamedTuple):
    """Per-shard aggregation maps + replicated coarse factor (two-level
    preconditioner across the device mesh: restrict locally, psum the
    coarse residual, solve redundantly on every shard, prolong locally)."""

    agg_own: jnp.ndarray  # i32[S, No] aggregate of each owned node
    perm_own: jnp.ndarray  # i32[S, No] sort of owned nodes by aggregate
    segids_own: jnp.ndarray  # i32[S, No]
    valid: jnp.ndarray  # f32[S, No] 1 for real owned nodes
    chol: jnp.ndarray  # f32[3Nc, 3Nc] replicated Cholesky factor


def _host_geometry(mesh: Mesh, part: Partition):
    """Shard-ordered padded (gradN, detJxW) computed in host numpy (cold
    path; avoids device round-trips during setup — SURVEY.md §4.5)."""
    elem = mesh.element
    coords, conn = mesh.coords_host, mesh.conn_host
    dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
    w = np.asarray(elem.quad_weights)
    Xe = coords[conn]  # [E, npe, 3]
    J = np.einsum("eai,qaj->eqij", Xe, dN)
    detJ = np.linalg.det(J)
    gradN = np.einsum("qaj,eqji->eqai", dN, np.linalg.inv(J))
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


@dataclasses.dataclass
class ShardedNewtonSolver:
    """Drop-in distributed analog of `solvers.newton.NewtonSolver` using the
    matrix-free Jacobi-PCG backend over a device mesh. The host control loop
    (incremental loading, bisection, records) is identical; the jitted step
    is `shard_map`-ped with halo collectives."""

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
            local_conn=put(part.local_conn, INDEX_DTYPE),
            gradN=put(gradN, DTYPE),
            detJxW=put(detJxW, DTYPE),
            send_idx=put(part.send_idx, INDEX_DTYPE),
            send_mask=put(part.send_mask, DTYPE),
            recv_mask=put(part.recv_mask, DTYPE),
            own_mask=put(part.own_mask, DTYPE),
            free_mask=put(free, DTYPE),
            bc_values=put(vals, DTYPE),
            f_ext=put(fext, DTYPE),
        )
        self._sharding = sh
        if self.options.precision == "mixed":
            self._build_mixed_data(gradN, detJxW, put)
        self._build_programs()
        if self.options.precision == "mixed":
            self._build_mixed_programs()

    def _build_mixed_data(self, gradN, detJxW, put):
        """SoA per-shard tables + (optional) sharded coarse space."""
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
        self.soa = ShardedSoA(
            gradN64=put(g_soa, DTYPE),
            detJxW64=put(v_soa, DTYPE),
            gradN32=put(g_soa, jnp.float32),
            detJxW32=put(v_soa, jnp.float32),
            conn_T=put(conn_T, INDEX_DTYPE),
            perm_T=put(perms, INDEX_DTYPE),
            segids_T=put(segids, INDEX_DTYPE),
        )
        self._material32 = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), self.material
        )
        if self.options.preconditioner not in ("jacobi", "two_level"):
            raise ValueError(
                "sharded solver supports preconditioner 'jacobi' or "
                f"'two_level', got {self.options.preconditioner!r}"
            )
        if self.options.preconditioner == "two_level":
            from fea_large_tpu.solvers.multilevel import build_coarse_space

            # global coarse factor (host assembly) + per-shard agg maps
            bc_global = DirichletBC(
                free_mask=jnp.asarray(
                    part.to_global(
                        np.asarray(self.data.free_mask), self.mesh.n_nodes
                    )
                ),
                values=jnp.zeros((self.mesh.n_nodes, 3)),
            )
            coarse = build_coarse_space(
                self.mesh, self.material, bc_global,
                agg_size=self.options.agg_size,
            )
            agg_global = np.asarray(coarse.agg)
            agg_own = np.zeros((S, part.n_owned), np.int64)
            valid = np.zeros((S, part.n_owned))
            for p in range(S):
                real = part.owned_global[p] >= 0
                agg_own[p, real] = agg_global[part.owned_global[p][real]]
                valid[p, real] = 1.0
            perm_own = np.argsort(agg_own + (1 - valid) * coarse.n_agg, axis=1)
            segids_own = np.take_along_axis(agg_own, perm_own, axis=1)
            # padded slots sort last; clamp their segment id and zero later
            segids_own = np.minimum(segids_own, coarse.n_agg - 1)
            self.coarse = ShardedCoarse(
                agg_own=put(agg_own, INDEX_DTYPE),
                perm_own=put(perm_own, INDEX_DTYPE),
                segids_own=put(segids_own, INDEX_DTYPE),
                valid=put(valid, jnp.float32),
                chol=coarse.chol,  # replicated
            )
            self._n_agg = coarse.n_agg
        else:
            self.coarse = None
            self._n_agg = 0

    # ------------------------------------------------------------------
    def _build_programs(self):
        part, opts = self.part, self.options
        S, No, Hl, kmax = part.n_shards, part.n_owned, part.n_halo, part.kmax
        material = self.material
        n_local = No + Hl
        fwd = [[(i, (i + k) % S) for i in range(S)] for k in range(1, kmax + 1)]
        bwd = [[(i, (i - k) % S) for i in range(S)] for k in range(1, kmax + 1)]

        from fea_large_tpu.elements.kernels import ElementGeometry

        def _bmask(m, x):
            """Broadcast a [Hl] mask over the trailing dims of x [Hl, ...]."""
            return m.reshape(m.shape[0], *([1] * (x.ndim - 1)))

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

        def local_scatter(d: ShardedData):
            # direct (unsorted) segment-sum: deterministic on TPU/CPU and
            # skips the permutation gather (ops/soa.py docstring)
            def scatter(values):
                flat = values.reshape(-1, *values.shape[2:])
                return jax.ops.segment_sum(
                    flat, d.local_conn.reshape(-1), num_segments=n_local
                )

            return scatter

        def pdot(a, b):
            return lax.psum(jnp.vdot(a, b), "shard")

        def _squeeze(d: ShardedData) -> ShardedData:
            return ShardedData(*(x[0] for x in d))

        def step_body(d, u_own, scale):
            d = _squeeze(d)
            u_own, scale = u_own[0], scale[()]
            geom = ElementGeometry(gradN=d.gradN, detJxW=d.detJxW)
            scatter = local_scatter(d)

            u_full = jnp.concatenate([u_own, halo_gather(d, u_own)], axis=0)
            state, fe = TangentState.freeze(u_full, d.local_conn, geom, material)
            f_loc = scatter(fe)
            f_own = f_loc[:No] + halo_reduce(d, f_loc[No:])
            r = (scale * d.f_ext - f_own) * d.free_mask

            diag_e = element_diag_blocks(u_full[d.local_conn], geom, material)
            diag_loc = scatter(diag_e)
            diag = diag_loc[:No] + halo_reduce(d, diag_loc[No:])
            precond = block_jacobi_preconditioner(diag, d.free_mask)

            def matvec(v):
                vm = v * d.free_mask
                v_full = jnp.concatenate([vm, halo_gather(d, vm)], axis=0)
                y_loc = apply_tangent(
                    state, v_full, d.local_conn, geom, material, scatter
                )
                y = y_loc[:No] + halo_reduce(d, y_loc[No:])
                return y * d.free_mask + (v - vm)

            res = pcg(
                matvec,
                r,
                preconditioner=precond,
                tol=opts.pcg_tol,
                maxiter=opts.pcg_maxiter,
                dot=pdot,
            )
            u_new = u_own + res.x
            return u_new[None], res.iterations, res.converged

        def residual_body(d, u_own, scale):
            d = _squeeze(d)
            u_own, scale = u_own[0], scale[()]
            geom = ElementGeometry(gradN=d.gradN, detJxW=d.detJxW)
            scatter = local_scatter(d)
            u_full = jnp.concatenate([u_own, halo_gather(d, u_own)], axis=0)
            _, fe = TangentState.freeze(u_full, d.local_conn, geom, material)
            f_loc = scatter(fe)
            f_own = f_loc[:No] + halo_reduce(d, f_loc[No:])
            r = (scale * d.f_ext - f_own) * d.free_mask
            return jnp.sqrt(pdot(r, r))

        def impose_body(d, u_own, scale):
            d = _squeeze(d)
            u_own, scale = u_own[0], scale[()]
            u = d.free_mask * u_own + (1.0 - d.free_mask) * (scale * d.bc_values)
            return u[None]

        data_specs = ShardedData(*([P("shard")] * len(ShardedData._fields)))
        mesh = self.jmesh

        self._step = jax.jit(
            shard_map(
                step_body,
                mesh=mesh,
                in_specs=(data_specs, P("shard"), P()),
                out_specs=(P("shard"), P(), P()),
                check_vma=False,
            )
        )
        self._residual = jax.jit(
            shard_map(
                residual_body,
                mesh=mesh,
                in_specs=(data_specs, P("shard"), P()),
                out_specs=P(),
                check_vma=False,
            )
        )
        self._impose = jax.jit(
            shard_map(
                impose_body,
                mesh=mesh,
                in_specs=(data_specs, P("shard"), P()),
                out_specs=P("shard"),
                check_vma=False,
            )
        )

    # ------------------------------------------------------------------
    def _build_mixed_programs(self):
        """Mixed-precision sharded programs: f64 SoA residual, f32 SoA
        tangent + chunked PCG with psum dots and ppermute halos — the
        distributed analog of `solvers.newton`'s mixed path."""
        import jax.scipy.linalg as jsl

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

        part, opts = self.part, self.options
        S, No, Hl, kmax = part.n_shards, part.n_owned, part.n_halo, part.kmax
        material = self.material
        material32 = self._material32
        n_local = No + Hl
        n_agg = self._n_agg
        fwd = [[(i, (i + k) % S) for i in range(S)] for k in range(1, kmax + 1)]
        bwd = [[(i, (i - k) % S) for i in range(S)] for k in range(1, kmax + 1)]

        def _bmask(m, x):
            return m.astype(x.dtype).reshape(m.shape[0], *([1] * (x.ndim - 1)))

        def halo_gather(d, x_own):
            h = jnp.zeros((Hl, *x_own.shape[1:]), x_own.dtype)
            for k in range(kmax):
                buf = x_own[d.send_idx[k]] * _bmask(d.send_mask[k], x_own)
                buf = lax.ppermute(buf, "shard", fwd[k])
                h = h + buf * _bmask(d.recv_mask[k], h)
            return h

        def halo_reduce(d, partials):
            y = jnp.zeros((No, *partials.shape[1:]), partials.dtype)
            for k in range(kmax):
                buf = partials * _bmask(d.recv_mask[k], partials)
                buf = lax.ppermute(buf, "shard", bwd[k])
                y = y.at[d.send_idx[k]].add(buf * _bmask(d.send_mask[k], buf))
            return y

        def pdot(a, b):
            return lax.psum(jnp.vdot(a, b), "shard")

        def _sq(t):
            return type(t)(*(x[0] for x in t))

        def p64_of(soa):
            return SoAProblem(
                gradN=soa.gradN64, detJxW=soa.detJxW64, conn_T=soa.conn_T,
                perm_T=soa.perm_T, segids_T=soa.segids_T, n_nodes=n_local,
            )

        def p32_of(soa):
            return SoAProblem(
                gradN=soa.gradN32, detJxW=soa.detJxW32, conn_T=soa.conn_T,
                perm_T=soa.perm_T, segids_T=soa.segids_T, n_nodes=n_local,
            )

        def _residual64(d, soa, u_own, scale):
            u_full = jnp.concatenate([u_own, halo_gather(d, u_own)], axis=0)
            p64 = p64_of(soa)
            state = soa_freeze(p64, material, u_full.T)
            f_loc = soa_internal_force(p64, state).T
            f_own = f_loc[:No] + halo_reduce(d, f_loc[No:])
            return (scale * d.f_ext - f_own) * d.free_mask

        def residual_body(d, soa, u_own, scale):
            d, soa = _sq(d), _sq(soa)
            r = _residual64(d, soa, u_own[0], scale[()])
            return jnp.sqrt(pdot(r, r))

        def _make_ops(d, soa, coarse, state32, inv_blocks, free32):
            p32 = p32_of(soa)

            def matvec(v):
                vm = v * free32
                v_full = jnp.concatenate([vm, halo_gather(d, vm)], axis=0)
                y_loc = soa_apply_tangent(p32, state32, v_full.T).T
                y = y_loc[:No] + halo_reduce(d, y_loc[No:])
                return y * free32 + (v - vm)

            def precond(r):
                z = apply_block_jacobi(inv_blocks, free32, r)
                if coarse is not None:
                    rc = jax.ops.segment_sum(
                        r[coarse.perm_own], coarse.segids_own,
                        num_segments=n_agg, indices_are_sorted=True,
                    )
                    rc = lax.psum(rc, "shard")
                    xc = jsl.cho_solve(
                        (coarse.chol, True), rc.reshape(-1).astype(coarse.chol.dtype)
                    ).reshape(n_agg, 3).astype(r.dtype)
                    z = z + free32 * xc[coarse.agg_own]
                return z

            return matvec, precond

        def _sq_coarse(coarse):
            if coarse is None:
                return None
            return ShardedCoarse(
                agg_own=coarse.agg_own[0], perm_own=coarse.perm_own[0],
                segids_own=coarse.segids_own[0], valid=coarse.valid[0],
                chol=coarse.chol,  # replicated
            )

        def prepare_body(d, soa, coarse, u_own, scale, tol):
            d, soa = _sq(d), _sq(soa)
            coarse = _sq_coarse(coarse)
            u_own, scale = u_own[0], scale[()]
            r64 = _residual64(d, soa, u_own, scale)
            free32 = d.free_mask.astype(jnp.float32)
            u_full = jnp.concatenate([u_own, halo_gather(d, u_own)], axis=0)
            p32 = p32_of(soa)
            state32 = soa_freeze(p32, material32, u_full.astype(jnp.float32).T)
            diag_loc = jnp.transpose(soa_diag_blocks(p32, state32), (2, 0, 1))
            diag = diag_loc[:No] + halo_reduce(d, diag_loc[No:])
            inv_blocks = jacobi_inverse_blocks(diag, free32)
            matvec, precond = _make_ops(d, soa, coarse, state32, inv_blocks, free32)
            st = pcg_init(
                matvec, r64.astype(jnp.float32), preconditioner=precond,
                tol=tol.astype(jnp.float32), dot=pdot,
            )
            st_out = PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            return st_out, SoAState(*(x[None] for x in state32)), inv_blocks[None]

        def chunk_body(d, soa, coarse, st, state32, inv_blocks):
            d, soa = _sq(d), _sq(soa)
            coarse = _sq_coarse(coarse)
            state32 = _sq(state32)
            inv_blocks = inv_blocks[0]
            free32 = d.free_mask.astype(jnp.float32)
            st = PCGState(
                st.x[0], st.r[0], st.z[0], st.p[0],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )
            matvec, precond = _make_ops(d, soa, coarse, state32, inv_blocks, free32)
            st = pcg_chunk(
                matvec, st, preconditioner=precond, dot=pdot,
                maxiter=opts.pcg_chunk,
            )
            return PCGState(
                st.x[None], st.r[None], st.z[None], st.p[None],
                st.rz, st.rr, st.k, st.ok, st.stop,
            )

        mesh = self.jmesh
        data_specs = ShardedData(*([P("shard")] * len(ShardedData._fields)))
        soa_specs = ShardedSoA(*([P("shard")] * len(ShardedSoA._fields)))
        if self.coarse is not None:
            coarse_specs = ShardedCoarse(
                P("shard"), P("shard"), P("shard"), P("shard"), P()
            )
        else:
            coarse_specs = None
        st_specs = PCGState(
            P("shard"), P("shard"), P("shard"), P("shard"),
            P(), P(), P(), P(), P(),
        )
        state32_specs = SoAState(*([P("shard")] * len(SoAState._fields)))

        self._mixed_residual = jax.jit(
            shard_map(
                residual_body, mesh=mesh,
                in_specs=(data_specs, soa_specs, P("shard"), P()),
                out_specs=P(), check_vma=False,
            )
        )
        self._mixed_prepare = jax.jit(
            shard_map(
                prepare_body, mesh=mesh,
                in_specs=(data_specs, soa_specs, coarse_specs, P("shard"), P(), P()),
                out_specs=(st_specs, state32_specs, P("shard")),
                check_vma=False,
            )
        )
        self._mixed_chunk = jax.jit(
            shard_map(
                chunk_body, mesh=mesh,
                in_specs=(
                    data_specs, soa_specs, coarse_specs, st_specs,
                    state32_specs, P("shard"),
                ),
                out_specs=st_specs, check_vma=False,
            )
        )

    def _step_mixed(self, u, scale_arr):
        """Host-orchestrated chunked PCG across the device mesh."""
        opts = self.options
        tol = jnp.asarray(opts.pcg_tol, jnp.float32)
        st, state32, inv_blocks = self._mixed_prepare(
            self.data, self.soa, self.coarse, u, scale_arr, tol
        )
        while True:
            k = int(st.k)
            done = (
                (not bool(st.ok))
                or float(jnp.sqrt(st.rr)) <= float(st.stop)
                or k >= opts.pcg_maxiter
            )
            if done:
                break
            st = self._mixed_chunk(
                self.data, self.soa, self.coarse, st, state32, inv_blocks
            )
        converged = bool(st.ok) and float(jnp.sqrt(st.rr)) <= float(st.stop)
        return u + st.x.astype(u.dtype), st.k, jnp.bool_(converged)

    # ------------------------------------------------------------------
    def zero_u(self) -> jnp.ndarray:
        z = jnp.zeros((self.part.n_shards, self.part.n_owned, 3), DTYPE)
        return jax.device_put(z, self._sharding)

    def u_global(self, u_own) -> np.ndarray:
        return self.part.to_global(np.asarray(u_own), self.mesh.n_nodes)

    def _newton(self, u, scale):
        opts = self.options
        t0 = time.perf_counter()
        scale_arr = jnp.asarray(scale, DTYPE)
        mixed = self.options.precision == "mixed"
        u = self._impose(self.data, u, scale_arr)
        norms, pcg_iters = [], []
        norm0 = None
        for it in range(opts.max_newton):
            if mixed:
                norm = float(self._mixed_residual(self.data, self.soa, u, scale_arr))
            else:
                norm = float(self._residual(self.data, u, scale_arr))
            norms.append(norm)
            if norm0 is None:
                norm0 = max(norm, 1e-300)
            if norm <= max(opts.newton_rtol * norm0, opts.newton_atol):
                rec = IncrementRecord(
                    float(scale), it, norms, pcg_iters, time.perf_counter() - t0
                )
                return u, True, rec
            if mixed:
                u, lin_iters, lin_ok = self._step_mixed(u, scale_arr)
            else:
                u, lin_iters, lin_ok = self._step(self.data, u, scale_arr)
            pcg_iters.append(int(lin_iters))
            if not bool(lin_ok):
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
