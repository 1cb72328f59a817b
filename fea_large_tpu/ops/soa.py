"""SoA (structure-of-arrays) element kernels: the TPU performance path.

The AoS layout ([E, q, 3, 3] etc.) puts tensor dims of size 3 in the TPU
lane dimension (128 lanes), wasting ~97% of every vector register and
forcing padded (8,128) tiles — measured ~100x off speed-of-light. Here every
per-element quantity is laid out with the ELEMENT axis LAST (the lane axis)
and all small tensor indices (q<=5, npe<=10, i/J=3) are unrolled in Python
at trace time: each primitive is a full-lane elementwise op on [E]-vectors,
which XLA fuses into a handful of bandwidth-bound kernels.

Small 3x3 linear algebra is expressed over nested Python lists of
[E]-arrays (`M3 = list[list[jnp.ndarray]]`) — the SoA mirror of
`ops.smallmat`.

This module implements the matrix-free hot path of SURVEY.md C8/C12
(freeze + tangent action + internal force + diagonal blocks) used by the
mixed-precision solver; the f64 AoS kernels in `elements.kernels` remain
the parity reference (tests assert SoA == AoS to f32 accuracy).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fea_large_tpu.config import INDEX_DTYPE
from fea_large_tpu.materials.base import Material
from fea_large_tpu.materials.neo_hookean import NeoHookean, NeoHookeanVolumetric
from fea_large_tpu.materials.svk import StVenantKirchhoff

# ---------------------------------------------------------------------------
# 3x3 helpers over nested lists of [E]-vectors
# ---------------------------------------------------------------------------


def m3_zero(like):
    z = jnp.zeros_like(like)
    return [[z, z, z], [z, z, z], [z, z, z]]


def m3_matmul(A, B):
    return [
        [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def m3_transpose(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def m3_det(A):
    return (
        A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1])
        - A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0])
        + A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0])
    )


def m3_inv_det(A):
    """(adjugate/det, det) — explicit cofactors (no f64 LU on TPU)."""
    c = [[None] * 3 for _ in range(3)]
    c[0][0] = A[1][1] * A[2][2] - A[1][2] * A[2][1]
    c[0][1] = A[0][2] * A[2][1] - A[0][1] * A[2][2]
    c[0][2] = A[0][1] * A[1][2] - A[0][2] * A[1][1]
    c[1][0] = A[1][2] * A[2][0] - A[1][0] * A[2][2]
    c[1][1] = A[0][0] * A[2][2] - A[0][2] * A[2][0]
    c[1][2] = A[0][2] * A[1][0] - A[0][0] * A[1][2]
    c[2][0] = A[1][0] * A[2][1] - A[1][1] * A[2][0]
    c[2][1] = A[0][1] * A[2][0] - A[0][0] * A[2][1]
    c[2][2] = A[0][0] * A[1][1] - A[0][1] * A[1][0]
    det = A[0][0] * c[0][0] + A[0][1] * c[1][0] + A[0][2] * c[2][0]
    inv_det = 1.0 / det
    inv = [[c[i][j] * inv_det for j in range(3)] for i in range(3)]
    return inv, det


def m3_ddot(A, B):
    return sum(A[i][j] * B[i][j] for i in range(3) for j in range(3))


def m3_stack(A):
    """nested list -> array [3, 3, E] (for storage between calls)."""
    return jnp.stack([jnp.stack(row) for row in A])


def m3_unstack(A):
    """[.., 3, 3, E] array -> nested list of [.., E]."""
    return [[A[..., i, j, :] for j in range(3)] for i in range(3)]


# ---------------------------------------------------------------------------
# SoA mesh-level data
# ---------------------------------------------------------------------------


class ScatterBuckets(NamedTuple):
    """Scatter-as-gather maps: for each node, the list of flat (a-major)
    element-slot positions that hit it, padded within VALENCE BUCKETS.

    Rationale (measured on TPU v5e at 1M DOF, bench/scatter_variants.py):
    indexed reads (gathers) cost ~1.8 ns/scalar but indexed read-modify-
    writes (scatter-adds / segment sums) cost ~7.1 ns/scalar — TPUs lower
    both to scalar-core loops, but the add forces a serialized RMW. Summing
    each node's incident values with a padded GATHER + masked vector
    reduction converts the 50 ms scatter into a ~17 ms gather (pad factor
    ~1.4 with power-of-two valence buckets; a single dmax-padded table
    wastes 4x and loses). Fixed index lists also make the summation order
    deterministic by construction (SURVEY.md §7.2) — no reliance on
    backend scatter-add ordering.
    """

    idx: tuple  # per bucket: i32[nb, v] positions into the flat [npe*E] data
    mask: tuple  # per bucket: f32[nb, v] 1 for real entries
    inv: jnp.ndarray  # i32[N] node -> position in the concatenated buckets

    @staticmethod
    def _caps_for(cmax: int) -> list:
        caps, cap = [], 1
        while cap < max(cmax, 1):
            cap *= 2
            caps.append(cap)
        return caps or [1]

    @staticmethod
    def _host_build(flat: np.ndarray, n_nodes: int, caps: list,
                    nb_min: list | None = None):
        """(idx list, mask list, inv) in numpy, one entry per cap in `caps`
        (possibly 0-row). `nb_min[b]` pads bucket b's node count with dummy
        rows (idx 0, mask 0) so per-shard buckets can be stacked on a shard
        axis (`build_stacked`)."""
        counts = np.bincount(flat, minlength=n_nodes)
        order = np.argsort(flat, kind="stable").astype(np.int64)
        starts = np.zeros(n_nodes + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        idx_t, mask_t = [], []
        inv = np.zeros(n_nodes, np.int64)
        off = 0
        lo = -1  # first bucket also takes unreferenced (count 0) nodes
        for bi, cap in enumerate(caps):
            sel = np.nonzero((counts > lo) & (counts <= cap))[0]
            lo = cap
            c = counts[sel]
            span = np.minimum(
                np.arange(cap)[None, :], np.maximum(c - 1, 0)[:, None]
            )
            pos = np.minimum(starts[sel][:, None] + span, max(len(order) - 1, 0))
            idx = order[pos]
            mask = (np.arange(cap)[None, :] < c[:, None]).astype(np.float32)
            inv[sel] = off + np.arange(len(sel))
            if nb_min is not None and len(sel) < nb_min[bi]:
                pad = nb_min[bi] - len(sel)
                idx = np.concatenate([idx, np.zeros((pad, cap), np.int64)])
                mask = np.concatenate([mask, np.zeros((pad, cap), np.float32)])
            off += idx.shape[0]
            idx_t.append(idx)
            mask_t.append(mask)
        return idx_t, mask_t, inv

    @staticmethod
    def build(conn_T: np.ndarray, n_nodes: int) -> "ScatterBuckets":
        flat = np.asarray(conn_T).reshape(-1)
        cmax = int(np.bincount(flat, minlength=n_nodes).max()) if n_nodes else 1
        caps = ScatterBuckets._caps_for(cmax)
        idx_t, mask_t, inv = ScatterBuckets._host_build(flat, n_nodes, caps)
        keep = [b for b in range(len(caps)) if idx_t[b].shape[0] > 0]
        return ScatterBuckets(
            idx=tuple(jnp.asarray(idx_t[b], INDEX_DTYPE) for b in keep),
            mask=tuple(jnp.asarray(mask_t[b]) for b in keep),
            inv=jnp.asarray(inv, INDEX_DTYPE),
        )

    @staticmethod
    def build_stacked(conn_T_shards: np.ndarray, n_nodes: int):
        """Per-shard buckets with a leading shard axis (numpy leaves).

        `conn_T_shards` is i32[S, npe, El] (shard-local connectivity, padded
        elements included — their values are summed with zero data so any
        node ids they carry are harmless). Cap list and per-bucket node
        counts are unified across shards so the per-shard pytrees stack into
        [S, nb, cap] leaves, `shard_map`-compatible; inside the shard body a
        leaf sliced to one shard is a valid single-shard ScatterBuckets.
        Returns numpy arrays (caller device_puts with its sharding)."""
        conn_T_shards = np.asarray(conn_T_shards)
        S = conn_T_shards.shape[0]
        flats = [conn_T_shards[p].reshape(-1) for p in range(S)]
        cmax = max(
            int(np.bincount(f, minlength=n_nodes).max()) for f in flats
        ) if n_nodes else 1
        caps = ScatterBuckets._caps_for(cmax)
        # pass 1: per-bucket node counts per shard -> unified maxima
        nb = [0] * len(caps)
        for f in flats:
            counts = np.bincount(f, minlength=n_nodes)
            lo = -1
            for bi, cap in enumerate(caps):
                nb[bi] = max(nb[bi], int(((counts > lo) & (counts <= cap)).sum()))
                lo = cap
        keep = [b for b in range(len(caps)) if nb[b] > 0]
        # pass 2: build each shard against the unified (caps, nb) shape
        per = [
            ScatterBuckets._host_build(f, n_nodes, caps, nb_min=nb)
            for f in flats
        ]
        return ScatterBuckets(
            idx=tuple(
                np.stack([per[p][0][b] for p in range(S)]).astype(np.int32)
                for b in keep
            ),
            mask=tuple(
                np.stack([per[p][1][b] for p in range(S)]) for b in keep
            ),
            inv=np.stack([per[p][2] for p in range(S)]).astype(np.int32),
        )

    def apply(self, d: jnp.ndarray) -> jnp.ndarray:
        """d [C, npe*E] flat per-slot values -> [C, N] nodal sums."""
        parts = [
            jnp.sum(d[:, idx] * mask.astype(d.dtype)[None], axis=2)
            for idx, mask in zip(self.idx, self.mask)
        ]
        return jnp.concatenate(parts, axis=1)[:, self.inv]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SoAProblem:
    """Static SoA arrays for one mesh (pytree; the node count is static
    aux so reductions see concrete sizes under jit).

    The nodal scatter-add runs as a bucketed scatter-as-gather when
    `buckets` is present (see ScatterBuckets — ~3x cheaper than any
    scatter-add variant on TPU), falling back to a DIRECT (unsorted)
    segment-sum over the flattened connectivity (deterministic on TPU/CPU:
    XLA executes scatter-add updates in a fixed serial order). The sorted
    maps (`perm_T`/`segids_T`) are kept for consumers that need an
    ascending-segment layout.
    """

    gradN: jnp.ndarray  # f32[q, npe, 3, E]  (structured-uniform: [.., T])
    detJxW: jnp.ndarray  # f32[q, E]          (structured-uniform: [q, T])
    conn_T: jnp.ndarray  # i32[npe, E]
    perm_T: jnp.ndarray  # i32[npe*E] stable sort of flat (a, e) by node id
    segids_T: jnp.ndarray  # i32[npe*E] node per sorted slot
    buckets: ScatterBuckets | None
    n_nodes: int
    #: optional BoxStructure (mesh/structure.py, static aux): when present,
    #: soa_gather / soa_scatter_channels run as static slices / padded adds
    #: on the class grids — no indexed ops at all (the structured fast path;
    #: supersedes both conn_T gathers and the valence buckets on this mesh).
    structure: object | None = None
    #: structured-uniform only: the slot-compressed geometry tables as
    #: nested tuples of Python floats (static AUX — hashable). The fused
    #: structured Pallas kernel (ops/pallas_structured.py) bakes these as
    #: compile-time constants, eliminating the [q*npe*3, E] broadcast
    #: table traffic entirely; None on unstructured meshes.
    tables_host: tuple | None = None

    def tree_flatten(self):
        return (
            (self.gradN, self.detJxW, self.conn_T, self.perm_T, self.segids_T,
             self.buckets),
            (self.n_nodes, self.structure, self.tables_host),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @staticmethod
    def build(mesh, dtype=jnp.float32, share_maps_from: "SoAProblem | None" = None
              ) -> "SoAProblem":
        """Host-side build from a Mesh (cold path). `share_maps_from` reuses
        the index maps of an already-built SoAProblem for the same mesh
        (they are dtype-independent)."""
        elem = mesh.element
        coords, conn = mesh.coords_host, mesh.conn_host
        tables_host = None
        dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
        w = np.asarray(elem.quad_weights)
        Xe = coords[conn]
        J = np.einsum("eai,qaj->eqij", Xe, dN)
        # batched 3x3 adjugate inverse/det: np.linalg.inv/det dispatch a
        # LAPACK call PER matrix (~1M of them at headline scale — measured
        # ~20 s of the 24 s SoA build on this host); the closed form is
        # pure vectorized numpy (same formulas as ops/smallmat.py)
        detJ, Jinv = _np_inv_det_3x3(J)
        gradN = np.einsum("qaj,eqji->eqai", dN, Jinv)  # [E,q,npe,3]
        structure = getattr(mesh, "structure", None)
        gradN_T = np.transpose(gradN, (1, 2, 3, 0))  # [q, npe, 3, E]
        detJxW_T = (detJ * w[None, :]).T  # [q, E]
        if structure is not None:
            # uniform lattice: all cells of a tet slot are congruent, so the
            # per-element geometry tables collapse to per-slot constants
            # [q, npe, 3, T] / [q, T] (re-broadcast lazily in _slot_tables —
            # XLA fuses the broadcast, eliminating ~480 B/element of table
            # reads from every hot pass). Verified numerically; a graded
            # structured mesh would fail the check and keep full tables.
            T, C = structure.n_tets, structure.n_cells
            g5 = gradN_T.reshape(*gradN_T.shape[:3], T, C)
            v3 = detJxW_T.reshape(detJxW_T.shape[0], T, C)
            g_slot, v_slot = g5[..., :1], v3[..., :1]
            tol = 1e-12
            if (
                np.max(np.abs(g5 - g_slot)) <= tol * np.max(np.abs(g_slot))
                and np.max(np.abs(v3 - v_slot)) <= tol * np.max(np.abs(v_slot))
            ):
                gradN_T = np.ascontiguousarray(g_slot[..., 0])
                detJxW_T = np.ascontiguousarray(v_slot[..., 0])
                # static host copy for the fused structured Pallas kernel
                # (q*npe*3*T + q*T floats — tiny, hashable aux)
                tables_host = (
                    _np_to_tuple(gradN_T.astype(np.float64)),
                    _np_to_tuple(detJxW_T.astype(np.float64)),
                )
        if share_maps_from is not None:
            s = share_maps_from
            conn_T, perm_T, segids_T, buckets = (
                s.conn_T, s.perm_T, s.segids_T, s.buckets
            )
        else:
            conn_np = np.ascontiguousarray(conn.T)  # [npe, E]
            flat = conn_np.reshape(-1)
            perm = np.argsort(flat, kind="stable")
            conn_T = jnp.asarray(conn_np, INDEX_DTYPE)
            perm_T = jnp.asarray(perm, INDEX_DTYPE)
            segids_T = jnp.asarray(flat[perm], INDEX_DTYPE)
            # the structured path never runs indexed nodal sums — skip the
            # bucket build (setup time + device tables) on such meshes
            buckets = (
                None
                if structure is not None
                else ScatterBuckets.build(conn_np, int(mesh.n_nodes))
            )
        return SoAProblem(
            gradN=jnp.asarray(gradN_T, dtype),
            detJxW=jnp.asarray(detJxW_T, dtype),
            conn_T=conn_T,
            perm_T=perm_T,
            segids_T=segids_T,
            buckets=buckets,
            n_nodes=int(mesh.n_nodes),
            structure=structure,
            tables_host=tables_host,
        )


def _np_inv_det_3x3(J: np.ndarray):
    """(det, inverse) of a [..., 3, 3] stack via the adjugate closed form
    (host-side mirror of ops/smallmat.m3_inv_det — one vectorized pass
    instead of per-matrix LAPACK dispatches)."""
    a = J[..., 0, 0]; b = J[..., 0, 1]; c = J[..., 0, 2]  # noqa: E702
    d = J[..., 1, 0]; e = J[..., 1, 1]; f = J[..., 1, 2]  # noqa: E702
    g = J[..., 2, 0]; h = J[..., 2, 1]; i = J[..., 2, 2]  # noqa: E702
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = np.empty_like(J)
    adj[..., 0, 0] = A
    adj[..., 0, 1] = c * h - b * i
    adj[..., 0, 2] = b * f - c * e
    adj[..., 1, 0] = B
    adj[..., 1, 1] = a * i - c * g
    adj[..., 1, 2] = c * d - a * f
    adj[..., 2, 0] = C
    adj[..., 2, 1] = b * g - a * h
    adj[..., 2, 2] = a * e - b * d
    return det, adj / det[..., None, None]


def _np_to_tuple(a):
    """numpy -> nested tuples of Python floats (hashable static aux)."""
    if a.ndim == 0:
        return float(a)
    return tuple(_np_to_tuple(x) for x in a)


def _slot_tables(p: SoAProblem, k: int):
    """(g, V) geometry tables at quadrature point k, as [npe, 3, E] / [E].

    On structured-uniform meshes the stored tables are per-tet-slot
    constants ([npe, 3, T] / [T]); they are re-expanded here with a lazy
    broadcast_to + reshape that XLA fuses into the consumers — no [E]-sized
    table is ever materialized in HBM."""
    g, V = p.gradN[k], p.detJxW[k]
    st = p.structure
    if st is not None and g.shape[-1] == st.n_tets:
        C = st.n_cells
        g = jnp.broadcast_to(g[..., None], (*g.shape, C)).reshape(
            *g.shape[:-1], -1
        )
        V = jnp.broadcast_to(V[:, None], (V.shape[0], C)).reshape(-1)
    return g, V


def _struct_slot_gather(st, v: jnp.ndarray, t: int, a: int) -> jnp.ndarray:
    """v [N] -> [ncells] values of node slot a of tet slot t: reshape the
    class subgrid and take the static offset slice (no indexed ops)."""
    nx, ny, nz = st.cells
    k = st.slot_class[t][a]
    o = st.slot_offset[t][a]
    gx, gy, gz = st.class_dims[k]
    b = st.class_base[k]
    g = v[b : b + gx * gy * gz].reshape(gx, gy, gz)
    return g[
        o[0] : o[0] + nx, o[1] : o[1] + ny, o[2] : o[2] + nz
    ].reshape(-1)


def soa_gather(p: SoAProblem, v_T: jnp.ndarray):
    """v_T [3, N] -> per-element nodal values [3][npe] of [E]-vectors.

    Structured meshes (p.structure): each (tet-slot, node-slot) pair is an
    affine map of the cell lattice, so the gather is a static shifted slice
    per tet slot, concatenated in the tet-slot-major element order (see
    mesh/structure.py). The 6*npe slot slices collapse to the distinct
    (class, offset) pairs (27 for TET10, 8 for TET4) — deduped here so the
    traced graph carries each slice once (XLA would CSE the duplicates, but
    the 3x-smaller jaxpr also traces/compiles faster). Unstructured: one
    conn_T gather."""
    st = p.structure
    if st is not None:
        out = []
        for i in range(3):
            cache = {}
            for t in range(st.n_tets):
                for a in range(st.npe):
                    key = (st.slot_class[t][a], st.slot_offset[t][a])
                    if key not in cache:
                        cache[key] = _struct_slot_gather(st, v_T[i], t, a)
            out.append(
                [
                    jnp.concatenate(
                        [
                            cache[(st.slot_class[t][a], st.slot_offset[t][a])]
                            for t in range(st.n_tets)
                        ]
                    )
                    for a in range(st.npe)
                ]
            )
        return out
    ve = v_T[:, p.conn_T]  # [3, npe, E]
    return [[ve[i, a] for a in range(p.conn_T.shape[0])] for i in range(3)]


def _struct_scatter_one(st, ch: list) -> jnp.ndarray:
    """One channel (npe [E]-vectors) -> [N] nodal sums by zero-padded adds
    onto the class grids: contribution of (t, a) at cell offset o lands in
    its class grid shifted by o, so summing jnp.pad'ed cell blocks IS the
    scatter-add — fixed order, no indexed writes.

    Slots sharing a (class, offset) pair (60 -> 27 for TET10) are summed on
    the raw [C] cell blocks FIRST, so each distinct pair pays exactly one
    pad + one class-grid add — ~2x fewer padded ops and a 2x smaller traced
    graph than the naive per-slot loop, same deterministic order."""
    nx, ny, nz = st.cells
    C = st.n_cells
    groups = {}
    for t in range(st.n_tets):
        for a in range(st.npe):
            key = (st.slot_class[t][a], st.slot_offset[t][a])
            blk = ch[a][t * C : (t + 1) * C]
            groups[key] = blk if key not in groups else groups[key] + blk
    acc = [None] * len(st.classes)
    for (k, o), blk in groups.items():
        gx, gy, gz = st.class_dims[k]
        g = jnp.pad(
            blk.reshape(nx, ny, nz),
            (
                (o[0], gx - nx - o[0]),
                (o[1], gy - ny - o[1]),
                (o[2], gz - nz - o[2]),
            ),
        )
        acc[k] = g if acc[k] is None else acc[k] + g
    return jnp.concatenate([g.reshape(-1) for g in acc])


def soa_scatter_channels(p: SoAProblem, channels: list) -> jnp.ndarray:
    """channels: C lists of npe [E]-vectors -> [C, N] nodal sums.

    Structured meshes: padded-add onto class grids (_struct_scatter_one).
    Unstructured: bucketed scatter-as-gather when maps are available
    (ScatterBuckets docstring has the measured cost model), else direct
    segment-sum."""
    if p.structure is not None:
        return jnp.stack(
            [_struct_scatter_one(p.structure, ch) for ch in channels]
        )
    npe = p.conn_T.shape[0]
    d = jnp.stack(
        [jnp.concatenate([ch[a] for a in range(npe)]) for ch in channels]
    )  # [C, npe*E]
    if p.buckets is not None:
        return p.buckets.apply(d)
    flat_ids = p.conn_T.reshape(-1)
    return jnp.stack(
        [
            jax.ops.segment_sum(d[c], flat_ids, num_segments=p.n_nodes)
            for c in range(d.shape[0])
        ]
    )


def soa_scatter(p: SoAProblem, fe):
    """fe [i][a] of [E] -> nodal sums [3, N]."""
    return soa_scatter_channels(p, [fe[0], fe[1], fe[2]])


# ---------------------------------------------------------------------------
# kinematics + constitutive state (freeze), SoA
# ---------------------------------------------------------------------------


class SoAState(NamedTuple):
    """Frozen tangent state at u (SoA): stacked [q, 3, 3, E] / [q, E]."""

    F: jnp.ndarray
    S: jnp.ndarray
    A: jnp.ndarray  # iso-tangent factor matrix (I for SVK, C^-1 for NH)
    alpha: jnp.ndarray  # [q, E]
    beta: jnp.ndarray  # [q, E]


def _soa_material(material: Material, C, dtype):
    """(S, alpha, A, beta) in SoA nested-list form, per quadrature point.

    The SoA mirror of `Material.pk2_and_state` + `iso_tangent_factors` for
    the registered isotropic materials (SURVEY.md C6/C7).

    NOTE: the fused structured TPU kernels re-express these same laws in
    scalar form (`ops/pallas_structured._freeze_kernel`, and the
    double-word residual in `ops/pallas_residual.py`); a material-law
    change here MUST be mirrored there (cross-pinned by
    tests/test_pallas_structured.py equivalence tests).
    """
    lam = material.lam.astype(dtype)
    mu = material.mu.astype(dtype)
    one = jnp.ones_like(C[0][0])
    if isinstance(material, StVenantKirchhoff):
        # S = lam tr(E) I + 2 mu E, E = (C - I)/2
        trE = 0.5 * (C[0][0] + C[1][1] + C[2][2] - 3.0)
        S = [
            [
                lam * trE * (1.0 if i == j else 0.0)
                + mu * (C[i][j] - (1.0 if i == j else 0.0))
                for j in range(3)
            ]
            for i in range(3)
        ]
        eye = [[one if i == j else jnp.zeros_like(one) for j in range(3)] for i in range(3)]
        return S, lam * one, eye, 2.0 * mu * one
    if isinstance(material, NeoHookeanVolumetric):
        # note: check BEFORE NeoHookean in case of future subclassing
        Cinv, detC = m3_inv_det(C)
        J = jnp.sqrt(detC)
        vol = lam * J * (J - 1.0)
        S = [
            [
                mu * ((1.0 if i == j else 0.0) - Cinv[i][j]) + vol * Cinv[i][j]
                for j in range(3)
            ]
            for i in range(3)
        ]
        return S, lam * J * (2.0 * J - 1.0), Cinv, 2.0 * (mu - vol)
    if isinstance(material, NeoHookean):
        Cinv, detC = m3_inv_det(C)
        lnJ = 0.5 * jnp.log(detC)
        S = [
            [
                mu * ((1.0 if i == j else 0.0) - Cinv[i][j])
                + lam * lnJ * Cinv[i][j]
                for j in range(3)
            ]
            for i in range(3)
        ]
        return S, lam * one, Cinv, 2.0 * (mu - lam * lnJ)
    raise NotImplementedError(
        f"SoA kernels support the registered isotropic materials; got "
        f"{type(material).__name__} (use the AoS path)"
    )


def _struct_fused(p: SoAProblem) -> bool:
    """True when the f32 element passes should run as the FUSED structured
    Pallas kernels (ops/pallas_structured.py) — TPU + uniform lattice.
    The XLA slice/pad graphs fragment into 100+ fusions that materialize
    gigabytes of [E] intermediates per pass (measured round 4: 6.75 GB
    per tangent matvec, 4.66 -> 0.99 ms fused); off-TPU the kernels only
    exist in slow interpret mode, so the XLA path stays."""
    if p.gradN.dtype != jnp.float32:
        return False
    from fea_large_tpu.config import on_tpu

    if not on_tpu():
        return False
    from fea_large_tpu.ops.pallas_structured import struct_pallas_supported

    return struct_pallas_supported(p)


def soa_freeze(p: SoAProblem, material: Material, u_T: jnp.ndarray) -> SoAState:
    """Evaluate kinematics + constitutive state once per Newton iterate."""
    if _struct_fused(p) and isinstance(
        material, (StVenantKirchhoff, NeoHookean, NeoHookeanVolumetric)
    ):
        from fea_large_tpu.ops.pallas_structured import (
            soa_freeze_struct_pallas,
        )

        return soa_freeze_struct_pallas(p, material, u_T)
    dtype = p.gradN.dtype
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    ue = soa_gather(p, u_T)
    Fs, Ss, As, als, bes = [], [], [], [], []
    for k in range(q):
        g, _ = _slot_tables(p, k)  # [npe, 3, E]
        F = [
            [
                (1.0 if i == J else 0.0)
                + sum(ue[i][a] * g[a, J] for a in range(npe))
                for J in range(3)
            ]
            for i in range(3)
        ]
        C = m3_matmul(m3_transpose(F), F)
        S, alpha, A, beta = _soa_material(material, C, dtype)
        Fs.append(m3_stack(F))
        Ss.append(m3_stack(S))
        As.append(m3_stack(A))
        als.append(alpha)
        bes.append(beta)
    return SoAState(
        F=jnp.stack(Fs), S=jnp.stack(Ss), A=jnp.stack(As),
        alpha=jnp.stack(als), beta=jnp.stack(bes),
    )


def soa_internal_force(p: SoAProblem, state: SoAState) -> jnp.ndarray:
    """f_int [3, N] from the frozen state: fe[a,i] = sum_q V (F S)_iJ g_a[J]."""
    if _struct_fused(p):
        from fea_large_tpu.ops.pallas_structured import (
            soa_internal_force_struct_pallas,
        )

        return soa_internal_force_struct_pallas(p, state)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    fe = [[0.0] * npe for _ in range(3)]
    for k in range(q):
        F = m3_unstack(state.F[k])
        S = m3_unstack(state.S[k])
        g, V = _slot_tables(p, k)
        P = m3_matmul(F, S)
        PV = [[P[i][J] * V for J in range(3)] for i in range(3)]
        for i in range(3):
            for a in range(npe):
                fe[i][a] = fe[i][a] + sum(PV[i][J] * g[a, J] for J in range(3))
    return soa_scatter(p, fe)


def soa_apply_tangent(p: SoAProblem, state: SoAState, v_T: jnp.ndarray) -> jnp.ndarray:
    """(K v) [3, N]: consistent-tangent action, material + geometric
    (SURVEY.md §5.5 matrix-free action). Routes to the fused structured
    Pallas kernel on TPU lattices like its freeze/force/diag siblings
    (round 5 — previously only `_mixed_matvec` routed, so direct callers
    such as the coarse-probing sweep paid the 5.4 ms XLA graph instead
    of the 1.0 ms kernel); the XLA body below is the reference mirror."""
    if _struct_fused(p):
        from fea_large_tpu.ops.pallas_structured import (
            soa_apply_tangent_struct_pallas,
        )

        return soa_apply_tangent_struct_pallas(p, state, v_T)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    ve = soa_gather(p, v_T)
    out = [[0.0] * npe for _ in range(3)]
    for k in range(q):
        F = m3_unstack(state.F[k])
        S = m3_unstack(state.S[k])
        A = m3_unstack(state.A[k])
        alpha, beta = state.alpha[k], state.beta[k]
        g, V = _slot_tables(p, k)
        # dF_iJ = sum_a v[a,i] g_a[J]
        dF = [
            [sum(ve[i][a] * g[a, J] for a in range(npe)) for J in range(3)]
            for i in range(3)
        ]
        # dE = sym(F^T dF)
        FtdF = m3_matmul(m3_transpose(F), dF)
        dE = [
            [0.5 * (FtdF[i][j] + FtdF[j][i]) for j in range(3)] for i in range(3)
        ]
        # dS = alpha (A:dE) A + beta A dE A
        AdE = m3_ddot(A, dE)
        AdEA = m3_matmul(A, m3_matmul(dE, A))
        dS = [
            [alpha * AdE * A[i][j] + beta * AdEA[i][j] for j in range(3)]
            for i in range(3)
        ]
        # dP = dF S + F dS, weighted by V
        dP1 = m3_matmul(dF, S)
        dP2 = m3_matmul(F, dS)
        dPV = [[(dP1[i][J] + dP2[i][J]) * V for J in range(3)] for i in range(3)]
        for i in range(3):
            for a in range(npe):
                out[i][a] = out[i][a] + sum(dPV[i][J] * g[a, J] for J in range(3))
    return soa_scatter(p, out)


def soa_diag_blocks(p: SoAProblem, state: SoAState) -> jnp.ndarray:
    """Nodal 3x3 diagonal blocks [3, 3, N] for block-Jacobi (SURVEY.md C12),
    via the factored tangent (kernels._iso_stiffness_pieces, SoA form):
    diag[a,i,k] = sum_q V [(alpha + beta/2) s_ai s_ak + beta/2 B_ik G_aa]
                + sum_q V (g_a.S.g_a) delta_ik.
    """
    if _struct_fused(p):
        from fea_large_tpu.ops.pallas_structured import (
            soa_diag_blocks_struct_pallas,
        )

        return soa_diag_blocks_struct_pallas(p, state)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    acc = [[[0.0] * npe for _ in range(3)] for _ in range(3)]  # [i][k][a]
    for kq in range(q):
        F = m3_unstack(state.F[kq])
        S = m3_unstack(state.S[kq])
        A = m3_unstack(state.A[kq])
        alpha, beta = state.alpha[kq], state.beta[kq]
        g, V = _slot_tables(p, kq)
        FA = m3_matmul(F, A)
        B = m3_matmul(FA, m3_transpose(F))
        w1 = (alpha + 0.5 * beta) * V
        w2 = 0.5 * beta * V
        for a in range(npe):
            s_a = [sum(FA[i][J] * g[a, J] for J in range(3)) for i in range(3)]
            Ag_a = [sum(A[I][J] * g[a, J] for J in range(3)) for I in range(3)]
            G_aa = sum(g[a, I] * Ag_a[I] for I in range(3))
            Sg_a = [sum(S[I][J] * g[a, J] for J in range(3)) for I in range(3)]
            geo = V * sum(g[a, I] * Sg_a[I] for I in range(3))
            for i in range(3):
                for k in range(3):
                    term = w1 * s_a[i] * s_a[k] + w2 * B[i][k] * G_aa
                    if i == k:
                        term = term + geo
                    acc[i][k][a] = acc[i][k][a] + term
    # scatter all 9 (i,k) channels over nodes in one pass (see soa_scatter)
    out = soa_scatter_channels(
        p, [acc[i][k] for i in range(3) for k in range(3)]
    )
    return out.reshape(3, 3, p.n_nodes)
