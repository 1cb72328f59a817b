"""Two-level additive preconditioner (coarse aggregation + block-Jacobi).

Net-new vs the reference (which ships plain Jacobi-PCG — SURVEY.md C12):
block-Jacobi alone needs O(h^-1) CG iterations (measured 214 -> 482 from
95k to 1M DOF), so large meshes pay hundreds of SpMVs per Newton step. A
coarse correction removes the low-frequency modes:

    M^{-1} r = Jacobi(r) + P Ac^{-1} P^T r

  * P — piecewise-constant prolongation over geometric node AGGREGATES
    (host-side: coordinate binning into ~n_nodes/agg_size boxes), identity
    across the 3 displacement components.
  * Ac = P^T K0 P — the aggregated stiffness at the REFERENCE state (u=0),
    assembled once per solve via the BCSR path, BC-masked, Cholesky-
    factored on device in f32 and reused for every Newton step/iteration
    (a frozen coarse operator stays spectrally equivalent under moderate
    deformation; Jacobi tracks the current tangent).

Both terms are SPD, so CG theory applies. Apply cost per iteration: one
segment-sum (P^T), one dense triangular pair (Nc ~ hundreds), one gather
(P) — small next to the element SpMV.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from fea_large_tpu.config import INDEX_DTYPE


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CoarseSpace:
    """Aggregation maps + factored coarse operator (pytree).

    `modes` selects the per-aggregate coarse basis:
      3 — translations only (piecewise-constant P, identity 3x3 blocks);
      6 — full RIGID BODY MODES (3 translations + 3 rotations about the
          aggregate centroid): the near-kernel of 3-D elasticity. The
          prolongator block per node is B_n = [I | cross-matrix(d_n)] with
          d_n = x_n - centroid(agg(n)); adding the rotations removes the
          low-energy bending/twisting modes a translation-only coarse space
          cannot represent (standard smoothed-aggregation practice for
          elasticity) and cuts CG iteration counts accordingly.
      12 — EXPERIMENTAL: RBM + the six linear STRAIN fields u_i = eps_ij
          d_j per aggregate, spanning ALL piecewise-linear displacement
          fields (B_n = [I | cross(d_n) | S(d_n)], `_strain_prolong`).
          Single-device probing assembly only; evaluated against modes=6
          at matched coarse dimension in bench/coarse_modes_experiment.py.
    """

    agg: jnp.ndarray  # i32[N] aggregate id per node
    perm: jnp.ndarray  # i32[N] stable sort of nodes by aggregate
    segids: jnp.ndarray  # i32[N] aggregate per sorted slot
    acinv: jnp.ndarray  # f32[modes*Nc, modes*Nc] EXPLICIT inverse of Ac
    dvec: jnp.ndarray | None  # f32[N, 3] normalized rotational arm (modes=6):
    #   (x_n - centroid) / RMS arm of the aggregate (`_rbm_dvec`)
    dvec_T: jnp.ndarray | None  # f32[3, N] the same, component-first (for
    #   the measured-alternative `apply_T`; production PCG stays AoS)
    buckets: object | None  # ops.soa.ScatterBuckets over agg ids (or None)
    n_agg: int
    modes: int
    #: lattice-block pooled transfer (ops/pooling.py, static aux) — set on
    #: structured meshes: restrict/prolong become per-class reshape-sums/
    #: broadcasts over the SAME aggregate assignment, zero indexed ops
    pool: object | None = None

    def tree_flatten(self):
        return (
            (self.agg, self.perm, self.segids, self.acinv, self.dvec,
             self.dvec_T, self.buckets),
            (self.n_agg, self.modes, self.pool),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- transfer operators --------------------------------------------------
    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        """P^T r: [N, 3] -> [Nc, modes].

        Mode 3+k of aggregate A is sum_{n in A} (e_k x d_n) . r_n
        = sum (d_n x r_n)_k; modes 6..11 (modes=12) are the six linear
        STRAIN moments sum S(d_n)^T r_n (`_strain_restrict`). Deterministic:
        bucketed gather-sum when maps exist, else sorted segment sum."""
        t = r
        if self.modes >= 6:
            d = self.dvec.astype(r.dtype)
            t = jnp.concatenate([r, jnp.cross(d, r)], 1)
            if self.modes == 12:
                t = jnp.concatenate([t, _strain_restrict(d, r)], 1)
        if self.pool is not None:
            return self.pool.restrict(t)
        if self.buckets is not None:
            return self.buckets.apply(t.T).T
        return jax.ops.segment_sum(
            t[self.perm], self.segids, num_segments=self.n_agg,
            indices_are_sorted=True,
        )

    def prolong(self, xc: jnp.ndarray) -> jnp.ndarray:
        """P xc: [Nc, modes] -> [N, 3] ((P xc)_n = t_A + omega_A x d_n
        [+ S(d_n) eps_A for modes=12])."""
        za = self.pool.prolong(xc) if self.pool is not None else xc[self.agg]
        if self.modes >= 6:
            d = self.dvec.astype(xc.dtype)
            out = za[:, :3] + jnp.cross(za[:, 3:6], d)
            if self.modes == 12:
                out = out + _strain_prolong(d, za[:, 6:12])
            return out
        return za

    def coarse_solve(self, rc: jnp.ndarray) -> jnp.ndarray:
        """Ac^{-1} rc via the precomputed EXPLICIT inverse: one dense
        matvec. cho_solve's two triangular solves measured 11.8 ms per
        apply at modes*Nc~16k on TPU (panel-serialized, poorly mapped to
        the MXU) vs ~1.5 ms for a single bandwidth-bound pass over the
        same gigabyte (round-3 breakdown, BENCH_NOTES.md). As a
        PRECONDITIONER the inverse's extra rounding (~eps*kappa of the
        ridged SPD Ac) perturbs only the preconditioner, never the CG
        fixed point; `_invert_factor` symmetrizes it because CG requires
        a symmetric M."""
        x = self.acinv @ rc.reshape(-1).astype(self.acinv.dtype)
        return x.reshape(rc.shape).astype(rc.dtype)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """Coarse correction P Ac^{-1} P^T r."""
        return self.prolong(self.coarse_solve(self.restrict(r)))

    def apply_T(self, r_T: jnp.ndarray) -> jnp.ndarray:
        """Component-first coarse correction: r_T [3, N] -> [3, N].

        Measured 5.5 ms vs 6.3 ms for the AoS `apply` standalone at 945k
        DOF (bench/breakdown.py `coarse_apply_T`), but switching the
        WHOLE mixed-PCG vector state to [3, N] benched 2.4% SLOWER
        end-to-end (0.888 vs 0.867 s/step EW at 1M DOF) — inside the
        fused solve programs XLA already absorbs the AoS tile padding
        that dominates standalone ops (bench/layout_microbench.py:
        5.5x on a standalone axpy+dot pair), and the component-first
        graph fuses slightly worse. Kept as the measured-available
        alternative + breakdown-bench subject; production stays AoS."""
        if self.modes != 6 or self.buckets is None:
            # translations-only path has no bucket maps: delegate (two
            # [N, 3] transposes per apply — off the measured hot path)
            return self.apply(r_T.T).T
        d = self.dvec_T.astype(r_T.dtype)
        t = jnp.concatenate([r_T, _cross_T(d, r_T)], axis=0)  # [6, N]
        rc = self.buckets.apply(t)  # [6, Nc]
        xc = (
            self.acinv @ rc.T.reshape(-1).astype(self.acinv.dtype)
        ).reshape(self.n_agg, 6).astype(r_T.dtype)
        za_T = xc[self.agg].T  # [6, N] (row gather, then one cheap transpose)
        return za_T[:3] + _cross_T(za_T[3:], d)


def _strain_restrict(d: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """S(d)^T r [N, 6]: the six linear-strain moment components of r with
    the normalized arm d (modes=12 coarse basis; engineering-shear
    ordering xx, yy, zz, xy, xz, yz). S(d) columns are `_strain_prolong`'s
    fields — restrict is its exact transpose, as CG symmetry requires."""
    return jnp.stack(
        (
            d[:, 0] * r[:, 0],
            d[:, 1] * r[:, 1],
            d[:, 2] * r[:, 2],
            d[:, 1] * r[:, 0] + d[:, 0] * r[:, 1],
            d[:, 2] * r[:, 0] + d[:, 0] * r[:, 2],
            d[:, 2] * r[:, 1] + d[:, 1] * r[:, 2],
        ),
        axis=1,
    )


def _strain_prolong(d: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """S(d) eps [N, 3]: the displacement of the linear strain field eps
    at the normalized arm d (u_i = eps_ij d_j, engineering shears)."""
    return jnp.stack(
        (
            d[:, 0] * eps[:, 0] + d[:, 1] * eps[:, 3] + d[:, 2] * eps[:, 4],
            d[:, 1] * eps[:, 1] + d[:, 0] * eps[:, 3] + d[:, 2] * eps[:, 5],
            d[:, 2] * eps[:, 2] + d[:, 0] * eps[:, 4] + d[:, 1] * eps[:, 5],
        ),
        axis=1,
    )


def _cross_T(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over component-first [3, N] operands."""
    return jnp.stack(
        (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )
    )


def aggregate_nodes(coords: np.ndarray, agg_size: int = 512) -> np.ndarray:
    """Geometric aggregation: bin nodes into a uniform grid with ~agg_size
    nodes per cell; compact the labels. Host-side, O(N)."""
    coords = np.asarray(coords)
    N = coords.shape[0]
    n_cells = max(1, N // agg_size)
    per_axis = max(1, round(n_cells ** (1.0 / 3.0)))
    lo = coords.min(axis=0)
    hi = coords.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    ijk = np.minimum(
        (per_axis * (coords - lo) / span).astype(np.int64), per_axis - 1
    )
    raw = (ijk[:, 0] * per_axis + ijk[:, 1]) * per_axis + ijk[:, 2]
    _, agg = np.unique(raw, return_inverse=True)
    return agg.astype(np.int64)


def default_agg_size(
    n_nodes: int, target_coarse: int = 5000, structured: bool = False
) -> int:
    """Aggregate size targeting ~`target_coarse` aggregates, with the
    target itself scaling as sqrt(N) beyond the 1M-DOF calibration point
    and the aggregate floored at 60 nodes.

    `structured=True` (lattice-block pooled transfer, ops/pooling.py)
    scales the target by 0.56: every time the iteration got cheaper the
    optimum moved toward a smaller dense coarse (BENCH_NOTES round 4 —
    with the pooled transfer alone agg 200 won at 0.1765 s/step; with
    the fused Pallas element kernels agg 250 wins: 0.0611 vs 0.0640 at
    agg 200 and 0.0722 at agg 320, 1M DOF), because the coarse apply's
    dim^2 stream is now the largest per-iteration term.

    Calibration (BENCH_NOTES.md): at 1M DOF the fixed target balances the
    dense [modes*Nc]^2 coarse apply against the iteration count (finer
    coarse LOST: Nc 5k -> 1.218 s/step vs 2.7k -> 1.15); at 4M DOF the
    4x-costlier matvec flips the balance and the finer coarse WINS
    (Nc 4.5k -> 8.42 s/step vs 2.5k -> 9.23). A sqrt(N) target matches
    both measured optima: ~2.5k at 1M, ~4.9k at 4M (modes=6 base).

    The 60-node FLOOR (round-3 agg-policy sweep) kicks in below ~150k
    nodes, where the fixed target would otherwise shatter the mesh into
    tiny aggregates: at 95k DOF the un-floored default (agg 16, coarse
    dim 13182) cost 889 s of setup for 0.0428 s/step, while agg 60
    (dim 3072) measured 0.0401 s/step at 44 s setup — better on BOTH
    axes; iteration counts grow only mildly (42 -> 56) while the dense
    coarse apply and its inverse build shrink 4x."""
    ref_nodes = 342_361  # the 1M-DOF calibration mesh
    scale = max(1.0, float(n_nodes) / ref_nodes) ** 0.5
    if structured:
        scale *= 0.56
    target = int(target_coarse * scale)
    return int(np.clip(n_nodes // target, 60, 4096))


def _rbm_dvec(coords: np.ndarray, agg: np.ndarray, cent: np.ndarray,
              n_agg: int) -> np.ndarray:
    """Per-node rotational-basis arm d_n = (x_n - centroid)/s_A, normalized
    by the aggregate RMS arm length s_A = sqrt(mean |x_n - centroid|^2).

    The normalization is a pure column rescaling of the prolongator (the
    coarse SPACE is unchanged) that equilibrates the translation and
    rotation blocks of Ac: unscaled, the rotation diagonal goes as |d|^2 ~
    (aggregate extent)^2 and, on fine or elongated meshes, sits orders of
    magnitude below the translation diagonal — the resulting f32
    cho_solve noise amplification was measured to break CG down at
    rel~1e-3 on the elongated dryrun mesh. Scaled, both blocks are O(1)."""
    d = coords - cent[agg]
    cnt = np.maximum(np.bincount(agg, minlength=n_agg), 1)
    s = np.sqrt(
        np.bincount(agg, weights=(d * d).sum(1), minlength=n_agg) / cnt
    )
    return d / np.maximum(s, 1e-30)[agg, None]


def _aggregate_adjacency(conn: np.ndarray, agg: np.ndarray, n_agg: int):
    """Aggregate pairs (A, B) coupled by the stiffness: A != B sharing an
    element (K[a,b] != 0 iff nodes a,b share an element). Returns a CSR-ish
    (indptr, indices) over aggregates, self-pairs excluded."""
    agg_e = agg[conn]  # [E, npe]
    npe = agg_e.shape[1]
    pa, pb = np.triu_indices(npe, k=1)
    A = agg_e[:, pa].reshape(-1)
    B = agg_e[:, pb].reshape(-1)
    sel = A != B
    A, B = A[sel], B[sel]
    keys = np.unique(
        np.concatenate([A * n_agg + B, B * n_agg + A])
    )
    rows = keys // n_agg
    cols = keys % n_agg
    indptr = np.zeros(n_agg + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n_agg), out=indptr[1:])
    return indptr, cols


def _color_square_graph(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Greedy first-fit coloring of G^2 (distance-2 coloring of the
    aggregate graph): same-color aggregates share no common neighbor, so a
    single probe vector can carry one basis column per same-color aggregate
    without mixing.

    The distance-<=2 adjacency is materialized once as a sparse boolean
    product (scipy C++) and the per-vertex step is a vectorized first-unused
    scan — the earlier per-vertex Python set construction was O(n_agg *
    deg^2) and cost seconds of host setup at the sqrt(N)-scaled aggregate
    counts (round-2 advisor finding). Same vertex order, same neighbor
    sets => identical coloring."""
    import scipy.sparse as sp

    n = len(indptr) - 1
    A = sp.csr_matrix(
        (np.ones(len(indices), np.int8), indices, indptr), shape=(n, n)
    )
    A2 = ((A @ A) + A).tocsr()  # paths of length 2 (incl. self) + length 1
    color = np.full(n, -1, np.int64)
    for v in range(n):
        nb = A2.indices[A2.indptr[v] : A2.indptr[v + 1]]
        used = color[nb]
        used = used[used >= 0]
        if used.size == 0:
            color[v] = 0
            continue
        mark = np.zeros(used.max() + 2, bool)
        mark[used] = True
        color[v] = int(np.argmin(mark))  # first unused color
    return color


def _soa_freeze_impl(soa, material32, u_T):
    from fea_large_tpu.ops.soa import soa_freeze

    return soa_freeze(soa, material32, u_T)


_soa_freeze_jit = jax.jit(_soa_freeze_impl)


@functools.partial(jax.jit, static_argnames=("n_agg", "modes", "pool"))
def _probe_run(soa, state0, free32, agg_j, Bn, dvec, color_node, cm,
               *, n_agg: int, modes: int, pool=None):
    """Sequential probe sweep (lax.map) on device: for each (color, mode)
    pair build the probe vector from the per-node tables, apply the masked
    frozen tangent action, restrict per aggregate. Module-level jit with
    every array an ARGUMENT (closure-captured mesh-size constants make
    tracing/compilation pathological — solvers/newton.py module note)."""
    from fea_large_tpu.ops.soa import soa_apply_tangent

    def probe(cm1):
        c, m = cm1[0], cm1[1]
        col = jax.lax.dynamic_index_in_dim(Bn, m, axis=2, keepdims=False)
        v = jnp.where(color_node == c, 1.0, 0.0)[:, None] * col
        vm_T = (v * free32).T
        y = soa_apply_tangent(soa, state0, vm_T).T * free32
        if modes == 3:
            t = y
        else:
            t = jnp.concatenate([y, jnp.cross(dvec, y)], 1)
            if modes == 12:
                t = jnp.concatenate([t, _strain_restrict(dvec, y)], 1)
        if pool is not None:
            # structured lattices: pooled reshape-sum restrict — no
            # indexed ops in the probe sweep (round 5; same aggregate
            # assignment as agg_j by construction, ops/pooling.py)
            return pool.restrict(t)
        return jax.ops.segment_sum(t, agg_j, num_segments=n_agg)

    return jax.lax.map(probe, cm)


def _probe_plan(conn, agg, n_agg, modes, dvec):
    """Host-side plan shared by the single-device and SHARDED probing
    coarse assemblies: distance-2 coloring of the aggregate graph, per-node
    RBM basis table, the (color, mode) probe schedule, and the flat
    scatter indices that place each probe response block into the dense
    [nc, nc] coarse matrix.

    Returns (color [n_agg], Bn [N, 3, modes] f32, d [N, 3] f32 normalized
    arms (zeros when modes=3), cm [n_probes, 2] i32, src, dst, nc):
    response stack layout Z[c*modes + m, B, n] -> Ac[modes*B + n,
    modes*A + m] with A = attr[B, c] the unique same-color excited
    neighbor (distance-2 invariant)."""
    N = len(agg)
    indptr, indices = _aggregate_adjacency(conn, agg, n_agg)
    color = _color_square_graph(indptr, indices)
    n_colors = int(color.max()) + 1

    # attribution: the probe of color c excites, as seen from aggregate B,
    # the unique aggregate A = attr[B, c] (-1 = none). Uniqueness is the
    # distance-2 coloring invariant: two same-color aggregates never share
    # a neighbor.
    attr = np.full((n_agg, n_colors), -1, np.int64)
    attr[np.arange(n_agg), color] = np.arange(n_agg)
    src = np.repeat(np.arange(n_agg), np.diff(indptr))  # A of each (A,B) edge
    attr[indices, color[src]] = src

    # per-node RBM basis columns B_n [N, 3, modes]: translations + e_k x d
    # with d the NORMALIZED arm `_rbm_dvec` (conditioning note there)
    Bn = np.zeros((N, 3, modes), np.float32)
    Bn[:, 0, 0] = Bn[:, 1, 1] = Bn[:, 2, 2] = 1.0
    d = np.zeros((N, 3), np.float32)
    if modes >= 6:
        d = np.asarray(dvec, np.float32)
        Bn[:, 1, 3], Bn[:, 2, 3] = -d[:, 2], d[:, 1]
        Bn[:, 0, 4], Bn[:, 2, 4] = d[:, 2], -d[:, 0]
        Bn[:, 0, 5], Bn[:, 1, 5] = -d[:, 1], d[:, 0]
    if modes == 12:
        # linear strain fields u_i = eps_ij d_j (engineering shears) —
        # columns of `_strain_prolong`; with translations + rotations the
        # 12-mode basis spans ALL piecewise-linear displacement fields
        Bn[:, 0, 6] = d[:, 0]
        Bn[:, 1, 7] = d[:, 1]
        Bn[:, 2, 8] = d[:, 2]
        Bn[:, 0, 9], Bn[:, 1, 9] = d[:, 1], d[:, 0]
        Bn[:, 0, 10], Bn[:, 2, 10] = d[:, 2], d[:, 0]
        Bn[:, 1, 11], Bn[:, 2, 11] = d[:, 2], d[:, 1]
    # (color, mode) probe schedule; probe vectors are built ON DEVICE from
    # the small per-node tables (shipping the [P, N, 3] probe stack through
    # the tunneled host->device link would dominate the setup time)
    cm = np.stack(
        [
            np.repeat(np.arange(n_colors), modes),
            np.tile(np.arange(modes), n_colors),
        ],
        axis=1,
    ).astype(np.int32)

    nc = modes * n_agg
    mm = np.arange(modes)
    dst_l, src_l = [], []
    for c in range(n_colors):
        Bsel = np.nonzero(attr[:, c] >= 0)[0]
        if len(Bsel) == 0:
            continue
        A = attr[Bsel, c]
        # Ac[modes*B + n, modes*A + m] = Z[c, m, B, n]
        rows = modes * Bsel[:, None, None] + mm[None, :, None]  # [B, n, 1]
        cols = modes * A[:, None, None] + mm[None, None, :]  # [B, 1, m]
        dst_l.append((rows * nc + cols).reshape(-1))
        # Z flat index of [c, m, B, n]
        zsrc = (
            ((c * modes + mm[None, None, :]) * n_agg + Bsel[:, None, None])
            * modes
            + mm[None, :, None]
        )
        src_l.append(zsrc.reshape(-1))
    # flat dst indices span nc*nc: i32 covers nc up to ~46k (nc=30k at the
    # largest swept aggregate count); fall back to i64 beyond
    dst_dtype = INDEX_DTYPE if nc * nc < np.iinfo(np.int32).max else jnp.int64
    dst = jnp.asarray(np.concatenate(dst_l), dst_dtype)
    zsrc = jnp.asarray(np.concatenate(src_l), INDEX_DTYPE)
    return color, Bn, d, cm, zsrc, dst, nc


def _device_coarse_matrix_probing(
    soa, material32, free_mask, coords, agg, dvec, n_agg, modes, conn,
    pool=None,
):
    """Galerkin coarse matrix Ac = P^T (M K M) P assembled ON DEVICE by
    graph-coloring probing: one masked f32 tangent-action probe (the SAME
    `ops.soa` matvec PCG uses, frozen at u=0) per (color of the aggregate
    distance-2 graph, mode), restricted per aggregate and attributed to
    columns via the precomputed neighbor map. Replaces the host sparse
    assembly on the hot setup path: ~n_colors*modes device matvecs (tens)
    instead of a 210M-entry host sparse product (BENCH_NOTES has the
    measured setup progression).

    Exactness: the hyperelastic tangent at u=0 IS linear elasticity (see
    `build_coarse_space`), and the distance-2 coloring guarantees every
    probe response block comes from exactly one excited aggregate, so this
    equals `_host_coarse_matrix`/`_host_coarse_matrix_rbm` up to f32
    arithmetic (guarded by tests/test_multilevel.py::
    test_probing_coarse_matches_host).
    """
    import os as _os
    import sys as _sys
    import time as _time

    _timing = _os.environ.get("FEA_SETUP_TIMING")
    _t0 = _time.perf_counter()
    N = len(agg)
    color, Bn, d, cm, zsrc, dst, nc = _probe_plan(conn, agg, n_agg, modes, dvec)
    if _timing:
        print(
            f"[setup]   probe plan (host): {_time.perf_counter() - _t0:.1f}s"
            f" ({cm.shape[0]} probes)",
            file=_sys.stderr, flush=True,
        )
        _t0 = _time.perf_counter()
    # jitted: the eager SoA freeze costs ~30 ms tunnel dispatch per unrolled
    # op (hundreds of ops at TET10 q=4 — measured 19 s eager vs ~1 s jitted)
    state0 = _soa_freeze_jit(soa, material32, jnp.zeros((3, N), jnp.float32))
    Z = _probe_run(
        soa,
        state0,
        jnp.asarray(np.asarray(free_mask), jnp.float32),
        jnp.asarray(agg, INDEX_DTYPE),
        jnp.asarray(Bn),
        jnp.asarray(d),
        jnp.asarray(color[agg], INDEX_DTYPE),
        jnp.asarray(cm),
        n_agg=n_agg,
        modes=modes,
        pool=pool,
    )  # device-resident [n_colors*modes, n_agg, modes]; layout (c, m, B, n)
    if _timing:
        Z = jax.block_until_ready(Z)
        print(
            f"[setup]   freeze+probe run (device): "
            f"{_time.perf_counter() - _t0:.1f}s",
            file=_sys.stderr, flush=True,
        )

    # ON-DEVICE dense assembly: materializing Ac on host costs a [nc, nc]
    # f64 buffer (2.2 GB at the default 1M-DOF operating point) plus a
    # ~1 GB host->device transfer over the tunnel — the dominant setup
    # cost after probing. Instead scatter the (small) probe-response stack
    # Z straight into the device-resident dense matrix: host only builds
    # the index vectors (a few MB, precomputed in `_probe_plan`).
    return _assemble_dense_coarse(Z.reshape(-1), zsrc, dst, nc=nc)


@functools.partial(jax.jit, static_argnames=("nc",))
def _assemble_dense_coarse(z_flat, src, dst, *, nc: int):
    """Scatter probe responses into the dense [nc, nc] coarse matrix and
    symmetrize, all on device. Each (row, col) entry is written by exactly
    one probe (distance-2 coloring invariant), so add-into-zeros == set.
    Probing fills (B, A) and (A, B) from different probes: symmetrizing
    averages the f32 noise away so the f32 Cholesky sees an exactly
    symmetric matrix."""
    flat = jnp.zeros((nc * nc,), z_flat.dtype).at[dst].add(
        z_flat[src], indices_are_sorted=False, unique_indices=True
    )
    Ac = flat.reshape(nc, nc)
    return 0.5 * (Ac + Ac.T)


@jax.jit
def _ridge_and_factor(Ac):
    """BC ridge + Cholesky on device (see build_coarse_space)."""
    d = jnp.diagonal(Ac)
    fix = (d <= 0.0).astype(Ac.dtype)
    ridge = fix + 1e-8 * jnp.maximum(d.max(), 1.0)
    return jsl.cho_factor(Ac + jnp.diag(ridge), lower=True)[0]


def _invert_factor(chol, block: int = 2048):
    """Explicit Ac^{-1} from the Cholesky factor (setup-time), SYMMETRIC
    by construction: Ac^{-1} = (L^{-1})^T (L^{-1}) formed as one Gram
    matmul — CG requires a symmetric preconditioner, and the Gram form
    computes [i,j] and [j,i] as the same reduction of the same products
    (no 0.5*(X+X^T) pass, no transpose temp). Turns every coarse apply
    into one dense matvec (see CoarseSpace.coarse_solve).

    L^{-1} is built in COLUMN BLOCKS of the identity (ONE triangular
    solve per block — half the flops of the previous per-block cho_solve)
    written into a preallocated buffer under `fori_loop`: a single solve
    against the full [n, n] identity materializes ~0.9 GB panel temps at
    n~16k (several live at once — OOM'd next to the 1M-DOF SoA tables on
    the 16 GB v5e), and the previous lax.map-stack + moveaxis + explicit
    symmetrization peaked at 28.8 GB at n~30k (the 4M-DOF default coarse
    size — BENCH_NOTES round 3). Peak is now factor + L^{-1} + result.
    The Gram matmul runs at HIGHEST precision: a bf16 MXU pass here
    would erode the preconditioner the triangular solves built in f32."""
    n = chol.shape[0]
    nb = -(-n // block)

    def body(i, buf):
        cols = i * block + jnp.arange(block)
        eye_blk = (jnp.arange(n)[:, None] == cols[None, :]).astype(chol.dtype)
        blk = jsl.solve_triangular(chol, eye_blk, lower=True)
        return jax.lax.dynamic_update_slice(buf, blk, (0, i * block))

    linv = jax.lax.fori_loop(
        0, nb, body, jnp.zeros((n, nb * block), chol.dtype)
    )[:, :n]
    return jnp.matmul(linv.T, linv, precision=jax.lax.Precision.HIGHEST)


def _store_acinv(acinv, dtype):
    """Storage precision of the explicit coarse inverse. On the TPU f32
    path it is held in bf16: the apply is bandwidth-bound (dim^2 * 4B
    streamed per CG iteration — 430 MB at the 1M-DOF headline dim 10368)
    and the inverse is a PRECONDITIONER, so bf16 rounding (rel ~4e-3 on a
    symmetric matrix, symmetry preserved elementwise) perturbs M, never
    the CG fixed point. Measured at 1M DOF (round 4): IDENTICAL EW
    iteration trajectory, 0.0839 -> 0.0775 s/step. The f64 parity path
    and CPU backends keep full precision."""
    from fea_large_tpu.config import on_tpu

    if acinv.dtype == jnp.float32 and dtype == jnp.float32 and on_tpu():
        return acinv.astype(jnp.bfloat16)
    return acinv


def build_coarse_space(
    mesh,
    material,
    bc,
    agg_size: int | None = None,
    dtype=jnp.float32,
    modes: int = 3,
    soa=None,
) -> CoarseSpace:
    """Assemble + factor the coarse operator at the reference state u=0.

    At u=0 both shipped hyperelastic tangents reduce EXACTLY to isotropic
    linear elasticity (S=0, C=I, so alpha=lam, A=I, beta=2mu in the
    factored form - SURVEY.md §5.4), so the frozen coarse matrix is

      Ke0[a,i,b,k] = sum_q V [lam g_a[i] g_b[k]
                              + mu (d_ik g_a.g_b + g_a[k] g_b[i])]

    Two assembly paths:
      * `soa` given (an `ops.soa.SoAProblem` for this mesh, f32): ON-DEVICE
        graph-coloring probing of the masked tangent action
        (`_device_coarse_matrix_probing`) — the production path: tens of
        device matvecs instead of a host sparse product.
      * `soa=None`: host scipy-sparse Galerkin product P^T (M K0 M) P
        (`_host_k0_csr`) — the f64 oracle path, also used by the sharded
        builder (cold path - SURVEY.md §4.5).
    Either way the dense coarse matrix is BC-ridged and Cholesky-factored
    once on device.

    `modes=6` builds the rigid-body-mode coarse basis (CoarseSpace
    docstring) with a default target of ~2500 aggregates so the dense
    factor stays the same size as the 3-mode default (~15k dofs).
    """
    if modes not in (3, 6, 12):
        raise ValueError(f"coarse modes must be 3, 6 or 12, got {modes}")
    if modes == 12 and soa is None:
        raise ValueError(
            "coarse_modes=12 (EXPERIMENTAL rigid-body + linear-strain basis)"
            " is assembled by on-device probing only — pass soa"
        )
    coords = mesh.coords_host
    pool = None
    st = getattr(mesh, "structure", None)
    if agg_size is None:
        agg_size = default_agg_size(
            # match the dense-factor size across bases: modes*Nc ~ 15k
            mesh.n_nodes,
            target_coarse={3: 5000, 6: 2500, 12: 1250}[modes],
            structured=st is not None,
        )
    if st is not None:
        # lattice-block aggregation: same coarse-space construction, but
        # the transfer operators evaluate as per-class reshape-sums /
        # broadcasts (ops/pooling.py) — no indexed ops in the coarse apply
        from fea_large_tpu.ops.pooling import make_lattice_pool

        pool = make_lattice_pool(st, max(1, mesh.n_nodes // agg_size))
        agg = pool.agg_host()
    else:
        agg = aggregate_nodes(coords, agg_size)
    n_agg = int(agg.max()) + 1
    perm = np.argsort(agg, kind="stable")

    lam = float(material.lam)
    mu = float(material.mu)
    free_mask = np.asarray(bc.free_mask)
    dvec = None
    buckets = None
    cent = None
    if modes >= 6:
        cnt = np.bincount(agg, minlength=n_agg).astype(float)
        cent = np.stack(
            [
                np.bincount(agg, weights=coords[:, d], minlength=n_agg) / cnt
                for d in range(3)
            ],
            axis=1,
        )
        dvec_np = _rbm_dvec(coords, agg, cent, n_agg)
        dvec = jnp.asarray(dvec_np, jnp.float32)
        if pool is None:  # pooled transfer needs no bucket maps
            from fea_large_tpu.ops.soa import ScatterBuckets

            buckets = ScatterBuckets.build(agg[None, :], n_agg)
    else:
        dvec_np = None
    import time as _time

    _t_plan = _time.perf_counter()
    if soa is not None:
        material32 = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), material
        )
        Ac = _device_coarse_matrix_probing(
            soa, material32, bc.free_mask, coords, agg, dvec_np, n_agg,
            modes, mesh.conn_host, pool=pool,
        )
        Ac = jax.block_until_ready(Ac)
    elif modes == 3:
        Ac = _host_coarse_matrix(mesh, lam, mu, agg, n_agg, free_mask)
    else:
        Ac = _host_coarse_matrix_rbm(
            mesh, lam, mu, agg, dvec_np, n_agg, free_mask
        )

    # fully-fixed aggregate components have empty rows: unit diagonal (plus
    # a tiny ridge so f32 Cholesky stays robust). The probing path keeps Ac
    # on device end-to-end (ridge + factor in one jitted program — no
    # [nc, nc] host buffer or tunnel transfer); host paths ridge in numpy.
    # If the on-device inverse build exhausts HBM (the v5e feasibility
    # boundary sits just above coarse dim ~16.5k — BENCH_NOTES round 3),
    # fall back to a host LAPACK build instead of crashing: the same Gram
    # form at setup time, one tunnel round trip of the [nc, nc] matrix.
    # FEA_COARSE_INVERT=host forces the fallback (bench/regression use).
    import os

    _t_ac = _time.perf_counter()
    force_host = os.environ.get("FEA_COARSE_INVERT") == "host"
    if isinstance(Ac, jnp.ndarray):
        if force_host:
            acinv = _host_invert_coarse(np.asarray(Ac), dtype)
        else:
            try:
                acinv = jax.block_until_ready(
                    jax.jit(lambda a: _invert_factor(_ridge_and_factor(a)))(
                        Ac.astype(dtype)
                    )
                )
            except Exception as e:  # XlaRuntimeError has no stable import
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                acinv = _host_invert_coarse(np.asarray(Ac), dtype)
    else:
        if force_host:
            acinv = _host_invert_coarse(np.asarray(Ac), dtype)
        else:
            d = np.diagonal(Ac)
            fix = (d <= 0.0).astype(Ac.dtype)
            Ac = Ac + np.diag(fix + 1e-8 * max(d.max(), 1.0))
            acinv = jax.jit(
                lambda a: _invert_factor(jsl.cho_factor(a, lower=True)[0])
            )(jnp.asarray(Ac, dtype))
    if os.environ.get("FEA_SETUP_TIMING"):
        acinv = jax.block_until_ready(acinv)
        _t_inv = _time.perf_counter()
        import sys as _sys

        print(
            f"[setup] coarse: probe+assemble {_t_ac - _t_plan:.1f}s, "
            f"invert {_t_inv - _t_ac:.1f}s (nc={modes * n_agg})",
            file=_sys.stderr, flush=True,
        )
    return CoarseSpace(
        agg=jnp.asarray(agg, INDEX_DTYPE),
        perm=jnp.asarray(perm, INDEX_DTYPE),
        segids=jnp.asarray(agg[perm], INDEX_DTYPE),
        acinv=_store_acinv(acinv, dtype),
        dvec=dvec,
        dvec_T=None if dvec_np is None else jnp.asarray(dvec_np.T, jnp.float32),
        buckets=buckets,
        n_agg=n_agg,
        modes=modes,
        pool=pool,
    )


def _host_invert_coarse(Ac_np, dtype):
    """Host/device split mirror of ridge + Cholesky + `_invert_factor`:
    the setup fallback for coarse dimensions whose fully-on-device
    explicit-inverse build exceeds HBM (that build needs factor +
    identity column blocks + Gram result simultaneously; the v5e
    boundary is just above dim 16.5k). Same ridge, same symmetric Gram
    form (L^-T)(L^-1).

    Split by what each side is good at on this machine (single host
    core): LAPACK potrf + trtri on host (n^3/3 triangular inverse — the
    identity-solve form costs 3x that), then the n^3 Gram matmul ON
    DEVICE, where it is seconds and peaks at only ~3 [nc, nc] buffers
    (vs ~6+temps for the fused build). Compute dtype follows `dtype`
    (the preconditioner tolerates f32 — CoarseSpace.coarse_solve)."""
    import scipy.linalg as sla
    from scipy.linalg import lapack

    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    A = np.asarray(Ac_np, np_dtype)
    d = np.diagonal(A)
    fix = (d <= 0.0).astype(A.dtype)
    A = A + np.diag(fix + np_dtype(1e-8) * max(float(d.max()), 1.0))
    L = sla.cholesky(A, lower=True)
    del A
    trtri = lapack.dtrtri if np_dtype == np.float64 else lapack.strtri
    linv, info = trtri(L, lower=1, overwrite_c=1)
    if info != 0:  # singular/ill-conditioned: the slow-but-robust form
        linv = sla.solve_triangular(
            L, np.eye(L.shape[0], dtype=np_dtype), lower=True
        )
    del L
    return jax.jit(
        lambda m: jnp.matmul(m.T, m, precision=jax.lax.Precision.HIGHEST)
    )(jnp.asarray(linv, dtype))


def _coarse_entry_chunks(mesh, lam, mu, agg, free_mask, chunk=65536):
    """Yield (slot_agg [e, nslots], blk [e, s, t, 3, 3], pair_valid) chunks
    of the aggregated masked linear-elastic tangent at u=0.

    Factored form: the masked element tangent aggregates EXACTLY through
    per-(element, aggregate) sums w_A[i,J] = sum_{a in A} m[a,i] g_a[J]:

      Ac[A,i,B,k] += sum_q V [ lam w_A[i,i] w_B[k,k]
                             + mu d_ik sum_J w_A[i,J] w_B[k,J]
                             + mu w_A[i,k] w_B[k,i] ]

    Elements touch only 1-4 aggregates, so this is ~25x less work than
    materializing the [npe*3, npe*3] element tangents.
    """
    elem = mesh.element
    coords, conn = mesh.coords_host, mesh.conn_host
    dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
    wq = np.asarray(elem.quad_weights)
    E, npe = conn.shape
    nq = dN.shape[0]
    for s0 in range(0, E, chunk):
        c = conn[s0 : s0 + chunk]
        e = len(c)
        Xe = coords[c]
        J = np.einsum("eai,qaj->eqij", Xe, dN)
        from fea_large_tpu.ops.soa import _np_inv_det_3x3

        detJ, Jinv = _np_inv_det_3x3(J)
        g = np.einsum("qaj,eqji->eqai", dN, Jinv)  # [e,q,npe,3]
        V = detJ * wq[None, :]  # [e, q]
        m = free_mask[c]  # [e, npe, 3]

        # local aggregate slots per element
        agg_e = agg[c]  # [e, npe]
        sidx = np.argsort(agg_e, axis=1, kind="stable")
        sa = np.take_along_axis(agg_e, sidx, 1)
        newgrp = np.ones_like(sa, bool)
        newgrp[:, 1:] = sa[:, 1:] != sa[:, :-1]
        slot_sorted = np.cumsum(newgrp, axis=1) - 1
        nslots = int(slot_sorted.max()) + 1
        slot_of_a = np.empty_like(slot_sorted)
        np.put_along_axis(slot_of_a, sidx, slot_sorted, 1)
        rows = np.arange(e)
        slot_agg = np.zeros((e, nslots), np.int64)
        valid = np.zeros((e, nslots), bool)
        slot_agg[rows[:, None], slot_of_a] = agg_e
        valid[rows[:, None], slot_of_a] = True

        # w[e, s, q, i, J] = sum_{a in slot s} m[a, i] g[q, a, J]
        w = np.zeros((e, nslots, nq, 3, 3))
        for a in range(npe):
            w[rows, slot_of_a[:, a]] += (
                m[:, a, None, :, None] * g[:, :, a, None, :]
            )
        Vw = w * V[:, None, :, None, None]
        wd = np.einsum("esqii->esqi", w)  # diagonal w_A[i,i]
        Vwd = np.einsum("esqii->esqi", Vw)

        blk = (
            lam * np.einsum("esqi,etqk->estik", Vwd, wd)
            + mu * np.einsum("esqik,etqki->estik", Vw, w)
        )
        d2 = mu * np.einsum("esqiJ,etqiJ->esti", Vw, w)
        ii = np.arange(3)
        blk[..., ii, ii] += d2

        pair_valid = valid[:, :, None] & valid[:, None, :]
        blk = blk * pair_valid[..., None, None]
        yield slot_agg, blk, pair_valid


def _host_k0_csr(mesh, lam, mu, free_mask, chunk=32768):
    """Masked global linear-elastic stiffness at u=0 as a scipy CSR matrix
    (f64 data, int32 indices). One-time cold path feeding the Galerkin
    coarse products below; scipy's C++ COO->CSR duplicate-sum replaces the
    earlier per-chunk dense-bincount accumulation (measured 475 s -> tens
    of seconds at 1M DOF — the dominant setup cost, BENCH_NOTES.md)."""
    import scipy.sparse as sp

    elem = mesh.element
    coords, conn = mesh.coords_host, mesh.conn_host
    dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
    w = np.asarray(elem.quad_weights)
    E, npe = conn.shape
    n3 = 3 * mesh.n_nodes
    eye = np.eye(3)
    # accumulate a CSR per chunk: peak host memory is one chunk's COO
    # triplets (~chunk*(3*npe)^2*16 B) plus the running CSR, instead of
    # every chunk's triplets at once (~14 GB at 4M-DOF TET10 — round-2
    # advisor finding)
    K = sp.csr_matrix((n3, n3))
    for s in range(0, E, chunk):
        c = conn[s : s + chunk]
        e = len(c)
        Xe = coords[c]
        J = np.einsum("eai,qaj->eqij", Xe, dN)
        from fea_large_tpu.ops.soa import _np_inv_det_3x3

        detJ, Jinv = _np_inv_det_3x3(J)
        g = np.einsum("qaj,eqji->eqai", dN, Jinv)  # [e,q,npe,3]
        V = detJ * w[None, :]
        gV = g * V[:, :, None, None]
        # linear-elastic element tangent at u=0 (both shipped hyperelastic
        # tangents reduce to this — build_coarse_space docstring)
        gg = np.einsum("eqai,eqbi->eab", gV, g)
        Ke = (
            lam * np.einsum("eqai,eqbk->eaibk", gV, g)
            + mu * np.einsum("eab,ik->eaibk", gg, eye)
            + mu * np.einsum("eqak,eqbi->eaibk", gV, g)
        )
        m = free_mask[c]  # [e, npe, 3]
        Ke *= m[:, :, :, None, None] * m[:, None, None, :, :]
        dof = (3 * c[:, :, None] + np.arange(3)).reshape(e, 3 * npe)
        rows = (
            np.broadcast_to(dof[:, :, None], (e, 3 * npe, 3 * npe))
            .reshape(-1).astype(np.int32)
        )
        cols = (
            np.broadcast_to(dof[:, None, :], (e, 3 * npe, 3 * npe))
            .reshape(-1).astype(np.int32)
        )
        K = K + sp.coo_matrix(
            (Ke.reshape(-1), (rows, cols)), shape=(n3, n3)
        ).tocsr()
    return K


def _prolongator_csr(coords, agg, n_agg, modes, dvec=None):
    """Sparse prolongator P [3N, modes*Nc]: per node the 3 x modes block
    B_n = I (modes=3) or [I | cross-matrix(d_n)] (modes=6, d_n the
    normalized rotational arm `_rbm_dvec` — CoarseSpace docstring)."""
    import scipy.sparse as sp

    N = len(agg)
    node = np.arange(N)
    rows = [3 * node, 3 * node + 1, 3 * node + 2]
    cols = [modes * agg, modes * agg + 1, modes * agg + 2]
    vals = [np.ones(N), np.ones(N), np.ones(N)]
    if modes == 6:
        d = dvec
        # (e_k x d)_i entries: B[1,3]=-dz B[2,3]=dy B[0,4]=dz B[2,4]=-dx
        # B[0,5]=-dy B[1,5]=dx
        for i, m, v in (
            (1, 3, -d[:, 2]), (2, 3, d[:, 1]),
            (0, 4, d[:, 2]), (2, 4, -d[:, 0]),
            (0, 5, -d[:, 1]), (1, 5, d[:, 0]),
        ):
            rows.append(3 * node + i)
            cols.append(6 * agg + m)
            vals.append(v)
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(3 * N, modes * n_agg),
    ).tocsr()


def _host_coarse_matrix_rbm(mesh, lam, mu, agg, dvec, n_agg, free_mask):
    """Dense [6Nc, 6Nc] Galerkin coarse matrix P^T (M K0 M) P for the RBM
    basis (normalized arms `dvec`), via sparse products (scipy C++ — see
    `_host_k0_csr`)."""
    K = _host_k0_csr(mesh, lam, mu, free_mask)
    P = _prolongator_csr(mesh.coords_host, agg, n_agg, 6, dvec)
    return np.asarray((P.T @ (K @ P)).todense())


def _host_coarse_matrix(mesh, lam, mu, agg, n_agg, free_mask, chunk=65536):
    """Dense [3Nc, 3Nc] Galerkin coarse matrix P^T (M K0 M) P (sparse
    products — see `_host_k0_csr`)."""
    K = _host_k0_csr(mesh, lam, mu, free_mask, chunk=chunk)
    P = _prolongator_csr(mesh.coords_host, agg, n_agg, 3)
    return np.asarray((P.T @ (K @ P)).todense())


def _host_coarse_matrix_reference(mesh, lam, mu, agg, n_agg, free_mask, chunk=8192):
    """Direct (unfactored) assembly — test oracle for `_host_coarse_matrix`."""
    elem = mesh.element
    coords, conn = mesh.coords_host, mesh.conn_host
    dN = np.asarray(elem.shape_grad)  # [q, npe, 3]
    w = np.asarray(elem.quad_weights)
    E, npe = conn.shape
    nc3 = 3 * n_agg
    Ac = np.zeros(nc3 * nc3)
    eye = np.eye(3)
    for s in range(0, E, chunk):
        c = conn[s : s + chunk]
        Xe = coords[c]
        J = np.einsum("eai,qaj->eqij", Xe, dN)
        from fea_large_tpu.ops.soa import _np_inv_det_3x3

        detJ, Jinv = _np_inv_det_3x3(J)
        g = np.einsum("qaj,eqji->eqai", dN, Jinv)  # [e,q,npe,3]
        V = detJ * w[None, :]
        gV = g * V[:, :, None, None]
        # linear-elastic element tangent at u=0 (docstring formula)
        gg = np.einsum("eqai,eqbi->eab", gV, g)
        Ke = (
            lam * np.einsum("eqai,eqbk->eaibk", gV, g)
            + mu * np.einsum("eab,ik->eaibk", gg, eye)
            + mu * np.einsum("eqak,eqbi->eaibk", gV, g)
        )
        # BC masking: entry (node_a, i), (node_b, k) *= m_a_i m_b_k
        m = free_mask[c]  # [e, npe, 3]
        Ke *= m[:, :, :, None, None] * m[:, None, None, :, :]
        # coarse DOF ids and flat keys
        cdof = (3 * agg[c][:, :, None] + np.arange(3)).reshape(len(c), 3 * npe)
        keys = (cdof[:, :, None] * nc3 + cdof[:, None, :]).reshape(-1)
        Ac += np.bincount(keys, weights=Ke.reshape(-1), minlength=nc3 * nc3)
    return Ac.reshape(nc3, nc3)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MultilevelSpace:
    """Three-level additive (BPX-style) correction:

        M_c r = P1 [ Dc1^{-1} + P2 Ac2^{-1} P2^T ] P1^T r

    with a LARGE mid level (aggregates of ~16 nodes, Nc1 ~ N/16) solved only
    by its block diagonal, telescoped onto a small dense-Cholesky level
    (Nc2 ~ thousands). All three terms are fixed SPD linear operators, so CG
    theory still applies; the apply adds only O(Nc1) work over two levels.
    """

    agg1: jnp.ndarray  # i32[N]
    perm1: jnp.ndarray  # i32[N]
    segids1: jnp.ndarray  # i32[N]
    dinv1: jnp.ndarray  # f32[Nc1, 3, 3] masked inverse diagonal blocks
    agg2: jnp.ndarray  # i32[Nc1]
    perm2: jnp.ndarray  # i32[Nc1]
    segids2: jnp.ndarray  # i32[Nc1]
    ac2inv: jnp.ndarray  # f32[3*Nc2, 3*Nc2] explicit inverse of Ac2
    n_agg1: int
    n_agg2: int

    def tree_flatten(self):
        return (
            (self.agg1, self.perm1, self.segids1, self.dinv1,
             self.agg2, self.perm2, self.segids2, self.ac2inv),
            (self.n_agg1, self.n_agg2),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        rc1 = jax.ops.segment_sum(
            r[self.perm1], self.segids1, num_segments=self.n_agg1,
            indices_are_sorted=True,
        )
        z1 = jnp.einsum("nij,nj->ni", self.dinv1.astype(r.dtype), rc1)
        rc2 = jax.ops.segment_sum(
            rc1[self.perm2], self.segids2, num_segments=self.n_agg2,
            indices_are_sorted=True,
        )
        x2 = (
            self.ac2inv @ rc2.reshape(-1).astype(self.ac2inv.dtype)
        ).reshape(self.n_agg2, 3).astype(r.dtype)
        zc1 = z1 + x2[self.agg2]
        return zc1[self.agg1]


def build_multilevel_space(
    mesh,
    material,
    bc,
    agg_size1: int = 16,
    target_coarse2: int = 2500,
    dtype=jnp.float32,
) -> MultilevelSpace:
    """Build the three-level hierarchy at the reference state (u=0), in one
    pass over the factored coarse-entry stream (host, cold path)."""
    coords = mesh.coords_host
    free_mask = np.asarray(bc.free_mask)
    lam, mu = float(material.lam), float(material.mu)

    agg1 = aggregate_nodes(coords, agg_size1)
    n1 = int(agg1.max()) + 1

    # level-2 aggregation of level-1 aggregate centroids
    cent = np.zeros((n1, 3))
    cnt = np.bincount(agg1, minlength=n1).astype(float)
    for d in range(3):
        cent[:, d] = np.bincount(agg1, weights=coords[:, d], minlength=n1) / cnt
    agg2 = aggregate_nodes(cent, max(1, n1 // max(target_coarse2, 1)))
    n2 = int(agg2.max()) + 1

    # Ac1 = P1^T (M K0 M) P1 as a sparse product (scipy C++ — see
    # `_host_k0_csr`; replaces the chunked einsum stream that dominated
    # three-level setup), then its 3x3 block diagonal and the dense
    # Ac2 = P2^T Ac1 P2
    import scipy.sparse as sp

    ii = np.arange(3)
    K = _host_k0_csr(mesh, lam, mu, free_mask)
    P1 = _prolongator_csr(coords, agg1, n1, 3)
    A1 = (P1.T @ (K @ P1)).tocsr()
    diag1 = np.zeros((n1, 3, 3))
    for i in range(3):
        rows = 3 * np.arange(n1) + i
        sub = A1[rows]
        for j in range(3):
            diag1[:, i, j] = np.asarray(
                sub[np.arange(n1), 3 * np.arange(n1) + j]
            ).reshape(-1)
    P2 = _prolongator_csr(cent, agg2, n2, 3)
    Ac2 = np.asarray((P2.T @ (A1 @ P2)).todense())

    # masked inversion of the level-1 diagonal blocks: rows/cols of inactive
    # (fully fixed) components become identity before the 3x3 inversion
    active = np.einsum("nii->ni", diag1) > 0.0
    outer = (active[:, :, None] & active[:, None, :]).astype(diag1.dtype)
    masked = diag1 * outer
    masked[:, ii, ii] += (~active).astype(diag1.dtype)
    dinv1 = np.linalg.inv(masked)

    d2 = np.diagonal(Ac2)
    fix2 = (d2 <= 0.0).astype(Ac2.dtype)
    Ac2 = Ac2 + np.diag(fix2 + 1e-8 * max(d2.max(), 1.0))
    ac2inv = jax.jit(
        lambda a: _invert_factor(jsl.cho_factor(a, lower=True)[0])
    )(jnp.asarray(Ac2, dtype))

    perm1 = np.argsort(agg1, kind="stable")
    perm2 = np.argsort(agg2, kind="stable")
    return MultilevelSpace(
        agg1=jnp.asarray(agg1, INDEX_DTYPE),
        perm1=jnp.asarray(perm1, INDEX_DTYPE),
        segids1=jnp.asarray(agg1[perm1], INDEX_DTYPE),
        dinv1=jnp.asarray(dinv1, dtype),
        agg2=jnp.asarray(agg2, INDEX_DTYPE),
        perm2=jnp.asarray(perm2, INDEX_DTYPE),
        segids2=jnp.asarray(agg2[perm2], INDEX_DTYPE),
        ac2inv=ac2inv,
        n_agg1=n1,
        n_agg2=n2,
    )


def two_level_preconditioner(coarse: CoarseSpace, jacobi_apply, free_mask):
    """Additive two-level apply: M^{-1} r = Jacobi(r) + M P Ac^{-1} P^T r
    (M = free-DOF mask, so the preconditioner is identity-compatible on
    fixed DOFs; both terms SPD on the free subspace)."""

    def apply(r):
        return jacobi_apply(r) + free_mask * coarse.apply(r)

    return apply
