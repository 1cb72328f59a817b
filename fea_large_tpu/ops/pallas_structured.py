"""Fused structured-lattice tangent action: one Pallas kernel per matvec.

Why this exists (round-4 measurement, BENCH_NOTES): the XLA slice/pad
structured matvec at 1M DOF compiles to ~155 separate fusions that
materialize hundreds of ~1 MB [E] intermediates — 6.75 GB of HBM traffic
per matvec (XLA cost analysis) against a ~160 MB information floor
(frozen state 119 MB + vectors), i.e. ~20 GB/s effective state bandwidth
on an ~800 GB/s-class chip. The per-cell element math is a long scalar
dependency chain XLA will not fuse into one pass; a single Pallas kernel
holds every temp in VMEM/registers and reads each operand exactly once.

Decomposition (the part that makes this kernel SIMPLE, unlike the
unstructured round-2 attempt that tied against XLA):

  * The spatially-coupled gather/scatter stay in XLA as the static
    class-grid slices / zero-padded adds of the structured fast path
    (`ops/soa.py`) — but collapsed to the ~27 distinct (class, offset)
    pairs, materializing one [3*P, C] cache (P pairs, C cells, ~14 MB).
  * The kernel blocks over the CELL axis only. Every input is elementwise
    in the cell index: the v-cache rows, and the frozen state reshaped
    [q*9*T, C] (the element axis E = T*C is tet-slot-major, so this is a
    free reshape). All T tet slots of a cell are processed in-kernel
    (statically unrolled Python loop — no dynamic slot index), and the
    per-slot nodal contributions are accumulated into the SAME (class,
    offset) output rows [3*P, C], so the epilogue pays P pads, not
    T*npe.
  * The slot-compressed geometry tables (q*npe*3*T + q*T floats,
    `SoAProblem.tables_host`) are baked as compile-time scalar constants
    — zero table traffic (the XLA path broadcasts them to [.., E]).

HBM traffic per matvec ~= state 119 MB + cache 2x14 MB + out 2x14 MB
+ prologue/epilogue grid ops — ~10x less than the XLA graph moves.

Spec lineage: same consistent-tangent action as `soa_apply_tangent`
(SURVEY.md §5.5); kernels run in interpret mode off-TPU
(`config.pallas_interpret`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fea_large_tpu.config import pallas_interpret

_I0 = np.int32(0)  # block-index maps must return i32 (see pallas_kernels)


def struct_pairs(st):
    """Ordered distinct (class, offset) pairs of the lattice connectivity
    and the per-(tet-slot, node-slot) pair index. P ~ 27 for TET10 Kuhn
    (vs T*npe = 60 slot pairs)."""
    pairs, index = [], {}
    pair_of = [[None] * st.npe for _ in range(st.n_tets)]
    for t in range(st.n_tets):
        for a in range(st.npe):
            key = (st.slot_class[t][a], st.slot_offset[t][a])
            if key not in index:
                index[key] = len(pairs)
                pairs.append(key)
            pair_of[t][a] = index[key]
    return pairs, pair_of


def _pair_slice(st, v, key):
    """v [N] -> [C] node values of one (class, offset) pair (static
    reshape + offset slice on the class grid — ops/soa.py fast path)."""
    nx, ny, nz = st.cells
    kc, o = key
    gx, gy, gz = st.class_dims[kc]
    b = st.class_base[kc]
    g = v[b : b + gx * gy * gz].reshape(gx, gy, gz)
    return g[o[0] : o[0] + nx, o[1] : o[1] + ny, o[2] : o[2] + nz].reshape(-1)


def _pair_pad(st, blk, key):
    """[C] cell sums of one pair -> its zero-padded class grid (the
    transpose of `_pair_slice`)."""
    nx, ny, nz = st.cells
    kc, o = key
    gx, gy, gz = st.class_dims[kc]
    return jnp.pad(
        blk.reshape(nx, ny, nz),
        ((o[0], gx - nx - o[0]), (o[1], gy - ny - o[1]), (o[2], gz - nz - o[2])),
    )


def _cell_split(C: int) -> tuple | None:
    """Factor the cell axis C = C1 * C2 for the kernel's [rows, C1, C2]
    layout. The lane dim C2 must DIVIDE C (full-width blocks; a partial
    lane block was measured to corrupt memory past the tile-padded buffer
    on the v5e), and the sublane block is pinned to 8: physical sublane
    padding is to multiples of 8, so the trailing partial block ends
    exactly at the padded extent — out-of-range sublanes are tile padding
    by construction, never foreign memory. C2 is chosen to minimize lane
    padding waste (roundup(C2, 128)/C2) over divisors with 8*C2 cells per
    block in a VMEM-friendly range; None -> caller falls back to XLA."""
    best = None
    d = 1
    while d * d <= C:
        if C % d == 0:
            for c2 in (d, C // d):
                if 64 <= c2 <= 512:
                    waste = (-(-c2 // 128) * 128) / c2
                    key = (waste, -c2)
                    if best is None or key < best[0]:
                        best = (key, c2)
        d += 1
    if best is None:
        return None
    c2 = best[1]
    return C // c2, c2


def _apply_kernel(q, npe, T, pair_of, gN, dV, nrows,
                  cache_ref, F_ref, S_ref, A_ref, al_ref, be_ref, out_ref):
    """One cell block: tangent action for ALL T tet slots, accumulated
    into (class, offset) rows. gN [q, npe, 3, T] / dV [q, T] are PYTHON
    float constants (folded by Mosaic); state rows are indexed
    r = (k*9 + 3i + j)*T + t (the [q,3,3,T,C] reshape)."""
    cache = cache_ref[:]   # [3P, BC]
    Fb = F_ref[:]          # [q*9*T, BC]
    Sb = S_ref[:]
    Ab = A_ref[:]
    al = al_ref[:]         # [q*T, BC]
    be = be_ref[:]

    # zero-init: a (pair, comp) row with no nonzero g terms must still be
    # a [BC] array for the final stack (empty Python sums yield int 0)
    acc = [jnp.zeros_like(cache[0])] * nrows
    for t in range(T):
        for k in range(q):
            def M(buf, i, j, _k=k, _t=t):
                return buf[(_k * 9 + 3 * i + j) * T + _t]

            g = [[gN[k][a][J][t] for J in range(3)] for a in range(npe)]
            V = dV[k][t]
            # dF_iJ = sum_a v[a,i] g_a[J] (g scalars; zero terms dropped)
            dF = [
                [
                    sum(
                        cache[3 * pair_of[t][a] + i] * g[a][J]
                        for a in range(npe)
                        if g[a][J] != 0.0
                    )
                    for J in range(3)
                ]
                for i in range(3)
            ]
            FtdF = [
                [
                    sum(M(Fb, m, i) * dF[m][j] for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            dE = [
                [0.5 * (FtdF[i][j] + FtdF[j][i]) for j in range(3)]
                for i in range(3)
            ]
            AdE = sum(
                M(Ab, i, j) * dE[i][j] for i in range(3) for j in range(3)
            )
            AdEr = [
                [
                    sum(M(Ab, i, m) * dE[m][j] for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            AdEA = [
                [
                    sum(AdEr[i][m] * M(Ab, m, j) for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            kt = k * T + t
            dS = [
                [
                    al[kt] * AdE * M(Ab, i, j) + be[kt] * AdEA[i][j]
                    for j in range(3)
                ]
                for i in range(3)
            ]
            dPV = [
                [
                    (
                        sum(dF[i][m] * M(Sb, m, J) for m in range(3))
                        + sum(M(Fb, i, m) * dS[m][J] for m in range(3))
                    )
                    * V
                    for J in range(3)
                ]
                for i in range(3)
            ]
            for i in range(3):
                for a in range(npe):
                    c = sum(
                        dPV[i][J] * g[a][J]
                        for J in range(3)
                        if g[a][J] != 0.0
                    )
                    r = 3 * pair_of[t][a] + i
                    acc[r] = acc[r] + c
    out_ref[:] = jnp.stack(acc)


@functools.partial(
    jax.jit, static_argnames=("structure", "tables_host", "q", "npe")
)
def _struct_apply(structure, tables_host, q, npe, state_F, state_S, state_A,
                  state_alpha, state_beta, v_T):
    st = structure
    T, C = st.n_tets, st.n_cells
    pairs, pair_of = struct_pairs(st)
    P = len(pairs)
    dtype = v_T.dtype
    gN, dV = tables_host

    cache = jnp.stack(
        [_pair_slice(st, v_T[i], key) for key in pairs for i in range(3)]
    )  # rows 3*pi + i

    C1, C2 = _cell_split(C)

    def rows(x, lead):
        # [q,...,E] -> [lead*T, C1, C2] (free reshapes; E is t-major)
        return x.reshape(lead * T, C1, C2)

    tiled = (
        cache.reshape(3 * P, C1, C2),
        rows(state_F, q * 9),
        rows(state_S, q * 9),
        rows(state_A, q * 9),
        rows(state_alpha, q),
        rows(state_beta, q),
    )
    kern = functools.partial(
        _apply_kernel, q, npe, T, tuple(map(tuple, pair_of)), gN, dV, 3 * P
    )
    (out,) = _tiled_call(kern, tiled, (), (3 * P,), C1, C2, dtype)
    return _scatter_pairs(st, pairs, out, 3)


def _tiled_call(kern, tiled, scalars, out_rows, C1, C2, dtype):
    """Run `kern` over the cell grid with EXACT-FIT blocks only: (rows,
    b1, C2) with b1*grid == the C1 extent. Partial blocks are NOT safe on
    this backend — a trailing block reaching past the tile-padded buffer
    was measured to corrupt output (round 4) — so an 8-sublane body grid
    covers [0, 8*(C1//8)) with no input slicing, and the sublane tail
    runs as its own exact single-block call on a small sliced copy.

    tiled:    [rows, C1, C2] arrays, blocked along C1;
    scalars:  (array, BlockSpec) pairs appended verbatim (e.g. (1,1)
              material constants);
    out_rows: row count per output ([rows, C1, C2] each).
    Returns the outputs reshaped to [rows, C1*C2]."""

    def call(arrs, b1, grid):
        def spec(r):
            return pl.BlockSpec(
                (r, b1, C2), lambda i: (_I0, i, _I0),
                memory_space=pltpu.VMEM,
            )

        outs = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((r, b1 * grid, C2), dtype)
                for r in out_rows
            ],
            grid=(grid,),
            in_specs=[spec(a.shape[0]) for a in arrs]
            + [s for _, s in scalars],
            out_specs=[spec(r) for r in out_rows],
            # Mosaic's liveness bound over the big unrolled body
            # over-reserves scratch stack vs the 16 MB default scoped
            # limit; the real working set fits comfortably
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=pallas_interpret(),
        )(*arrs, *[a for a, _ in scalars])
        return list(outs)

    k8 = (C1 // 8) * 8
    parts = []
    if k8:
        parts.append(call(tiled, 8, k8 // 8))
    if C1 - k8:
        tail = tuple(x[:, k8:, :] for x in tiled)
        parts.append(call(tail, C1 - k8, 1))
    if len(parts) == 1:
        outs = parts[0]
    else:
        outs = [
            jnp.concatenate((a, b), axis=1)
            for a, b in zip(parts[0], parts[1])
        ]
    return [o.reshape(o.shape[0], C1 * C2) for o in outs]


def _gather_cache(st, pairs, v_T, C1, C2):
    """[n_comp, N] -> [n_comp*P, C1, C2] stacked pair slices (rows
    n_comp*pi + i)."""
    n_comp = v_T.shape[0]
    return jnp.stack(
        [
            _pair_slice(st, v_T[i], key)
            for key in pairs
            for i in range(n_comp)
        ]
    ).reshape(len(pairs) * n_comp, C1, C2)


def _scatter_pairs(st, pairs, out, n_comp):
    """[n_comp*P, C] pair-channel cell sums -> [n_comp, N] nodal sums via
    per-class zero-padded adds (rows n_comp*pi + i)."""
    comps = []
    for i in range(n_comp):
        acc = [None] * len(st.classes)
        for pi, key in enumerate(pairs):
            g = _pair_pad(st, out[n_comp * pi + i], key)
            kc = key[0]
            acc[kc] = g if acc[kc] is None else acc[kc] + g
        comps.append(jnp.concatenate([g.reshape(-1) for g in acc]))
    return jnp.stack(comps)


def struct_pallas_supported(p) -> bool:
    """True when the fused kernel applies: structured-uniform tables
    present and the cell count admits the safe [C1, C2] split."""
    return (
        p.structure is not None
        and p.tables_host is not None
        and _cell_split(p.structure.n_cells) is not None
    )


def soa_apply_tangent_struct_pallas(p, state, v_T):
    """Drop-in structured-lattice variant of `soa_apply_tangent` —
    requires `struct_pallas_supported(p)` (SoAProblem.build sets the
    static tables on uniform lattices). Returns [3, N]."""
    assert struct_pallas_supported(p)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    return _struct_apply(
        p.structure, p.tables_host, q, npe,
        state.F, state.S, state.A, state.alpha, state.beta, v_T,
    )


# ---------------------------------------------------------------------------
# fused internal force (f_int from the frozen state)
# ---------------------------------------------------------------------------


def _force_kernel(q, npe, T, pair_of, gN, dV, nrows,
                  F_ref, S_ref, out_ref):
    """fe[a,i] = sum_q V (F S)_iJ g_a[J], accumulated into (class,
    offset) pair rows — the structured mirror of soa_internal_force."""
    Fb = F_ref[:]
    Sb = S_ref[:]
    zero = jnp.zeros(Fb.shape[1:], Fb.dtype)
    acc = [zero] * nrows
    for t in range(T):
        for k in range(q):
            def M(buf, i, j, _k=k, _t=t):
                return buf[(_k * 9 + 3 * i + j) * T + _t]

            g = [[gN[k][a][J][t] for J in range(3)] for a in range(npe)]
            V = dV[k][t]
            PV = [
                [
                    sum(M(Fb, i, m) * M(Sb, m, J) for m in range(3)) * V
                    for J in range(3)
                ]
                for i in range(3)
            ]
            for i in range(3):
                for a in range(npe):
                    c = sum(
                        PV[i][J] * g[a][J]
                        for J in range(3)
                        if g[a][J] != 0.0
                    )
                    acc[3 * pair_of[t][a] + i] = (
                        acc[3 * pair_of[t][a] + i] + c
                    )
    out_ref[:] = jnp.stack(acc)


@functools.partial(
    jax.jit, static_argnames=("structure", "tables_host", "q", "npe")
)
def _struct_force(structure, tables_host, q, npe, state_F, state_S):
    st = structure
    T, C = st.n_tets, st.n_cells
    pairs, pair_of = struct_pairs(st)
    P = len(pairs)
    dtype = state_F.dtype
    gN, dV = tables_host
    C1, C2 = _cell_split(C)
    tiled = (
        state_F.reshape(q * 9 * T, C1, C2),
        state_S.reshape(q * 9 * T, C1, C2),
    )
    kern = functools.partial(
        _force_kernel, q, npe, T, tuple(map(tuple, pair_of)), gN, dV, 3 * P
    )
    (out,) = _tiled_call(kern, tiled, (), (3 * P,), C1, C2, dtype)
    return _scatter_pairs(st, pairs, out, 3)


def soa_internal_force_struct_pallas(p, state):
    """Drop-in structured variant of `soa_internal_force`: [3, N]."""
    assert struct_pallas_supported(p)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    return _struct_force(
        p.structure, p.tables_host, q, npe, state.F, state.S
    )


# ---------------------------------------------------------------------------
# fused block-Jacobi diagonal blocks
# ---------------------------------------------------------------------------


def _diag_kernel(q, npe, T, pair_of, gN, dV, nrows,
                 F_ref, S_ref, A_ref, al_ref, be_ref, out_ref):
    """Nodal 3x3 diagonal blocks via the factored tangent (the structured
    mirror of soa_diag_blocks), accumulated into pair rows
    r = 9*pair + 3*i + kk."""
    Fb, Sb, Ab = F_ref[:], S_ref[:], A_ref[:]
    al, be = al_ref[:], be_ref[:]
    zero = jnp.zeros(Fb.shape[1:], Fb.dtype)
    acc = [zero] * nrows
    for t in range(T):
        for k in range(q):
            def M(buf, i, j, _k=k, _t=t):
                return buf[(_k * 9 + 3 * i + j) * T + _t]

            g = [[gN[k][a][J][t] for J in range(3)] for a in range(npe)]
            V = dV[k][t]
            kt = k * T + t
            FA = [
                [
                    sum(M(Fb, i, m) * M(Ab, m, j) for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            B = [
                [
                    sum(FA[i][m] * M(Fb, j, m) for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            w1 = (al[kt] + 0.5 * be[kt]) * V
            w2 = 0.5 * be[kt] * V
            for a in range(npe):
                ga = g[a]
                s_a = [
                    sum(FA[i][J] * ga[J] for J in range(3) if ga[J] != 0.0)
                    for i in range(3)
                ]
                Ag_a = [
                    sum(M(Ab, I, J) * ga[J] for J in range(3) if ga[J] != 0.0)
                    for I in range(3)
                ]
                G_aa = sum(
                    ga[I] * Ag_a[I] for I in range(3) if ga[I] != 0.0
                )
                Sg_a = [
                    sum(M(Sb, I, J) * ga[J] for J in range(3) if ga[J] != 0.0)
                    for I in range(3)
                ]
                geo = V * sum(
                    ga[I] * Sg_a[I] for I in range(3) if ga[I] != 0.0
                )
                base = 9 * pair_of[t][a]
                for i in range(3):
                    for kk in range(3):
                        term = w1 * s_a[i] * s_a[kk] + w2 * B[i][kk] * G_aa
                        if i == kk:
                            term = term + geo
                        acc[base + 3 * i + kk] = acc[base + 3 * i + kk] + term
    out_ref[:] = jnp.stack(acc)


@functools.partial(
    jax.jit, static_argnames=("structure", "tables_host", "q", "npe")
)
def _struct_diag(structure, tables_host, q, npe,
                 state_F, state_S, state_A, state_alpha, state_beta):
    st = structure
    T, C = st.n_tets, st.n_cells
    pairs, pair_of = struct_pairs(st)
    P = len(pairs)
    dtype = state_F.dtype
    gN, dV = tables_host
    C1, C2 = _cell_split(C)
    tiled = (
        state_F.reshape(q * 9 * T, C1, C2),
        state_S.reshape(q * 9 * T, C1, C2),
        state_A.reshape(q * 9 * T, C1, C2),
        state_alpha.reshape(q * T, C1, C2),
        state_beta.reshape(q * T, C1, C2),
    )
    kern = functools.partial(
        _diag_kernel, q, npe, T, tuple(map(tuple, pair_of)), gN, dV, 9 * P
    )
    (out,) = _tiled_call(kern, tiled, (), (9 * P,), C1, C2, dtype)
    return _scatter_pairs(st, pairs, out, 9).reshape(3, 3, -1)


def soa_diag_blocks_struct_pallas(p, state):
    """Drop-in structured variant of `soa_diag_blocks`: [3, 3, N]."""
    assert struct_pallas_supported(p)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    return _struct_diag(
        p.structure, p.tables_host, q, npe,
        state.F, state.S, state.A, state.alpha, state.beta,
    )


# ---------------------------------------------------------------------------
# fused kinematics + constitutive freeze
# ---------------------------------------------------------------------------


def _freeze_kernel(q, npe, T, pair_of, gN, kind, dtype,
                   cache_ref, lam_ref, mu_ref,
                   F_out, S_out, A_out, al_out, be_out):
    """Structured mirror of pallas_kernels._freeze_kernel: F = I + sum_a
    u_a (x) g_a; C = F^T F; factored tangent state of material `kind`
    (0=SVK, 1=NeoHookean Ciarlet, 2=NeoHookeanVolumetric). Output rows
    follow the [q,3,3,T,C] / [q,T,C] flattening of the state arrays."""
    cache = cache_ref[:]
    lam = lam_ref[0, 0]
    mu = mu_ref[0, 0]
    shape = cache.shape[1:]
    one = jnp.ones(shape, dtype)
    zero = jnp.zeros(shape, dtype)
    Frows = [None] * (q * 9 * T)
    Srows = [None] * (q * 9 * T)
    Arows = [None] * (q * 9 * T)
    alrows = [None] * (q * T)
    berows = [None] * (q * T)
    for t in range(T):
        ue = [
            [cache[3 * pair_of[t][a] + i] for a in range(npe)]
            for i in range(3)
        ]
        for k in range(q):
            g = [[gN[k][a][J][t] for J in range(3)] for a in range(npe)]
            F = [
                [
                    (one if i == J else zero)
                    + sum(
                        ue[i][a] * g[a][J]
                        for a in range(npe)
                        if g[a][J] != 0.0
                    )
                    for J in range(3)
                ]
                for i in range(3)
            ]
            Cm = [
                [
                    sum(F[m][i] * F[m][j] for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            if kind == 0:  # SVK
                trE = 0.5 * (Cm[0][0] + Cm[1][1] + Cm[2][2] - 3.0)
                S = [
                    [
                        lam * trE * (1.0 if i == j else 0.0)
                        + mu * (Cm[i][j] - (1.0 if i == j else 0.0))
                        for j in range(3)
                    ]
                    for i in range(3)
                ]
                A = [
                    [one if i == j else zero for j in range(3)]
                    for i in range(3)
                ]
                alpha, beta = lam * one, 2.0 * mu * one
            else:  # both neo-Hookean variants need C^-1 (adjugate)
                c = [[None] * 3 for _ in range(3)]
                c[0][0] = Cm[1][1] * Cm[2][2] - Cm[1][2] * Cm[2][1]
                c[0][1] = Cm[0][2] * Cm[2][1] - Cm[0][1] * Cm[2][2]
                c[0][2] = Cm[0][1] * Cm[1][2] - Cm[0][2] * Cm[1][1]
                c[1][0] = Cm[1][2] * Cm[2][0] - Cm[1][0] * Cm[2][2]
                c[1][1] = Cm[0][0] * Cm[2][2] - Cm[0][2] * Cm[2][0]
                c[1][2] = Cm[0][2] * Cm[1][0] - Cm[0][0] * Cm[1][2]
                c[2][0] = Cm[1][0] * Cm[2][1] - Cm[1][1] * Cm[2][0]
                c[2][1] = Cm[0][1] * Cm[2][0] - Cm[0][0] * Cm[2][1]
                c[2][2] = Cm[0][0] * Cm[1][1] - Cm[0][1] * Cm[1][0]
                detC = (
                    Cm[0][0] * c[0][0]
                    + Cm[0][1] * c[1][0]
                    + Cm[0][2] * c[2][0]
                )
                inv_det = 1.0 / detC
                A = [
                    [c[i][j] * inv_det for j in range(3)] for i in range(3)
                ]
                if kind == 1:  # Ciarlet: S = mu(I - Cinv) + lam lnJ Cinv
                    lnJ = 0.5 * jnp.log(detC)
                    S = [
                        [
                            mu * ((1.0 if i == j else 0.0) - A[i][j])
                            + lam * lnJ * A[i][j]
                            for j in range(3)
                        ]
                        for i in range(3)
                    ]
                    alpha, beta = lam * one, 2.0 * (mu - lam * lnJ)
                else:  # volumetric split: vol = lam J (J - 1)
                    J = jnp.sqrt(detC)
                    vol = lam * J * (J - 1.0)
                    S = [
                        [
                            mu * ((1.0 if i == j else 0.0) - A[i][j])
                            + vol * A[i][j]
                            for j in range(3)
                        ]
                        for i in range(3)
                    ]
                    alpha = lam * J * (2.0 * J - 1.0)
                    beta = 2.0 * (mu - vol)
            for i in range(3):
                for j in range(3):
                    r = (k * 9 + 3 * i + j) * T + t
                    Frows[r] = F[i][j]
                    Srows[r] = S[i][j]
                    Arows[r] = A[i][j] + zero
            kt = k * T + t
            alrows[kt] = alpha + zero
            berows[kt] = beta + zero
    F_out[:] = jnp.stack(Frows)
    S_out[:] = jnp.stack(Srows)
    A_out[:] = jnp.stack(Arows)
    al_out[:] = jnp.stack(alrows)
    be_out[:] = jnp.stack(berows)


@functools.partial(
    jax.jit,
    static_argnames=("structure", "tables_host", "q", "npe", "kind"),
)
def _struct_freeze(structure, tables_host, q, npe, kind, lam, mu, u_T):
    st = structure
    T, C = st.n_tets, st.n_cells
    pairs, pair_of = struct_pairs(st)
    dtype = u_T.dtype
    gN, _ = tables_host
    C1, C2 = _cell_split(C)
    cache = _gather_cache(st, pairs, u_T, C1, C2)
    sspec = pl.BlockSpec(
        (1, 1), lambda i: (_I0, _I0), memory_space=pltpu.VMEM
    )
    scalars = (
        (lam.astype(dtype).reshape(1, 1), sspec),
        (mu.astype(dtype).reshape(1, 1), sspec),
    )
    kern = functools.partial(
        _freeze_kernel, q, npe, T, tuple(map(tuple, pair_of)), gN, kind,
        dtype,
    )
    F, S, A, al, be = _tiled_call(
        kern, (cache,), scalars,
        (q * 9 * T, q * 9 * T, q * 9 * T, q * T, q * T), C1, C2, dtype,
    )
    E = T * C
    return (
        F.reshape(q, 3, 3, E),
        S.reshape(q, 3, 3, E),
        A.reshape(q, 3, 3, E),
        al.reshape(q, E),
        be.reshape(q, E),
    )


def soa_freeze_struct_pallas(p, material, u_T):
    """Drop-in structured variant of `soa_freeze` for the registered
    isotropic materials; returns an `ops.soa.SoAState`."""
    from fea_large_tpu.ops.pallas_kernels import _material_kind
    from fea_large_tpu.ops.soa import SoAState

    assert struct_pallas_supported(p)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    F, S, A, al, be = _struct_freeze(
        p.structure, p.tables_host, q, npe, _material_kind(material),
        material.lam, material.mu, u_T,
    )
    return SoAState(F=F, S=S, A=A, alpha=al, beta=be)
