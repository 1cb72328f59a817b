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

    args = (
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

    def call(arrs, b1, grid):
        """Exact-fit blocks ONLY: (rows, b1, C2) with b1*grid == the C1
        extent of `arrs`. Partial blocks are NOT safe on this backend —
        a trailing block reaching past the array was measured to produce
        corrupted output (round 4), so the sublane tail runs as its own
        exact single-block call below."""
        def spec(r):
            return pl.BlockSpec(
                (r, b1, C2), lambda i: (_I0, i, _I0),
                memory_space=pltpu.VMEM,
            )

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((3 * P, b1 * grid, C2), dtype),
            grid=(grid,),
            in_specs=[
                spec(3 * P),
                spec(q * 9 * T), spec(q * 9 * T), spec(q * 9 * T),
                spec(q * T), spec(q * T),
            ],
            out_specs=spec(3 * P),
            # Mosaic's liveness bound over the big unrolled body
            # over-reserves scratch stack vs the 16 MB default scoped
            # limit; the real working set fits comfortably
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=pallas_interpret(),
        )(*arrs)

    k8 = (C1 // 8) * 8
    parts = []
    if k8:
        # body: full 8-sublane blocks over [0, k8) — index maps never
        # leave the array, no input slicing needed
        parts.append(call(args, 8, k8 // 8))
    if C1 - k8:
        # sublane tail [k8, C1): one exact block of b1 = C1 - k8 (< 8)
        # rows on the SLICED tail (a small strided copy, <= 7*C2 cells)
        tail = tuple(x[:, k8:, :] for x in args)
        parts.append(call(tail, C1 - k8, 1))
    out = (parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1))
    out = out.reshape(3 * P, C)

    comps = []
    for i in range(3):
        acc = [None] * len(st.classes)
        for pi, key in enumerate(pairs):
            g = _pair_pad(st, out[3 * pi + i], key)
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
