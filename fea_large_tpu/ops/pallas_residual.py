"""Fused compensated-f32 residual element pass (round-5 VERDICT item 1).

The mixed path's Newton residual is the f64 authority of the whole
framework (1e-8 oracle parity hangs off it), but Pallas on this platform
is f32-only, so the f64 pass is pure XLA — and its structured slice/pad
graph fragments exactly like the f32 one did pre-round-4: 45 ms of a
~61 ms Newton step at 1M DOF (round-4 TPU breakdown), ~73% of the
headline solve. SURVEY.md §9 risk 5 anticipated this bridge: run the
element pass in DOUBLE-WORD f32 arithmetic (ops/dfloat.py — effective
48-bit significand, ~3.6e-15 per operation) inside the same fused-kernel
decomposition as ops/pallas_structured.py:

  * XLA prologue: split u [3, N] f64 into (hi, lo) f32 pairs
    (dfloat.from_f64) and gather both through the static (class, offset)
    pair slices — two [3P, C] caches.
  * ONE Pallas kernel (optionally split over tet-slot groups to bound
    Mosaic's compile time) evaluates F = I + sum u_a (x) g_a, C = F^T F,
    S(C), and f_e = V (F S) g_a for every tet slot of a cell ENTIRELY in
    double-word arithmetic, accumulating into (class, offset) pair rows
    as (hi, lo) output pairs. Geometry tables are baked as PRE-SPLIT
    double-word compile-time constants (dfloat.const_split of the f64
    `SoAProblem.tables_host` values — the same values the f64 XLA pass
    reads), so the kernel's operator is the f64 operator to ~2^-48, not
    an f32 rounding of it.
  * XLA epilogue: hi + lo -> f64 (exact), pair rows pad-add scattered to
    nodes in f64 (`_scatter_pairs` is dtype-generic).

Accuracy contract (pinned by tests/test_pallas_residual.py and the
on-TPU gate in bench.py --check): ||f_df - f_64|| <= ~1e-13 relative on
physical states. The pure-f64 XLA pass REMAINS the convergence/parity
authority — solvers/newton uses this pass for in-increment Newton
residuals only and re-evaluates f64 before accepting convergence.

Spec lineage: same math as `ops.soa.soa_freeze` + `soa_internal_force`
(SURVEY.md §5.2-5.4); material laws mirror `ops.soa._soa_material`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fea_large_tpu.config import pallas_interpret
from fea_large_tpu.ops import dfloat as df
from fea_large_tpu.ops.pallas_structured import (
    _cell_split,
    _gather_cache,
    _scatter_pairs,
    _tiled_call,
    struct_pairs,
    struct_pallas_supported,
)


@functools.lru_cache(maxsize=8)
def _const_tables(tables_host):
    """Bake the f64 slot-compressed geometry as pre-split double-word
    constants: gN_c[k][a][J][t], dV_c[k][t] (dfloat.Const each)."""
    gN, dV = tables_host
    gN_c = tuple(
        tuple(
            tuple(
                tuple(df.const_split(gN[k][a][J][t]) for t in range(len(gN[k][a][J])))
                for J in range(3)
            )
            for a in range(len(gN[k]))
        )
        for k in range(len(gN))
    )
    dV_c = tuple(
        tuple(df.const_split(dV[k][t]) for t in range(len(dV[k])))
        for k in range(len(dV))
    )
    return gN_c, dV_c


def _is_zero(c: df.Const) -> bool:
    return c.hi == 0.0 and c.lo == 0.0


class _ConstTables:
    """Geometry accessor for the STRUCTURED kernel: per-(tet-slot, quad)
    tables baked as pre-split double-word compile-time constants."""

    def __init__(self, g_c, V_c):
        self.g_c = g_c  # [a][J] -> df.Const
        self.V_c = V_c

    def zero(self, a, J):
        return _is_zero(self.g_c[a][J])

    def gmul(self, x, a, J):
        return df.mul_const(x, self.g_c[a][J])

    def vmul(self, x):
        return df.mul_const(x, self.V_c)


class _ArrayTables:
    """Geometry accessor for the UNSTRUCTURED kernel: per-element (hi, lo)
    gradient/volume rows streamed through VMEM (split from the f64 host
    tables in the XLA prologue — the kernel's operator is the f64 one to
    ~2^-48, exactly like the baked-constant path)."""

    def __init__(self, g_rows, V_pair):
        # g_rows[(a, J)] = (hi, lo); V_pair = (hi, lo)
        self.g = {
            key: (h, l, df.split(h)) for key, (h, l) in g_rows.items()
        }
        self.V = (V_pair[0], V_pair[1], df.split(V_pair[0]))

    def zero(self, a, J):
        return False

    def gmul(self, x, a, J):
        h, l, sp = self.g[(a, J)]
        return df.mul(x, (h, l), None, sp)

    def vmul(self, x):
        h, l, sp = self.V
        return df.mul(x, (h, l), None, sp)


def _sym_inverse_det(C):
    """Symmetric 3x3 double-word inverse via the adjugate; C is the
    upper-triangle dict {(i,j): df}. Returns (Cinv upper dict, detC)."""
    m = {}
    sp = {k: df.split(v[0]) for k, v in C.items()}

    def mul(a, b):
        return df.mul(C[a], C[b], sp[a], sp[b])

    adj = {
        (0, 0): df.sub(mul((1, 1), (2, 2)), mul((1, 2), (1, 2))),
        (0, 1): df.sub(mul((0, 2), (1, 2)), mul((0, 1), (2, 2))),
        (0, 2): df.sub(mul((0, 1), (1, 2)), mul((0, 2), (1, 1))),
        (1, 1): df.sub(mul((0, 0), (2, 2)), mul((0, 2), (0, 2))),
        (1, 2): df.sub(mul((0, 1), (0, 2)), mul((0, 0), (1, 2))),
        (2, 2): df.sub(mul((0, 0), (1, 1)), mul((0, 1), (0, 1))),
    }
    det = None
    for j in range(3):
        t = df.mul(C[(0, j)], adj[(0, j)], sp[(0, j)])
        det = t if det is None else df.add(det, t)
    inv = df.recip(det)
    isp = df.split(inv[0])
    for key, a in adj.items():
        m[key] = df.mul(a, inv, None, isp)
    return m, det


def _element_force_df(ue, tables, npe, kind, lam, mu, emit):
    """Double-word force contribution of ONE quadrature point: ue[i][a]
    df nodal displacements; `tables` a geometry accessor (_ConstTables for
    the structured kernel's baked constants, _ArrayTables for the
    unstructured kernel's streamed rows); material `kind` (0=SVK,
    1=NeoHookean Ciarlet, 2=NeoHookeanVolumetric) with df (lam, mu).
    Calls emit(a, i, df_term) for each nodal term — the caller owns
    accumulation (pair rows / element rows). Mirrors
    ops.soa._soa_material + the force contraction of soa_internal_force
    in scalar double-word form."""

    def chain(acc, term):
        # accurate double-word accumulation (a compensated hi/f32-lo
        # accumulator measured ~2e-13 relative on cancelling sums — too
        # close to the 1e-13 agreement bar; the full add stays ~4e-14)
        return term if acc is None else df.add(acc, term)

    # F = I + sum_a u_a (x) g_a
    F = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for J in range(3):
            acc = None
            for a in range(npe):
                if tables.zero(a, J):
                    continue
                acc = chain(acc, tables.gmul(ue[i][a], a, J))
            assert acc is not None, "degenerate gradient table column"
            F[i][J] = df.add_f32(acc, 1.0) if i == J else acc
    Fsp = [[df.split(F[i][J][0]) for J in range(3)] for i in range(3)]
    # C = F^T F (symmetric upper triangle)
    C = {}
    for i in range(3):
        for j in range(i, 3):
            acc = None
            for m in range(3):
                acc = chain(
                    acc, df.mul(F[m][i], F[m][j], Fsp[m][i], Fsp[m][j])
                )
            C[(i, j)] = acc

    def csym(i, j):
        return C[(i, j)] if i <= j else C[(j, i)]

    # S(C) per material kind (upper triangle; S is symmetric)
    S = {}
    if kind == 0:  # SVK: S = lam tr(E) I + mu (C - I), E = (C - I)/2
        trE = df.add_f32(
            df.add(df.add(C[(0, 0)], C[(1, 1)]), C[(2, 2)]), -3.0
        )
        trE = (0.5 * trE[0], 0.5 * trE[1])  # exact
        ltrE = df.mul(lam, trE)
        for i in range(3):
            for j in range(i, 3):
                cm = csym(i, j)
                if i == j:
                    t = df.mul(mu, df.add_f32(cm, -1.0))
                    S[(i, j)] = df.add(ltrE, t)
                else:
                    S[(i, j)] = df.mul(mu, cm)
    else:
        Cinv, detC = _sym_inverse_det(C)
        if kind == 1:  # Ciarlet: S = mu I + (lam lnJ - mu) Cinv
            lnJ = df.log(detC)
            lnJ = (0.5 * lnJ[0], 0.5 * lnJ[1])  # exact
            w = df.sub(df.mul(lam, lnJ), mu)
        else:  # volumetric split: S = mu I + (lam J (J-1) - mu) Cinv
            J = df.sqrt(detC)
            vol = df.mul(df.mul(lam, J), df.add_f32(J, -1.0))
            w = df.sub(vol, mu)
        wsp = df.split(w[0])
        for i in range(3):
            for j in range(i, 3):
                t = df.mul(w, Cinv[(i, j)], wsp)
                S[(i, j)] = df.add(t, mu) if i == j else t

    def ssym(i, j):
        return S[(i, j)] if i <= j else S[(j, i)]

    # PV = V * F S ; fe[a, i] += PV[i][J] g_a[J]
    for i in range(3):
        PV_i = []
        for J in range(3):
            acc = None
            for m in range(3):
                acc = chain(acc, df.mul(F[i][m], ssym(m, J), Fsp[i][m]))
            PV_i.append(tables.vmul(acc))
        for a in range(npe):
            for J in range(3):
                if tables.zero(a, J):
                    continue
                emit(a, i, tables.gmul(PV_i[J], a, J))


def _resid_kernel(q, npe, T, pair_of, gN_c, dV_c, kind, nrows, tets,
                  ch_ref, cl_ref, lh_ref, ll_ref, mh_ref, ml_ref,
                  oh_ref, ol_ref):
    """One cell block: double-word internal-force contributions of the tet
    slots in `tets`, accumulated into (class, offset) pair rows as
    (hi, lo) pairs. Output rows untouched by these tets are zero."""
    ch = ch_ref[:]
    cl = cl_ref[:]
    lam = (lh_ref[0, 0], ll_ref[0, 0])
    mu = (mh_ref[0, 0], ml_ref[0, 0])
    zero = jnp.zeros(ch.shape[1:], ch.dtype)
    acc = [None] * nrows
    for t in tets:
        ue = [
            [
                (ch[3 * pair_of[t][a] + i], cl[3 * pair_of[t][a] + i])
                for a in range(npe)
            ]
            for i in range(3)
        ]
        for k in range(q):
            tables = _ConstTables(
                [[gN_c[k][a][J][t] for J in range(3)] for a in range(npe)],
                dV_c[k][t],
            )

            # row accumulation uses the ACCURATE double-word add: the
            # rows sum up to ~24 cancelling O(1) contributions, where a
            # plain-f32 compensation term costs ~2e-13 relative
            # (measured on TPU) vs ~4e-14 with the full add
            def emit(a, i, term, _t=t):
                r = 3 * pair_of[_t][a] + i
                acc[r] = term if acc[r] is None else df.add(acc[r], term)

            _element_force_df(ue, tables, npe, kind, lam, mu, emit)
    hi_rows, lo_rows = [], []
    for r in range(nrows):
        if acc[r] is None:
            hi_rows.append(zero)
            lo_rows.append(zero)
        else:
            hi_rows.append(acc[r][0])
            lo_rows.append(acc[r][1])
    oh_ref[:] = jnp.stack(hi_rows)
    ol_ref[:] = jnp.stack(lo_rows)


def _tet_groups(T: int, tgroup: int):
    return tuple(
        tuple(range(t0, min(t0 + tgroup, T))) for t0 in range(0, T, tgroup)
    )


@functools.partial(
    jax.jit,
    static_argnames=("structure", "tables_host", "q", "npe", "kind", "tgroup"),
)
def _struct_resid(structure, tables_host, q, npe, kind, lam64, mu64, u_T64,
                  tgroup=2):
    """f_int [3, N] f64 via the double-word structured element pass.
    `tgroup` bounds the tet slots per Pallas call (Mosaic compile time
    scales with the unrolled body; the per-call outputs are summed
    exactly in f64)."""
    st = structure
    T, C = st.n_tets, st.n_cells
    pairs, pair_of = struct_pairs(st)
    P = len(pairs)
    C1, C2 = _cell_split(C)
    gN_c, dV_c = _const_tables(tables_host)
    uh, ul = df.from_f64(u_T64)
    cache_h = _gather_cache(st, pairs, uh, C1, C2)
    cache_l = _gather_cache(st, pairs, ul, C1, C2)
    lh, ll = df.from_f64(lam64)
    mh, ml = df.from_f64(mu64)
    _I0 = np.int32(0)
    sspec = pl.BlockSpec((1, 1), lambda i: (_I0, _I0), memory_space=pltpu.VMEM)
    scalars = tuple(
        (v.reshape(1, 1), sspec) for v in (lh, ll, mh, ml)
    )
    out64 = None
    for tets in _tet_groups(T, tgroup):
        kern = functools.partial(
            _resid_kernel, q, npe, T, tuple(map(tuple, pair_of)), gN_c,
            dV_c, kind, 3 * P, tets,
        )
        oh, ol = _tiled_call(
            kern, (cache_h, cache_l), scalars, (3 * P, 3 * P), C1, C2,
            jnp.float32,
        )
        part = oh.astype(jnp.float64) + ol.astype(jnp.float64)  # exact
        out64 = part if out64 is None else out64 + part
    return _scatter_pairs(st, pairs, out64, 3)


# ---------------------------------------------------------------------------
# unstructured variant: streamed geometry, bucketed gather/scatter in XLA
# ---------------------------------------------------------------------------


def _resid_kernel_unstr(q, npe, kind,
                        ch_ref, cl_ref, gh_ref, gl_ref, vh_ref, vl_ref,
                        lh_ref, ll_ref, mh_ref, ml_ref, oh_ref, ol_ref):
    """One element block of the UNSTRUCTURED double-word force pass:
    cache rows [3*npe, BE] (3a+i — ops/pallas_kernels._gather_flat order),
    geometry rows gh/gl [q*npe*3, BE] + vh/vl [q, BE] split from the f64
    host tables, outputs the per-element nodal force rows as (hi, lo)."""
    ch = ch_ref[:]
    cl = cl_ref[:]
    gh = gh_ref[:]
    gl = gl_ref[:]
    vh = vh_ref[:]
    vl = vl_ref[:]
    lam = (lh_ref[0, 0], ll_ref[0, 0])
    mu = (mh_ref[0, 0], ml_ref[0, 0])
    ue = [
        [(ch[3 * a + i], cl[3 * a + i]) for a in range(npe)]
        for i in range(3)
    ]
    acc = [None] * (3 * npe)
    for k in range(q):
        g_rows = {
            (a, J): (gh[(k * npe + a) * 3 + J], gl[(k * npe + a) * 3 + J])
            for a in range(npe)
            for J in range(3)
        }
        tables = _ArrayTables(g_rows, (vh[k], vl[k]))

        def emit(a, i, term):
            r = 3 * a + i
            acc[r] = term if acc[r] is None else df.add(acc[r], term)

        _element_force_df(ue, tables, npe, kind, lam, mu, emit)
    oh_ref[:] = jnp.stack([acc[r][0] for r in range(3 * npe)])
    ol_ref[:] = jnp.stack([acc[r][1] for r in range(3 * npe)])


@functools.partial(
    jax.jit, static_argnames=("q", "npe", "kind", "n_nodes", "block_e")
)
def _unstr_resid(q, npe, kind, n_nodes, lam64, mu64, u_T64,
                 conn_T, buckets, gradN64, detJxW64, block_e=512):
    """f_int [3, N] f64 for an unstructured mesh: bucketed XLA gather of
    the split (hi, lo) displacement pairs, one Pallas element kernel over
    E-blocks with STREAMED split geometry, f64 combine + the deterministic
    valence-bucketed scatter. The f64 element pass this replaces measured
    71.8 ms at 1M DOF (round-3 phase table) — the indexed gather/scatter
    stay (the measured scalar-core floor); the double-word kernel removes
    the fragmented f64 element math."""
    from fea_large_tpu.ops import soa as soa_mod

    E = conn_T.shape[-1]
    uh, ul = df.from_f64(u_T64)
    # gather both words through the index maps (rows 3a+i)
    ue_h = jnp.stack(
        [uh[i][conn_T[a]] for a in range(npe) for i in range(3)]
    )
    ue_l = jnp.stack(
        [ul[i][conn_T[a]] for a in range(npe) for i in range(3)]
    )
    gh, gl = df.from_f64(gradN64.reshape(q * npe * 3, E))
    vh, vl = df.from_f64(detJxW64)
    lh, ll = df.from_f64(lam64)
    mh, ml = df.from_f64(mu64)

    from fea_large_tpu.ops.pallas_kernels import _pad_e

    args = [
        _pad_e(x, block_e) for x in (ue_h, ue_l, gh, gl, vh, vl)
    ]
    Ep = args[0].shape[-1]
    _i0 = np.int32(0)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block_e), lambda i: (_i0, i), memory_space=pltpu.VMEM
        )

    sspec = pl.BlockSpec(
        (1, 1), lambda i: (_i0, _i0), memory_space=pltpu.VMEM
    )
    oh, ol = pl.pallas_call(
        functools.partial(_resid_kernel_unstr, q, npe, kind),
        out_shape=[
            jax.ShapeDtypeStruct((3 * npe, Ep), jnp.float32),
            jax.ShapeDtypeStruct((3 * npe, Ep), jnp.float32),
        ],
        grid=(Ep // block_e,),
        in_specs=[
            spec(3 * npe), spec(3 * npe),
            spec(q * npe * 3), spec(q * npe * 3), spec(q), spec(q),
            sspec, sspec, sspec, sspec,
        ],
        out_specs=[spec(3 * npe), spec(3 * npe)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=pallas_interpret(),
    )(
        *args,
        lh.reshape(1, 1), ll.reshape(1, 1),
        mh.reshape(1, 1), ml.reshape(1, 1),
    )
    out64 = (
        oh[:, :E].astype(jnp.float64) + ol[:, :E].astype(jnp.float64)
    )  # exact
    fe = [[out64[3 * a + i] for a in range(npe)] for i in range(3)]
    # deterministic nodal scatter in f64 (bucketed scatter-as-gather;
    # falls back to the direct segment-sum inside soa_scatter semantics)
    p_like = _ScatterShim(conn_T, buckets, n_nodes)
    return soa_mod.soa_scatter(p_like, fe)


class _ScatterShim:
    """Minimal SoAProblem stand-in for `soa_scatter` (structure-free)."""

    def __init__(self, conn_T, buckets, n_nodes):
        self.conn_T = conn_T
        self.buckets = buckets
        self.n_nodes = n_nodes
        self.structure = None


def struct_resid_supported(p, material) -> bool:
    """True when the double-word structured residual applies: fused-kernel
    support (uniform lattice, safe cell split) + a registered isotropic
    material with a scalar-form mirror here."""
    from fea_large_tpu.materials import (
        NeoHookean,
        NeoHookeanVolumetric,
        StVenantKirchhoff,
    )

    return struct_pallas_supported(p) and isinstance(
        material, (StVenantKirchhoff, NeoHookean, NeoHookeanVolumetric)
    )


def resid_df_supported(p, material) -> bool:
    """True when the ROUTED double-word residual applies: the structured
    pair-slice variant only. The unstructured streamed-geometry variant
    (`_unstr_resid`) exists and is correct, but MEASURED SLOWER than the
    f64 XLA pass it would replace (135.9 vs 71.8 ms at 945k DOF 5tet,
    round-5 BENCH_NOTES): the unstructured residual is indexed-op-bound
    (scalar-core gather/scatter floor — CLAUDE.md), and the double-word
    form pays TWO f32 gathers plus an f64 scatter where the f64 pass
    pays one of each. Routed nowhere; kept as the measured alternative
    and for meshes where a future indexed-op win changes the balance."""
    return struct_resid_supported(p, material)


def soa_internal_force_df(p, material, u_T64, tgroup: int = 2, p64=None):
    """Double-word internal force: u_T64 [3, N] f64 -> f_int [3, N] f64
    agreeing with the pure-f64 XLA pass (`soa_freeze` +
    `soa_internal_force` on the f64 problem) to ~1e-13 relative.

    `p` is the F32 SoAProblem. Structured lattices take the pair-slice
    kernel (geometry baked from the f64 `tables_host` aux); unstructured
    meshes take the streamed-geometry kernel and REQUIRE `p64` (the f64
    SoAProblem whose gradN/detJxW carry the f64 geometry)."""
    from fea_large_tpu.ops.pallas_kernels import _material_kind

    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    lam64 = material.lam.astype(jnp.float64)
    mu64 = material.mu.astype(jnp.float64)
    if struct_resid_supported(p, material):
        return _struct_resid(
            p.structure, p.tables_host, q, npe, _material_kind(material),
            lam64, mu64, u_T64, tgroup=tgroup,
        )
    assert p.structure is None and p64 is not None, (
        "unstructured double-word residual needs the f64 SoAProblem"
    )
    return _unstr_resid(
        q, npe, _material_kind(material), p.n_nodes, lam64, mu64, u_T64,
        p.conn_T, p.buckets, p64.gradN, p64.detJxW,
    )
