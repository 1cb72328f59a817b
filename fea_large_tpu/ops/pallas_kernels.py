"""Pallas TPU kernels for the element hot loop (SURVEY.md C8/C10;
BASELINE.json:5 "batched dense Pallas kernels over element blocks").

Layout contract (shared with `ops.soa`): the element axis is LAST (TPU lane
axis), small tensor indices live on the sublane axis. Each grid step
processes one block of `block_e` elements resident in VMEM:

    ve      f32[3*npe,  BE]   gathered nodal vector values
    gradN   f32[q*npe*3, BE]  material shape gradients
    detJxW  f32[q,       BE]
    F,S,A   f32[q*9,     BE]  frozen tangent state (ops.soa.SoAState)
    alpha,beta f32[q,    BE]
    out     f32[3*npe,  BE]   per-element nodal result

The kernel computes the consistent-tangent action (SURVEY.md §5.5):
dF = sum_a v_a (x) g_a; dE = sym(F^T dF); dS = alpha (A:dE) A + beta A dE A;
dP = dF S + F dS; out[a,i] = sum_q V dP_iJ g_a[J] — identical math to
`ops.soa.soa_apply_tangent`, with every primitive a full-lane vector op.

Gather (v[conn]) and the nodal scatter stay in XLA: TPU has no per-lane
gather instruction, so Pallas cannot beat XLA's scalar gather/scatter for
the unstructured indexing — the kernel focuses the dense element math.
Kernels run in interpret mode off-TPU (`config.pallas_interpret`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fea_large_tpu.config import pallas_interpret

# Block-index maps must return i32: a Python literal 0 lowers to i64 under
# jax_enable_x64 and Mosaic rejects the mixed (i64, i32) index tuple
# ("failed to legalize operation 'func.return'") — verified on the real TPU.
_I0 = np.int32(0)


def _apply_kernel(npe: int, q: int,
                  ve_ref, gradn_ref, vol_ref, F_ref, S_ref, A_ref,
                  alpha_ref, beta_ref, out_ref):
    """One element block: tangent action, all indices unrolled."""
    BE = ve_ref.shape[-1]
    ve = ve_ref[:]          # [3*npe, BE]
    g = gradn_ref[:]        # [q*npe*3, BE]
    vol = vol_ref[:]        # [q, BE]
    Fb = F_ref[:]           # [q*9, BE]
    Sb = S_ref[:]
    Ab = A_ref[:]
    al = alpha_ref[:]       # [q, BE]
    be = beta_ref[:]

    def M(buf, k, i, j):  # [q*9, BE] -> (i,j) component at quad point k
        return buf[k * 9 + 3 * i + j]

    def G(k, a, J):  # gradN component
        return g[(k * npe + a) * 3 + J]

    out = [[jnp.zeros((BE,), ve.dtype) for _ in range(npe)] for _ in range(3)]
    for k in range(q):
        V = vol[k]
        # dF_iJ = sum_a v[a,i] g_a[J]
        dF = [
            [
                sum(ve[3 * a + i] * G(k, a, J) for a in range(npe))
                for J in range(3)
            ]
            for i in range(3)
        ]
        # dE = sym(F^T dF)
        FtdF = [
            [
                sum(M(Fb, k, m, i) * dF[m][j] for m in range(3))
                for j in range(3)
            ]
            for i in range(3)
        ]
        dE = [[0.5 * (FtdF[i][j] + FtdF[j][i]) for j in range(3)] for i in range(3)]
        # dS = alpha (A:dE) A + beta A dE A
        AdE = sum(M(Ab, k, i, j) * dE[i][j] for i in range(3) for j in range(3))
        AdEr = [
            [
                sum(M(Ab, k, i, m) * dE[m][j] for m in range(3))
                for j in range(3)
            ]
            for i in range(3)
        ]
        AdEA = [
            [
                sum(AdEr[i][m] * M(Ab, k, m, j) for m in range(3))
                for j in range(3)
            ]
            for i in range(3)
        ]
        dS = [
            [al[k] * AdE * M(Ab, k, i, j) + be[k] * AdEA[i][j] for j in range(3)]
            for i in range(3)
        ]
        # dP = dF S + F dS, volume-weighted
        dPV = [
            [
                (
                    sum(dF[i][m] * M(Sb, k, m, J) for m in range(3))
                    + sum(M(Fb, k, i, m) * dS[m][J] for m in range(3))
                )
                * V
                for J in range(3)
            ]
            for i in range(3)
        ]
        for i in range(3):
            for a in range(npe):
                out[i][a] = out[i][a] + sum(dPV[i][J] * G(k, a, J) for J in range(3))

    out_ref[:] = jnp.stack([out[i][a] for i in range(3) for a in range(npe)])


def _pad_e(x, BE):
    E = x.shape[-1]
    pad = (-E) % BE
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


@functools.partial(jax.jit, static_argnames=("npe", "q", "block_e"))
def pallas_element_apply(
    ve, gradN, detJxW, F, S, A, alpha, beta, *, npe: int, q: int, block_e: int = 512
):
    """Batched tangent action over element blocks (inputs in the flattened
    SoA layout documented in the module docstring); returns [3*npe, E]."""
    E = ve.shape[-1]
    args = [
        _pad_e(ve, block_e),
        _pad_e(gradN, block_e),
        _pad_e(detJxW, block_e),
        _pad_e(F, block_e),
        _pad_e(S, block_e),
        _pad_e(A, block_e),
        _pad_e(alpha, block_e),
        _pad_e(beta, block_e),
    ]
    Ep = args[0].shape[-1]
    grid = (Ep // block_e,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block_e), lambda i: (_I0, i), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_apply_kernel, npe, q),
        out_shape=jax.ShapeDtypeStruct((3 * npe, Ep), ve.dtype),
        grid=grid,
        in_specs=[
            spec(3 * npe),
            spec(q * npe * 3),
            spec(q),
            spec(q * 9),
            spec(q * 9),
            spec(q * 9),
            spec(q),
            spec(q),
        ],
        out_specs=spec(3 * npe),
        interpret=pallas_interpret(),
    )(*args)
    return out[:, :E]


def _freeze_kernel(npe: int, q: int, kind: int,
                   ue_ref, gradn_ref, lam_ref, mu_ref,
                   F_ref, S_ref, A_ref, al_ref, be_ref):
    """Kinematics + constitutive freeze for one element block (SURVEY.md
    §5.1/§5.4): F = I + sum_a u_a (x) g_a; C = F^T F; then the factored
    tangent state (S, A, alpha, beta) of the registered isotropic material
    `kind` (0=SVK, 1=NeoHookean Ciarlet, 2=NeoHookeanVolumetric)."""
    ue = ue_ref[:]          # [3*npe, BE]
    g = gradn_ref[:]        # [q*npe*3, BE]
    lam = lam_ref[0, 0]
    mu = mu_ref[0, 0]
    BE = ue.shape[-1]
    one = jnp.ones((BE,), ue.dtype)
    zero = jnp.zeros((BE,), ue.dtype)

    def G(k, a, J):
        return g[(k * npe + a) * 3 + J]

    F_rows, S_rows, A_rows, al_rows, be_rows = [], [], [], [], []
    for k in range(q):
        F = [
            [
                (one if i == J else zero)
                + sum(ue[3 * a + i] * G(k, a, J) for a in range(npe))
                for J in range(3)
            ]
            for i in range(3)
        ]
        C = [
            [sum(F[m][i] * F[m][j] for m in range(3)) for j in range(3)]
            for i in range(3)
        ]
        if kind == 0:  # SVK: S = lam tr(E) I + 2 mu E; A = I
            trE = 0.5 * (C[0][0] + C[1][1] + C[2][2] - 3.0)
            S = [
                [
                    lam * trE * (1.0 if i == j else 0.0)
                    + mu * (C[i][j] - (1.0 if i == j else 0.0))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            A = [[one if i == j else zero for j in range(3)] for i in range(3)]
            alpha, beta = lam * one, 2.0 * mu * one
        else:  # both neo-Hookean variants need C^-1 (explicit adjugate)
            c = [[None] * 3 for _ in range(3)]
            c[0][0] = C[1][1] * C[2][2] - C[1][2] * C[2][1]
            c[0][1] = C[0][2] * C[2][1] - C[0][1] * C[2][2]
            c[0][2] = C[0][1] * C[1][2] - C[0][2] * C[1][1]
            c[1][0] = C[1][2] * C[2][0] - C[1][0] * C[2][2]
            c[1][1] = C[0][0] * C[2][2] - C[0][2] * C[2][0]
            c[1][2] = C[0][2] * C[1][0] - C[0][0] * C[1][2]
            c[2][0] = C[1][0] * C[2][1] - C[1][1] * C[2][0]
            c[2][1] = C[0][1] * C[2][0] - C[0][0] * C[2][1]
            c[2][2] = C[0][0] * C[1][1] - C[0][1] * C[1][0]
            detC = C[0][0] * c[0][0] + C[0][1] * c[1][0] + C[0][2] * c[2][0]
            inv_det = 1.0 / detC
            A = [[c[i][j] * inv_det for j in range(3)] for i in range(3)]
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
                alpha, beta = lam * J * (2.0 * J - 1.0), 2.0 * (mu - vol)
        F_rows += [F[i][j] for i in range(3) for j in range(3)]
        S_rows += [S[i][j] for i in range(3) for j in range(3)]
        A_rows += [A[i][j] for i in range(3) for j in range(3)]
        al_rows.append(alpha)
        be_rows.append(beta if hasattr(beta, "shape") else beta * one)

    F_ref[:] = jnp.stack(F_rows)
    S_ref[:] = jnp.stack(S_rows)
    A_ref[:] = jnp.stack(A_rows)
    al_ref[:] = jnp.stack(al_rows)
    be_ref[:] = jnp.stack(be_rows)


@functools.partial(jax.jit, static_argnames=("npe", "q", "kind", "block_e"))
def pallas_freeze(ue, gradN, lam, mu, *, npe: int, q: int, kind: int,
                  block_e: int = 512):
    """Batched freeze over element blocks: flattened SoA inputs
    (ue [3*npe, E], gradN [q*npe*3, E]) -> (F, S, A [q*9, E]; alpha, beta
    [q, E])."""
    E = ue.shape[-1]
    uep = _pad_e(ue, block_e)
    gp = _pad_e(gradN, block_e)
    Ep = uep.shape[-1]
    grid = (Ep // block_e,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block_e), lambda i: (_I0, i), memory_space=pltpu.VMEM
        )

    sspec = pl.BlockSpec((1, 1), lambda i: (_I0, _I0), memory_space=pltpu.SMEM)
    lam2 = jnp.reshape(lam.astype(ue.dtype), (1, 1))
    mu2 = jnp.reshape(mu.astype(ue.dtype), (1, 1))
    outs = pl.pallas_call(
        functools.partial(_freeze_kernel, npe, q, kind),
        out_shape=(
            jax.ShapeDtypeStruct((q * 9, Ep), ue.dtype),
            jax.ShapeDtypeStruct((q * 9, Ep), ue.dtype),
            jax.ShapeDtypeStruct((q * 9, Ep), ue.dtype),
            jax.ShapeDtypeStruct((q, Ep), ue.dtype),
            jax.ShapeDtypeStruct((q, Ep), ue.dtype),
        ),
        grid=grid,
        in_specs=[spec(3 * npe), spec(q * npe * 3), sspec, sspec],
        out_specs=(spec(q * 9), spec(q * 9), spec(q * 9), spec(q), spec(q)),
        interpret=pallas_interpret(),
    )(uep, gp, lam2, mu2)
    return tuple(o[:, :E] for o in outs)


def _force_kernel(npe: int, q: int, gradn_ref, vol_ref, F_ref, S_ref, out_ref):
    """Internal force for one element block: fe[a,i] = sum_q V (F S)_iJ
    g_a[J] (SURVEY.md §5.5). Output rows ordered i*npe + a."""
    g = gradn_ref[:]
    vol = vol_ref[:]
    Fb = F_ref[:]
    Sb = S_ref[:]
    BE = g.shape[-1]

    def M(buf, k, i, j):
        return buf[k * 9 + 3 * i + j]

    def G(k, a, J):
        return g[(k * npe + a) * 3 + J]

    out = [[jnp.zeros((BE,), g.dtype) for _ in range(npe)] for _ in range(3)]
    for k in range(q):
        V = vol[k]
        PV = [
            [
                sum(M(Fb, k, i, m) * M(Sb, k, m, J) for m in range(3)) * V
                for J in range(3)
            ]
            for i in range(3)
        ]
        for i in range(3):
            for a in range(npe):
                out[i][a] = out[i][a] + sum(
                    PV[i][J] * G(k, a, J) for J in range(3)
                )
    out_ref[:] = jnp.stack([out[i][a] for i in range(3) for a in range(npe)])


@functools.partial(jax.jit, static_argnames=("npe", "q", "block_e"))
def pallas_internal_force(gradN, detJxW, F, S, *, npe: int, q: int,
                          block_e: int = 512):
    """Batched internal force over element blocks from the frozen state;
    returns [3*npe, E] with rows i*npe + a."""
    E = gradN.shape[-1]
    args = [
        _pad_e(gradN, block_e),
        _pad_e(detJxW, block_e),
        _pad_e(F, block_e),
        _pad_e(S, block_e),
    ]
    Ep = args[0].shape[-1]
    grid = (Ep // block_e,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block_e), lambda i: (_I0, i), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_force_kernel, npe, q),
        out_shape=jax.ShapeDtypeStruct((3 * npe, Ep), gradN.dtype),
        grid=grid,
        in_specs=[spec(q * npe * 3), spec(q), spec(q * 9), spec(q * 9)],
        out_specs=spec(3 * npe),
        interpret=pallas_interpret(),
    )(*args)
    return out[:, :E]


# ---------------------------------------------------------------------------
# BCSR SpMV (SURVEY.md C10: "SpMV as a Pallas kernel")
# ---------------------------------------------------------------------------


def _spmv_kernel(data_ref, xg_ref, out_ref):
    """Per-slot 3x3 block matvec over a lane-blocked slot axis:
    out[i] = sum_j data[3i+j] * xg[j]."""
    d = data_ref[:]  # [9, BK]
    xg = xg_ref[:]  # [3, BK]
    out_ref[:] = jnp.stack(
        [sum(d[3 * i + j] * xg[j] for j in range(3)) for i in range(3)]
    )


@functools.partial(jax.jit, static_argnames=("block_k",))
def _pallas_block_matvec(data9, xg, block_k: int = 2048):
    nnzb = data9.shape[-1]
    d = _pad_e(data9, block_k)
    x = _pad_e(xg, block_k)
    grid = (d.shape[-1] // block_k,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block_k), lambda i: (_I0, i), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        _spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((3, d.shape[-1]), data9.dtype),
        grid=grid,
        in_specs=[spec(9), spec(3)],
        out_specs=spec(3),
        interpret=pallas_interpret(),
    )(d, x)
    return out[:, :nnzb]


def bcsr_spmv_pallas(K, x, block_k: int = 2048):
    """y = K @ x for a `assembly.bcsr.BCSRMatrix` with the per-slot block
    matvec as a Pallas kernel (slot axis in TPU lanes). The unstructured
    gather (x rows per stored block) and the row-wise sorted segment sum
    stay in XLA — TPU has no hardware gather, so Pallas cannot improve the
    indexing, only the dense block math."""
    s = K.structure
    data9 = jnp.transpose(K.data, (1, 2, 0)).reshape(9, s.nnzb)
    xg = x[s.indices].T  # [3, nnzb]
    contrib = _pallas_block_matvec(data9, xg, block_k=block_k).T  # [nnzb, 3]
    return jax.ops.segment_sum(
        contrib, s.row_ids, num_segments=s.n_nodes, indices_are_sorted=True
    )


# ---------------------------------------------------------------------------
# SoAState adapters
# ---------------------------------------------------------------------------


def flatten_state(state):
    """ops.soa.SoAState -> flattened [q*9, E] buffers for the kernel."""
    q = state.F.shape[0]
    E = state.F.shape[-1]

    def flat(x):  # [q, 3, 3, E] -> [q*9, E]
        return x.reshape(q * 9, E)

    return flat(state.F), flat(state.S), flat(state.A), state.alpha, state.beta


def _material_kind(material) -> int:
    """Static material code for the freeze kernel (0=SVK, 1=NH Ciarlet,
    2=NH volumetric-split). Mirrors ops.soa._soa_material's dispatch."""
    from fea_large_tpu.materials.neo_hookean import (
        NeoHookean,
        NeoHookeanVolumetric,
    )
    from fea_large_tpu.materials.svk import StVenantKirchhoff

    if isinstance(material, StVenantKirchhoff):
        return 0
    if isinstance(material, NeoHookeanVolumetric):
        return 2
    if isinstance(material, NeoHookean):
        return 1
    raise NotImplementedError(
        f"Pallas freeze supports the registered isotropic materials; got "
        f"{type(material).__name__}"
    )


def _full_tables(p):
    """(gradN [q, npe, 3, E], detJxW [q, E]): per-element geometry tables.
    Structured-uniform SoAProblems store slot-compressed tables
    ([.., n_tets]; ops/soa._slot_tables) — re-tile them here, since the
    Pallas kernels stream per-element rows."""
    g, V = p.gradN, p.detJxW
    st = getattr(p, "structure", None)
    if st is not None and g.shape[-1] == st.n_tets:
        C = st.n_cells
        g = jnp.broadcast_to(g[..., None], (*g.shape, C)).reshape(
            *g.shape[:-1], -1
        )
        V = jnp.broadcast_to(V[..., None], (*V.shape, C)).reshape(
            V.shape[0], -1
        )
    return g, V


def _gather_flat(p, v_T, npe):
    """v_T [3, N] -> [3*npe, E] rows ordered 3*a + i, via the mesh's gather
    path (structured slices or conn_T indexing — ops/soa.soa_gather)."""
    from fea_large_tpu.ops.soa import soa_gather

    ge = soa_gather(p, v_T)
    return jnp.stack([ge[i][a] for a in range(npe) for i in range(3)])


def soa_freeze_pallas(p, material, u_T, block_e: int = 512):
    """Drop-in Pallas variant of `ops.soa.soa_freeze` (same gather, fused
    kinematics + constitutive update in one VMEM-resident kernel).

    Structured-uniform meshes delegate to `soa_freeze`, which on TPU
    resolves to the FUSED structured Pallas freeze
    (ops/pallas_structured.soa_freeze_struct_pallas) and to the XLA
    slot-compressed path elsewhere — this kernel's `_full_tables` would
    materialize the [q*npe*3, E] gradient broadcast (~123 MB at 1M DOF)
    that both structured routes avoid."""
    from fea_large_tpu.ops.soa import SoAState, soa_freeze

    if p.structure is not None and p.gradN.shape[-1] == p.structure.n_tets:
        return soa_freeze(p, material, u_T)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    gradN, _ = _full_tables(p)
    E = gradN.shape[-1]
    ue_flat = _gather_flat(p, u_T, npe)  # rows = 3*a + i
    gradN_flat = gradN.reshape(q * npe * 3, E)
    F, S, A, alpha, beta = pallas_freeze(
        ue_flat, gradN_flat, material.lam, material.mu,
        npe=npe, q=q, kind=_material_kind(material), block_e=block_e,
    )
    return SoAState(
        F=F.reshape(q, 3, 3, E),
        S=S.reshape(q, 3, 3, E),
        A=A.reshape(q, 3, 3, E),
        alpha=alpha,
        beta=beta,
    )


def soa_internal_force_pallas(p, state, block_e: int = 512):
    """Drop-in Pallas variant of `ops.soa.soa_internal_force` (same
    scatter, Pallas element math); returns [3, N]."""
    from fea_large_tpu.ops.soa import soa_scatter

    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    gradN, detJxW = _full_tables(p)
    E = gradN.shape[-1]
    gradN_flat = gradN.reshape(q * npe * 3, E)
    Fb = state.F.reshape(q * 9, E)
    Sb = state.S.reshape(q * 9, E)
    out = pallas_internal_force(
        gradN_flat, detJxW, Fb, Sb, npe=npe, q=q, block_e=block_e
    )
    fe = [[out[i * npe + a] for a in range(npe)] for i in range(3)]
    return soa_scatter(p, fe)


def soa_apply_tangent_pallas(p, state, v_T, block_e: int = 512):
    """Drop-in Pallas variant of `ops.soa.soa_apply_tangent` (same gather /
    scatter, Pallas element math). Structured-lattice meshes route to the
    FUSED kernel (ops/pallas_structured.py): static-slice gather, one
    elementwise kernel over cell blocks with baked geometry constants,
    pad-add scatter — measured 4.7x the XLA slice/pad graph at 1M DOF."""
    from fea_large_tpu.ops.pallas_structured import (
        soa_apply_tangent_struct_pallas,
        struct_pallas_supported,
    )
    from fea_large_tpu.ops.soa import soa_scatter

    # dtype gate mirrors ops.soa._struct_fused: the structured kernel's
    # contract is f32 — an f64 SoAProblem must not be routed into it
    if struct_pallas_supported(p) and p.gradN.dtype == jnp.float32:
        return soa_apply_tangent_struct_pallas(p, state, v_T)
    q, npe = p.gradN.shape[0], p.gradN.shape[1]
    gradN, detJxW = _full_tables(p)
    E = gradN.shape[-1]
    # kernel expects rows ordered as (a, i) triplets: ve[3a+i]
    ve_flat = _gather_flat(p, v_T, npe)
    gradN_flat = gradN.reshape(q * npe * 3, E)
    Fb, Sb, Ab, al, be = flatten_state(state)
    out = pallas_element_apply(
        ve_flat, gradN_flat, detJxW, Fb, Sb, Ab, al, be,
        npe=npe, q=q, block_e=block_e,
    )
    # out rows are i*npe + a; regroup to fe[i][a] lists for the scatter
    fe = [[out[i * npe + a] for a in range(npe)] for i in range(3)]
    return soa_scatter(p, fe)
