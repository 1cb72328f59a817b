"""Matrix-free tangent operator (SURVEY.md C9/C12, §5.5 "matrix-free action").

The 1M+ DOF path (BASELINE.json:10): never materialize K. Per Newton
iterate, `TangentState.freeze` evaluates and stores the per-quadrature-point
kinematic/constitutive state (F, S, material tangent state) ONCE; each PCG
iteration then applies

    (K v)_e[a,i] = sum_q V_q dP_iJ g_a[J],
    dP = dF S + F (CC : dE_v),  dF = sum_b v_b (x) g_b,  dE_v = sym(F^T dF)

— verified in the survey session to match the assembled K·v (SURVEY.md §5.5).
Memory is O(E * q * small-constant), never O(nnz(K)).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from fea_large_tpu.assembly.scatter import NodeScatter
from fea_large_tpu.elements.kernels import (
    ElementGeometry,
    deformation_gradient,
    element_diag_blocks,
)
from fea_large_tpu.materials.base import Material


class TangentState(NamedTuple):
    """Frozen per-quad-point state of the consistent tangent at displacement u."""

    F: jnp.ndarray  # [E, q, 3, 3]
    S: jnp.ndarray  # [E, q, 3, 3]
    mat_state: tuple  # material aux (e.g. (C^-1, lnJ) for neo-Hookean)

    @staticmethod
    def freeze(
        u: jnp.ndarray, conn: jnp.ndarray, geom: ElementGeometry, material: Material
    ) -> tuple["TangentState", jnp.ndarray]:
        """(state, fe [E, npe, 3]): evaluate kinematics + constitutive update
        once per Newton iterate; fe is the per-element internal force (shares
        the F/S evaluation with the frozen state)."""
        ue = u[conn]
        F = deformation_gradient(ue, geom.gradN)
        C = jnp.einsum("eqiI,eqiJ->eqIJ", F, F)
        S, mat_state = material.pk2_and_state(C)
        P = jnp.einsum("eqiI,eqIJ->eqiJ", F, S)
        fe = jnp.einsum("eq,eqiJ,eqaJ->eai", geom.detJxW, P, geom.gradN)
        return TangentState(F=F, S=S, mat_state=mat_state), fe


def apply_tangent(
    state: TangentState,
    v: jnp.ndarray,
    conn: jnp.ndarray,
    geom: ElementGeometry,
    material: Material,
    scatter: NodeScatter,
) -> jnp.ndarray:
    """K(u)·v [N,3] without materializing K (directional linearization of the
    internal force — the exact consistent tangent, material + geometric)."""
    ve = v[conn]  # [E, npe, 3]
    dF = jnp.einsum("eai,eqaJ->eqiJ", ve, geom.gradN)
    dE = 0.5 * (
        jnp.einsum("eqiI,eqiJ->eqIJ", state.F, dF)
        + jnp.einsum("eqiJ,eqiI->eqIJ", state.F, dF)
    )
    dS = material.tangent_apply(state.mat_state, dE)
    dP = jnp.einsum("eqiI,eqIJ->eqiJ", dF, state.S) + jnp.einsum(
        "eqiI,eqIJ->eqiJ", state.F, dS
    )
    out_e = jnp.einsum("eq,eqiJ,eqaJ->eai", geom.detJxW, dP, geom.gradN)
    return scatter(out_e)


class MatFreeOperator(NamedTuple):
    """Bundled matrix-free K(u): `matvec`, internal force, and the block
    diagonal for Jacobi preconditioning. Built fresh per Newton iterate."""

    matvec: Callable[[jnp.ndarray], jnp.ndarray]
    f_int: jnp.ndarray  # [N, 3]
    diag_blocks: jnp.ndarray  # [N, 3, 3]


def make_operator(
    u: jnp.ndarray,
    conn: jnp.ndarray,
    geom: ElementGeometry,
    material: Material,
    scatter: NodeScatter,
) -> MatFreeOperator:
    """Freeze the tangent state at u and return the matrix-free operator
    (SURVEY.md C12 matrix-free mode)."""
    state, fe = TangentState.freeze(u, conn, geom, material)
    f_int = scatter(fe)
    diag = scatter(element_diag_blocks(u[conn], geom, material))

    def matvec(v):
        return apply_tangent(state, v, conn, geom, material, scatter)

    return MatFreeOperator(matvec=matvec, f_int=f_int, diag_blocks=diag)
