"""Batched element kernels: internal force, consistent tangent, diagonal
blocks, and the matrix-free tangent action (SURVEY.md C5/C8, §5.1, §5.5).

This is the pure-XLA f64 parity path: everything is expressed as batched
einsums over an element axis so XLA tiles the contractions onto the MXU and
fuses the elementwise constitutive update into them. The f32 Pallas variant
of the same math lives in `fea_large_tpu.ops.pallas_kernels`.

Notation (SURVEY.md §5):
  coords   f64[N, 3]      material nodal coordinates X
  conn     i32[E, npe]    element connectivity
  u        f64[N, 3]      nodal displacements
  gradN    f64[E, q, npe, 3]   material shape-function gradients (precomputed)
  detJxW   f64[E, q]           det(J_iso) * w_q                 (precomputed)
  F        f64[E, q, 3, 3]     deformation gradient
  S        f64[E, q, 3, 3]     2nd Piola-Kirchhoff stress

Element integrals (all verified to FD precision in the survey session):
  fe[a,i]        = sum_q V_q (F S)_iJ gradN[a,J]
  Ke[a,i,b,k]    = sum_q V_q ( D[a,i]:CC:D[b,k] + gradN[a]·S·gradN[b] d_ik )
  with D[a,i]_IJ = F_iI gradN[a,J]  (so sym(D[a,i]) = dE for unit du[a,i]).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fea_large_tpu.elements.reference import ElementType
from fea_large_tpu.materials.base import Material
from fea_large_tpu.ops.smallmat import inv_det3


class ElementGeometry(NamedTuple):
    """Geometry-only precompute, done once per mesh (SURVEY.md §4.1
    `solver_create/precompute`): material gradients and quadrature volumes."""

    gradN: jnp.ndarray  # [E, q, npe, 3]
    detJxW: jnp.ndarray  # [E, q]


@partial(jax.jit, static_argnames="elem")
def precompute_geometry(
    coords: jnp.ndarray, conn: jnp.ndarray, elem: ElementType
) -> ElementGeometry:
    """Per-element, per-quad-point material shape gradients and volumes.

    J_iso[i,j] = sum_a X[a,i] dN_a/dxi_j;  gradN[a,i] = dN_a/dxi_j (J^-1)[j,i];
    detJxW = det(J_iso) w_q. (SURVEY.md §5.2.) Jitted: eager per-op dispatch
    is expensive on remote-tunnel TPU backends.
    """
    Xe = coords[conn]  # [E, npe, 3]
    dN = jnp.asarray(elem.shape_grad, coords.dtype)  # [q, npe, 3]
    J = jnp.einsum("eai,qaj->eqij", Xe, dN)
    Jinv, detJ = inv_det3(J)
    gradN = jnp.einsum("qaj,eqji->eqai", dN, Jinv)
    w = jnp.asarray(elem.quad_weights, coords.dtype)
    return ElementGeometry(gradN=gradN, detJxW=detJ * w[None, :])


def deformation_gradient(ue: jnp.ndarray, gradN: jnp.ndarray) -> jnp.ndarray:
    """F = I + sum_a u_a (x) gradN_a : [E, q, 3, 3] from ue [E, npe, 3]."""
    F = jnp.einsum("eai,eqaJ->eqiJ", ue, gradN)
    return F + jnp.eye(3, dtype=ue.dtype)


def _stress_state(ue, gradN, material: Material):
    F = deformation_gradient(ue, gradN)
    C = jnp.einsum("eqiI,eqiJ->eqIJ", F, F)  # F^T F
    S, state = material.pk2_and_state(C)
    return F, C, S, state


def element_internal_force(
    ue: jnp.ndarray, geom: ElementGeometry, material: Material
) -> jnp.ndarray:
    """fe [E, npe, 3]: fe[a,i] = sum_q V_q (F S)_iJ gradN[a,J]."""
    F, _, S, _ = _stress_state(ue, geom.gradN, material)
    P = jnp.einsum("eqiI,eqIJ->eqiJ", F, S)  # 1st Piola-Kirchhoff
    return jnp.einsum("eq,eqiJ,eqaJ->eai", geom.detJxW, P, geom.gradN)


def _tangent_probe(F: jnp.ndarray, gradN: jnp.ndarray) -> jnp.ndarray:
    """D[e,q,a,i,I,J] = F_iI gradN[a,J]: dE for a unit displacement of
    (node a, component i) is sym(D[a,i])."""
    return jnp.einsum("eqiI,eqaJ->eqaiIJ", F, gradN)


def _tangent_contract(material, state, D):
    """Y[e,q,a,i] = CC : sym(D[a,i]) without materializing rank-4 CC.

    The material's ``tangent_apply`` broadcasts over the [E, q] batch of
    ``state``; the probe axes (a, i) are vmapped to the front.
    """
    Dm = jnp.moveaxis(D, (2, 3), (0, 1))  # [a, i, E, q, 3, 3]
    Y = jax.vmap(jax.vmap(lambda X: material.tangent_apply(state, X)))(Dm)
    return jnp.moveaxis(Y, (0, 1), (2, 3))  # [E, q, a, i, 3, 3]


def _iso_stiffness_pieces(F, gradN, alpha, A, beta):
    """Factored material-tangent building blocks (CC = alpha A(x)A + beta
    II_A — `Material.iso_tangent_factors`):

      s[a,i]  = (F A)_iJ g_a[J]          [E,q,npe,3]
      B_ik    = (F A F^T)_ik             [E,q,3,3]
      G_ab    = g_a . A . g_b            [E,q,npe,npe]

    so that  D_ai : CC : D_bk = alpha s_ai s_bk
                              + beta/2 (B_ik G_ab + s_ak s_bi).
    Memory stays O(npe^2 + npe*3) per quad point — no rank-6 probes.
    """
    FA = jnp.einsum("eqiI,eqIJ->eqiJ", F, A)
    s = jnp.einsum("eqiJ,eqaJ->eqai", FA, gradN)
    B = jnp.einsum("eqiJ,eqkJ->eqik", FA, F)
    G = jnp.einsum("eqaI,eqIJ,eqbJ->eqab", gradN, A, gradN)
    return s, B, G


def element_stiffness(
    ue: jnp.ndarray, geom: ElementGeometry, material: Material
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Ke [E, npe, 3, npe, 3], fe [E, npe, 3]) — consistent tangent with
    material + geometric terms and the internal force (SURVEY.md §5.5).
    """
    gradN, V = geom.gradN, geom.detJxW
    F, C, S, state = _stress_state(ue, gradN, material)
    P = jnp.einsum("eqiI,eqIJ->eqiJ", F, S)
    fe = jnp.einsum("eq,eqiJ,eqaJ->eai", V, P, gradN)

    factors = material.iso_tangent_factors(state, C)
    if factors is not None:
        alpha, A, beta = factors
        s, B, G = _iso_stiffness_pieces(F, gradN, alpha, A, beta)
        Ke_mat = (
            jnp.einsum("eq,eqai,eqbk->eaibk", V * alpha, s, s)
            + 0.5 * jnp.einsum("eq,eqik,eqab->eaibk", V * beta, B, G)
            + 0.5 * jnp.einsum("eq,eqak,eqbi->eaibk", V * beta, s, s)
        )
    else:  # generic contraction fallback (memory O(npe*9) per probe)
        D = _tangent_probe(F, gradN)  # [E,q,a,i,3,3]
        Y = _tangent_contract(material, state, D)  # CC : sym(D)
        Ke_mat = jnp.einsum("eq,eqaiIJ,eqbkIJ->eaibk", V, D, Y)

    G = jnp.einsum("eq,eqaI,eqIJ,eqbJ->eab", V, gradN, S, gradN)
    Ke_geo = G[:, :, None, :, None] * jnp.eye(3, dtype=ue.dtype)[None, None, :, None, :]
    return Ke_mat + Ke_geo, fe


def element_diag_blocks(
    ue: jnp.ndarray, geom: ElementGeometry, material: Material
) -> jnp.ndarray:
    """Per-element nodal diagonal 3x3 blocks Ke[a, :, a, :] -> [E, npe, 3, 3].

    Used to build the block-Jacobi preconditioner without assembling K
    (SURVEY.md C12): scatter-add these over connectivity to get the global
    block diagonal.
    """
    gradN, V = geom.gradN, geom.detJxW
    F, C, S, state = _stress_state(ue, gradN, material)

    factors = material.iso_tangent_factors(state, C)
    if factors is not None:
        alpha, A, beta = factors
        s, B, G = _iso_stiffness_pieces(F, gradN, alpha, A, beta)
        diag_mat = jnp.einsum(
            "eq,eqai,eqak->eaik", V * (alpha + 0.5 * beta), s, s
        ) + 0.5 * jnp.einsum("eq,eqik,eqa->eaik", V * beta, B, jnp.einsum("eqaa->eqa", G))
    else:
        D = _tangent_probe(F, gradN)
        Y = _tangent_contract(material, state, D)
        diag_mat = jnp.einsum("eq,eqaiIJ,eqakIJ->eaik", V, D, Y)

    g = jnp.einsum("eq,eqaI,eqIJ,eqaJ->ea", V, gradN, S, gradN)
    return diag_mat + g[:, :, None, None] * jnp.eye(3, dtype=ue.dtype)
