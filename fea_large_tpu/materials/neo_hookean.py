"""Compressible neo-Hookean material, Ciarlet/Simo form (SURVEY.md §5.4, C7;
variant choice = survey ambiguity A1, default Ciarlet).

  W  = mu/2 (I_C - 3) - mu ln J + lam/2 (ln J)^2,      J^2 = det C
  S  = mu (I - C^{-1}) + lam ln J C^{-1}
  CC = lam C^{-1} (x) C^{-1} + 2 (mu - lam ln J) II_{C^{-1}}
  where (II_{A})_IJKL = (A_IK A_JL + A_IL A_JK) / 2.

Verified in the survey session: S = 2 dW/dC to 2.4e-17 and dS = CC : dE to
2e-11 (FD-limited) — SURVEY.md §5.4.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fea_large_tpu.materials.base import Material, register_material
from fea_large_tpu.ops.smallmat import det3, eye3, inv_det3


@register_material("neo_hookean", aliases=("neohookean", "nh", "neo-hookean"))
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NeoHookean(Material):
    def energy(self, C):
        J = jnp.sqrt(det3(C))
        lnJ = jnp.log(J)
        IC = jnp.trace(C, axis1=-2, axis2=-1)
        return 0.5 * self.mu * (IC - 3.0) - self.mu * lnJ + 0.5 * self.lam * lnJ**2

    def pk2_and_state(self, C):
        Cinv, detC = inv_det3(C)
        lnJ = 0.5 * jnp.log(detC)
        S = self.mu * (eye3(C.dtype) - Cinv) + self.lam * lnJ[..., None, None] * Cinv
        return S, (Cinv, lnJ)

    def pk2(self, C):
        return self.pk2_and_state(C)[0]

    def tangent_apply(self, state, X):
        """CC : sym(X) = lam (C^{-1}:X) C^{-1} + 2 (mu - lam lnJ) C^{-1} sym(X) C^{-1}.

        (The II_{C^{-1}} term contracted with a symmetric argument collapses to
        C^{-1} X_sym C^{-1}.)
        """
        Cinv, lnJ = state
        Xs = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        cx = jnp.sum(Cinv * Xs, axis=(-2, -1))
        coef = 2.0 * (self.mu - self.lam * lnJ)
        return (
            self.lam * cx[..., None, None] * Cinv
            + coef[..., None, None] * (Cinv @ Xs @ Cinv)
        )

    def iso_tangent_factors(self, state, C):
        # CC = lam C^-1 (x) C^-1 + 2(mu - lam lnJ) II_{C^-1}
        Cinv, lnJ = state
        batch = Cinv.shape[:-2]
        return (
            jnp.broadcast_to(self.lam, batch),
            Cinv,
            2.0 * (self.mu - self.lam * lnJ),
        )


@register_material(
    "neo_hookean_vol", aliases=("nh_vol", "neo-hookean-vol", "a1")
)
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NeoHookeanVolumetric(Material):
    """Compressible neo-Hookean, volumetric-split variant (the ALTERNATE
    form of survey ambiguity A1 — SURVEY.md §5.7: "keep both behind the
    material registry"; the default remains the Ciarlet form above).

      W  = mu/2 (I_C - 3) - mu ln J + kappa/2 (J - 1)^2,   kappa = lam
      S  = mu (I - C^{-1}) + kappa J (J - 1) C^{-1}
      CC = kappa J (2J - 1) C^{-1} (x) C^{-1}
           + 2 (mu - kappa J (J - 1)) II_{C^{-1}}

    (S = 2 dW/dC via dJ/dC = (J/2) C^{-1}; the CC follows from
    d(J(J-1)) = (2J-1) dJ and d C^{-1} = -C^{-1} dC C^{-1}. FD-verified in
    tests/test_materials.py like the other closed forms.) Same factored
    isotropic structure alpha A (x) A + beta II_A as the Ciarlet form, so
    it runs on every backend including the SoA mixed-precision fast path.
    """

    def energy(self, C):
        J = jnp.sqrt(det3(C))
        IC = jnp.trace(C, axis1=-2, axis2=-1)
        return (
            0.5 * self.mu * (IC - 3.0)
            - self.mu * jnp.log(J)
            + 0.5 * self.lam * (J - 1.0) ** 2
        )

    def pk2_and_state(self, C):
        Cinv, detC = inv_det3(C)
        J = jnp.sqrt(detC)
        S = (
            self.mu * (eye3(C.dtype) - Cinv)
            + (self.lam * J * (J - 1.0))[..., None, None] * Cinv
        )
        return S, (Cinv, J)

    def pk2(self, C):
        return self.pk2_and_state(C)[0]

    def tangent_apply(self, state, X):
        Cinv, J = state
        Xs = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        cx = jnp.sum(Cinv * Xs, axis=(-2, -1))
        alpha = self.lam * J * (2.0 * J - 1.0)
        beta = 2.0 * (self.mu - self.lam * J * (J - 1.0))
        return (
            (alpha * cx)[..., None, None] * Cinv
            + beta[..., None, None] * (Cinv @ Xs @ Cinv)
        )

    def iso_tangent_factors(self, state, C):
        Cinv, J = state
        return (
            self.lam * J * (2.0 * J - 1.0),
            Cinv,
            2.0 * (self.mu - self.lam * J * (J - 1.0)),
        )
