"""Autodiff hyperelasticity: materials defined by their strain energy only.

A capability the C reference cannot have (SURVEY.md C6/C7 list hand-derived
S and CC): subclass `AutodiffMaterial`, implement `energy(C)`, and the 2nd
Piola-Kirchhoff stress and the consistent tangent action come from JAX
autodiff —

    S       = 2 dW/dC              (jax.grad, symmetrized)
    CC : dE = dS along dC = 2 dE   (jax.jvp through S)

so Newton keeps quadratic convergence for ANY smooth W. Autodiff materials
use the generic tangent-contraction path in the element kernels (no
factored isotropic form), i.e. the f64 solver backends; the shipped
closed-form SVK/neo-Hookean remain the mixed-precision fast path.

`MooneyRivlin` (compressible, two-term) is provided as the showcase.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fea_large_tpu.materials.base import Material, register_material
from fea_large_tpu.ops.smallmat import det3


class AutodiffMaterial(Material):
    """Base: implement `energy(C)` ([.., 3, 3] -> [..]); S and the tangent
    action are derived automatically."""

    def _energy_single(self, C):
        return self.energy(C[None])[0]

    def pk2(self, C):
        batch = C.shape[:-2]
        flat = C.reshape(-1, 3, 3)
        g = jax.vmap(jax.grad(self._energy_single))(flat)
        S = g + jnp.swapaxes(g, -1, -2)  # 2 * sym(dW/dC)
        return S.reshape(*batch, 3, 3)

    def pk2_and_state(self, C):
        return self.pk2(C), C

    def tangent_apply(self, state, X):
        """CC : sym(X) = d/dt S(C + 2 t sym(X)) at t=0 (dE = dC/2)."""
        C = state
        Xs = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        Xb = jnp.broadcast_to(Xs, C.shape) if Xs.shape != C.shape else Xs
        _, dS = jax.jvp(self.pk2, (C,), (2.0 * Xb,))
        return dS


@register_material("mooney_rivlin", aliases=("mooney-rivlin", "mr"))
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MooneyRivlin(AutodiffMaterial):
    """Compressible two-term Mooney-Rivlin with an isochoric/volumetric
    split:

      W = c10 (I1_bar - 3) + c01 (I2_bar - 3) + kappa/2 (J - 1)^2,
      I1_bar = J^{-2/3} tr C,  I2_bar = J^{-4/3} (tr C)^2 - tr(C^2)) / 2.

    Parameterized through the base (lam, mu) for registry compatibility:
    c10 + c01 = mu/2 (consistent small-strain shear modulus) with the split
    c01 = BETA * mu/2, and kappa = lam + 2 mu / 3 (small-strain bulk).
    """

    BETA = 0.3  # c01 fraction of mu/2

    def energy(self, C):
        mu, lam = self.mu, self.lam
        c01 = 0.5 * mu * self.BETA
        c10 = 0.5 * mu - c01
        kappa = lam + 2.0 * mu / 3.0
        J = jnp.sqrt(det3(C))
        I1 = jnp.trace(C, axis1=-2, axis2=-1)
        I2 = 0.5 * (I1**2 - jnp.trace(C @ C, axis1=-2, axis2=-1))
        I1b = J ** (-2.0 / 3.0) * I1
        I2b = J ** (-4.0 / 3.0) * I2
        return c10 * (I1b - 3.0) + c01 * (I2b - 3.0) + 0.5 * kappa * (J - 1.0) ** 2
