"""St. Venant-Kirchhoff material (SURVEY.md §5.4, C6; upstream model family
"A5" in Lurie's classification).

  W  = lam/2 tr(E)^2 + mu E:E,          E = (C - I)/2
  S  = lam tr(E) I + 2 mu E
  CC_IJKL = lam d_IJ d_KL + mu (d_IK d_JL + d_IL d_JK)   (constant)

Verified in the survey session: dS = CC : dE to 5e-16 (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fea_large_tpu.materials.base import Material, register_material
from fea_large_tpu.ops.smallmat import eye3


@register_material("svk", aliases=("st_venant_kirchhoff", "a5"))
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StVenantKirchhoff(Material):
    def _strain(self, C):
        return 0.5 * (C - eye3(C.dtype))

    def energy(self, C):
        E = self._strain(C)
        trE = jnp.trace(E, axis1=-2, axis2=-1)
        return 0.5 * self.lam * trE**2 + self.mu * jnp.sum(E * E, axis=(-2, -1))

    def pk2(self, C):
        E = self._strain(C)
        trE = jnp.trace(E, axis1=-2, axis2=-1)
        return self.lam * trE[..., None, None] * eye3(C.dtype) + 2.0 * self.mu * E

    def pk2_and_state(self, C):
        return self.pk2(C), None

    def tangent_apply(self, state, X):
        # CC : sym(X) = lam tr(X) I + mu (X + X^T); tr(sym X) == tr X.
        trX = jnp.trace(X, axis1=-2, axis2=-1)
        return self.lam * trX[..., None, None] * eye3(X.dtype) + self.mu * (
            X + jnp.swapaxes(X, -1, -2)
        )

    def iso_tangent_factors(self, state, C):
        # CC : X = lam (I:X) I + 2 mu I X_sym I  ->  alpha=lam, A=I, beta=2mu
        batch = C.shape[:-2]
        return (
            jnp.broadcast_to(self.lam, batch),
            eye3(C.dtype, batch),
            jnp.broadcast_to(2.0 * self.mu, batch),
        )
