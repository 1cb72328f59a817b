"""Hyperelastic material interface (SURVEY.md C6/C7, §5.4).

A material is defined in the total-Lagrangian frame by the 2nd
Piola-Kirchhoff stress ``S(C)`` and the consistent tangent
``CC = 2 dS/dC`` (so that ``dS = CC : dE`` with ``E = (C - I)/2``).

The interface is deliberately *contraction-based*: element kernels never
materialize the rank-4 tangent on device. ``tangent_apply(C, X)`` computes
``CC : sym(X)`` directly, which keeps the per-quadrature-point state at a few
3x3 matrices (MXU/VPU friendly, bounded VMEM in the Pallas path). The full
rank-4 tensor is only built by ``tangent_full`` for finite-difference tests.

Materials are registered by name so task files (`io.task`) can select them —
the TPU analog of the reference's model-dispatch table (upstream "A5" = SVK
family; SURVEY.md C6).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Material:
    """Base class: Lame-parameterized hyperelastic material.

    ``lam``/``mu`` are traced leaves (a pytree), so one compiled kernel
    serves any parameter values; the material *type* is a static argument
    selecting a jit specialization (SURVEY.md C7).
    """

    lam: jnp.ndarray
    mu: jnp.ndarray

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.lam, self.mu), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- interface ----------------------------------------------------------
    name: str = dataclasses.field(default="base", init=False, repr=False)

    def energy(self, C: jnp.ndarray) -> jnp.ndarray:
        """Strain-energy density W(C); batched over leading dims of [..,3,3]."""
        raise NotImplementedError

    def pk2(self, C: jnp.ndarray) -> jnp.ndarray:
        """2nd Piola-Kirchhoff stress S(C) [.., 3, 3]."""
        raise NotImplementedError

    def pk2_and_state(self, C: jnp.ndarray):
        """(S, aux_state) where aux_state carries whatever ``tangent_apply``
        needs (e.g. C^{-1}, ln J) so it is computed once per quad point."""
        return self.pk2(C), None

    def tangent_apply(self, state, X: jnp.ndarray) -> jnp.ndarray:
        """CC : sym(X) for X [.., 3, 3], given aux state from
        ``pk2_and_state``. Must broadcast over leading batch dims of X that
        extend the state's batch dims."""
        raise NotImplementedError

    def iso_tangent_factors(self, state, C: jnp.ndarray):
        """Optional factored tangent CC = alpha A (x) A + beta II_A, i.e.
        CC : X = alpha (A:X) A + beta A X_sym A, with A symmetric.

        Returns (alpha [..], A [.., 3, 3], beta [..]) batched like C, or
        None if the material's tangent has no such isotropic form. Element
        kernels use this to build stiffness/diagonal blocks WITHOUT
        materializing per-probe rank-6 intermediates (the generic
        ``tangent_apply`` contraction needs an [E,q,npe,3,3,3] probe tensor
        — gigabytes at the 1M-DOF scale; the factored form needs only
        [E,q,npe,npe] and [E,q,3,3] temporaries). Both shipped materials
        (SVK: A=I; neo-Hookean: A=C^-1) have the form.
        """
        return None

    def tangent_full(self, C: jnp.ndarray) -> jnp.ndarray:
        """Rank-4 tangent CC [.., 3,3,3,3] = 2 dS/dC. Test-only reference
        implementation built by probing ``tangent_apply`` with basis
        matrices."""
        _, state = self.pk2_and_state(C)
        basis = jnp.eye(9, dtype=C.dtype).reshape(9, 3, 3)

        def col(Eb):
            # CC : sym(Eb), broadcast Eb over the batch of C
            Xb = jnp.broadcast_to(Eb, C.shape)
            return self.tangent_apply(state, Xb)

        cols = jax.vmap(col)(basis)  # [9, .., 3, 3]: axis 0 = probe (K,L), trailing = (I,J)
        cc = cols.reshape(3, 3, *C.shape[:-2], 3, 3)
        # minor symmetry in (K,L) makes CC : sym(e_K e_L^T) == CC[.., K, L]
        return jnp.moveaxis(cc, (0, 1), (-2, -1))  # [.., I, J, K, L]


def lame_from_E_nu(E: float, nu: float) -> tuple[float, float]:
    """Lame parameters (lambda, mu) from Young's modulus / Poisson ratio."""
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    return lam, mu


MATERIAL_REGISTRY: dict[str, Callable[..., Material]] = {}


def register_material(name: str, aliases: tuple[str, ...] = ()):
    def deco(cls):
        MATERIAL_REGISTRY[name] = cls
        for a in aliases:
            MATERIAL_REGISTRY[a] = cls
        cls.name = name
        return cls

    return deco


def make_material(
    name: str,
    *,
    lam: float | None = None,
    mu: float | None = None,
    E: float | None = None,
    nu: float | None = None,
    dtype=jnp.float64,
) -> Material:
    """Create a registered material from either Lame or (E, nu) constants."""
    if (lam is None) != (mu is None):
        raise ValueError("give both lam and mu, or neither")
    if lam is None:
        if E is None or nu is None:
            raise ValueError("give (lam, mu) or (E, nu)")
        lam, mu = lame_from_E_nu(E, nu)
    cls = MATERIAL_REGISTRY[name.lower()]
    return cls(jnp.asarray(lam, dtype), jnp.asarray(mu, dtype))
