"""Constitutive-model tests (SURVEY.md §5.4, §6): S = 2 dW/dC and
dS = CC : dE, per material, to finite-difference precision."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fea_large_tpu.materials import make_material, lame_from_E_nu, MATERIAL_REGISTRY

MATERIALS = ["svk", "neo_hookean", "neo_hookean_vol"]


def _random_C(rng, batch=()):
    F = np.eye(3) + 0.25 * (rng.random((*batch, 3, 3)) - 0.5)
    C = np.einsum("...ki,...kj->...ij", F, F)
    return jnp.asarray(C)


@pytest.mark.parametrize("name", MATERIALS)
def test_pk2_is_energy_gradient(name, rng):
    mat = make_material(name, lam=2.0, mu=1.3)
    C = _random_C(rng)
    dW = jax.grad(mat.energy)(C)
    S = mat.pk2(C)
    # S = 2 dW/dC (symmetrized gradient: W treats C as 9 independent entries)
    assert float(jnp.abs(dW + dW.T - S).max()) < 1e-12


@pytest.mark.parametrize("name", MATERIALS)
def test_tangent_consistency_fd(name, rng):
    mat = make_material(name, lam=2.0, mu=1.3)
    C = _random_C(rng)
    CC = mat.tangent_full(C)
    dC = rng.random((3, 3))
    dC = 1e-6 * (dC + dC.T) / 2
    dS_fd = (mat.pk2(C + dC) - mat.pk2(C - dC)) / 2.0
    dS_cc = jnp.einsum("IJKL,KL->IJ", CC, jnp.asarray(dC) / 2.0)  # dE = dC/2
    assert float(jnp.abs(dS_fd - dS_cc).max()) < 1e-10


@pytest.mark.parametrize("name", MATERIALS)
def test_tangent_symmetries(name, rng):
    mat = make_material(name, lam=2.0, mu=1.3)
    CC = mat.tangent_full(_random_C(rng))
    assert float(jnp.abs(CC - jnp.einsum("IJKL->JIKL", CC)).max()) < 1e-12
    assert float(jnp.abs(CC - jnp.einsum("IJKL->IJLK", CC)).max()) < 1e-12
    assert float(jnp.abs(CC - jnp.einsum("IJKL->KLIJ", CC)).max()) < 1e-12


@pytest.mark.parametrize("name", MATERIALS)
def test_stress_free_reference_state(name):
    mat = make_material(name, lam=2.0, mu=1.3)
    S = mat.pk2(jnp.eye(3, dtype=jnp.float64))
    assert float(jnp.abs(S).max()) < 1e-14


@pytest.mark.parametrize("name", MATERIALS)
def test_batched_evaluation(name, rng):
    mat = make_material(name, lam=2.0, mu=1.3)
    C = _random_C(rng, batch=(5, 7))
    S, state = mat.pk2_and_state(C)
    assert S.shape == (5, 7, 3, 3)
    single = mat.pk2(C[2, 3])
    assert float(jnp.abs(S[2, 3] - single).max()) < 1e-14


def test_small_strain_limit_agreement(rng):
    """For infinitesimal strains both models must agree with linear
    elasticity (and each other)."""
    svk = make_material("svk", lam=2.0, mu=1.3)
    nh = make_material("neo_hookean", lam=2.0, mu=1.3)
    eps = 1e-7 * (rng.random((3, 3)) - 0.5)
    eps = (eps + eps.T) / 2
    C = jnp.asarray(np.eye(3) + 2 * eps)  # E ~= eps
    S_svk, S_nh = svk.pk2(C), nh.pk2(C)
    assert float(jnp.abs(S_svk - S_nh).max()) < 1e-12


def test_lame_from_E_nu():
    lam, mu = lame_from_E_nu(E=1.0, nu=0.25)
    assert abs(lam - 0.4) < 1e-14
    assert abs(mu - 0.4) < 1e-14


def test_registry_aliases():
    assert MATERIAL_REGISTRY["a5"] is MATERIAL_REGISTRY["svk"]  # upstream naming
    assert MATERIAL_REGISTRY["nh"] is MATERIAL_REGISTRY["neo_hookean"]
