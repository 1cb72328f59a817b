"""Stress recovery and derived fields (SURVEY.md C16 postprocess).

The reference exports the deformed mesh; production use also wants stress
fields. Everything here is cold-path (once per converged load step):

  * per-quadrature-point 2nd Piola-Kirchhoff S and Cauchy stress
    sigma = J^-1 F S F^T (push-forward to the deformed configuration),
  * nodal averages (volume-weighted over adjacent quadrature points) for
    visualization,
  * von Mises equivalent stress.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fea_large_tpu.assembly.scatter import NodeScatter
from fea_large_tpu.elements.kernels import (
    ElementGeometry,
    deformation_gradient,
    precompute_geometry,
)
from fea_large_tpu.materials.base import Material
from fea_large_tpu.mesh.core import Mesh
from fea_large_tpu.ops.smallmat import det3


def quad_point_stress(u, conn, geom: ElementGeometry, material: Material):
    """(S [E,q,3,3], sigma [E,q,3,3], J [E,q]) at every quadrature point."""
    ue = u[conn]
    F = deformation_gradient(ue, geom.gradN)
    C = jnp.einsum("eqiI,eqiJ->eqIJ", F, F)
    S, _ = material.pk2_and_state(C)
    J = det3(F)
    sigma = jnp.einsum("eqiI,eqIJ,eqkJ->eqik", F, S, F) / J[..., None, None]
    return S, sigma, J


def von_mises(sigma):
    """Equivalent (von Mises) stress of [.., 3, 3] Cauchy tensors."""
    tr = jnp.trace(sigma, axis1=-2, axis2=-1)
    dev = sigma - (tr / 3.0)[..., None, None] * jnp.eye(3, dtype=sigma.dtype)
    return jnp.sqrt(1.5 * jnp.sum(dev * dev, axis=(-2, -1)))


@jax.jit
def _nodal_average(values_eq, detJxW, conn, scatter: NodeScatter):
    """Volume-weighted average of per-quad-point values [E, q, ...] onto
    nodes via the element's nodes (deterministic scatter)."""
    w = detJxW  # [E, q]
    wsum = jnp.sum(w, axis=1)  # [E]
    ve = jnp.einsum("eq,eq...->e...", w, values_eq) / wsum.reshape(
        wsum.shape + (1,) * (values_eq.ndim - 2)
    )
    npe = conn.shape[1]
    ve_nodes = jnp.repeat(ve[:, None], npe, axis=1)  # [E, npe, ...]
    num = scatter(ve_nodes)
    den = scatter(jnp.ones((conn.shape[0], npe), ve.dtype))
    return num / den.reshape(den.shape + (1,) * (num.ndim - 1))


def nodal_stress(mesh: Mesh, material: Material, u):
    """Nodal-averaged Cauchy stress [N, 3, 3] and von Mises [N] for a
    converged displacement field (host-facing; used by VTK export)."""
    geom = precompute_geometry(mesh.coords, mesh.conn, mesh.element)
    scatter = NodeScatter.build(mesh.conn_host, mesh.n_nodes)
    _, sigma, _ = quad_point_stress(u, mesh.conn, geom, material)
    sig_n = _nodal_average(sigma, geom.detJxW, mesh.conn, scatter)
    return sig_n, von_mises(sig_n)
