"""Small dense-matrix primitives (3x3) used inside element kernels.

TPU-native replacement for the reference's dense-matrix helper module
(SURVEY.md C11). Everything is expressed in closed form (adjugate/cofactor)
because f64 LU is unimplemented on this TPU (SURVEY.md §9 risk 5):
``jnp.linalg.inv`` must never appear on the hot path.

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(a: jnp.ndarray) -> jnp.ndarray:
    """Determinant of [..., 3, 3]."""
    return (
        a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
        - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
        + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0])
    )


def adjugate3(a: jnp.ndarray) -> jnp.ndarray:
    """Adjugate (transposed cofactor matrix) of [..., 3, 3]."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    # adj = cof^T; rows below are already the transpose.
    return jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )


def inv3(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of [..., 3, 3] via the adjugate formula."""
    return adjugate3(a) / det3(a)[..., None, None]


def inv_det3(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(inverse, determinant) of [..., 3, 3] sharing one adjugate evaluation."""
    d = det3(a)
    return adjugate3(a) / d[..., None, None], d


def sym3(a: jnp.ndarray) -> jnp.ndarray:
    """Symmetric part of [..., 3, 3]."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def eye3(dtype, batch_shape=()) -> jnp.ndarray:
    i = jnp.eye(3, dtype=dtype)
    return jnp.broadcast_to(i, (*batch_shape, 3, 3))
