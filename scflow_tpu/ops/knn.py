"""Brute-force nearest neighbors on the MXU.

Replaces pytorch3d `knn_points` (CUDA) used by the point-matching losses
(models/loss/point_matching_loss.py:94,192): mesh vertex counts are a few
thousand, so an all-pairs distance matrix is one small matmul — ideal for TPU.
"""

from typing import Tuple

import jax.numpy as jnp


def nn_points(
    query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each query point, the index/squared-distance of its nearest ref point.

    query: (..., M, 3); ref: (..., N, 3); ref_valid: optional (..., N) bool
    (padded vertex banks).  Returns (idx (..., M) int32, sqdist (..., M)).
    """
    q2 = jnp.sum(query**2, axis=-1, keepdims=True)  # (..., M, 1)
    r2 = jnp.sum(ref**2, axis=-1)[..., None, :]  # (..., 1, N)
    qr = jnp.einsum(
        "...mc,...nc->...mn", query, ref, preferred_element_type=jnp.float32
    )
    d2 = q2 + r2 - 2.0 * qr
    if ref_valid is not None:
        d2 = jnp.where(ref_valid[..., None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    best = jnp.min(d2, axis=-1)
    return idx, best
