"""Center loss. Ref `reid/losses/center_losses.py:7-71`.

The learnable per-class centers are an explicit (num_classes, feat_dim) array
carried in the HybridLossState pytree; the reference's dedicated SGD(lr=0.5)
center optimizer with the 1/lambda gradient rescale lives in
`reid_tpu.train.optim` (ref image_reid_train.py:93-95).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def center_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    centers: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Squared distance of each embedding to its class center.

    Numerics mirror ref center_losses.py:41-71: full B x C distance matrix via
    |x|^2 + |c|^2 - 2xc', mask to own class, clamp [1e-12, 1e12], sum / B.
    """
    x = embeddings.astype(jnp.float32)
    c = centers.astype(jnp.float32)
    b = x.shape[0]
    distmat = (
        jnp.sum(x * x, axis=1, keepdims=True)
        + jnp.sum(c * c, axis=1)[None, :]
        - 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    )
    mask = labels[:, None] == jnp.arange(c.shape[0])[None, :]
    dist = jnp.clip(distmat * mask, 1e-12, 1e12)
    if weights is not None:
        return jnp.sum(jnp.sum(dist, axis=1) * weights)
    return jnp.sum(dist) / b
