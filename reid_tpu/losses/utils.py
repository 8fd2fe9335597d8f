"""Distance / weighting primitives. Ref `reid/losses/utils.py`.

The N x M pairwise Euclidean distance here is the hot kernel used by every
metric loss; at batch scale (<=256) XLA fuses it onto the MXU directly, so the
jnp implementation *is* the fast path. Gallery-scale distances use the Pallas
tiled kernel in `reid_tpu.ops.distance`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize. Ref utils.py:normalize_rank (:38-46) uses the same form."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def euclidean_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distance, sqrt(clamp(|x|^2+|y|^2-2xy, 1e-12)).

    Ref utils.py:21-35 (identical numerics incl. the clamp-then-sqrt).
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xx = jnp.sum(xf * xf, axis=1, keepdims=True)
    yy = jnp.sum(yf * yf, axis=1, keepdims=True)
    sq = xx + yy.T - 2.0 * jnp.dot(xf, yf.T, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.clip(sq, 1e-12, None))


def cosine_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity. Ref utils.py:12-18."""
    return 1.0 - jnp.dot(normalize(x.astype(jnp.float32)),
                         normalize(y.astype(jnp.float32)).T,
                         preferred_element_type=jnp.float32)


def softmax_weights(dist: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked softmax over axis 1. Ref utils.py:4-9."""
    max_v = jnp.max(dist * mask, axis=1, keepdims=True)
    diff = dist - max_v
    z = jnp.sum(jnp.exp(diff) * mask, axis=1, keepdims=True) + 1e-6
    return jnp.exp(diff) * mask / z
