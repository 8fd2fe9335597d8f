"""Inference post-processing: camera de-bias + tracklet smoothing.

Ref `reid/inference_utils.py`:
  - `diminish_camera_bias` (:5-15): per camera, mean-subtract then multiply by
    the ridge-regularized inverse Gram matrix P = (EᵀE + n*lambda*I)^-1, then
    L2-renormalize.
  - `smooth_tracklets` (:18-27): per tracklet group, 0.1*self + 0.9*group-mean,
    renormalized.

Both are batched linear algebra under jit; the per-camera solve is a few
512x512 Cholesky solves — trivial on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _l2n(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def diminish_camera_bias(
    embeddings: jnp.ndarray,
    cams: jnp.ndarray,
    lambda_reg: float = 0.05,
    num_cams: int | None = None,
) -> jnp.ndarray:
    """Per-camera whitening. Numerics follow ref inference_utils.py:5-15.

    For each camera c with n_c samples E_c (the reference snapshots
    `cur_embeddings` BEFORE in-place centering, so the Gram matrix uses the
    UNCENTERED embeddings):
      P = (E_cᵀE_c + n_c*lambda*I)^-1;  E_c <- (E_c - mean(E_c)) P
    then per-row L2 normalization. Default lambda 0.05 (ref `la=0.05`).
    """
    if num_cams is None:
        num_cams = int(jax.device_get(jnp.max(cams))) + 1
    x = embeddings.astype(jnp.float32)
    d = x.shape[1]
    out = x

    for c in range(num_cams):
        mask = (cams == c).astype(jnp.float32)[:, None]
        n_c = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(x * mask, axis=0, keepdims=True) / n_c
        raw = x * mask
        gram = jnp.dot(raw.T, raw, preferred_element_type=jnp.float32)
        p = jnp.linalg.inv(gram + n_c * lambda_reg * jnp.eye(d))
        centered = (x - mean) * mask
        whitened = jnp.dot(centered, p, preferred_element_type=jnp.float32)
        out = jnp.where(mask > 0, whitened, out)
    return _l2n(out)


def smooth_tracklets(
    embeddings: jnp.ndarray,
    tracklet_ids: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    alpha: float = 0.1,
) -> jnp.ndarray:
    """Blend each embedding with its tracklet mean: a*self + (1-a)*mean.

    Ref inference_utils.py:18-27 (alpha=0.1; the reference does NOT
    renormalize after blending). `tracklet_ids` < 0 or `valid`==False rows
    pass through unchanged (the reference's try/except skip). Implemented
    with segment sums — no Python loop over tracklets.
    """
    x = embeddings.astype(jnp.float32)
    ids = tracklet_ids.astype(jnp.int32)
    if valid is None:
        valid = ids >= 0
    safe_ids = jnp.where(valid, ids, 0)
    num_seg = int(jax.device_get(jnp.max(safe_ids))) + 1 if x.shape[0] else 1
    w = valid.astype(jnp.float32)[:, None]
    sums = jax.ops.segment_sum(x * w, safe_ids, num_segments=num_seg)
    counts = jax.ops.segment_sum(w, safe_ids, num_segments=num_seg)
    means = sums / jnp.maximum(counts, 1.0)
    blended = alpha * x + (1.0 - alpha) * means[safe_ids]
    return jnp.where(valid[:, None], blended, x)
