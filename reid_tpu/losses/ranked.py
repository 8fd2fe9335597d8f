"""Ranked list loss (CVPR'19). Ref `reid/losses/ranked_losses.py:5-57`.

The reference loops over anchors in Python with ragged boolean gathers; here
the whole thing is one masked vectorized pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import euclidean_dist, normalize


def ranked_loss(
    global_feat: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 1.3,
    alpha: float = 2.0,
    tval: float = 1.0,
    normalize_feature: bool = True,
) -> jnp.ndarray:
    if normalize_feature:
        global_feat = normalize(global_feat)
    dist = euclidean_dist(global_feat, global_feat)
    n = dist.shape[0]
    is_pos = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    is_neg = 1.0 - is_pos

    # loss_ap: mean over positives of relu(d_ap + margin - alpha); the ref
    # denominator is the count of positive entries (+1e-5), ref :25-28.
    ap_val = jnp.maximum(dist + (margin - alpha), 0.0) * is_pos
    loss_ap = jnp.sum(ap_val, axis=1) / (jnp.sum(is_pos, axis=1) + 1e-5)

    # loss_an: weighted mean of (alpha - d_an) over negatives closer than
    # alpha, weights exp(tval * (alpha - d_an)), ref :30-36.
    close = is_neg * (dist < alpha)
    w = jnp.exp(tval * (alpha - dist)) * close
    w_sum = jnp.sum(w, axis=1) + 1e-5
    loss_an = jnp.sum((alpha - dist) * w, axis=1) / w_sum

    return jnp.mean(loss_ap + loss_an)
