"""Triplet-loss family. Ref `reid/losses/triplet_losses.py`.

Masked vectorized mining (no boolean gathers — XLA-friendly static shapes):
hard positives via masked max, hard negatives via masked min.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .utils import euclidean_dist, normalize, softmax_weights

_BIG = 1e9


def _pos_neg_masks(labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    eq = labels[:, None] == labels[None, :]
    return eq.astype(jnp.float32), (~eq).astype(jnp.float32)


def weighted_regularized_triplet(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    normalize_feature: bool = False,
) -> jnp.ndarray:
    """Soft-margin triplet with softmax-weighted pos/neg aggregation.

    Ref triplet_losses.py:15-45 (WeightedRegularizedTriplet):
    loss = softplus(closest_negative - furthest_positive), where both are
    softmax-weighted expectations; SoftMarginLoss(x, y=1) == softplus(-x).
    """
    feat = normalize(embeddings) if normalize_feature else embeddings
    dist = euclidean_dist(feat, feat)
    is_pos, is_neg = _pos_neg_masks(labels)
    dist_ap = dist * is_pos
    dist_an = dist * is_neg
    w_ap = softmax_weights(dist_ap, is_pos)
    w_an = softmax_weights(-dist_an, is_neg)
    furthest_pos = jnp.sum(dist_ap * w_ap, axis=1)
    closest_neg = jnp.sum(dist_an * w_an, axis=1)
    per_anchor = jax.nn.softplus(-(closest_neg - furthest_pos))
    if weights is not None:
        return jnp.sum(per_anchor * weights)
    return jnp.mean(per_anchor)


def hard_example_mining(
    dist: jnp.ndarray, labels: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-hard mining: per anchor the max positive / min negative distance.

    Ref triplet_losses.py:72-124; masked max/min instead of boolean view.
    """
    is_pos, is_neg = _pos_neg_masks(labels)
    dist_ap = jnp.max(dist - (1.0 - is_pos) * _BIG, axis=1)
    dist_an = jnp.min(dist + (1.0 - is_neg) * _BIG, axis=1)
    return dist_ap, dist_an


def triplet_loss_batch_hard(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.3,
    alpha: float = 0.0,
    smooth: bool = False,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batch-hard margin ranking triplet. Ref triplet_losses.py:127-172.

    MarginRankingLoss(an, ap, y=1) == relu(margin - (an - ap));
    `smooth` switches to the softplus soft-margin form with margin folded in.
    `alpha` is the reference's distance-penalty coefficient on dist_ap.
    """
    dist = euclidean_dist(embeddings, embeddings)
    dist_ap, dist_an = hard_example_mining(dist, labels)
    gap = dist_an - (1.0 + alpha) * dist_ap
    if smooth:
        per_anchor = jax.nn.softplus(margin - gap)
    else:
        per_anchor = jnp.maximum(margin - gap, 0.0)
    if weights is not None:
        return jnp.sum(per_anchor * weights)
    return jnp.mean(per_anchor)


def triplet_beta(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    embeddings_augment: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    margin: float = 0.3,
    beta: float = 0.0,
) -> jnp.ndarray:
    """Beta-penalized triplet with optional augmented-view mining.

    Ref triplet_losses.py:175-233 (TripletBeta) + :48-69 (TripletLossPenalty):
    loss = relu(-((1-b)*d_an - (1+b)*d_ap) + (1-b)/(1+b)*margin).
    When an augmented view is given, positives are mined from it.
    """
    dist = euclidean_dist(embeddings, embeddings)
    if embeddings_augment is not None:
        dist_aug = euclidean_dist(embeddings, embeddings_augment)
        is_pos, _ = _pos_neg_masks(labels)
        dist_ap = jnp.max(dist_aug - (1.0 - is_pos) * _BIG, axis=1)
        _, dist_an = hard_example_mining(dist, labels)
    else:
        dist_ap, dist_an = hard_example_mining(dist, labels)
    pen_margin = (1.0 - beta) * margin / (1.0 + beta)
    per_anchor = jnp.maximum(
        -((1.0 - beta) * dist_an - (1.0 + beta) * dist_ap) + pen_margin, 0.0
    )
    if weights is not None:
        return jnp.sum(per_anchor * weights)
    return jnp.mean(per_anchor)


def semi_hard_triplet(
    embeddings: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.3
) -> jnp.ndarray:
    """TF-style semi-hard triplet. Ref triplet_losses.py:236-349.

    For each anchor-positive pair pick the hardest negative inside the margin
    band (d_an > d_ap), falling back to the easiest negative overall.
    """
    dist = euclidean_dist(embeddings, embeddings)
    n = dist.shape[0]
    is_pos, is_neg = _pos_neg_masks(labels)
    # negatives_outside[i, j]: min over k of d(i, k) s.t. neg and d(i,k) > d(i,j)
    d_ij = dist[:, :, None]               # anchor-positive
    d_ik = dist[:, None, :]               # anchor-negative candidates
    valid_neg = is_neg[:, None, :]
    outside_mask = valid_neg * (d_ik > d_ij)
    neg_outside = jnp.min(d_ik + (1 - outside_mask) * _BIG, axis=2)
    has_outside = jnp.any(outside_mask > 0, axis=2)
    neg_easiest = jnp.max(d_ik * valid_neg, axis=2)
    semi = jnp.where(has_outside, neg_outside, neg_easiest)
    eye = jnp.eye(n)
    pair_mask = is_pos - eye
    per_pair = jnp.maximum(margin + dist - semi, 0.0) * pair_mask
    num_pos = jnp.maximum(jnp.sum(pair_mask), 1.0)
    return jnp.sum(per_pair) / num_pos
