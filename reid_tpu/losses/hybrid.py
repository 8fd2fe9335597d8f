"""Hybrid loss — the training objective. Ref `reid/losses/hybrid_losses.py`.

HybridLoss      = triplet (+WRT when margin==0) + lamda*center + cluster*DCC
                  (ref :9-46)
HybridLossWeighted adds label-smooth CE and per-sample weights for the
continual phase (ref :49-93).

State (centers + DCC luts) is an explicit pytree; centers receive gradients
(they are parameters in the reference), DCC luts are updated out-of-band via
`update_dcc_luts` in the train step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LossConfig
from .center import center_loss
from .dcc import DCCState, dcc_loss, init_dcc
from .identification import cross_entropy_label_smooth
from .triplet import (
    triplet_beta,
    triplet_loss_batch_hard,
    weighted_regularized_triplet,
)


class HybridLossState(NamedTuple):
    centers: jnp.ndarray   # (num_classes, feat_dim) — trainable (CenterLoss)
    dcc: DCCState


def init_hybrid_state(
    key: jax.Array, num_classes: int, feat_dim: int
) -> HybridLossState:
    """Centers are (C, feat_dim) like ref CenterLoss. The DCC tables are
    (C, C): the reference seeds them at epoch 0 with per-class means of the
    *logits* (generate_centers collects `feat[1]`, the classifier output —
    ref center_contrastive_losses.py:9-24,113-124 + image_reid_train.py:70-74),
    so DCC runs in logit space."""
    centers = jax.random.normal(key, (num_classes, feat_dim), jnp.float32)
    return HybridLossState(centers=centers, dcc=init_dcc(num_classes, num_classes))


def hybrid_loss(
    state: HybridLossState,
    embeddings: jnp.ndarray,
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: LossConfig,
    embeddings_augment: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Returns (total_loss, aux dict of components).

    Component selection mirrors the reference:
      margin > 0  -> batch-hard triplet (TripletBeta when weighted+augment)
      margin == 0 -> WeightedRegularizedTriplet
      + lamda * center + cluster_factor * DCC [+ smooth CE when cfg.use_ce]
    """
    if cfg.margin > 0:
        if weights is not None or embeddings_augment is not None:
            tri = triplet_beta(embeddings, labels, embeddings_augment, weights,
                               margin=cfg.margin)
        else:
            tri = triplet_loss_batch_hard(embeddings, labels, margin=cfg.margin)
    else:
        tri = weighted_regularized_triplet(embeddings, labels, weights)

    cen = center_loss(embeddings, labels, state.centers, weights)

    total = tri + cfg.center_lamda * cen
    aux = {"triplet": tri, "center": cen}

    if cfg.use_dcc and cfg.cluster_factor != 0.0:
        # DCC consumes the *logits* in the reference driver (HybridLoss
        # forward passes `outputs` to cluster_ce, hybrid_losses.py:41, and the
        # luts are seeded with class-mean logits at epoch 0).
        dcc = dcc_loss(logits, labels, state.dcc,
                       scalar=cfg.dcc_scalar, weight=cfg.dcc_weight)
        total = total + cfg.cluster_factor * dcc
        aux["dcc"] = dcc

    if cfg.use_ce:
        # The reference HybridLossWeighted applies the smoothed CE UNWEIGHTED
        # (`self.smooth(outputs, targets)`, hybrid_losses.py:85) — per-sample
        # weights gate only the triplet and center terms.
        ce = cross_entropy_label_smooth(
            logits, labels, cfg.smoothing, cfg.epsilon, cfg.tao, None
        )
        total = total + ce
        aux["ce"] = ce

    return total, aux
