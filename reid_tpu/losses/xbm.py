"""Cross-batch memory (XBM). Ref `reid/tricks/XBM.py` + `losses/triplet_losses_xbm.py`.

The reference's XBM is a fixed ring buffer of detached embeddings + labels
(K = 4 x batch). Functionally it is a carried pytree: (feats, labels, ptr).
Empty slots are marked with label -1 and masked out of the loss.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .utils import euclidean_dist, softmax_weights


class XBMState(NamedTuple):
    feats: jnp.ndarray    # (K, D)
    labels: jnp.ndarray   # (K,) int32; -1 = empty
    ptr: jnp.ndarray      # () int32 ring pointer


def init_xbm(memory_size: int, feat_dim: int) -> XBMState:
    return XBMState(
        feats=jnp.zeros((memory_size, feat_dim), jnp.float32),
        labels=-jnp.ones((memory_size,), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
    )


def xbm_enqueue(state: XBMState, feats: jnp.ndarray,
                labels: jnp.ndarray) -> XBMState:
    """Ring enqueue of a batch (ref XBM.py:21-30). Batch must divide K."""
    b = feats.shape[0]
    k = state.feats.shape[0]
    idx = (state.ptr + jnp.arange(b)) % k
    return XBMState(
        feats=state.feats.at[idx].set(jax.lax.stop_gradient(
            feats.astype(jnp.float32))),
        labels=state.labels.at[idx].set(labels.astype(jnp.int32)),
        ptr=(state.ptr + b) % k,
    )


def xbm_triplet_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    state: XBMState,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted-regularized triplet against the memory bank.

    Ref triplet_losses_xbm.py:14-46: rectangular B x K distance matrix; the
    identity diagonal (an anchor matching its own enqueued copy) is removed
    from the positive mask (ref :29). We instead mask exact-duplicate rows by
    position: the first B columns correspond to the batch itself only when the
    caller enqueues before the loss — we follow the reference driver order
    (enqueue first, ref image_reid_train_xbm.py:88-92) and mask positives with
    distance == 0 as self-matches.
    """
    feats_row = state.feats
    labels_row = state.labels
    dist = euclidean_dist(embeddings, feats_row)          # (B, K)
    valid = (labels_row >= 0)[None, :]
    is_pos = (labels[:, None] == labels_row[None, :]) & valid
    # drop self-matches (same label AND ~zero distance)
    is_pos = is_pos & (dist > 1e-4)
    is_neg = (labels[:, None] != labels_row[None, :]) & valid
    is_pos = is_pos.astype(jnp.float32)
    is_neg = is_neg.astype(jnp.float32)

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
