"""Circle loss (CVPR'20). Ref `reid/losses/circle_losses.py:9-66`.

The reference gathers upper-triangular pos/neg similarity pairs into ragged
vectors; here the same logsumexp is computed with masks (static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def circle_loss(
    normed_feature: jnp.ndarray,
    labels: jnp.ndarray,
    m: float = 0.35,
    gamma: float = 64.0,
) -> jnp.ndarray:
    """softplus(logsumexp(neg logits) + logsumexp(pos logits)) / B.

    Pairs: positives = upper triangle incl. diagonal of the same-label matrix;
    negatives = strict upper triangle of the different-label matrix
    (ref convert_label_to_similarity, :17-28).
    """
    sim = jnp.dot(normed_feature.astype(jnp.float32),
                  normed_feature.astype(jnp.float32).T,
                  preferred_element_type=jnp.float32)
    n = sim.shape[0]
    same = labels[:, None] == labels[None, :]
    iu = jnp.triu(jnp.ones((n, n), bool), k=0)
    iu1 = jnp.triu(jnp.ones((n, n), bool), k=1)
    pos_mask = same & iu
    neg_mask = (~same) & iu1

    sp = sim
    sn = sim
    ap = jnp.maximum(-jax.lax.stop_gradient(sp) + 1.0 + m, 0.0)
    an = jnp.maximum(jax.lax.stop_gradient(sn) + m, 0.0)
    logit_p = -ap * (sp - (1.0 - m)) * gamma
    logit_n = an * (sn - m) * gamma

    lse_p = jax.nn.logsumexp(jnp.where(pos_mask, logit_p, _NEG))
    lse_n = jax.nn.logsumexp(jnp.where(neg_mask, logit_n, _NEG))
    return jax.nn.softplus(lse_n + lse_p) / n
