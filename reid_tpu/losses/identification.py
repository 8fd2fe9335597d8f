"""Identification (classification) losses. Ref `reid/losses/identification_losses.py`."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_label_smooth(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smoothing: float = 0.1,
    epsilon: float = 0.0,
    tao: float = 1.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Label-smoothed CE with temperature + poly-loss term.

    Ref identification_losses.py:39-75 (CrossEntropyLabelSmooth): targets are
    (1-smoothing)*onehot + smoothing/C, logits divided by temperature `tao`,
    plus poly-eps * (1 - pt).
    """
    n_cls = logits.shape[-1]
    logits = logits.astype(jnp.float32) / tao
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_cls)
    target = onehot * (1.0 - smoothing) + smoothing / n_cls
    per_sample = -jnp.sum(target * logp, axis=-1)
    if epsilon > 0:
        pt = jnp.sum(onehot * jax.nn.softmax(logits, axis=-1), axis=-1)
        per_sample = per_sample + epsilon * (1.0 - pt)
    if weights is not None:
        return jnp.sum(per_sample * weights)
    return jnp.mean(per_sample)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    epsilon: float = 0.0,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss + poly extension. Ref identification_losses.py:6-36."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    pt = jnp.sum(onehot * jnp.exp(logp), axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    loss = ((1.0 - pt) ** gamma) * ce
    if epsilon > 0:
        loss = loss + epsilon * (1.0 - pt) ** (gamma + 1.0)
    if class_weights is not None:
        loss = loss * class_weights[labels]
    return jnp.mean(loss)


def label_smoothing_nll(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1,
    epsilon: float = 0.0,
) -> jnp.ndarray:
    """NLL variant: smoothed mix of NLL and uniform mean-logprob.

    Ref identification_losses.py:78-105 (LabelSmoothing): loss =
    (1-smoothing)*nll + smoothing*mean(-logp) + poly term.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    if epsilon > 0:
        pt = jnp.exp(-nll)
        loss = loss + epsilon * (1.0 - pt)
    return jnp.mean(loss)
