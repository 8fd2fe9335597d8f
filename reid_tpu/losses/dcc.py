"""Dual cluster-contrastive (DCC) loss. Ref `reid/losses/center_contrastive_losses.py`.

The reference implements DCC as a custom autograd.Function whose *backward*
mutates two lookup tables (cluster-center lut_ccc, instance lut_icc) in place
(ref :41-64). In JAX the tables are explicit state: the loss treats them as
constants (stop_gradient — matching the reference, whose backward only
propagates through `inputs`), and `update_dcc_luts` produces the new tables,
called once per optimizer step exactly where the reference's backward fired.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .utils import normalize


class DCCState(NamedTuple):
    lut_ccc: jnp.ndarray  # (num_classes, feat_dim) cluster-center table
    lut_icc: jnp.ndarray  # (num_classes, feat_dim) instance table


def init_dcc(num_classes: int, feat_dim: int) -> DCCState:
    """Zero-init tables (ref :82-83); typically warm-started via class means
    computed by `generate_centers` (ref :113-124) — see
    `reid_tpu.train.image_train.seed_dcc_luts`."""
    z = jnp.zeros((num_classes, feat_dim), jnp.float32)
    return DCCState(lut_ccc=z, lut_icc=z)


def _smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def _ce_label_smooth(logits: jnp.ndarray, labels: jnp.ndarray,
                     smoothing: float = 0.1) -> jnp.ndarray:
    n_cls = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_cls)
    target = onehot * (1.0 - smoothing) + smoothing / n_cls
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def dcc_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    state: DCCState,
    scalar: float = 20.0,
    weight: float = 0.25,
) -> jnp.ndarray:
    """CE(scaled sims vs lut_ccc) + CE(vs lut_icc) + w * smoothL1 consistency.

    Ref :87-110. Gradients flow only through `embeddings` (tables are
    stop-gradient, matching the custom backward at ref :44-45).
    """
    lut_ccc = jax.lax.stop_gradient(state.lut_ccc)
    lut_icc = jax.lax.stop_gradient(state.lut_icc)
    x = embeddings.astype(jnp.float32)
    out_ccc = scalar * jnp.dot(x, lut_ccc.T, preferred_element_type=jnp.float32)
    out_icc = scalar * jnp.dot(x, lut_icc.T, preferred_element_type=jnp.float32)
    loss_ccc = _ce_label_smooth(out_ccc, labels, 0.1)
    loss_icc = _ce_label_smooth(out_icc, labels, 0.1)
    loss_con = _smooth_l1(out_ccc, jax.lax.stop_gradient(out_icc))
    return loss_ccc + loss_icc + weight * loss_con


def update_dcc_luts(
    state: DCCState,
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    momentum: float = 0.1,
) -> DCCState:
    """Momentum update of both tables (pure version of ref backward :47-62).

    lut_ccc[y] <- normalize(m * lut_ccc[y] + (1-m) * normalize(batch_mean_y))
    lut_icc[y] <- sequential per-instance EMA, normalized after each instance.
    The icc update is order-dependent in the reference; we reproduce it with a
    lax.scan over the batch (batch <= 256, negligible cost).
    """
    x = jax.lax.stop_gradient(embeddings.astype(jnp.float32))
    n_cls = state.lut_ccc.shape[0]

    # --- ccc: per-class batch means (segment mean over present classes).
    onehot = jax.nn.one_hot(labels, n_cls, dtype=jnp.float32)        # (B, C)
    counts = jnp.sum(onehot, axis=0)                                  # (C,)
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)   # (C, D)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    means_n = normalize(means)
    present = (counts > 0)[:, None]
    new_ccc = momentum * state.lut_ccc + (1.0 - momentum) * means_n
    new_ccc = normalize(new_ccc)
    new_ccc = jnp.where(present, new_ccc, state.lut_ccc)

    # --- icc: sequential instance EMA (ref :60-62).
    def body(lut, inp):
        xi, yi = inp
        row = lut[yi] * momentum + (1.0 - momentum) * xi
        row = row / jnp.maximum(jnp.linalg.norm(row), 1e-12)
        return lut.at[yi].set(row), None

    new_icc, _ = jax.lax.scan(body, state.lut_icc, (x, labels))
    return DCCState(lut_ccc=new_ccc, lut_icc=new_icc)
