"""Association cost matrices: DIoU, IoU, appearance cosine.

DIoU follows ref `modification_deepsort/iou_matching.py:5-47`: classic IoU
minus center-distance / enclosing-box-diagonal penalty (`iou - d / rou`).
Boxes are tlwh `(top-left x, top-left y, width, height)`, matching the
reference format. All matrices are computed batched (T, D) in one shot.
"""

from __future__ import annotations

import jax.numpy as jnp


def _corners(boxes):
    tl = boxes[..., :2]
    br = boxes[..., :2] + boxes[..., 2:4]
    return tl, br


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Plain IoU. a (T, 4), b (D, 4) tlwh -> (T, D)."""
    a_tl, a_br = _corners(a)
    b_tl, b_br = _corners(b)
    tl = jnp.maximum(a_tl[:, None, :], b_tl[None, :, :])
    br = jnp.minimum(a_br[:, None, :], b_br[None, :, :])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def diou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DIoU = IoU - center_dist^2 / enclosing_diagonal^2 (ref :24-47)."""
    a_tl, a_br = _corners(a)
    b_tl, b_br = _corners(b)
    a_c = 0.5 * (a_tl + a_br)
    b_c = 0.5 * (b_tl + b_br)
    d = jnp.sum((a_c[:, None, :] - b_c[None, :, :]) ** 2, axis=-1)
    out_tl = jnp.minimum(a_tl[:, None, :], b_tl[None, :, :])
    out_br = jnp.maximum(a_br[:, None, :], b_br[None, :, :])
    rou = jnp.sum((out_tl - out_br) ** 2, axis=-1)
    return iou_matrix(a, b) - d / jnp.maximum(rou, 1e-9)


def appearance_cost(track_feats: jnp.ndarray, det_feats: jnp.ndarray) -> jnp.ndarray:
    """Cosine distance between L2-normalized track EMA features and detection
    embeddings: (T, D). The reference trackers keep an NN_BUDGET gallery and
    take min cosine distance; the StrongSort EMA variant (one smoothed feature
    per track, ema_alpha, deep_sort.yaml MAX_DIST gate) is used here."""
    tn = track_feats / jnp.maximum(
        jnp.linalg.norm(track_feats, axis=-1, keepdims=True), 1e-12)
    dn = det_feats / jnp.maximum(
        jnp.linalg.norm(det_feats, axis=-1, keepdims=True), 1e-12)
    return 1.0 - jnp.dot(tn, dn.T, preferred_element_type=jnp.float32)
