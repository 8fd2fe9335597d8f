"""Detector training driver (CenterNetLite) + serving detect fn.

The reference treats its detector as a pluggable pretrained component
(YOLOv5/yolov8 submodules, loaded at `track_yolov5.py:135`); in a
zero-egress build the detector must be trainable in-framework instead.
This driver trains `models.detector.CenterNetLite` on (frame, boxes)
supervision with the CenterNet focal/L1 loss and builds the jit detect
function the tracking CLI consumes (`track.py` without `--detections`).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detector import (CenterNetLite, decode_detections,
                               detection_loss, make_centernet_targets)


def train_detector(
    frames: np.ndarray,
    tlwh: np.ndarray,
    valid: np.ndarray,
    det_hw: Tuple[int, int] = (288, 512),
    epochs: int = 10,
    batch_size: int = 8,
    lr: float = 1e-3,
    base: int = 32,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
):
    """Train CenterNetLite on full frames with padded gt boxes.

    frames (N, H, W, 3) uint8; tlwh (N, D, 4) in FRAME pixels; valid (N, D).
    Frames are resized to `det_hw` on device (boxes rescaled to match).
    Returns (model, variables, losses).
    """
    import optax

    n, fh, fw = frames.shape[:3]
    dh, dw = det_hw
    sx, sy = dw / fw, dh / fh
    scaled = np.asarray(tlwh, np.float32) * np.asarray([sx, sy, sx, sy])

    model = CenterNetLite(base=base)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(seed), jnp.zeros((2, dh, dw, 3)))
    tx = optax.adam(lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, boxes, vmask):
        x = jax.image.resize(imgs.astype(jnp.float32) / 255.0,
                             (imgs.shape[0], dh, dw, 3), "bilinear")
        gt_heat, gt_wh, gt_off, gt_mask = make_centernet_targets(
            boxes, vmask, (dh, dw))

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            return (detection_loss(out, gt_heat, gt_wh, gt_off, gt_mask),
                    mut["batch_stats"])

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, new_opt,
                loss)

    rng = np.random.default_rng(seed)
    losses: List[float] = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        ep = []
        for s in range(0, n - batch_size + 1, batch_size):
            b = order[s:s + batch_size]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(frames[b]), jnp.asarray(scaled[b]),
                jnp.asarray(valid[b]))
            ep.append(float(loss))
        losses.append(float(np.mean(ep)))
        log_fn(f"detector epoch {epoch}: loss={losses[-1]:.4f}")
    return model, {"params": params, "batch_stats": batch_stats}, losses


def make_detector_fn(model: CenterNetLite, variables,
                     det_hw: Tuple[int, int] = (288, 512),
                     max_dets: int = 64, min_conf: float = 0.05):
    """jit fn(frame (H,W,3) uint8) -> (tlwh, conf, valid) in frame pixels —
    the serve-path detector contract (`track.py` builtin-detector branch)."""
    dh, dw = det_hw

    @jax.jit
    def _detect(v, frame):
        img = frame.astype(jnp.float32) / 255.0
        img = jax.image.resize(img, (dh, dw, 3), "bilinear")
        out = model.apply(v, img[None], train=False)
        tlwh, scores = decode_detections(out, max_dets=max_dets)
        sx = frame.shape[1] / dw
        sy = frame.shape[0] / dh
        return tlwh[0] * jnp.asarray([sx, sy, sx, sy]), scores[0]

    def detect(frame):
        tlwh, conf = _detect(variables, jnp.asarray(frame))
        conf = np.asarray(conf)
        return np.asarray(tlwh), conf, conf > min_conf

    return detect
