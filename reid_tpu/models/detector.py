"""Anchor-free person/vehicle detector (CenterNet-style), Flax/NHWC.

The reference's detector lives in the YOLOv5/yolov8 submodules
(ref `.gitmodules:1-6`, loaded at `track_yolov5.py:135`) and is treated as a
pluggable component (SURVEY.md §2.3/§7.2). This module makes detection a
first-class TPU-native capability: a small FPN-ish trunk with center-heatmap
/ size / offset heads, and a jit decode (3x3 max-pool peak NMS + top-k ->
fixed-capacity padded boxes) that slots directly into the tracking pipeline's
static-shape contract. Train with `detection_loss` (focal center loss + L1
size/offset) on person boxes; or keep ingesting precomputed detections.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_init, max_pool_same


class CenterNetLite(nn.Module):
    """Small hourglass-free trunk (stride 4) + center/size/offset heads."""
    base: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x = x.astype(dt)

        def cbr(y, ch, stride, name):
            y = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        use_bias=False, kernel_init=kaiming_init, dtype=dt,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name=f"{name}_bn")(y)
            return nn.relu(y)

        c1 = cbr(x, self.base, 2, "c1")            # /2
        c2 = cbr(c1, self.base * 2, 2, "c2")       # /4
        c3 = cbr(c2, self.base * 4, 2, "c3")       # /8
        c4 = cbr(c3, self.base * 8, 2, "c4")       # /16
        # top-down to stride 4
        u3 = nn.ConvTranspose(self.base * 4, (4, 4), strides=(2, 2),
                              padding="SAME", dtype=dt, name="up3")(c4) + c3
        u2 = nn.ConvTranspose(self.base * 2, (4, 4), strides=(2, 2),
                              padding="SAME", dtype=dt, name="up2")(u3) + c2
        feat = cbr(u2, self.base * 2, 1, "head")

        heat = nn.Conv(1, (1, 1), dtype=dt,
                       bias_init=nn.initializers.constant(-2.19),  # focal prior
                       name="hm")(feat)
        wh = nn.Conv(2, (1, 1), dtype=dt, name="wh")(feat)
        offset = nn.Conv(2, (1, 1), dtype=dt, name="off")(feat)
        return {"heat": heat, "wh": wh, "offset": offset}


@functools.partial(jax.jit, static_argnames=("max_dets", "stride"))
def decode_detections(
    outputs: Dict[str, jnp.ndarray], max_dets: int = 64, stride: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Heatmap -> (tlwh (B, max_dets, 4), scores (B, max_dets)).

    Peak NMS = keep heatmap maxima under a 3x3 max-pool (the CenterNet trick
    — replaces box NMS entirely, ref track loop's non_max_suppression role),
    then top-k with static capacity.
    """
    heat = jax.nn.sigmoid(outputs["heat"][..., 0].astype(jnp.float32))
    b, h, w = heat.shape
    pooled = nn.max_pool(heat[..., None], (3, 3), strides=(1, 1),
                         padding=((1, 1), (1, 1)))[..., 0]
    peaks = jnp.where(heat >= pooled, heat, 0.0)
    flat = peaks.reshape(b, h * w)
    scores, idx = jax.lax.top_k(flat, max_dets)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    gather = lambda t: jnp.take_along_axis(
        t.astype(jnp.float32).reshape(b, h * w, 2), idx[..., None], axis=1)
    wh = gather(outputs["wh"]) * stride
    off = gather(outputs["offset"])
    cx = (xs + off[..., 0]) * stride
    cy = (ys + off[..., 1]) * stride
    tlwh = jnp.stack([cx - 0.5 * wh[..., 0], cy - 0.5 * wh[..., 1],
                      wh[..., 0], wh[..., 1]], axis=-1)
    return tlwh, scores


def make_centernet_targets(tlwh: jnp.ndarray, valid: jnp.ndarray,
                           image_hw: Tuple[int, int], stride: int = 4,
                           sigma_frac: float = 6.0):
    """Build (gt_heat, gt_wh, gt_offset, gt_mask) from padded boxes.

    tlwh (B, D, 4), valid (B, D) -> targets on the stride-4 grid with
    Gaussian heatmap splats (radius ~ box size / sigma_frac). jit-friendly:
    splats are rendered as a max over per-box Gaussian fields.
    """
    b, d = valid.shape
    h, w = image_hw[0] // stride, image_hw[1] // stride
    cx = (tlwh[..., 0] + 0.5 * tlwh[..., 2]) / stride      # (B, D)
    cy = (tlwh[..., 1] + 0.5 * tlwh[..., 3]) / stride
    ix = jnp.clip(jnp.floor(cx), 0, w - 1)
    iy = jnp.clip(jnp.floor(cy), 0, h - 1)
    sigma = jnp.maximum(
        (tlwh[..., 2] + tlwh[..., 3]) / (2 * stride * sigma_frac), 1.0)

    ys = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    g = jnp.exp(-((ys - iy[..., None, None]) ** 2
                  + (xs - ix[..., None, None]) ** 2)
                / (2.0 * sigma[..., None, None] ** 2))     # (B, D, h, w)
    g = jnp.where(valid[..., None, None], g, 0.0)
    gt_heat = jnp.max(g, axis=1)                           # (B, h, w)

    gt_wh = jnp.zeros((b, h, w, 2), jnp.float32)
    gt_off = jnp.zeros((b, h, w, 2), jnp.float32)
    gt_mask = jnp.zeros((b, h, w), bool)
    bi = jnp.repeat(jnp.arange(b), d)
    yi = iy.reshape(-1).astype(jnp.int32)
    xi = jnp.where(valid.reshape(-1), ix.reshape(-1).astype(jnp.int32), w)
    wh = jnp.stack([tlwh[..., 2], tlwh[..., 3]], -1).reshape(-1, 2) / stride
    off = jnp.stack([cx - ix, cy - iy], -1).reshape(-1, 2)
    gt_wh = gt_wh.at[bi, yi, xi].set(wh, mode="drop")
    gt_off = gt_off.at[bi, yi, xi].set(off, mode="drop")
    gt_mask = gt_mask.at[bi, yi, xi].set(valid.reshape(-1), mode="drop")
    return gt_heat, gt_wh, gt_off, gt_mask


def detection_loss(outputs, gt_heat, gt_wh, gt_offset, gt_mask,
                   alpha: float = 2.0, beta: float = 4.0,
                   wh_weight: float = 0.1, off_weight: float = 1.0):
    """CenterNet focal heatmap loss + masked L1 size/offset regression."""
    pred = jax.nn.sigmoid(outputs["heat"][..., 0].astype(jnp.float32))
    pred = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    pos = (gt_heat >= 0.999).astype(jnp.float32)
    neg_w = (1.0 - gt_heat) ** beta
    loss_pos = -pos * ((1 - pred) ** alpha) * jnp.log(pred)
    loss_neg = -(1 - pos) * neg_w * (pred ** alpha) * jnp.log(1 - pred)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    hm_loss = (jnp.sum(loss_pos) + jnp.sum(loss_neg)) / n_pos

    m = gt_mask[..., None].astype(jnp.float32)
    wh_loss = jnp.sum(jnp.abs(outputs["wh"].astype(jnp.float32) - gt_wh) * m) / n_pos
    off_loss = jnp.sum(
        jnp.abs(outputs["offset"].astype(jnp.float32) - gt_offset) * m) / n_pos
    return hm_loss + wh_weight * wh_loss + off_weight * off_loss
