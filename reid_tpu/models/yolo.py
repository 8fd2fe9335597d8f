"""YOLOv5-class detector (CSP-Darknet + PANet + anchor Detect head), Flax.

The reference's detection engine is the yolov5 submodule's DetectMultiBackend
loaded with yolov5-crowdhuman weights (ref track_yolov5.py:135, NMS at
:193-199); the submodule itself is not vendored, so this is a from-scratch
TPU-native implementation of the same architecture family:

  * backbone: Conv(6x6 s2) stem, 4 stages of Conv(s2) + C3 blocks, SPPF
  * neck:     PANet — top-down FPN then bottom-up aggregation, C3 fusion
  * head:     3-level anchor Detect (P3/8, P4/16, P5/32), 3 anchors/level

TPU-first design choices: NHWC layout throughout, every block a jit-friendly
static graph, decode as one vectorized program over all grid cells (sigmoid
algebra on the MXU-fed conv outputs), and class-wise NMS as a fixed-K greedy
rounds FIXPOINT (one masked matvec per suppression-depth level over a
precomputed KxK IoU matrix — see `nms_fixed`) instead of the reference's
dynamic-shape torchvision NMS. Variant scaling matches the
family's depth/width multiples so published yolov5n/s/m/l/x torch weights
convert directly (`utils.torch_convert.convert_yolov5`).

Layer names mirror the torch module indices (l0..l23, head convs det_m{i})
to make the weight converter a mechanical prefix map.
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# depth_multiple, width_multiple per published variant
YOLO_VARIANTS = {
    # pico: not a published variant — tiny widths for tests/smoke runs
    # (XLA:CPU runs deep-channel convs at tiny spatial sizes pathologically
    # slowly; see tests/conftest notes)
    "yolov5p": (0.33, 0.125),
    "yolov5n": (0.33, 0.25),
    "yolov5s": (0.33, 0.50),
    "yolov5m": (0.67, 0.75),
    "yolov5l": (1.00, 1.00),
    "yolov5x": (1.33, 1.25),
}

# P5 anchor priors (w, h) in input pixels per level — the family's defaults
YOLO_ANCHORS = (
    ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),      # P3/8
    ((30.0, 61.0), (62.0, 45.0), (59.0, 119.0)),     # P4/16
    ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0)), # P5/32
)
YOLO_STRIDES = (8, 16, 32)


def _divisible(x: float, d: int = 8) -> int:
    return max(int(round(x / d)) * d, d)


class ConvBnSiLU(nn.Module):
    """Conv + BN(eps 1e-3) + SiLU — the family's basic block."""
    ch: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32
    p: int = -1  # -1 = autopad (k//2); the 6x6 stem uses explicit p=2

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2 if self.p < 0 else self.p
        x = nn.Conv(self.ch, (self.k, self.k), strides=(self.s, self.s),
                    padding=p, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.ch, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnSiLU(self.ch, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.ch:
            return x + y
        return y


class C3(nn.Module):
    """CSP bottleneck: split 1x1 branches, n bottlenecks on one side."""
    ch: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.ch // 2
        a = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, dtype=self.dtype,
                           name=f"m{i}")(a, train)
        return ConvBnSiLU(self.ch, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools, concat."""
    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        pool = lambda v: nn.max_pool(v, (5, 5), strides=(1, 1),
                                     padding=((2, 2), (2, 2)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBnSiLU(self.ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class YOLOv5(nn.Module):
    """Full detector; returns the 3 raw head maps (B, Hl, Wl, na*(5+nc)).

    `variant` picks the published depth/width multiples; `num_classes` is 1
    for the person-only crowd models the reference tracks with.
    """
    num_classes: int = 1
    variant: str = "yolov5s"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        gd, gw = YOLO_VARIANTS[self.variant]
        c = lambda ch: _divisible(ch * gw)
        d = lambda n: max(round(n * gd), 1)
        dt = self.dtype
        x = x.astype(dt)

        # ---- backbone (torch indices 0-9)
        x = ConvBnSiLU(c(64), 6, 2, dt, p=2, name="l0")(x, train)   # P1/2
        x = ConvBnSiLU(c(128), 3, 2, dt, name="l1")(x, train)       # P2/4
        x = C3(c(128), d(3), dtype=dt, name="l2")(x, train)
        x = ConvBnSiLU(c(256), 3, 2, dt, name="l3")(x, train)       # P3/8
        p3 = C3(c(256), d(6), dtype=dt, name="l4")(x, train)
        x = ConvBnSiLU(c(512), 3, 2, dt, name="l5")(p3, train)      # P4/16
        p4 = C3(c(512), d(9), dtype=dt, name="l6")(x, train)
        x = ConvBnSiLU(c(1024), 3, 2, dt, name="l7")(p4, train)     # P5/32
        x = C3(c(1024), d(3), dtype=dt, name="l8")(x, train)
        x = SPPF(c(1024), dtype=dt, name="l9")(x, train)

        # ---- PANet neck (torch indices 10-23)
        t10 = ConvBnSiLU(c(512), 1, 1, dt, name="l10")(x, train)
        x = jnp.concatenate([_upsample2(t10), p4], axis=-1)          # 11-12
        x = C3(c(512), d(3), shortcut=False, dtype=dt, name="l13")(x, train)
        t14 = ConvBnSiLU(c(256), 1, 1, dt, name="l14")(x, train)
        x = jnp.concatenate([_upsample2(t14), p3], axis=-1)          # 15-16
        o3 = C3(c(256), d(3), shortcut=False, dtype=dt, name="l17")(x, train)
        x = ConvBnSiLU(c(256), 3, 2, dt, name="l18")(o3, train)
        x = jnp.concatenate([x, t14], axis=-1)                       # 19
        o4 = C3(c(512), d(3), shortcut=False, dtype=dt, name="l20")(x, train)
        x = ConvBnSiLU(c(512), 3, 2, dt, name="l21")(o4, train)
        x = jnp.concatenate([x, t10], axis=-1)                       # 22
        o5 = C3(c(1024), d(3), shortcut=False, dtype=dt, name="l23")(x, train)

        # ---- Detect head (torch index 24): plain biased convs
        na, no = 3, 5 + self.num_classes
        outs = []
        for i, o in enumerate((o3, o4, o5)):
            outs.append(nn.Conv(na * no, (1, 1), dtype=dt,
                                name=f"det_m{i}")(o).astype(jnp.float32))
        return outs


@functools.partial(jax.jit, static_argnames=("num_classes", "max_candidates"))
def decode_yolo(
    preds: Sequence[jnp.ndarray],
    num_classes: int = 1,
    max_candidates: int = 512,
    anchors=YOLO_ANCHORS,
    strides=YOLO_STRIDES,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw head maps -> top-K candidate boxes.

    Returns (xywh (B, K, 4) center-format in input pixels, score (B, K),
    cls (B, K)); score = obj * best-class prob, sorted descending. The
    sigmoid grid algebra matches the family's decode: xy = (2*sig - 0.5 +
    grid) * stride, wh = (2*sig)^2 * anchor.
    """
    na, no = 3, 5 + num_classes
    flat = []
    for p, anc, stride in zip(preds, anchors, strides):
        b, h, w, _ = p.shape
        p = p.reshape(b, h, w, na, no)
        s = jax.nn.sigmoid(p.astype(jnp.float32))
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        xy = jnp.stack([(2.0 * s[..., 0] - 0.5 + gx) * stride,
                        (2.0 * s[..., 1] - 0.5 + gy) * stride], axis=-1)
        anc = jnp.asarray(anc, jnp.float32)                  # (na, 2)
        wh = (2.0 * s[..., 2:4]) ** 2 * anc[None, None, None]
        conf = s[..., 4:5] * s[..., 5:]                      # (..., nc)
        score = jnp.max(conf, axis=-1)
        cls = jnp.argmax(conf, axis=-1).astype(jnp.float32)
        flat.append(jnp.concatenate(
            [xy, wh, score[..., None], cls[..., None]],
            axis=-1).reshape(b, h * w * na, 6))
    allp = jnp.concatenate(flat, axis=1)                     # (B, N, 6)
    k = min(max_candidates, allp.shape[1])
    top_s, idx = jax.lax.top_k(allp[..., 4], k)
    top = jnp.take_along_axis(allp, idx[..., None], axis=1)
    return top[..., :4], top_s, top[..., 5]


def _nms_alive_serial(suppress, alive0):
    """Sequential-greedy survivor mask (the textbook K-step loop).

    Oracle for the rounds-fixpoint formulation in `nms_fixed` — NumPy,
    deliberately independent of the jit path."""
    import numpy as np

    suppress = np.asarray(suppress)
    alive = np.asarray(alive0).copy()
    k = alive.shape[0]
    for i in range(k):
        if alive[i]:
            kill = suppress[i] & (np.arange(k) > i)
            alive &= ~kill
    return alive


@functools.partial(jax.jit, static_argnames=("max_dets",))
def nms_fixed(xywh: jnp.ndarray, scores: jnp.ndarray, cls: jnp.ndarray,
              iou_thres: float = 0.45, conf_thres: float = 0.25,
              max_dets: int = 64):
    """Greedy class-wise NMS over K pre-sorted candidates, static shapes.

    xywh (K, 4) center-format, scores (K,) DESCENDING, cls (K,).
    Returns (tlwh (max_dets, 4), conf (max_dets,), valid (max_dets,)).
    Replaces the reference's torchvision non_max_suppression
    (ref track_yolov5.py:193-199) with a jit-compatible fixed-capacity pass.

    TPU formulation: greedy NMS is the unique fixpoint of
        alive_i = (score_i > conf) and not any(j < i, alive_j, iou_ji > thr)
    (dependencies form a DAG in score order, so the recurrence has exactly
    one solution — the sequential greedy answer). Instead of a K-step
    serial loop (K=512-1024 candidate slots cost ~K dispatch-latency-bound
    iterations on TPU — the same pathology greedy_assign_rounds fixed in
    the association stage), iterate the recurrence Jacobi-style: each
    round is ONE (K,)x(K,K) masked matvec on the MXU, and round r
    finalizes every box whose suppression-chain depth is <= r, so the
    while_loop exits after depth+1 rounds (2-5 on real scenes, worst case
    K). Output is bit-identical to the serial loop (`_nms_alive_serial`
    kept for the parity test, tests/test_yolo.py)."""
    k = xywh.shape[0]
    tl = xywh[:, :2] - 0.5 * xywh[:, 2:4]
    br = xywh[:, :2] + 0.5 * xywh[:, 2:4]
    itl = jnp.maximum(tl[:, None], tl[None])
    ibr = jnp.minimum(br[:, None], br[None])
    iwh = jnp.maximum(ibr - itl, 0.0)
    inter = iwh[..., 0] * iwh[..., 1]
    area = jnp.prod(jnp.maximum(br - tl, 0.0), axis=-1)
    iou = inter / jnp.maximum(area[:, None] + area[None] - inter, 1e-9)
    same_cls = cls[:, None] == cls[None]
    suppress = (iou > iou_thres) & same_cls

    alive0 = scores > conf_thres
    # strictly-lower-triangular kill edges: M[j, i] = higher-scored j
    # suppresses i.  f32 for the MXU matvec.
    idx = jnp.arange(k)
    mask = (suppress & (idx[:, None] < idx[None])).astype(jnp.float32)

    def cond(carry):
        alive, prev, it = carry
        return jnp.logical_and(it < k, jnp.any(alive != prev))

    def body(carry):
        alive, _, it = carry
        blocked = alive.astype(jnp.float32) @ mask > 0.0
        return alive0 & ~blocked, alive, it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.zeros_like(alive0), 0))
    sel_score = jnp.where(alive, scores, -jnp.inf)
    conf, order = jax.lax.top_k(sel_score, min(max_dets, k))
    boxes = jnp.concatenate([tl, xywh[:, 2:4]], axis=1)[order]   # tlwh
    valid = jnp.isfinite(conf)
    pad = max_dets - conf.shape[0]
    if pad > 0:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        conf = jnp.pad(conf, (0, pad), constant_values=-jnp.inf)
        valid = jnp.pad(valid, (0, pad))
    return boxes, jnp.where(valid, conf, 0.0), valid


def quantize_yolo(model: YOLOv5, variables, frames,
                  det_hw: Tuple[int, int] = (384, 640)):
    """Post-training int8 quantization of the YOLO trunk (utils/quantize.py):
    calibrates on letterboxed `frames` ([0,255] uint8, (N,H,W,3)) through the
    same preprocessing the detector fn applies, returns a QuantState for
    `make_yolo_detector_fn(..., qstate=...)`.

    The detection-head convs (`det_m*`) stay in full precision — standard
    int8 practice (last-layer logits are the most quantization-sensitive,
    and the heads are a small fraction of the FLOPs).

    MEASURED (v5e, 2026-08-17): int8 yolov5s runs 900 fps vs 1086 bf16 at
    384x640 b8 — the compute-bound conv stack does NOT benefit (int8 convs
    are not MXU-native in current XLA; the SERes18 embed's +23% was halved
    HBM traffic on a memory-bound trunk). Value today is 4x smaller
    weights for multi-model serving; speed parity awaits native int8
    conv lowering."""
    from ..utils.quantize import calibrate, quantize_weights

    dh, dw = det_hw
    frames = jnp.asarray(frames)
    fh, fw = frames.shape[1], frames.shape[2]
    scale = min(dh / fh, dw / fw)
    nh, nw = int(round(fh * scale)), int(round(fw * scale))
    py, px = (dh - nh) // 2, (dw - nw) // 2

    @jax.jit
    def letterbox(f):
        img = f.astype(jnp.float32) / 255.0
        img = jax.image.resize(img, (f.shape[0], nh, nw, 3), "bilinear")
        canvas = jnp.full((f.shape[0], dh, dw, 3), 0.447, jnp.float32)
        return jax.lax.dynamic_update_slice(canvas, img, (0, py, px, 0))

    absmax = calibrate(model, variables, [letterbox(frames)],
                       select=lambda path, m: not path.startswith("det_m"),
                       train=False)
    return quantize_weights(model, variables, absmax)


def make_yolo_detector_fn(model: YOLOv5, variables,
                          det_hw: Tuple[int, int] = (384, 640),
                          max_dets: int = 64, conf_thres: float = 0.25,
                          iou_thres: float = 0.45, qstate=None):
    """jit fn(frame (H,W,3) uint8) -> (tlwh, conf, valid) in frame pixels —
    the serve-path detector contract (same as
    `train.detector_train.make_detector_fn`), so `track.py --detector yolov5`
    slots into the tracking pipeline unchanged.

    Letterbox semantics: aspect-preserving resize into `det_hw` with centered
    gray padding (the family's preprocessing), undone on the output boxes.
    The letterbox geometry is computed in-graph from the static frame shape.

    `qstate` (from `quantize_yolo`): executes the trunk's convs in int8.
    """
    import contextlib

    dh, dw = det_hw
    if qstate is not None:
        from ..utils.quantize import quantized_context
        _ctx = lambda: quantized_context(qstate)  # noqa: E731
    else:
        _ctx = contextlib.nullcontext

    @jax.jit
    def _detect(v, frame):
        fh, fw = frame.shape[0], frame.shape[1]
        scale = min(dh / fh, dw / fw)
        nh, nw = int(round(fh * scale)), int(round(fw * scale))
        py, px = (dh - nh) // 2, (dw - nw) // 2
        img = frame.astype(jnp.float32) / 255.0
        img = jax.image.resize(img, (nh, nw, 3), "bilinear")
        canvas = jnp.full((dh, dw, 3), 0.447, jnp.float32)
        canvas = jax.lax.dynamic_update_slice(canvas, img, (py, px, 0))
        with _ctx():
            preds = model.apply(v, canvas[None], train=False)
        xywh, scores, cls = decode_yolo(preds,
                                        num_classes=model.num_classes)
        tlwh, conf, valid = nms_fixed(xywh[0], scores[0], cls[0],
                                      iou_thres=iou_thres,
                                      conf_thres=conf_thres,
                                      max_dets=max_dets)
        # undo letterbox -> original frame pixels
        tlwh = (tlwh - jnp.asarray([px, py, 0.0, 0.0])) / scale
        return tlwh, conf, valid

    import numpy as np

    def detect(frame):
        tlwh, conf, valid = _detect(variables, jnp.asarray(frame))
        return np.asarray(tlwh), np.asarray(conf), np.asarray(valid)

    return detect


def build_yolo(variant: str = "yolov5s", num_classes: int = 1,
               dtype: Any = jnp.float32) -> YOLOv5:
    if variant not in YOLO_VARIANTS:
        raise KeyError(f"unknown YOLO variant {variant!r}; "
                       f"have {sorted(YOLO_VARIANTS)}")
    return YOLOv5(num_classes=num_classes, variant=variant, dtype=dtype)
