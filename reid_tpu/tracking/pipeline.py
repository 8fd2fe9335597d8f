"""End-to-end tracking pipeline — the "serve" path.

Role of ref `modification_tracking/track_yolov5.py:78-344` (run): per frame:
detections -> crops -> ReID embed -> tracker association -> MOT output, with
per-stage timing buckets (ref Profile() at :176-252: preprocess / detector /
NMS / tracker-update; here: crop / embed / associate since the detector is
pluggable — the reference treats it as pluggable too, SURVEY.md §2.3).

TPU design: crops are gathered and resized ON DEVICE from the full frame via
one fused jit program (scale-and-translate per box), embedded in a single
batched forward, and the tracker update runs in the same device step. The
host only decodes video frames and writes MOT rows.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackerConfig
from .tracker import Tracker, TrackerState
from .mot import write_mot_txt


def resize_bilinear_matmul(x: jnp.ndarray, out_hw: Tuple[int, int],
                           antialias: bool = True) -> jnp.ndarray:
    """Full-frame bilinear resize as two STATIC hat-matrix matmuls.

    Drop-in for `jax.image.resize(x, (..., oh, ow, C), "bilinear")` on
    (H, W, C) or (B, H, W, C) images with static shapes. The triangle
    kernel (antialias-widened on downscale, exactly like jax.image.resize's
    default) becomes a row-normalized (out, in) weight matrix per axis, so
    the whole resize is two MXU einsums instead of XLA's gather-based
    lowering — the same formulation that beats gathers ~100x in
    `crop_resize_bilinear` above. Used for the YOLO letterbox of 1080p
    frames in the detector-in-the-loop serve path (ref
    track_yolov5.py:181-199 preprocessing), where the per-frame resize is
    Amdahl-visible.
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape

    def hat(out_dim, in_dim):
        # jax.image.resize semantics: sample at (o+0.5)*in/out - 0.5,
        # triangle kernel widened by in/out on downscale (antialias),
        # rows normalized over in-bounds taps.
        scale = out_dim / in_dim
        src = (jnp.arange(out_dim, dtype=jnp.float32) + 0.5) / scale - 0.5
        cols = jnp.arange(in_dim, dtype=jnp.float32)
        ks = min(scale, 1.0) if antialias else 1.0
        wm = jnp.maximum(0.0, 1.0 - jnp.abs((src[:, None] - cols) * ks))
        return wm / jnp.maximum(wm.sum(axis=1, keepdims=True), 1e-12)

    wy = hat(oh, h)   # (oh, H)
    wx = hat(ow, w)   # (ow, W)
    xf = x.astype(jnp.float32)
    # contraction-order FLOP lever (same as crop_resize_bilinear)
    cost_y_first = oh * h * w + oh * ow * w
    cost_x_first = ow * w * h + oh * h * ow
    if cost_y_first <= cost_x_first:
        rows = jnp.einsum("ih,bhwc->biwc", wy, xf,
                          preferred_element_type=jnp.float32)
        out = jnp.einsum("jw,biwc->bijc", wx, rows,
                         preferred_element_type=jnp.float32)
    else:
        colsv = jnp.einsum("jw,bhwc->bhjc", wx, xf,
                           preferred_element_type=jnp.float32)
        out = jnp.einsum("ih,bhjc->bijc", wy, colsv,
                         preferred_element_type=jnp.float32)
    out = out.astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                     else jnp.float32)
    return out[0] if squeeze else out


def crop_resize_bilinear(img: jnp.ndarray, boxes: jnp.ndarray,
                         ch: int, cw: int, downsample: int = 1
                         ) -> jnp.ndarray:
    """MXU matmul-based batched crop+resize: (H, W, 3) x (D, 4 tlwh) ->
    (D, ch, cw, 3).

    Bilinear sampling as two einsum contractions with per-crop hat-weight
    matrices Wy (D, ch, H) and Wx (D, cw, W):
        out[d] = Wy[d] @ img @ Wx[d]^T    (per channel)
    TPU rationale: the obvious alternatives lose badly — vmapped
    `jax.image.scale_and_translate` compiles >10 min at 512 crops, and a
    4-point gather kernel runs ~100x slower than the MXU (measured 3.0 s vs
    this formulation for 1024 crops; TPU gathers are scalar-ish). The hat
    matrices are built from broadcasted iota (no gathers anywhere).

    `downsample=s` crops from an s x s average-pooled copy of the frame
    instead: the dominant einsum term scales with H*W, so s=2 cuts crop
    FLOPs ~4x at 1080p ON PAPER. Measured on the v5e (2026-08-18, 1080p,
    D=50): NOT a speed lever — the stage runs 0.852 ms/frame at s=1 but
    1.000 at s=2 and 0.833 at s=4, because the einsum's MXU efficiency
    collapses with the smaller shapes (pure-einsum probe: 82 -> 31 ->
    12.5 TF/s effective) and the hat-matrix build is overhead-bound and
    flat (~0.4 ms/frame at every s). Keep s=1 for speed; s>1 remains
    useful only to bound the pooled-frame HBM footprint. Quality at s=2:
    a box smaller than (s*ch, s*cw) — virtually every MOT16 person with
    256x128 crops — is UPSAMPLED into the crop either way, so the pooled
    plane still oversamples it (near-lossless: pool-then-bilinear is not
    bit-identical to the full-res crop — measured maxdiff < 0.02 on smooth
    ramps); larger-than-(512,256) boxes genuinely lose resolution.
    """
    if downsample > 1:
        s = int(downsample)
        h0, w0 = img.shape[0], img.shape[1]
        ph, pw = (-h0) % s, (-w0) % s
        if ph or pw:
            img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        img = img.astype(jnp.float32).reshape(
            (h0 + ph) // s, s, (w0 + pw) // s, s, 3).mean(axis=(1, 3))
        boxes = boxes / s
    h, w = img.shape[0], img.shape[1]

    def hat_weights(starts, sizes, out_dim, in_dim):
        # rows index output pixels, cols input pixels; weight = bilinear hat
        o = (jnp.arange(out_dim, dtype=jnp.float32) + 0.5) / out_dim
        src = starts[:, None] + o[None, :] * sizes[:, None] - 0.5  # (D, out)
        src = jnp.clip(src, 0.0, in_dim - 1.0)
        cols = jnp.arange(in_dim, dtype=jnp.float32)               # (in,)
        wmat = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - cols))
        return wmat                                                # (D,out,in)

    wy = hat_weights(boxes[:, 1], boxes[:, 3], ch, h)   # (D, ch, H)
    wx = hat_weights(boxes[:, 0], boxes[:, 2], cw, w)   # (D, cw, W)
    imgf = img.astype(jnp.float32)
    # contraction order is a 2x-level FLOP lever: Y-first costs
    # D*C*(ch*H*W + ch*cw*W) MACs, X-first D*C*(cw*W*H + ch*H*cw) — for the
    # serve shapes (256x128 crops from 480x640) X-first is 45% cheaper.
    # Shapes are static, so pick at trace time.
    cost_y_first = ch * h * w + ch * cw * w
    cost_x_first = cw * w * h + ch * h * cw
    if cost_x_first < cost_y_first:
        cols = jnp.einsum("djw,hwc->djhc", wx, imgf,
                          preferred_element_type=jnp.float32)  # (D, cw, H, 3)
        out = jnp.einsum("djhc,dih->dijc", cols, wy,
                         preferred_element_type=jnp.float32)   # (D,ch,cw,3)
    else:
        rows = jnp.einsum("dih,hwc->diwc", wy, imgf,
                          preferred_element_type=jnp.float32)  # (D, ch, W, 3)
        out = jnp.einsum("diwc,djw->dijc", rows, wx,
                         preferred_element_type=jnp.float32)   # (D,ch,cw,3)
    return out


def make_crop_embed(embed_fn: Callable, crop_hw: Tuple[int, int],
                    max_dets: int, crop_downsample: int = 1,
                    frame_crop_cap: Optional[int] = None,
                    embed_in_dtype: str = "float32"):
    """Returns jit fn(frame (H,W,3) uint8, tlwh (D,4), conf (D,),
    valid (D,)) -> (feats (D, F), valid (D,)).

    Crops + resizes each detection box to `crop_hw` on device (MXU hat-
    matrix bilinear), normalizes (ImageNet), and embeds. Invalid boxes
    produce garbage rows that the tracker masks out. Replaces the
    reference's per-crop cv2 resize + torchvision normalize inside the
    submodule's ReID multibackend.

    `frame_crop_cap` bounds the crop+embed work to the top-cap
    valid-by-confidence boxes (the same contract as the chunked path's
    cap: a 300-det-slot serve with ~20 people pays for 20-ish crops, not
    300); dropped slots come back with valid=False and zero features.
    cap >= #valid is output-identical to the uncapped path.

    `embed_in_dtype="bfloat16"` hands the normalized crops to `embed_fn`
    in bf16 (bit-identical downstream when the embed model computes in
    bf16 — its first op casts anyway — while halving the handoff's HBM
    traffic).
    """
    ch, cw = crop_hw
    mean = jnp.asarray((0.485, 0.456, 0.406))
    std = jnp.asarray((0.229, 0.224, 0.225))
    handoff = jnp.dtype(embed_in_dtype)
    if frame_crop_cap is not None and frame_crop_cap <= 0:
        # cap=0 would top_k(k=0) and silently drop EVERY detection; treat
        # non-positive caps as "no cap" (the CLI already maps 0 -> None)
        frame_crop_cap = None
    cap = (max_dets if frame_crop_cap is None
           else min(frame_crop_cap, max_dets))

    @jax.jit
    def crop_embed(params, batch_stats, frame, tlwh, conf, valid):
        img = frame.astype(jnp.float32) / 255.0
        if cap < max_dets:
            score = jnp.where(valid, conf, -jnp.inf)
            sel = jax.lax.top_k(score, cap)[1]               # (cap,)
            boxes = jnp.take(tlwh, sel, axis=0)
            kept = jnp.zeros((max_dets,), bool).at[sel].set(True)
            valid = valid & kept
        else:
            sel = jnp.arange(max_dets)
            boxes = tlwh
        crops = crop_resize_bilinear(img, boxes, ch, cw,
                                     downsample=crop_downsample)
        crops = ((crops - mean) / std).astype(handoff)
        feats_c = embed_fn(params, batch_stats, crops)       # (cap, F)
        if cap < max_dets:
            feats = jnp.zeros((max_dets, feats_c.shape[1]),
                              feats_c.dtype).at[sel].set(feats_c)
        else:
            feats = feats_c
        return feats, valid

    return crop_embed


def make_chunked_tracker(cfg: TrackerConfig, embed_fn, crop_hw,
                         chunk: int = 16, crop_budget: Optional[int] = None,
                         use_gmc: Optional[bool] = None,
                         frame_crop_cap: Optional[int] = None):
    """One jit program tracking a CHUNK of frames end-to-end on device.

    This is the throughput path (north star >=200 fps/chip): per chunk of T
    frames, all T x D crops are gathered+resized and embedded in ONE batched
    forward (the MXU sees a T*D crop batch instead of D), then the sequential
    association runs as a lax.scan carrying TrackerState. The host only
    feeds frames/detections and drains outputs chunk-by-chunk — per-frame
    dispatch latency is amortized by T.

    `crop_budget` compacts the embed batch: detection slots are static
    (T x D) but real scenes rarely fill them, so the B highest-confidence
    valid crops are gathered into a (B,) batch for the backbone (the
    dominant FLOPs) and the features scattered back; slots that miss the
    budget are dropped from `valid` (the same graceful capping the
    reference's NMS max-det performs, track_yolov5.py:193-199). Budget
    b >= #valid crops is output-identical to the uncompacted path.

    `frame_crop_cap` bounds the CROP stage the same way, per frame and
    BEFORE the crop einsum: only the top-cap valid-by-confidence boxes of
    each frame are cropped (the bilinear gather einsum and the (T*cap)
    crops tensor scale with cap, not with the slot capacity D), so a
    tracker fed from a 300-det NMS can run D=300 slots without paying the
    crop cost of 300 crops/frame. Slots beyond the cap are dropped from
    `valid`; cap >= per-frame #valid is output-identical.
    """
    import functools

    from .methods import uses_gmc
    from .tracker import _update_impl, apply_gmc

    if use_gmc is None:
        use_gmc = uses_gmc(cfg)
    if frame_crop_cap is None:
        frame_crop_cap = getattr(cfg, "frame_crop_cap", None)
    if frame_crop_cap is not None and frame_crop_cap <= 0:
        frame_crop_cap = None        # 0 would silently drop every det
    k_embed = max(1, int(getattr(cfg, "embed_every", 1)))
    if k_embed > 1 and chunk % k_embed != 0:
        raise ValueError(
            f"embed_every={k_embed} requires chunk % embed_every == 0 "
            f"(chunk={chunk}) so the cadence phase is static per chunk")
    ch, cw = crop_hw
    mean = jnp.asarray((0.485, 0.456, 0.406))
    std = jnp.asarray((0.229, 0.224, 0.225))
    handoff = jnp.dtype(getattr(cfg, "embed_in_dtype", "float32"))

    @jax.jit
    def run_chunk(params, batch_stats, state, frames, tlwh, conf, valid,
                  affines=None, prev_frame=None):
        # frames (T, H, W, 3) uint8; tlwh (T, D, 4); conf/valid (T, D);
        # affines (T, 2, 3) camera-motion warps (botsort; None = estimate
        # on device from the frames — ref track_yolov5.py:229-231);
        # prev_frame (H, W, 3) anchors the chunk-boundary affine.
        t, d = tlwh.shape[:2]
        imgs = frames.astype(jnp.float32) / 255.0

        cap = d if frame_crop_cap is None else min(frame_crop_cap, d)
        if cap < d:
            # pre-crop per-frame selection: only the top-cap valid boxes of
            # each frame reach the crop einsum (slot capacity D can exceed
            # the affordable crop count, e.g. 300-det NMS feeds)
            score_f = jnp.where(valid, conf, -jnp.inf)
            sel_f = jax.lax.top_k(score_f, cap)[1]          # (T, cap)
            boxes_c = jnp.take_along_axis(tlwh, sel_f[..., None], axis=1)
            conf_c = jnp.take_along_axis(conf, sel_f, axis=1)
            valid_c = jnp.take_along_axis(valid, sel_f, axis=1)
            kept_f = jnp.zeros((t, d), bool).at[
                jnp.arange(t)[:, None], sel_f].set(True)
            if k_embed > 1:
                # the cap bounds CROP work; skip frames of the embed
                # cadence do none, so their dets stay valid
                emb = (jnp.arange(t) % k_embed) == 0
                valid = valid & (kept_f | ~emb[:, None])
            else:
                valid = valid & kept_f
        else:
            sel_f = jnp.broadcast_to(jnp.arange(d), (t, d))
            boxes_c, conf_c, valid_c = tlwh, conf, valid

        # appearance cadence (TrackerConfig.embed_every): crop + embed only
        # every k-th frame of the chunk (chunk starts are multiples of
        # `chunk` and chunk % k == 0, so the phase is static: chunk-local
        # index i is an embed frame iff i % k == 0). Skip frames keep their
        # detections valid (association runs appearance-neutral there —
        # tracker.py has_feats) but pay zero crop/embed cost, so the two
        # dominant stages scale down by k.
        if k_embed > 1:
            t_e = t // k_embed
            eidx = jnp.arange(0, t, k_embed)               # (Te,) static
            imgs_e = imgs[::k_embed]
            boxes_e = boxes_c[::k_embed]
            conf_e, valid_e = conf_c[::k_embed], valid_c[::k_embed]
            sel_e = sel_f[::k_embed]
            emb_row = (jnp.arange(t) % k_embed) == 0       # (T,)
        else:
            t_e, eidx, sel_e = t, jnp.arange(t), sel_f
            imgs_e, boxes_e, conf_e, valid_e = imgs, boxes_c, conf_c, valid_c

        crops = jax.vmap(
            lambda img, boxes: crop_resize_bilinear(
                img, boxes, ch, cw,
                downsample=getattr(cfg, "crop_downsample", 1))
        )(imgs_e, boxes_e)                                 # (Te, cap, ...)
        crops = ((crops - mean) / std).astype(handoff)
        crops = crops.reshape(t_e * cap, ch, cw, 3)
        # original slot id of each cropped row, for the feature scatter
        flat_slots = (eidx[:, None] * d + sel_e).reshape(t_e * cap)

        if crop_budget is not None and crop_budget < t_e * cap:
            b = crop_budget
            # -inf sentinel: gt-style det files carry conf=-1, which must
            # still outrank every invalid slot in the top-k selection
            score = jnp.where(valid_e.reshape(t_e * cap),
                              conf_e.reshape(t_e * cap), -jnp.inf)
            sel = jax.lax.top_k(score, b)[1]               # (B,) crop rows
            feats_b = embed_fn(params, batch_stats, crops[sel])
            fdim = feats_b.shape[-1]
            target = flat_slots[sel]                       # (B,) slot ids
            feats = jnp.zeros((t * d, fdim), feats_b.dtype).at[target].set(
                feats_b).reshape(t, d, -1)
            kept = jnp.zeros((t * d,), bool).at[target].set(True)
            if k_embed > 1:
                # budget overflow drops dets only on EMBED frames (skip
                # frames do no crop work, so the budget never binds there)
                valid = valid & (kept.reshape(t, d) | ~emb_row[:, None])
            else:
                valid = valid & kept.reshape(t, d)
        elif cap < d or k_embed > 1:
            feats_c = embed_fn(params, batch_stats, crops)  # (Te*cap, F)
            feats = jnp.zeros(
                (t * d, feats_c.shape[-1]), feats_c.dtype).at[
                flat_slots].set(feats_c).reshape(t, d, -1)
        else:
            feats = embed_fn(params, batch_stats, crops).reshape(t, d, -1)

        if use_gmc and affines is None:
            from .gmc import chunk_affines_translation
            anchor = frames[0] if prev_frame is None else prev_frame
            affines = chunk_affines_translation(anchor, frames)
        if affines is None:  # keep one scan signature
            affines = jnp.broadcast_to(
                jnp.eye(2, 3, dtype=jnp.float32), (t, 2, 3))

        def scan_step(st, frame_inputs):
            if k_embed > 1:
                boxes, c, f, v, aff, hf = frame_inputs
            else:
                boxes, c, f, v, aff = frame_inputs
                hf = True  # python literal: keeps the graph bit-identical
            if use_gmc:  # trace-time branch: no cost when off
                st = apply_gmc(st, aff)
            st, out = _update_impl(cfg, st, boxes, c, f, v, has_feats=hf)
            return st, out

        xs = (tlwh, conf, feats, valid, affines)
        if k_embed > 1:
            xs = xs + ((jnp.arange(t) % k_embed) == 0,)
        state, outputs = jax.lax.scan(scan_step, state, xs)
        return state, outputs

    return run_chunk


class TrackingPipeline:
    """Host frame loop: embed + track on device, MOT rows on host."""

    def __init__(self, cfg: TrackerConfig, embed_fn, params, batch_stats,
                 feat_dim: int, gmc_mode: str = "device"):
        self.cfg = cfg
        self.tracker = Tracker(cfg, feat_dim=feat_dim)
        self.state = self.tracker.init_state()
        self.crop_embed_raw = embed_fn
        self.crop_embed = make_crop_embed(
            embed_fn, cfg.crop_hw, cfg.max_dets,
            crop_downsample=getattr(cfg, "crop_downsample", 1),
            frame_crop_cap=getattr(cfg, "frame_crop_cap", None),
            embed_in_dtype=getattr(cfg, "embed_in_dtype", "float32"))
        self.params = params
        self.batch_stats = batch_stats
        self.results: List[dict] = []
        self.timing = {"crop_embed": 0.0, "associate": 0.0, "total": 0.0}
        self.frames = 0
        # camera-motion compensation (botsort; ref track_yolov5.py:229-231).
        # gmc_mode picks the CHUNKED path's estimator: "device" = batched
        # phase-correlation inside the chunk program (zero host cost),
        # "host" = per-frame estimate_affine (cv2 sparse-flow affine — the
        # same estimator the per-frame step() path uses, for exact parity).
        from .methods import uses_gmc
        self._gmc = uses_gmc(cfg)
        self.gmc_mode = gmc_mode
        self._prev_frame = None
        # appearance cadence (TrackerConfig.embed_every): the per-frame
        # step() path embeds crops only on every k-th call, phase-aligned
        # with the chunked path (both count from the first frame)
        self._k_embed = max(1, int(getattr(cfg, "embed_every", 1)))
        self._step_idx = 0

    def step(self, frame_idx: int, frame: np.ndarray,
             tlwh: np.ndarray, conf: np.ndarray, valid: np.ndarray):
        t0 = time.perf_counter()
        if self._gmc:
            from .gmc import estimate_affine
            from .tracker import apply_gmc
            if self._prev_frame is not None:
                affine = estimate_affine(self._prev_frame, frame)
                self.state = apply_gmc(self.state, jnp.asarray(affine))
            self._prev_frame = frame
        is_embed = (self._step_idx % self._k_embed) == 0
        self._step_idx += 1
        if is_embed:
            feats, valid_d = self.crop_embed(
                self.params, self.batch_stats, jnp.asarray(frame),
                jnp.asarray(tlwh), jnp.asarray(conf), jnp.asarray(valid))
        else:
            # skip frame: zero crop/embed cost; association runs
            # appearance-neutral (tracker.py has_feats=False) and the
            # EMA feature / gallery stay untouched
            feats = jnp.zeros((tlwh.shape[0], self.tracker.feat_dim),
                              jnp.float32)
            valid_d = jnp.asarray(valid)
        t1 = time.perf_counter()
        self.state, out = self.tracker.update(
            self.state, jnp.asarray(tlwh), jnp.asarray(conf), feats,
            valid_d, has_feats=is_embed,
        )
        out = jax.device_get(out)
        t2 = time.perf_counter()
        self.timing["crop_embed"] += t1 - t0
        self.timing["associate"] += t2 - t1
        self.timing["total"] += t2 - t0
        self.frames += 1
        self.results.append({
            "frame": frame_idx, "tlwh": out["tlwh"], "ids": out["ids"],
            "valid": out["valid"],
        })
        return out

    def run_sequence(self, frames: np.ndarray, tlwh: np.ndarray,
                     conf: np.ndarray, valid: np.ndarray,
                     chunk: int = 16, first_frame: int = 1,
                     crop_budget: Optional[int] = None,
                     frame_crop_cap: Optional[int] = None):
        """Chunked high-throughput path: track T frames with ceil(T/chunk)
        device dispatches. frames (T,H,W,3) uint8; tlwh (T,D,4);
        conf/valid (T,D). Outputs appended to self.results. `crop_budget`
        caps the per-chunk embed batch; `frame_crop_cap` caps the per-frame
        CROP count before the crop einsum (see make_chunked_tracker)."""
        t_total = frames.shape[0]
        if (not hasattr(self, "_chunked") or self._chunk_size != chunk
                or getattr(self, "_crop_budget", None) != crop_budget
                or getattr(self, "_frame_crop_cap", None) != frame_crop_cap):
            self._chunked = make_chunked_tracker(
                self.cfg, self.crop_embed_raw, self.cfg.crop_hw, chunk,
                crop_budget=crop_budget, frame_crop_cap=frame_crop_cap)
            self._chunk_size = chunk
            self._crop_budget = crop_budget
            self._frame_crop_cap = frame_crop_cap
        pending = []  # (start_frame, device outputs) for deferred fetch
        t0 = time.perf_counter()
        for s in range(0, t_total, chunk):
            e = min(s + chunk, t_total)
            pad = chunk - (e - s)
            def padded(x, fill=0):
                if pad == 0:
                    return x[s:e]
                reps = np.repeat(x[e - 1:e], pad, axis=0)
                return np.concatenate([x[s:e], reps])
            fr = jnp.asarray(padded(frames))
            bx = jnp.asarray(padded(tlwh))
            cf = jnp.asarray(padded(conf))
            vl = jnp.asarray(padded(valid)) if pad == 0 else jnp.asarray(
                np.concatenate([valid[s:e],
                                np.zeros((pad,) + valid.shape[1:], bool)]))
            kw = {}
            if self._gmc:
                # the frame before this chunk anchors the boundary affine
                prev_np = frames[s - 1] if s > 0 else frames[0]
                if self.gmc_mode == "host":
                    from .gmc import estimate_affine
                    affs, prev = [], prev_np
                    for i in range(s, e):
                        affs.append(estimate_affine(prev, frames[i]))
                        prev = frames[i]
                    affs.extend([np.eye(2, 3, dtype=np.float32)] * pad)
                    kw["affines"] = jnp.asarray(np.stack(affs))
                else:
                    kw["prev_frame"] = jnp.asarray(prev_np)
            self.state, outs = self._chunked(
                self.params, self.batch_stats, self.state, fr, bx, cf, vl,
                **kw)
            pending.append((s, e, outs))
            # drain the previous chunk while this one computes
            if len(pending) > 1:
                self._drain(pending.pop(0), first_frame)
        for p in pending:
            self._drain(p, first_frame)
        dt = time.perf_counter() - t0
        self.timing["total"] += dt
        self.frames += t_total
        return t_total / dt

    def _drain(self, item, first_frame):
        s, e, outs = item
        outs = jax.device_get(outs)
        for i in range(e - s):
            self.results.append({
                "frame": first_frame + s + i,
                "tlwh": outs["tlwh"][i],
                "ids": outs["ids"][i],
                "valid": outs["valid"][i],
            })

    def write(self, path: str) -> int:
        return write_mot_txt(path, self.results)

    def timing_summary(self) -> Dict[str, float]:
        """Per-frame ms per stage (ref track_yolov5.py:342-344 summary)."""
        n = max(self.frames, 1)
        return {k: 1000.0 * v / n for k, v in self.timing.items()}
