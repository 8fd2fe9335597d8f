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


def make_crop_embed(embed_fn: Callable, crop_hw: Tuple[int, int],
                    max_dets: int):
    """Returns jit fn(frame (H,W,3) uint8, tlwh (D,4)) -> (D, F) embeddings.

    Crops + resizes each detection box to `crop_hw` with
    `jax.image.scale_and_translate` (batched), normalizes (ImageNet), and
    embeds. Invalid boxes produce garbage rows that the tracker masks out.
    Replaces the reference's per-crop cv2 resize + torchvision normalize
    inside the submodule's ReID multibackend.
    """
    ch, cw = crop_hw
    mean = jnp.asarray((0.485, 0.456, 0.406))
    std = jnp.asarray((0.229, 0.224, 0.225))

    @jax.jit
    def crop_embed(params, batch_stats, frame, tlwh):
        img = frame.astype(jnp.float32) / 255.0

        def one(box):
            x, y, w, h = box[0], box[1], box[2], box[3]
            scale = jnp.stack([ch / jnp.maximum(h, 1e-3),
                               cw / jnp.maximum(w, 1e-3)])
            translation = jnp.stack([-y * scale[0], -x * scale[1]])
            return jax.image.scale_and_translate(
                img, (ch, cw, 3), (0, 1), scale, translation,
                method="bilinear",
            )

        crops = jax.vmap(one)(tlwh)                    # (D, ch, cw, 3)
        crops = (crops - mean) / std
        return embed_fn(params, batch_stats, crops)

    return crop_embed


class TrackingPipeline:
    """Host frame loop: embed + track on device, MOT rows on host."""

    def __init__(self, cfg: TrackerConfig, embed_fn, params, batch_stats,
                 feat_dim: int):
        self.cfg = cfg
        self.tracker = Tracker(cfg, feat_dim=feat_dim)
        self.state = self.tracker.init_state()
        self.crop_embed = make_crop_embed(embed_fn, cfg.crop_hw, cfg.max_dets)
        self.params = params
        self.batch_stats = batch_stats
        self.results: List[dict] = []
        self.timing = {"crop_embed": 0.0, "associate": 0.0, "total": 0.0}
        self.frames = 0

    def step(self, frame_idx: int, frame: np.ndarray,
             tlwh: np.ndarray, conf: np.ndarray, valid: np.ndarray):
        t0 = time.perf_counter()
        feats = self.crop_embed(self.params, self.batch_stats,
                                jnp.asarray(frame), jnp.asarray(tlwh))
        t1 = time.perf_counter()
        self.state, out = self.tracker.update(
            self.state, jnp.asarray(tlwh), jnp.asarray(conf), feats,
            jnp.asarray(valid),
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

    def write(self, path: str) -> int:
        return write_mot_txt(path, self.results)

    def timing_summary(self) -> Dict[str, float]:
        """Per-frame ms per stage (ref track_yolov5.py:342-344 summary)."""
        n = max(self.frames, 1)
        return {k: 1000.0 * v / n for k, v in self.timing.items()}
