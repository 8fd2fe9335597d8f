"""The five tracker method presets of ref `track_yolov5.py:356`:
strongsort, deepocsort, ocsort, bytetrack, botsort.

All map onto the single static-shape tracker core (tracker.py) via
TrackerConfig knobs — the reference similarly instantiates per-method classes
from per-method YAML configs (`trackers/<method>/configs/<method>.yaml`):

  strongsort — appearance-EMA cosine cost blended with motion, DIoU stage 2
               (deep_sort.yaml operating point).
  botsort    — strongsort + camera-motion compensation (GMC) enabled and a
               wider IoU gate.
  bytetrack  — motion/IoU only (no appearance model), lower confidence floor
               (BYTE keeps low-score boxes for the second association, which
               the two-stage core realizes with conf-split stage gates).
  ocsort     — motion-only with faster EMA decay and shorter max_age.
  deepocsort — ocsort + appearance cost re-enabled.
"""

from __future__ import annotations

import dataclasses

from ..config import TrackerConfig


def method_config(method: str, **overrides) -> TrackerConfig:
    base = dict()
    if method == "strongsort":
        base = dict(method="strongsort")
    elif method == "botsort":
        base = dict(method="botsort", max_iou_distance=0.8)
    elif method == "bytetrack":
        # appearance off; BYTE low-score second association on
        base = dict(method="bytetrack", mc_lambda=0.0, max_dist=2.0,
                    byte=True, byte_low=0.1)
    elif method == "ocsort":
        base = dict(method="ocsort", mc_lambda=0.0, max_dist=2.0,
                    ema_alpha=0.5, max_age=20, ocm_weight=0.2)
    elif method == "deepocsort":
        base = dict(method="deepocsort", ema_alpha=0.5, max_age=20,
                    ocm_weight=0.2)
    else:
        raise KeyError(f"unknown tracking method '{method}'")
    base.update(overrides)
    return TrackerConfig(**base)


def uses_appearance(cfg: TrackerConfig) -> bool:
    return cfg.mc_lambda > 0.0


def uses_gmc(cfg: TrackerConfig) -> bool:
    return cfg.method == "botsort"
