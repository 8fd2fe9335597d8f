"""The five tracker methods of ref `track_yolov5.py:356`:
strongsort, deepocsort, ocsort, bytetrack, botsort.

All run on the single static-shape tracker core (tracker.py), each enabling
its method-specific algorithms — the reference similarly instantiates
per-method classes from per-method YAML configs
(`trackers/<method>/configs/<method>.yaml`):

  strongsort — appearance-EMA cosine cost blended with Mahalanobis motion,
               NSA Kalman (measurement noise scaled by detection confidence),
               DIoU stage 2 (deep_sort.yaml operating point).
  botsort    — proximity-fused cost min(IoU dist, masked appearance/2) with
               appearance+proximity thresholds, camera-motion compensation
               (GMC), wider gates.
  bytetrack  — motion/IoU only (no appearance model); BYTE keeps low-score
               boxes for a second IoU-only association that can extend but
               never initiate tracks.
  ocsort     — motion-only + observation-centric momentum (OCM angle term),
               re-update along virtual trajectories on re-association (ORU),
               and last-observation IoU recovery (OCR).
  deepocsort — ocsort + appearance with dynamic (confidence-scaled) EMA and
               adaptive discriminativeness weighting (AW).
"""

from __future__ import annotations

import dataclasses

from ..config import TrackerConfig


def method_config(method: str, **overrides) -> TrackerConfig:
    base = dict()
    if method == "strongsort":
        base = dict(method="strongsort", nsa=True)
    elif method == "botsort":
        base = dict(method="botsort", fuse_min=True, max_dist=0.8,
                    max_iou_distance=0.8, fuse_theta_emb=0.25,
                    fuse_theta_prox=0.5)
    elif method == "bytetrack":
        # appearance off; BYTE low-score second association on
        base = dict(method="bytetrack", mc_lambda=0.0, max_dist=2.0,
                    byte=True, byte_low=0.1)
    elif method == "ocsort":
        base = dict(method="ocsort", mc_lambda=0.0, max_dist=2.0,
                    ema_alpha=0.5, max_age=20, ocm_weight=0.2,
                    oru=True, ocr=True)
    elif method == "deepocsort":
        base = dict(method="deepocsort", ema_alpha=0.5, max_age=20,
                    ocm_weight=0.2, oru=True, ocr=True,
                    dynamic_ema=True, aw_scale=0.5, aw_assoc=0.75,
                    mc_lambda=0.0, max_dist=1.0)
    else:
        raise KeyError(f"unknown tracking method '{method}'")
    base.update(overrides)
    return TrackerConfig(**base)


def uses_appearance(cfg: TrackerConfig) -> bool:
    return cfg.mc_lambda > 0.0 or cfg.fuse_min or cfg.aw_scale > 0.0


def uses_gmc(cfg: TrackerConfig) -> bool:
    # cfg.gmc overrides the method default (upstream StrongSORT ships
    # ecc: true; BoT-SORT defaults its sparse-flow GMC on)
    if cfg.gmc is not None:
        return bool(cfg.gmc)
    return cfg.method == "botsort"
