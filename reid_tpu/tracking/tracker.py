"""Static-shape StrongSort-class tracker — the single biggest design
divergence from the reference (SURVEY.md §7.1): instead of Python
object-per-track (submodule trackers driven from `track_yolov5.py:253`), the
track store is a fixed-capacity SoA updated functionally, and the whole
per-frame update (Kalman predict -> two-stage gated matching -> update ->
lifecycle) is ONE jit program on device.

Operating point from `modification_deepsort/deep_sort.yaml:1-10`:
MAX_DIST 0.15 (cosine), MAX_IOU_DISTANCE 0.7, MAX_AGE 30, N_INIT 3,
EMA appearance (StrongSort) with motion-blended cost (mc_lambda).

Matching cascade:
  stage 1 — confirmed tracks x detections: appearance cosine cost blended
            with Mahalanobis motion cost, chi2-gated, gate MAX_DIST.
  stage 2 — remaining tracks (tentative + just-missed confirmed) x remaining
            detections: DIoU cost (ref modification_deepsort/iou_matching.py),
            gate MAX_IOU_DISTANCE.

Camera motion compensation: `apply_gmc` warps track means by a 2x3 affine
(role of `tracker.camera_update`, ref track_yolov5.py:229-231; the affine
itself comes from the host GMC estimator in pipeline.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from .assignment import INF_COST, gated_matches
from .costs import appearance_cost, diou_matrix
from .kalman import (
    CHI2_GATE_4DOF,
    kalman_gating_distance,
    kalman_initiate,
    kalman_predict,
    kalman_update,
)

# status codes
FREE, TENTATIVE, CONFIRMED = 0, 1, 2


class TrackerState(NamedTuple):
    mean: jnp.ndarray        # (T, 8) xyah + velocities
    cov: jnp.ndarray         # (T, 8, 8)
    feat: jnp.ndarray        # (T, F) EMA appearance
    status: jnp.ndarray      # (T,) int32
    hits: jnp.ndarray        # (T,) int32
    time_since_update: jnp.ndarray  # (T,) int32
    track_id: jnp.ndarray    # (T,) int32 (1-based; 0 = none)
    next_id: jnp.ndarray     # () int32


def init_tracker_state(max_tracks: int, feat_dim: int) -> TrackerState:
    return TrackerState(
        mean=jnp.zeros((max_tracks, 8), jnp.float32),
        cov=jnp.tile(jnp.eye(8)[None], (max_tracks, 1, 1)),
        feat=jnp.zeros((max_tracks, feat_dim), jnp.float32),
        status=jnp.zeros((max_tracks,), jnp.int32),
        hits=jnp.zeros((max_tracks,), jnp.int32),
        time_since_update=jnp.zeros((max_tracks,), jnp.int32),
        track_id=jnp.zeros((max_tracks,), jnp.int32),
        next_id=jnp.ones((), jnp.int32),
    )


def _tlwh_to_xyah(tlwh):
    xy = tlwh[..., :2] + 0.5 * tlwh[..., 2:4]
    a = tlwh[..., 2] / jnp.maximum(tlwh[..., 3], 1e-6)
    return jnp.stack([xy[..., 0], xy[..., 1], a, tlwh[..., 3]], axis=-1)


def _xyah_to_tlwh(xyah):
    w = xyah[..., 2] * xyah[..., 3]
    h = xyah[..., 3]
    tl = jnp.stack([xyah[..., 0] - 0.5 * w, xyah[..., 1] - 0.5 * h], axis=-1)
    return jnp.concatenate([tl, w[..., None], h[..., None]], axis=-1)


class Tracker:
    """jit-compiled tracker; `update` is a pure (state, frame) -> state fn."""

    def __init__(self, cfg: TrackerConfig, feat_dim: int = 1263):
        self.cfg = cfg
        self.feat_dim = feat_dim
        self._update = jax.jit(functools.partial(_update_impl, cfg))

    def init_state(self) -> TrackerState:
        return init_tracker_state(self.cfg.max_tracks, self.feat_dim)

    def update(self, state: TrackerState, tlwh, conf, feats, det_valid):
        """One frame. tlwh (D,4), conf (D,), feats (D,F), det_valid (D,) bool.
        Returns (state, outputs dict with tlwh/ids/valid of active tracks)."""
        return self._update(state, tlwh, conf, feats, det_valid)


def apply_gmc(state: TrackerState, affine: jnp.ndarray) -> TrackerState:
    """Warp track positions by a 2x3 affine (camera-motion compensation)."""
    a, b = affine[:, :2], affine[:, 2]
    xy = state.mean[:, :2] @ a.T + b
    vxy = state.mean[:, 4:6] @ a.T
    mean = state.mean.at[:, :2].set(xy).at[:, 4:6].set(vxy)
    return state._replace(mean=mean)


def _update_impl(cfg: TrackerConfig, state: TrackerState,
                 tlwh, conf, feats, det_valid):
    t_slots = state.mean.shape[0]
    raw_valid = det_valid
    # BYTE (ByteTrack): low-score dets participate in a second IoU-only
    # association to keep tracks alive, but never initiate tracks.
    low_valid = raw_valid & (conf >= cfg.byte_low) & \
        (conf < cfg.min_confidence) if cfg.byte else \
        jnp.zeros_like(raw_valid)
    det_valid = raw_valid & (conf >= cfg.min_confidence)
    z_xyah = _tlwh_to_xyah(tlwh)

    active = state.status > FREE
    # ---- predict all active slots
    pmean, pcov = kalman_predict(state.mean, state.cov)
    mean = jnp.where(active[:, None], pmean, state.mean)
    cov = jnp.where(active[:, None, None], pcov, state.cov)

    # ---- stage 1: confirmed x dets, appearance + motion-blend, chi2 gate
    confirmed = state.status == CONFIRMED
    app = appearance_cost(state.feat, feats)                     # (T, D)
    maha = jax.vmap(kalman_gating_distance, in_axes=(0, 0, None))(
        mean, cov, z_xyah)                                       # (T, D)
    lam = cfg.mc_lambda
    cost1 = lam * app + (1.0 - lam) * (maha / CHI2_GATE_4DOF) * cfg.max_dist
    if cfg.ocm_weight > 0:
        # OCSort observation-centric momentum: angle consistency between the
        # track's velocity and the track->detection direction.
        vel = mean[:, 4:6]                                   # (T, 2)
        diff = z_xyah[None, :, :2] - mean[:, None, :2]       # (T, D, 2)
        vn = vel / jnp.maximum(
            jnp.linalg.norm(vel, axis=-1, keepdims=True), 1e-6)
        dn = diff / jnp.maximum(
            jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-6)
        cos = jnp.sum(vn[:, None, :] * dn, axis=-1)          # (T, D)
        moving = jnp.linalg.norm(vel, axis=-1) > 1.0         # (T,)
        cost1 = cost1 + cfg.ocm_weight * jnp.where(
            moving[:, None], 1.0 - cos, 0.0)
    cost1 = jnp.where(maha > CHI2_GATE_4DOF, INF_COST, cost1)
    match1 = gated_matches(cost1, confirmed, det_valid, cfg.max_dist,
                           method=cfg.assignment)  # (T,)

    det_taken1 = jnp.zeros(det_valid.shape, bool).at[
        jnp.clip(match1, 0, det_valid.shape[0] - 1)
    ].max(match1 >= 0)

    # ---- stage 2: remaining tracks (tentative, or confirmed just-missed)
    # x remaining dets, DIoU cost (iou candidates: tsu == 1 like DeepSort)
    unmatched1 = (match1 < 0)
    iou_track = active & unmatched1 & (
        (state.status == TENTATIVE) | (state.time_since_update == 1)
    )
    track_tlwh = _xyah_to_tlwh(mean[:, :4])
    cost2 = 1.0 - diou_matrix(track_tlwh, tlwh)
    match2 = gated_matches(cost2, iou_track, det_valid & ~det_taken1,
                           cfg.max_iou_distance, method=cfg.assignment)

    match = jnp.where(match1 >= 0, match1, match2)               # (T,)

    if cfg.byte:
        # stage 3 (BYTE): still-unmatched confirmed tracks x low-score dets,
        # plain IoU gate; matched low dets update tracks only.
        det_taken12 = jnp.zeros(det_valid.shape, bool).at[
            jnp.clip(match, 0, det_valid.shape[0] - 1)
        ].max(match >= 0)
        byte_track = confirmed & (match < 0)
        match3 = gated_matches(cost2, byte_track, low_valid & ~det_taken12,
                               cfg.max_iou_distance, method=cfg.assignment)
        match = jnp.where(match >= 0, match, match3)

    matched = match >= 0
    det_idx = jnp.clip(match, 0, tlwh.shape[0] - 1)

    # ---- update matched tracks
    umean, ucov = kalman_update(mean, cov, z_xyah[det_idx])
    mean = jnp.where(matched[:, None], umean, mean)
    cov = jnp.where(matched[:, None, None], ucov, cov)
    alpha = cfg.ema_alpha
    dfeat = feats[det_idx]
    dfeat = dfeat / jnp.maximum(
        jnp.linalg.norm(dfeat, axis=-1, keepdims=True), 1e-12)
    new_feat = alpha * state.feat + (1.0 - alpha) * dfeat
    new_feat = new_feat / jnp.maximum(
        jnp.linalg.norm(new_feat, axis=-1, keepdims=True), 1e-12)
    feat = jnp.where(matched[:, None], new_feat, state.feat)

    hits = jnp.where(matched, state.hits + 1, state.hits)
    tsu = jnp.where(matched, 0, state.time_since_update + 1)

    # ---- lifecycle
    status = state.status
    status = jnp.where(
        matched & (status == TENTATIVE) & (hits >= cfg.n_init),
        CONFIRMED, status)
    # tentative missed once -> deleted; confirmed miss > max_age -> deleted
    deleted = active & ~matched & (
        (status == TENTATIVE) | (tsu > cfg.max_age)
    )
    status = jnp.where(deleted, FREE, status)
    track_id = jnp.where(deleted, 0, state.track_id)

    # ---- initiate new tracks from unmatched detections into free slots
    det_matched = jnp.zeros(det_valid.shape, bool).at[
        jnp.clip(match, 0, det_valid.shape[0] - 1)
    ].max(matched)
    new_det = det_valid & ~det_matched                            # (D,)
    free_slot = status == FREE                                    # (T,)
    # rank free slots and new dets; det j goes to the j-th free slot
    slot_rank = jnp.cumsum(free_slot.astype(jnp.int32)) - 1      # (T,)
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1         # (D,)
    n_new = jnp.sum(new_det)
    # slot i takes the det with det_rank == slot_rank[i], if any
    take = free_slot & (slot_rank < n_new)
    # build map rank -> det index
    d = det_valid.shape[0]
    rank_to_det = jnp.zeros((d,), jnp.int32).at[
        jnp.where(new_det, det_rank, d)  # index d is dropped (OOB)
    ].set(jnp.arange(d), mode="drop")
    src = rank_to_det[jnp.clip(slot_rank, 0, d - 1)]             # (T,)

    imean, icov = jax.vmap(kalman_initiate)(z_xyah[src])
    mean = jnp.where(take[:, None], imean, mean)
    cov = jnp.where(take[:, None, None], icov, cov)
    ifeat = feats[src]
    ifeat = ifeat / jnp.maximum(
        jnp.linalg.norm(ifeat, axis=-1, keepdims=True), 1e-12)
    feat = jnp.where(take[:, None], ifeat, feat)
    hits = jnp.where(take, 1, hits)
    tsu = jnp.where(take, 0, tsu)
    status = jnp.where(take, TENTATIVE, status)
    # n_init == 1 confirms immediately
    status = jnp.where(take & (cfg.n_init <= 1), CONFIRMED, status)
    new_ids = state.next_id + slot_rank
    track_id = jnp.where(take, new_ids, track_id)
    next_id = state.next_id + n_new

    new_state = TrackerState(mean, cov, feat, status, hits, tsu,
                             track_id, next_id)
    # outputs: confirmed tracks updated this frame (standard MOT output rule)
    out_valid = (status == CONFIRMED) & (tsu == 0)
    outputs = {
        "tlwh": _xyah_to_tlwh(mean[:, :4]),
        "ids": track_id,
        "valid": out_valid,
    }
    return new_state, outputs
