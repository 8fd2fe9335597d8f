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
from .costs import appearance_cost, diou_matrix, iou_matrix
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
    last_obs: jnp.ndarray    # (T, 4) xyah of the last MATCHED observation
    #                          (OCSort OCR recovery + ORU virtual trajectory)
    frozen_mean: jnp.ndarray  # (T, 8) Kalman state frozen at the last match
    frozen_cov: jnp.ndarray   # (T, 8, 8)   (OCSort ORU restart point)
    gallery: jnp.ndarray     # (T, B, F) NN_BUDGET appearance ring (B=1 when
    #                          the EMA feature is used instead)
    gallery_count: jnp.ndarray  # (T,) int32 — total feats ever enqueued


def init_tracker_state(max_tracks: int, feat_dim: int,
                       gallery_size: int = 1) -> TrackerState:
    return TrackerState(
        mean=jnp.zeros((max_tracks, 8), jnp.float32),
        cov=jnp.tile(jnp.eye(8)[None], (max_tracks, 1, 1)),
        feat=jnp.zeros((max_tracks, feat_dim), jnp.float32),
        status=jnp.zeros((max_tracks,), jnp.int32),
        hits=jnp.zeros((max_tracks,), jnp.int32),
        time_since_update=jnp.zeros((max_tracks,), jnp.int32),
        track_id=jnp.zeros((max_tracks,), jnp.int32),
        next_id=jnp.ones((), jnp.int32),
        last_obs=jnp.zeros((max_tracks, 4), jnp.float32),
        frozen_mean=jnp.zeros((max_tracks, 8), jnp.float32),
        frozen_cov=jnp.tile(jnp.eye(8)[None], (max_tracks, 1, 1)),
        gallery=jnp.zeros((max_tracks, gallery_size, feat_dim), jnp.float32),
        gallery_count=jnp.zeros((max_tracks,), jnp.int32),
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
        self._update_nofeat = jax.jit(
            functools.partial(_update_impl, cfg, has_feats=False))
        # cadence-aware EMBED-frame graph (embed_every > 1): numpy True is
        # NOT the python literal `True`, so _update_impl takes the
        # neutralization path — tracks initiated on a skip frame
        # (gallery_count == 0) stay appearance-neutral until their first
        # real feature, which REPLACES the zero placeholder. XLA constant-
        # folds the constant-true conditions, so this costs nothing.
        import numpy as _np
        self._update_cadence = jax.jit(
            functools.partial(_update_impl, cfg, has_feats=_np.True_))
        self._k_embed = max(1, int(getattr(cfg, "embed_every", 1)))

    def init_state(self) -> TrackerState:
        budget = self.cfg.nn_budget if self.cfg.use_gallery else 1
        return init_tracker_state(self.cfg.max_tracks, self.feat_dim,
                                  gallery_size=budget)

    def update(self, state: TrackerState, tlwh, conf, feats, det_valid,
               has_feats: bool = True):
        """One frame. tlwh (D,4), conf (D,), feats (D,F), det_valid (D,) bool.
        Returns (state, outputs dict with tlwh/ids/valid of active tracks).

        `has_feats=False` marks an appearance-skip frame (embed cadence,
        TrackerConfig.embed_every): association runs appearance-neutral
        (pure motion/IoU) and the EMA feature / gallery are left untouched.
        """
        if has_feats:
            if self._k_embed > 1:
                # under cadence, embed frames must still treat skip-frame-
                # initiated tracks (gallery_count == 0) as appearance-
                # unknown — same graph the chunked scan traces
                return self._update_cadence(state, tlwh, conf, feats,
                                            det_valid)
            return self._update(state, tlwh, conf, feats, det_valid)
        return self._update_nofeat(state, tlwh, conf, feats, det_valid)


def apply_gmc(state: TrackerState, affine: jnp.ndarray) -> TrackerState:
    """Warp track positions by a 2x3 affine (camera-motion compensation).
    Also warps the last observations and the ORU frozen states so OCSort-class
    recovery works under camera motion."""
    a, b = affine[:, :2], affine[:, 2]

    def warp8(m):
        xy = m[:, :2] @ a.T + b
        vxy = m[:, 4:6] @ a.T
        return m.at[:, :2].set(xy).at[:, 4:6].set(vxy)

    last = state.last_obs.at[:, :2].set(state.last_obs[:, :2] @ a.T + b)
    return state._replace(mean=warp8(state.mean), last_obs=last,
                          frozen_mean=warp8(state.frozen_mean))


def _update_impl(cfg: TrackerConfig, state: TrackerState,
                 tlwh, conf, feats, det_valid, has_feats=True):
    # `has_feats` marks whether this frame carries real appearance
    # embeddings (TrackerConfig.embed_every cadence: embed only every k-th
    # frame; in between, `feats` is zeros and has_feats=False). On a skip
    # frame the appearance term is NEUTRALIZED so every cost form reduces
    # to its pure motion/IoU geometry, and the EMA feature / NN gallery are
    # left untouched. `has_feats is True` (the python literal, the default
    # everywhere cadence is off) keeps the original graph bit-identical.
    # It may also be a traced per-frame bool (the chunked scan).
    static_hf = has_feats is True
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
    if cfg.use_gallery:
        # NN_BUDGET appearance gallery (deep_sort.yaml:10): min cosine
        # distance over the last nn_budget stored features per track.
        gn = state.gallery / jnp.maximum(jnp.linalg.norm(
            state.gallery, axis=-1, keepdims=True), 1e-12)
        dn_ = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        gsim = jnp.einsum("tbf,df->tbd", gn, dn_,
                          preferred_element_type=jnp.float32)
        budget = state.gallery.shape[1]
        filled = jnp.arange(budget)[None, :] < jnp.minimum(
            state.gallery_count, budget)[:, None]              # (T, B)
        gdist = jnp.where(filled[:, :, None], 1.0 - gsim, jnp.inf)
        app = jnp.min(gdist, axis=1)                            # (T, D)
        app = jnp.where(state.gallery_count[:, None] > 0, app, 1.0)
    else:
        app = appearance_cost(state.feat, feats)                # (T, D)
    if not static_hf:
        # Appearance-neutral value per cost form: the fused (BoT-SORT) and
        # additive-AW (DeepOCSort) forms reduce to pure IoU at app=1
        # (emb_hat -> 1 / sim -> 0); the blended (StrongSort) form reduces
        # to pure Mahalanobis motion at app=0. Applied on skip frames AND
        # for tracks that have never received a feature (initiated on a
        # skip frame — gallery_count==0 is the has-any-appearance proxy).
        neutral = 1.0 if (cfg.fuse_min or cfg.aw_scale > 0) else 0.0
        app_known = has_feats & (state.gallery_count > 0)[:, None]
        app = jnp.where(app_known, app, neutral)
    maha = jax.vmap(kalman_gating_distance, in_axes=(0, 0, None))(
        mean, cov, z_xyah)                                       # (T, D)
    track_tlwh = _xyah_to_tlwh(mean[:, :4])
    lam = cfg.mc_lambda
    if cfg.fuse_min:
        # BoT-SORT fused cost: appearance distance halved and masked by BOTH
        # the appearance threshold and box proximity, then fused with the IoU
        # distance by elementwise min.
        d_iou1 = 1.0 - iou_matrix(track_tlwh, tlwh)
        emb_hat = jnp.where(
            (app < cfg.fuse_theta_emb) & (d_iou1 < cfg.fuse_theta_prox),
            0.5 * app, 1.0)
        cost1 = jnp.minimum(d_iou1, emb_hat)
    elif cfg.aw_scale > 0:
        # DeepOCSort association: additive IoU-distance + adaptively-weighted
        # appearance similarity bonus (paper form: C = -(IoU + w*sim); the
        # adaptive weight grows where appearance is discriminative — measured
        # by the gap between best and second-best similarity per track row
        # and per detection column). Pairs outside the IoU gate are hard-
        # rejected, matching the reference's post-assignment IoU filter.
        sim = jnp.where(det_valid[None, :], 1.0 - app, 0.0)
        row2 = jax.lax.top_k(sim, 2)[0]                     # (T, 2)
        row_gap = row2[:, 0] - row2[:, 1]
        simt = jnp.where(confirmed[:, None], sim, 0.0)
        col2 = jax.lax.top_k(simt.T, 2)[0]                  # (D, 2)
        col_gap = col2[:, 0] - col2[:, 1]
        boost = 0.5 * (row_gap[:, None] + col_gap[None, :])
        w_pair = 1.0 + cfg.aw_scale * jnp.clip(boost, 0.0, 1.0)
        d_iou1 = 1.0 - iou_matrix(track_tlwh, tlwh)
        cost1 = d_iou1 - cfg.aw_assoc * sim * w_pair
        cost1 = jnp.where(d_iou1 > cfg.max_iou_distance, INF_COST, cost1)
    else:
        cost1 = lam * app + (1.0 - lam) * (maha / CHI2_GATE_4DOF) * cfg.max_dist
        if not static_hf and lam > 0:
            # SKIP frames of the embed cadence, blended form only: at
            # neutral appearance this cost degenerates to scaled
            # Mahalanobis, whose ranking collapses between near-twin
            # neighbors in crowds (measured on the hard gauntlet: IDSW
            # 229 -> 689 at embed_every=2; GMC does not help — EVAL.md).
            # Use IoU GEOMETRY instead — the same cue the fused (BoT-SORT)
            # and additive-AW (DeepOCSort) forms reduce to at neutral
            # appearance, and those methods measure quality-free under
            # cadence. Scaled so the stage-1 gate (cost < max_dist)
            # admits exactly d_iou < max_iou_distance; the chi2 hard gate
            # below still applies. lam == 0 methods (bytetrack/ocsort)
            # are excluded so their cadence bit-identity holds.
            d_iou_skip = 1.0 - iou_matrix(track_tlwh, tlwh)
            cost_skip = d_iou_skip * (cfg.max_dist / cfg.max_iou_distance)
            cost1 = jnp.where(has_feats, cost1, cost_skip)
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

    if cfg.ocr:
        # OCSort observation-centric recovery: still-unmatched tracks try a
        # plain-IoU association of their LAST OBSERVATION (not the drifted
        # Kalman prediction) against the remaining detections — recovers
        # tracks whose prediction wandered during an occlusion.
        det_taken_ocr = jnp.zeros(det_valid.shape, bool).at[
            jnp.clip(match, 0, det_valid.shape[0] - 1)
        ].max(match >= 0)
        ocr_track = active & (match < 0) & (state.hits > 0)
        last_tlwh = _xyah_to_tlwh(state.last_obs)
        cost_ocr = 1.0 - iou_matrix(last_tlwh, tlwh)
        match_ocr = gated_matches(cost_ocr, ocr_track,
                                  det_valid & ~det_taken_ocr,
                                  cfg.max_iou_distance,
                                  method=cfg.assignment)
        match = jnp.where(match >= 0, match, match_ocr)

    matched = match >= 0
    det_idx = jnp.clip(match, 0, tlwh.shape[0] - 1)

    # ---- update matched tracks
    nsa_conf = conf[det_idx] if cfg.nsa else None
    umean, ucov = kalman_update(mean, cov, z_xyah[det_idx], nsa_conf)
    mean = jnp.where(matched[:, None], umean, mean)
    cov = jnp.where(matched[:, None, None], ucov, cov)

    if cfg.oru:
        # OCSort observation-centric re-update: a track re-associated after
        # `gap` missed frames restarts from its FROZEN state (at the last
        # match) and replays predict+update along a virtual trajectory
        # linearly interpolated from its last observation to the new one, so
        # the velocity estimate is not poisoned by the blind predictions.
        gap_in = state.time_since_update                     # misses so far
        reacq = matched & (gap_in >= 1) & (state.hits > 0)
        n_steps = (gap_in + 1).astype(jnp.float32)           # predicts since
        box1 = state.last_obs                                # last match
        box2 = z_xyah[det_idx]

        def oru_body(i, mc):
            m, c = mc
            pm, pc = kalman_predict(m, c)
            frac = jnp.minimum(i / n_steps, 1.0)[:, None]
            virt = box1 + (box2 - box1) * frac
            um, uc = kalman_update(pm, pc, virt)
            live = reacq & (i <= n_steps)
            return (jnp.where(live[:, None], um, m),
                    jnp.where(live[:, None, None], uc, c))

        # Early-exit replay: past the longest reacquired gap every
        # iteration is a no-op (live=False for all tracks), so a
        # while_loop bounded by that maximum is bit-identical to the
        # full fori_loop(1, max_age+2) — and on typical frames (no
        # reacquisition, or gap 1-2) it runs 0-3 of the ~21 serial
        # predict+update steps (ref ocsort's per-track virtual-trajectory
        # replay, VERDICT r4 #3; measured numbers in ROUND_NOTES r5).
        n_max = jnp.max(jnp.where(reacq, n_steps, 0.0))
        n_cap = jnp.minimum(n_max, jnp.float32(cfg.max_age + 1))

        def oru_cond(carry):
            return carry[0] <= n_cap

        def oru_step(carry):
            i, m, c = carry
            m, c = oru_body(i, (m, c))
            return i + 1, m, c

        _, omean, ocov = jax.lax.while_loop(
            oru_cond, oru_step,
            (jnp.int32(1), state.frozen_mean, state.frozen_cov))
        mean = jnp.where(reacq[:, None], omean, mean)
        cov = jnp.where(reacq[:, None, None], ocov, cov)

    alpha = cfg.ema_alpha
    if cfg.dynamic_ema:
        # DeepOCSort dynamic appearance: low-confidence detections barely
        # move the track's appearance model (trust -> 0 => alpha -> 1).
        trust = jnp.clip(
            (conf[det_idx] - cfg.min_confidence)
            / max(1.0 - cfg.min_confidence, 1e-6), 0.0, 1.0)
        alpha = alpha + (1.0 - alpha) * (1.0 - trust)[:, None]
    dfeat = feats[det_idx]
    dfeat = dfeat / jnp.maximum(
        jnp.linalg.norm(dfeat, axis=-1, keepdims=True), 1e-12)
    new_feat = alpha * state.feat + (1.0 - alpha) * dfeat
    new_feat = new_feat / jnp.maximum(
        jnp.linalg.norm(new_feat, axis=-1, keepdims=True), 1e-12)
    # appearance model updates only consume REAL features (skip frames of
    # the embed cadence leave EMA/gallery untouched)
    matched_f = matched if static_hf else (matched & has_feats)
    # a first REAL feature replaces (not EMA-blends) the zero placeholder
    # of a track initiated on a skip frame
    if not static_hf:
        new_feat = jnp.where((state.gallery_count > 0)[:, None],
                             new_feat, dfeat)
    feat = jnp.where(matched_f[:, None], new_feat, state.feat)

    # appearance gallery ring insert (NN_BUDGET role)
    t_idx = jnp.arange(t_slots)
    budget = state.gallery.shape[1]
    ptr = state.gallery_count % budget
    cur_row = state.gallery[t_idx, ptr]
    gallery = state.gallery.at[t_idx, ptr].set(
        jnp.where(matched_f[:, None], dfeat, cur_row))
    gallery_count = jnp.where(matched_f, state.gallery_count + 1,
                              state.gallery_count)

    # ORU/OCR bookkeeping: observation + frozen state refresh on every match
    last_obs = jnp.where(matched[:, None], z_xyah[det_idx], state.last_obs)
    frozen_mean = jnp.where(matched[:, None], mean, state.frozen_mean)
    frozen_cov = jnp.where(matched[:, None, None], cov, state.frozen_cov)

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

    last_obs = jnp.where(take[:, None], z_xyah[src], last_obs)
    frozen_mean = jnp.where(take[:, None], imean, frozen_mean)
    frozen_cov = jnp.where(take[:, None, None], icov, frozen_cov)
    init_gal = jnp.zeros_like(gallery).at[:, 0, :].set(ifeat)
    gallery = jnp.where(take[:, None, None], init_gal, gallery)
    # a track initiated on a skip frame starts with NO appearance
    # (gallery_count 0 keeps its app cost neutral until a real feature
    # arrives on a later embed frame)
    init_count = 1 if static_hf else jnp.where(has_feats, 1, 0)
    gallery_count = jnp.where(take, init_count, gallery_count)

    new_state = TrackerState(mean, cov, feat, status, hits, tsu,
                             track_id, next_id, last_obs,
                             frozen_mean, frozen_cov,
                             gallery, gallery_count)
    # outputs: confirmed tracks updated this frame (standard MOT output rule)
    out_valid = (status == CONFIRMED) & (tsu == 0)
    outputs = {
        "tlwh": _xyah_to_tlwh(mean[:, :4]),
        "ids": track_id,
        "valid": out_valid,
    }
    return new_state, outputs
