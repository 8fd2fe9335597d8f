"""Tracker tests: Kalman numerics, DIoU vs the reference's micro-demo values,
auction assignment vs scipy, and scripted-detection ID stability
(SURVEY.md §4 rec (d))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.config import TrackerConfig
from reid_tpu.tracking import (
    Tracker,
    auction_assign,
    diou_matrix,
    hungarian_host,
    iou_matrix,
    kalman_gating_distance,
    kalman_initiate,
    kalman_predict,
    kalman_update,
)
from reid_tpu.tracking.assignment import INF_COST, gated_matches
from reid_tpu.tracking.mot import load_mot_detections, write_mot_txt


# ---------------------------------------------------------------- kalman

def test_kalman_init_predict_update_converges():
    z = jnp.asarray([10.0, 20.0, 0.5, 40.0])
    mean, cov = kalman_initiate(z)
    np.testing.assert_allclose(mean[:4], z, atol=1e-6)
    # feed constant measurements; position should stay, velocity ~0
    for _ in range(10):
        mean, cov = kalman_predict(mean, cov)
        mean, cov = kalman_update(mean, cov, z)
    np.testing.assert_allclose(np.asarray(mean[:4]), np.asarray(z), atol=0.5)
    assert abs(float(mean[4])) < 0.5

    # moving target: velocity should be learned
    mean, cov = kalman_initiate(jnp.asarray([0.0, 0.0, 0.5, 40.0]))
    for t in range(1, 15):
        mean, cov = kalman_predict(mean, cov)
        mean, cov = kalman_update(
            mean, cov, jnp.asarray([5.0 * t, 0.0, 0.5, 40.0]))
    assert 4.0 < float(mean[4]) < 6.0  # vx ~ 5


def test_kalman_gating_distance_orders():
    z = jnp.asarray([10.0, 20.0, 0.5, 40.0])
    mean, cov = kalman_initiate(z)
    ms = jnp.asarray([[10.0, 20.0, 0.5, 40.0],
                      [14.0, 20.0, 0.5, 40.0],
                      [100.0, 90.0, 0.5, 40.0]])
    d = np.asarray(kalman_gating_distance(mean, cov, ms))
    assert d[0] < d[1] < d[2]
    assert d[0] < 1e-6


# ---------------------------------------------------------------- costs

def test_diou_matches_reference_demo():
    """Ref iou_matching.py:50-53 __main__ demo values."""
    bbox = np.asarray([[10, 12, 8, 9]], np.float32)
    candidates = np.asarray([[9, 10, 9, 9], [8, 12, 9, 10], [10, 12, 9, 8]],
                            np.float32)
    got = np.asarray(diou_matrix(jnp.asarray(bbox), jnp.asarray(candidates)))[0]

    # independent numpy oracle of iou - d/rou in tlwh
    def oracle(b, cs):
        tl, br = b[:2], b[:2] + b[2:]
        c_tl, c_br = cs[:, :2], cs[:, :2] + cs[:, 2:]
        bc = (tl + br) / 2
        cc = (c_tl + c_br) / 2
        d = ((bc - cc) ** 2).sum(1)
        otl = np.minimum(tl, c_tl)
        obr = np.maximum(br, c_br)
        rou = ((otl - obr) ** 2).sum(1)
        itl = np.maximum(tl, c_tl)
        ibr = np.minimum(br, c_br)
        wh = np.maximum(0, ibr - itl)
        inter = wh.prod(1)
        iou = inter / (b[2:].prod() + cs[:, 2:].prod(1) - inter)
        return iou - d / rou

    want = oracle(bbox[0], candidates)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_identity():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert float(iou_matrix(b, b)[0, 0]) == pytest.approx(1.0)


# ------------------------------------------------------------- assignment

def test_auction_matches_scipy(rng):
    for n in (4, 8, 16):
        cost = rng.uniform(0, 2, (n, n)).astype(np.float32)
        r2c = np.asarray(auction_assign(jnp.asarray(cost), eps=1e-4))
        assert sorted(r2c) == list(range(n))  # perfect matching
        rows, cols = hungarian_host(cost)
        opt = cost[rows, cols].sum()
        got = cost[np.arange(n), r2c].sum()
        assert got <= opt + n * 1e-4 + 1e-5


def test_gated_matches_respects_gate():
    cost = jnp.asarray([[0.1, 5.0], [5.0, 0.9]])
    out = np.asarray(gated_matches(cost, jnp.asarray([True, True]),
                                   jnp.asarray([True, True]), gate=0.5))
    assert out[0] == 0        # under gate -> matched
    assert out[1] == -1       # 0.9 over gate -> rejected


# ---------------------------------------------------------------- tracker

def _frame(boxes, feat_dim=8, max_dets=8, feats=None):
    tlwh = np.zeros((max_dets, 4), np.float32)
    conf = np.zeros((max_dets,), np.float32)
    valid = np.zeros((max_dets,), bool)
    f = np.zeros((max_dets, feat_dim), np.float32)
    for i, b in enumerate(boxes):
        tlwh[i] = b
        conf[i] = 0.9
        valid[i] = True
        if feats is not None:
            f[i] = feats[i]
        else:
            f[i, i % feat_dim] = 1.0
    return (jnp.asarray(tlwh), jnp.asarray(conf), jnp.asarray(f),
            jnp.asarray(valid))


def test_tracker_stable_ids_two_targets():
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=3)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    feats = np.zeros((2, 8), np.float32)
    feats[0, 0] = 1.0
    feats[1, 1] = 1.0
    ids_per_frame = []
    for t in range(8):
        boxes = [(100 + 5 * t, 100, 20, 40), (300 - 5 * t, 200, 20, 40)]
        state, out = tracker.update(state, *_frame(boxes, feats=feats))
        valid = np.asarray(out["valid"])
        ids = np.asarray(out["ids"])[valid]
        ids_per_frame.append(sorted(ids.tolist()))
    # before n_init confirmations nothing output; afterwards 2 stable ids
    assert ids_per_frame[0] == []
    assert len(ids_per_frame[-1]) == 2
    assert ids_per_frame[3] == ids_per_frame[-1]  # stable across frames


def test_tracker_handles_miss_and_reappear():
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2, max_age=5)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    feats = np.zeros((1, 8), np.float32)
    feats[0, 0] = 1.0
    # establish a track
    for t in range(4):
        state, out = tracker.update(
            state, *_frame([(100 + 2 * t, 100, 20, 40)], feats=feats))
    established = sorted(np.asarray(out["ids"])[np.asarray(out["valid"])])
    assert len(established) == 1
    # miss 2 frames
    for _ in range(2):
        state, out = tracker.update(state, *_frame([], feats=None))
        assert np.asarray(out["valid"]).sum() == 0
    # reappear near prediction with same appearance -> same id
    state, out = tracker.update(
        state, *_frame([(112, 100, 20, 40)], feats=feats))
    back = sorted(np.asarray(out["ids"])[np.asarray(out["valid"])])
    assert back == established


def test_tracker_tentative_track_dies_on_single_miss():
    cfg = TrackerConfig(max_tracks=8, max_dets=8, n_init=3)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    state, _ = tracker.update(state, *_frame([(50, 50, 10, 20)]))
    assert int((np.asarray(state.status) > 0).sum()) == 1
    state, _ = tracker.update(state, *_frame([]))
    assert int((np.asarray(state.status) > 0).sum()) == 0


def test_tracker_low_confidence_filtered():
    cfg = TrackerConfig(max_tracks=8, max_dets=4, min_confidence=0.5)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    tlwh = jnp.asarray([[10.0, 10, 5, 5], [50, 50, 5, 5], [0, 0, 0, 0],
                        [0, 0, 0, 0]])
    conf = jnp.asarray([0.9, 0.2, 0.0, 0.0])
    feats = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    valid = jnp.asarray([True, True, False, False])
    state, _ = tracker.update(state, tlwh, conf, feats, valid)
    assert int((np.asarray(state.status) > 0).sum()) == 1


# -------------------------------------------------------------------- mot

def test_mot_roundtrip(tmp_path):
    p = tmp_path / "det.txt"
    p.write_text("1,-1,10,20,30,40,0.9\n1,-1,50,60,30,40,0.8\n"
                 "2,-1,12,22,30,40,0.7\n")
    dets = load_mot_detections(str(p), max_dets=4)
    assert set(dets) == {1, 2}
    tlwh, conf, valid = dets[1]
    assert valid.sum() == 2 and conf[0] == pytest.approx(0.9)

    out = tmp_path / "out.txt"
    rows = write_mot_txt(str(out), [{
        "frame": 1,
        "tlwh": np.asarray([[1.0, 2, 3, 4], [0, 0, 0, 0]]),
        "ids": np.asarray([7, 0]),
        "valid": np.asarray([True, False]),
    }])
    assert rows == 1
    assert out.read_text().startswith("1,7,1.00,2.00,3.00,4.00")


def test_greedy_assignment_quality(rng):
    """Greedy matches the optimal assignment on well-separated tracking-like
    costs and respects gates."""
    from reid_tpu.tracking.assignment import greedy_assign

    # well-separated: diagonal dominant
    cost = np.full((6, 6), 5.0, np.float32)
    np.fill_diagonal(cost, rng.uniform(0, 0.2, 6))
    r2c = np.asarray(greedy_assign(jnp.asarray(cost), 6))
    assert (r2c == np.arange(6)).all()

    out = np.asarray(gated_matches(
        jnp.asarray([[0.1, 5.0], [5.0, 0.9]]), jnp.asarray([True, True]),
        jnp.asarray([True, True]), gate=0.5, method="greedy"))
    assert out[0] == 0 and out[1] == -1


def test_tracker_greedy_assignment_stable_ids():
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        assignment="greedy")
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    feats = np.zeros((2, 8), np.float32)
    feats[0, 0] = 1.0
    feats[1, 1] = 1.0
    for t in range(6):
        boxes = [(100 + 5 * t, 100, 20, 40), (300 - 5 * t, 200, 20, 40)]
        state, out = tracker.update(state, *_frame(boxes, feats=feats))
    ids = sorted(np.asarray(out["ids"])[np.asarray(out["valid"])].tolist())
    assert ids == [1, 2]


def test_byte_low_score_keeps_track_alive():
    """BYTE: a confirmed track matched only by a low-score det stays updated
    (tsu == 0) but low-score dets never initiate new tracks."""
    cfg = TrackerConfig(max_tracks=8, max_dets=8, n_init=2,
                        min_confidence=0.5, byte=True, byte_low=0.1)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    feats = np.zeros((1, 8), np.float32)
    feats[0, 0] = 1.0
    for t in range(3):  # confirm with high-score dets
        state, out = tracker.update(
            state, *_frame([(100 + 2 * t, 100, 20, 40)], feats=feats))
    assert int(np.asarray(out["valid"]).sum()) == 1

    # frame with ONLY a low-score det at the predicted location + a far
    # low-score det that must not create a track
    tlwh = jnp.asarray([[106.0, 100, 20, 40], [300, 300, 20, 40]]
                       + [[0, 0, 0, 0]] * 6)
    conf = jnp.asarray([0.3, 0.3] + [0.0] * 6)
    f = jnp.zeros((8, 8)).at[0, 0].set(1.0)
    valid = jnp.asarray([True, True] + [False] * 6)
    state, out = tracker.update(state, tlwh, conf, f, valid)
    # track kept alive by the low det (output this frame)
    assert int(np.asarray(out["valid"]).sum()) == 1
    assert int(np.asarray(state.time_since_update)[
        np.asarray(state.status) == 2][0]) == 0
    # no new track from the far low-score det
    assert int((np.asarray(state.status) > 0).sum()) == 1


def test_ocm_velocity_consistency_prefers_forward_det():
    """With OCM on, a moving track prefers the detection ahead of it over an
    equally-near one behind it."""
    cfg = TrackerConfig(max_tracks=8, max_dets=8, n_init=2, mc_lambda=0.0,
                        max_dist=2.0, ocm_weight=0.5)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    # build up rightward velocity (5 px/frame keeps tentative IoU matches
    # inside the DIoU gate)
    for t in range(8):
        state, out = tracker.update(
            state, *_frame([(100 + 5 * t, 100, 20, 40)]))
    tid = np.asarray(out["ids"])[np.asarray(out["valid"])][0]
    # two candidates, ahead vs behind the one-step-ahead prediction, placed
    # inside the chi2 gate (position std ~ h/20 = 2 px)
    slot = int(np.flatnonzero(np.asarray(state.track_id) == tid)[0])
    mean = np.asarray(state.mean)[slot]
    pred_cx = float(mean[0] + mean[4])       # next-step predicted center x
    ahead = (pred_cx + 3 - 10, 100, 20, 40)  # tlwh (center -> top-left)
    behind = (pred_cx - 3 - 10, 100, 20, 40)
    state, out = tracker.update(state, *_frame([ahead, behind]))
    valid = np.asarray(out["valid"])
    ids = np.asarray(out["ids"])
    boxes = np.asarray(out["tlwh"])
    kept = boxes[valid & (ids == tid)]
    assert len(kept) == 1
    assert kept[0][0] + 10 > pred_cx  # matched the forward detection


# ------------------------------------------------- per-method algorithms

def test_ocsort_ocr_recovers_through_occlusion_where_sort_loses():
    """OCSort's observation-centric recovery: a target that STOPS during a
    10-frame occlusion reappears near its last observation. Plain SORT's
    prediction has drifted far right (stale velocity) -> IoU gate fails ->
    new ID. OCR matches the LAST OBSERVATION by IoU -> same ID."""
    from reid_tpu.tracking.methods import method_config

    def run(cfg):
        tracker = Tracker(cfg, feat_dim=8)
        state = tracker.init_state()
        # rightward motion at 8 px/frame, then occluded 10 frames
        for t in range(8):
            state, out = tracker.update(
                state, *_frame([(100 + 8 * t, 100, 20, 40)]))
        tid = np.asarray(out["ids"])[np.asarray(out["valid"])][0]
        for _ in range(10):
            state, out = tracker.update(state, *_frame([]))
        # reappears where it vanished (it stopped behind the occluder)
        state, out = tracker.update(state, *_frame([(100 + 8 * 7, 100, 20, 40)]))
        ids = np.asarray(out["ids"])[np.asarray(out["valid"])]
        return tid, ids, state

    oc = method_config("ocsort", max_tracks=8, max_dets=8, n_init=2,
                       max_age=30)
    tid, ids, state = run(oc)
    assert list(ids) == [tid], "ocsort should recover the same id"

    sort_like = method_config("ocsort", max_tracks=8, max_dets=8, n_init=2,
                              max_age=30, oru=False, ocr=False)
    tid2, ids2, _ = run(sort_like)
    assert list(ids2) != [tid2], (
        "without OCR the drifted prediction should not re-match")


def test_ocsort_oru_rebuilds_velocity_after_gap():
    """ORU: after re-association the velocity reflects the virtual trajectory
    (→ ~0 for a target that stopped), not the stale pre-occlusion velocity."""
    from reid_tpu.tracking.methods import method_config

    cfg = method_config("ocsort", max_tracks=8, max_dets=8, n_init=2,
                        max_age=30)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    for t in range(8):
        state, out = tracker.update(
            state, *_frame([(100 + 8 * t, 100, 20, 40)]))
    tid = np.asarray(out["ids"])[np.asarray(out["valid"])][0]
    for _ in range(10):
        state, out = tracker.update(state, *_frame([]))
    state, out = tracker.update(state, *_frame([(100 + 8 * 7, 100, 20, 40)]))
    slot = int(np.flatnonzero(np.asarray(state.track_id) == tid)[0])
    vx = float(np.asarray(state.mean)[slot, 4])
    assert abs(vx) < 2.0, f"ORU should re-estimate vx ~ 0, got {vx}"


def test_nsa_kalman_confidence_scales_update():
    """NSA: high-confidence measurements pull the posterior closer to the
    measurement than low-confidence ones."""
    z0 = jnp.asarray([10.0, 10.0, 0.5, 40.0])
    mean, cov = kalman_initiate(z0)
    mean, cov = kalman_predict(mean, cov)
    z = jnp.asarray([20.0, 10.0, 0.5, 40.0])
    hi, _ = kalman_update(mean, cov, z, confidence=jnp.asarray(0.99))
    lo, _ = kalman_update(mean, cov, z, confidence=jnp.asarray(0.01))
    plain, _ = kalman_update(mean, cov, z)
    assert abs(float(hi[0]) - 20.0) < abs(float(lo[0]) - 20.0)
    # conf ~ 0 approaches the unscaled-R update
    np.testing.assert_allclose(np.asarray(lo), np.asarray(plain), atol=0.2)


def test_botsort_proximity_mask_blocks_distant_appearance_match():
    """BoT-SORT fused cost: an appearance-identical detection FAR from the
    track cannot steal the match (proximity mask), the near det wins even
    with a different appearance."""
    from reid_tpu.tracking.methods import method_config

    cfg = method_config("botsort", max_tracks=8, max_dets=8, n_init=2)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    feats = np.zeros((1, 8), np.float32)
    feats[0, 0] = 1.0
    for t in range(4):
        state, out = tracker.update(
            state, *_frame([(100 + 2 * t, 100, 20, 40)], feats=feats))
    tid = np.asarray(out["ids"])[np.asarray(out["valid"])][0]
    # near det, different appearance; far det, identical appearance
    f2 = np.zeros((2, 8), np.float32)
    f2[0, 1] = 1.0       # near: orthogonal appearance
    f2[1, 0] = 1.0       # far: same appearance
    state, out = tracker.update(
        state, *_frame([(108, 100, 20, 40), (400, 300, 20, 40)], feats=f2))
    valid = np.asarray(out["valid"])
    ids = np.asarray(out["ids"])
    boxes = np.asarray(out["tlwh"])
    kept = boxes[valid & (ids == tid)]
    assert len(kept) == 1 and abs(kept[0][0] - 108) < 3.0


def test_deepocsort_dynamic_ema_scales_with_confidence():
    """Dynamic appearance: a low-confidence match barely moves the track's
    EMA feature; a high-confidence one moves it by (1-alpha)."""
    from reid_tpu.tracking.methods import method_config

    def feat_shift(det_conf):
        cfg = method_config("deepocsort", max_tracks=8, max_dets=8, n_init=2,
                            min_confidence=0.5)
        tracker = Tracker(cfg, feat_dim=8)
        state = tracker.init_state()
        fa = np.zeros((1, 8), np.float32)
        fa[0, 0] = 1.0
        for t in range(3):
            state, _ = tracker.update(
                state, *_frame([(100 + 2 * t, 100, 20, 40)], feats=fa))
        before = np.asarray(state.feat).copy()
        # new det with a rotated appearance at given confidence
        fb = np.zeros((8, 8), np.float32)
        fb[0, 1] = 1.0
        tlwh = jnp.asarray([[106.0, 100, 20, 40]] + [[0, 0, 0, 0]] * 7)
        conf = jnp.asarray([det_conf] + [0.0] * 7)
        valid = jnp.asarray([True] + [False] * 7)
        state, _ = tracker.update(state, tlwh, conf, jnp.asarray(fb), valid)
        slot = int(np.flatnonzero(np.asarray(state.status) > 0)[0])
        return float(np.linalg.norm(np.asarray(state.feat)[slot]
                                    - before[slot]))

    assert feat_shift(0.99) > feat_shift(0.55) + 0.02


def test_nn_budget_gallery_ring_and_min_distance():
    """NN_BUDGET gallery (deep_sort.yaml:10): stores the last K features per
    track (ring), appearance cost = min over the gallery — a det matching an
    OLD appearance still scores well after the live appearance drifted."""
    cfg = TrackerConfig(max_tracks=8, max_dets=8, n_init=2,
                        use_gallery=True, nn_budget=4, max_dist=0.4,
                        mc_lambda=1.0)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    # appearance rotates gradually from e0 toward e1 over 6 frames
    for t in range(6):
        theta = 0.15 * t
        f = np.zeros((1, 8), np.float32)
        f[0, 0], f[0, 1] = np.cos(theta), np.sin(theta)
        state, out = tracker.update(
            state, *_frame([(100 + 2 * t, 100, 20, 40)], feats=f))
    tid = np.asarray(out["ids"])[np.asarray(out["valid"])][0]
    slot = int(np.flatnonzero(np.asarray(state.track_id) == tid)[0])
    assert int(np.asarray(state.gallery_count)[slot]) == 6  # ring wrapped (4)
    # det with the ORIGINAL appearance e0: ring still holds recent feats only,
    # but min-distance over the gallery must beat the single-EMA distance to
    # the drifted live feature
    gal = np.asarray(state.gallery)[slot]
    # the ring holds the last 4 RAW features (thetas 0.30..0.75), not EMAs
    theta_last = 0.15 * 5
    e_last = np.zeros(8, np.float32)
    e_last[0], e_last[1] = np.cos(theta_last), np.sin(theta_last)
    gal_dists = 1.0 - (gal @ e_last) / np.maximum(
        np.linalg.norm(gal, axis=1), 1e-12)
    assert gal_dists.min() < 1e-5, "latest raw feature must be stored exactly"
    ema_dist = 1.0 - float(np.asarray(state.feat)[slot] @ e_last)
    assert ema_dist > 1e-3, "EMA is a blend, never any raw feature"
    # min-over-gallery therefore beats the EMA for a det matching the latest
    # raw appearance
    assert gal_dists.min() < ema_dist


def test_greedy_rounds_equals_sequential(rng):
    """Mutual-min rounds produce the SAME matching as the sequential greedy
    loop on tie-free matrices (200 random gated tracking-cost shapes), and
    identical totals on tie-heavy integer costs."""
    from reid_tpu.tracking.assignment import (INF_COST, greedy_assign,
                                              greedy_assign_rounds)

    for trial in range(200):
        t = int(rng.integers(2, 24))
        d = int(rng.integers(2, 24))
        c = rng.uniform(0, 2, (t, d)).astype(np.float32)
        c[rng.random((t, d)) < 0.4] = INF_COST  # gating pattern
        a = np.asarray(greedy_assign(jnp.asarray(c), min(t, d)))
        b = np.asarray(greedy_assign_rounds(jnp.asarray(c), min(t, d)))
        assert (a == b).all(), (trial, c, a, b)

    # tie-heavy: matchings may legitimately differ on exact ties, but the
    # match count and total cost must agree (both are greedy orders)
    for trial in range(50):
        t = d = 8
        c = rng.integers(0, 3, (t, d)).astype(np.float32)
        a = np.asarray(greedy_assign(jnp.asarray(c), 8))
        b = np.asarray(greedy_assign_rounds(jnp.asarray(c), 8))
        assert (a >= 0).sum() == (b >= 0).sum()
        ca = sum(c[i, j] for i, j in enumerate(a) if j >= 0)
        cb = sum(c[i, j] for i, j in enumerate(b) if j >= 0)
        assert ca == cb, (trial, ca, cb)
