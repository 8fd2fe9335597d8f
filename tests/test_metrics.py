"""CLEAR/Identity metric tests with hand-computable scenarios, plus an
end-to-end score of the on-device tracker on a synthetic sequence."""

import numpy as np
import pytest

from reid_tpu.tracking.metrics import evaluate_clear_identity, load_mot_frames


def _frames(spec):
    """spec: {frame: [(x, y, w, h, id), ...]} -> metric input format."""
    return {f: (np.asarray([r[:4] for r in rows], float),
                np.asarray([r[4] for r in rows], int))
            for f, rows in spec.items()}


def test_perfect_tracking():
    gt = _frames({1: [(0, 0, 10, 10, 1), (50, 0, 10, 10, 2)],
                  2: [(2, 0, 10, 10, 1), (48, 0, 10, 10, 2)]})
    m = evaluate_clear_identity(gt, gt)
    assert m["MOTA"] == 100.0
    assert m["IDF1"] == 100.0
    assert m["IDSW"] == 0 and m["FP"] == 0 and m["FN"] == 0
    assert m["MOTP"] == pytest.approx(100.0)


def test_id_switch_counted():
    gt = _frames({f: [(0, 0, 10, 10, 1)] for f in range(1, 5)})
    # hypothesis switches id at frame 3
    hyp = _frames({1: [(0, 0, 10, 10, 7)], 2: [(0, 0, 10, 10, 7)],
                   3: [(0, 0, 10, 10, 8)], 4: [(0, 0, 10, 10, 8)]})
    m = evaluate_clear_identity(gt, hyp)
    assert m["IDSW"] == 1
    assert m["MOTA"] == pytest.approx(100.0 * (1 - 1 / 4))
    # IDF1: best id pairing covers 2 of 4 frames -> 2*2/(4+4)=50%
    assert m["IDF1"] == pytest.approx(50.0)


def test_fp_fn_and_frag():
    gt = _frames({1: [(0, 0, 10, 10, 1)], 2: [(0, 0, 10, 10, 1)],
                  3: [(0, 0, 10, 10, 1)]})
    # miss frame 2 (fragmentation), extra false box frame 3
    hyp = _frames({1: [(0, 0, 10, 10, 7)],
                   3: [(0, 0, 10, 10, 7), (90, 90, 5, 5, 9)]})
    m = evaluate_clear_identity(gt, hyp)
    assert m["FN"] == 1 and m["FP"] == 1
    assert m["Frag"] == 1
    assert m["IDSW"] == 0


def test_continuity_preference():
    """Two equally-overlapping hyps: the one matched previously is kept."""
    gt = _frames({1: [(0, 0, 10, 10, 1)], 2: [(0, 0, 10, 10, 1)]})
    hyp = {1: (np.asarray([[0, 0, 10, 10.0]]), np.asarray([5])),
           2: (np.asarray([[0, 0, 10, 10.0], [1, 0, 10, 10.0]]),
               np.asarray([6, 5]))}
    m = evaluate_clear_identity(gt, hyp)
    assert m["IDSW"] == 0  # kept id 5 via continuity despite lower IoU


def test_load_mot_frames(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text("1,1,10,10,20,40,1,1,1\n1,2,50,10,20,40,1,7,1\n"
                 "2,1,12,10,20,40,1,1,1\n")
    frames = load_mot_frames(str(p))
    assert set(frames) == {1, 2}
    assert len(frames[1][1]) == 1  # class-7 row dropped


def test_tracker_scores_on_synthetic_sequence():
    """End-to-end: run the on-device tracker on a scripted 3-target scene and
    score it with the native metrics — expect near-perfect MOTA/IDF1."""
    import jax.numpy as jnp

    from reid_tpu.config import TrackerConfig
    from reid_tpu.tracking import Tracker

    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=1)
    tracker = Tracker(cfg, feat_dim=8)
    state = tracker.init_state()
    feats = np.eye(3, 8, dtype=np.float32)
    gt = {}
    hyp = {}
    for t in range(20):
        boxes = [(50 + 4 * t, 50, 20, 40), (300 - 4 * t, 100, 20, 40),
                 (50 + 3 * t, 200, 20, 40)]
        gt[t + 1] = (np.asarray(boxes, float), np.arange(3))
        tlwh = np.zeros((8, 4), np.float32)
        conf = np.zeros(8, np.float32)
        valid = np.zeros(8, bool)
        f = np.zeros((8, 8), np.float32)
        for j, b in enumerate(boxes):
            tlwh[j] = b
            conf[j] = 0.9
            valid[j] = True
            f[j] = feats[j]
        state, out = tracker.update(state, jnp.asarray(tlwh),
                                    jnp.asarray(conf), jnp.asarray(f),
                                    jnp.asarray(valid))
        v = np.asarray(out["valid"])
        hyp[t + 1] = (np.asarray(out["tlwh"])[v], np.asarray(out["ids"])[v])

    m = evaluate_clear_identity(gt, hyp)
    assert m["IDSW"] == 0
    assert m["MOTA"] > 95.0
    assert m["IDF1"] > 95.0


def test_appearance_prevents_id_swap_on_crossing_targets():
    """Two targets cross paths: the appearance-based tracker (strongsort)
    keeps identities through the crossing; scored with the native metrics."""
    import jax.numpy as jnp

    from reid_tpu.config import TrackerConfig
    from reid_tpu.tracking import Tracker

    def run(cfg):
        tracker = Tracker(cfg, feat_dim=8)
        state = tracker.init_state()
        feats = np.eye(2, 8, dtype=np.float32)
        gt, hyp = {}, {}
        for t in range(24):
            # targets swap x positions over time, same y -> full crossing
            xa = 50 + 10 * t
            xb = 280 - 10 * t
            boxes = [(xa, 100, 20, 40), (xb, 100, 20, 40)]
            gt[t + 1] = (np.asarray(boxes, float), np.arange(2))
            tlwh = np.zeros((8, 4), np.float32)
            conf = np.zeros(8, np.float32)
            valid = np.zeros(8, bool)
            f = np.zeros((8, 8), np.float32)
            for j, b in enumerate(boxes):
                tlwh[j] = b
                conf[j] = 0.9
                valid[j] = True
                f[j] = feats[j]
            state, out = tracker.update(state, jnp.asarray(tlwh),
                                        jnp.asarray(conf), jnp.asarray(f),
                                        jnp.asarray(valid))
            v = np.asarray(out["valid"])
            hyp[t + 1] = (np.asarray(out["tlwh"])[v],
                          np.asarray(out["ids"])[v])
        return evaluate_clear_identity(gt, hyp)

    strong = run(TrackerConfig(max_tracks=16, max_dets=8, n_init=1))
    assert strong["IDSW"] == 0, strong
    assert strong["IDF1"] > 95.0, strong
