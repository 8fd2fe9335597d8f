"""Assignment parity study: greedy vs auction (eps-optimal ~ Hungarian) at
MOT16 densities (40-60 dets/frame), across all 5 tracker methods.

Every reference tracker assigns with exact Hungarian/JV
(SURVEY.md §2.3, the submodule trackers' linear_sum_assignment); this
framework defaults to the ~10x-cheaper on-device greedy pass
(TrackerConfig.assignment="greedy"). This study quantifies what greedy
costs at crowd density:

  1. raw per-matrix disagreement vs scipy's exact Hungarian on the gated
     tracking-cost distribution (block-diagonal-ish + ambiguity noise),
  2. end-to-end IDSW / IDF1 / MOTA deltas per method on a dense synthetic
     crossing scene, scored with the TrackEval-parity native metrics.

Run: python examples/assignment_study.py   (CPU ok, ~2-4 min)
Results recorded in ROUND_NOTES.md.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses
import numpy as np


def build_dense_scene(t_total=150, n_t=50, h=480, w=640, seed=0,
                      miss=0.1, jitter=2.0, fps_per_frame=2, feat_noise=0.25):
    """Crowded scene: n_t targets with bouncing random walks (frequent
    crossings), noisy detections + appearance features, a few FPs."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform([0, 0], [w - 35, h - 70], (n_t, 2))
    vel = rng.normal(0, 3.0, (n_t, 2))
    base = rng.normal(size=(n_t, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    d = 64
    gt = {}
    tlwh = np.zeros((t_total, d, 4), np.float32)
    conf = np.zeros((t_total, d), np.float32)
    valid = np.zeros((t_total, d), bool)
    feats = np.zeros((t_total, d, 64), np.float32)
    for t in range(t_total):
        pos += vel
        vel += rng.normal(0, 0.6, (n_t, 2))
        for ax, lim in ((0, w - 35), (1, h - 70)):
            bounce = (pos[:, ax] < 0) | (pos[:, ax] > lim)
            vel[bounce, ax] *= -1
            pos[:, ax] = np.clip(pos[:, ax], 0, lim)
        boxes = np.concatenate([pos, np.full((n_t, 1), 30.0),
                                np.full((n_t, 1), 60.0)], axis=1)
        gt[t + 1] = (boxes.copy(), np.arange(n_t))
        slot = 0
        for i in range(n_t):
            if rng.random() < miss or slot >= d:
                continue
            tlwh[t, slot] = boxes[i] + np.concatenate(
                [rng.normal(0, jitter, 2), rng.normal(0, 1.0, 2)])
            conf[t, slot] = rng.uniform(0.6, 0.95)
            f = base[i] + feat_noise * rng.normal(size=64).astype(np.float32)
            feats[t, slot] = f / np.linalg.norm(f)
            valid[t, slot] = True
            slot += 1
        for _ in range(fps_per_frame):
            if slot >= d:
                break
            tlwh[t, slot] = (rng.uniform(0, w - 35), rng.uniform(0, h - 70),
                             30, 60)
            conf[t, slot] = rng.uniform(0.5, 0.8)
            f = rng.normal(size=64).astype(np.float32)
            feats[t, slot] = f / np.linalg.norm(f)
            valid[t, slot] = True
            slot += 1
    return gt, tlwh, conf, feats, valid


def run_tracker(method, assignment, scene, seed_note=""):
    import jax.numpy as jnp

    from reid_tpu.tracking import Tracker
    from reid_tpu.tracking.methods import method_config

    gt, tlwh, conf, feats, valid = scene
    cfg = method_config(method, max_tracks=128, max_dets=64, n_init=2)
    cfg = dataclasses.replace(cfg, assignment=assignment)
    tracker = Tracker(cfg, feat_dim=64)
    state = tracker.init_state()
    hyp = {}
    for t in range(tlwh.shape[0]):
        state, out = tracker.update(
            state, jnp.asarray(tlwh[t]), jnp.asarray(conf[t]),
            jnp.asarray(feats[t]), jnp.asarray(valid[t]))
        v = np.asarray(out["valid"])
        hyp[t + 1] = (np.asarray(out["tlwh"])[v], np.asarray(out["ids"])[v])
    from reid_tpu.tracking.metrics import evaluate_clear_identity
    return evaluate_clear_identity(gt, hyp)


def raw_disagreement(n_trials=200, t=60, dets=50, seed=1):
    """Greedy/auction vs scipy Hungarian on gated tracking-like costs."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from reid_tpu.tracking.assignment import INF_COST, gated_matches

    rng = np.random.default_rng(seed)
    stats = {"greedy": [0, 0, 0.0], "auction": [0, 0, 0.0]}  # [diff, total, excess]
    for _ in range(n_trials):
        # tracking-like cost: each det close to 1 track (strong diagonal),
        # crowd ambiguity = several sub-gate alternatives
        cost = rng.uniform(0.8, 1.0, (t, dets)).astype(np.float32)
        perm = rng.permutation(min(t, dets))
        for j, i in enumerate(perm):
            cost[i, j] = rng.uniform(0.02, 0.25)
        # ambiguity: 30% of dets get a 2nd plausible track
        for j in range(min(t, dets)):
            if rng.random() < 0.3:
                cost[rng.integers(0, t), j] = rng.uniform(0.05, 0.35)
        gate = 0.7
        cost[cost >= gate] = INF_COST
        row_valid = np.ones(t, bool)
        col_valid = np.ones(dets, bool)
        masked = np.where(cost >= INF_COST, 1e6, cost)
        r, c = linear_sum_assignment(masked)
        keep = masked[r, c] < gate
        exact = {int(rr): int(cc) for rr, cc in zip(r[keep], c[keep])}
        exact_cost = float(masked[r[keep], c[keep]].sum())
        for name in ("greedy", "auction"):
            r2c = np.asarray(gated_matches(
                jnp.asarray(cost), jnp.asarray(row_valid),
                jnp.asarray(col_valid), gate, method=name))
            got = {i: int(j) for i, j in enumerate(r2c) if j >= 0}
            got_cost = float(sum(masked[i, j] for i, j in got.items()))
            diff = sum(1 for i in set(exact) | set(got)
                       if exact.get(i, -9) != got.get(i, -9))
            stats[name][0] += diff
            stats[name][1] += max(len(exact), len(got))
            stats[name][2] += got_cost - exact_cost
    return {name: {"match_disagreement_pct": 100.0 * s[0] / max(s[1], 1),
                   "mean_excess_cost": s[2] / n_trials}
            for name, s in stats.items()}


def main():
    print("=== raw assignment vs scipy Hungarian "
          "(50 tracks x 50 dets, gated) ===")
    raw = raw_disagreement()
    for name, s in raw.items():
        print(f"  {name:8s}: match disagreement {s['match_disagreement_pct']:.2f}%  "
              f"mean excess cost {s['mean_excess_cost']:.4f}")

    print("\n=== end-to-end: 50 targets, 150 frames, ~47 dets/frame ===")
    scene = build_dense_scene()
    header = f"  {'method':12s} {'assign':8s} {'MOTA':>7s} {'IDF1':>7s} " \
             f"{'IDSW':>5s} {'FP':>5s} {'FN':>6s}"
    print(header)
    rows = []
    for method in ("strongsort", "deepocsort", "ocsort", "bytetrack",
                   "botsort"):
        per = {}
        for assignment in ("greedy", "auction"):
            m = run_tracker(method, assignment, scene)
            per[assignment] = m
            print(f"  {method:12s} {assignment:8s} {m['MOTA']:7.2f} "
                  f"{m['IDF1']:7.2f} {m['IDSW']:5.0f} {m['FP']:5.0f} "
                  f"{m['FN']:6.0f}")
        rows.append((method, per))
    print("\n  deltas (auction - greedy):")
    for method, per in rows:
        dm = per["auction"]["MOTA"] - per["greedy"]["MOTA"]
        di = per["auction"]["IDF1"] - per["greedy"]["IDF1"]
        ds = per["auction"]["IDSW"] - per["greedy"]["IDSW"]
        print(f"  {method:12s} dMOTA {dm:+6.2f}  dIDF1 {di:+6.2f}  "
              f"dIDSW {ds:+5.0f}")


if __name__ == "__main__":
    main()
