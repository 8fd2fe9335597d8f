"""Shared synthetic scenes for the tracking-quality experiments.

Kept in one module so the quality experiments (per-method MOT scoring,
detector-in-the-loop, int8-PTQ deltas) score on the SAME pixels — deltas
between runs are then attributable to the variant under test, not the
scene."""
import numpy as np


def build_mot_scene(t_total=120, n_t=10, max_dets=16, h=480, w=640, seed=0):
    """Crossing-target MOT scene with detection noise (8% dropout, box
    jitter, false positives). Returns (frames, tlwh, conf, valid, gt)."""
    rng = np.random.default_rng(seed)
    colors = rng.integers(60, 250, (n_t, 3))
    starts = rng.uniform([0, 0], [w - 60, h - 120], (n_t, 2))
    vels = rng.uniform(-4, 4, (n_t, 2))

    frames = np.zeros((t_total, h, w, 3), np.uint8)
    all_tlwh = np.zeros((t_total, max_dets, 4), np.float32)
    all_conf = np.zeros((t_total, max_dets), np.float32)
    all_valid = np.zeros((t_total, max_dets), bool)
    gt = {}
    for t in range(t_total):
        frame = rng.integers(0, 50, (h, w, 3)).astype(np.uint8)
        boxes, ids = [], []
        j = 0
        for i in range(n_t):
            x = float(np.clip(starts[i, 0] + vels[i, 0] * t, 0, w - 40))
            y = float(np.clip(starts[i, 1] + vels[i, 1] * t, 0, h - 90))
            w_, h_ = 32, 80
            frame[int(y):int(y + h_), int(x):int(x + w_)] = colors[i]
            boxes.append((x, y, w_, h_))
            ids.append(i)
            if rng.random() < 0.08:  # dropout
                continue
            all_tlwh[t, j] = (x + rng.normal(0, 2), y + rng.normal(0, 2),
                              w_ + rng.normal(0, 1.5), h_ + rng.normal(0, 2))
            all_conf[t, j] = 0.7 + 0.25 * rng.random()
            all_valid[t, j] = True
            j += 1
        if rng.random() < 0.3 and j < max_dets:  # false positive
            all_tlwh[t, j] = (rng.uniform(0, w - 40), rng.uniform(0, h - 90),
                              32, 80)
            all_conf[t, j] = 0.6
            all_valid[t, j] = True
        frames[t] = frame
        gt[t + 1] = (np.asarray(boxes, float), np.asarray(ids, int))
    return frames, all_tlwh, all_conf, all_valid, gt


def build_detector_scene(t_total=90, n_t=6, h=240, w=320, seed=0):
    """Bright moving targets on dark noise — trainable by CenterNetLite.
    Returns (frames, boxes, valid, gt)."""
    rng = np.random.default_rng(seed)
    colors = rng.integers(150, 250, (n_t, 3))
    starts = rng.uniform([0, 0], [w - 40, h - 70], (n_t, 2))
    vels = rng.uniform(-2.5, 2.5, (n_t, 2))
    frames = np.zeros((t_total, h, w, 3), np.uint8)
    boxes = np.zeros((t_total, 8, 4), np.float32)
    valid = np.zeros((t_total, 8), bool)
    gt = {}
    for t in range(t_total):
        frame = rng.integers(0, 40, (h, w, 3)).astype(np.uint8)
        bxs, ids = [], []
        for i in range(n_t):
            x = float(np.clip(starts[i, 0] + vels[i, 0] * t, 0, w - 24))
            y = float(np.clip(starts[i, 1] + vels[i, 1] * t, 0, h - 56))
            bw, bh = 20, 48
            frame[int(y):int(y + bh), int(x):int(x + bw)] = colors[i]
            boxes[t, i] = (x, y, bw, bh)
            valid[t, i] = True
            bxs.append((x, y, bw, bh))
            ids.append(i)
        frames[t] = frame
        gt[t + 1] = (np.asarray(bxs, float), np.asarray(ids, int))
    return frames, boxes, valid, gt
