"""Native CLEAR + Identity tracking metrics (MOTA/MOTP/IDSW/Frag, IDF1).

The reference scores tracking through the external TrackEval repo
(ref `MOT16_eval/eval.sh:107-109` --METRICS CLEAR Identity); this module
provides the same headline metrics natively so sequences can be scored
in-framework (and in tests) without TrackEval.

Semantics follow the standard definitions (Bernardin & Stiefelhagen CLEAR
MOT; Ristani et al. identity metrics):
  * per-frame GT<->hyp correspondence at IoU >= `iou_thr`, preferring the
    previous frame's correspondence (continuity) and completing with a
    Hungarian assignment on IoU,
  * MOTA = 1 - (FN + FP + IDSW) / num_gt;  MOTP = mean IoU of matches (x100),
  * IDSW counts a matched GT whose hyp id differs from its last matched id,
  * Frag counts matched->unmatched->matched interruptions per GT track,
  * IDF1 from a global bipartite match of (gt id, hyp id) pairs maximizing
    co-detections: IDF1 = 2*IDTP / (total gt boxes + total hyp boxes).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, :2] + a[:, None, 2:4],
                    b[None, :, :2] + b[None, :, 2:4])
    wh = np.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None, :]
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def evaluate_clear_identity(
    gt_frames: Dict[int, Tuple[np.ndarray, np.ndarray]],
    hyp_frames: Dict[int, Tuple[np.ndarray, np.ndarray]],
    iou_thr: float = 0.5,
) -> Dict[str, float]:
    """gt_frames / hyp_frames: {frame: (tlwh (N,4), ids (N,))}.

    Returns dict with MOTA, MOTP, IDSW, Frag, FP, FN, IDF1, num_gt.
    """
    from scipy.optimize import linear_sum_assignment

    frames = sorted(set(gt_frames) | set(hyp_frames))
    last_hyp_of_gt: Dict[int, int] = {}       # gt id -> last matched hyp id
    gt_matched_prev: Dict[int, bool] = {}     # gt id -> matched in prev frame seen
    gt_interrupted: Dict[int, bool] = {}      # gt id -> currently in a gap
    fp = fn = idsw = frag = 0
    num_gt = num_hyp = 0
    iou_sum = 0.0
    n_matches = 0
    # co-detection counts for IDF1
    co = defaultdict(int)                     # (gt id, hyp id) -> matches
    gt_count = defaultdict(int)
    hyp_count = defaultdict(int)

    for f in frames:
        g_boxes, g_ids = gt_frames.get(f, (np.zeros((0, 4)), np.zeros(0, int)))
        h_boxes, h_ids = hyp_frames.get(f, (np.zeros((0, 4)), np.zeros(0, int)))
        g_boxes = np.asarray(g_boxes, float)
        h_boxes = np.asarray(h_boxes, float)
        g_ids = np.asarray(g_ids, int)
        h_ids = np.asarray(h_ids, int)
        num_gt += len(g_ids)
        num_hyp += len(h_ids)
        for gid in g_ids:
            gt_count[int(gid)] += 1
        for hid in h_ids:
            hyp_count[int(hid)] += 1

        iou = _iou_matrix(g_boxes, h_boxes)
        matched_g = np.full(len(g_ids), -1, int)   # index into hyp
        used_h = np.zeros(len(h_ids), bool)

        # 1) continuity: keep previous correspondence when still valid
        for gi, gid in enumerate(g_ids):
            prev = last_hyp_of_gt.get(int(gid))
            if prev is None:
                continue
            hj = np.flatnonzero(h_ids == prev)
            if len(hj) and not used_h[hj[0]] and iou[gi, hj[0]] >= iou_thr:
                matched_g[gi] = hj[0]
                used_h[hj[0]] = True

        # 2) Hungarian on the rest
        free_g = np.flatnonzero(matched_g < 0)
        free_h = np.flatnonzero(~used_h)
        if len(free_g) and len(free_h):
            sub = iou[np.ix_(free_g, free_h)]
            rows, cols = linear_sum_assignment(-sub)
            for r, c in zip(rows, cols):
                if sub[r, c] >= iou_thr:
                    matched_g[free_g[r]] = free_h[c]
                    used_h[free_h[c]] = True

        # 3) bookkeeping
        for gi, gid in enumerate(g_ids):
            gid = int(gid)
            if matched_g[gi] >= 0:
                hj = matched_g[gi]
                hid = int(h_ids[hj])
                if gid in last_hyp_of_gt and last_hyp_of_gt[gid] != hid:
                    idsw += 1
                if gt_interrupted.get(gid):
                    frag += 1
                gt_interrupted[gid] = False
                last_hyp_of_gt[gid] = hid
                iou_sum += iou[gi, hj]
                n_matches += 1
                co[(gid, hid)] += 1
            else:
                fn += 1
                if gid in last_hyp_of_gt:
                    gt_interrupted[gid] = True
        fp += int((~used_h).sum())

    # IDF1: global bipartite over id pairs maximizing IDTP
    gids = sorted(gt_count)
    hids = sorted(hyp_count)
    if gids and hids:
        mat = np.zeros((len(gids), len(hids)))
        for (g, h), c in co.items():
            mat[gids.index(g), hids.index(h)] = c
        rows, cols = linear_sum_assignment(-mat)
        idtp = mat[rows, cols].sum()
    else:
        idtp = 0.0
    idf1 = 2.0 * idtp / max(num_gt + num_hyp, 1)

    return {
        "MOTA": 100.0 * (1.0 - (fn + fp + idsw) / max(num_gt, 1)),
        "MOTP": 100.0 * (iou_sum / max(n_matches, 1)),
        "IDSW": float(idsw),
        "Frag": float(frag),
        "FP": float(fp),
        "FN": float(fn),
        "IDF1": 100.0 * idf1,
        "num_gt": float(num_gt),
    }


def load_mot_frames(path: str) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """Parse a MOT gt.txt / result txt into {frame: (tlwh, ids)}; keeps only
    pedestrian class for 9-column gt files (class column == 1)."""
    per: Dict[int, list] = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 6:
                continue
            vals = [float(v) for v in parts]
            if len(vals) >= 8 and vals[7] not in (1.0, -1.0):
                continue  # non-pedestrian gt class
            per[int(vals[0])].append((vals[2:6], int(vals[1])))
    out = {}
    for fidx, rows in per.items():
        out[fidx] = (np.asarray([r[0] for r in rows], float),
                     np.asarray([r[1] for r in rows], int))
    return out
