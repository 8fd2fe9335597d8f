"""Native CLEAR + Identity tracking metrics (MOTA/MOTP/IDSW/Frag, IDF1).

The reference scores tracking through the external TrackEval repo
(ref `MOT16_eval/eval.sh:107-109` --METRICS CLEAR Identity); this module
provides the same headline metrics natively so sequences can be scored
in-framework (and in tests) without TrackEval.

Semantics follow TrackEval's algorithms exactly (property-tested against an
independent oracle in tests/test_metrics.py):

CLEAR (Bernardin & Stiefelhagen, TrackEval clear.py):
  * per frame, score = 1000 * [hyp id == gt's previous-TIMESTEP match]
    + IoU, with entries below the 0.5 IoU threshold zeroed (the continuity
    bonus cannot rescue a sub-threshold overlap); one Hungarian assignment
    maximizes the score, and pairs with positive score are the TPs,
  * MOTA = 1 - (FN + FP + IDSW) / num_gt;  MOTP = mean IoU of TPs (x100),
  * IDSW counts a TP whose gt's last-ever matched hyp id differs,
  * Frag = (number of contiguous matched runs - 1) summed over gt tracks.

Identity (Ristani et al., TrackEval identity.py):
  * co-occurrence counts over ALL IoU-feasible (gt id, hyp id) pairs per
    frame — independent of the CLEAR per-frame matching,
  * one global max-weight bipartite matching over id pairs gives IDTP;
    IDF1 = 2*IDTP / (total gt boxes + total hyp boxes), IDP = IDTP/num_hyp,
    IDR = IDTP/num_gt.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple

import numpy as np

_EPS = np.finfo(np.float64).eps


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
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

    Returns dict with MOTA, MOTP, IDSW, Frag, FP, FN, TP, IDF1, IDP, IDR,
    num_gt.
    """
    from scipy.optimize import linear_sum_assignment

    frames = sorted(set(gt_frames) | set(hyp_frames))
    prev_timestep: Dict[int, int] = {}   # gt id -> hyp matched LAST timestep
    prev_ever: Dict[int, int] = {}       # gt id -> last hyp ever matched
    match_runs: Dict[int, int] = defaultdict(int)   # gt id -> matched runs
    in_run: Dict[int, bool] = defaultdict(bool)
    fp = fn = tp = idsw = 0
    num_gt = num_hyp = 0
    motp_sum = 0.0
    # Identity: ALL IoU-feasible co-occurrences (not CLEAR matches)
    co = defaultdict(int)                # (gt id, hyp id) -> co-occurrences

    for f in frames:
        g_boxes, g_ids = gt_frames.get(f, (np.zeros((0, 4)), np.zeros(0, int)))
        h_boxes, h_ids = hyp_frames.get(f, (np.zeros((0, 4)), np.zeros(0, int)))
        g_boxes = np.asarray(g_boxes, float)
        h_boxes = np.asarray(h_boxes, float)
        g_ids = np.asarray(g_ids, int)
        h_ids = np.asarray(h_ids, int)
        num_gt += len(g_ids)
        num_hyp += len(h_ids)

        iou = _iou_matrix(g_boxes, h_boxes)
        # TrackEval's thresholds: identity.py uses `>= thr`, clear.py zeroes
        # `< thr - eps`; mirror both exactly
        for gi, hj in zip(*np.nonzero(iou >= iou_thr)):
            co[(int(g_ids[gi]), int(h_ids[hj]))] += 1
        feasible = iou >= iou_thr - _EPS

        matched_this = {}
        if len(g_ids) and len(h_ids):
            prev = np.asarray([prev_timestep.get(int(g), -1) for g in g_ids])
            bonus = 1000.0 * (h_ids[None, :] == prev[:, None])
            score = bonus + iou
            score[~feasible] = 0.0
            rows, cols = linear_sum_assignment(-score)
            ok = score[rows, cols] > _EPS
            for r, c in zip(rows[ok], cols[ok]):
                gid, hid = int(g_ids[r]), int(h_ids[c])
                if gid in prev_ever and prev_ever[gid] != hid:
                    idsw += 1
                prev_ever[gid] = hid
                matched_this[gid] = hid
                motp_sum += iou[r, c]
                tp += 1

        fn += len(g_ids) - len(matched_this)
        fp += len(h_ids) - len(matched_this)
        # continuity bonus applies only to the immediately previous timestep
        prev_timestep = matched_this
        # Frag: count contiguous matched runs per gt over its PRESENCE frames
        for gid in g_ids:
            gid = int(gid)
            if gid in matched_this:
                if not in_run[gid]:
                    match_runs[gid] += 1
                in_run[gid] = True
            else:
                in_run[gid] = False

    frag = sum(max(0, runs - 1) for runs in match_runs.values())

    # Identity: global max-weight bipartite over id pairs (weights >= 0, so
    # the rectangular assignment attains the max-weight matching)
    gids = sorted({g for g, _ in co})
    hids = sorted({h for _, h in co})
    if gids and hids:
        mat = np.zeros((len(gids), len(hids)))
        gpos = {g: i for i, g in enumerate(gids)}
        hpos = {h: j for j, h in enumerate(hids)}
        for (g, h), c in co.items():
            mat[gpos[g], hpos[h]] = c
        from scipy.optimize import linear_sum_assignment
        rows, cols = linear_sum_assignment(-mat)
        idtp = mat[rows, cols].sum()
    else:
        idtp = 0.0
    idf1 = 2.0 * idtp / max(num_gt + num_hyp, 1)

    return {
        "MOTA": 100.0 * (1.0 - (fn + fp + idsw) / max(num_gt, 1)),
        "MOTP": 100.0 * (motp_sum / max(tp, 1)),
        "IDSW": float(idsw),
        "Frag": float(frag),
        "FP": float(fp),
        "FN": float(fn),
        "TP": float(tp),
        "IDF1": 100.0 * idf1,
        "IDP": 100.0 * idtp / max(num_hyp, 1),
        "IDR": 100.0 * idtp / max(num_gt, 1),
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
