"""Gauntlet scene (examples/gauntlet.py): on-disk MOT16 format contract +
preprocess_mot semantics in anger (distractors, zero-mark, crowd).

The full 5-method gauntlet with real embeddings runs on chip
(scripts/mot_gauntlet.py); these tests pin the scene's FORMAT and that the
TrackEval-exact preprocessing actually bites on it (dets removed, rows
filtered) — the r4 blind spot was preprocess_mot never running outside
unit fixtures.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

from reid_tpu.tracking.metrics import (MOT_CROWD_CLASS,
                                       MOT_DISTRACTOR_CLASSES, load_mot_gt,
                                       preprocess_mot)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from gauntlet import write_gauntlet
    out = tmp_path_factory.mktemp("gauntlet")
    img_dir, gt_path, det_path = write_gauntlet(str(out), t_total=24,
                                                n_ped=14, seed=0)
    return img_dir, gt_path, det_path


@pytest.mark.smoke
def test_gauntlet_gt_carries_all_row_kinds(scene):
    _, gt_path, _ = scene
    raw = np.loadtxt(gt_path, delimiter=",")
    classes = raw[:, 7].astype(int)
    flags = raw[:, 6].astype(int)
    assert (classes == 1).any()                      # pedestrians
    assert np.isin(classes, MOT_DISTRACTOR_CLASSES).any()
    assert (classes == MOT_CROWD_CLASS).any()
    assert ((flags == 0) & (classes == 1)).any()     # zero-marked peds
    vis = raw[:, 8]
    assert vis.min() >= 0.0 and vis.max() <= 1.0
    assert (vis < 0.5).any()                         # real occlusion


def test_gauntlet_loader_excludes_crowd(scene):
    _, gt_path, _ = scene
    gt = load_mot_gt(gt_path)
    for f in gt.values():
        assert not (f["classes"] == MOT_CROWD_CLASS).any()


def test_preprocess_bites_on_gauntlet(scene):
    """Feeding the raw detections back as a 'perfect-distractor tracker'
    must trigger every preprocessing branch: distractor-matched det
    removal, zero-mark gt filter, pedestrian class filter."""
    _, gt_path, det_path = scene
    gt = load_mot_gt(gt_path)
    det = np.loadtxt(det_path, delimiter=",")
    hyp = {}
    for f in np.unique(det[:, 0]).astype(int):
        rows = det[det[:, 0] == f]
        hyp[f] = (rows[:, 2:6], np.arange(len(rows)))
    gt_out, hyp_out = preprocess_mot(gt, hyp)

    n_hyp_in = sum(len(v[1]) for v in hyp.values())
    n_hyp_out = sum(len(v[1]) for v in hyp_out.values())
    assert n_hyp_out < n_hyp_in          # distractor dets were removed

    n_gt_raw = sum(len(v["ids"]) for v in gt.values())
    n_gt_out = sum(len(v[1]) for v in gt_out.values())
    assert n_gt_out < n_gt_raw           # zero-mark + distractor gt dropped
    # scored gt ids are pedestrians only (ids < 500 by scene construction)
    for boxes, ids in gt_out.values():
        assert (ids < 500).all()


def test_gauntlet_frames_on_disk(scene):
    img_dir, _, _ = scene
    from reid_tpu.tracking.sources import iter_frames
    frames = list(iter_frames(img_dir, 3))
    assert len(frames) == 3
    assert frames[0][0] == 1
    assert frames[0][1].shape == (480, 640, 3)
    assert frames[0][1].dtype == np.uint8
