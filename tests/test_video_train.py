"""Video tracklet dataset parsing + one 3D train step on synthetic MOT gt."""

import os

import numpy as np
import pytest

from reid_tpu.config import Config, ModelConfig, TrainConfig
from reid_tpu.train.video_train import VideoTrackletDataset, train_video


@pytest.fixture
def mot_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    seq = tmp_path / "MOT16-02"
    (seq / "gt").mkdir(parents=True)
    (seq / "img1").mkdir()
    for frame in range(1, 7):
        img = rng.integers(0, 255, (120, 160, 3), np.uint8)
        Image.fromarray(img).save(seq / "img1" / f"{frame:06d}.jpg")
    # MOT gt files are grouped by track id (the reference relabel logic at
    # video_reid_train.py:46-52 depends on it): two pedestrians (class 1),
    # one distractor (class 7).
    rows = []
    for tid, (x, y, cls) in enumerate([(10, 10, 1), (80, 20, 1), (5, 5, 7)],
                                      start=1):
        for frame in range(1, 7):
            rows.append(f"{frame},{tid},{x},{y},30,60,1,{cls},1")
    (seq / "gt" / "gt.txt").write_text("\n".join(rows) + "\n")
    return str(tmp_path), str(seq / "gt" / "gt.txt")


def test_video_dataset_parsing(mot_tree):
    root, gt = mot_tree
    ds = VideoTrackletDataset([gt], seq_len=4, prefix_image_path=root,
                              height=32, width=16)
    assert len(ds) == 2  # class-7 rows skipped
    rng = np.random.default_rng(0)
    seq, label = ds.load_sequence(0, rng)
    assert seq.shape == (4, 32, 16, 3)
    assert label in (0, 1)
    batches = list(ds.batches(batch_size=2, rng=rng))
    assert batches[0]["images"].shape == (2, 4, 32, 16, 3)


def test_video_train_step_runs(mot_tree):
    root, gt = mot_tree
    ds = VideoTrackletDataset([gt], seq_len=2, prefix_image_path=root,
                              height=32, width=16)
    cfg = Config(model=ModelConfig(dtype="float32"),
                 train=TrainConfig(seed=0))
    variables, losses = train_video(cfg, ds, epochs=1, batch_size=2,
                                    seq_len=2)
    assert losses and np.isfinite(losses).all()
    assert "params" in variables
