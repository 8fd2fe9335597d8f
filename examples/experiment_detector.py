"""Experiment: train the in-framework detector, then track FROM ITS OWN
DETECTIONS and score — the full detector -> tracker -> metrics loop with no
external model (the reference needs pretrained YOLOv5 weights for this;
ref track_yolov5.py:135).

Scene: 90 frames, 6 bright moving targets on dark noise. CenterNetLite is
trained on the first 60 frames' gt boxes, then the LAST 30 (unseen) frames
are tracked detector-in-the-loop and scored with the native CLEAR/Identity
metrics.

Run: python examples/experiment_detector.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


# scene shared with the int8 quality experiment (examples/_scenes.py)
from _scenes import build_detector_scene as build_scene


def main():
    import jax.numpy as jnp

    from reid_tpu.config import TrackerConfig
    from reid_tpu.tracking.metrics import evaluate_clear_identity
    from reid_tpu.tracking.pipeline import TrackingPipeline
    from reid_tpu.train.detector_train import (make_detector_fn,
                                               train_detector)

    frames, boxes, valid, gt = build_scene()
    n_train = 60
    det_hw = (240, 320)

    model, variables, losses = train_detector(
        frames[:n_train], boxes[:n_train], valid[:n_train],
        det_hw=det_hw, epochs=30, batch_size=8, lr=2e-3, base=16)
    print(f"detector loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    detect = make_detector_fn(model, variables, det_hw, max_dets=16,
                              min_conf=0.25)

    cfg = TrackerConfig(max_tracks=32, max_dets=16, n_init=2,
                        crop_hw=(64, 32), min_confidence=0.25)

    # real SERes18 appearance embeddings (same extractor family the serve
    # path uses), not a toy color statistic
    import jax

    from reid_tpu.models import build_model

    emb_model = build_model("seres18", num_classes=32, dtype=jnp.bfloat16)
    ev = jax.jit(lambda k, x: emb_model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((4, 64, 32, 3), jnp.bfloat16))

    def embed_fn(params, batch_stats, crops):
        f, l = emb_model.apply(
            {"params": params, "batch_stats": batch_stats},
            crops.astype(jnp.bfloat16), train=False)
        f = jnp.concatenate([f.astype(jnp.float32),
                             l.astype(jnp.float32)], axis=1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    pipe = TrackingPipeline(cfg, embed_fn, ev["params"],
                            ev.get("batch_stats", {}), feat_dim=512 + 32)
    eval_gt = {}
    for i, t in enumerate(range(n_train, frames.shape[0])):
        tlwh, conf, vmask = detect(frames[t])
        pipe.step(i + 1, frames[t], tlwh, conf, vmask)
        eval_gt[i + 1] = gt[t + 1]

    tracks = {
        r["frame"]: (np.asarray(r["tlwh"])[np.asarray(r["valid"])],
                     np.asarray(r["ids"])[np.asarray(r["valid"])])
        for r in pipe.results
    }
    m = evaluate_clear_identity(eval_gt, tracks)
    print("  ".join(f"{k}: {v:.2f}" for k, v in m.items()))
    assert m["MOTA"] > 0.5, "detector-driven tracking below threshold"
    print("detector-in-the-loop tracking OK")


if __name__ == "__main__":
    main()
