"""Secondary benchmark: end-to-end tracking throughput per chip.

Prints one JSON line {"metric": "mot_tracking_fps_per_chip", ...} measuring
the fused chunk program (crop+embed+associate) with inputs staged in HBM —
the chip-side number of the >=200 fps north star. (Host I/O through this
session's axon relay is capped at ~10 MB/s and would measure the tunnel,
not the chip; on a production host, frame H2D at 200 fps is ~0.2 GB/s,
far below PCIe.)

vs_baseline: the reference's SE-Dense-ResNet18 extractor-in-tracker speed,
17 ms/frame on P100 (README.md:82-84) ~= 58.8 fps.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from reid_tpu.config import TrackerConfig
    from reid_tpu.models import build_model
    from reid_tpu.tracking.pipeline import make_chunked_tracker
    from reid_tpu.tracking.tracker import init_tracker_state

    max_dets, chunk = 32, 32
    cfg = TrackerConfig(max_tracks=64, max_dets=max_dets, n_init=2,
                        crop_hw=(256, 128))
    model = build_model("seres18", num_classes=751, dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))

    def embed_fn(params, batch_stats, crops):
        feat, logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            crops.astype(jnp.bfloat16), train=False)
        f = jnp.concatenate([feat.astype(jnp.float32),
                             logits.astype(jnp.float32)], axis=1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    run_chunk = make_chunked_tracker(cfg, embed_fn, cfg.crop_hw, chunk)
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 255, (chunk, 480, 640, 3)).astype(np.uint8))
    tlwh = np.zeros((chunk, max_dets, 4), np.float32)
    for t in range(chunk):
        for j in range(16):  # MOT16-like density
            tlwh[t, j] = (20 + 6 * j + t, 50 + 10 * (j % 4), 40, 90)
    tlwh = jax.device_put(tlwh)
    conf = jax.device_put(np.full((chunk, max_dets), 0.9, np.float32))
    valid = jax.device_put(np.concatenate(
        [np.ones((chunk, 16), bool), np.zeros((chunk, 16), bool)], 1))
    state = init_tracker_state(64, 512 + 751)

    state, outs = run_chunk(v["params"], v["batch_stats"], state, frames,
                            tlwh, conf, valid)
    float(jnp.sum(outs["tlwh"]))  # sync (compile)
    reps = 5
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, outs = run_chunk(v["params"], v["batch_stats"], state,
                                    frames, tlwh, conf, valid)
        float(jnp.sum(outs["tlwh"]))
        best = min(best, (time.perf_counter() - t0) / reps)
    fps = chunk / best
    print(json.dumps({
        "metric": "mot_tracking_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / (1000.0 / 17.0), 2),
    }))


if __name__ == "__main__":
    main()
