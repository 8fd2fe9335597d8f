"""Experiment: int8 PTQ quality measured as TRACKING METRICS, not cosine
(VERDICT r3 #3 — a 0.9999 feature cosine is not evidence that MOTA/IDF1
survive quantization; this scores it).

Part A — int8 EMBED: the per-method MOT quality scene (120 frames, 10
crossing targets, detection noise), all 5 tracker methods, bf16 vs int8
SERes18 embed through the SAME pipeline. Reported as MOTA/IDF1 deltas.

Part B — int8 DETECTOR (trained in-framework): CenterNetLite is trained on
the detector scene (ref track_yolov5.py:135 role), post-training-quantized
with utils/quantize, and the LAST 30 unseen frames are tracked
detector-in-the-loop bf16 vs int8. PTQ quality judged on TRAINED weights —
with random weights downstream layers chaotically amplify rounding noise
and the deltas mean nothing (ROUND_NOTES r3, measured).

int8-YOLO on real weights follows the same machinery one flag away
(`track.py --detector yolov5 --det_torch W --int8`, per-layer conv parity
oracle-tested in tests/test_yolo.py); without trained YOLO weights in this
zero-egress environment its end-to-end delta cannot be measured honestly,
so it is not reported here.

Run: python examples/experiment_int8_quality.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def part_a_embed(methods=("strongsort", "deepocsort", "ocsort", "bytetrack",
                          "botsort"), t_total=120):
    import jax
    import jax.numpy as jnp

    from _scenes import build_mot_scene
    from reid_tpu.models import build_model
    from reid_tpu.tracking.methods import method_config
    from reid_tpu.tracking.metrics import evaluate_clear_identity
    from reid_tpu.tracking.pipeline import TrackingPipeline
    from reid_tpu.utils.quantize import quantize, quantized_apply

    frames, tlwh, conf, valid, gt = build_mot_scene(t_total=t_total)
    t_total, max_dets = frames.shape[0], tlwh.shape[1]

    model = build_model("seres18", num_classes=128, dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((4, 128, 64, 3), jnp.bfloat16))

    # calibration = crops actually drawn from the scene distribution
    mean = np.asarray((0.485, 0.456, 0.406), np.float32)
    std = np.asarray((0.229, 0.224, 0.225), np.float32)
    rng = np.random.default_rng(0)
    patches = []
    for _ in range(64):
        t = rng.integers(0, t_total)
        y = rng.integers(0, frames.shape[1] - 128)
        x = rng.integers(0, frames.shape[2] - 64)
        patches.append(frames[t, y:y + 128, x:x + 64] / 255.0)
    calib = jnp.asarray(((np.stack(patches) - mean) / std), jnp.bfloat16)
    qs = quantize(model, v, [calib], train=False)

    def make_embed(int8):
        def embed_fn(params, batch_stats, crops):
            vv = {"params": params, "batch_stats": batch_stats}
            if int8:
                f, l = quantized_apply(model, vv, qs,
                                       crops.astype(jnp.bfloat16),
                                       train=False)
            else:
                f, l = model.apply(vv, crops.astype(jnp.bfloat16),
                                   train=False)
            f = jnp.concatenate([f.astype(jnp.float32),
                                 l.astype(jnp.float32)], axis=1)
            return f / jnp.maximum(
                jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        return embed_fn

    results = {}
    for int8 in (False, True):
        embed_fn = make_embed(int8)
        for method in methods:
            cfg = method_config(method, max_tracks=64, max_dets=max_dets,
                                n_init=2, crop_hw=(128, 64))
            # chunked path (one compile + ~t_total/chunk dispatches):
            # the per-frame step() loop is relay-dispatch-bound on the dev
            # tunnel (the 2026-08-18 queue run timed out on it).  gmc_mode
            # "host" keeps the botsort affine estimator identical to the
            # step() path, so quality rows are comparable across runs.
            pipe = TrackingPipeline(cfg, embed_fn, v["params"],
                                    v["batch_stats"], feat_dim=512 + 128,
                                    gmc_mode="host")
            pipe.run_sequence(frames, tlwh, conf, valid, chunk=24)
            hyp = {r["frame"]:
                   (np.asarray(r["tlwh"])[np.asarray(r["valid"])],
                    np.asarray(r["ids"])[np.asarray(r["valid"])])
                   for r in pipe.results}
            m = evaluate_clear_identity(gt, hyp)
            results[(method, int8)] = m
            print(f"  {'int8' if int8 else 'bf16'} {method:11s} "
                  f"MOTA {m['MOTA']:6.2f}  IDF1 {m['IDF1']:6.2f}  "
                  f"IDSW {m['IDSW']:.0f}", flush=True)

    print("\nPart A deltas (int8 - bf16):")
    for method in methods:
        b, q = results[(method, False)], results[(method, True)]
        print(f"  {method:11s} dMOTA {q['MOTA'] - b['MOTA']:+6.2f}  "
              f"dIDF1 {q['IDF1'] - b['IDF1']:+6.2f}  "
              f"dIDSW {q['IDSW'] - b['IDSW']:+.0f}")
    return results


def part_b_detector(epochs=30, n_eval=None):
    import jax
    import jax.numpy as jnp

    from _scenes import build_detector_scene
    from reid_tpu.config import TrackerConfig
    from reid_tpu.models import build_model
    from reid_tpu.tracking.metrics import evaluate_clear_identity
    from reid_tpu.tracking.pipeline import TrackingPipeline
    from reid_tpu.train.detector_train import train_detector
    from reid_tpu.models.detector import decode_detections
    from reid_tpu.utils.quantize import quantize, quantized_apply

    frames, boxes, valid, gt = build_detector_scene()
    n_train = 60
    det_hw = (240, 320)

    model, variables, losses = train_detector(
        frames[:n_train], boxes[:n_train], valid[:n_train],
        det_hw=det_hw, epochs=epochs, batch_size=8, lr=2e-3, base=16)
    print(f"  detector loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    # PTQ the TRAINED detector, calibrated on training frames
    calib = jnp.asarray(
        frames[:16].astype(np.float32) / 255.0)
    calib = jax.image.resize(calib, (16, *det_hw, 3), "bilinear")
    qs = quantize(model, variables, [calib], train=False)

    dh, dw = det_hw

    def make_detect(int8):
        @jax.jit
        def _detect(v, frame):
            img = frame.astype(jnp.float32) / 255.0
            img = jax.image.resize(img, (dh, dw, 3), "bilinear")
            if int8:
                out = quantized_apply(model, v, qs, img[None], train=False)
            else:
                out = model.apply(v, img[None], train=False)
            tlwh, scores = decode_detections(out, max_dets=16)
            tlwh, scores = tlwh[0], scores[0]      # drop the batch-1 axis
            sx = frame.shape[1] / dw
            sy = frame.shape[0] / dh
            tlwh = tlwh * jnp.asarray([sx, sy, sx, sy])
            return tlwh, scores, scores > 0.25
        return lambda fr: jax.device_get(_detect(variables,
                                                 jnp.asarray(fr)))

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

    out = {}
    for int8 in (False, True):
        detect = make_detect(int8)
        cfg = TrackerConfig(max_tracks=32, max_dets=16, n_init=2,
                            crop_hw=(64, 32), min_confidence=0.25)
        pipe = TrackingPipeline(cfg, embed_fn, ev["params"],
                                ev.get("batch_stats", {}),
                                feat_dim=512 + 32)
        eval_gt = {}
        stop = frames.shape[0] if n_eval is None else n_train + n_eval
        for i, t in enumerate(range(n_train, stop)):
            tl, cf, vm = detect(frames[t])
            pipe.step(i + 1, frames[t], tl, cf, vm)
            eval_gt[i + 1] = gt[t + 1]
        tracks = {r["frame"]:
                  (np.asarray(r["tlwh"])[np.asarray(r["valid"])],
                   np.asarray(r["ids"])[np.asarray(r["valid"])])
                  for r in pipe.results}
        m = evaluate_clear_identity(eval_gt, tracks)
        out[int8] = m
        print(f"  {'int8' if int8 else 'bf16'} detector-in-loop  "
              f"MOTA {m['MOTA']:6.2f}  IDF1 {m['IDF1']:6.2f}", flush=True)
    print(f"\nPart B delta (int8 - bf16): "
          f"dMOTA {out[True]['MOTA'] - out[False]['MOTA']:+.2f}  "
          f"dIDF1 {out[True]['IDF1'] - out[False]['IDF1']:+.2f}")
    return out


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser("experiment_int8_quality")
    p.add_argument("--platform", default="",
                   help="force a jax platform ('cpu' = host plumbing smoke; "
                        "env vars are too late under sitecustomize)")
    p.add_argument("--quick", action="store_true",
                   help="tiny plumbing smoke: 2 methods, 24 frames, "
                        "3 detector epochs (quality numbers meaningless)")
    p.add_argument("--part", choices=("a", "b", "ab"), default="ab",
                   help="run only part A (int8 embed) or B (int8 detector)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    t0 = time.time()
    if args.quick:
        if "a" in args.part:
            print("Part A (quick): int8 embed, 2 methods")
            part_a_embed(methods=("strongsort", "bytetrack"), t_total=24)
        if "b" in args.part:
            print("\nPart B (quick): int8 trained detector in the loop")
            part_b_detector(epochs=3, n_eval=6)
    else:
        if "a" in args.part:
            print("Part A: int8 embed, 5 methods")
            part_a_embed()
        if "b" in args.part:
            print("\nPart B: int8 trained detector in the loop")
            part_b_detector()
    print(f"\nDONE in {time.time() - t0:.0f}s")
