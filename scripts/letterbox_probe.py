"""Attribute + fix the detector-in-the-loop letterbox cost (round 5).

The fused MOT16-load detector-in-loop program (bench.py
bench_tracking_mot16_detector_in_loop) runs 223 fps, but its stage
ceilings compose to ~260: 1/888 (yolov5s 640x640+NMS from PRE-SIZED
inputs) + 1/367 (tracker at MOT16 load) = 3.85 ms/frame vs the measured
4.48 — ~0.6 ms/frame unattributed. Chief suspect: the 1080p->360x640
`jax.image.resize` letterbox (gather-lowered on TPU), which the 888-fps
detector number never pays.

Probe (one v5e, in-jit dependent chains, relay-safe sync):
  A. resize-only microbench: jax.image.resize vs resize_bilinear_matmul
     (antialias parity) at (16, 1080, 1920, 3) -> (16, 360, 640, 3).
  B. full detector-in-loop fps: stock vs matmul-letterbox program.
  C. B + int8 embed (the missing bench variant).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_resize_only(b=16, reps=20):
    from reid_tpu.tracking.pipeline import resize_bilinear_matmul

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 255, (b, 1080, 1920, 3)).astype(np.uint8))

    def chain(fn):
        @jax.jit
        def run(f):
            x = f.astype(jnp.float32) / 255.0
            acc = jnp.zeros((), jnp.float32)

            def body(i, carry):
                acc, x = carry
                y = fn(x + acc * 1e-20)  # dependent chain
                return acc + jnp.sum(y[0, 0, :4, 0]), x

            acc, _ = jax.lax.fori_loop(0, reps, body, (acc, x))
            return acc
        return run

    out = {}
    for name, fn in (
        ("xla_resize", lambda x: jax.image.resize(
            x, (x.shape[0], 360, 640, 3), "bilinear")),
        ("matmul_resize", lambda x: resize_bilinear_matmul(x, (360, 640))),
        ("matmul_resize_bf16", lambda x: resize_bilinear_matmul(
            x.astype(jnp.bfloat16), (360, 640))),
    ):
        run = chain(fn)
        _sync(run(frames))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(run(frames))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps / b * 1000.0
        out[name] = round(ms, 4)
        print(f"  {name}: {ms:.4f} ms/frame (1080p -> 360x640)")
    return out


def bench_detector_in_loop(use_matmul_resize: bool, int8: bool = False,
                           chunk=16):
    """bench_tracking_mot16_detector_in_loop with a switchable letterbox."""
    import bench as B
    from reid_tpu.config import TrackerConfig
    from reid_tpu.models import build_model
    from reid_tpu.models.yolo import build_yolo, decode_yolo, nms_fixed
    from reid_tpu.tracking.pipeline import (make_chunked_tracker,
                                            resize_bilinear_matmul)
    from reid_tpu.tracking.tracker import init_tracker_state

    model = build_model("seres18", num_classes=751)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 128, 3)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    nms_cap = 300
    cfg = TrackerConfig(max_tracks=128, max_dets=nms_cap, n_init=2,
                        crop_hw=(256, 128), min_confidence=0.1)

    if int8:
        from reid_tpu.utils.quantize import (calibrate, quantize_weights,
                                             quantized_context)
        rngc = np.random.default_rng(1)
        calib = jnp.asarray(rngc.uniform(
            -2, 2, (64, 256, 128, 3)).astype(np.float32))
        absmax = calibrate(model, variables, [calib], train=False)
        qstate = quantize_weights(model, variables, absmax)

        def embed_fn(params, batch_stats, crops):
            with quantized_context(qstate):
                feat, logits = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    crops.astype(jnp.bfloat16), train=False)
            f = jnp.concatenate([feat.astype(jnp.float32),
                                 logits.astype(jnp.float32)], axis=1)
            return f / jnp.maximum(
                jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    else:
        def embed_fn(params, batch_stats, crops):
            feat, logits = model.apply(
                {"params": params, "batch_stats": batch_stats},
                crops.astype(jnp.bfloat16), train=False)
            f = jnp.concatenate([feat.astype(jnp.float32),
                                 logits.astype(jnp.float32)], axis=1)
            return f / jnp.maximum(
                jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)

    det_model = build_yolo("yolov5s", num_classes=1, dtype=jnp.bfloat16)
    dvars = jax.jit(lambda k, x: det_model.init(k, x, train=False))(
        jax.random.PRNGKey(1), jnp.zeros((1, 640, 640, 3), jnp.bfloat16))
    run_chunk = make_chunked_tracker(cfg, embed_fn, cfg.crop_hw, chunk,
                                     crop_budget=chunk * 64,
                                     frame_crop_cap=64)

    @jax.jit
    def full(params, batch_stats, dp, dbs, state, frames):
        x = frames.astype(jnp.bfloat16) / 255.0
        if use_matmul_resize:
            x = resize_bilinear_matmul(x, (360, 640))
        else:
            x = jax.image.resize(x, (frames.shape[0], 360, 640, 3),
                                 "bilinear")
        x = jnp.pad(x, ((0, 0), (140, 140), (0, 0), (0, 0)))
        preds = det_model.apply({"params": dp, "batch_stats": dbs}, x,
                                train=False)
        xywh, scores, cls = decode_yolo(preds, num_classes=1,
                                        max_candidates=1024)
        boxes, sc, vmask = jax.vmap(
            lambda bx, s, c: nms_fixed(bx, s, c, conf_thres=0.1,
                                       max_dets=nms_cap))(xywh, scores, cls)
        tl = jnp.stack([
            boxes[..., 0] * 3.0, (boxes[..., 1] - 140.0) * 3.0,
            boxes[..., 2] * 3.0, boxes[..., 3] * 3.0], axis=-1)
        return run_chunk(params, batch_stats, state, frames, tl,
                         jnp.maximum(sc, 0.0), vmask)

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 255, (chunk, 1080, 1920, 3)).astype(np.uint8))
    state = init_tracker_state(128, 512 + 751)
    state, outs = full(variables["params"], variables["batch_stats"],
                       dvars["params"], dvars.get("batch_stats", {}),
                       state, frames)
    _sync(outs["tlwh"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            state, outs = full(variables["params"], variables["batch_stats"],
                               dvars["params"], dvars.get("batch_stats", {}),
                               state, frames)
        _sync(outs["tlwh"])
        best = min(best, (time.perf_counter() - t0) / 3)
    fps = chunk / best
    tag = ("matmul" if use_matmul_resize else "xla") + \
        ("+int8" if int8 else "")
    print(f"  detector_in_loop[{tag}]: {fps:.1f} fps "
          f"({1000.0 / fps:.3f} ms/frame)")
    return fps


def main():
    print("== A. resize-only microbench (1080p -> 360x640) ==")
    bench_resize_only()
    print("== B. detector-in-loop fps ==")
    bench_detector_in_loop(use_matmul_resize=False)
    bench_detector_in_loop(use_matmul_resize=True)
    print("== C. + int8 embed ==")
    bench_detector_in_loop(use_matmul_resize=True, int8=True)


if __name__ == "__main__":
    main()
