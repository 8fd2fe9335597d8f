"""Per-stage Amdahl attribution at the TRUE MOT16 operating point
(1920x1080 frames, 50 dets/frame, 64-det capacity, 128 track slots) plus a
crop-kernel A/B — run BEFORE optimizing anything at this load (the round-3
rule: stub stages to attribute per-frame ms first).

Stages, all through the same fused chunk program (chunk=32):
  full        real crops (256x128 from 1080p) + real SERes18 bf16 embed
  toy_embed   real crops, embed stubbed to a mean-pool projection
              -> full - toy_embed = embed cost
  toy_tiny    32x16 crops + toy embed = association-scan ceiling
              -> toy_embed - toy_tiny = crop-stage cost
  toy_tiny_rounds  same with assignment="greedy_rounds" (scan-isolated A/B)

Crop kernel A/B at (1080p, D=50/frame, T=32): current f32 hat-matrix
einsum vs (a) bf16-input einsum (f32 accumulate; MXU one-pass) and
(b) hybrid 2-tap row-gather Y + hat-matmul X. Reports ms/frame and
max|diff| vs the f32 reference so a winner can be promoted into
pipeline.py with a measured accuracy bound.

Run: PYTHONPATH=/root/repo python scripts/amdahl_mot16.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from bench import _mot16_scene, _sync
    from reid_tpu.config import TrackerConfig
    from reid_tpu.models import build_model
    from reid_tpu.tracking.pipeline import (crop_resize_bilinear,
                                            make_chunked_tracker)
    from reid_tpu.tracking.tracker import init_tracker_state

    chunk, max_dets, n_real, max_tracks, hw = 32, 64, 50, 128, (1080, 1920)
    feat_dim = 512 + 751
    out = {"point": "1080p/50dets/128tracks/chunk32"}

    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))

    # ---- stage-stubbed fps through the same chunk program ------------
    proj = jnp.asarray(np.random.default_rng(7).standard_normal(
        (3, feat_dim), dtype=np.float32))

    def toy_embed(params, batch_stats, crops):
        f = crops.astype(jnp.float32).mean(axis=(1, 2)) @ proj
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    def run_variant(name, embed_fn, crop_hw, assignment="greedy"):
        cfg = TrackerConfig(max_tracks=max_tracks, max_dets=max_dets,
                            n_init=2, crop_hw=crop_hw, assignment=assignment)
        run_chunk = make_chunked_tracker(cfg, embed_fn, crop_hw, chunk,
                                         crop_budget=chunk * n_real)
        rng = np.random.default_rng(0)
        frames, tlwh, conf, valid = _mot16_scene(rng, chunk, max_dets,
                                                 n_real, hw)
        state = init_tracker_state(max_tracks, feat_dim)
        state, outs = run_chunk(variables["params"],
                                variables["batch_stats"], state,
                                frames, tlwh, conf, valid)
        _sync(outs["tlwh"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                state, outs = run_chunk(variables["params"],
                                        variables["batch_stats"], state,
                                        frames, tlwh, conf, valid)
            _sync(outs["tlwh"])
            best = min(best, (time.perf_counter() - t0) / 3)
        fps = chunk / best
        out[name] = round(fps, 1)
        print(f"{name}: {fps:.1f} fps ({1000.0/fps:.3f} ms/frame)",
              flush=True)
        return fps

    def real_embed(params, batch_stats, crops):
        feat, logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            crops.astype(jnp.bfloat16), train=False)
        f = jnp.concatenate([feat.astype(jnp.float32),
                             logits.astype(jnp.float32)], axis=1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    if "--crops-only" not in sys.argv:
        f_full = run_variant("full_bf16", real_embed, (256, 128))
        f_toy = run_variant("toy_embed", toy_embed, (256, 128))
        f_tiny = run_variant("toy_tiny", toy_embed, (32, 16))
        run_variant("toy_tiny_rounds", toy_embed, (32, 16),
                    assignment="greedy_rounds")

        out["ms_embed"] = round(1000.0 / f_full - 1000.0 / f_toy, 3)
        out["ms_crop"] = round(1000.0 / f_toy - 1000.0 / f_tiny, 3)
        out["ms_scan_plus_overhead"] = round(1000.0 / f_tiny, 3)
        print(f"attribution: embed {out['ms_embed']} ms + crop "
              f"{out['ms_crop']} ms + scan/overhead "
              f"{out['ms_scan_plus_overhead']} ms", flush=True)

    # ---- crop kernel A/B at this load --------------------------------
    h, w = hw
    ch, cw = 256, 128

    def hat_weights(starts, sizes, out_dim, in_dim, dtype=jnp.float32):
        o = (jnp.arange(out_dim, dtype=jnp.float32) + 0.5) / out_dim
        src = starts[:, None] + o[None, :] * sizes[:, None] - 0.5
        src = jnp.clip(src, 0.0, in_dim - 1.0)
        cols = jnp.arange(in_dim, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(
            src[:, :, None] - cols)).astype(dtype)

    def crop_bf16(img, boxes):
        wy = hat_weights(boxes[:, 1], boxes[:, 3], ch, h, jnp.bfloat16)
        wx = hat_weights(boxes[:, 0], boxes[:, 2], cw, w, jnp.bfloat16)
        imgb = img.astype(jnp.bfloat16)
        cols = jnp.einsum("djw,hwc->djhc", wx, imgb,
                          preferred_element_type=jnp.float32)
        return jnp.einsum("djhc,dih->dijc", cols, wy.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    def crop_hybrid(img, boxes):
        # Y axis: 2-tap row gather + lerp (rows are contiguous lane-major
        # reads; the per-lane-gather pathology is column gathers)
        o = (jnp.arange(ch, dtype=jnp.float32) + 0.5) / ch
        sy = boxes[:, 1, None] + o[None, :] * boxes[:, 3, None] - 0.5
        sy = jnp.clip(sy, 0.0, h - 1.0)                     # (D, ch)
        y0 = jnp.floor(sy).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fy = (sy - y0.astype(jnp.float32))[..., None, None]
        imgf = img.astype(jnp.float32)                      # (H, W, 3)
        rows = imgf[y0] * (1.0 - fy) + imgf[y1] * fy        # (D, ch, W, 3)
        wx = hat_weights(boxes[:, 0], boxes[:, 2], cw, w)
        return jnp.einsum("diwc,djw->dijc", rows, wx,
                          preferred_element_type=jnp.float32)

    def crop_hybrid_u8(img, boxes):
        # same as crop_hybrid but gathers UINT8 rows (4x less gather
        # traffic) and defers the float convert + /255 to the lerp
        o = (jnp.arange(ch, dtype=jnp.float32) + 0.5) / ch
        sy = boxes[:, 1, None] + o[None, :] * boxes[:, 3, None] - 0.5
        sy = jnp.clip(sy, 0.0, h - 1.0)
        y0 = jnp.floor(sy).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fy = (sy - y0.astype(jnp.float32))[..., None, None]
        r0 = img[y0].astype(jnp.float32)                    # (D, ch, W, 3)
        r1 = img[y1].astype(jnp.float32)
        rows = (r0 * (1.0 - fy) + r1 * fy) * (1.0 / 255.0)
        wx = hat_weights(boxes[:, 0], boxes[:, 2], cw, w)
        return jnp.einsum("diwc,djw->dijc", rows, wx,
                          preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(
        0, 255, (chunk, h, w, 3)).astype(np.uint8))
    bw = rng.uniform(40, 160, (chunk, n_real)).astype(np.float32)
    bh = bw * rng.uniform(1.8, 2.6, (chunk, n_real)).astype(np.float32)
    bx = rng.uniform(0, w - 1, (chunk, n_real)).astype(np.float32)
    by = rng.uniform(0, h - 1, (chunk, n_real)).astype(np.float32)
    boxes = jax.device_put(np.stack([bx, by, bw, bh], axis=-1))

    def timed(tag, fn, raw_u8=False, serial=False):
        # serial=True: lax.map over the chunk axis — the row-gather
        # variants materialize a (D, ch, W, 3) f32 temp per frame
        # (~300 MB at 1080p/D=50); vmapping that over chunk=32 OOMs HBM
        # (measured: 24.4G needed). The fused tracker runs crops inside a
        # per-frame scan anyway, so serial timing is the honest analog.
        def per_frame(frame, bxs):
            img = frame if raw_u8 else frame.astype(jnp.float32) / 255.0
            return fn(img, bxs)

        if serial:
            run = jax.jit(lambda f, b: jax.lax.map(
                lambda fb: per_frame(fb[0], fb[1]), (f, b)))
        else:
            run = jax.jit(lambda f, b: jax.vmap(per_frame)(f, b))
        o = run(frames, boxes)
        _sync(o)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                o = run(frames, boxes)
            _sync(o)
            best = min(best, (time.perf_counter() - t0) / 3)
        ms = best / chunk * 1000.0
        out[f"crop_{tag}_ms_per_frame"] = round(ms, 3)
        print(f"crop {tag}: {ms:.3f} ms/frame (D={n_real})", flush=True)
        return o

    ref = timed("f32", lambda im, bx_: crop_resize_bilinear(
        im, bx_, ch, cw))
    if "--ds-ab" in sys.argv:
        # ds2 end-to-end benched as a WASH (333.7 vs 335.2 fps) despite a
        # ~3x crop-FLOP cut on paper; time the crop stage alone to see
        # whether the stage sped up at all (win lost elsewhere) or the
        # pooled einsum is bound by something FLOP-independent.
        timed("f32_ds2", lambda im, bx_: crop_resize_bilinear(
            im, bx_, ch, cw, downsample=2))
        timed("f32_ds4", lambda im, bx_: crop_resize_bilinear(
            im, bx_, ch, cw, downsample=4))
        print(json.dumps(out))
        return
    for tag, fn, raw, ser in (("bf16", crop_bf16, False, False),
                              ("hybrid", crop_hybrid, False, True),
                              ("hybrid_u8", crop_hybrid_u8, True, True)):
        o = timed(tag, fn, raw_u8=raw, serial=ser)
        d = float(jnp.max(jnp.abs(o - ref)))
        out[f"crop_{tag}_maxdiff"] = round(d, 6)
        print(f"crop {tag}: max|diff| vs f32 = {d:.6f} (pixels in [0,1])",
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
