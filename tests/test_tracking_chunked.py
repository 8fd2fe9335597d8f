"""Chunked tracker: same IDs as the per-frame path on a scripted sequence."""

import numpy as np
import jax.numpy as jnp
import pytest

from reid_tpu.config import TrackerConfig
from reid_tpu.tracking.pipeline import TrackingPipeline


def _embed_fn(params, batch_stats, crops):
    # deterministic toy embedding: mean color split into 8 bins
    m = jnp.mean(crops, axis=(1, 2))                 # (B, 3)
    return jnp.concatenate([m, m * 2.0, m * 0.5], axis=1)  # (B, 9)


def _sequence(t=20, d=8):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (t, 120, 160, 3)).astype(np.uint8)
    # paint two distinct colored targets that move
    tlwh = np.zeros((t, d, 4), np.float32)
    conf = np.zeros((t, d), np.float32)
    valid = np.zeros((t, d), bool)
    for i in range(t):
        boxes = [(10 + 3 * i, 20, 20, 40), (120 - 3 * i, 60, 20, 40)]
        for j, (x, y, w, h) in enumerate(boxes):
            frames[i, int(y):int(y + h), int(x):int(x + w)] = \
                (250, 10, 10) if j == 0 else (10, 10, 250)
            tlwh[i, j] = (x, y, w, h)
            conf[i, j] = 0.9
            valid[i, j] = True
    return frames, tlwh, conf, valid


def test_chunked_matches_streaming():
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _sequence()

    pipe_a = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    for i in range(frames.shape[0]):
        pipe_a.step(i + 1, frames[i], tlwh[i], conf[i], valid[i])

    pipe_b = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    fps = pipe_b.run_sequence(frames, tlwh, conf, valid, chunk=8)
    assert fps > 0
    assert len(pipe_b.results) == frames.shape[0]

    def track_ids(results):
        return [sorted(np.asarray(r["ids"])[np.asarray(r["valid"])].tolist())
                for r in results]

    ids_a = track_ids(pipe_a.results)
    ids_b = track_ids(pipe_b.results)
    assert ids_a == ids_b
    assert ids_a[-1] == [1, 2]


def test_chunked_with_ragged_tail():
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _sequence(t=11)
    pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    pipe.run_sequence(frames, tlwh, conf, valid, chunk=4)
    assert len(pipe.results) == 11
    assert pipe.results[-1]["frame"] == 11


def test_pipeline_botsort_gmc_path():
    """botsort preset exercises the GMC estimate+warp per frame."""
    from reid_tpu.tracking.methods import method_config

    cfg = method_config("botsort", max_tracks=8, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _sequence(t=6)
    pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    for i in range(6):
        pipe.step(i + 1, frames[i], tlwh[i], conf[i], valid[i])
    last = pipe.results[-1]
    ids = sorted(np.asarray(last["ids"])[np.asarray(last["valid"])].tolist())
    assert ids == [1, 2]


def test_frame_crop_cap_identical_when_sufficient():
    """cap >= per-frame #valid -> outputs identical to the uncapped path
    (boxes, ids, features all bit-equal); a tight cap keeps only the
    highest-confidence detections per frame."""
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _sequence()

    ref = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    ref.run_sequence(frames, tlwh, conf, valid, chunk=4)

    # 2 valid/frame; cap 3 > 2 -> identical even with 8 det slots
    capped = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    capped.run_sequence(frames, tlwh, conf, valid, chunk=4,
                        frame_crop_cap=3)
    for a, b in zip(ref.results, capped.results):
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]),
                                      np.asarray(b["ids"]))
        np.testing.assert_allclose(np.asarray(a["tlwh"]),
                                   np.asarray(b["tlwh"]), atol=1e-5)

    # cap 1 drops the lower-confidence target each frame
    conf2 = conf.copy()
    conf2[:, 1] = 0.2
    tight = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    tight.run_sequence(frames, tlwh, conf2, valid, chunk=4,
                       frame_crop_cap=1)
    kept = [int(np.asarray(r["valid"]).sum()) for r in tight.results]
    assert max(kept) <= 1


def test_bf16_handoff_identical_for_bf16_embed():
    """embed_in_dtype="bfloat16" is bit-identical to the float32 handoff
    when the embed model itself computes in bf16 (its first op casts the
    crops anyway — the knob only moves WHERE the cast happens)."""
    def bf16_embed(params, batch_stats, crops):
        m = jnp.mean(crops.astype(jnp.bfloat16), axis=(1, 2))
        return jnp.concatenate(
            [m, m * 2.0, m * 0.5], axis=1).astype(jnp.float32)

    frames, tlwh, conf, valid = _sequence()
    base = dict(max_tracks=16, max_dets=8, n_init=2, crop_hw=(32, 16))

    ref = TrackingPipeline(TrackerConfig(**base), bf16_embed, {}, {},
                           feat_dim=9)
    ref.run_sequence(frames, tlwh, conf, valid, chunk=4)

    cfg16 = TrackerConfig(**base, embed_in_dtype="bfloat16")
    fast = TrackingPipeline(cfg16, bf16_embed, {}, {}, feat_dim=9)
    fast.run_sequence(frames, tlwh, conf, valid, chunk=4)

    for a, b in zip(ref.results, fast.results):
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]),
                                      np.asarray(b["ids"]))
        np.testing.assert_array_equal(np.asarray(a["tlwh"]),
                                      np.asarray(b["tlwh"]))


def test_frame_crop_cap_zero_means_uncapped():
    """frame_crop_cap=0 set directly on the config (bypassing the CLI's
    0 -> None mapping) must behave as "no cap", NOT top_k(k=0) silently
    dropping every detection (ADVICE r4)."""
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16), frame_crop_cap=0)
    frames, tlwh, conf, valid = _sequence()
    ref = TrackingPipeline(TrackerConfig(max_tracks=16, max_dets=8,
                                         n_init=2, crop_hw=(32, 16)),
                           _embed_fn, {}, {}, feat_dim=9)
    ref.run_sequence(frames, tlwh, conf, valid, chunk=4)
    zero = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    zero.run_sequence(frames, tlwh, conf, valid, chunk=4)
    for a, b in zip(ref.results, zero.results):
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]),
                                      np.asarray(b["ids"]))
    assert any(np.asarray(r["valid"]).any() for r in zero.results)


def test_frame_crop_cap_composes_with_crop_budget():
    """Both stages on at once (per-frame cap, then chunk-global embed
    budget) still reproduce the reference outputs when neither binds."""
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _sequence()
    ref = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    ref.run_sequence(frames, tlwh, conf, valid, chunk=4)
    both = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    both.run_sequence(frames, tlwh, conf, valid, chunk=4,
                      crop_budget=8, frame_crop_cap=4)
    for a, b in zip(ref.results, both.results):
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]),
                                      np.asarray(b["ids"]))


def test_crop_budget_identical_when_sufficient():
    """budget >= #valid crops -> outputs identical to the uncompacted path;
    overflow drops lowest-confidence detections only."""
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _sequence(t=8)

    ref = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    ref.run_sequence(frames, tlwh, conf, valid, chunk=4)

    # 2 valid/frame * 4-frame chunk = 8 needed; budget 8 = exact fit
    fit = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    fit.run_sequence(frames, tlwh, conf, valid, chunk=4, crop_budget=8)

    for a, b in zip(ref.results, fit.results):
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]),
                                      np.asarray(b["ids"]))
        np.testing.assert_allclose(np.asarray(a["tlwh"]),
                                   np.asarray(b["tlwh"]), atol=1e-5)

    # overflow: one slot per chunk must be dropped — the low-conf one
    conf2 = conf.copy()
    conf2[:, 1] = 0.2   # target 2 becomes the low-confidence detection
    tight = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    tight.run_sequence(frames, tlwh, conf2, valid, chunk=4, crop_budget=4)
    kept_per_frame = [int(np.asarray(r["valid"]).sum())
                      for r in tight.results]
    assert max(kept_per_frame) <= 1  # only the high-conf target survives


def _panning_sequence(t=16, jump_at=None, jump_px=24):
    """Textured scene that pans 4 px/frame (plus an optional abrupt jump):
    two world-static targets drift in image coords with the camera."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (120, 200, 3)).astype(np.uint8)
    d = 8
    frames = np.zeros((t, 120, 160, 3), np.uint8)
    tlwh = np.zeros((t, d, 4), np.float32)
    conf = np.zeros((t, d), np.float32)
    valid = np.zeros((t, d), bool)
    off = 0
    for i in range(t):
        off += 4
        if jump_at is not None and i == jump_at:
            off += jump_px
        frames[i] = np.roll(base, -off, axis=1)[:, :160]
        boxes = [(100 - off, 20, 20, 40), (140 - off, 60, 20, 40)]
        for j, (x, y, w, h) in enumerate(boxes):
            frames[i, int(y):int(y + h), int(x):int(x + w)] = \
                (250, 10, 10) if j == 0 else (10, 10, 250)
            tlwh[i, j] = (x, y, w, h)
            conf[i, j] = 0.9
            valid[i, j] = True
    return frames, tlwh, conf, valid


def test_device_gmc_estimator_recovers_translation():
    """Batched phase-correlation on device == known integer pan."""
    from reid_tpu.tracking.gmc import chunk_affines_translation

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    frames = np.stack([np.roll(base, -4 * i, axis=1) for i in range(6)])
    affs = np.asarray(chunk_affines_translation(
        jnp.asarray(frames[0]), jnp.asarray(frames)))
    np.testing.assert_allclose(affs[0], np.eye(2, 3), atol=1e-5)
    for t in range(1, 6):
        np.testing.assert_allclose(affs[t][:, :2], np.eye(2), atol=1e-5)
        # content moves -4 px/frame in x -> affine maps prev x to x-4
        np.testing.assert_allclose(affs[t][:, 2], [-4.0, 0.0], atol=1e-5)


def test_chunked_gmc_host_mode_matches_streaming_botsort():
    """VERDICT weak #2: chunked botsort must run the same camera-motion
    compensation as the per-frame step() path. Host mode shares step()'s
    exact estimator -> identical IDs."""
    from reid_tpu.tracking.methods import method_config

    cfg = method_config("botsort", max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _panning_sequence(t=16)

    pipe_a = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    for i in range(frames.shape[0]):
        pipe_a.step(i + 1, frames[i], tlwh[i], conf[i], valid[i])

    pipe_b = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9,
                              gmc_mode="host")
    pipe_b.run_sequence(frames, tlwh, conf, valid, chunk=8)

    def track_ids(results):
        return [sorted(np.asarray(r["ids"])[np.asarray(r["valid"])].tolist())
                for r in results]

    assert track_ids(pipe_a.results) == track_ids(pipe_b.results)
    assert track_ids(pipe_b.results)[-1] == [1, 2]


def test_gmc_override_strongsort_survives_camera_jump():
    """cfg.gmc=True forces camera-motion compensation for a non-botsort
    method (upstream StrongSORT ships ecc: true). With the override,
    strongsort keeps both identities across an abrupt 24 px pan; composed
    with embed_every=2 the skip frames' motion gate stays valid too."""
    from reid_tpu.tracking.methods import method_config, uses_gmc

    frames, tlwh, conf, valid = _panning_sequence(t=16, jump_at=8)
    for k in (1, 2):
        cfg = method_config("strongsort", max_tracks=16, max_dets=8,
                            n_init=2, crop_hw=(32, 16), gmc=True,
                            embed_every=k)
        assert uses_gmc(cfg)
        pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9,
                                gmc_mode="device")
        pipe.run_sequence(frames, tlwh, conf, valid, chunk=8)
        all_ids = {int(i) for r in pipe.results
                   for i in np.asarray(r["ids"])[np.asarray(r["valid"])]}
        assert all_ids == {1, 2}, (k, all_ids)
    # gmc=False forces it OFF for botsort; None keeps method defaults
    assert not uses_gmc(method_config("botsort", gmc=False))
    assert uses_gmc(method_config("botsort"))
    assert not uses_gmc(method_config("strongsort"))


def test_chunked_gmc_device_mode_survives_camera_jump():
    """Device-estimated GMC keeps identities across an abrupt 24 px pan
    (which breaks the motion gate when uncompensated)."""
    from reid_tpu.tracking.methods import method_config

    cfg = method_config("botsort", max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    frames, tlwh, conf, valid = _panning_sequence(t=16, jump_at=8)

    pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9,
                            gmc_mode="device")
    pipe.run_sequence(frames, tlwh, conf, valid, chunk=8)
    last = pipe.results[-1]
    ids = sorted(np.asarray(last["ids"])[np.asarray(last["valid"])].tolist())
    assert ids == [1, 2]
    # no id churn anywhere in the run
    all_ids = {int(i) for r in pipe.results
               for i in np.asarray(r["ids"])[np.asarray(r["valid"])]}
    assert all_ids == {1, 2}


def test_sharded_streams_match_sequential():
    """8 independent streams sharded over the 8-device mesh produce exactly
    the per-stream sequential results (streams are device-local under GSPMD;
    params replicated)."""
    import jax
    from reid_tpu.tracking.pipeline import make_chunked_tracker
    from reid_tpu.tracking.streams import (init_stream_states,
                                           make_stream_tracker)
    from reid_tpu.parallel import make_mesh

    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16))
    n_streams, t = 8, 8
    seqs = []
    for s in range(n_streams):
        frames, tlwh, conf, valid = _sequence(t=t)
        # make streams distinct: shift boxes per stream
        tlwh = tlwh + np.asarray([2.0 * s, s % 3, 0, 0])
        seqs.append((frames, tlwh, conf, valid))
    frames = np.stack([q[0] for q in seqs])
    tlwh = np.stack([q[1] for q in seqs])
    conf = np.stack([q[2] for q in seqs])
    valid = np.stack([q[3] for q in seqs])

    mesh = make_mesh(8)
    run = make_stream_tracker(cfg, _embed_fn, cfg.crop_hw, chunk=t,
                              mesh=mesh)
    states = init_stream_states(n_streams, cfg.max_tracks, feat_dim=9)
    states, outs = run({}, {}, states,
                       jnp.asarray(frames), jnp.asarray(tlwh),
                       jnp.asarray(conf), jnp.asarray(valid))

    single = make_chunked_tracker(cfg, _embed_fn, cfg.crop_hw, chunk=t)
    from reid_tpu.tracking.tracker import init_tracker_state
    for s in range(n_streams):
        st = init_tracker_state(cfg.max_tracks, feat_dim=9)
        st, ref = single({}, {}, st, jnp.asarray(frames[s]),
                         jnp.asarray(tlwh[s]), jnp.asarray(conf[s]),
                         jnp.asarray(valid[s]))
        np.testing.assert_array_equal(np.asarray(outs["ids"][s]),
                                      np.asarray(ref["ids"]))
        np.testing.assert_array_equal(np.asarray(outs["valid"][s]),
                                      np.asarray(ref["valid"]))
        np.testing.assert_allclose(np.asarray(outs["tlwh"][s]),
                                   np.asarray(ref["tlwh"]), atol=1e-4)


def test_crowd_density_48_targets():
    """MOT16-crowd capacity (VERDICT r3 weak #4): 48 concurrent targets in
    a 64-slot det capacity with 128 track slots — every target tracked with
    a stable id through the chunked path."""
    t_total, n_t = 10, 48
    h, w = 260, 340
    rng = np.random.default_rng(3)
    colors = rng.integers(40, 250, (n_t, 3))
    frames = np.zeros((t_total, h, w, 3), np.uint8)
    tlwh = np.zeros((t_total, 64, 4), np.float32)
    conf = np.zeros((t_total, 64), np.float32)
    valid = np.zeros((t_total, 64), bool)
    for t in range(t_total):
        fr = rng.integers(0, 30, (h, w, 3)).astype(np.uint8)
        for i in range(n_t):
            gx, gy = i % 8, i // 8
            x = 4 + 40 * gx + 1.5 * t
            y = 6 + 40 * gy
            fr[int(y):int(y + 24), int(x):int(x + 14)] = colors[i]
            tlwh[t, i] = (x, y, 14, 24)
            conf[t, i] = 0.9
            valid[t, i] = True
        frames[t] = fr

    cfg = TrackerConfig(max_tracks=128, max_dets=64, n_init=2,
                        crop_hw=(16, 8))
    pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    pipe.run_sequence(frames, tlwh, conf, valid, chunk=5,
                      crop_budget=5 * 52)
    per_frame_ids = [np.asarray(r["ids"])[np.asarray(r["valid"])]
                     for r in pipe.results]
    # all 48 confirmed from frame n_init+1 on, with STABLE ids
    assert len(per_frame_ids[-1]) == 48, len(per_frame_ids[-1])
    stable = set(per_frame_ids[3].tolist())
    assert len(stable) == 48
    for ids in per_frame_ids[4:]:
        assert set(ids.tolist()) == stable


def test_crop_downsample_close_on_smooth_image():
    """crop_downsample=2 crops from a 2x2-avg-pooled plane; on a smooth
    image the result must match the full-res crop closely (a linear ramp is
    preserved exactly by avg-pool + bilinear away from edges)."""
    from reid_tpu.tracking.pipeline import crop_resize_bilinear
    h, w = 120, 160
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], -1).astype(
        np.float32)
    boxes = jnp.asarray([[30.0, 20.0, 40.0, 60.0],
                         [100.0, 50.0, 30.0, 50.0]])
    full = crop_resize_bilinear(jnp.asarray(img), boxes, 32, 16)
    ds2 = crop_resize_bilinear(jnp.asarray(img), boxes, 32, 16,
                               downsample=2)
    assert ds2.shape == full.shape
    assert float(jnp.abs(ds2 - full).max()) < 0.02


def test_crop_downsample_odd_dims():
    """Edge padding handles frames not divisible by the factor."""
    from reid_tpu.tracking.pipeline import crop_resize_bilinear
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((121, 161, 3), dtype=np.float32))
    boxes = jnp.asarray([[5.0, 5.0, 50.0, 70.0]])
    out = crop_resize_bilinear(img, boxes, 32, 16, downsample=2)
    assert out.shape == (1, 32, 16, 3)
    assert bool(jnp.isfinite(out).all())


def test_crop_downsample_tracks_match():
    """Solid-color targets: the 2x2-pooled crop plane yields the same track
    ids as full-res through the chunked path (config knob end-to-end)."""
    frames, tlwh, conf, valid = _sequence()

    def run(ds):
        cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                            crop_hw=(32, 16), crop_downsample=ds)
        pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
        pipe.run_sequence(frames, tlwh, conf, valid, chunk=8)
        return [sorted(np.asarray(r["ids"])[np.asarray(r["valid"])].tolist())
                for r in pipe.results]

    assert run(1) == run(2)
    assert run(2)[-1] == [1, 2]


def test_per_frame_crop_cap_parity_and_capping():
    """cfg.frame_crop_cap on the PER-FRAME step path: cap >= #valid is
    output-identical to the uncapped path (same contract the chunked path
    proves for make_chunked_tracker); cap < #valid keeps only the top-cap
    by confidence."""
    frames, tlwh, conf, valid = _sequence()
    base = dict(max_tracks=16, max_dets=8, n_init=2, crop_hw=(32, 16))

    pipe_a = TrackingPipeline(TrackerConfig(**base), _embed_fn, {}, {},
                              feat_dim=9)
    pipe_b = TrackingPipeline(TrackerConfig(**base, frame_crop_cap=4),
                              _embed_fn, {}, {}, feat_dim=9)
    for i in range(frames.shape[0]):
        pipe_a.step(i + 1, frames[i], tlwh[i], conf[i], valid[i])
        pipe_b.step(i + 1, frames[i], tlwh[i], conf[i], valid[i])

    for ra, rb in zip(pipe_a.results, pipe_b.results):
        va, vb = np.asarray(ra["valid"]), np.asarray(rb["valid"])
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_array_equal(np.asarray(ra["ids"])[va],
                                      np.asarray(rb["ids"])[vb])
        np.testing.assert_allclose(np.asarray(ra["tlwh"])[va],
                                   np.asarray(rb["tlwh"])[vb], rtol=1e-5)

    # cap below the load: 2 real targets, cap=1 -> only the higher-conf
    # box survives the crop stage each frame
    conf2 = conf.copy()
    conf2[:, 1] = 0.6   # target 2 strictly lower confidence
    pipe_c = TrackingPipeline(TrackerConfig(**base, frame_crop_cap=1),
                              _embed_fn, {}, {}, feat_dim=9)
    for i in range(frames.shape[0]):
        out = pipe_c.step(i + 1, frames[i], tlwh[i], conf2[i], valid[i])
        assert int(np.asarray(out["valid"]).sum()) <= 1
    ids_last = np.asarray(pipe_c.results[-1]["ids"])[
        np.asarray(pipe_c.results[-1]["valid"])]
    assert ids_last.tolist() == [1]


def test_embed_every_chunk_mismatch_raises():
    """chunk % embed_every != 0 would make the cadence phase dynamic per
    chunk; the builder must refuse it loudly."""
    from reid_tpu.tracking.pipeline import make_chunked_tracker

    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16), embed_every=3)
    with pytest.raises(ValueError, match="embed_every"):
        make_chunked_tracker(cfg, _embed_fn, cfg.crop_hw, chunk=8)


def test_embed_every_tracks_match_full_cadence():
    """On the scripted 2-target scene, embedding every 2nd/4th frame keeps
    the same stable ids as embedding every frame (motion carries the skip
    frames), through the chunked path."""
    frames, tlwh, conf, valid = _sequence()

    def run(k):
        cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                            crop_hw=(32, 16), embed_every=k)
        pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
        pipe.run_sequence(frames, tlwh, conf, valid, chunk=8)
        return [sorted(np.asarray(r["ids"])[np.asarray(r["valid"])].tolist())
                for r in pipe.results]

    ids1, ids2, ids4 = run(1), run(2), run(4)
    assert ids1 == ids2 == ids4
    assert ids1[-1] == [1, 2]


def test_embed_every_per_frame_matches_chunked():
    """The per-frame step() cadence is phase-aligned with the chunked path:
    identical ids/valid for embed_every=2."""
    cfg = TrackerConfig(max_tracks=16, max_dets=8, n_init=2,
                        crop_hw=(32, 16), embed_every=2)
    frames, tlwh, conf, valid = _sequence()

    pipe_a = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    for i in range(frames.shape[0]):
        pipe_a.step(i + 1, frames[i], tlwh[i], conf[i], valid[i])

    pipe_b = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
    pipe_b.run_sequence(frames, tlwh, conf, valid, chunk=4)

    def sig(results):
        return [(sorted(np.asarray(r["ids"])[np.asarray(r["valid"])]
                        .tolist()),
                 int(np.asarray(r["valid"]).sum())) for r in results]

    assert sig(pipe_a.results) == sig(pipe_b.results)


def test_embed_every_composes_with_caps():
    """Cadence + frame_crop_cap + crop_budget together: when neither cap
    binds, outputs match the cadence-only run; skip frames keep their
    detections valid even under a tight crop cap (they do no crop work)."""
    frames, tlwh, conf, valid = _sequence()
    base = dict(max_tracks=16, max_dets=8, n_init=2, crop_hw=(32, 16),
                embed_every=2)

    ref = TrackingPipeline(TrackerConfig(**base), _embed_fn, {}, {},
                           feat_dim=9)
    ref.run_sequence(frames, tlwh, conf, valid, chunk=4)

    both = TrackingPipeline(TrackerConfig(**base), _embed_fn, {}, {},
                            feat_dim=9)
    # 2 embed frames/chunk x cap 3 >= 2 valid -> budget 6 >= 2x2 needed
    both.run_sequence(frames, tlwh, conf, valid, chunk=4,
                      crop_budget=6, frame_crop_cap=3)
    for a, b in zip(ref.results, both.results):
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        np.testing.assert_array_equal(np.asarray(a["ids"]),
                                      np.asarray(b["ids"]))

    # tight cap=1: embed frames keep 1 det, skip frames keep BOTH
    # (cadence contract: the cap bounds CROP work, skip frames do none).
    # n_init=1 so the low-conf target — seen only on skip frames, its det
    # is capped away on every embed frame — still reaches the output there.
    conf2 = conf.copy()
    conf2[:, 1] = 0.6   # above min_confidence, below target 1's 0.9
    tight_cfg = TrackerConfig(**{**base, "n_init": 1})
    tight = TrackingPipeline(tight_cfg, _embed_fn, {}, {}, feat_dim=9)
    tight.run_sequence(frames, tlwh, conf2, valid, chunk=4,
                       frame_crop_cap=1)
    # detections on skip frames survive the cap: those frames track BOTH
    kept = [int(np.asarray(r["valid"]).sum()) for r in tight.results]
    assert max(kept) == 2
    # and embed frames are capped to the single high-conf target
    assert min(kept[2:]) == 1


def test_embed_every_output_identical_for_appearance_free_methods():
    """bytetrack/ocsort never consult appearance (mc_lambda=0, no fused/AW
    term), so any cadence must yield bit-identical track outputs — the
    cadence only skips work these methods never used."""
    from reid_tpu.tracking.methods import method_config

    frames, tlwh, conf, valid = _sequence()
    for method in ("bytetrack", "ocsort"):
        outs = {}
        for k in (1, 2):
            cfg = method_config(method, max_tracks=16, max_dets=8,
                                n_init=2, crop_hw=(32, 16), embed_every=k)
            pipe = TrackingPipeline(cfg, _embed_fn, {}, {}, feat_dim=9)
            pipe.run_sequence(frames, tlwh, conf, valid, chunk=4)
            outs[k] = pipe.results
        for a, b in zip(outs[1], outs[2]):
            np.testing.assert_array_equal(np.asarray(a["valid"]),
                                          np.asarray(b["valid"]))
            np.testing.assert_array_equal(np.asarray(a["ids"]),
                                          np.asarray(b["ids"]))
            np.testing.assert_array_equal(np.asarray(a["tlwh"]),
                                          np.asarray(b["tlwh"]))


def test_embed_every_skip_frame_blended_form_gates_on_iou():
    """Skip frames of the BLENDED (strongsort) form associate on IoU
    geometry: the stage-1 gate admits exactly d_iou < max_iou_distance
    (0.7 default). Under the old appearance-neutral rule the cost
    degenerated to (1-lam)*scaled-maha ~ 0.0007*maha, which matched
    ANYTHING inside the chi2 gate — measured IDSW 229 -> 689 on the hard
    gauntlet (EVAL.md). Empirically the chi2 gate alone still passes the
    d_iou=0.75 case below (probed on chip), so IoU is the live boundary."""
    import jax.numpy as jnp
    from reid_tpu.tracking.tracker import Tracker

    cfg = TrackerConfig(max_tracks=4, max_dets=2, n_init=1,
                        crop_hw=(32, 16), embed_every=2)
    tr = Tracker(cfg, feat_dim=4)
    f = jnp.asarray([[1.0, 0, 0, 0], [0, 0, 0, 0]])
    z = jnp.zeros((2, 4))
    conf = jnp.asarray([0.9, 0.0])
    valid = jnp.asarray([True, False])

    def box(x):
        return jnp.asarray([[x, 10.0, 20, 40], [0, 0, 0, 0]])

    # shift 10 -> d_iou 0.667 < 0.7: skip frame MATCHES (tsu resets)
    # shift 12 -> d_iou 0.750 > 0.7: skip frame MISSES (tsu increments)
    for shift, want in ((10.0, True), (12.0, False)):
        st = tr.init_state()
        st, _ = tr.update(st, box(10), conf, f, valid, has_feats=True)
        st, out = tr.update(st, box(10 + shift), conf, z, valid,
                            has_feats=False)
        slot = int(np.argmax(np.asarray(st.track_id) == 1))
        matched = int(np.asarray(st.time_since_update)[slot]) == 0
        assert matched == want, (shift, np.asarray(st.time_since_update))


def test_embed_every_skip_frame_track_init_gets_feature_later():
    """A track initiated on a SKIP frame starts with no appearance
    (gallery_count 0, neutral cost) and adopts its first real feature on
    the next embed frame (replace, not EMA-blend with the zero
    placeholder)."""
    import jax.numpy as jnp
    from reid_tpu.tracking.tracker import Tracker

    cfg = TrackerConfig(max_tracks=4, max_dets=2, n_init=1,
                        crop_hw=(32, 16), embed_every=2)
    tr = Tracker(cfg, feat_dim=4)
    st = tr.init_state()
    box = jnp.asarray([[10.0, 10.0, 20.0, 40.0], [0, 0, 0, 0]])
    conf = jnp.asarray([0.9, 0.0])
    valid = jnp.asarray([True, False])
    zero_f = jnp.zeros((2, 4))
    real_f = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0, 0, 0, 0]])

    # frame 1 = SKIP frame (cadence phase 1): track initiated without
    # appearance
    st, _ = tr.update(st, box, conf, zero_f, valid, has_feats=False)
    slot = int(np.argmax(np.asarray(st.track_id) > 0))
    assert int(st.gallery_count[slot]) == 0
    assert float(jnp.abs(st.feat[slot]).max()) == 0.0

    # frame 2 = EMBED frame: first real feature REPLACES the placeholder
    st, _ = tr.update(st, box, conf, real_f, valid, has_feats=True)
    assert int(st.gallery_count[slot]) == 1
    np.testing.assert_allclose(np.asarray(st.feat[slot]),
                               [1.0, 0.0, 0.0, 0.0], atol=1e-6)

    # frame 3 = SKIP frame again: EMA feature untouched by the match
    st, _ = tr.update(st, box, conf, zero_f, valid, has_feats=False)
    assert int(st.gallery_count[slot]) == 1
    np.testing.assert_allclose(np.asarray(st.feat[slot]),
                               [1.0, 0.0, 0.0, 0.0], atol=1e-6)


def test_resize_bilinear_matmul_matches_jax_image_resize():
    # the matmul letterbox (detector-in-loop serve path) must match
    # jax.image.resize's antialiased bilinear exactly on CPU f32
    import jax

    from reid_tpu.tracking.pipeline import resize_bilinear_matmul

    rng = np.random.default_rng(3)
    for shape, out in [((135, 240, 3), (90, 160)),    # downscale
                       ((50, 80, 3), (100, 160)),     # upscale
                       ((2, 77, 123, 3), (64, 32))]:  # batched, mixed
        x = rng.uniform(0, 1, shape).astype(np.float32)
        tgt = (*shape[:-3], *out, 3)
        ref = jax.image.resize(jnp.asarray(x), tgt, "bilinear")
        got = resize_bilinear_matmul(jnp.asarray(x), out)
        assert got.shape == tgt
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_resize_bilinear_matmul_uint8_input():
    # uint8 frames promote to f32 output (the serve path feeds uint8)
    import jax

    from reid_tpu.tracking.pipeline import resize_bilinear_matmul

    rng = np.random.default_rng(4)
    x = rng.integers(0, 255, (60, 90, 3)).astype(np.uint8)
    ref = jax.image.resize(jnp.asarray(x).astype(jnp.float32),
                           (30, 45, 3), "bilinear")
    got = resize_bilinear_matmul(jnp.asarray(x), (30, 45))
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
