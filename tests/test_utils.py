"""Checkpoint save/restore + StableHLO export roundtrip + StageTimer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.utils import (
    StageTimer,
    export_serving_fn,
    load_serving_fn,
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
        "step": jnp.asarray(7),
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state)
    target = {
        "params": {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))},
        "step": jnp.asarray(0),
    }
    restored = restore_checkpoint(p, target)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_checkpoint_strict_false_shape_mismatch(tmp_path):
    """Mismatched classifier shapes keep the target (ref strict=False +
    classifier-resize recovery, image_reid_inference.py:220-233)."""
    state = {"classifier": jnp.ones((4, 5))}
    p = str(tmp_path / "ckpt2")
    save_checkpoint(p, state)
    target = {"classifier": jnp.zeros((4, 9))}
    restored = restore_checkpoint(p, target)
    assert restored["classifier"].shape == (4, 9)
    np.testing.assert_allclose(np.asarray(restored["classifier"]), 0.0)


def test_checkpoint_roundtrip_real_train_state(tmp_path):
    """Round-trip the FULL ReIDTrainState (flax struct + NamedTuple loss
    state) — regression for the keystr mismatch where GetAttrKey paths never
    matched orbax's nested-dict keys and restore silently returned the
    fresh-init target."""
    from reid_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from reid_tpu.models import build_model
    from reid_tpu.train import create_train_state

    cfg = Config(
        model=ModelConfig(num_classes=4, feat_dim=512),
        loss=LossConfig(),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=2,
                          warmup_epochs=1, hold_epochs=1),
    )
    model = build_model("seres18", num_classes=4)
    s1 = create_train_state(jax.random.PRNGKey(0), model, cfg,
                            steps_per_epoch=2, input_shape=(2, 32, 16, 3))
    s1 = s1.replace(step=41)
    p = str(tmp_path / "state_ckpt")
    save_checkpoint(p, s1)

    s2 = create_train_state(jax.random.PRNGKey(9), model, cfg,
                            steps_per_epoch=2, input_shape=(2, 32, 16, 3))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params))
    ), "different seeds should give different params"
    s3 = restore_checkpoint(p, s2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s3.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(s1.loss_state.centers),
                               np.asarray(s3.loss_state.centers))
    np.testing.assert_allclose(np.asarray(s1.loss_state.dcc.lut_ccc),
                               np.asarray(s3.loss_state.dcc.lut_ccc))
    assert int(s3.step) == 41


def test_export_roundtrip_dynamic_batch(tmp_path):
    w = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)

    def serving(x):
        return jnp.tanh(x @ w)

    p = str(tmp_path / "model.stablehlo")
    export_serving_fn(serving, (jnp.zeros((2, 8)),), p)
    loaded = load_serving_fn(p)
    for b in (1, 3, 16):  # dynamic batch axis
        x = jnp.asarray(np.random.default_rng(b).normal(size=(b, 8)),
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(loaded(x)),
                                   np.asarray(serving(x)), rtol=1e-5,
                                   atol=1e-5)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    t.tick()
    ms = t.per_frame_ms()
    assert "a" in ms and ms["a"] >= 0
    assert "1 frames" in t.summary()


def test_export_tracking_chunk_artifact(tmp_path):
    """The ENTIRE fused tracking step (crop+embed+associate over a chunk)
    serializes to StableHLO and reloads — the serve-path deployment artifact
    (static shapes throughout make the tracker ideally exportable)."""
    from reid_tpu.config import TrackerConfig
    from reid_tpu.tracking.pipeline import make_chunked_tracker
    from reid_tpu.tracking.tracker import init_tracker_state

    cfg = TrackerConfig(max_tracks=8, max_dets=4, n_init=1, crop_hw=(16, 8))

    def embed_fn(params, batch_stats, crops):
        m = jnp.mean(crops, axis=(1, 2))
        return jnp.concatenate([m, m * 2.0], axis=1)  # (B, 6)

    run_chunk = make_chunked_tracker(cfg, embed_fn, cfg.crop_hw, chunk=4)
    state = init_tracker_state(8, 6)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (4, 32, 48, 3)), jnp.uint8)
    tlwh = jnp.asarray(rng.uniform(0, 20, (4, 4, 4)), jnp.float32)
    conf = jnp.full((4, 4), 0.9)
    valid = jnp.ones((4, 4), bool)

    # jax.export can't serialize custom pytree nodes (NamedTuple state), so
    # the serving boundary is flat arrays — the standard export pattern.
    from reid_tpu.tracking.tracker import TrackerState

    n_fields = len(TrackerState._fields)

    def serving(*flat):
        st = TrackerState(*flat[:n_fields])
        frames_, tlwh_, conf_, valid_ = flat[n_fields:]
        new_st, out = run_chunk({}, {}, st, frames_, tlwh_, conf_, valid_)
        return tuple(new_st) + (out["tlwh"], out["ids"], out["valid"])

    flat_args = tuple(state) + (frames, tlwh, conf, valid)
    p = str(tmp_path / "tracker_chunk.stablehlo")
    export_serving_fn(serving, flat_args, p, dynamic_batch=False)
    loaded = load_serving_fn(p)
    want = serving(*flat_args)
    got = loaded(*flat_args)
    np.testing.assert_allclose(np.asarray(got[n_fields]),
                               np.asarray(want[n_fields]),
                               rtol=1e-5, atol=1e-5)      # out tlwh
    np.testing.assert_array_equal(np.asarray(got[6]),
                                  np.asarray(want[6]))    # track ids


def test_checkpoint_all_shapes_mismatched_raises(tmp_path):
    """A checkpoint from a different model width must not silently restore
    nothing (regression: track --det_ckpt with the wrong --det_base ran a
    fresh-init detector)."""
    state = {"a": jnp.ones((4, 5)), "b": jnp.ones((3,))}
    p = str(tmp_path / "ckpt3")
    save_checkpoint(p, state)
    target = {"a": jnp.zeros((8, 10)), "b": jnp.zeros((6,))}
    with pytest.raises(ValueError, match="EVERY shape mismatched"):
        restore_checkpoint(p, target)
