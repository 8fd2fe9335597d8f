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
