"""ViT-SIE / Swin v1+v2 / video 3D ResNet / baselines forward tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.models import build_model


def _run(model, x, cam=None):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, cam=cam, train=True)
    out, _ = model.apply(v, x, cam=cam, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    return v, out


def test_vit_sie_shapes_and_side_info():
    model = build_model("vit", num_classes=11, num_cams=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    cam = jnp.asarray([0, 3])
    v, (feat, logits) = _run(model, x, cam)
    assert feat.shape == (2, 384)
    assert logits.shape == (2, 11)
    # SIE changes the embedding
    a, _ = model.apply(v, x, cam=cam, train=False)
    b, _ = model.apply(v, x, cam=None, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", ["swin_v1", "swin_v2"])
def test_swin_shapes(name):
    # window 2 so a small 64x64 input stays divisible through all 3 merges
    # (production sizes: 448x224 with window 7, ref data_transforms.py:10)
    model = build_model(name, num_classes=9, window_size=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    v, (feat, logits) = _run(model, x, cam=jnp.asarray([0, 1]))
    assert feat.shape == (2, 96)
    assert logits.shape == (2, 9)
    bn, _ = model.apply(v, x, train=False)
    assert bn.shape == (2, 96)


def test_video_resnet_shapes():
    model = build_model("video_resnet18", num_classes=5)
    x = jnp.zeros((2, 4, 32, 16, 3), jnp.float32)  # (N, T, H, W, C)
    v, (feat, logits) = _run(model, x)
    assert feat.shape == (2, 2048)
    assert logits.shape == (2, 5)


@pytest.mark.parametrize("name,feat_dim", [("baseline", 512), ("agw", 2048)])
def test_cnn_baselines(name, feat_dim):
    model = build_model(name, num_classes=6)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 40, 3)),
                    jnp.float32)
    v, (feat, logits) = _run(model, x)
    assert feat.shape == (2, feat_dim)
    assert logits.shape == (2, 6)
