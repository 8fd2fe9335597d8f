"""Model forward-shape + mode-semantics tests (replaces the reference's
torchsummary __main__ demos, SURVEY.md §4 item 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.models import build_model


def _init_and_apply(model, x, cam=None, train=True):
    variables = model.init(jax.random.PRNGKey(0), x, cam=cam, train=train)
    out, mutated = model.apply(
        variables, x, cam=cam, train=train, mutable=["batch_stats"]
    )
    return variables, out


@pytest.mark.parametrize("name", ["seres18", "cares18", "emares18"])
def test_res18_family_shapes(name):
    model = build_model(name, num_classes=10, num_cams=6)
    x = jnp.zeros((2, 80, 40, 3), jnp.float32)
    variables, (feature, logits) = _init_and_apply(model, x, train=True)
    assert feature.shape == (2, 512)
    assert logits.shape == (2, 10)
    # eval returns bnneck feature
    bn_feat, logits_e = model.apply(variables, x, train=False)
    assert bn_feat.shape == (2, 512)
    assert logits_e.shape == (2, 10)


def test_seres18_cam_bias_changes_eval_feat():
    model = build_model("seres18", num_classes=5, num_cams=4, cam_factor=1.5)
    x = jnp.ones((2, 80, 40, 3), jnp.float32)
    cam = jnp.asarray([0, 3])
    variables = model.init(jax.random.PRNGKey(0), x, cam=cam, train=True)
    no_cam, _ = model.apply(variables, x, cam=None, train=False)
    with_cam, _ = model.apply(variables, x, cam=cam, train=False)
    assert not np.allclose(np.asarray(no_cam), np.asarray(with_cam))


def test_seres18_batch_stats_update():
    model = build_model("seres18", num_classes=5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 80, 40, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_seres18_bf16_forward():
    model = build_model("seres18", num_classes=5, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 80, 40, 3), jnp.bfloat16)
    variables, (feature, logits) = _init_and_apply(model, x, train=True)
    assert feature.dtype == jnp.bfloat16
    # params stay fp32
    p = jax.tree_util.tree_leaves(variables["params"])
    assert all(v.dtype == jnp.float32 for v in p)
