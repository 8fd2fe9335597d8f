"""OSNet / PLR-OSNet forward-shape tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.models import build_model


def test_osnet_shapes():
    model = build_model("osnet_x0_25", num_classes=10)
    x = jnp.zeros((2, 80, 40, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    (feat, logits), _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert feat.shape == (2, 512)
    assert logits.shape == (2, 10)


def test_plr_osnet_dual_branch():
    model = build_model("plr_osnet", num_classes=7)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 40, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    ((v1, v2), (y1, y2)), _ = model.apply(v, x, train=True,
                                          mutable=["batch_stats"])
    assert v1.shape == (2, 4 * 512)      # 4-part concat global branch
    assert v2.shape == (2, 512)          # local branch
    assert y1.shape == (2, 7) and y2.shape == (2, 7)
    # eval: concat of normalized BN features (2048 + 512)
    emb, _ = model.apply(v, x, train=False)
    assert emb.shape == (2, 2560)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb[:, :2048]), axis=1), 1.0, atol=1e-4)
