"""Numerical unit tests for the loss zoo against small NumPy/torch oracles.

The reference has no tests (SURVEY.md §4); oracles here re-derive the math
independently (torch CPU is available in the image and is used as a neutral
oracle for a few losses — this does not ship in the library).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.losses import (
    center_loss,
    circle_loss,
    cosine_dist,
    cross_entropy_label_smooth,
    dcc_loss,
    euclidean_dist,
    hard_example_mining,
    init_dcc,
    init_hybrid_state,
    init_xbm,
    hybrid_loss,
    ranked_loss,
    triplet_loss_batch_hard,
    update_dcc_luts,
    weighted_regularized_triplet,
    xbm_enqueue,
    xbm_triplet_loss,
)
from reid_tpu.config import LossConfig


def _embeddings(rng, n=16, d=8):
    x = rng.normal(size=(n, d)).astype(np.float32)
    labels = np.repeat(np.arange(n // 4), 4).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(labels)


def test_euclidean_dist_matches_numpy(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32)
    y = rng.normal(size=(9, 7)).astype(np.float32)
    d = np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)
    got = np.asarray(euclidean_dist(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, d, rtol=1e-4, atol=1e-4)


def test_cosine_dist_range(rng):
    x = rng.normal(size=(6, 4)).astype(np.float32)
    d = np.asarray(cosine_dist(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
    assert (d >= -1e-5).all() and (d <= 2 + 1e-5).all()


def test_hard_example_mining(rng):
    x, labels = _embeddings(rng)
    dist = euclidean_dist(x, x)
    ap, an = hard_example_mining(dist, labels)
    dnp = np.asarray(dist)
    lnp = np.asarray(labels)
    for i in range(len(lnp)):
        pos = dnp[i][lnp == lnp[i]]
        neg = dnp[i][lnp != lnp[i]]
        assert np.isclose(ap[i], pos.max(), atol=1e-5)
        assert np.isclose(an[i], neg.min(), atol=1e-5)


def test_wrt_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    x, labels = _embeddings(rng)
    got = float(weighted_regularized_triplet(x, labels))

    # independent oracle in torch
    xt = torch.tensor(np.asarray(x))
    lt = torch.tensor(np.asarray(labels), dtype=torch.long)
    d = torch.cdist(xt, xt).clamp_min(1e-6)
    is_pos = (lt[:, None] == lt[None, :]).float()
    is_neg = 1 - is_pos

    def softmax_w(dist, mask):
        mx = (dist * mask).max(dim=1, keepdim=True).values
        diff = dist - mx
        z = (diff.exp() * mask).sum(dim=1, keepdim=True) + 1e-6
        return diff.exp() * mask / z

    fp = (d * is_pos * softmax_w(d * is_pos, is_pos)).sum(1)
    cn = (d * is_neg * softmax_w(-(d * is_neg), is_neg)).sum(1)
    want = torch.nn.functional.softplus(-(cn - fp)).mean().item()
    assert abs(got - want) < 1e-3


def test_batch_hard_triplet_zero_when_separated():
    # two classes far apart -> margin satisfied -> zero loss
    x = jnp.concatenate([jnp.zeros((4, 8)), 100.0 + jnp.zeros((4, 8))])
    labels = jnp.asarray([0] * 4 + [1] * 4)
    assert float(triplet_loss_batch_hard(x, labels, margin=0.3)) == 0.0


def test_center_loss_simple():
    x = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    centers = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
    labels = jnp.asarray([0, 1])
    # sample0 at its center (0), sample1 distance^2 = 1 -> loss = 1/2
    got = float(center_loss(x, labels, centers))
    assert abs(got - 0.5) < 1e-6


def test_ce_label_smooth_uniform_logits():
    logits = jnp.zeros((3, 10))
    labels = jnp.asarray([0, 5, 9])
    got = float(cross_entropy_label_smooth(logits, labels, smoothing=0.1))
    assert abs(got - np.log(10)) < 1e-5


def test_dcc_loss_and_update(rng):
    x, labels = _embeddings(rng, n=8, d=6)
    state = init_dcc(4, 6)
    state = update_dcc_luts(state, x, labels)
    # tables are unit-norm rows for present classes
    norms = np.linalg.norm(np.asarray(state.lut_ccc), axis=1)
    np.testing.assert_allclose(norms[:2], 1.0, atol=1e-5)
    loss = float(dcc_loss(x, labels, state))
    assert np.isfinite(loss) and loss > 0
    # gradient flows to embeddings only
    g = jax.grad(lambda e: dcc_loss(e, labels, state))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_hybrid_loss_runs(rng):
    x, labels = _embeddings(rng)
    logits = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    state = init_hybrid_state(jax.random.PRNGKey(0), 4, 8)
    cfg = LossConfig()
    total, aux = hybrid_loss(state, x, logits, labels, cfg)
    assert np.isfinite(float(total))
    assert set(aux) >= {"triplet", "center", "dcc"}
    # grads flow to centers too (they are trainable in the reference)
    g = jax.grad(lambda s: hybrid_loss(s, x, logits, labels, cfg)[0])(state)
    assert float(jnp.abs(g.centers).sum()) > 0


def test_xbm_ring_and_loss(rng):
    x, labels = _embeddings(rng)
    st = init_xbm(32, 8)
    st = xbm_enqueue(st, x, labels)
    assert int(st.ptr) == 16
    assert int((st.labels >= 0).sum()) == 16
    loss = float(xbm_triplet_loss(x, labels, st))
    assert np.isfinite(loss)
    # wrap-around
    st = xbm_enqueue(st, x, labels)
    st = xbm_enqueue(st, x, labels)
    assert int(st.ptr) == 16


def test_circle_and_ranked_finite(rng):
    x, labels = _embeddings(rng)
    xn = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    assert np.isfinite(float(circle_loss(xn, labels)))
    assert np.isfinite(float(ranked_loss(x, labels)))
