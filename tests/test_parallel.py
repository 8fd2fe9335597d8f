"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4 rec (c)):
data-parallel train step, sharded gallery top-k vs single-device oracle,
replicated-param invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from reid_tpu.models import build_model
from reid_tpu.parallel import make_mesh, replicate, shard_batch, \
    sharded_gallery_topk
from reid_tpu.train import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_gallery_topk_matches_dense(rng):
    mesh = make_mesh(8)
    gallery = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    query = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    dists, idx = sharded_gallery_topk(mesh, query, gallery, k=4)
    d2 = np.asarray(
        ((np.asarray(query)[:, None] - np.asarray(gallery)[None]) ** 2).sum(-1))
    want_idx = np.argsort(d2, axis=1)[:, :4]
    np.testing.assert_allclose(
        np.sort(np.asarray(dists), 1),
        np.sort(np.take_along_axis(d2, want_idx, 1), 1), rtol=1e-4, atol=1e-4)


def test_dp_train_step_multidevice(rng):
    mesh = make_mesh(8)
    cfg = Config(model=ModelConfig(num_classes=8),
                 train=TrainConfig(batch_size=16, num_instances=2, epochs=2,
                                   warmup_epochs=1, hold_epochs=1))
    model = build_model("seres18", num_classes=8)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2,
                               input_shape=(2, 80, 40, 3))
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {
        "images": jnp.asarray(rng.normal(size=(16, 80, 40, 3)), jnp.float32),
        "labels": jnp.asarray(np.arange(16) % 8, jnp.int32),
        "cams": jnp.zeros((16,), jnp.int32),
    })
    step = make_train_step(cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated (single logical value)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device(rng):
    """The sharded step computes the same loss as the unsharded step
    (GSPMD global BN statistics == single-device statistics)."""
    cfg = Config(model=ModelConfig(num_classes=4),
                 train=TrainConfig(batch_size=8, num_instances=2, epochs=2,
                                   warmup_epochs=1, hold_epochs=1))
    model = build_model("seres18", num_classes=4)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2, input_shape=(2, 80, 40, 3))
    batch_np = {
        "images": rng.normal(size=(8, 80, 40, 3)).astype(np.float32),
        "labels": (np.arange(8) % 4).astype(np.int32),
        "cams": np.zeros(8, np.int32),
    }
    step = make_train_step(cfg)
    _, m_single = step(state, jax.tree_util.tree_map(jnp.asarray, batch_np))

    mesh = make_mesh(8)
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch_np)
    _, m_shard = step(state_r, batch_s)
    assert abs(float(m_single["loss"]) - float(m_shard["loss"])) < 1e-3


def test_train_cnn_dp_matches_single_device():
    """The PRODUCT train loop (train_cnn itself, not a hand-built step) on an
    8-device mesh produces the same per-step losses as on a 1-device mesh —
    GSPMD DP == single device."""
    from reid_tpu.config import DataConfig
    from reid_tpu.data import synthetic_dataset
    from reid_tpu.train.image_train import train_cnn
    import tempfile

    cfg = Config(
        model=ModelConfig(num_classes=4, dtype="float32"),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=1,
                          warmup_epochs=1, hold_epochs=1),
        data=DataConfig(height=80, width=40),
    )
    ds = synthetic_dataset(n=16, num_pids=4, height=80, width=40)
    _, losses_1 = train_cnn(cfg, ds, log_every=1, mesh=make_mesh(1),
                            ckpt_dir=tempfile.mkdtemp())
    _, losses_8 = train_cnn(cfg, ds, log_every=1, mesh=make_mesh(8),
                            ckpt_dir=tempfile.mkdtemp())
    assert len(losses_1) == len(losses_8) >= 2
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-3, atol=2e-3)


def test_train_cnn_dp_sharded_jaccard_inference():
    """run_inference with a mesh: the row-sharded Jaccard path feeds CMC/mAP
    (arbitrary N — padding handled internally)."""
    from reid_tpu.config import DataConfig, RetrievalConfig
    from reid_tpu.data import synthetic_dataset
    from reid_tpu.eval.inference import run_inference
    from reid_tpu.models import build_model
    from reid_tpu.train import create_train_state
    import tempfile

    cfg = Config(
        model=ModelConfig(num_classes=4, dtype="float32"),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=1,
                          warmup_epochs=1, hold_epochs=1),
        data=DataConfig(height=80, width=40),
        retrieval=RetrievalConfig(k1=6, k2=2, dbscan_min_samples=2),
    )
    model = build_model("seres18", num_classes=4)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2, input_shape=(2, 80, 40, 3))
    # N = 6 query + 13 gallery = 19, NOT divisible by 8 -> exercises padding
    query = synthetic_dataset(n=6, num_pids=3, height=80, width=40, seed=1,
                              cam_offset=4)
    gallery = synthetic_dataset(n=13, num_pids=3, height=80, width=40, seed=2)
    mesh = make_mesh(8)
    cmc, mAP = run_inference(state, query, gallery, cfg, rerank=True,
                             verbose=False, mesh=mesh)
    assert 0.0 <= mAP <= 1.0 and np.isfinite(mAP)
    cmc0, mAP0 = run_inference(state, query, gallery, cfg, rerank=True,
                               verbose=False, mesh=None)
    assert abs(mAP - mAP0) < 1e-4


def test_sharded_jaccard_matches_dense(rng):
    from reid_tpu.ops import compute_jaccard_distance
    from reid_tpu.ops.rerank import compute_jaccard_distance_sharded

    mesh = make_mesh(8)
    centers = rng.normal(size=(4, 12)) * 3
    feats = np.concatenate(
        [c + 0.3 * rng.normal(size=(16, 12)) for c in centers]
    ).astype(np.float32)  # N = 64, divisible by 8
    want = np.asarray(compute_jaccard_distance(jnp.asarray(feats), k1=8,
                                               k2=3))
    got = np.asarray(compute_jaccard_distance_sharded(
        mesh, jnp.asarray(feats), k1=8, k2=3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # top-S sparse min-sum on the mesh path: S wide enough for the V support
    # -> exact; S=1 overflows every row -> dense fallback via the runtime
    # guard, still exact (never silently approximate).
    for s in (48, 1):
        got_s = np.asarray(compute_jaccard_distance_sharded(
            mesh, jnp.asarray(feats), k1=8, k2=3, sparse_s=s))
        np.testing.assert_allclose(got_s, want, rtol=1e-4, atol=1e-4)
