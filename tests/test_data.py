"""Data-layer tests on tiny synthetic image trees (SURVEY.md §4 rec (a))."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.data import (
    Market1501,
    PrefetchLoader,
    ReIDDataset,
    augment_batch,
    build_dataset,
    make_train_loader,
    pk_epoch_indices,
)
from reid_tpu.data.transforms import inference_batch


@pytest.fixture
def market_tree(tmp_path):
    """Synthetic Market1501 layout with the reference filename scheme."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for sub, specs in {
        "bounding_box_train": [(7, 1, 1), (7, 2, 1), (9, 1, 2), (9, 3, 1),
                               (12, 2, 1), (12, 4, 2), (-1, 1, 1)],
        "query": [(7, 3, 1), (9, 2, 1)],
        "bounding_box_test": [(7, 1, 1), (9, 4, 1), (12, 5, 1), (-1, 2, 1)],
    }.items():
        d = tmp_path / sub
        d.mkdir()
        for i, (pid, cam, seq) in enumerate(specs):
            arr = rng.integers(0, 255, (64, 32, 3), np.uint8)
            name = f"{pid:04d}_c{cam}s{seq}_{i:06d}_00.jpg" if pid >= 0 \
                else f"-1_c{cam}s{seq}_{i:06d}_00.jpg"
            Image.fromarray(arr).save(d / name)
    return str(tmp_path)


def test_market_parser(market_tree):
    ds = Market1501(market_tree, verbose=False)
    # junk pid=-1 skipped; train relabeled to 0..2
    assert ds.num_train_pids == 3
    assert len(ds.train) == 6
    assert sorted({r[1] for r in ds.train}) == [0, 1, 2]
    # query/gallery keep raw pids
    assert sorted({r[1] for r in ds.query}) == [7, 9]
    # camid is 0-based
    assert all(0 <= r[2] <= 5 for r in ds.train)
    assert build_dataset("market1501", market_tree, verbose=False).train


def test_pk_sampler_structure():
    labels = np.repeat(np.arange(6), 5)  # 6 ids x 5 images
    rng = np.random.default_rng(0)
    idx = pk_epoch_indices(labels, batch_size=8, num_instances=4, rng=rng)
    assert len(idx) % 4 == 0
    # every consecutive K-group is a single identity
    for s in range(0, len(idx), 4):
        grp = labels[idx[s:s + 4]]
        assert len(set(grp)) == 1
    # every batch has P distinct identities
    for s in range(0, len(idx) - 8 + 1, 8):
        batch_labels = labels[idx[s:s + 8]]
        assert len(set(batch_labels)) == 2


def test_loader_and_dataset(market_tree):
    ds_raw = Market1501(market_tree, verbose=False)
    ds = ReIDDataset(ds_raw.train, ds_raw.num_train_pids, height=64, width=32)
    loader = make_train_loader(ds, batch_size=4, num_instances=2, seed=0)
    batches = list(loader)
    assert batches
    for b in batches:
        assert b["images"].shape == (4, 64, 32, 3)
        assert b["labels"].shape == (4,)
        assert b["weights"].shape == (4,)
    # pseudo merge
    ds.add_pseudo([(ds.records[0][0], 3, 0, 0)], num_new=1)
    assert ds.num_train_pids == 4
    assert ds.flags[-1] == 1


def test_augment_batch_properties(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 32, 3)), jnp.uint8)
    out = augment_batch(jax.random.PRNGKey(0), imgs)
    assert out.shape == (4, 64, 32, 3)
    assert out.dtype == jnp.float32
    # normalized range is plausible
    o = np.asarray(out)
    assert -3.0 < o.min() and o.max() < 3.0
    # deterministic per key, different across keys
    out2 = augment_batch(jax.random.PRNGKey(0), imgs)
    np.testing.assert_allclose(np.asarray(out2), o)
    out3 = augment_batch(jax.random.PRNGKey(1), imgs)
    assert not np.allclose(np.asarray(out3), o)


def test_inference_batch_flip(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (2, 8, 6, 3)), jnp.uint8)
    a = np.asarray(inference_batch(imgs, flipped=False))
    b = np.asarray(inference_batch(imgs, flipped=True))
    np.testing.assert_allclose(a[:, :, ::-1, :], b, atol=1e-6)


def test_hdf5_cache(market_tree, tmp_path):
    pytest.importorskip("h5py")
    from reid_tpu.data.datasets import Market1501
    ds_raw = Market1501(market_tree, verbose=False)
    h5p = str(tmp_path / "cache.h5")
    ds = ReIDDataset(ds_raw.train, ds_raw.num_train_pids, height=64,
                     width=32, cache=False, hdf5_cache=h5p)
    a = ds.load_image(0)          # decode + write-through
    b = ds.load_image(0)          # served from hdf5
    np.testing.assert_array_equal(a, b)
    import os
    assert os.path.exists(h5p)


def test_strong_inference_batch(rng):
    from reid_tpu.data.transforms import strong_inference_batch
    imgs = jnp.asarray(rng.integers(0, 255, (3, 32, 16, 3)), jnp.uint8)
    a = strong_inference_batch(jax.random.PRNGKey(0), imgs)
    b = strong_inference_batch(jax.random.PRNGKey(1), imgs)
    assert a.shape == (3, 32, 16, 3)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # jittered crops
