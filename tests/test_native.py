"""Native C++ loader: builds, decodes correctly vs PIL, handles bad files."""

import os
import time

import numpy as np
import pytest

from reid_tpu import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        arr = rng.integers(0, 255, (100 + 10 * i, 60 + 5 * i, 3), np.uint8)
        p = str(d / f"img_{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_builds():
    assert native.available(), "g++/libjpeg expected in this image"


def test_decode_matches_pil(jpegs):
    from PIL import Image

    # decode correctness: resize to the source size (identity resample)
    with Image.open(jpegs[0]) as im:
        ref = np.asarray(im.convert("RGB"))
    h, w = ref.shape[:2]
    out = native.decode_batch([jpegs[0]], h, w)[0]
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 1.0

    # resample sanity: classic bilinear vs PIL's antialiased downscale
    # (different filters — expect close but not identical)
    out2 = native.decode_batch(jpegs, 64, 32)
    assert out2.shape == (8, 64, 32, 3)
    for i, p in enumerate(jpegs):
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").resize((32, 64),
                                                      Image.BILINEAR))
        diff = np.abs(out2[i].astype(int) - ref.astype(int)).mean()
        assert diff < 25.0, diff


def test_decode_bad_file(tmp_path, jpegs):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    out = native.decode_batch([jpegs[0], bad], 32, 16)
    assert out.shape == (2, 32, 16, 3)
    assert out[1].sum() == 0  # zero-filled failure slot
    assert out[0].sum() > 0


def test_dataset_uses_native(jpegs, tmp_path):
    """ReIDDataset.gather goes through the native decoder for jpg batches."""
    from reid_tpu.data.dataset import ReIDDataset

    records = [(p, i % 3, 0, 0) for i, p in enumerate(jpegs)]
    ds = ReIDDataset(records, 3, height=64, width=32)
    batch = ds.gather(list(range(8)))
    assert batch["images"].shape == (8, 64, 32, 3)
    assert batch["images"].sum() > 0
