"""Sketch / fuse / occlusion augmentations + VAE-GAN step + attention pool."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest


def test_to_sketch_and_fuse(rng):
    from reid_tpu.data.augment_extra import fuse_rgb_gray_sketch, to_sketch

    img = rng.integers(0, 255, (64, 32, 3)).astype(np.uint8)
    sk = to_sketch(img)
    assert sk.shape == img.shape and sk.dtype == np.uint8
    # sketch is grayscale (all channels equal)
    assert (sk[..., 0] == sk[..., 1]).all()

    r = random.Random(0)
    outs = {fuse_rgb_gray_sketch(img, r).tobytes() for _ in range(20)}
    assert len(outs) >= 2  # multiple variants sampled


def test_occlusion_augment(tmp_path, rng):
    from PIL import Image

    from reid_tpu.data.augment_extra import OcclusionAugment

    records = []
    for i in range(4):
        arr = np.full((64, 32, 3), 40 * (i + 1), np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(arr).save(p)
        records.append((p, i % 2, 0, 0))  # two pids, same camera
    aug = OcclusionAugment(records, seed=0)
    out = aug(0)
    assert out.shape == (64, 32, 3)
    base = np.asarray(Image.open(records[0][0]).convert("RGB"))
    assert not np.array_equal(out, base)  # something was pasted


def test_vaegan_step(rng):
    from reid_tpu.gan import VAE, Discriminator, make_vaegan_steps

    vae = VAE(zdim=8)
    disc = Discriminator(ndf=4, spectral=False, vae=True, wasserstein=True)
    vae_tx = optax.adam(1e-4)
    d_tx = optax.adam(1e-4)
    init, step = make_vaegan_steps(vae, disc, vae_tx, d_tx, zdim=8,
                                   wasserstein=True)
    state = init(jax.random.PRNGKey(0))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 128, 64, 3)), jnp.float32)
    state, m = step(state, real, jax.random.PRNGKey(1))
    for k in ("vae_loss", "recon", "kl", "d_loss"):
        assert np.isfinite(float(m[k])), k
    assert int(state.step) == 1


def test_attention_pooling(rng):
    from reid_tpu.models.layers import AttentionPooling

    m = AttentionPooling(num_heads=4)
    x = jnp.asarray(rng.normal(size=(2, 10, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 16)
