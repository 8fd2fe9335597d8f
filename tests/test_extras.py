"""Tests: non-iid BatchRenorm, mixup, model size, redetection, segmentation."""

import numpy as np
import jax
import jax.numpy as jnp

from reid_tpu.models.layers import BatchRenorm, BatchRenormNonIID
from reid_tpu.train.extras import (
    mixup_batch, model_size_mb, plot_loss, redetection,
)
from reid_tpu.data.segmentation import (
    SegUNet, batched_extraction, extract_foreground_background, gaussian_blur,
)


def test_batchrenorm_runs_and_tracks(rng):
    m = BatchRenorm()
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 6)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, mut = m.apply(v, x, use_running_average=False,
                     mutable=["batch_stats"])
    assert y.shape == x.shape
    assert int(mut["batch_stats"]["steps"]) == 1
    # output approx standardized at init (running stats ~ N(0,1) start)
    assert abs(float(jnp.mean(y))) < 0.3
    # eval path uses running stats, no mutation needed
    y2 = m.apply({**v, "batch_stats": mut["batch_stats"]}, x,
                 use_running_average=True)
    assert y2.shape == x.shape


def test_batchrenorm_noniid_groups(rng):
    m = BatchRenormNonIID(group_size=4)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 6)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, mut = m.apply(v, x, use_running_average=False,
                     mutable=["batch_stats"])
    assert y.shape == x.shape
    y_eval = m.apply({**v, "batch_stats": mut["batch_stats"]}, x,
                     use_running_average=True)
    assert y_eval.shape == x.shape


def test_mixup(rng):
    imgs = jnp.asarray(rng.normal(size=(6, 8, 8, 3)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 0, 1, 2])
    mixed, soft = mixup_batch(jax.random.PRNGKey(0), imgs, labels, 3)
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(soft).sum(1), 1.0, atol=1e-5)


def test_model_size_and_plot(tmp_path):
    params = {"w": jnp.zeros((256, 256), jnp.float32)}
    assert abs(model_size_mb(params) - 0.25) < 1e-6
    out = plot_loss([3.0, 2.0, 1.0], str(tmp_path / "curve.png"))
    if out is not None:
        import os
        assert os.path.exists(out)


def test_redetection_crops(rng):
    imgs = rng.integers(0, 255, (2, 32, 16, 3)).astype(np.uint8)

    def detector(batch):
        return [
            (np.asarray([[4.0, 8.0, 8.0, 16.0]]), np.asarray([0.9])),
            (np.zeros((0, 4)), np.zeros((0,))),  # nothing found
        ]

    out = redetection(detector, imgs)
    assert out.shape == imgs.shape
    np.testing.assert_array_equal(out[1], imgs[1])  # fallback untouched
    assert not np.array_equal(out[0], imgs[0])      # cropped+resized


def test_segmentation_extraction(rng):
    seg = SegUNet(base=8)
    x = jnp.asarray(rng.normal(size=(2, 32, 16, 3)), jnp.float32)
    v = seg.init(jax.random.PRNGKey(0), x, train=True)
    masks = seg.apply(v, x, train=False)
    assert masks.shape == (2, 32, 16, 1)
    comp = extract_foreground_background(x, masks, blur_background=True)
    assert comp.shape == x.shape
    comp2 = batched_extraction(seg.apply, v, x, blur_background=False)
    assert comp2.shape == x.shape
    # blur actually smooths
    blurred = gaussian_blur(x)
    assert float(jnp.var(blurred)) < float(jnp.var(x))


def test_train_segmenter_learns_bright_fg(rng):
    """train_segmenter converges on a separable FG/BG task and the learned
    masks drive extract_foreground_background (DeepLabV3 role without hub
    weights)."""
    from reid_tpu.data.segmentation import batched_extraction, train_segmenter

    n, h, w = 16, 32, 24
    images = rng.integers(0, 40, (n, h, w, 3)).astype(np.uint8)
    masks = np.zeros((n, h, w), np.float32)
    for i in range(n):
        y, x = 4 + i % 6, 3 + i % 5
        images[i, y:y + 16, x:x + 10] = 220     # bright person blob
        masks[i, y:y + 16, x:x + 10] = 1.0
    model, variables, losses = train_segmenter(
        images, masks, epochs=25, batch_size=8, base=8, lr=3e-3,
        log_fn=lambda *_: None)
    assert losses[-1] < losses[0] * 0.35

    import jax.numpy as jnp
    out = batched_extraction(
        lambda v, x, train: model.apply(v, x, train=train),
        variables, jnp.asarray(images[:4], jnp.float32) / 255.0,
        blur_background=False)
    out = np.asarray(out)
    # foreground intensity preserved, background mostly suppressed
    fg = masks[:4] > 0.5
    assert out[fg[..., None].repeat(3, -1)].mean() > 0.4
    assert out[~fg[..., None].repeat(3, -1)].mean() < 0.1
