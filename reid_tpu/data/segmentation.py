"""Foreground/background segmentation augmentation.

Role of ref `reid/segmentation.py` (TorchScript DeepLabV3-ResNet50 person
FG/BG extraction with optional Gaussian-blurred background, plus
`ExtractedDataset`). The reference pulls pretrained weights from torch.hub;
in this zero-egress TPU build the segmenter is a compact trainable U-Net
(`SegUNet`) with the same interface — load weights via
`reid_tpu.utils.restore_checkpoint` or train on person-mask data. For the
reference-exact model, `models.deeplab.DeepLabV3` implements the
torchvision architecture with a weight converter
(`utils.torch_convert.convert_deeplabv3`); its `extract_foreground` person
mask plugs into `extract_foreground_background` here when a local
deeplabv3_resnet50 checkpoint is supplied.

`extract_foreground_background` mirrors ref :35-49: per-pixel person mask ->
foreground kept, background either zeroed or Gaussian-blurred.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import kaiming_init


class SegUNet(nn.Module):
    """Small encoder/decoder FG/BG segmenter: (B, H, W, 3) -> (B, H, W, 1)."""
    base: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x = x.astype(dt)

        def block(y, ch, name):
            y = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        kernel_init=kaiming_init, dtype=dt,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name=f"{name}_bn")(y)
            return nn.relu(y)

        e1 = block(x, self.base, "e1")
        e2 = block(nn.max_pool(e1, (2, 2), (2, 2)), self.base * 2, "e2")
        e3 = block(nn.max_pool(e2, (2, 2), (2, 2)), self.base * 4, "e3")
        d2 = nn.ConvTranspose(self.base * 2, (4, 4), strides=(2, 2),
                              padding="SAME", dtype=dt, name="up2")(e3)
        d2 = block(jnp.concatenate([d2, e2], axis=-1), self.base * 2, "d2")
        d1 = nn.ConvTranspose(self.base, (4, 4), strides=(2, 2),
                              padding="SAME", dtype=dt, name="up1")(d2)
        d1 = block(jnp.concatenate([d1, e1], axis=-1), self.base, "d1")
        return nn.Conv(1, (1, 1), dtype=dt, name="head")(d1)


def gaussian_blur(images: jnp.ndarray, sigma: float = 3.0,
                  radius: int = 7) -> jnp.ndarray:
    """Separable Gaussian blur over (B, H, W, C)."""
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)
    c = images.shape[-1]
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        images.astype(jnp.float32), kh, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out


def extract_foreground_background(
    images: jnp.ndarray,
    masks: jnp.ndarray,
    blur_background: bool = True,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """FG kept; BG zeroed or blurred (ref segmentation.py:35-49)."""
    fg = (jax.nn.sigmoid(masks) > threshold).astype(jnp.float32)
    if blur_background:
        bg = gaussian_blur(images)
    else:
        bg = jnp.zeros_like(images, jnp.float32)
    return fg * images.astype(jnp.float32) + (1.0 - fg) * bg


def batched_extraction(seg_apply, variables, images: jnp.ndarray,
                       blur_background: bool = True) -> jnp.ndarray:
    """Ref batched_extraction (:52-63): segment + composite in one jit."""

    @jax.jit
    def run(v, imgs):
        masks = seg_apply(v, imgs, train=False)
        return extract_foreground_background(imgs, masks, blur_background)

    return run(variables, images)


def train_segmenter(images, masks, epochs: int = 10, batch_size: int = 16,
                    lr: float = 1e-3, base: int = 32, seed: int = 0,
                    log_fn=print):
    """Train SegUNet on (image, person-mask) pairs with BCE + soft-Dice.

    Stands in for the reference's torch.hub-pretrained DeepLabV3 in a
    zero-egress build: supervise on any person-mask source (e.g. bbox
    rectangles from tracking gt, or real mask annotations). images
    (N, H, W, 3) uint8/float [0,255]; masks (N, H, W) in {0, 1}.
    Returns (model, variables, losses).
    """
    import optax
    import numpy as np

    images = np.asarray(images)
    masks = np.asarray(masks, np.float32)
    model = SegUNet(base=base)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(seed), jnp.zeros((2, *images.shape[1:])))
    tx = optax.adam(lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, m):
        x = imgs.astype(jnp.float32) / 255.0

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            logits = logits[..., 0].astype(jnp.float32)
            bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, m))
            prob = jax.nn.sigmoid(logits)
            inter = jnp.sum(prob * m, axis=(1, 2))
            dice = 1.0 - jnp.mean(
                (2.0 * inter + 1.0)
                / (jnp.sum(prob, axis=(1, 2)) + jnp.sum(m, axis=(1, 2)) + 1.0))
            return bce + dice, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, new_opt,
                loss)

    rng = np.random.default_rng(seed)
    losses = []
    for epoch in range(epochs):
        order = rng.permutation(len(images))
        ep = []
        for s in range(0, len(order) - batch_size + 1, batch_size):
            b = order[s:s + batch_size]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(images[b]), jnp.asarray(masks[b]))
            ep.append(float(loss))
        losses.append(float(np.mean(ep)))
        log_fn(f"segmenter epoch {epoch}: loss={losses[-1]:.4f}")
    return model, {"params": params, "batch_stats": batch_stats}, losses
