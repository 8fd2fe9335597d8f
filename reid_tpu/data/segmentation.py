"""Foreground/background segmentation augmentation.

Role of ref `reid/segmentation.py` (TorchScript DeepLabV3-ResNet50 person
FG/BG extraction with optional Gaussian-blurred background, plus
`ExtractedDataset`). The reference pulls pretrained weights from torch.hub;
in this zero-egress TPU build the segmenter is a compact trainable U-Net
(`SegUNet`) with the same interface — load weights via
`reid_tpu.utils.restore_checkpoint` or train on person-mask data.

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
