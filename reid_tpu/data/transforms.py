"""Fused device-side augmentation — one jit kernel over the whole batch.

Replaces the reference's per-image torchvision Compose chains
(`reid/data_transforms.py:6-53`) and PIL/cv2 augmentations
(`reid/data_augment.py`): Resize -> RandomHorizontalFlip -> Pad(10) +
RandomCrop -> Fuse_Gray (35% local-gray patch "LGT", 5% global gray) ->
Normalize(ImageNet) -> RandomErasing(p=.5, fill=mean).

The variable-size decode+resize happens on host (PIL) once per image; all
randomized per-epoch work is batched on device with explicit PRNG keys and
static shapes:
  * random crop = per-sample one-hot shift matrices contracted on the MXU
    (out = Wy @ padded @ Wx^T — a vmapped dynamic_slice lowers to gathers
    and measured 13x slower at batch 256),
  * LGT / random-erasing rectangles are masks built from broadcasted iota —
    the reference's 100-attempt rejection loop becomes a single clamped
    sample (equivalent support, XLA-friendly),
  * everything runs in one fused XLA program right before the train step, so
    augmented uint8 crops never round-trip to host.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
_GRAY_W = (0.299, 0.587, 0.114)  # PIL 'L' conversion weights


def resize_batch(images: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear batched resize (device-side; used by the tracking crop path)."""
    return jax.image.resize(
        images, (images.shape[0], height, width, images.shape[-1]), "bilinear"
    )


def normalize_batch(images: jnp.ndarray,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """uint8/float [0,255] or [0,1] -> ImageNet-normalized float."""
    x = images.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


def _rect_mask(h: int, w: int, y0, x0, rh, rw):
    """Boolean (h, w) mask for the rectangle [y0, y0+rh) x [x0, x0+rw)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (rows >= y0) & (rows < y0 + rh) & (cols >= x0) & (cols < x0 + rw)


def _sample_rect(key, h: int, w: int, sl: float, sh: float, r1: float):
    """Random-erasing style rectangle; clamped instead of rejection-sampled
    (ref train_prepare.py:165-209 / data_augment.py LGT :161-204)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    target_area = jax.random.uniform(k1, (), minval=sl, maxval=sh) * area
    log_r = jnp.log(jnp.asarray(r1))
    aspect = jnp.exp(jax.random.uniform(k2, (), minval=log_r, maxval=-log_r))
    rh = jnp.clip(jnp.round(jnp.sqrt(target_area * aspect)), 1, h - 1).astype(jnp.int32)
    rw = jnp.clip(jnp.round(jnp.sqrt(target_area / aspect)), 1, w - 1).astype(jnp.int32)
    y0 = jax.random.randint(k3, (), 0, h) % jnp.maximum(h - rh, 1)
    x0 = jax.random.randint(k4, (), 0, w) % jnp.maximum(w - rw, 1)
    return y0, x0, rh, rw


def _batched_shift_crop(x: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray,
                        pad: int) -> jnp.ndarray:
    """Zero-pad + per-sample integer-offset crop back to (h, w) as two
    exact one-hot shift einsums on the MXU: out[i, j] = padded[oy+i, ox+j].
    The vmapped dynamic_slice alternative lowers to gathers (13x slower at
    batch 256 on v5e)."""
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wy = jax.nn.one_hot(jnp.arange(h)[None, :] + oy[:, None],
                        h + 2 * pad, dtype=jnp.float32)    # (b, h, h+2p)
    wx = jax.nn.one_hot(jnp.arange(w)[None, :] + ox[:, None],
                        w + 2 * pad, dtype=jnp.float32)    # (b, w, w+2p)
    rows = jnp.einsum("bih,bhwc->biwc", wy, padded,
                      preferred_element_type=jnp.float32)
    return jnp.einsum("biwc,bjw->bijc", rows, wx,
                      preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("pad", "flip_prob", "lg_prob", "gg_prob",
                     "erase_prob", "sl", "sh", "r1"),
)
def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,          # (B, H, W, 3) uint8 or float [0,255]
    pad: int = 10,
    flip_prob: float = 0.5,
    lg_prob: float = 0.35,
    gg_prob: float = 0.05,
    erase_prob: float = 0.5,
    sl: float = 0.02,
    sh: float = 0.4,
    r1: float = 0.3,
) -> jnp.ndarray:
    """Full train-time chain, normalized float32 output (B, H, W, 3).

    TPU note: flip and pad+random-crop run BATCHED — the crop as two
    per-sample one-hot shift einsums on the MXU (out = Wy @ padded @ Wxᵀ),
    the same formulation as the tracking crop. A vmapped
    `lax.dynamic_slice` lowers to gathers and is the whole train step's
    bottleneck at large batch (measured 101 ms for the chain at b256 vs
    ~3 ms in this form). Gray-fuse/erasing stay vmapped — they are
    broadcast-mask elementwise ops with no gathers.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32) / 255.0

    kflip, kcy, kcx, key = jax.random.split(key, 4)

    # batched random horizontal flip
    flips = jax.random.uniform(kflip, (b,)) < flip_prob
    x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)

    # batched pad + random crop back to (h, w) — zero pad like torchvision
    oy = jax.random.randint(kcy, (b,), 0, 2 * pad + 1)
    ox = jax.random.randint(kcx, (b,), 0, 2 * pad + 1)
    x = _batched_shift_crop(x, oy, ox, pad)

    keys = jax.random.split(key, b)

    def per_sample(img, k):
        kg, kgr, ke, ker = jax.random.split(k, 4)

        # Fuse_Gray (ref data_augment.py:257-276): p<lg -> LGT local gray
        # patch; lg<=p<lg+gg -> global grayscale.
        gray = jnp.tensordot(img, jnp.asarray(_GRAY_W), axes=([-1], [0]))
        gray3 = jnp.repeat(gray[..., None], 3, axis=-1)
        p = jax.random.uniform(kg)
        y0, x0, rh, rw = _sample_rect(kgr, h, w, sl, sh, r1)
        lmask = _rect_mask(h, w, y0, x0, rh, rw)[..., None]
        local = jnp.where(lmask, gray3, img)
        img = jnp.where(p < lg_prob, local,
                        jnp.where(p < lg_prob + gg_prob, gray3, img))

        # normalize
        img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        # random erasing with mean fill (ref train_prepare.py:165-209)
        ey, ex, eh, ew = _sample_rect(ke, h, w, sl, sh, r1)
        emask = _rect_mask(h, w, ey, ex, eh, ew)[..., None]
        fill = (jnp.asarray(IMAGENET_MEAN) - jnp.asarray(IMAGENET_MEAN)) \
            / jnp.asarray(IMAGENET_STD)  # mean fill == 0 after normalize
        erased = jnp.where(emask, fill, img)
        img = jnp.where(jax.random.uniform(ker) < erase_prob, erased, img)
        return img

    return jax.vmap(per_sample)(x, keys)


@functools.partial(jax.jit, static_argnames=("flipped",))
def inference_batch(images: jnp.ndarray, flipped: bool = False) -> jnp.ndarray:
    """Inference chain: (optional flip) + normalize.
    Ref get_inference_transforms[_flipped] (data_transforms.py:56-209)."""
    x = images.astype(jnp.float32) / 255.0
    if flipped:
        x = x[:, :, ::-1, :]
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


@functools.partial(jax.jit, static_argnames=("pad", "flipped"))
def strong_inference_batch(key: jax.Array, images: jnp.ndarray,
                           pad: int = 10, flipped: bool = False) -> jnp.ndarray:
    """'strong_inference' test-time crop jitter (ref data_transforms.py:60-76):
    Pad(10) + RandomCrop back to size, then normalize (+optional flip)."""
    b, h, w, c = images.shape
    x = images.astype(jnp.float32) / 255.0
    if flipped:
        x = x[:, :, ::-1, :]
    k1, k2 = jax.random.split(key)
    oy = jax.random.randint(k1, (b,), 0, 2 * pad + 1)
    ox = jax.random.randint(k2, (b,), 0, 2 * pad + 1)
    x = _batched_shift_crop(x, oy, ox, pad)
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
