"""3D video ResNet for tracklet-sequence ReID, Flax (N, T, H, W, C).

Re-design of ref `reid/backbones/video_model.py` (310 LoC):
  * Conv3d BasicBlock/Bottleneck (ref :55-129) with MixedNorm3d IBN option
    (ref :40-52) on the early stages,
  * stem conv(1,7,7)/(1,2,2) + maxpool,
  * GeM3d or attention pooling over (T, H, W) (ref :166-172),
  * BNNeck head (ref :175-176),
  * input is (batch, seq, h, w, c) — the reference permutes NCDHW
    (ref :222-225); NHWC-style (N, T, H, W, C) is the TPU-native layout.
  * factories resnet10..resnet50 (ref :264-310); the driver uses resnet50
    Bottleneck (ref video_reid_train.py:111).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GeM3D, InstanceNorm, kaiming_init


def conv3d(features, kernel, strides=1, name=None, dtype=jnp.float32):
    k = kernel if isinstance(kernel, tuple) else (kernel,) * 3
    s = strides if isinstance(strides, tuple) else (strides,) * 3
    pad = tuple((x // 2, x // 2) for x in k)
    return nn.Conv(features, k, strides=s, padding=pad, use_bias=False,
                   kernel_init=kaiming_init, dtype=dtype, name=name)


class MixedNorm3D(nn.Module):
    """Half instance/half batch norm over (T, H, W) maps (ref :40-52)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        half = c // 2
        y1 = InstanceNorm(dtype=self.dtype, name="in")(x[..., :half])
        y2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype,
                          name="bn")(x[..., half:])
        return jnp.concatenate([y1, y2], axis=-1)


class Bottleneck3D(nn.Module):
    """Conv3d bottleneck (ref :93-129)."""
    planes: int
    strides: int = 1
    ibn: bool = False
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        branch = x
        y = conv3d(self.planes, 1, 1, "conv1", dt)(x)
        if self.ibn:
            y = MixedNorm3D(dtype=dt, name="bn1")(y, train)
        else:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = conv3d(self.planes, 3, (1, self.strides, self.strides),
                   "conv2", dt)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="bn2")(y)
        y = nn.relu(y)
        y = conv3d(self.planes * 4, 1, 1, "conv3", dt)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="bn3")(y)
        if self.downsample:
            branch = conv3d(self.planes * 4, 1,
                            (1, self.strides, self.strides), "down_conv",
                            dt)(x)
            branch = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=dt,
                                  name="down_bn")(branch)
        return nn.relu(y + branch)


class VideoResNet(nn.Module):
    """3D ResNet-50-style trunk + GeM3d + BNNeck (ref :132-240, :285)."""
    num_classes: int = 751
    num_cams: int = 6   # unused; uniform factory signature
    blocks: Sequence[int] = (3, 4, 6, 3)
    pooling: str = "gem"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam=None, train: bool = True):
        # x: (N, T, H, W, C)
        dt = self.dtype
        x = x.astype(dt)
        x = conv3d(64, (1, 7, 7), (1, 2, 2), "conv1", dt)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        for s, (p, n_blocks) in enumerate(zip(planes, self.blocks)):
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                down = (b == 0)
                x = Bottleneck3D(p, strides=stride, ibn=(s < 2),
                                 downsample=down, dtype=dt,
                                 name=f"layer{s + 1}_{b}")(x, train)

        if self.pooling == "gem":
            feat = GeM3D(dtype=dt, name="gem")(x)
        else:
            feat = jnp.mean(x, axis=(1, 2, 3))

        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, use_bias=False, dtype=dt,
                          name="bnneck")(feat)
        logits = nn.Dense(self.num_classes, use_bias=False,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=dt, name="classifier")(bn)
        if train:
            return feat, logits
        return bn, logits


def video_resnet50(num_classes=751, **kw) -> VideoResNet:
    """Ref resnet50 factory (video_model.py:285)."""
    return VideoResNet(num_classes=num_classes, blocks=(3, 4, 6, 3), **kw)


def video_resnet18(num_classes=751, **kw) -> VideoResNet:
    return VideoResNet(num_classes=num_classes, blocks=(2, 2, 2, 2), **kw)
