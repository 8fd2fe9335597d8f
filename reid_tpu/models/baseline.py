"""Plain ResNet baselines + AGW.

Ref `reid/backbones/baseline_lite.py:33-60` (ft_baseline: ResNet18,
last-stride-1, ClassBlock BNNeck head), `reid/backbones/resnet50.py:70-95`
(ft_net: ResNet50 + ClassBlock), `reid/backbones/AGW_MODEL.py` (ResNet50 +
Non-local blocks + GeneralizedMeanPoolingP + BNNeck).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GeM, kaiming_init, make_norm2d, max_pool_same, conv1x1, conv3x3


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        branch = x
        y = conv3x3(self.planes, self.strides, "conv1", dt)(x)
        y = make_norm2d(False, train, dt, "bn1")(y)
        y = nn.relu(y)
        y = conv3x3(self.planes, 1, "conv2", dt)(y)
        y = make_norm2d(False, train, dt, "bn2")(y)
        if self.downsample:
            branch = conv1x1(self.planes, self.strides, "down_conv", dt)(x)
            branch = make_norm2d(False, train, dt, "down_bn")(branch)
        return nn.relu(y + branch)


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        branch = x
        y = conv1x1(self.planes, 1, "conv1", dt)(x)
        y = make_norm2d(False, train, dt, "bn1")(y)
        y = nn.relu(y)
        y = conv3x3(self.planes, self.strides, "conv2", dt)(y)
        y = make_norm2d(False, train, dt, "bn2")(y)
        y = nn.relu(y)
        y = conv1x1(self.planes * 4, 1, "conv3", dt)(y)
        y = make_norm2d(False, train, dt, "bn3")(y)
        if self.downsample:
            branch = conv1x1(self.planes * 4, self.strides, "down_conv", dt)(x)
            branch = make_norm2d(False, train, dt, "down_bn")(branch)
        return nn.relu(y + branch)


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local block (ref AGW_MODEL.py:7-52)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        n, h, w, c = x.shape
        inter = max(c // 2, 1)
        g = nn.Conv(inter, (1, 1), dtype=dt, name="g")(x).reshape(n, h * w, inter)
        theta = nn.Conv(inter, (1, 1), dtype=dt, name="theta")(x).reshape(n, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=dt, name="phi")(x).reshape(n, h * w, inter)
        att = jax.nn.softmax(
            jnp.einsum("nid,njd->nij", theta, phi).astype(jnp.float32), -1
        ).astype(dt)
        y = jnp.einsum("nij,njd->nid", att, g).reshape(n, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=dt, name="w")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=nn.initializers.zeros,
                         dtype=dt, name="w_bn")(y)
        return x + y


class ResNetReID(nn.Module):
    """Generic torchvision-style ResNet trunk + BNNeck ClassBlock head.

    Covers ft_baseline ("baseline": ResNet18), ft_net ("resnet50") and AGW
    (ResNet50 + non-local + GeM). last_stride=1 per the reference heads.
    """
    num_classes: int = 751
    num_cams: int = 6
    block: str = "basic"              # basic | bottleneck
    blocks: Sequence[int] = (2, 2, 2, 2)
    non_local: bool = False
    pooling: str = "avg"              # avg | gem
    bottleneck_dim: int = 512         # ClassBlock hidden dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam=None, train: bool = True):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=kaiming_init, dtype=dt, name="conv1")(x)
        x = make_norm2d(False, train, dt, "bn1")(x)
        x = nn.relu(x)
        x = max_pool_same(x)

        blk = BasicBlock if self.block == "basic" else Bottleneck
        planes = (64, 128, 256, 512)
        expansion = 1 if self.block == "basic" else 4
        for s, (p, nb) in enumerate(zip(planes, self.blocks)):
            for b in range(nb):
                stride = 2 if (s > 0 and b == 0 and s != 3) else 1
                # last stride 1 on stage 4 (reid convention)
                down = (b == 0 and (s > 0 or expansion > 1))
                x = blk(p, strides=stride, downsample=down, dtype=dt,
                        name=f"layer{s + 1}_{b}")(x, train)
            if self.non_local and s in (1, 2):
                x = NonLocalBlock(p * expansion, dtype=dt,
                                  name=f"nl{s + 1}")(x, train)

        if self.pooling == "gem":
            feat = GeM(dtype=dt, name="gem")(x)
        else:
            feat = jnp.mean(x, axis=(1, 2))

        # ClassBlock (ref baseline_lite.py:7-30): fc -> BN(frozen bias) -> cls
        if self.bottleneck_dim and self.bottleneck_dim != feat.shape[-1]:
            feat = nn.Dense(self.bottleneck_dim, use_bias=False,
                            kernel_init=kaiming_init, dtype=dt,
                            name="bottleneck_fc")(feat)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, use_bias=False, dtype=dt,
                          name="bnneck")(feat)
        logits = nn.Dense(self.num_classes, use_bias=False,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=dt, name="classifier")(bn)
        if train:
            return feat, logits
        return bn, logits
