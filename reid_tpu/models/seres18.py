"""SE-ResNet18-IBN — the reference's primary ReID backbone, TPU-native.

Re-design of ref `reid/backbones/SERes18_IBN.py:186-289` in Flax/NHWC:
  * ResNet18-IBN-a trunk (IBN on bn1 of stages 1-3, plain BN stage 4),
  * SE channel attention on every basic block (applied to the residual branch
    *before* the skip-add, ref SEBasicBlock.forward :120-128),
  * stage-4 stride 1 (ref :223),
  * stem = conv7x7/2 -> BN -> maxpool3x3/2 with NO ReLU (the reference
    comments out `self.relu0`, :253 — we match the executed graph),
  * GeM pooling -> 512-d feature -> BNNeck (frozen-bias BN) -> bias-free
    classifier (ref :227-243),
  * learnable per-camera bias added to the BNNeck feature scaled by
    `cam_factor` (ref :246-248, :269-270).

Returns:
  train mode:  (pooled_feature, logits)   (ref :276)
  eval mode:   (bnneck_feature, logits)   (ref :275)
  is_reid:     logits only                (ref :272-273)
"""

from __future__ import annotations

from typing import Any, Optional, Type

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    GeM, IBN, SEBlock, conv1x1, conv3x3, kaiming_init, make_norm2d,
    max_pool_same, trunc_normal_init,
)


class SEBasicBlock(nn.Module):
    """ResNet basic block + SE gate. Ref SERes18_IBN.py:96-128."""
    planes: int
    strides: int = 1
    ibn: bool = False
    renorm: bool = False
    downsample: bool = False
    attention: str = "se"  # "se" | "triplet" | "ema" | "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        branch = x
        y = conv3x3(self.planes, self.strides, "conv1", self.dtype)(x)
        if self.ibn:
            y = IBN(renorm=self.renorm, dtype=self.dtype, name="bn1")(y, train)
        else:
            y = make_norm2d(self.renorm, train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = conv3x3(self.planes, 1, "conv2", self.dtype)(y)
        y = make_norm2d(self.renorm, train, self.dtype, "bn2")(y)
        if self.attention == "se":
            y = SEBlock(self.planes, dtype=self.dtype, name="seblock")(y) * y
        elif self.attention == "triplet":
            from .triplet_attention import TripletAttention
            y = TripletAttention(dtype=self.dtype, name="triplet_att")(y, train)
        elif self.attention == "ema":
            from .ema_attention import EMAttention
            y = EMAttention(dtype=self.dtype, name="ema_att")(y, train)
        if self.downsample:
            branch = conv1x1(self.planes, self.strides, "down_conv", self.dtype)(x)
            branch = make_norm2d(self.renorm, train, self.dtype, "down_bn")(branch)
        return nn.relu(y + branch)


class SERes18IBN(nn.Module):
    """TPU SERes18_IBN. Ref SERes18_IBN.py:186-277."""
    num_classes: int = 751
    num_cams: int = 6
    pooling: str = "gem"
    renorm: bool = False
    is_reid: bool = False
    cam_factor: float = -1.0
    attention: str = "se"      # block attention flavor (CARes18 uses "triplet")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam: Optional[jnp.ndarray] = None, train: bool = True):
        dt = self.dtype
        x = x.astype(dt)
        # Stem: conv0 -> bn0 -> maxpool (no ReLU; ref :251-254).
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=kaiming_init, dtype=dt, name="conv0")(x)
        x = make_norm2d(self.renorm, train, dt, "bn0")(x)
        x = max_pool_same(x)

        cfg = [  # (planes, strides, ibn, downsample) per block; ref :210-225
            (64, 1, True, False), (64, 1, True, False),
            (128, 2, True, True), (128, 1, True, False),
            (256, 2, True, True), (256, 1, True, False),
            (512, 1, False, True), (512, 1, False, False),  # stage-4 stride 1
        ]
        for i, (planes, strides, ibn, down) in enumerate(cfg):
            x = SEBasicBlock(
                planes=planes, strides=strides, ibn=ibn, renorm=self.renorm,
                downsample=down, attention=self.attention,
                dtype=dt, name=f"block{i // 2 + 1}{i % 2 + 1}",
            )(x, train)

        if self.pooling == "gem":
            feature = GeM(dtype=dt, name="gem")(x)
        else:
            feature = jnp.mean(x, axis=(1, 2))

        # BNNeck (frozen-bias BN, ref :236-239); camera bias is added to the
        # normed feature *before* the classifier (ref :268-271).
        bn_feat = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_bias=False, dtype=dt, name="bnneck",
        )(feature)
        cam_bias = self.param(
            "cam_bias", trunc_normal_init, (self.num_cams, feature.shape[-1]),
            jnp.float32,
        )
        if cam is not None:
            bn_feat = bn_feat + self.cam_factor * cam_bias.astype(dt)[cam]
        logits = nn.Dense(
            self.num_classes, use_bias=False,
            kernel_init=nn.initializers.normal(stddev=0.001),
            dtype=dt, name="classifier",
        )(bn_feat)
        if self.is_reid:
            return logits
        if train:
            return feature, logits
        return bn_feat, logits


def seres18_ibn(num_classes=751, num_cams=6, loss="triplet", **kw) -> SERes18IBN:
    """Factory mirroring ref seres18_ibn (SERes18_IBN.py:279-289)."""
    return SERes18IBN(num_classes=num_classes, num_cams=num_cams,
                      is_reid=(loss == "softmax"), **kw)
