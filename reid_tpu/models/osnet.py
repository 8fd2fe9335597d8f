"""OSNet — omni-scale network (Zhou et al., ICCV'19), Flax/NHWC.

Re-design of ref `reid/backbones/osnet.py` (439 LoC):
  * `LightConv3x3` (ref :89-106): 1x1 conv -> depthwise 3x3 -> BN -> ReLU.
  * `ChannelGate` (ref :112-149): the unified aggregation gate — GAP -> fc ->
    ReLU -> fc -> sigmoid, shared across the streams of a block.
  * `OSBlock` (ref :152-198): 4 parallel streams of 1..4 stacked LightConvs
    (receptive fields 3,5,7,9), each gated by the shared ChannelGate, summed,
    projected 1x1 + residual.
  * Stem 7x7/2 + maxpool; stages conv2/3/4 of 2 blocks each with transition
    (1x1 conv + 2x2 avgpool) between; conv5 1x1; GAP + fc feature head.
  * Width multipliers x0.25..x1.0 (ref :388-439 factories).

The gdown pretrained-weight loader (ref :319-382) is replaced by the
checkpoint utilities in reid_tpu.utils.checkpoint.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_init, max_pool_same


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding=pad,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=kaiming_init, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class LightConv3x3(nn.Module):
    """1x1 pointwise + 3x3 depthwise (ref osnet.py:89-106)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=kaiming_init, dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(self.features, (3, 3), padding=1,
                    feature_group_count=self.features, use_bias=False,
                    kernel_init=kaiming_init, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """Unified aggregation gate (ref osnet.py:112-149)."""
    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        mid = max(self.features // self.reduction, 4)
        s = nn.Dense(mid, kernel_init=kaiming_init, dtype=self.dtype,
                     name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, kernel_init=kaiming_init,
                     dtype=self.dtype, name="fc2")(s)
        return jax.nn.sigmoid(s)[:, None, None, :]


class OSBlock(nn.Module):
    """Omni-scale residual bottleneck (ref osnet.py:152-198)."""
    features: int
    bottleneck_reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.features // self.bottleneck_reduction
        identity = x
        x1 = ConvBNReLU(mid, kernel=1, dtype=self.dtype, name="conv1")(x, train)
        gate = ChannelGate(mid, dtype=self.dtype, name="gate")
        streams = []
        for t in range(1, 5):  # receptive fields 3,5,7,9
            y = x1
            for i in range(t):
                y = LightConv3x3(mid, dtype=self.dtype,
                                 name=f"conv2_{t}_{i}")(y, train)
            streams.append(gate(y) * y)
        y = sum(streams)
        y = ConvBNReLU(self.features, kernel=1, relu=False, dtype=self.dtype,
                       name="conv3")(y, train)
        if identity.shape[-1] != self.features:
            identity = ConvBNReLU(self.features, kernel=1, relu=False,
                                  dtype=self.dtype, name="down")(x, train)
        return nn.relu(y + identity)


class OSNet(nn.Module):
    """Full OSNet trunk + ReID head (ref osnet.py:204-316).

    Returns (feature, logits) train / (feature, logits) eval like the rest of
    the zoo; `feature_only` gives the 512-d embedding (is_reid role).
    """
    num_classes: int = 751
    num_cams: int = 6   # unused; kept for factory uniformity
    channels: Sequence[int] = (64, 256, 384, 512)
    feat_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam=None, train: bool = True):
        dt = self.dtype
        c = self.channels
        x = x.astype(dt)
        x = ConvBNReLU(c[0], kernel=7, strides=2, dtype=dt, name="conv1")(x, train)
        x = max_pool_same(x)
        # conv2: 2 OS blocks; transition = 1x1 + avgpool/2
        x = OSBlock(c[1], dtype=dt, name="conv2_0")(x, train)
        x = OSBlock(c[1], dtype=dt, name="conv2_1")(x, train)
        x = ConvBNReLU(c[1], kernel=1, dtype=dt, name="trans2")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = OSBlock(c[2], dtype=dt, name="conv3_0")(x, train)
        x = OSBlock(c[2], dtype=dt, name="conv3_1")(x, train)
        x = ConvBNReLU(c[2], kernel=1, dtype=dt, name="trans3")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = OSBlock(c[3], dtype=dt, name="conv4_0")(x, train)
        x = OSBlock(c[3], dtype=dt, name="conv4_1")(x, train)
        x = ConvBNReLU(c[3], kernel=1, dtype=dt, name="conv5")(x, train)

        v = jnp.mean(x, axis=(1, 2))
        feature = nn.Dense(self.feat_dim, kernel_init=kaiming_init, dtype=dt,
                           name="fc")(v)
        feature = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=dt, name="fc_bn")(feature)
        feature = nn.relu(feature)
        logits = nn.Dense(self.num_classes,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=dt, name="classifier")(feature)
        return feature, logits


def osnet_stage(x, blocks, features, transition, dtype, name, train):
    for i in range(blocks):
        x = OSBlock(features, dtype=dtype, name=f"{name}_{i}")(x, train)
    return x


class PLROSNet(nn.Module):
    """Part-level + global two-branch OSNet. Ref plr_osnet.py:17-121.

    Shared conv1/conv2(+PAM-SE attention)/conv3(+attention), then duplicated
    conv4/conv5 branches: global branch -> 4-part horizontal strip avg-pool
    concat (4*C = 2048-d) + BN + classifier1; local branch -> global max-pool
    -> fc 512 + BN + classifier2. Eval returns concat of the two normalized
    BN features (ref :107-110).
    """
    num_classes: int = 751
    num_cams: int = 6
    channels: Sequence[int] = (64, 256, 384, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam=None, train: bool = True):
        from .attention_modules import AttentionModule

        dt = self.dtype
        c = self.channels
        x = x.astype(dt)
        x = ConvBNReLU(c[0], kernel=7, strides=2, dtype=dt, name="conv1")(x, train)
        x = max_pool_same(x)
        for i in range(2):
            x = OSBlock(c[1], dtype=dt, name=f"conv2_{i}")(x, train)
        x = ConvBNReLU(c[1], kernel=1, dtype=dt, name="trans2")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = AttentionModule(c[1], dtype=dt, name="att1")(x, train)
        for i in range(2):
            x = OSBlock(c[2], dtype=dt, name=f"conv3_{i}")(x, train)
        x = ConvBNReLU(c[2], kernel=1, dtype=dt, name="trans3")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = AttentionModule(c[2], dtype=dt, name="att2")(x, train)

        def branch(y, tag):
            for i in range(2):
                y = OSBlock(c[3], dtype=dt, name=f"conv4{tag}_{i}")(y, train)
            y = ConvBNReLU(c[3], kernel=1, dtype=dt, name=f"conv5{tag}")(y, train)
            return y

        f1 = branch(x, "0")  # global (part) branch
        f2 = branch(x, "1")  # local branch

        # global branch: 4 horizontal strips, avg-pool each, concat -> 4*C
        h = f1.shape[1]
        parts = [jnp.mean(f1[:, (h * i) // 4:(h * (i + 1)) // 4], axis=(1, 2))
                 for i in range(4)]
        v1 = jnp.concatenate(parts, axis=1)                       # (B, 2048)
        v2 = jnp.max(f2, axis=(1, 2))                             # (B, 512)
        v2 = nn.Dense(512, kernel_init=nn.initializers.normal(0.01),
                      dtype=dt, name="fc2")(v2)

        bn1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=dt, name="bn1")(v1)
        bn2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=dt, name="bn2")(v2)
        y1 = nn.Dense(self.num_classes,
                      kernel_init=nn.initializers.normal(0.01), dtype=dt,
                      name="classifier1")(bn1)
        y2 = nn.Dense(self.num_classes,
                      kernel_init=nn.initializers.normal(0.01), dtype=dt,
                      name="classifier2")(bn2)
        if not train:
            def l2n(v):
                return v / jnp.maximum(
                    jnp.linalg.norm(v.astype(jnp.float32), axis=1,
                                    keepdims=True), 1e-12).astype(v.dtype)
            return jnp.concatenate([l2n(bn1), l2n(bn2)], axis=1), (y1, y2)
        return (v1, v2), (y1, y2)
