"""DeepLabV3-ResNet50 segmenter (torchvision layout), Flax/NHWC.

The reference's FG/BG segmentation augmentation loads TorchScript
`deeplabv3_resnet50` from torch.hub (ref `reid/segmentation.py:12-14`).
`data/segmentation.py`'s trainable SegUNet covers the training-from-scratch
role in a zero-egress build; THIS module closes the architecture gap the
same way `models/yolo.py` does for the detector: the exact torchvision
DeepLabV3 graph in Flax plus a mechanical weight converter
(`utils.torch_convert.convert_deeplabv3`), so published weights drop in
when supplied locally.

Architecture (torchvision deeplabv3_resnet50):
  * ResNet50 backbone with output stride 8 — layer3/layer4 convert their
    stride to dilation (2 / 4, multi-grid 1),
  * ASPP head at rates (12, 24, 36) + image-level pooling branch,
    256-channel projection,
  * 3x3 conv + BN + ReLU + 1x1 classifier, bilinear upsample to input.

`width` scales all channel counts (64 = torchvision; tests use a narrow
width so XLA:CPU stays off its deep-channel small-spatial conv cliff).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int          # conv1/conv2 width; output = 4 * planes
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=dt, name=name)
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dt,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=dt,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=dt, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + y)


class ASPP(nn.Module):
    ch: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=dt, name=name)
        outs = [nn.relu(bn("b0_bn")(nn.Conv(
            self.ch, (1, 1), use_bias=False, dtype=dt, name="b0_conv")(x)))]
        for i, r in enumerate(self.rates, start=1):
            y = nn.Conv(self.ch, (3, 3), padding=r,
                        kernel_dilation=(r, r), use_bias=False, dtype=dt,
                        name=f"b{i}_conv")(x)
            outs.append(nn.relu(bn(f"b{i}_bn")(y)))
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.relu(bn("pool_bn")(nn.Conv(
            self.ch, (1, 1), use_bias=False, dtype=dt, name="pool_conv")(g)))
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], x.shape[2],
                                 self.ch))
        outs.append(g)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.ch, (1, 1), use_bias=False, dtype=dt,
                    name="project_conv")(y)
        return nn.relu(bn("project_bn")(y))


class DeepLabV3(nn.Module):
    """Returns per-pixel class logits at input resolution (B, H, W, nc)."""
    num_classes: int = 21    # torchvision COCO/VOC head
    width: int = 64          # stem width; 64 = torchvision resnet50
    head_ch: int = 256       # ASPP/head channels; 256 = torchvision
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        w = self.width
        x = x.astype(dt)
        in_h, in_w = x.shape[1], x.shape[2]
        y = nn.Conv(w, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=dt, name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt, name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # (blocks, planes, stride, dilation) — output stride 8: layer3/4
        # trade stride for dilation (torchvision
        # replace_stride_with_dilation=[False, True, True])
        specs = [(3, w, 1, 1), (4, 2 * w, 2, 1),
                 (6, 4 * w, 1, 2), (3, 8 * w, 1, 4)]
        for li, (blocks, planes, stride, dil) in enumerate(specs, start=1):
            for bi in range(blocks):
                first = bi == 0
                y = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    # torchvision: the first block of a dilated layer uses
                    # the PREVIOUS dilation for its 3x3 (grid starts at 1)
                    dilation=(dil // 2 if dil > 1 else 1) if first else dil,
                    downsample=first, dtype=dt,
                    name=f"layer{li}_{bi}")(y, train)

        y = ASPP(ch=self.head_ch, dtype=dt, name="aspp")(y, train)
        y = nn.Conv(self.head_ch, (3, 3), padding=1, use_bias=False,
                    dtype=dt, name="head_conv")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt, name="head_bn")(y))
        y = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="classifier")(y)
        y = jax.image.resize(
            y.astype(jnp.float32),
            (y.shape[0], in_h, in_w, self.num_classes), "bilinear")
        return y


def extract_foreground(logits: jnp.ndarray,
                       person_class: int = 15) -> jnp.ndarray:
    """(B, H, W) boolean person mask — ref segmentation.py
    extract_foreground_background (:35-49): argmax over classes, person
    (VOC id 15) = foreground."""
    return jnp.argmax(logits, axis=-1) == person_class
