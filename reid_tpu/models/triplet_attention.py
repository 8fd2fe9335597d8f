"""Triplet attention (rotate-and-gate over three axis pairs).

Ref `reid/backbones/triplet_attention.py:6-100`. NHWC re-design: instead of
permuting NCHW tensors, each gate pools ([std, mean]) over a chosen axis,
runs a 7x7 conv + BN on the 2-channel map, and sigmoid-gates the input.
Branches: gate over C (spatial HW map), gate over H, gate over W; output is
the mean of the three gated tensors (ref :88-100).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_init


class _AttentionGate(nn.Module):
    """ZPool([std, mean] over `axis`) -> 7x7 conv -> BN -> sigmoid gate."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x2d, train: bool = True):
        # x2d: (N, A, B, 2) pooled map; returns (N, A, B, 1) gate.
        y = nn.Conv(1, (7, 7), padding=3, use_bias=False,
                    kernel_init=kaiming_init, dtype=self.dtype, name="conv")(x2d)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        return jax.nn.sigmoid(y)


def _zpool(x, axis):
    """[std, mean] over one axis, stacked on a new trailing channel axis."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis)
    # torch.std uses the unbiased estimator (N-1); match it.
    n = x.shape[axis]
    var = jnp.sum(jnp.square(xf - jnp.expand_dims(mean, axis)), axis=axis) / max(n - 1, 1)
    return jnp.stack([jnp.sqrt(var), mean], axis=-1)


class TripletAttention(nn.Module):
    """Ref triplet_attention.py:71-100 (NHWC; x is (N, H, W, C))."""
    no_spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, h, w, c = x.shape
        # Branch cw: pool over H -> map (N, W, C, 2) -> gate broadcast over H.
        g_cw = _AttentionGate(dtype=self.dtype, name="cw")(
            _zpool(x, axis=1).astype(self.dtype), train)          # (N, W, C, 1)
        out_cw = x * jnp.transpose(g_cw, (0, 3, 1, 2))            # (N,1,W,C)
        # Branch hc: pool over W -> map (N, H, C, 2) -> gate broadcast over W.
        g_hc = _AttentionGate(dtype=self.dtype, name="hc")(
            _zpool(x, axis=2).astype(self.dtype), train)          # (N, H, C, 1)
        out_hc = x * jnp.transpose(g_hc, (0, 1, 3, 2))            # (N,H,1,C)
        if self.no_spatial:
            return 0.5 * (out_cw + out_hc)
        # Branch hw: pool over C -> map (N, H, W, 2) -> gate broadcast over C.
        g_hw = _AttentionGate(dtype=self.dtype, name="hw")(
            _zpool(x, axis=3).astype(self.dtype), train)          # (N, H, W, 1)
        out_hw = x * g_hw
        return (out_cw + out_hc + out_hw) / 3.0
