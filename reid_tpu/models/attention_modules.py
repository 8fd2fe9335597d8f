"""Attention modules: SE (spatial-preserving variant), PAM position
attention, PAM->SE composite, MCA multi-dimension collaborative attention.

Ref `reid/backbones/attention_module.py:7-196`. NHWC; the PAM attention
matmul is (HW x HW) — MXU-friendly batched einsum instead of the reference's
bmm over permuted NCHW views.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_init


class SEModule(nn.Module):
    """Per-position channel gate (NO global pool — the reference comments the
    avg_pool out, ref :11,19): 1x1 conv -> ReLU -> 1x1 conv -> sigmoid."""
    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.Conv(self.channels // self.reduction, (1, 1),
                    kernel_init=kaiming_init, dtype=self.dtype, name="fc1")(x)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), kernel_init=kaiming_init,
                    dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class PAMModule(nn.Module):
    """Position attention (SAGAN-style) with learnable gamma init 0 and BN on
    the attention branch (ref :27-77)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), kernel_init=kaiming_init,
                    dtype=self.dtype, name="query")(x).reshape(n, h * w, -1)
        k = nn.Conv(c // 8, (1, 1), kernel_init=kaiming_init,
                    dtype=self.dtype, name="key")(x).reshape(n, h * w, -1)
        energy = jnp.einsum("nqd,nkd->nqk", q, k)
        att = jax.nn.softmax(energy, axis=-1)
        v = x.reshape(n, h * w, c)
        out = jnp.einsum("nqk,nkc->nqc", att, v).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = gamma.astype(self.dtype) * out
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        return out + x


class AttentionModule(nn.Module):
    """PAM -> SE composite (ref :80-91), used by PLR-OSNet."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = PAMModule(self.channels, dtype=self.dtype, name="pam")(x, train)
        return SEModule(self.channels, dtype=self.dtype, name="se")(x)


class MCALayer(nn.Module):
    """Multi-dimension collaborative attention (ref :94-196): three gates
    built from [std, mean] pooled descriptors over (W,C), (H,C) and (H,W)
    rotations, each a small depthwise-1D conv + sigmoid, averaged."""
    channels: int
    dtype: Any = jnp.float32

    def _gate(self, pooled, name):
        # pooled: (N, L, 2) -> conv over L -> (N, L, 1) sigmoid gate
        g = nn.Conv(1, (3,), padding=1, use_bias=False,
                    kernel_init=kaiming_init, dtype=self.dtype, name=name)(pooled)
        return jax.nn.sigmoid(g)

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        xf = x.astype(jnp.float32)

        def stdmean(v, axes):
            m = jnp.mean(v, axis=axes)
            s = jnp.sqrt(jnp.mean(jnp.square(v - jnp.mean(v, axis=axes,
                                                          keepdims=True)),
                                  axis=axes) + 1e-5)
            return jnp.stack([s, m], axis=-1).astype(self.dtype)

        # channel gate from (H, W) pooling: descriptor (N, C, 2)
        g_c = self._gate(stdmean(xf, (1, 2)), "gate_c")      # (N, C, 1)
        out_c = x * g_c[:, None, None, :, 0]
        # height gate from (W, C) pooling: (N, H, 2)
        g_h = self._gate(stdmean(xf, (2, 3)), "gate_h")      # (N, H, 1)
        out_h = x * g_h[:, :, None, :]
        # width gate from (H, C) pooling: (N, W, 2)
        g_w = self._gate(stdmean(xf, (1, 3)), "gate_w")      # (N, W, 1)
        out_w = x * g_w[:, None, :, :]
        return (out_c + out_h + out_w) / 3.0
