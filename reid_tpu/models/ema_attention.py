"""EMA (efficient multi-scale attention) block. Ref `reid/backbones/EMA_Res18.py:10-37`.

Grouped cross-spatial attention: channels are split into G groups; per group a
1x1 conv over pooled (H+W) strips produces directional sigmoid gates, a 3x3
conv gives a second representation, and the two cross-attend via softmaxed
global descriptors to produce a spatial gate. NHWC re-design of the NCHW
reference with identical dataflow.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_init


class EMAttention(nn.Module):
    factor: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, h, w, c = x.shape
        g = min(self.factor, c)
        cg = c // g
        xg = x.reshape(n * g, h, w, cg)
        xf = xg.astype(jnp.float32)

        # Directional pooled strips (ref pool_h/pool_w :17-18).
        x_h = jnp.mean(xf, axis=2)                      # (NG, H, Cg)
        x_w = jnp.mean(xf, axis=1)                      # (NG, W, Cg)
        hw = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (NG, H+W, 1, Cg)
        hw = nn.Conv(cg, (1, 1), kernel_init=kaiming_init, dtype=self.dtype,
                     name="conv1x1")(hw.astype(self.dtype)).astype(jnp.float32)
        gh, gw = hw[:, :h, 0, :], hw[:, h:, 0, :]
        gated = xf * jax.nn.sigmoid(gh)[:, :, None, :] * jax.nn.sigmoid(gw)[:, None, :, :]

        # x1 = GroupNorm(gated) with one group over Cg (ref gn :19).
        x1 = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32,
                          name="gn")(gated)
        x2 = nn.Conv(cg, (3, 3), padding=1, kernel_init=kaiming_init,
                     dtype=self.dtype, name="conv3x3")(xg).astype(jnp.float32)

        # Cross attention between global descriptors and flattened maps.
        d1 = jax.nn.softmax(jnp.mean(x1, axis=(1, 2)), axis=-1)  # (NG, Cg)
        d2 = jax.nn.softmax(jnp.mean(x2, axis=(1, 2)), axis=-1)
        f1 = x2.reshape(n * g, h * w, cg)
        f2 = x1.reshape(n * g, h * w, cg)
        weights = (
            jnp.einsum("nc,nlc->nl", d1, f1)
            + jnp.einsum("nc,nlc->nl", d2, f2)
        ).reshape(n * g, h, w, 1)
        out = xf * jax.nn.sigmoid(weights)
        return out.reshape(n, h, w, c).astype(x.dtype)
