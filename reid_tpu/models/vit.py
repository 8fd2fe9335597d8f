"""ViT-tiny with side-info embedding (SIE) for ReID, Flax/NHWC.

Re-design of ref `reid/backbones/vision_transformer.py:38-360`:
  * Convolution stem: 7x7/2 + two 3x3 convs, the first two with MixedNorm
    (half instance / half batch norm — ref :40-52), then a patch projection
    conv (ref Convolution_Stem :54-81). stem_stride=2, patch 32 -> effective
    patch 16 conv.
  * cls token + learnable pos embedding (trunc normal 0.02),
  * SIE: one learned embedding per (camera x sequence) view added x1.5 to all
    tokens (ref :180-188, :230-231),
  * pre-norm transformer (depth 6, heads 16, dim 384, mlp 2048, dropout 0.1),
  * final LayerNorm, cls pooling, BNNeck (frozen bias) + bias-free head
    (ref :198-203, :243-249).

TPU notes: token count at 224x224/patch32-stride2 stem = 7x7=49 (+1 cls) —
tiny; attention runs as one fused batched matmul per layer. bfloat16 safe.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import InstanceNorm, kaiming_init, trunc_normal_init


class MixedNorm(nn.Module):
    """Half instance / half batch norm over NHWC channels (ref :38-52)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        half = c // 2
        y1 = InstanceNorm(dtype=self.dtype, name="in")(x[..., :half])
        y2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn")(x[..., half:])
        return jnp.concatenate([y1, y2], axis=-1)


class ConvStem(nn.Module):
    """Ref Convolution_Stem (:54-81). Returns (B, L, D) tokens."""
    hidden_dim: int = 64
    embed_dim: int = 384
    stem_stride: int = 2
    patch_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x = nn.Conv(self.hidden_dim, (7, 7), strides=(self.stem_stride,) * 2,
                    padding=3, use_bias=False, kernel_init=kaiming_init,
                    dtype=dt, name="conv1")(x)
        x = nn.relu(MixedNorm(dtype=dt, name="mn1")(x, train))
        x = nn.Conv(self.hidden_dim, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init, dtype=dt, name="conv2")(x)
        x = nn.relu(MixedNorm(dtype=dt, name="mn2")(x, train))
        x = nn.Conv(self.hidden_dim, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init, dtype=dt, name="conv3")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt, name="bn3")(x))
        p = self.patch_size // self.stem_stride
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=dt,
                    name="proj")(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        y = nn.LayerNorm(dtype=dt, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            dropout_rate=self.dropout, deterministic=not train,
            dtype=dt, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=dt, name="ln2")(x)
        y = nn.Dense(self.mlp_dim, dtype=dt, name="fc1",
                     kernel_init=trunc_normal_init)(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=dt, name="fc2",
                     kernel_init=trunc_normal_init)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class ViT(nn.Module):
    """ViT-t with SIE + BNNeck head (ref :152-276, factory :345-350)."""
    num_classes: int = 751
    num_cams: int = 6
    num_seqs: int = 0        # cameras x sequences when both > 0
    dim: int = 384
    depth: int = 6
    heads: int = 16
    mlp_dim: int = 2048
    dropout: float = 0.1
    sie_factor: float = 1.5
    side_info: bool = True
    pool: str = "cls"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam: Optional[jnp.ndarray] = None,
                 train: bool = True):
        dt = self.dtype
        x = x.astype(dt)
        tokens = ConvStem(embed_dim=self.dim, dtype=dt, name="stem")(x, train)
        b, n, d = tokens.shape

        cls = self.param("cls_token", trunc_normal_init, (1, 1, self.dim),
                         jnp.float32).astype(dt)
        tokens = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tokens], axis=1)
        pos = self.param("pos_embedding", trunc_normal_init,
                         (1, n + 1, self.dim), jnp.float32).astype(dt)
        tokens = tokens + pos

        n_views = max(self.num_cams, 1) * max(self.num_seqs, 1)
        if self.side_info and n_views > 1:
            sie = self.param("side_info_embedding", trunc_normal_init,
                             (n_views, 1, self.dim), jnp.float32).astype(dt)
            if cam is not None:
                # view_index = cam * num_seqs + seq, precomputed by caller
                tokens = tokens + self.sie_factor * sie[cam]
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens)

        for i in range(self.depth):
            tokens = TransformerBlock(self.dim, self.heads, self.mlp_dim,
                                      self.dropout, dtype=dt,
                                      name=f"block{i}")(tokens, train)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="to_latent")(tokens)
        feat = jnp.mean(tokens, axis=1) if self.pool == "mean" \
            else tokens[:, 0]

        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, use_bias=False, dtype=dt,
                          name="bottleneck")(feat)
        logits = nn.Dense(self.num_classes, use_bias=False,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=dt, name="mlp_head")(bn)
        if train:
            return feat, logits
        return bn, logits


def vit_t(num_classes=751, num_cams=6, num_seqs=0, **kw) -> ViT:
    """Factory mirroring ref vit_t (:345-350): dim 384 / depth 6 / heads 16."""
    return ViT(num_classes=num_classes, num_cams=num_cams, num_seqs=num_seqs,
               **kw)
