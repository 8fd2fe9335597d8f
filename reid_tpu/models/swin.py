"""Swin transformer v1/v2 with U-Net-style fusion head for ReID, Flax/NHWC.

Re-design of ref `reid/backbones/swin_transformer.py` (522 LoC):
  * ShadowFeatureExtraction conv stem (2x conv stride-2, MixedNorm, fc) with
    SIE side-info embedding x1.5 (ref :278-304),
  * 4 stages of [regular, shifted] window-attention blocks; stage1 keeps the
    stem resolution, stages 2-4 patch-merge by 2 (ref StageModule :308-337),
  * WindowAttention v1 (relative-position table) / v2 (cosine attention with
    learned logit scale + log-CPB meta-MLP) (ref :117-232),
  * shifted windows via jnp.roll + additive masks (ref create_mask :95-108),
  * U-Net top-down fusion: stage4 + conv-aligned stem image, then three
    ConvTranspose channel aligners adding into stage3/2/1 (ref :386-412),
  * LayerNorm -> GeM-1D pooling -> BNNeck -> bias-free head (ref :414-430).

TPU notes: window attention is a batched (B*heads*windows, 49, 49) einsum —
49-token windows pack the MXU fine at bf16; masks/bias tables are constants
folded by XLA. All shapes static.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import GeM1D, kaiming_init, trunc_normal_init
from .vit import MixedNorm

_NEG = -1e9


def _shift_masks(window_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Additive masks for the shifted pass (ref create_mask :95-108)."""
    ws, d = window_size, window_size // 2
    ul = np.zeros((ws * ws, ws * ws), np.float32)
    ul[-d * ws:, :-d * ws] = _NEG
    ul[:-d * ws, -d * ws:] = _NEG
    lr = np.zeros((ws, ws, ws, ws), np.float32)
    lr[:, -d:, :, :-d] = _NEG
    lr[:, :-d, :, -d:] = _NEG
    lr = lr.reshape(ws * ws, ws * ws)
    return ul, lr


def _relative_indices(window_size: int) -> np.ndarray:
    idx = np.array([[x, y] for x in range(window_size)
                    for y in range(window_size)])
    return idx[None, :, :] - idx[:, None, :]  # (L, L, 2)


class WindowAttention(nn.Module):
    """Ref swin_transformer.py:117-232."""
    dim: int
    heads: int
    head_dim: int
    shifted: bool
    window_size: int
    version: str = "v1"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        ws = self.window_size
        h = self.heads
        inner = self.head_dim * h
        b, n_h, n_w, _ = x.shape
        disp = ws // 2

        if self.shifted:
            x = jnp.roll(x, (-disp, -disp), axis=(1, 2))

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=dt,
                       kernel_init=trunc_normal_init, name="to_qkv")(x)
        nw_h, nw_w = n_h // ws, n_w // ws

        def to_windows(t):
            t = t.reshape(b, nw_h, ws, nw_w, ws, h, self.head_dim)
            return t.transpose(0, 5, 1, 3, 2, 4, 6).reshape(
                b, h, nw_h * nw_w, ws * ws, self.head_dim)

        q, k, v = (to_windows(t) for t in jnp.split(qkv, 3, axis=-1))

        if self.version == "v2":
            # cosine attention with clamped learned logit scale (ref :205-209)
            def l2n(t):
                return t / jnp.maximum(
                    jnp.linalg.norm(t.astype(jnp.float32), axis=-1,
                                    keepdims=True), 1e-12).astype(t.dtype)
            dots = jnp.einsum("bhwid,bhwjd->bhwij", l2n(q), l2n(k))
            logit_scale = self.param(
                "logit_scale", lambda _: jnp.log(10.0 * jnp.ones((h,))),
                )
            scale = jnp.exp(jnp.clip(logit_scale, None, math.log(100.0)))
            dots = dots * scale[None, :, None, None, None].astype(dt)
            # log-CPB meta-MLP bias (ref :165-189)
            rel = _relative_indices(ws).reshape(-1, 2).astype(np.float32)
            rel_log = jnp.asarray(np.sign(rel) * np.log1p(np.abs(rel)))
            mlp = nn.Dense(384, dtype=jnp.float32, name="meta_fc1")(rel_log)
            mlp = nn.relu(mlp)
            bias = nn.Dense(h, dtype=jnp.float32, name="meta_fc2")(mlp)
            bias = bias.T.reshape(h, ws * ws, ws * ws)
            dots = dots + bias[None, :, None].astype(dt)
        else:
            scale = self.head_dim ** -0.5
            dots = jnp.einsum("bhwid,bhwjd->bhwij", q, k) * scale
            # relative-position bias table (ref :154-160)
            table = self.param("pos_embedding", trunc_normal_init,
                               (2 * ws - 1, 2 * ws - 1), jnp.float32)
            ri = _relative_indices(ws) + ws - 1
            bias = table[ri[:, :, 0], ri[:, :, 1]]
            dots = dots + bias[None, None, None].astype(dt)

        if self.shifted:
            ul, lr = _shift_masks(ws)
            ul = jnp.asarray(ul); lr = jnp.asarray(lr)
            win_row = jnp.arange(nw_h * nw_w) // nw_w
            win_col = jnp.arange(nw_h * nw_w) % nw_w
            ul_apply = (win_row == nw_h - 1).astype(jnp.float32)
            lr_apply = (win_col == nw_w - 1).astype(jnp.float32)
            mask = (ul_apply[:, None, None] * ul[None]
                    + lr_apply[:, None, None] * lr[None])
            dots = dots + mask[None, None].astype(dt)

        att = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("bhwij,bhwjd->bhwid", att, v)
        out = out.reshape(b, h, nw_h, nw_w, ws, ws, self.head_dim)
        out = out.transpose(0, 2, 4, 3, 5, 1, 6).reshape(b, n_h, n_w, inner)
        out = nn.Dense(self.dim, dtype=dt, kernel_init=trunc_normal_init,
                       name="to_out")(out)
        out = nn.Dense(self.dim, dtype=dt, kernel_init=trunc_normal_init,
                       name="post_proj")(out)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        if self.shifted:
            out = jnp.roll(out, (disp, disp), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    """Residual (Pre|Post)Norm attention + MLP (ref :238-263); v2 post-norm."""
    dim: int
    heads: int
    head_dim: int
    shifted: bool
    window_size: int
    version: str = "v1"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        attn = WindowAttention(self.dim, self.heads, self.head_dim,
                               self.shifted, self.window_size, self.version,
                               dtype=dt, name="attn")
        ln1 = nn.LayerNorm(dtype=dt, name="ln1")
        if self.version == "v2":
            x = x + ln1(attn(x, train))
        else:
            x = x + attn(ln1(x), train)

        def mlp(y):
            y = nn.Dense(self.dim * 4, dtype=dt,
                         kernel_init=trunc_normal_init, name="fc1")(y)
            y = nn.gelu(y)
            return nn.Dense(self.dim, dtype=dt,
                            kernel_init=trunc_normal_init, name="fc2")(y)

        ln2 = nn.LayerNorm(dtype=dt, name="ln2")
        if self.version == "v2":
            x = x + ln2(mlp(x))
        else:
            x = x + mlp(ln2(x))
        return x


class PatchMerging(nn.Module):
    """Unfold + linear downscale (ref :266-275). NHWC space-to-depth."""
    out_channels: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = self.factor
        x = x.reshape(b, h // f, f, w // f, f, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        kernel_init=trunc_normal_init, name="linear")(x)


class SwinTransformer(nn.Module):
    """Ref :340-430 incl. the U-Net fusion head; factory swin_t :508-514."""
    num_classes: int = 751
    num_cams: int = 0
    num_seqs: int = 0
    hidden_dim: int = 96
    layers: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    head_dim: int = 32
    window_size: int = 7
    version: str = "v1"
    side_info: bool = True
    sie_factor: float = 1.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cam: Optional[jnp.ndarray] = None,
                 train: bool = True):
        dt = self.dtype
        hd = self.hidden_dim
        x = x.astype(dt)

        # ShadowFeatureExtraction stem (ref :278-304): /4 + fc + SIE
        y = nn.Conv(12, (2, 2), strides=(2, 2), dtype=dt, name="sfe_conv1")(x)
        y = nn.relu(MixedNorm(dtype=dt, name="sfe_norm")(y, train))
        y = nn.relu(nn.Conv(48, (2, 2), strides=(2, 2), dtype=dt,
                            name="sfe_conv2")(y))
        y = nn.Dense(hd, dtype=dt, kernel_init=trunc_normal_init,
                     name="sfe_fc")(y)                       # (B, H/4, W/4, hd)
        n_views = max(self.num_cams, 1) * max(self.num_seqs, 1)
        if self.side_info and n_views > 1 and cam is not None:
            sie = self.param("side_info_embedding", trunc_normal_init,
                             (n_views, 1, 1, hd), jnp.float32).astype(dt)
            y = y + self.sie_factor * sie[cam]
        stem = y

        outs = []
        dims = [hd, hd * 2, hd * 4, hd * 8]
        for s in range(4):
            if s > 0:
                y = PatchMerging(dims[s], 2, dtype=dt, name=f"merge{s}")(y)
            for l in range(self.layers[s] // 2):
                y = SwinBlock(dims[s], self.heads[s], self.head_dim, False,
                              self.window_size, self.version, dtype=dt,
                              name=f"stage{s}_block{l}_reg")(y, train)
                y = SwinBlock(dims[s], self.heads[s], self.head_dim, True,
                              self.window_size, self.version, dtype=dt,
                              name=f"stage{s}_block{l}_shift")(y, train)
            outs.append(y)

        # U-Net fusion head (ref :386-412)
        img_align = nn.Conv(hd * 8, (8, 8), strides=(8, 8), dtype=dt,
                            name="img_channel_align")(stem)
        fused = outs[3] + img_align
        # flax ConvTranspose "SAME" = exact 2x upsample (torch k4/s2/p1)
        fused = nn.ConvTranspose(hd * 4, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=dt,
                                 name="stage4_align")(fused) + outs[2]
        fused = nn.ConvTranspose(hd * 2, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=dt,
                                 name="stage3_align")(fused) + outs[1]
        fused = nn.ConvTranspose(hd, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=dt,
                                 name="stage2_align")(fused) + outs[0]

        tokens = fused.reshape(fused.shape[0], -1, hd)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="norm")(tokens)
        feat = GeM1D(dtype=dt, name="gem")(tokens)

        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, use_bias=False, dtype=dt,
                          name="bottleneck")(feat)
        logits = nn.Dense(self.num_classes, use_bias=False,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=dt, name="mlp_head")(bn)
        if train:
            return feat, logits
        return bn, logits


def swin_t(num_classes=751, num_cams=6, num_seqs=0, version="v1", **kw):
    """Ref swin_t (:508-514): hidden 96, layers (2,2,6,2), heads (3,6,12,24)."""
    return SwinTransformer(num_classes=num_classes, num_cams=num_cams,
                           num_seqs=num_seqs, version=version, **kw)
