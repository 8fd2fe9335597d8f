"""Shared model primitives (Flax linen, NHWC, TPU-native).

Re-designed equivalents of the reference's custom norm / pooling / attention
primitives:
  - IBN split instance/batch norm      (ref reid/backbones/SERes18_IBN.py:67-93)
  - LBN split layer/batch norm          (ref SERes18_IBN.py:44-64)
  - SEBlock channel attention           (ref SERes18_IBN.py:13-41)
  - GeM generalized-mean pooling        (ref reid/backbones/attention_pooling.py:49-92)
  - BNNeck (BatchNorm with frozen bias) (ref SERes18_IBN.py:236-239)
  - BatchRenorm 1D/2D (+non-iid)        (ref reid/backbones/batchrenorm.py)
  - MetaAconC_1D activation             (ref SERes18_IBN.py:157-183)

Design notes (TPU):
  * NHWC layout everywhere; channels on the 128-lane axis.
  * Norm statistics are computed in float32 regardless of compute dtype.
  * Under pjit/GSPMD with a batch-sharded mesh, `jnp.mean` over the batch is a
    *global* mean (XLA inserts the all-reduce), so BatchNorm is cross-replica
    synced by construction — no NCCL/DDP analog needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
classifier_init = nn.initializers.normal(stddev=0.001)
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (NHWC)."""
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))  # spatial
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return y.astype(self.dtype)


class BatchRenorm(nn.Module):
    """Batch renormalization (Ioffe 2017) over leading + spatial axes.

    Mirrors ref `batchrenorm.py:BatchRenormalization2D`: r/d clipped with
    schedules that relax r_max 1->3 and d_max 0->5 after `warmup_steps`
    optimizer steps (ref lines 84-88). Running stats + step counter live in the
    `batch_stats` collection.
    """
    momentum: float = 0.01
    epsilon: float = 1e-5
    r_max_final: float = 3.0
    d_max_final: float = 5.0
    warmup_steps: int = 500
    use_running_average: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        steps = self.variable("batch_stats", "steps", lambda: jnp.zeros((), jnp.int32))

        xf = x.astype(jnp.float32)
        if use_ra:
            y = (xf - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.epsilon)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            std = jnp.sqrt(var + self.epsilon)
            ra_std = jnp.sqrt(ra_var.value + self.epsilon)
            t = jnp.clip(
                (steps.value - self.warmup_steps).astype(jnp.float32) / self.warmup_steps,
                0.0, 1.0,
            )
            r_max = 1.0 + (self.r_max_final - 1.0) * t
            d_max = self.d_max_final * t
            r = jax.lax.stop_gradient(jnp.clip(std / ra_std, 1.0 / r_max, r_max))
            d = jax.lax.stop_gradient(
                jnp.clip((mean - ra_mean.value) / ra_std, -d_max, d_max)
            )
            y = ((xf - mean) / std) * r + d
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var
                steps.value = steps.value + 1
        y = y * gamma + beta
        return y.astype(self.dtype)


class BatchRenormNonIID(nn.Module):
    """Non-iid batch renorm for PK-sampled batches. Ref batchrenorm.py:155-225.

    The batch is regrouped into per-identity groups of `group_size` (the K of
    PK sampling); statistics are computed per group (group-norm-like over
    (K, H, W)) and renorm-corrected against the running stats. Eval blends
    per-instance statistics with the running stats (ref :216-225).
    """
    group_size: int = 4
    momentum: float = 0.01
    epsilon: float = 1e-5
    r_max_final: float = 3.0
    d_max_final: float = 5.0
    warmup_steps: int = 500
    eval_blend: float = 0.2      # weight of instance stats at eval
    use_running_average: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        b, h, w, c = x.shape
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        steps = self.variable("batch_stats", "steps",
                              lambda: jnp.zeros((), jnp.int32))
        xf = x.astype(jnp.float32)

        if use_ra:
            # blend instance stats into the running stats (ref :216-225)
            inst_mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            inst_var = jnp.mean(jnp.square(xf - inst_mean), axis=(1, 2),
                                keepdims=True)
            mean = (1 - self.eval_blend) * ra_mean.value + \
                self.eval_blend * inst_mean
            var = (1 - self.eval_blend) * ra_var.value + \
                self.eval_blend * inst_var
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        else:
            k = min(self.group_size, b)
            g = b // k
            xg = xf[: g * k].reshape(g, k, h, w, c)
            mean_g = jnp.mean(xg, axis=(1, 2, 3), keepdims=True)   # per group
            var_g = jnp.mean(jnp.square(xg - mean_g), axis=(1, 2, 3),
                             keepdims=True)
            std_g = jnp.sqrt(var_g + self.epsilon)
            ra_std = jnp.sqrt(ra_var.value + self.epsilon)
            t = jnp.clip((steps.value - self.warmup_steps).astype(jnp.float32)
                         / self.warmup_steps, 0.0, 1.0)
            r_max = 1.0 + (self.r_max_final - 1.0) * t
            d_max = self.d_max_final * t
            r = jax.lax.stop_gradient(
                jnp.clip(std_g / ra_std, 1.0 / r_max, r_max))
            d = jax.lax.stop_gradient(
                jnp.clip((mean_g - ra_mean.value) / ra_std, -d_max, d_max))
            y = (((xg - mean_g) / std_g) * r + d).reshape(g * k, h, w, c)
            if b > g * k:  # ragged tail falls back to batch stats
                tail = (xf[g * k:] - jnp.mean(mean_g, axis=0)) / \
                    jnp.mean(std_g, axis=0)
                y = jnp.concatenate([y, tail], axis=0)
            if not self.is_initializing():
                m = self.momentum
                batch_mean = jnp.mean(xf, axis=(0, 1, 2))
                batch_var = jnp.mean(jnp.square(xf - batch_mean), axis=(0, 1, 2))
                ra_mean.value = (1 - m) * ra_mean.value + m * batch_mean
                ra_var.value = (1 - m) * ra_var.value + m * batch_var
                steps.value = steps.value + 1
        y = y * gamma + beta
        return y.astype(self.dtype)


def make_norm2d(renorm: bool, train: bool, dtype, name: str):
    """Factory: BatchNorm or BatchRenorm over (N, H, W, C) -> per-channel."""
    if renorm:
        return BatchRenorm(use_running_average=not train, dtype=dtype, name=name)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
    )


class IBN(nn.Module):
    """Split-channel Instance/Batch norm (IBN-a). Ref SERes18_IBN.py:67-93.

    First `ratio` fraction of channels get InstanceNorm (affine), the rest
    BatchNorm. Channel-last split (NHWC).
    """
    ratio: float = 0.5
    renorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        half = int(c * self.ratio)
        x1, x2 = x[..., :half], x[..., half:]
        y1 = InstanceNorm(dtype=self.dtype, name="IN")(x1)
        y2 = make_norm2d(self.renorm, train, self.dtype, "BN")(x2)
        return jnp.concatenate([y1, y2], axis=-1)


class LBN1D(nn.Module):
    """Split layer/batch norm over feature vectors. Ref SERes18_IBN.py:44-64."""
    ratio: float = 0.5
    renorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        half = int(c * self.ratio)
        y1 = nn.LayerNorm(dtype=self.dtype, name="LN")(x[..., :half])
        y2 = make_norm2d(self.renorm, train, self.dtype, "BN")(x[..., half:])
        return jnp.concatenate([y1, y2], axis=-1)


class SEBlock(nn.Module):
    """Squeeze-excitation gate. Ref SERes18_IBN.py:13-41.

    Matches the reference forward exactly: GAP -> 1x1 conv (no bias) -> ReLU
    -> Linear (no bias) -> sigmoid. (The BN between fc1/relu is commented out
    in the reference forward, line 36 — we follow the executed path.)
    """
    c_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mip = max(8, self.c_in // 16)
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)  # (N, C)
        s = nn.Dense(mip, use_bias=False, kernel_init=kaiming_init,
                     dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.c_in, use_bias=False, kernel_init=kaiming_init,
                     dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return s[:, None, None, :]


class GeM(nn.Module):
    """Generalized-mean pooling with learnable p. Ref attention_pooling.py:49-66."""
    p_init: float = 3.0
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k: jnp.array(self.p_init, jnp.float32))
        xf = jnp.clip(x.astype(jnp.float32), self.eps, None)
        pooled = jnp.mean(xf ** p, axis=(1, 2)) ** (1.0 / p)
        return pooled.astype(self.dtype)


class GeM1D(nn.Module):
    """GeM over a token axis (N, L, C) -> (N, C). Ref attention_pooling.py:81-92."""
    p_init: float = 3.0
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k: jnp.array(self.p_init, jnp.float32))
        xf = jnp.clip(x.astype(jnp.float32), self.eps, None)
        pooled = jnp.mean(xf ** p, axis=1) ** (1.0 / p)
        return pooled.astype(self.dtype)


class GeM3D(nn.Module):
    """GeM over (N, T, H, W, C) -> (N, C). Ref attention_pooling.py:69-78."""
    p_init: float = 3.0
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k: jnp.array(self.p_init, jnp.float32))
        xf = jnp.clip(x.astype(jnp.float32), self.eps, None)
        pooled = jnp.mean(xf ** p, axis=(1, 2, 3)) ** (1.0 / p)
        return pooled.astype(self.dtype)


class AttentionPooling(nn.Module):
    """CLIP-style attention pooling over a token/spatial axis.

    Ref attention_pooling.py:7-46: a learned mean-query attends over the
    tokens (keys/values = tokens + mean), producing a single pooled vector.
    Input (N, L, C) -> (N, C).
    """
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, l, c = x.shape
        mean = jnp.mean(x, axis=1, keepdims=True)          # (N, 1, C)
        tokens = jnp.concatenate([mean, x], axis=1)        # (N, L+1, C)
        q = nn.Dense(c, dtype=self.dtype, name="q")(mean)
        k = nn.Dense(c, dtype=self.dtype, name="k")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v")(tokens)
        h = self.num_heads
        d = c // h
        q = q.reshape(n, 1, h, d)
        k = k.reshape(n, l + 1, h, d)
        v = v.reshape(n, l + 1, h, d)
        att = jax.nn.softmax(
            jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32)
            / jnp.sqrt(d), -1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, 1, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)[:, 0]


class BNNeck(nn.Module):
    """BatchNorm neck with frozen (zero) bias + bias-free classifier.

    Ref SERes18_IBN.py:236-243: `bnneck.bias.requires_grad_(False)` with
    kaiming init — bias stays 0 forever, so we simply use `use_bias=False`.
    Returns (bn_feature, logits).
    """
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feature, train: bool = True):
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_bias=False, dtype=self.dtype, name="bn",
        )(feature)
        logits = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=classifier_init,
            dtype=self.dtype, name="classifier",
        )(bn)
        return bn, logits


class MetaAconC1D(nn.Module):
    """ACON activation with learned beta. Ref SERes18_IBN.py:157-183."""
    width: int
    r: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = max(self.r, self.width // self.r)
        h = nn.Dense(hidden, kernel_init=kaiming_init, dtype=self.dtype, name="fc1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(h)
        h = nn.Dense(self.width, kernel_init=kaiming_init, dtype=self.dtype, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(h)
        beta = jax.nn.sigmoid(h)
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, self.width), jnp.float32)
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, self.width), jnp.float32)
        p1 = p1.astype(x.dtype)
        p2 = p2.astype(x.dtype)
        d = (p1 - p2) * x
        return d * jax.nn.sigmoid(beta * d) + p2 * x


def conv3x3(features: int, strides: int = 1, name: str = None, dtype=jnp.float32):
    return nn.Conv(features, (3, 3), strides=(strides, strides), padding=1,
                   use_bias=False, kernel_init=kaiming_init, dtype=dtype, name=name)


def conv1x1(features: int, strides: int = 1, name: str = None, dtype=jnp.float32):
    return nn.Conv(features, (1, 1), strides=(strides, strides), padding=0,
                   use_bias=False, kernel_init=kaiming_init, dtype=dtype, name=name)


def max_pool_same(x, window: int = 3, strides: int = 2):
    """3x3/2 max pool with torch-style padding=1."""
    return nn.max_pool(x, (window, window), strides=(strides, strides),
                       padding=((1, 1), (1, 1)))
