"""GAN backbones in Flax/NHWC.

Re-design of ref `gan/backbones/`:
  * `SelfAttention` — SAGAN attention with gamma init 0
    (discriminator_gan.py:28-60),
  * `CategoricalConditionalBN` — class-conditional scale/shift over
    affine-less BN (categorical_conditional_bn.py:41-60; note the reference
    has a latent import bug there — behavior reproduced, bug not),
  * `Generator` — SNGAN-style residual-upsample stack with spectral norm +
    optional self-attention + conditional BN (generator_gan.py:136-184), or
    the plain DCGAN ConvTranspose stack; output tanh (nc, 128, 64),
  * `Discriminator` — spectral-norm residual downsample blocks / plain DCGAN
    stack / Wasserstein head / VAE mode returning (score, features)
    (discriminator_gan.py:63-154),
  * `VAE` — conv encoder -> (mean, var) -> reparam -> deconv decoder
    (generator_gan.py:57-133).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier = nn.initializers.xavier_uniform()


class SelfAttention(nn.Module):
    """SAGAN self-attention (ref discriminator_gan.py:28-60)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x)
        att = jax.nn.softmax(
            jnp.einsum("nhwd,nHWd->nhwHW", q, k).reshape(n, h * w, h * w)
            .astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("nqk,nkc->nqc", att,
                         v.reshape(n, h * w, c)).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(self.dtype) * out + x


class CategoricalConditionalBN(nn.Module):
    """Class-embedded scale/shift over affine-less BN (ref ccbn.py:41-60)."""
    num_classes: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="bn")(x)
        gamma = nn.Embed(self.num_classes, self.features,
                         embedding_init=nn.initializers.ones,
                         dtype=self.dtype, name="gamma")(y)
        beta = nn.Embed(self.num_classes, self.features,
                        embedding_init=nn.initializers.zeros,
                        dtype=self.dtype, name="beta")(y)
        return h * gamma[:, None, None, :] + beta[:, None, None, :]


class GenBlock(nn.Module):
    """Residual upsample block (ref generator_gan.py:9-53): BN -> lrelu ->
    deconv x2 -> conv -> BN -> conv, + 1x1-projected upsampled skip."""
    out_ch: int
    num_classes: int = 0
    upsample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = True):
        dt = self.dtype
        in_ch = x.shape[-1]
        branch = x
        if self.num_classes and y is not None:
            x = CategoricalConditionalBN(self.num_classes, in_ch, dtype=dt,
                                         name="bn1")(x, y, train)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name="bn1")(x)
        x = nn.leaky_relu(x, 0.2)
        if self.upsample:
            up = nn.ConvTranspose(in_ch, (4, 4), strides=(2, 2),
                                  padding="SAME", use_bias=False, dtype=dt,
                                  name="deconv")
            x = up(x)
            branch = up(branch)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, kernel_init=xavier,
                    dtype=dt, name="conv1")(x)
        if self.num_classes and y is not None:
            x = CategoricalConditionalBN(self.num_classes, self.out_ch,
                                         dtype=dt, name="bn2")(x, y, train)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name="bn2")(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, kernel_init=xavier,
                    dtype=dt, name="conv2")(nn.leaky_relu(x, 0.2))
        branch = nn.Conv(self.out_ch, (1, 1), kernel_init=xavier, dtype=dt,
                         name="skip")(branch)
        return x + branch


class Generator(nn.Module):
    """nz -> (128, 64, 3) tanh images.

    spectral (SNGAN residual, ref :136-158): linear to (4, 2, ngf), four
    GenBlocks (x2 each) + optional self-attention, final deconv to nc.
    plain (DCGAN, ref :159-181): ConvTranspose stack from 1x1.
    """
    nz: int = 100
    ngf: int = 64
    nc: int = 3
    spectral: bool = True
    self_attn: bool = False
    num_classes: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, y: Optional[jnp.ndarray] = None,
                 train: bool = True):
        dt = self.dtype
        z = z.reshape(z.shape[0], -1).astype(dt)
        if self.spectral:
            x = nn.Dense(4 * 2 * self.ngf, dtype=dt, name="fc")(z)
            x = x.reshape(-1, 4, 2, self.ngf)
            x = GenBlock(self.ngf, self.num_classes, dtype=dt,
                         name="block1")(x, y, train)          # 8x4
            x = GenBlock(self.ngf * 8, self.num_classes, dtype=dt,
                         name="block2")(x, y, train)          # 16x8
            x = GenBlock(self.ngf * 4, self.num_classes, dtype=dt,
                         name="block3")(x, y, train)          # 32x16
            if self.self_attn:
                x = SelfAttention(dtype=dt, name="attn1")(x)
            x = GenBlock(self.ngf * 2, self.num_classes, dtype=dt,
                         name="block4")(x, y, train)          # 64x32
            if self.self_attn:
                x = SelfAttention(dtype=dt, name="attn2")(x)
            x = nn.ConvTranspose(self.nc, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=dt,
                                 name="to_rgb")(x)            # 128x64
            return jnp.tanh(x)
        # plain DCGAN stack (ref :159-181): z -> 4x2 -> x2 five times -> 128x64
        x = z.reshape(-1, 1, 1, self.nz)
        x = nn.ConvTranspose(self.ngf * 8, (4, 2), strides=(4, 2),
                             padding="VALID", use_bias=False, dtype=dt,
                             name="deconv0")(x)               # 4x2
        x = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=dt,
                                 name="bn0")(x))
        for i, d in enumerate([self.ngf * 8, self.ngf * 4, self.ngf * 2,
                               self.ngf]):
            x = nn.ConvTranspose(d, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=dt,
                                 name=f"deconv{i + 1}")(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=dt,
                                     name=f"bn{i + 1}")(x))   # -> 64x32
        x = nn.ConvTranspose(self.nc, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, dtype=dt, name="to_rgb")(x)
        return jnp.tanh(x)                                    # 128x64


class DiscBlock(nn.Module):
    """Spectral-norm residual downsample block (ref discriminator_gan.py:7-25)."""
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        in_ch = x.shape[-1]
        branch = x
        y = nn.SpectralNorm(nn.Conv(in_ch, (3, 3), padding=1,
                                    kernel_init=xavier, dtype=dt,
                                    name="conv1"))(x, update_stats=train)
        y = nn.leaky_relu(y, 0.1)
        y = nn.SpectralNorm(nn.Conv(self.out_ch, (3, 3), padding=1,
                                    kernel_init=xavier, dtype=dt,
                                    name="conv2"))(y, update_stats=train)
        y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        branch = nn.avg_pool(branch, (2, 2), strides=(2, 2))
        branch = nn.SpectralNorm(nn.Conv(self.out_ch, (1, 1),
                                         kernel_init=xavier, dtype=dt,
                                         name="skip"))(branch,
                                                       update_stats=train)
        return y + branch


class Discriminator(nn.Module):
    """Ref discriminator_gan.py:63-154. Heads:
    vae=True -> (score, trunk features); wasserstein -> raw score;
    default -> sigmoid score."""
    ndf: int = 64
    nc: int = 3
    vae: bool = False
    wasserstein: bool = False
    spectral: bool = True
    self_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x = x.astype(dt)
        if self.spectral and not self.wasserstein:
            x = DiscBlock(self.ndf, dtype=dt, name="block1")(x, train)
            x = DiscBlock(self.ndf * 2, dtype=dt, name="block2")(x, train)
            x = DiscBlock(self.ndf * 4, dtype=dt, name="block3")(x, train)
            if self.self_attn:
                x = SelfAttention(dtype=dt, name="attn")(x)
            x = DiscBlock(self.ndf * 8, dtype=dt, name="block4")(x, train)
        else:
            x = nn.Conv(self.ndf, (4, 4), strides=(4, 2), padding=1,
                        use_bias=False, dtype=dt, name="conv0")(x)
            x = nn.leaky_relu(x, 0.2)
            for i, d in enumerate([2, 4, 8]):
                x = nn.Conv(self.ndf * d, (4, 4), strides=(2, 2), padding=1,
                            use_bias=False, dtype=dt, name=f"conv{i + 1}")(x)
                if not self.wasserstein:
                    x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                                     name=f"bn{i + 1}")(x)
                x = nn.leaky_relu(x, 0.2)

        feats = jnp.mean(x, axis=(1, 2))                      # GAP (ref :147)
        if self.vae:
            h = nn.Dense(512, dtype=dt, name="ext_fc1")(feats)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name="ext_bn")(h)
            h = nn.leaky_relu(h, 0.2)
            score = nn.Dense(1, dtype=dt, name="ext_fc2")(h)
            if not self.wasserstein:
                score = jax.nn.sigmoid(score)
            return score, feats
        score = nn.Dense(1, use_bias=False, dtype=dt, name="get_dis")(feats)
        if self.wasserstein:
            return score
        return jax.nn.sigmoid(score)


class VAEDecoder(nn.Module):
    """Deconv decoder (ref generator_gan.py:96-125)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        dt = self.dtype
        h = nn.Dense(16 * 8 * 256, dtype=dt, name="dec_fc")(z)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=dt, name="dec_fc_bn")(h)
        h = nn.leaky_relu(h, 0.2).reshape(-1, 16, 8, 256)
        for i, d in enumerate([256, 128, 32]):
            h = nn.ConvTranspose(d, (6, 6), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=dt,
                                 name=f"dec_deconv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name=f"dec_bn{i}")(h)
        h = nn.Conv(3, (5, 5), padding=2, dtype=dt, name="dec_rgb")(h)
        return jnp.tanh(h)


class VAE(nn.Module):
    """Conv VAE (ref generator_gan.py:57-133); images (128, 64, 3) in [-1,1].

    Returns (mean, var, reconstruction). Sample new images with
    `model.apply(vars, z, train=False, method=VAE.decode)`.
    """
    zdim: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.decoder = VAEDecoder(dtype=self.dtype)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train)

    @nn.compact
    def __call__(self, x, rng, train: bool = True):
        dt = self.dtype
        x = x.astype(dt)
        for i, d in enumerate([64, 128, 256]):
            x = nn.Conv(d, (5, 5), strides=(2, 2), padding=2, use_bias=False,
                        dtype=dt, name=f"enc_conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dt, name=f"enc_bn{i}")(x)
            x = nn.relu(x) if i < 2 else nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(2048, dtype=dt, name="enc_fc")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=dt, name="enc_fc_bn")(x)
        x = nn.relu(x)
        mean = nn.Dense(self.zdim, dtype=dt, name="fc_mean")(x)
        var = nn.Dense(self.zdim, dtype=dt, name="fc_var")(x)
        eps = jax.random.normal(rng, mean.shape, dtype=dt)
        z = mean + var * eps                   # ref :129-131 (var, not std)
        return mean, var, self.decoder(z, train)
