"""GAN training steps + EMA + LSRO. Ref `gan/synthetic_main.py`, `gan/train_baseline.py`.

Mirrored training policy (ref train_gan :269-398):
  * D step every iteration on real+fake with BCE; labels flipped every 5th
    iteration as regularization (ref :333-352),
  * G step every 3rd iteration (ref :362-378),
  * parameter-EMA shadow of G (ref gan_utils.py:64-95), applied at generation
    time (ref :425-426),
  * per-appearance-group training uses `reid_tpu.ops.kmeans` for the k-means
    split (ref kmeans_.py via get_groups :306-397).

`lsro_loss` is the uniform-label CE for synthetic samples
(ref train_baseline.py:149-179): real samples get standard CE, generated
samples get the uniform distribution over classes.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class GANState(NamedTuple):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    ema_params: Any


def create_gan_state(key: jax.Array, generator, discriminator,
                     nz: int = 100, lr: float = 2e-4,
                     image_shape=(128, 64, 3)) -> Tuple[GANState, Any, Any]:
    kg, kd = jax.random.split(key)
    z = jnp.zeros((2, nz))
    x = jnp.zeros((2, *image_shape))
    gv = jax.jit(lambda k, a: generator.init(k, a, train=True))(kg, z)
    dv = jax.jit(lambda k, a: discriminator.init(k, a, train=True))(kd, x)
    g_tx = optax.adam(lr, b1=0.5, b2=0.999)
    d_tx = optax.adam(lr, b1=0.5, b2=0.999)
    state = GANState(
        step=jnp.zeros((), jnp.int32),
        g_params=gv["params"], g_stats=gv.get("batch_stats", {}),
        d_params=dv["params"], d_stats=dv.get("batch_stats", {}),
        g_opt=g_tx.init(gv["params"]), d_opt=d_tx.init(dv["params"]),
        ema_params=gv["params"],
    )
    return state, g_tx, d_tx


def ema_update(ema, params, decay: float = 0.999):
    """Parameter EMA (ref gan_utils.py:64-95)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def _bce(scores, targets):
    s = jnp.clip(scores.reshape(-1), 1e-6, 1.0 - 1e-6)
    return -jnp.mean(targets * jnp.log(s) + (1 - targets) * jnp.log(1 - s))


def make_dcgan_steps(generator, discriminator, g_tx, d_tx, nz: int = 100,
                     flip_every: int = 5, g_every: int = 3,
                     ema_decay: float = 0.999):
    """Returns one fused jit step: D update (+ conditional G update + EMA)."""

    def d_loss_fn(d_params, state: GANState, real, fake, flip):
        dv = {"params": d_params, "batch_stats": state.d_stats}
        real_s, dmut = discriminator.apply(dv, real, train=True,
                                           mutable=["batch_stats"])
        fake_s, dmut = discriminator.apply(
            {"params": d_params, "batch_stats": dmut["batch_stats"]},
            fake, train=True, mutable=["batch_stats"])
        # label flip regularization every `flip_every` iters (ref :333-352)
        real_t = jnp.where(flip, 0.0, 1.0)
        fake_t = jnp.where(flip, 1.0, 0.0)
        loss = _bce(real_s, real_t) + _bce(fake_s, fake_t)
        return loss, dmut["batch_stats"]

    def g_loss_fn(g_params, state: GANState, z):
        gv = {"params": g_params, "batch_stats": state.g_stats}
        fake, gmut = generator.apply(gv, z, train=True,
                                     mutable=["batch_stats"])
        dv = {"params": state.d_params, "batch_stats": state.d_stats}
        fake_s, _ = discriminator.apply(dv, fake, train=True,
                                        mutable=["batch_stats"])
        return _bce(fake_s, jnp.ones(())), gmut["batch_stats"]

    @jax.jit
    def step(state: GANState, real, key):
        kz1, kz2 = jax.random.split(key)
        z = jax.random.normal(kz1, (real.shape[0], nz))
        gv = {"params": state.g_params, "batch_stats": state.g_stats}
        fake, gmut = generator.apply(gv, z, train=True,
                                     mutable=["batch_stats"])
        fake = jax.lax.stop_gradient(fake)
        flip = (state.step % flip_every) == (flip_every - 1)

        (d_loss, new_dstats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, state, real, fake, flip)
        d_updates, new_dopt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_dparams = optax.apply_updates(state.d_params, d_updates)

        state1 = state._replace(d_params=new_dparams, d_stats=new_dstats,
                                d_opt=new_dopt, g_stats=gmut["batch_stats"])

        def g_update(st):
            z2 = jax.random.normal(kz2, (real.shape[0], nz))
            (g_loss, new_gstats), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(st.g_params, st, z2)
            g_updates, new_gopt = g_tx.update(g_grads, st.g_opt, st.g_params)
            new_gparams = optax.apply_updates(st.g_params, g_updates)
            new_ema = ema_update(st.ema_params, new_gparams, ema_decay)
            return st._replace(g_params=new_gparams, g_stats=new_gstats,
                               g_opt=new_gopt, ema_params=new_ema), g_loss

        def g_skip(st):
            return st, jnp.zeros(())

        do_g = (state.step % g_every) == (g_every - 1)
        state2, g_loss = jax.lax.cond(do_g, g_update, g_skip, state1)
        state2 = state2._replace(step=state.step + 1)
        return state2, {"d_loss": d_loss, "g_loss": g_loss}

    return step


def generate_images(generator, state: GANState, key, n: int, nz: int = 100,
                    use_ema: bool = True, batch: int = 64):
    """Sample n images with the EMA shadow generator (ref :420-451)."""
    params = state.ema_params if use_ema else state.g_params
    gv = {"params": params, "batch_stats": state.g_stats}

    @jax.jit
    def sample(k):
        z = jax.random.normal(k, (batch, nz))
        return generator.apply(gv, z, train=False)

    out = []
    for i in range((n + batch - 1) // batch):
        out.append(jax.device_get(sample(jax.random.fold_in(key, i))))
    import numpy as np
    return np.concatenate(out)[:n]


def make_vaegan_steps(vae, discriminator, vae_tx, d_tx,
                      zdim: int = 128, wasserstein: bool = False,
                      gp_weight: float = 10.0, recon_weight: float = 1.0,
                      kl_weight: float = 1e-3, adv_weight: float = 1e-2):
    """VAE-GAN trainer (ref synthetic_main.py:103-266): the VAE minimizes
    reconstruction + KL + adversarial terms; D discriminates real vs
    reconstruction, optionally Wasserstein with gradient penalty."""

    class VGState(NamedTuple):
        step: jnp.ndarray
        vae_params: Any
        vae_stats: Any
        d_params: Any
        d_stats: Any
        vae_opt: Any
        d_opt: Any

    def init(key, image_shape=(128, 64, 3)):
        kv, kd, kr = jax.random.split(key, 3)
        x = jnp.zeros((2, *image_shape))
        vv = jax.jit(lambda k, a, r: vae.init({"params": k}, a, r,
                                              train=True))(kv, x, kr)
        dv = jax.jit(lambda k, a: discriminator.init(k, a, train=True))(kd, x)
        return VGState(
            step=jnp.zeros((), jnp.int32),
            vae_params=vv["params"], vae_stats=vv.get("batch_stats", {}),
            d_params=dv["params"], d_stats=dv.get("batch_stats", {}),
            vae_opt=vae_tx.init(vv["params"]), d_opt=d_tx.init(dv["params"]),
        )

    def d_score(d_params, d_stats, x):
        out, mut = discriminator.apply(
            {"params": d_params, "batch_stats": d_stats}, x, train=True,
            mutable=["batch_stats"])
        score = out[0] if isinstance(out, tuple) else out
        return score, mut["batch_stats"]

    @jax.jit
    def step(state, real, key):
        k1, k2, k3 = jax.random.split(key, 3)

        def vae_loss(vae_params):
            (mean, var, recon), mut = vae.apply(
                {"params": vae_params, "batch_stats": state.vae_stats},
                real, k1, train=True, mutable=["batch_stats"])
            rec = jnp.mean(jnp.square(recon - real))
            kl = 0.5 * jnp.mean(mean ** 2 + var ** 2
                                - jnp.log(jnp.maximum(var ** 2, 1e-8)) - 1.0)
            score, _ = d_score(state.d_params, state.d_stats, recon)
            if wasserstein:
                adv = -jnp.mean(score)
            else:
                adv = -jnp.mean(jnp.log(jnp.clip(score, 1e-6, 1.0)))
            total = recon_weight * rec + kl_weight * kl + adv_weight * adv
            return total, (rec, kl, mut["batch_stats"], recon)

        (v_loss, (rec, kl, new_vstats, recon)), v_grads = \
            jax.value_and_grad(vae_loss, has_aux=True)(state.vae_params)
        v_updates, new_vopt = vae_tx.update(v_grads, state.vae_opt,
                                            state.vae_params)
        new_vparams = optax.apply_updates(state.vae_params, v_updates)

        fake = jax.lax.stop_gradient(recon)

        def d_loss_fn(d_params):
            rs, ds1 = d_score(d_params, state.d_stats, real)
            fs, ds2 = d_score(d_params, ds1, fake)
            if wasserstein:
                loss = jnp.mean(fs) - jnp.mean(rs)
                # gradient penalty on interpolates (ref WGAN-GP path)
                eps = jax.random.uniform(k2, (real.shape[0], 1, 1, 1))
                inter = eps * real + (1 - eps) * fake

                def score_of(x):
                    s, _ = d_score(d_params, ds2, x)
                    return jnp.sum(s)

                g = jax.grad(score_of)(inter)
                gnorm = jnp.sqrt(jnp.sum(g ** 2, axis=(1, 2, 3)) + 1e-12)
                loss = loss + gp_weight * jnp.mean((gnorm - 1.0) ** 2)
            else:
                loss = (-jnp.mean(jnp.log(jnp.clip(rs, 1e-6, 1.0)))
                        - jnp.mean(jnp.log(jnp.clip(1 - fs, 1e-6, 1.0))))
            return loss, ds2

        (d_loss, new_dstats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, new_dopt = d_tx.update(d_grads, state.d_opt,
                                          state.d_params)
        new_dparams = optax.apply_updates(state.d_params, d_updates)

        new_state = state._replace(
            step=state.step + 1, vae_params=new_vparams,
            vae_stats=new_vstats, d_params=new_dparams, d_stats=new_dstats,
            vae_opt=new_vopt, d_opt=new_dopt)
        return new_state, {"vae_loss": v_loss, "recon": rec, "kl": kl,
                           "d_loss": d_loss}

    return init, step


def lsro_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              is_generated: jnp.ndarray) -> jnp.ndarray:
    """LSRO (ref train_baseline.py:149-179): CE for real samples, uniform
    target distribution for generated ones."""
    n_cls = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    uniform = -jnp.mean(logp, axis=-1)
    gen = is_generated.astype(jnp.float32)
    return jnp.mean((1.0 - gen) * ce + gen * uniform)
