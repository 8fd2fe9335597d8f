"""GAN training drivers — per-group DCGAN, VAE-GAN, LSRO baseline.

These compose the pieces in `gan/train.py` / `gan/models.py` /
`ops/kmeans.py` into the reference's top-level training programs:

  * `get_groups`:          ref `gan/kmeans_.py:16-49` (ResNet50 GAP features
    -> faiss/sklearn k-means). Zero-egress note: no pretrained ImageNet
    weights are available here, so the default representation is a jitted
    pyramid of pooled color statistics; any `embed_fn(images)->(N,D)`
    (e.g. a converted torch backbone via `utils.torch_convert`) can be
    plugged in for reference-equivalent grouping.
  * `train_gan_groups`:    ref `gan/synthetic_main.py:279-397` — ONE
    generator/discriminator pair trained sequentially over the k appearance
    groups (the reference reuses `netG`/`netD` across groups), a FRESH
    parameter-EMA per group, and a per-group generator checkpoint
    (`Generate_model_trained_group{g}.pt` role).
  * `train_vaegan`:        ref `gan/synthetic_main.py:103-266` (`--vae`,
    `--Wassertein`, `--gp`).
  * `train_lsro_baseline`: ref `gan/train_baseline.py:214-303` — baseline
    classifier over real + generated images where generated samples carry
    flag=1 and receive the LSRO uniform-label loss; accuracy is tracked on
    real samples only (ref :264-267 sets generated preds to -1).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import VAE, Discriminator, Generator
from .train import (GANState, create_gan_state, generate_images, lsro_loss,
                    make_dcgan_steps, make_vaegan_steps)


# ---------------------------------------------------------------------------
# appearance grouping (ref kmeans_.py)
# ---------------------------------------------------------------------------

def _default_repres(images: jnp.ndarray) -> jnp.ndarray:
    """Pooled color-statistic pyramid as the grouping representation.

    Stands in for the reference's ImageNet ResNet50 GAP features
    (kmeans_.py:16-34) when no pretrained weights are available: average
    pools at 3 scales capture the color/layout statistics that dominate
    appearance clusters on person crops.
    """
    x = images.astype(jnp.float32)
    if x.ndim != 4:
        raise ValueError(f"expected (N,H,W,3), got {x.shape}")
    feats = []
    for grid in ((1, 1), (4, 2), (8, 4)):
        gh, gw = grid
        n, h, w, c = x.shape
        ph, pw = h // gh, w // gw
        v = x[:, : gh * ph, : gw * pw, :].reshape(n, gh, ph, gw, pw, c)
        feats.append(v.mean(axis=(2, 4)).reshape(n, -1))
    f = jnp.concatenate(feats, axis=1)
    return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-6)


def make_resnet_embed_fn(torch_ckpt: str):
    """Reference-equivalent grouping representation: GAP features from a
    torchvision ResNet50 trunk converted from a local torch checkpoint
    (ref kmeans_.py:16-34 loads IMAGENET1K_V2 resnet50 from the hub).
    Returns an `embed_fn(images [-1,1] or uint8) -> (N, 2048)` for
    `get_groups(..., embed_fn=...)`."""
    from ..models.baseline import ResNetReID
    from ..utils.torch_convert import (convert_torchvision_resnet,
                                       load_torch_state_dict)

    model = ResNetReID(num_classes=1, block="bottleneck",
                       blocks=(3, 4, 6, 3), pooling="avg", bottleneck_dim=0)
    variables = jax.jit(lambda kk, x: model.init(kk, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 64, 3)))
    variables = convert_torchvision_resnet(
        load_torch_state_dict(torch_ckpt), variables,
        blocks=(3, 4, 6, 3), bottleneck=True)

    def embed_fn(images):
        x = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            x = x / 127.5 - 1.0
        feat, _ = model.apply(variables, x, train=False)
        return feat

    return embed_fn


def get_groups(images: np.ndarray, k: int, key: Optional[jax.Array] = None,
               embed_fn: Optional[Callable] = None,
               batch: int = 256) -> np.ndarray:
    """Per-image appearance-group labels in [0, k). Ref kmeans_.py:47-49."""
    from ..ops.kmeans import kmeans

    if key is None:
        key = jax.random.PRNGKey(0)
    fn = jax.jit(embed_fn or _default_repres)
    reps = []
    for s in range(0, len(images), batch):
        reps.append(np.asarray(fn(jnp.asarray(images[s:s + batch]))))
    reps = np.concatenate(reps)
    labels, _ = kmeans(key, jnp.asarray(reps), k=k)
    return np.asarray(labels)


# ---------------------------------------------------------------------------
# per-group DCGAN driver (ref synthetic_main.py:279-397)
# ---------------------------------------------------------------------------

def _epoch_batches(n: int, bs: int, rng: np.random.Generator):
    order = rng.permutation(n)
    for s in range(0, n - bs + 1, bs):
        yield order[s:s + bs]


def _as_pm1(batch: np.ndarray) -> np.ndarray:
    """Normalize a uint8 image batch to [-1, 1] float32 (pass floats through).

    Keeping the full dataset uint8 in host RAM and normalizing per batch here
    keeps gan_main/lsro_main at ~1/4 the resident size (Market1501 train+
    gallery as float32 is ~3 GB on this single-host setup)."""
    if batch.dtype == np.uint8:
        return batch.astype(np.float32) / 127.5 - 1.0
    return np.asarray(batch, np.float32)


def train_gan_groups(
    images: np.ndarray,
    groups: Optional[np.ndarray] = None,
    k: int = 1,
    epochs: int = 20,
    batch_size: int = 64,
    nz: int = 100,
    ngf: int = 64,
    ndf: int = 64,
    lr: float = 2e-4,
    seed: int = 0,
    checkpoint_dir: str = "",
    log_fn: Callable[[str], None] = print,
) -> Tuple[GANState, List[GANState]]:
    """Train one G/D pair sequentially over k appearance groups.

    Returns (final_state, per_group_states) where each per-group state
    carries that group's EMA shadow (ref emaGs list, synthetic_main.py:397).
    Saves `gan_group{g}` orbax checkpoints under `checkpoint_dir` when given
    (ref `checkpoint/Generate_model_trained_group{g}.pt`).
    """
    images = np.asarray(images)
    if groups is None:
        groups = np.zeros(len(images), np.int64)
    gen = Generator(nz=nz, ngf=ngf)
    disc = Discriminator(ndf=ndf)
    state, g_tx, d_tx = create_gan_state(
        jax.random.PRNGKey(seed), gen, disc, nz=nz,
        lr=lr, image_shape=images.shape[1:])
    step = make_dcgan_steps(gen, disc, g_tx, d_tx, nz=nz)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    group_states: List[GANState] = []
    for g in range(k):
        idx = np.flatnonzero(groups == g)
        if len(idx) < batch_size:
            # no state for a skipped group (a previous group's generator
            # must not silently stand in for it downstream)
            log_fn(f"group {g}: only {len(idx)} images (<bs); skipping")
            group_states.append(None)
            continue
        # fresh EMA per group (ref :309 re-registers EMA each group)
        state = state._replace(ema_params=state.g_params)
        log_fn(f"Starting training loop for group {g} "
               f"({len(idx)} images)...")
        metrics = {"d_loss": jnp.zeros(()), "g_loss": jnp.zeros(())}
        for epoch in range(epochs):
            for b in _epoch_batches(len(idx), batch_size, rng):
                real = jnp.asarray(_as_pm1(images[idx[b]]))
                key, kk = jax.random.split(key)
                state, metrics = step(state, real, kk)
            log_fn(f"[group {g}] epoch {epoch}: "
                   f"d={float(metrics['d_loss']):.3f} "
                   f"g={float(metrics['g_loss']):.3f}")
        group_states.append(state)
        if checkpoint_dir:
            from ..utils import save_checkpoint
            save_checkpoint(os.path.join(checkpoint_dir, f"gan_group{g}"),
                            state)
    return state, group_states


def generate_group_images(group_states: Sequence[GANState], n_per_group: int,
                          nz: int = 100, ngf: int = 64, seed: int = 2,
                          use_ema: bool = True) -> np.ndarray:
    """Sample n images from each group's EMA generator (ref generate(),
    synthetic_main.py:420-451); returns (k*n, H, W, 3) in [-1, 1]."""
    gen = Generator(nz=nz, ngf=ngf)
    out = []
    for g, st in enumerate(group_states):
        if st is None:  # group skipped during training (too few images)
            continue
        out.append(generate_images(gen, st, jax.random.PRNGKey(seed + g),
                                   n_per_group, nz=nz, use_ema=use_ema))
    if not out:
        raise ValueError("no trained groups to sample from "
                         "(every group was skipped)")
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# VAE-GAN driver (ref synthetic_main.py:103-266)
# ---------------------------------------------------------------------------

def train_vaegan(
    images: np.ndarray,
    epochs: int = 20,
    batch_size: int = 64,
    zdim: int = 128,
    lr: float = 2e-4,
    wasserstein: bool = False,
    gp_weight: float = 10.0,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
):
    """Train the VAE-GAN; returns (vae, state). Sample via `sample_vaegan`."""
    import optax

    images = np.asarray(images)
    if len(images) < batch_size:
        raise ValueError(
            f"train_vaegan: {len(images)} images < batch_size {batch_size}; "
            "no batch would ever run")
    vae = VAE(zdim=zdim)
    disc = Discriminator(wasserstein=wasserstein)
    vae_tx = optax.adam(lr, b1=0.5, b2=0.999)
    d_tx = optax.adam(lr, b1=0.5, b2=0.999)
    init, step = make_vaegan_steps(vae, disc, vae_tx, d_tx, zdim=zdim,
                                   wasserstein=wasserstein,
                                   gp_weight=gp_weight)
    state = init(jax.random.PRNGKey(seed), image_shape=images.shape[1:])
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    metrics = {}
    for epoch in range(epochs):
        for b in _epoch_batches(len(images), batch_size, rng):
            key, kk = jax.random.split(key)
            state, metrics = step(state, jnp.asarray(_as_pm1(images[b])), kk)
        log_fn(f"epoch {epoch}: vae={float(metrics['vae_loss']):.3f} "
               f"recon={float(metrics['recon']):.3f} "
               f"d={float(metrics['d_loss']):.3f}")
    return vae, state


def sample_vaegan(vae: VAE, state, n: int, zdim: int = 128,
                  seed: int = 3, batch: int = 64) -> np.ndarray:
    """Decode prior samples to images in [-1, 1] (ref generate() --vae)."""
    gv = {"params": state.vae_params, "batch_stats": state.vae_stats}

    @jax.jit
    def dec(k):
        z = jax.random.normal(k, (batch, zdim))
        return vae.apply(gv, z, train=False, method=VAE.decode)

    out = []
    for i in range((n + batch - 1) // batch):
        out.append(np.asarray(dec(jax.random.PRNGKey(seed + i))))
    return np.concatenate(out)[:n]


# ---------------------------------------------------------------------------
# LSRO baseline trainer (ref train_baseline.py:214-303)
# ---------------------------------------------------------------------------

def train_lsro_baseline(
    real_images: np.ndarray,
    real_labels: np.ndarray,
    gen_images: np.ndarray,
    num_classes: int,
    epochs: int = 5,
    batch_size: int = 32,
    lr: float = 1e-3,
    backbone: str = "baseline",
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
):
    """Baseline classifier over real + synthetic images with the LSRO loss.

    Generated samples carry flag=1, a dummy label, and receive the uniform
    target distribution (ref dcganDataset flags, train_baseline.py:92-146);
    per-epoch accuracy counts real samples only (ref :264-267). Returns
    (state, history) with history rows {"loss", "acc"}.
    """
    import optax

    from ..models import build_model

    real_images = np.asarray(real_images)
    gen_images = np.asarray(gen_images)
    if real_images.dtype != gen_images.dtype:
        real_images = _as_pm1(real_images)
        gen_images = _as_pm1(gen_images)
    n_real, n_gen = len(real_images), len(gen_images)
    images = np.concatenate([real_images, gen_images])
    labels = np.concatenate([np.asarray(real_labels, np.int64),
                             np.zeros(n_gen, np.int64)])
    flags = np.concatenate([np.zeros(n_real, np.float32),
                            np.ones(n_gen, np.float32)])

    model = build_model(backbone, num_classes=num_classes)
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=True)
    )(jax.random.PRNGKey(seed), jnp.zeros((2, *images.shape[1:])))
    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(variables["params"])
    batch_stats = variables.get("batch_stats", {})
    params = variables["params"]

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, labs, flgs):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, imgs,
                train=True, mutable=["batch_stats"])
            logits = out[1] if isinstance(out, tuple) else out
            loss = lsro_loss(logits, labs, flgs)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        preds = jnp.argmax(logits, axis=-1)
        # real-only accuracy (ref :264-267 masks generated preds to -1)
        real = 1.0 - flgs
        correct = jnp.sum((preds == labs) * real)
        return new_params, new_stats, new_opt, loss, correct, jnp.sum(real)

    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        tot_loss = tot_correct = tot_real = 0.0
        nb = 0
        for b in _epoch_batches(len(images), batch_size, rng):
            params, batch_stats, opt_state, loss, correct, n = step(
                params, batch_stats, opt_state,
                jnp.asarray(_as_pm1(images[b])), jnp.asarray(labels[b]),
                jnp.asarray(flags[b]))
            tot_loss += float(loss)
            tot_correct += float(correct)
            tot_real += float(n)
            nb += 1
        acc = tot_correct / max(tot_real, 1.0)
        history.append({"loss": tot_loss / max(nb, 1), "acc": acc})
        log_fn(f"epoch {epoch}: loss={history[-1]['loss']:.4f} acc={acc:.4f}")
    return {"params": params, "batch_stats": batch_stats}, history
