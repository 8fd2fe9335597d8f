"""jit train / eval steps.

The hot loop of ref `image_reid_train.py:75-97` as one pure donated-buffer
function: forward (mutable batch_stats) -> hybrid loss -> grads for model
params AND centers -> clipped model update + rescaled center update ->
DCC lut momentum update (the reference does this inside the loss backward).

XBM variant mirrors `image_reid_train_xbm.py:88-92`: after the warm-up epoch
gate the WRT triplet runs against the ring-buffer memory as well.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..losses import (
    hybrid_loss,
    update_dcc_luts,
    xbm_enqueue,
    xbm_triplet_loss,
)
from .state import ReIDTrainState


def make_train_step(cfg: Config, use_xbm_gate: bool = False):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: dict(images (B,H,W,3) float, labels (B,) int32,
                cams (B,) int32 [optional], xbm_active () bool [optional]).
    """

    def loss_fn(params, centers, state: ReIDTrainState, batch):
        variables = {"params": params, "batch_stats": state.batch_stats}
        dropout_rng = jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.seed), state.step)
        images = batch["images"]
        if images.dtype == jnp.uint8:
            # fused path: raw uint8 crops + per-step key -> the full
            # augmentation chain runs inside the same program as the forward
            # (one dispatch per step instead of two).
            from ..data.transforms import augment_batch
            aug_key = batch.get(
                "aug_key",
                jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed + 1),
                                   state.step))
            images = augment_batch(
                aug_key, images, pad=cfg.data.pad,
                flip_prob=cfg.data.flip_prob,
                erase_prob=cfg.data.random_erasing_prob)
            batch = {**batch, "images": images}
        # cams feed the camera-bias (cam_factor, SERes18) or the SIE view
        # embedding (ViT/Swin side-info models).
        use_cam = cfg.model.cam_factor > 0 or cfg.model.backbone in (
            "vit", "swin_v1", "swin_v2")
        (feature, logits), mutated = state.apply_fn(
            variables, batch["images"],
            cam=batch.get("cams") if use_cam else None,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        feature = feature.astype(jnp.float32)
        logits = logits.astype(jnp.float32)
        loss_state = state.loss_state._replace(centers=centers)
        total, aux = hybrid_loss(
            loss_state, feature, logits, batch["labels"], cfg.loss,
            weights=batch.get("weights"),
        )
        if use_xbm_gate and state.xbm is not None:
            xbm_l = xbm_triplet_loss(feature, batch["labels"], state.xbm)
            active = batch.get("xbm_active", jnp.array(True))
            total = total + jnp.where(active, xbm_l, 0.0)
            aux["xbm"] = xbm_l
        return total, (aux, mutated["batch_stats"], feature, logits)

    @jax.jit
    def train_step(state: ReIDTrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (aux, new_bs, feature, logits)), (gparams, gcenters) = grad_fn(
            state.params, state.loss_state.centers, state, batch
        )
        updates, new_opt = state.tx.update(gparams, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        cupdates, new_copt = state.center_tx.update(
            gcenters, state.center_opt_state, state.loss_state.centers
        )
        new_centers = state.loss_state.centers + cupdates

        # DCC tables run in logit space (see losses/hybrid.py).
        new_dcc = update_dcc_luts(
            state.loss_state.dcc, logits, batch["labels"],
            momentum=cfg.loss.dcc_momentum,
        ) if cfg.loss.use_dcc else state.loss_state.dcc

        new_xbm = state.xbm
        if use_xbm_gate and state.xbm is not None:
            new_xbm = xbm_enqueue(state.xbm, feature, batch["labels"])

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            loss_state=state.loss_state._replace(
                centers=new_centers, dcc=new_dcc
            ),
            center_opt_state=new_copt,
            xbm=new_xbm,
        )
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    return train_step


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def eval_step(apply_fn, params, batch_stats, images, cams=None):
    """Eval forward: returns (bnneck_feature, logits) (ref model eval path)."""
    variables = {"params": params, "batch_stats": batch_stats}
    return apply_fn(variables, images, cam=cams, train=False)


def embed_with_flip(apply_fn, params, batch_stats, images, cams=None):
    """Dual-pass TTA embedding: concat(normal, horizontally-flipped) through
    one forward, embeddings = [l2n(feat) || l2n(logits)] averaged over the two
    views — ref image_reid_inference.py:78-135 (inference_efficient).
    """
    both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
    feats, logits = eval_step(apply_fn, params, batch_stats, both,
                              None if cams is None
                              else jnp.concatenate([cams, cams]))
    b = images.shape[0]

    def l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    if isinstance(logits, tuple):
        # dual-head models (PLR-OSNet): the reference's eval path returns
        # the concatenated part feature ONLY (ref plr_osnet.py:107-110) —
        # no logits concat
        emb = l2n(feats.astype(jnp.float32))
    else:
        emb = jnp.concatenate([l2n(feats.astype(jnp.float32)),
                               l2n(logits.astype(jnp.float32))], axis=1)
    merged = 0.5 * (emb[:b] + emb[b:])
    return l2n(merged)
