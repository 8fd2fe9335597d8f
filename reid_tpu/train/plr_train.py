"""PLR-OSNet dual-branch training (ref `image_reid_train.py:190-260`,
train_plr_osnet): two HybridLoss instances — one per branch (global 4-part
concat 2048-d with classifier1, local 512-d with classifier2) — each with its
own center table and center optimizer; total loss = loss1 + loss2.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..losses import HybridLossState, hybrid_loss, init_hybrid_state, \
    update_dcc_luts
from ..models import build_model
from .state import make_optimizers


class PLRTrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: object
    loss1: HybridLossState      # global branch (2048-d)
    loss2: HybridLossState      # local branch (512-d)
    copt1: object
    copt2: object


def create_plr_train_state(key: jax.Array, cfg: Config,
                           steps_per_epoch: int,
                           input_shape=(2, 256, 128, 3)):
    model = build_model("plr_osnet", num_classes=cfg.model.num_classes,
                        num_cams=cfg.model.num_cams,
                        dtype=jnp.dtype(cfg.model.dtype))
    k1, k2, k3 = jax.random.split(key, 3)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        k1, jnp.zeros(input_shape, jnp.float32))
    tx, center_tx = make_optimizers(cfg, steps_per_epoch)
    l1 = init_hybrid_state(k2, cfg.model.num_classes, 4 * 512)
    l2 = init_hybrid_state(k3, cfg.model.num_classes, 512)
    state = PLRTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        loss1=l1, loss2=l2,
        copt1=center_tx.init(l1.centers),
        copt2=center_tx.init(l2.centers),
    )
    return model, state, tx, center_tx


def make_plr_train_step(cfg: Config, model, tx, center_tx):
    """Ref :219-246: (v1, v2), (y1, y2) = model(x); loss = H1(v1, y1, y) +
    H2(v2, y2, y); separate center optimizers with 1/lamda rescale."""

    def loss_fn(params, c1, c2, state: PLRTrainState, batch):
        (feats, logits), mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], train=True, mutable=["batch_stats"])
        v1, v2 = (f.astype(jnp.float32) for f in feats)
        y1, y2 = (l.astype(jnp.float32) for l in logits)
        labels = batch["labels"]
        l1, aux1 = hybrid_loss(state.loss1._replace(centers=c1), v1, y1,
                               labels, cfg.loss)
        l2, aux2 = hybrid_loss(state.loss2._replace(centers=c2), v2, y2,
                               labels, cfg.loss)
        total = l1 + l2
        return total, (mut["batch_stats"], y1, y2,
                       {"loss1": l1, "loss2": l2})

    @jax.jit
    def step(state: PLRTrainState, batch):
        (loss, (new_bs, y1, y2, aux)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.loss1.centers, state.loss2.centers, state,
            batch)
        gp, gc1, gc2 = grads
        updates, new_opt = tx.update(gp, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        u1, new_copt1 = center_tx.update(gc1, state.copt1,
                                         state.loss1.centers)
        u2, new_copt2 = center_tx.update(gc2, state.copt2,
                                         state.loss2.centers)
        labels = batch["labels"]
        new_l1 = state.loss1._replace(
            centers=state.loss1.centers + u1,
            dcc=update_dcc_luts(state.loss1.dcc, y1, labels,
                                cfg.loss.dcc_momentum))
        new_l2 = state.loss2._replace(
            centers=state.loss2.centers + u2,
            dcc=update_dcc_luts(state.loss2.dcc, y2, labels,
                                cfg.loss.dcc_momentum))
        new_state = PLRTrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, loss1=new_l1, loss2=new_l2,
            copt1=new_copt1, copt2=new_copt2)
        return new_state, {"loss": loss, **aux}

    return step
