"""Train state: params + batch_stats + two optimizers + loss state.

The reference trains the model with Adam/SGD and the center-loss centers with
a *separate* SGD(lr=0.5), after rescaling center grads by 1/lamda
(ref image_reid_train.py:49,92-95). Here that is one flax TrainState whose
pytree carries both param groups and both optax states, all inside one jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..losses import HybridLossState, XBMState, init_hybrid_state, init_xbm
from .schedules import warmup_cosine_schedule


@flax.struct.dataclass
class ReIDTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_state: HybridLossState
    center_opt_state: Any
    xbm: Optional[XBMState]

    # static (non-pytree) fields
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    center_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def make_optimizers(cfg: Config, steps_per_epoch: int):
    """Model optimizer, per reference branch:

    * CNN loops (train_cnn, ref image_reid_train.py:51-56): Adam(3.5e-4,
      wd 5e-4) under PK sampling else SGD-nesterov(0.01), global-norm
      clip 10 (ref :87), WarmUpCosine schedule.
    * transformer loop (train_transformer_model, ref :271-277): the
      branch is INVERTED — plain SGD(0.008, wd 1e-4) under PK sampling
      else Adam(0.01, wd 1e-4), WarmUpCosine.
    * PLR-OSNet loop (train_plr_osnet, ref :196-201): Adam(3.5e-4) under
      PK sampling else MADGRAD(0.01, wd 5e-4, momentum 0.9 default).

    Centers: SGD(0.5) with 1/lamda grad rescale (ref :310-312).
    """
    transformer = cfg.model.backbone in ("vit", "swin_v1", "swin_v2")
    plr = cfg.model.backbone == "plr_osnet"
    if transformer:
        base_lr = 0.008 if cfg.train.num_instances > 0 else 0.01
        wd = 1e-4
    else:
        base_lr, wd = cfg.train.lr, cfg.train.weight_decay
    schedule = warmup_cosine_schedule(
        base_lr, cfg.train.epochs, steps_per_epoch,
        cfg.train.warmup_epochs, cfg.train.hold_epochs, cfg.train.eta_min,
    )
    use_adam = (cfg.train.num_instances > 0) != transformer
    if plr and cfg.train.num_instances <= 0:
        # ref image_reid_train.py:201 (madgrad L2 goes into the grad, like
        # torch.optim.Adam's weight_decay — handled inside the transform)
        from .optim import madgrad
        plr_schedule = warmup_cosine_schedule(
            0.01, cfg.train.epochs, steps_per_epoch,
            cfg.train.warmup_epochs, cfg.train.hold_epochs,
            cfg.train.eta_min)
        opt = madgrad(plr_schedule, momentum=0.9, weight_decay=5e-4)
    elif use_adam:
        # torch.optim.Adam(weight_decay=...) is L2-into-grad, NOT decoupled
        # AdamW — match the reference exactly (image_reid_train.py:53).
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.adam(schedule),
        )
    elif transformer:
        # plain SGD, no momentum (ref :274)
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(schedule),
        )
    else:
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(schedule, momentum=0.9, nesterov=True),
        )
    tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip), opt)
    center_tx = optax.chain(
        optax.scale(1.0 / cfg.loss.center_lamda),
        optax.sgd(cfg.train.center_lr),
    )
    return tx, center_tx


def create_train_state(
    key: jax.Array,
    model,
    cfg: Config,
    steps_per_epoch: int,
    input_shape=(2, 256, 128, 3),
) -> ReIDTrainState:
    k_init, k_drop, k_loss = jax.random.split(key, 3)
    dummy = jnp.zeros(input_shape, jnp.float32)
    # jit the init: eager init dispatches hundreds of op-by-op compiles —
    # ~60 s on a 1-CPU host and minutes through a high-latency TPU relay
    variables = jax.jit(
        lambda ks, x: model.init(ks, x, train=True)
    )({"params": k_init, "dropout": k_drop}, dummy)
    tx, center_tx = make_optimizers(cfg, steps_per_epoch)
    loss_state = init_hybrid_state(
        k_loss, cfg.model.num_classes, cfg.model.feat_dim
    )
    xbm = None
    if cfg.loss.xbm:
        xbm = init_xbm(cfg.loss.xbm_size_mult * cfg.train.batch_size,
                       cfg.model.feat_dim)
    return ReIDTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        loss_state=loss_state,
        center_opt_state=center_tx.init(loss_state.centers),
        xbm=xbm,
        apply_fn=model.apply,
        tx=tx,
        center_tx=center_tx,
    )
