"""Train-step smoke tests: loss decreases on a tiny synthetic ReID problem,
schedules match the reference's shapes, XBM gate works."""

import numpy as np
import jax
import jax.numpy as jnp

from reid_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from reid_tpu.models import build_model
from reid_tpu.train import (
    create_train_state,
    make_train_step,
    warmup_cosine_schedule,
)


def _tiny_cfg(**loss_kw):
    return Config(
        model=ModelConfig(num_classes=4, feat_dim=512),
        loss=LossConfig(**loss_kw),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=4,
                          warmup_epochs=1, hold_epochs=2),
    )


def _synthetic_batch(rng, n=8, n_ids=4, hw=(80, 40)):
    labels = np.repeat(np.arange(n_ids), n // n_ids)
    # images whose mean intensity correlates with identity -> learnable
    images = rng.normal(size=(n, *hw, 3)).astype(np.float32) * 0.1
    images += labels[:, None, None, None] / n_ids
    return {
        "images": jnp.asarray(images),
        "labels": jnp.asarray(labels, jnp.int32),
        "cams": jnp.asarray(labels % 2, jnp.int32),
    }


def test_train_step_decreases_loss(rng):
    cfg = _tiny_cfg()
    model = build_model("seres18", num_classes=4)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2, input_shape=(2, 80, 40, 3))
    step = make_train_step(cfg)
    batch = _synthetic_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_xbm_train_step(rng):
    cfg = _tiny_cfg(xbm=True)
    model = build_model("seres18", num_classes=4)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2, input_shape=(2, 80, 40, 3))
    step = make_train_step(cfg, use_xbm_gate=True)
    batch = _synthetic_batch(rng)
    batch["xbm_active"] = jnp.array(True)
    state, metrics = step(state, batch)
    assert "xbm" in metrics
    assert int(state.xbm.ptr) == 8
    assert np.isfinite(float(metrics["xbm"]))


def test_warmup_cosine_shape():
    sched = warmup_cosine_schedule(1e-3, total_epochs=60, steps_per_epoch=10,
                                   warmup_epochs=10, hold_epochs=30,
                                   eta_min=7e-7)
    # warmup: epoch0 -> warmup_factor*lr = 1% (ref WarmUpScheduler factor
    # 0.01*(1-alpha)+alpha, train_prepare.py:74-76)
    assert abs(float(sched(0)) - 1e-5) < 1e-9
    # mid-warmup, epoch 5: factor = 0.01*0.5 + 0.5 = 0.505
    assert abs(float(sched(5 * 10)) - 0.505e-3) < 1e-9
    # end of warmup / hold region -> base lr
    assert abs(float(sched(10 * 10)) - 1e-3) < 1e-9
    assert abs(float(sched(29 * 10)) - 1e-3) < 1e-9
    # decays toward eta_min at the end
    assert float(sched(59 * 10)) < 1e-4
    assert float(sched(60 * 10 - 1)) >= 7e-7 - 1e-12


def test_vit_sie_train_step(rng):
    """Side-info (SIE) train path: ViT with cam x seq view indices."""
    from reid_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    cfg = Config(
        model=ModelConfig(backbone="vit", num_classes=4, num_cams=4,
                          num_seqs=2, feat_dim=384),
        loss=LossConfig(),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=2,
                          warmup_epochs=1, hold_epochs=1),
    )
    from reid_tpu.models import build_model
    model = build_model("vit", num_classes=4, num_cams=4, num_seqs=2)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2, input_shape=(2, 80, 40, 3))
    step = make_train_step(cfg)
    batch = _synthetic_batch(rng, hw=(80, 40))
    batch["cams"] = jnp.asarray((np.arange(8) % 4) * 2 + np.arange(8) % 2,
                                jnp.int32)  # view indices < 8
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_renorm_model_train_step(rng):
    """BatchRenorm path (--renorm): step counter advances in batch_stats."""
    from reid_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    cfg = Config(
        model=ModelConfig(num_classes=4, renorm=True),
        loss=LossConfig(),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=2,
                          warmup_epochs=1, hold_epochs=1),
    )
    from reid_tpu.models import build_model
    model = build_model("seres18", num_classes=4, renorm=True)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=2, input_shape=(2, 80, 40, 3))
    step = make_train_step(cfg)
    batch = _synthetic_batch(rng)
    state, metrics = step(state, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # renorm step counters advanced
    leaves = jax.tree_util.tree_leaves_with_path(state.batch_stats)
    steps = [v for kp, v in leaves if "steps" in jax.tree_util.keystr(kp)]
    assert steps and all(int(s) == 2 for s in steps)


def test_plr_dual_branch_train_step(rng):
    """PLR-OSNet dedicated dual-branch loop (ref train_plr_osnet)."""
    from reid_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from reid_tpu.train.plr_train import (create_plr_train_state,
                                          make_plr_train_step)
    cfg = Config(
        model=ModelConfig(backbone="plr_osnet", num_classes=4,
                          dtype="float32"),
        loss=LossConfig(),
        train=TrainConfig(batch_size=8, num_instances=2, epochs=2,
                          warmup_epochs=1, hold_epochs=1),
    )
    model, state, tx, ctx = create_plr_train_state(
        jax.random.PRNGKey(0), cfg, steps_per_epoch=2,
        input_shape=(2, 80, 40, 3))
    step = make_plr_train_step(cfg, model, tx, ctx)
    batch = _synthetic_batch(rng, hw=(80, 40))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss1"])) and np.isfinite(float(m["loss2"]))
    assert int(state.step) == 1
    # both center tables updated independently
    assert state.loss1.centers.shape == (4, 2048)
    assert state.loss2.centers.shape == (4, 512)


def test_transformer_optimizer_branch():
    """Transformer backbones invert the optimizer branch (ref
    train_transformer_model: SGD 0.008 under PK vs the CNN loop's Adam)."""
    import optax
    from reid_tpu.config import Config, ModelConfig, TrainConfig
    from reid_tpu.train.state import make_optimizers

    def labels(cfg):
        tx, _ = make_optimizers(cfg, steps_per_epoch=10)
        return tx

    cnn_pk = Config(model=ModelConfig(backbone="seres18"),
                    train=TrainConfig(num_instances=4))
    vit_pk = Config(model=ModelConfig(backbone="vit"),
                    train=TrainConfig(num_instances=4))
    vit_no = Config(model=ModelConfig(backbone="vit"),
                    train=TrainConfig(num_instances=0))
    # all build and initialize against a tiny param tree
    import jax.numpy as jnp
    params = {"w": jnp.zeros((3, 3))}
    for cfg in (cnn_pk, vit_pk, vit_no):
        tx, center_tx = make_optimizers(cfg, 10)
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3, 3))}, state, params)
        assert jnp.all(jnp.isfinite(updates["w"]))
    # adam state (mu/nu) present for cnn_pk and vit_no, absent for vit_pk
    def has_adam(cfg):
        tx, _ = make_optimizers(cfg, 10)
        return "ScaleByAdamState" in str(type(tx.init(params)[1]).__name__) \
            or "adam" in str(tx.init(params)).lower()
    assert has_adam(cnn_pk)
    assert not has_adam(vit_pk)
    assert has_adam(vit_no)


def test_madgrad_matches_pytorch_oracle():
    """Update-parity of train.optim.madgrad vs a NumPy transliteration of
    facebookresearch/madgrad's torch step (the reference's optimizer,
    ref image_reid_train.py:201, video_reid_train.py:115)."""
    import numpy as np
    import jax.numpy as jnp
    from reid_tpu.train.optim import madgrad

    rng = np.random.default_rng(0)
    p0 = {"w": rng.normal(size=(4, 3)).astype(np.float32),
          "b": rng.normal(size=(3,)).astype(np.float32)}
    grads_seq = [
        {"w": rng.normal(size=(4, 3)).astype(np.float32),
         "b": rng.normal(size=(3,)).astype(np.float32)}
        for _ in range(15)
    ]

    def oracle(momentum, wd, lr_fn, eps=1e-6):
        """Torch madgrad step: lamb=lr*sqrt(k+1); s+=lamb*g; v+=lamb*g^2;
        z=x0-s/(v^(1/3)+eps); x=(1-ck)x+ck*z."""
        ck = 1.0 - momentum
        x = {k: v.copy() for k, v in p0.items()}
        x0 = {k: v.copy() for k, v in p0.items()}
        s = {k: np.zeros_like(v) for k, v in p0.items()}
        v = {k: np.zeros_like(vv) for k, vv in p0.items()}
        for k_step, g in enumerate(grads_seq):
            lamb = lr_fn(k_step) * np.sqrt(k_step + 1)
            for key in x:
                gg = g[key] + wd * x[key]
                s[key] = s[key] + lamb * gg
                v[key] = v[key] + lamb * gg * gg
                z = x0[key] - s[key] / (np.cbrt(v[key]) + eps)
                x[key] = (1 - ck) * x[key] + ck * z
        return x

    for momentum, wd, lr in [(0.9, 0.0, 0.01), (0.0, 5e-4, 1e-2),
                             (0.9, 5e-4, 0.05)]:
        tx = madgrad(lr, momentum=momentum, weight_decay=wd)
        params = {k: jnp.asarray(v) for k, v in p0.items()}
        st = tx.init(params)
        for g in grads_seq:
            upd, st = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                                st, params)
            import optax
            params = optax.apply_updates(params, upd)
        exp = oracle(momentum, wd, lambda _: lr)
        for key in exp:
            np.testing.assert_allclose(np.asarray(params[key]), exp[key],
                                       rtol=2e-5, atol=2e-6)

    # schedule-driven lr enters through lamb_k (torch StepLR semantics)
    import optax
    sched = optax.exponential_decay(0.05, transition_steps=5,
                                    decay_rate=0.5, staircase=True)
    tx = madgrad(sched, momentum=0.9)
    params = {k: jnp.asarray(v) for k, v in p0.items()}
    st = tx.init(params)
    for g in grads_seq:
        upd, st = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                            st, params)
        params = optax.apply_updates(params, upd)
    exp = oracle(0.9, 0.0, lambda k: 0.05 * 0.5 ** (k // 5))
    for key in exp:
        np.testing.assert_allclose(np.asarray(params[key]), exp[key],
                                   rtol=2e-5, atol=2e-6)


def test_make_optimizers_plr_madgrad_branch():
    """PLR-OSNet without PK sampling trains with MADGRAD
    (ref image_reid_train.py:201)."""
    from reid_tpu.config import Config, ModelConfig, TrainConfig
    from reid_tpu.train.state import make_optimizers
    import jax.numpy as jnp

    cfg = Config(model=ModelConfig(backbone="plr_osnet"),
                 train=TrainConfig(num_instances=0))
    tx, _ = make_optimizers(cfg, 10)
    params = {"w": jnp.zeros((3, 3))}
    state = tx.init(params)
    assert "Madgrad" in str(state)
    updates, _ = tx.update({"w": jnp.ones((3, 3))}, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))


def test_train_cnn_ckpt_warm_start(tmp_path):
    """--ckpt must actually warm-start training (found by the full-scale
    dress rehearsal: the pretrained chain silently trained from scratch).
    Ref image_reid_train.py:42-45 strict=False load before training."""
    import jax
    import jax.numpy as jnp

    from reid_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from reid_tpu.data import synthetic_dataset
    from reid_tpu.train.image_train import train_cnn
    from reid_tpu.train.state import create_train_state
    from reid_tpu.models import build_model
    from reid_tpu.utils import save_checkpoint

    cfg = Config(model=ModelConfig(num_classes=4, dtype="float32"),
                 train=TrainConfig(batch_size=4, num_instances=2, epochs=0),
                 data=DataConfig(height=80, width=40))
    ds = synthetic_dataset(n=8, num_pids=4, height=80, width=40)
    model = build_model("seres18", num_classes=4)
    st = create_train_state(jax.random.PRNGKey(7), model, cfg, 2,
                            input_shape=(2, 80, 40, 3))
    marked = jax.tree_util.tree_map(lambda x: x * 0 + 0.123, st.params)
    ck = str(tmp_path / "warm")
    save_checkpoint(ck, {"params": marked, "batch_stats": st.batch_stats})

    out, _ = train_cnn(cfg, ds, ckpt=ck)
    leaf = jax.tree_util.tree_leaves(out.params)[0]
    assert abs(float(jnp.ravel(leaf)[0]) - 0.123) < 1e-6
