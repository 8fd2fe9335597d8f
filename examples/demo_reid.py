"""Demo: ReID training + retrieval end-to-end on synthetic identities
(no dataset needed). Replaces the reference's REID_DEMO notebooks.

Trains SERes18-IBN with the full hybrid loss on 32 synthetic identities,
then runs the retrieval evaluator — expect rank-1 -> 1.0 within ~60 steps
(a few minutes on one TPU chip).

Run: python examples/demo_reid.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from reid_tpu.config import Config, ModelConfig, TrainConfig
    from reid_tpu.data import augment_batch
    from reid_tpu.eval import evaluate_all
    from reid_tpu.models import build_model
    from reid_tpu.train import create_train_state, make_train_step
    from reid_tpu.train.steps import eval_step

    n_ids, batch, h, w = 32, 64, 256, 128
    cfg = Config(model=ModelConfig(num_classes=n_ids, dtype="bfloat16"),
                 train=TrainConfig(batch_size=batch, num_instances=4,
                                   epochs=30, warmup_epochs=3,
                                   hold_epochs=10))
    model = build_model("seres18", num_classes=n_ids, dtype=jnp.bfloat16)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               steps_per_epoch=8, input_shape=(2, h, w, 3))
    step = make_train_step(cfg)

    rng = np.random.default_rng(0)

    def make_images(ids, noise=25):
        out = np.zeros((len(ids), h, w, 3), np.uint8)
        for n, i in enumerate(ids):
            base = np.zeros((h, w, 3), np.float32)
            base[..., 0] = 60 + (i * 23) % 180
            base[..., 1] = 60 + (i * 57) % 180
            base[..., 2] = 60 + (i * 91) % 180
            base[::(i % 8) + 2, :, :] *= 0.6
            out[n] = np.clip(base + rng.normal(0, noise, base.shape),
                             0, 255).astype(np.uint8)
        return out

    key = jax.random.PRNGKey(1)
    for i in range(60):
        ids = rng.permutation(np.repeat(np.arange(n_ids), 2))[:batch]
        key, k = jax.random.split(key)
        state, metrics = step(state, {
            "images": augment_batch(k, jax.device_put(make_images(ids))),
            "labels": jnp.asarray(ids, jnp.int32),
            "cams": jnp.asarray(ids % 6, jnp.int32),
        })
        if i % 20 == 0:
            print(f"step {i}: loss {float(metrics['loss']):.3f}", flush=True)

    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])

    def embed(imgs):
        f, _ = eval_step(state.apply_fn, state.params, state.batch_stats,
                         (jnp.asarray(imgs, jnp.float32) / 255.0 - mean) / std)
        f = f.astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=1, keepdims=True)

    qids = np.arange(n_ids)
    gids = np.repeat(np.arange(n_ids), 3)
    cmc, mAP = evaluate_all(embed(make_images(qids)), qids,
                            np.zeros(n_ids, int),
                            embed(make_images(gids)), gids,
                            np.ones(len(gids), int), verbose=False)
    print(f"retrieval: rank-1 {cmc[0]:.3f}, mAP {mAP:.3f}")
    assert cmc[0] > 0.9, "expected near-perfect retrieval on separable ids"


if __name__ == "__main__":
    main()
