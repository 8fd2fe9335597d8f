"""Benchmark: ReID crop embedding throughput per chip (the driver's headline
metric: crops/sec/chip).

Baseline: the reference's SE-Dense-ResNet18 extractor runs at 17 ms/frame on
a Tesla P100 (README.md:82-84, CUDA-synchronized) ≈ 58.8 crops/sec. We bench
the same role — SERes18-IBN eval forward over (256, 128) crops, bfloat16,
steady-state, batch 256 — on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CROPS_PER_SEC = 1000.0 / 17.0  # ref README.md:82-84 (P100)


def main():
    from reid_tpu.models import build_model

    batch = 256
    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 256, 128, 3)),
        jnp.bfloat16,
    )
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), x
    )

    @jax.jit
    def embed(v, images):
        feat, _ = model.apply(v, images, train=False)
        return feat

    # compile + warmup; NOTE: on the axon tunnel `block_until_ready` does not
    # reliably fence remote execution, so sync via device_get of a reduction
    # over an accumulated dependency chain.
    def run(iters):
        acc = None
        t0 = time.perf_counter()
        for _ in range(iters):
            f = embed(variables, x)
            acc = f if acc is None else acc + f
        float(jnp.sum(acc))  # device_get forces completion of the chain
        return time.perf_counter() - t0

    run(3)  # compile + warmup
    iters = 30
    dt = min(run(iters) for _ in range(3))

    crops_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "reid_embed_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
