"""A/B the greedy assignment variants at the true-MOT16 operating point
(VERDICT r3-closure #9): sequential early-exit greedy vs mutual-min-rounds
(`greedy_assign_rounds`, provably identical matches, ~log rounds instead of
min(T,D) serial argmin trips at crowd density).

Run on the chip: PYTHONPATH=/root/repo python scripts/ab_assignment.py
Prints one JSON line; the winner becomes TrackerConfig's default.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from reid_tpu.models import build_model

    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))

    out = {}
    for name in ("greedy", "greedy_rounds"):
        fps = bench.bench_tracking_mot16_load(model, variables,
                                              assignment=name)
        out[f"mot16_load_fps_{name}"] = round(fps, 1)
        print(f"{name}: {fps:.1f} fps", flush=True)
    # also at the light headline point (16 real dets) where rounds' win
    # should be smaller
    for name in ("greedy", "greedy_rounds"):
        fps = bench.bench_tracking_mot16_load(
            model, variables, n_real=16, max_dets=32, max_tracks=64,
            hw=(480, 640), assignment=name)
        out[f"light_fps_{name}"] = round(fps, 1)
        print(f"light {name}: {fps:.1f} fps", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
