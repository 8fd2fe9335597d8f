"""Probe: bf16 crop->embed handoff at MOT16 load (VERDICT r4 #4 lever 2).

The chunked tracker materializes a (T*cap, 256, 128, 3) normalized-crops
tensor between the crop einsum and the backbone's first conv (~629 MB at
chunk 32 / 50 dets in f32). `TrackerConfig.embed_in_dtype="bfloat16"`
halves that write+read; downstream numerics are bit-identical because the
bf16 embed casts its input anyway (parity test
tests/test_tracking_chunked.py::test_bf16_handoff_identical_for_bf16_embed).

Run on chip:  python scripts/handoff_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401

import bench


def main():
    from reid_tpu.models import build_model

    print("devices:", jax.devices(), flush=True)
    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))
    for dtype in ("float32", "bfloat16"):
        fps = bench.bench_tracking_mot16_load(
            model, variables, embed_in_dtype=dtype)
        print(f"mot16_load embed_in_dtype={dtype}: {fps:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
