"""Round-5 probe: MOT16-load per-method matrix + chunk latency curve.

Runs only the NEW bench extras (VERDICT r4 #3/#7) so the measurement does
not pay for the full bench. Chip required.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench


def main():
    model_t0 = time.time()
    from reid_tpu.models import build_model
    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))
    print(f"init {time.time() - model_t0:.1f}s", flush=True)

    for name, fn in (
        ("mot16_load_default(re-measure)",
         lambda: bench.bench_tracking_mot16_load(model, variables)),
        ("mot16_load_botsort_gmc",
         lambda: bench.bench_tracking_mot16_load(model, variables,
                                                 method="botsort")),
        ("mot16_load_ocsort",
         lambda: bench.bench_tracking_mot16_load(model, variables,
                                                 method="ocsort")),
        ("mot16_load_deepocsort",
         lambda: bench.bench_tracking_mot16_load(model, variables,
                                                 method="deepocsort")),
        ("mot16_load_multistream8",
         lambda: bench.bench_tracking_multistream(
             model, variables, chunk=8, hw=(1080, 1920), n_real=50,
             max_dets=64, max_tracks=128)),
    ):
        t0 = time.time()
        try:
            v = fn()
            print(f"{name}: {v:.1f} fps   ({time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)

    t0 = time.time()
    try:
        curve = bench.bench_latency_chunk_curve(model, variables)
        for k, ms in sorted(curve.items()):
            print(f"chunk{k}: {ms:.3f} ms/frame "
                  f"(batching delay {k*ms:.1f} ms)", flush=True)
        print(f"curve took {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"chunk curve: ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
