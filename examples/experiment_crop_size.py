"""Experiment: embed-crop resolution vs tracking quality (fast-crop mode).

The reference's trackers embed 256x128 crops (its ReID models' training
protocol, ref reid_model_factory.py); at the true MOT16 operating point
(50 dets/frame) the 256x128 SERes18 embed dominates the frame budget. A
128x64 "fast-crop" mode cuts embed FLOPs ~4x — this experiment measures
what it costs in MOTA/IDF1/IDSW on the shared synthetic MOT scene, per
tracking method, so the speed/quality trade is documented rather than
asserted (same protocol as examples/experiment_int8_quality.py Part A).

Run: PYTHONPATH=/root/repo python examples/experiment_crop_size.py
     [--quick] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(methods, t_total):
    import jax
    import jax.numpy as jnp

    from _scenes import build_mot_scene
    from reid_tpu.models import build_model
    from reid_tpu.tracking.methods import method_config
    from reid_tpu.tracking.metrics import evaluate_clear_identity
    from reid_tpu.tracking.pipeline import TrackingPipeline

    frames, tlwh, conf, valid, gt = build_mot_scene(t_total=t_total)
    t_total, max_dets = frames.shape[0], tlwh.shape[1]

    model = build_model("seres18", num_classes=128, dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((4, 128, 64, 3), jnp.bfloat16))

    def embed_fn(params, batch_stats, crops):
        f, l = model.apply({"params": params, "batch_stats": batch_stats},
                           crops.astype(jnp.bfloat16), train=False)
        f = jnp.concatenate([f.astype(jnp.float32),
                             l.astype(jnp.float32)], axis=1)
        return f / jnp.maximum(
            jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)

    # (label, crop_hw, crop_downsample): fast-crop shrinks the EMBED,
    # ds2 shrinks the CROP EINSUM input plane (lossless for boxes smaller
    # than 2*crop_hw; this scene's boxes are, like MOT16's)
    variants = (("256x128", (256, 128), 1),
                ("128x64", (128, 64), 1),
                ("256x128ds2", (256, 128), 2))
    results = {}
    for label, crop_hw, ds in variants:
        for method in methods:
            cfg = method_config(method, max_tracks=64, max_dets=max_dets,
                                n_init=2, crop_hw=crop_hw,
                                crop_downsample=ds)
            pipe = TrackingPipeline(cfg, embed_fn, v["params"],
                                    v["batch_stats"], feat_dim=512 + 128)
            t0 = time.time()
            for t in range(t_total):
                pipe.step(t + 1, frames[t], tlwh[t], conf[t], valid[t])
            hyp = {r["frame"]:
                   (np.asarray(r["tlwh"])[np.asarray(r["valid"])],
                    np.asarray(r["ids"])[np.asarray(r["valid"])])
                   for r in pipe.results}
            m = evaluate_clear_identity(gt, hyp)
            results[(method, label)] = m
            print(f"  {label:11s} {method:11s} "
                  f"MOTA {m['MOTA']:6.2f}  IDF1 {m['IDF1']:6.2f}  "
                  f"IDSW {m['IDSW']:.0f} ({time.time()-t0:.0f}s)",
                  flush=True)

    for label, _, _ in variants[1:]:
        print(f"\n{label} deltas vs 256x128:")
        for method in methods:
            b = results[(method, "256x128")]
            q = results[(method, label)]
            print(f"  {method:11s} dMOTA {q['MOTA'] - b['MOTA']:+6.2f}  "
                  f"dIDF1 {q['IDF1'] - b['IDF1']:+6.2f}  "
                  f"dIDSW {q['IDSW'] - b['IDSW']:+.0f}")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser("experiment_crop_size")
    p.add_argument("--platform", default="")
    p.add_argument("--quick", action="store_true",
                   help="2 methods, 24 frames (plumbing smoke)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    t0 = time.time()
    if args.quick:
        main(("strongsort", "bytetrack"), 24)
    else:
        main(("strongsort", "deepocsort", "ocsort", "bytetrack", "botsort"),
             120)
    print(f"\nDONE in {time.time() - t0:.0f}s")
