"""Experiment: end-to-end tracking quality on a synthetic MOT scene,
scored PER TRACKING METHOD (strongsort / deepocsort / ocsort / bytetrack /
botsort — ref track_yolov5.py:356).

120 frames, 10 targets with crossing linear trajectories, detection noise
(8% dropout, box jitter, false positives), real SERes18 embeddings, scored
with the native CLEAR/Identity metrics. Round-1 single-method baseline on
one TPU v5e: MOTA 90.9 / MOTP 87.9 / IDF1 92.9 / IDSW 2 over 1200 gt boxes.

Run: python examples/experiment_mot_quality.py [method ...]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
from reid_tpu.models import build_model
from reid_tpu.tracking.methods import method_config
from reid_tpu.tracking.pipeline import TrackingPipeline
from reid_tpu.tracking.metrics import evaluate_clear_identity, evaluate_hota

T, N_T, MAX_DETS = 120, 10, 16
H, W = 480, 640

# ---- build the scene ONCE (shared across methods AND with the int8
# quality experiment — examples/_scenes.py keeps the pixels identical)
from _scenes import build_mot_scene

frames, all_tlwh, all_conf, all_valid, gt = build_mot_scene(
    t_total=T, n_t=N_T, max_dets=MAX_DETS, h=H, w=W, seed=0)

# ---- shared embedder
model = build_model("seres18", num_classes=128, dtype=jnp.bfloat16)
v = jax.jit(lambda k, x: model.init(k, x, train=True))(
    jax.random.PRNGKey(0), jnp.zeros((4, 128, 64, 3), jnp.bfloat16))

def embed_fn(params, batch_stats, crops):
    f, l = model.apply({"params": params, "batch_stats": batch_stats},
                       crops.astype(jnp.bfloat16), train=False)
    f = jnp.concatenate([f.astype(jnp.float32), l.astype(jnp.float32)], axis=1)
    return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)

METHODS = sys.argv[1:] or ["strongsort", "deepocsort", "ocsort",
                           "bytetrack", "botsort"]
for method in METHODS:
    cfg = method_config(method, max_tracks=64, max_dets=MAX_DETS, n_init=2,
                        crop_hw=(128, 64))
    pipe = TrackingPipeline(cfg, embed_fn, v["params"], v["batch_stats"],
                            feat_dim=512 + 128)
    t0 = time.time()
    for t in range(T):
        pipe.step(t + 1, frames[t], all_tlwh[t], all_conf[t], all_valid[t])
    hyp = {r["frame"]: (np.asarray(r["tlwh"])[np.asarray(r["valid"])],
                        np.asarray(r["ids"])[np.asarray(r["valid"])])
           for r in pipe.results}
    m = evaluate_clear_identity(gt, hyp)
    m.update({k: vv for k, vv in evaluate_hota(gt, hyp).items()
              if not k.startswith("_")})
    print(f"{method:11s}", {k: round(vv, 2) for k, vv in m.items()},
          f"({time.time() - t0:.0f}s)", flush=True)
print("DONE")
