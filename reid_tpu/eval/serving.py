"""Serving-artifact embed path — export AND consume (ORT-session role).

The reference exports the trained backbone to ONNX with a dynamic batch
axis (`reid/train_prepare.py:14-47`) and then runs retrieval inference (and
pseudo-labeling) directly from the artifact through ONNX Runtime
(`image_reid_inference.py:239`, `image_reid_train.py:649-650`).

Here the artifact is a StableHLO module that embeds the WHOLE serving step —
normalization, dual-view TTA flip, L2-normalized [feat || logits] merge —
so a consumer needs no model code, no params, no checkpoint: raw uint8/float
[0,255] crops in, retrieval embeddings out, runnable under jit on any XLA
backend via `jax.export.deserialize`.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..data import ReIDDataset
from ..data.loader import make_eval_loader
from ..data.transforms import inference_batch
from ..train.steps import embed_with_flip, eval_step
from ..utils.export import export_serving_fn, load_serving_fn


def make_embed_fn(state, tta_flip: bool = True, qstate=None) -> Callable:
    """Self-contained serving fn: images [0,255] (B,H,W,3) -> (B, 512+C)
    L2-normalized embeddings — the function the reference freezes into its
    ONNX graph (inference_efficient, image_reid_inference.py:78-135).

    With `qstate` (utils/quantize.QuantState) the backbone's Conv/Dense
    layers execute in int8 — the interception context wraps the traced body,
    so the exported artifact carries the int8 graph."""
    import contextlib

    apply_fn = state.apply_fn
    params = state.params
    batch_stats = state.batch_stats
    if qstate is not None:
        from ..utils.quantize import prune_quantized_kernels
        params = prune_quantized_kernels(params, qstate)

    def embed(images):
        if qstate is not None:
            from ..utils.quantize import quantized_context
            ctx = quantized_context(qstate)
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            x = inference_batch(images)
            if tta_flip:
                return embed_with_flip(apply_fn, params, batch_stats, x)
            f, l = eval_step(apply_fn, params, batch_stats, x)

            def l2n(v):
                return v / jnp.maximum(
                    jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)

            return l2n(jnp.concatenate(
                [l2n(f.astype(jnp.float32)), l2n(l.astype(jnp.float32))],
                axis=1))

    return embed


def export_reid_artifact(state, path: str, height: int, width: int,
                         tta_flip: bool = True,
                         dynamic_batch: bool = True,
                         int8_calib=None, qstate=None) -> bytes:
    """Serialize the full serving step (ref to_onnx, train_prepare.py:14-47).

    `int8_calib`: optional calibration images ([0,255], (N,H,W,3)) — when
    given, the artifact is exported with the backbone post-training
    quantized to int8 (utils/quantize.py; weights ship 4x smaller and the
    v5e serves it ~1.2x faster at >=0.9999 feature cosine). A precomputed
    `qstate` (utils/quantize.QuantState) skips recalibration — calibrate
    once, then serve in-process (`make_int8_embed_fn`) AND export from the
    same scales."""
    if qstate is None and int8_calib is not None:
        qstate = calibrate_serving_qstate(state, int8_calib,
                                          tta_flip=tta_flip)
    embed = make_embed_fn(state, tta_flip=tta_flip, qstate=qstate)
    example = (jnp.zeros((2, height, width, 3), jnp.float32),)
    return export_serving_fn(embed, example, path,
                             dynamic_batch=dynamic_batch)


def calibrate_serving_qstate(state, calib_images, tta_flip: bool = True):
    """Calibrate + quantize through the exact tensors the serving step feeds
    the model: `inference_batch` normalization, and (with TTA) the
    concatenated [normal ; flipped] batch — one jit'd sow pass, not an eager
    per-op walk (matters through the high-latency axon relay)."""
    from ..utils.quantize import calibrate_with_apply, quantize_weights

    x = inference_batch(jnp.asarray(calib_images, jnp.float32))
    if tta_flip:
        x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
    absmax = calibrate_with_apply(
        state.apply_fn,
        {"params": state.params, "batch_stats": state.batch_stats},
        [(x,)], cam=None, train=False)
    return quantize_weights(None, {"params": state.params}, absmax)


def make_int8_embed_fn(state, calib_images=None, tta_flip: bool = True,
                       qstate=None) -> Callable:
    """Jitted int8-quantized serving embed (utils/quantize.py PTQ): calibrate
    the full serving step (normalization + TTA) on `calib_images` ([0,255],
    (N,H,W,3)), then return fn(images) -> embeddings with the backbone's
    Conv/Dense layers in int8. ~1.2x embed throughput on the v5e at >=0.9999
    feature cosine vs the f32 path — the eval-extraction analog of
    `track.py --int8`. A precomputed `qstate` skips recalibration (shared
    scales with `export_reid_artifact`)."""
    import jax

    if qstate is None:
        if calib_images is None:
            raise ValueError("need calib_images or a precomputed qstate")
        qstate = calibrate_serving_qstate(state, calib_images,
                                          tta_flip=tta_flip)
    return jax.jit(make_embed_fn(state, tta_flip=tta_flip, qstate=qstate))


def extract_embeddings_artifact(embed: Callable, dataset: ReIDDataset,
                                batch_size: int) -> np.ndarray:
    """Whole-dataset embeddings through a loaded artifact (ORT-session role;
    ref image_reid_inference.py:239 runs eval from the ONNX session)."""
    feats = []
    for batch in make_eval_loader(dataset, batch_size):
        x = jnp.asarray(batch["images"]).astype(jnp.float32)
        feats.append(np.asarray(embed(x), np.float32))
    return np.concatenate(feats)[: len(dataset)]


__all__ = [
    "make_embed_fn",
    "make_int8_embed_fn",
    "calibrate_serving_qstate",
    "export_reid_artifact",
    "extract_embeddings_artifact",
    "load_serving_fn",
]
