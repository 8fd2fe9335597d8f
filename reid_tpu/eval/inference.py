"""Retrieval inference/eval orchestration (ref `reid/image_reid_inference.py`).

`run_inference` reproduces the main flow (ref :161-320): gallery + query TTA
embeddings -> merge -> camera de-bias -> (optional Market attribute prior) ->
k-reciprocal Jaccard -> DBSCAN sanity clustering -> tracklet smoothing ->
CMC/mAP, with a plain-Euclidean fallback when re-ranking is disabled.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import ReIDDataset
from ..ops import (
    dbscan_precomputed,
    diminish_camera_bias,
    jaccard_distance,
    smooth_tracklets,
)
from ..train.image_train import extract_embeddings
from .cmc_map import evaluate_all, evaluate_rerank


def run_inference(
    state,
    query: ReIDDataset,
    gallery: ReIDDataset,
    cfg: Config,
    rerank: bool = True,
    use_camera_debias: bool = True,
    use_tracklet_smoothing: bool = True,
    attribute_dist: Optional[np.ndarray] = None,
    verbose: bool = True,
    mesh=None,
    embed_fn=None,
) -> Tuple[np.ndarray, float]:
    """Returns (CMC, mAP). Follows ref image_reid_inference.py main :242-320.

    With a multi-device `mesh`, the N^2 Jaccard re-ranking runs row-sharded
    over the mesh (faiss IndexShards role) — gallery scale grows with chips.

    `embed_fn` (images [0,255] -> embeddings) overrides the checkpoint-backed
    extractor — the path used when serving from a StableHLO artifact
    (ref --onnx, image_reid_inference.py:239); `state` may then be None.
    """
    if embed_fn is not None:
        from .serving import extract_embeddings_artifact
        gf = extract_embeddings_artifact(embed_fn, gallery,
                                         cfg.train.batch_size)
        qf = extract_embeddings_artifact(embed_fn, query,
                                         cfg.train.batch_size)
    else:
        gf = extract_embeddings(state, gallery, cfg.train.batch_size,
                                cfg.retrieval.tta_flip)
        qf = extract_embeddings(state, query, cfg.train.batch_size,
                                cfg.retrieval.tta_flip)

    gl, gc, gs = gallery.labels, gallery.cams, gallery.seqs
    ql, qc, qs = query.labels, query.cams, query.seqs

    if not rerank:
        return evaluate_all(qf, ql, qc, gf, gl, gc, verbose=verbose)

    # merged = [gallery ; query] (ref :270-272)
    merged = np.concatenate([gf, qf])
    cams = np.concatenate([gc, qc])
    n_g = len(gf)

    if use_camera_debias:
        merged = np.asarray(diminish_camera_bias(
            jnp.asarray(merged), jnp.asarray(cams),
            lambda_reg=cfg.retrieval.cam_bias_lambda,
            num_cams=int(cams.max()) + 1))

    sparse_s = cfg.retrieval.rerank_sparse_s or None
    dists = np.asarray(jaccard_distance(
        jnp.asarray(merged), k1=cfg.retrieval.k1, k2=cfg.retrieval.k2,
        mesh=mesh, sparse_s=sparse_s,
        search_option=cfg.retrieval.search_option))

    if attribute_dist is not None:
        dists = dists + attribute_dist

    if use_tracklet_smoothing:
        # DBSCAN over the merged distances -> pseudo groups; tracklet id =
        # seq * num_labels + pseudo label (ref :290-310)
        labels = dbscan_precomputed(
            dists, eps=cfg.retrieval.dbscan_eps,
            min_samples=min(cfg.retrieval.dbscan_min_samples,
                            int(cams.max()) + 2))
        num_labels = int(labels.max()) + 1 if labels.max() >= 0 else 0
        if num_labels > 0:
            seqs = np.concatenate([gs, qs])
            tracklet_ids = np.where(
                labels >= 0, seqs * num_labels + labels, -1)
            merged = np.asarray(smooth_tracklets(
                jnp.asarray(merged), jnp.asarray(tracklet_ids),
                alpha=cfg.retrieval.smooth_tracklet_alpha))
            dists = np.asarray(jaccard_distance(
                jnp.asarray(merged), k1=cfg.retrieval.k1,
                k2=cfg.retrieval.k2, mesh=mesh, sparse_s=sparse_s))

    # query-to-gallery block of the merged distance matrix
    qg = dists[n_g:, :n_g]
    return evaluate_rerank(qg, ql, qc, gl, gc, verbose=verbose)
