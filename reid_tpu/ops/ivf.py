"""IVF approximate nearest-neighbor search — the faiss IVF role, TPU-native.

The reference exposes faiss `search_option` 0-3 incl. IVF index paths for
big galleries (ref `reid/faiss_utils.py:158-181`: GpuIndexIVFFlat with
nlist/nprobe); only brute force existed here before. This module adds the
IVF structure in XLA-friendly form:

  * train:  k-means coarse quantizer (`ops.kmeans`) over the gallery,
    then a HOST-side reorder of the gallery into equal-size padded cluster
    buckets (C, B, D) — the one irregular step, done once per index build.
  * search: query->centroid distances (one MXU matmul), top-nprobe cluster
    ids per query block, ONE gather of (block, nprobe*B) bucket rows, then
    exact blocked distances + top-k over the gathered candidates.

Design notes (TPU): buckets are padded to the max cluster size so every
shape is static; the per-block gather is the only non-matmul op and moves
nprobe*B*D floats per query block (~8x less HBM traffic than brute force
at nprobe/nlist = 1/8). Exact when nprobe == nlist (every bucket probed;
padding rows carry +inf distance).

MEASURED CAVEAT (v5e, 2026-08-18, ROUND_NOTES "Large-gallery scaling"):
the traffic win does NOT translate to wall-clock on TPU — the bucket
gather is lane-hostile and ivf_topk loses to the brute-force blocked
matmul (`topk_neighbors`) by 5-8x at N=50k-100k (0.35-0.43 s vs
0.056-0.068 s per 4096 queries, recall@1 1.0/recall@20 0.98 at nprobe=8),
and the padded (C, B, D) bucket tensor OOMs HBM near N=200k under cluster
skew. This module is kept for the faiss `search_option` 3 API role and
host-memory-constrained serving; `ops/policy.py` never auto-selects it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class IVFIndex(NamedTuple):
    centroids: jnp.ndarray   # (C, D)
    buckets: jnp.ndarray     # (C, B, D) gallery rows, padded
    bucket_ids: jnp.ndarray  # (C, B) original gallery row ids; -1 = pad
    n: int                   # true gallery size


def build_ivf(key: jax.Array, gallery: jnp.ndarray, nlist: int = 64,
              iters: int = 25, max_imbalance: float = 4.0) -> IVFIndex:
    """Train the coarse quantizer and bucket the gallery (host reorder).

    Buckets are padded to the LARGEST cluster, so a skewed clustering would
    make the (C, B, D) tensor approach C x n and `ivf_topk` would gather
    nprobe*B rows per query — worse than brute force. Clusters larger than
    `max_imbalance * n/nlist` are therefore re-split with a tiny 2-means
    (bounded at 4*nlist total lists); a warning is emitted if balance still
    cannot be reached (e.g. many identical rows). The returned index may
    hold more than `nlist` lists — probe `len(index.centroids)` for an
    exact search.
    """
    import warnings

    from .kmeans import kmeans

    labels, centroids = kmeans(key, gallery, k=nlist, iters=iters)
    labels = np.asarray(labels)
    g = np.asarray(gallery)
    groups = [np.nonzero(labels == c)[0] for c in range(nlist)]

    target = max(max_imbalance * len(g) / max(nlist, 1), 1.0)
    rng = np.random.default_rng(0)  # split seeding: kmeans consumed `key`
    unsplittable: set = set()
    while len(groups) < 4 * nlist:
        big = max(range(len(groups)), key=lambda i: len(groups[i]))
        if len(groups[big]) <= target or big in unsplittable:
            break
        idx = groups[big]
        pts = g[idx].astype(np.float64)
        # tiny host 2-means to halve the oversized cluster
        seeds = pts[rng.choice(len(pts), 2, replace=False)]
        for _ in range(8):
            assign = (((pts[:, None, :] - seeds[None]) ** 2).sum(-1)
                      .argmin(1))
            if assign.min() == assign.max():
                break
            seeds = np.stack([pts[assign == j].mean(0) for j in (0, 1)])
        if assign.min() == assign.max():  # identical rows: cannot split
            unsplittable.add(big)
            continue
        groups[big] = idx[assign == 0]
        groups.append(idx[assign == 1])
        unsplittable.discard(big)

    sizes = np.asarray([len(gr) for gr in groups])
    if sizes.max() > target:
        warnings.warn(
            f"build_ivf: largest list holds {int(sizes.max())} of {len(g)} "
            f"rows after re-splitting (> {max_imbalance}x the n/nlist "
            "average); ivf_topk will gather near-brute-force volumes — "
            "consider brute-force topk_neighbors for this gallery")

    b = max(int(sizes.max()), 1)
    c, d = len(groups), g.shape[1]
    buckets = np.zeros((c, b, d), g.dtype)
    ids = np.full((c, b), -1, np.int32)
    cents = np.zeros((c, d), np.float32)
    for ci, idx in enumerate(groups):
        buckets[ci, : len(idx)] = g[idx]
        ids[ci, : len(idx)] = idx
        cents[ci] = (g[idx].mean(0) if len(idx)
                     else np.asarray(centroids)[min(ci, nlist - 1)])
    return IVFIndex(jnp.asarray(cents), jnp.asarray(buckets),
                    jnp.asarray(ids), g.shape[0])


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "block_q"))
def ivf_topk(index: IVFIndex, query: jnp.ndarray, k: int,
             nprobe: int = 8, block_q: int = 256
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest gallery rows per query (squared Euclidean, ascending).

    Returns (dists (Q, k), idx (Q, k)) with idx into the ORIGINAL gallery
    order; approximate unless nprobe == nlist.
    """
    q, d = query.shape
    c, b, _ = index.buckets.shape
    nprobe = min(nprobe, c)
    # bound the gathered candidate block (block_q, nprobe*B, D) f32 to
    # ~1 GB — at nprobe=64, B=300, D=1280 the default block_q=256 would
    # materialize ~25 GB and OOM HBM (all static ints at trace time)
    per_query_bytes = 4 * nprobe * b * d
    block_q = max(8, min(block_q, int(1e9 // max(per_query_bytes, 1))))
    qp = ((q + block_q - 1) // block_q) * block_q
    qpad = jnp.concatenate(
        [query, jnp.zeros((qp - q, d), query.dtype)], axis=0)

    cent = index.centroids.astype(jnp.float32)
    cc = jnp.sum(cent * cent, axis=1)

    def body(qblock):
        qf = qblock.astype(jnp.float32)
        # coarse: query -> centroid distances, top-nprobe clusters
        cd = (jnp.sum(qf * qf, axis=1, keepdims=True) + cc[None, :]
              - 2.0 * jnp.dot(qf, cent.T,
                              preferred_element_type=jnp.float32))
        _, probe = jax.lax.top_k(-cd, nprobe)            # (bq, nprobe)
        # gather candidate buckets: (bq, nprobe, B, D)
        cand = index.buckets[probe]
        cand_ids = index.bucket_ids[probe]               # (bq, nprobe, B)
        cand = cand.reshape(qblock.shape[0], nprobe * b, d).astype(
            jnp.float32)
        cand_ids = cand_ids.reshape(qblock.shape[0], nprobe * b)
        # fine: exact distances to the gathered candidates
        dist = (jnp.sum(qf * qf, axis=1, keepdims=True)
                + jnp.sum(cand * cand, axis=2)
                - 2.0 * jnp.einsum("qd,qnd->qn", qf, cand,
                                   preferred_element_type=jnp.float32))
        dist = jnp.where(cand_ids >= 0, dist, jnp.inf)   # mask pad rows
        neg, pos = jax.lax.top_k(-dist, min(k, nprobe * b))
        idx = jnp.take_along_axis(cand_ids, pos, axis=1)
        dd = -neg
        if k > nprobe * b:  # tiny-bucket corner: pad out to k
            pad = k - nprobe * b
            dd = jnp.concatenate(
                [dd, jnp.full((qblock.shape[0], pad), jnp.inf)], axis=1)
            idx = jnp.concatenate(
                [idx, jnp.full((qblock.shape[0], pad), -1, idx.dtype)],
                axis=1)
        return dd, idx

    blocks = qpad.reshape(qp // block_q, block_q, d)
    dists, idxs = jax.lax.map(body, blocks)
    return (dists.reshape(qp, -1)[:q], idxs.reshape(qp, -1)[:q])
