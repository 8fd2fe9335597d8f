"""Golden-value parity tests: NumPy ports of the reference's retrieval
post-processing algorithms, pinned against the TPU implementations on random
inputs (accuracy-parity evidence without datasets — VERDICT round-1 item 5).

Oracles are direct ports of:
  - `compute_jaccard_distance`  ref reid/faiss_utils.py:149-244
  - `k_reciprocal_neigh`        ref reid/faiss_utils.py:142-146
  - `diminish_camera_bias`      ref reid/inference_utils.py:5-15
  - `smooth_tracklets`          ref reid/inference_utils.py:18-27
"""

import numpy as np
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------- oracles

def _np_softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def oracle_jaccard(feats: np.ndarray, k1: int, k2: int) -> np.ndarray:
    """Direct NumPy port of ref faiss_utils.compute_jaccard_distance
    (:149-244). faiss search(x, k1) returns k1 columns with self first;
    `k_reciprocal_neigh` slices [:k1+1] of those k1 columns (a no-op clamp),
    so the forward set is self + (k1-1) neighbors."""
    n = feats.shape[0]
    d2 = ((feats[:, None] - feats[None]) ** 2).sum(-1)
    initial_rank = np.argsort(d2, axis=1, kind="stable")[:, :k1]

    def k_reciprocal_neigh(i, k):
        forward = initial_rank[i, : k + 1]
        backward = initial_rank[forward, : k + 1]
        fi = np.where(backward == i)[0]
        return forward[fi]

    nn_k1 = [k_reciprocal_neigh(i, k1) for i in range(n)]
    nn_k1_half = [k_reciprocal_neigh(i, int(np.around(k1 / 2)))
                  for i in range(n)]

    v = np.zeros((n, n), np.float32)
    for i in range(n):
        k_recip = nn_k1[i]
        expansion = k_recip
        for cand in k_recip:
            cand_recip = nn_k1_half[cand]
            if len(np.intersect1d(cand_recip, k_recip)) > \
                    (2.0 / 3.0) * len(cand_recip):
                expansion = np.append(expansion, cand_recip)
        expansion = np.unique(expansion)
        dist = 2.0 - 2.0 * feats[i] @ feats[expansion].T
        v[i, expansion] = _np_softmax(-dist)

    if k2 != 1:
        v = np.stack([v[initial_rank[i, :k2]].mean(0) for i in range(n)])

    jaccard = np.zeros((n, n), np.float32)
    for i in range(n):
        temp_min = np.zeros(n, np.float32)
        nz = np.where(v[i] != 0)[0]
        for j in nz:
            ind = np.where(v[:, j] != 0)[0]
            temp_min[ind] += np.minimum(v[i, j], v[ind, j])
        jaccard[i] = 1.0 - temp_min / (2.0 - temp_min)
    jaccard[jaccard < 0] = 0.0
    return jaccard


def oracle_camera_bias(embeddings: np.ndarray, cams: np.ndarray,
                       la: float = 0.05) -> np.ndarray:
    """Direct NumPy port of ref inference_utils.diminish_camera_bias: Gram
    from the UNCENTERED per-camera snapshot, in-place centering, ridge
    inverse, per-camera row normalization."""
    emb = embeddings.copy()
    num_cams = int(cams.max())
    for i in range(num_cams + 1):
        cur = emb[cams == i].copy()          # snapshot BEFORE centering
        bias = cur.mean(0)
        emb[cams == i] -= bias
        p = np.linalg.inv(cur.T @ cur + cur.shape[0] * la
                          * np.eye(emb.shape[1]))
        emb[cams == i] = emb[cams == i] @ p.T
        emb[cams == i] /= np.linalg.norm(emb[cams == i], axis=1,
                                         keepdims=True)
    return emb


def oracle_smooth_tracklets(embeddings: np.ndarray, seqs: np.ndarray,
                            valid: np.ndarray) -> np.ndarray:
    """Direct port of ref inference_utils.smooth_tracklets (:18-27).
    NOTE: the reference does NOT renormalize after blending."""
    emb = embeddings.copy()
    for j in np.unique(seqs):
        idx = np.logical_and(seqs == j, valid)
        if idx.sum() == 0:
            continue
        avg = emb[idx].mean(0)
        emb[idx] = emb[idx] * 0.1 + avg * 0.9
    return emb


def _clustered_feats(rng, n=96, d=24, k_clusters=8):
    centers = rng.normal(size=(k_clusters, d)) * 3.0
    feats = np.concatenate([
        centers[i % k_clusters] + 0.35 * rng.normal(size=(1, d))
        for i in range(n)
    ]).astype(np.float32)
    return feats / np.linalg.norm(feats, axis=1, keepdims=True)


# ------------------------------------------------------------------ tests

def test_jaccard_matches_reference_oracle(rng):
    from reid_tpu.ops import compute_jaccard_distance

    feats = _clustered_feats(rng)
    want = oracle_jaccard(feats, k1=12, k2=4)
    got = np.asarray(compute_jaccard_distance(jnp.asarray(feats), k1=12,
                                              k2=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_jaccard_matches_reference_oracle_k2_1(rng):
    """k2 == 1 skips query expansion (ref :211-216 gate)."""
    from reid_tpu.ops import compute_jaccard_distance

    feats = _clustered_feats(rng, n=64)
    want = oracle_jaccard(feats, k1=8, k2=1)
    got = np.asarray(compute_jaccard_distance(jnp.asarray(feats), k1=8, k2=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_jaccard_matches_reference_oracle(rng):
    import jax
    from reid_tpu.ops import compute_jaccard_distance_sharded
    from reid_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    feats = _clustered_feats(rng, n=90)   # NOT divisible by 8 -> padding
    want = oracle_jaccard(feats, k1=10, k2=3)
    got = np.asarray(compute_jaccard_distance_sharded(
        make_mesh(8), jnp.asarray(feats), k1=10, k2=3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_camera_bias_matches_reference_oracle(rng):
    from reid_tpu.ops import diminish_camera_bias

    emb = rng.normal(size=(80, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    cams = (np.arange(80) % 4).astype(np.int64)
    want = oracle_camera_bias(emb, cams)
    got = np.asarray(diminish_camera_bias(jnp.asarray(emb),
                                          jnp.asarray(cams), num_cams=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smooth_tracklets_matches_reference_oracle(rng):
    from reid_tpu.ops import smooth_tracklets

    emb = rng.normal(size=(40, 8)).astype(np.float32)
    seqs = (np.arange(40) % 5).astype(np.int64)
    valid = rng.random(40) > 0.2
    want = oracle_smooth_tracklets(emb, seqs, valid)
    got = np.asarray(smooth_tracklets(
        jnp.asarray(emb), jnp.asarray(seqs),
        valid=jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
