"""Tests for the retrieval ops: distance kernels, top-k, Jaccard re-rank,
camera de-bias, DBSCAN, k-means — against NumPy/sklearn-style oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.ops import (
    compute_jaccard_distance,
    dbscan_precomputed,
    diminish_camera_bias,
    kmeans,
    pairwise_cosine,
    pairwise_l1,
    pairwise_sqeuclidean,
    smooth_tracklets,
    topk_neighbors,
)


def test_sqeuclidean_matches_numpy(rng):
    x = rng.normal(size=(33, 17)).astype(np.float32)
    y = rng.normal(size=(21, 17)).astype(np.float32)
    want = ((x[:, None] - y[None]) ** 2).sum(-1)
    got = np.asarray(pairwise_sqeuclidean(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_l1_matches_numpy(rng):
    x = rng.normal(size=(19, 23)).astype(np.float32)
    want = np.abs(x[:, None] - x[None]).sum(-1)
    got = np.asarray(pairwise_l1(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_topk_neighbors(rng):
    x = rng.normal(size=(37, 8)).astype(np.float32)
    g = rng.normal(size=(101, 8)).astype(np.float32)
    d2 = ((x[:, None] - g[None]) ** 2).sum(-1)
    want_idx = np.argsort(d2, axis=1)[:, :5]
    dists, idx = topk_neighbors(jnp.asarray(x), jnp.asarray(g), k=5)
    got_idx = np.asarray(idx)
    # distances must match (indices may differ on exact ties)
    np.testing.assert_allclose(
        np.sort(np.take_along_axis(d2, got_idx, 1), 1),
        np.sort(np.take_along_axis(d2, want_idx, 1), 1),
        rtol=1e-4, atol=1e-4,
    )
    assert np.all(np.diff(np.asarray(dists), axis=1) >= -1e-5)


def _oracle_jaccard(feats, k1=20, k2=6):
    """NumPy transcription of ref faiss_utils.py:142-244."""
    import numpy as np
    N = feats.shape[0]
    feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    d2 = ((feats[:, None] - feats[None]) ** 2).sum(-1)
    # faiss search(x, k1) returns k1 columns (self first); the [:k+1] slice
    # in k_reciprocal_neigh is a no-op clamp at k == k1
    initial_rank = np.argsort(d2, axis=1)[:, :k1]

    def k_recip(i, k):
        fwd = initial_rank[i, : k + 1]
        back = initial_rank[fwd, : k + 1]
        fi = np.where(back == i)[0]
        return fwd[fi]

    nn_k1 = [k_recip(i, k1) for i in range(N)]
    nn_half = [k_recip(i, int(np.around(k1 / 2))) for i in range(N)]
    V = np.zeros((N, N), np.float32)
    for i in range(N):
        k_idx = nn_k1[i]
        exp_idx = k_idx
        for cand in k_idx:
            c_idx = nn_half[cand]
            if len(np.intersect1d(c_idx, k_idx)) > 2 / 3 * len(c_idx):
                exp_idx = np.append(exp_idx, c_idx)
        exp_idx = np.unique(exp_idx)
        dist = 2 - 2 * feats[i] @ feats[exp_idx].T
        e = np.exp(-dist)
        V[i, exp_idx] = e / e.sum()
    if k2 != 1:
        V = np.stack([V[initial_rank[i, :k2]].mean(0) for i in range(N)])
    jac = np.zeros((N, N), np.float32)
    for i in range(N):
        tm = np.minimum(V[i][None, :], V).sum(1)
        jac[i] = 1 - tm / (2 - tm)
    return np.maximum(jac, 0)


def test_jaccard_matches_oracle(rng):
    # clustered features so k-reciprocal structure is non-trivial
    centers = rng.normal(size=(5, 12)) * 3
    feats = np.concatenate(
        [c + 0.3 * rng.normal(size=(10, 12)) for c in centers]
    ).astype(np.float32)
    want = _oracle_jaccard(feats, k1=8, k2=3)
    got = np.asarray(compute_jaccard_distance(jnp.asarray(feats), k1=8, k2=3))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_dbscan_clusters_blobs(rng):
    a = rng.normal(size=(20, 2)) * 0.1
    b = rng.normal(size=(20, 2)) * 0.1 + 10
    noise = np.asarray([[5.0, 5.0]])
    x = np.concatenate([a, b, noise])
    d = np.linalg.norm(x[:, None] - x[None], axis=-1)
    labels = dbscan_precomputed(d, eps=1.0, min_samples=3)
    assert len(set(labels[:20])) == 1 and labels[0] >= 0
    assert len(set(labels[20:40])) == 1
    assert labels[0] != labels[20]
    assert labels[-1] == -1


def test_dbscan_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.cluster")
    x = rng.normal(size=(60, 3))
    d = np.linalg.norm(x[:, None] - x[None], axis=-1)
    want = sklearn.DBSCAN(eps=0.8, min_samples=4, metric="precomputed").fit_predict(d)
    got = dbscan_precomputed(d, eps=0.8, min_samples=4)
    # same noise set and same partition (label ids may permute)
    assert ((want == -1) == (got == -1)).all()
    for lbl in set(got) - {-1}:
        members = got == lbl
        assert len(set(want[members])) == 1


def test_camera_debias_properties(rng):
    x = rng.normal(size=(40, 8)).astype(np.float32)
    cams = np.repeat([0, 1], 20)
    out = np.asarray(diminish_camera_bias(jnp.asarray(x), jnp.asarray(cams),
                                          num_cams=2))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # per-camera means are (approximately) removed before whitening
    assert abs(out[:20].mean()) < abs(x[:20].mean()) + 1.0


def test_smooth_tracklets(rng):
    x = rng.normal(size=(6, 4)).astype(np.float32)
    ids = np.asarray([0, 0, 0, 1, 1, -1])
    out = np.asarray(smooth_tracklets(jnp.asarray(x), jnp.asarray(ids)))
    # invalid row unchanged
    np.testing.assert_allclose(out[5], x[5], atol=1e-6)
    # blend semantics: 0.1*self + 0.9*tracklet-mean, NO renormalization
    # (ref inference_utils.py:18-27)
    np.testing.assert_allclose(out[0], 0.1 * x[0] + 0.9 * x[:3].mean(0),
                               rtol=1e-5, atol=1e-6)
    # same-tracklet rows move closer together
    def spread(v):
        return np.linalg.norm(v - v.mean(0), axis=1).mean()
    assert spread(out[:3]) < spread(x[:3])


def test_kmeans_separates_blobs(rng):
    a = rng.normal(size=(30, 4)) * 0.2
    b = rng.normal(size=(30, 4)) * 0.2 + 8
    x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    labels, centers = kmeans(jax.random.PRNGKey(0), x, k=2)
    labels = np.asarray(labels)
    assert len(set(labels[:30])) == 1
    assert len(set(labels[30:])) == 1
    assert labels[0] != labels[30]


def test_jaccard_sparse_topk_matches_dense(rng):
    """Top-S approximate min-sum == dense Jaccard when S covers the
    k-reciprocal support (big-gallery mode, ops/rerank.py)."""
    from reid_tpu.ops.rerank import compute_jaccard_distance

    # clustered features -> realistic sparse expansion sets
    centers = rng.normal(size=(8, 32))
    feats = np.repeat(centers, 16, axis=0) + 0.1 * rng.normal(size=(128, 32))
    f = jnp.asarray(feats, jnp.float32)
    dense = np.asarray(compute_jaccard_distance(f, k1=10, k2=3))
    sparse = np.asarray(compute_jaccard_distance(f, k1=10, k2=3,
                                                 sparse_s=64))
    assert np.max(np.abs(dense - sparse)) < 1e-5
    # non-multiple-of-block N exercises the padding path
    f2 = f[:100]
    d2 = np.asarray(compute_jaccard_distance(f2, k1=10, k2=3))
    s2 = np.asarray(compute_jaccard_distance(f2, k1=10, k2=3, sparse_s=64))
    assert np.max(np.abs(d2 - s2)) < 1e-5


def test_jaccard_sparse_overflow_falls_back_to_dense(rng):
    """When V rows carry more than S nonzeros the runtime guard must route
    to the exact dense min-sum — sparse_s may never silently change
    retrieval results (ops/rerank.py exactness guard)."""
    from reid_tpu.ops.rerank import compute_jaccard_distance

    # one tight blob: everybody is everybody's k-reciprocal neighbor, so the
    # expansion support is ~N wide — far beyond S=8
    feats = rng.normal(size=(64, 16)) * 0.01
    f = jnp.asarray(feats, jnp.float32)
    dense = np.asarray(compute_jaccard_distance(f, k1=20, k2=6))
    sparse = np.asarray(compute_jaccard_distance(f, k1=20, k2=6, sparse_s=8))
    assert np.max(np.abs(dense - sparse)) < 1e-6


def test_ivf_exact_when_all_probed(rng):
    """nprobe == nlist probes every bucket -> identical to brute force."""
    from reid_tpu.ops import build_ivf, ivf_topk, topk_neighbors

    g = jnp.asarray(rng.normal(size=(200, 16)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(33, 16)), jnp.float32)
    idx = build_ivf(jax.random.PRNGKey(0), g, nlist=8)
    d_ivf, i_ivf = ivf_topk(idx, q, k=5, nprobe=8, block_q=16)
    d_bf, i_bf = topk_neighbors(q, g, k=5)
    np.testing.assert_array_equal(np.asarray(i_ivf), np.asarray(i_bf))
    np.testing.assert_allclose(np.asarray(d_ivf), np.asarray(d_bf),
                               rtol=1e-4, atol=1e-4)


def test_ivf_high_recall_on_clustered_gallery(rng):
    """nprobe << nlist keeps recall@10 high on clustered data (the faiss
    IVF big-gallery role, ref faiss_utils.py:158-181)."""
    from reid_tpu.ops import build_ivf, ivf_topk, topk_neighbors

    centers = rng.normal(size=(16, 24)) * 6
    g = np.repeat(centers, 64, 0) + rng.normal(size=(1024, 24))
    q = np.repeat(centers[:8], 4, 0) + rng.normal(size=(32, 24))
    g = jnp.asarray(g, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    idx = build_ivf(jax.random.PRNGKey(1), g, nlist=16)
    d_ivf, i_ivf = ivf_topk(idx, q, k=10, nprobe=4)
    _, i_bf = topk_neighbors(q, g, k=10)
    recall = np.mean([
        len(set(np.asarray(i_ivf)[r]) & set(np.asarray(i_bf)[r])) / 10.0
        for r in range(q.shape[0])])
    assert recall > 0.9, recall
    # distances ascending, indices valid
    assert np.all(np.diff(np.asarray(d_ivf), axis=1) >= -1e-5)
    assert np.asarray(i_ivf).min() >= 0


def test_search_policy_tiers():
    """choose_search maps gallery size to dense/top-S like the reference's
    search_option ladder (ref faiss_utils.py:121-181). IVF is explicit
    opt-in only: measured 5-8x SLOWER than the brute-force MXU kNN on the
    v5e at N=50k-100k (ROUND_NOTES r4 'Large-gallery scaling'), so auto
    never picks it."""
    from reid_tpu.ops import choose_search

    assert choose_search(5_000).strategy == "dense"
    assert choose_search(5_000).sparse_s is None
    mid = choose_search(30_000)
    assert mid.strategy == "sparse" and mid.sparse_s == 512
    big = choose_search(150_000)
    assert big.strategy == "sparse" and big.sparse_s == 512
    # sharded ceilings scale with the mesh
    assert choose_search(30_000, n_devices=8).strategy == "dense"
    # explicit override + sparse_s escape hatch
    assert choose_search(1_000, option="ivf").strategy == "ivf"
    assert choose_search(30_000, sparse_s=256).sparse_s == 256
    with pytest.raises(ValueError):
        choose_search(10, option="bogus")


def test_jaccard_search_option_auto_matches_legacy(rng):
    """search_option='auto' at small N resolves to the dense path — bit
    identical to the legacy call; forced 'ivf' stays close (exact ranking
    on an easy gallery)."""
    from reid_tpu.ops import jaccard_distance

    f = jnp.asarray(rng.normal(size=(120, 16)), jnp.float32)
    legacy = np.asarray(jaccard_distance(f, k1=10, k2=4))
    auto = np.asarray(jaccard_distance(f, k1=10, k2=4,
                                       search_option="auto"))
    np.testing.assert_array_equal(legacy, auto)
    ivf = np.asarray(jaccard_distance(f, k1=10, k2=4, search_option="ivf"))
    assert ivf.shape == legacy.shape
    assert np.isfinite(ivf).all()


def test_ivf_resplits_skewed_clusters(rng):
    """A gallery where k-means lumps ~80% of rows into one cluster must be
    re-split so the padded bucket tensor stays near n/nlist wide (ADVICE
    r3: skew silently degraded the HBM win to worse-than-brute-force)."""
    from reid_tpu.ops import build_ivf, ivf_topk, topk_neighbors

    # one tight blob (800 rows) + scattered far-away singleton clusters
    blob = rng.normal(size=(800, 12)) * 0.05
    far = rng.normal(size=(200, 12)) * 0.05 + rng.integers(
        -50, 50, (200, 1)) * np.eye(1, 12)
    g = jnp.asarray(np.concatenate([blob, far]), jnp.float32)
    idx = build_ivf(jax.random.PRNGKey(0), g, nlist=16)
    n, nlist = 1000, 16
    # padded width stays within the imbalance bound (default 4x average)
    assert idx.buckets.shape[1] <= 4.0 * n / nlist + 1, idx.buckets.shape
    # exactness contract survives the split: probe every list
    q = jnp.asarray(rng.normal(size=(17, 12)), jnp.float32)
    d_ivf, i_ivf = ivf_topk(idx, q, k=5, nprobe=int(idx.centroids.shape[0]))
    _, i_bf = topk_neighbors(q, g, k=5)
    np.testing.assert_array_equal(np.asarray(i_ivf), np.asarray(i_bf))


def test_jaccard_ivf_close_to_exact(rng):
    """IVF-ranked Jaccard (ref faiss_utils.py:158-181 search options) tracks
    the exact ranking closely on clustered galleries, and is IDENTICAL when
    every bucket is probed."""
    from reid_tpu.ops import (compute_jaccard_distance,
                              compute_jaccard_distance_ivf)

    centers = rng.normal(size=(8, 16)) * 5
    feats = np.repeat(centers, 16, 0) + 0.3 * rng.normal(size=(128, 16))
    f = jnp.asarray(feats, jnp.float32)
    exact = np.asarray(compute_jaccard_distance(f, k1=10, k2=3))
    # all buckets probed -> identical ranking -> identical Jaccard
    full = np.asarray(compute_jaccard_distance_ivf(f, k1=10, k2=3,
                                                   nlist=8, nprobe=8))
    np.testing.assert_allclose(full, exact, atol=1e-5)
    # partial probing: retrieval ORDER preserved for most pairs
    approx = np.asarray(compute_jaccard_distance_ivf(f, k1=10, k2=3,
                                                     nlist=8, nprobe=4))
    # same-cluster pairs must stay much closer than cross-cluster pairs
    lab = np.repeat(np.arange(8), 16)
    same = lab[:, None] == lab[None, :]
    assert approx[same].mean() < 0.5 * approx[~same].mean()
