"""Golden-value tests for CMC/mAP against a direct NumPy transcription of the
reference protocol (reid/evaluate.py:55-105), on tiny synthetic galleries."""

import numpy as np
import jax.numpy as jnp
import pytest

from reid_tpu.eval import evaluate_all


def _oracle_evaluate(qf, ql, qc, gf, gl, gc, max_rank=50):
    """Per-query Python loop — the reference algorithm verbatim in NumPy."""
    cmc_total = np.zeros(max_rank)
    ap_total = 0.0
    for i in range(len(ql)):
        score = gf @ qf[i]
        index = np.argsort(score)[::-1]
        query_index = np.argwhere(gl == ql[i])
        camera_index = np.argwhere(gc == qc[i])
        good_index = np.setdiff1d(query_index, camera_index, assume_unique=True)
        junk_index1 = np.argwhere(gl == -1)
        junk_index2 = np.intersect1d(query_index, camera_index)
        junk_index = np.append(junk_index2, junk_index1)

        cmc = np.zeros(len(index))
        if good_index.size == 0:
            continue
        mask = np.isin(index, junk_index, invert=True)
        index = index[mask]
        ngood = len(good_index)
        mask = np.isin(index, good_index)
        rows_good = np.argwhere(mask).flatten()
        cmc[rows_good[0]:] = 1
        ap = 0.0
        for k in range(ngood):
            d_recall = 1.0 / ngood
            precision = (k + 1) / (rows_good[k] + 1)
            old_precision = k / rows_good[k] if rows_good[k] != 0 else 1.0
            ap += d_recall * (old_precision + precision) / 2
        cmc_total += cmc[:max_rank]
        ap_total += ap
    return cmc_total / len(ql), ap_total / len(ql)


def test_cmc_map_matches_reference_oracle(rng):
    nq, ng, d = 20, 100, 16
    n_ids, n_cams = 8, 3
    qf = rng.normal(size=(nq, d)).astype(np.float32)
    gf = rng.normal(size=(ng, d)).astype(np.float32)
    ql = rng.integers(0, n_ids, nq)
    qc = rng.integers(0, n_cams, nq)
    gl = rng.integers(0, n_ids, ng)
    gc = rng.integers(0, n_cams, ng)
    gl[:5] = -1  # distractors

    want_cmc, want_map = _oracle_evaluate(qf, ql, qc, gf, gl, gc)
    got_cmc, got_map = evaluate_all(qf, ql, qc, gf, gl, gc, verbose=False)
    np.testing.assert_allclose(got_cmc, want_cmc, atol=1e-5)
    assert abs(got_map - want_map) < 1e-5


def test_perfect_retrieval():
    # gallery: each query's match is nearest and on a different camera
    d = 4
    qf = np.eye(d, dtype=np.float32)
    gf = np.concatenate([np.eye(d), 0.1 * np.ones((2, d))]).astype(np.float32)
    ql = np.arange(4); qc = np.zeros(4, int)
    gl = np.asarray([0, 1, 2, 3, 9, 9]); gc = np.asarray([1, 1, 1, 1, 0, 0])
    cmc, mean_ap = evaluate_all(qf, ql, qc, gf, gl, gc, verbose=False)
    assert cmc[0] == 1.0
    assert abs(mean_ap - 1.0) < 1e-6


def test_market_attributes_roundtrip(tmp_path):
    """Synthetic market_attribute.mat -> parser -> distance matrix."""
    scipy_io = pytest.importorskip("scipy.io")

    table = {
        "image_index": np.asarray([["0007", "0009", "0012"]], dtype=object),
        "age": np.asarray([[1.0, 2.0, 4.0]]),
        "backpack": np.asarray([[1.0, 2.0, 1.0]]),
        "gender": np.asarray([[2.0, 1.0, 2.0]]),
    }
    scipy_io.savemat(str(tmp_path / "market_attribute.mat"),
                     {"market_attribute": {"test": table, "train": table}})

    from reid_tpu.eval.attributes import get_attribute_dist, get_attributes
    ids, attrs = get_attributes(str(tmp_path / "market_attribute.mat"))
    assert list(ids) == [7, 9, 12]
    # age one-hot (4) + 2 binary attrs
    assert attrs.shape == (3, 6)
    assert attrs[:, :4].sum() == 3  # one-hot rows

    d = get_attribute_dist(ids, attrs, np.asarray([7, 9, 12, 999]))
    assert d.shape == (4, 4)
    assert d[0, 0] == 0.0
    assert d.max() <= 1.0 + 1e-6


def test_run_inference_plr_osnet_feature_only():
    """Dual-head PLR-OSNet flows through the retrieval eval: the embedding
    is the 2560-d part feature ONLY (reference eval contract,
    ref plr_osnet.py:107-110) — regression for the tuple-logits crash."""
    import jax

    from reid_tpu.config import (Config, DataConfig, ModelConfig,
                                 RetrievalConfig, TrainConfig)
    from reid_tpu.data import synthetic_dataset
    from reid_tpu.eval.inference import run_inference
    from reid_tpu.models import build_model
    from reid_tpu.train.state import create_train_state

    cfg = Config(model=ModelConfig(backbone="plr_osnet", num_classes=4,
                                   dtype="float32"),
                 train=TrainConfig(batch_size=4),
                 data=DataConfig(height=80, width=40),
                 retrieval=RetrievalConfig(k1=6, k2=2,
                                           dbscan_min_samples=2))
    model = build_model("plr_osnet", num_classes=4)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg, 1,
                               input_shape=(2, 80, 40, 3))
    query = synthetic_dataset(n=4, num_pids=4, height=80, width=40, seed=1,
                              cam_offset=3)
    gallery = synthetic_dataset(n=8, num_pids=4, height=80, width=40, seed=2)
    cmc, mAP = run_inference(state, query, gallery, cfg, rerank=True,
                             verbose=False)
    assert 0.0 <= mAP <= 1.0
    assert cmc.shape[0] >= 1
