"""Image-ReID training orchestration (ref `reid/image_reid_train.py`).

`train_cnn` mirrors ref :39-112: PK loader, HybridLoss (WRT/center/DCC),
WarmUpCosine, epoch-0 DCC lut seeding from class-mean logits
(generate_centers, ref :70-74), per-batch device-side augmentation, orbax
checkpoint + StableHLO export at the end.

The continual phase mirrors ref :342-556: ONNX-free pseudo-labeling
(`produce_pseudo_data`: TTA embed -> camera de-bias -> Jaccard -> DBSCAN ->
centroids), classifier expansion seeded with prior rows + centroids
(ref :407-412), then weighted-loss training (`HybridLossWeighted` semantics:
label-smooth CE added, per-sample weights pseudo=1/real=0 flags).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import ReIDDataset, augment_batch, make_eval_loader, make_train_loader
from ..data.transforms import inference_batch
from ..losses import normalize
from ..models import build_model
from ..ops import compute_jaccard_distance, diminish_camera_bias, dbscan_precomputed
from .state import ReIDTrainState, create_train_state
from .steps import embed_with_flip, eval_step, make_train_step


def seed_dcc_luts(state: ReIDTrainState, dataset: ReIDDataset,
                  batch_size: int, num_classes: int) -> ReIDTrainState:
    """Epoch-0 warm start: both DCC luts <- L2-normalized class means of the
    *logits* over the whole train set (ref generate_centers + driver :70-74).
    """
    sums = np.zeros((num_classes, num_classes), np.float32)
    counts = np.zeros((num_classes,), np.float32)
    for batch in make_eval_loader(dataset, batch_size):
        images = inference_batch(batch["images"])
        _, logits = eval_step(state.apply_fn, state.params,
                              state.batch_stats, images)
        logits = np.asarray(logits, np.float32)
        labels = np.asarray(batch["labels"])
        for c in np.unique(labels):
            m = labels == c
            sums[c] += logits[m].sum(0)
            counts[c] += m.sum()
    means = sums / np.maximum(counts, 1.0)[:, None]
    feats = jnp.asarray(means)
    feats = normalize(feats)
    dcc = state.loss_state.dcc._replace(lut_ccc=feats, lut_icc=feats)
    return state.replace(loss_state=state.loss_state._replace(dcc=dcc))


def train_cnn(
    cfg: Config,
    dataset: ReIDDataset,
    state: Optional[ReIDTrainState] = None,
    use_xbm: bool = False,
    log_every: int = 50,
    ckpt_dir: str = "checkpoint",
    mesh=None,
    ckpt: str = "",
) -> Tuple[ReIDTrainState, list]:
    """Main train loop (ref train_cnn :39-112 / train_cnn XBM variant).

    Data-parallel by default: the state is replicated and every batch is
    sharded over `mesh` (all local devices when None — the role of the
    reference's nn.DataParallel wrap + DDP ddp_trigger, train_utils.py:45-77);
    XLA inserts the gradient all-reduce and global BN statistics over ICI.
    """
    from ..parallel import fit_mesh, place_batch, replicate

    if mesh is None:
        mesh = fit_mesh(cfg.train.batch_size)
    n_dev = mesh.devices.size
    assert cfg.train.batch_size % n_dev == 0, (
        f"batch_size {cfg.train.batch_size} not divisible by mesh size {n_dev}")
    model = build_model(cfg.model.backbone, num_classes=cfg.model.num_classes,
                        num_cams=cfg.model.num_cams,
                        dtype=jnp.dtype(cfg.model.dtype))
    steps_per_epoch = max(len(dataset) // cfg.train.batch_size, 1)
    if state is None:
        state = create_train_state(
            jax.random.PRNGKey(cfg.train.seed), model, cfg, steps_per_epoch,
            input_shape=(2, cfg.data.height, cfg.data.width, 3),
        )
        if ckpt:
            # warm-start from a params/batch_stats checkpoint (e.g. a
            # converted pretrained trunk) — ref --ckpt strict=False load
            # before training, image_reid_train.py:42-45
            from ..utils import restore_checkpoint
            tpl = restore_checkpoint(
                ckpt, {"params": state.params,
                       "batch_stats": state.batch_stats})
            state = state.replace(params=tpl["params"],
                                  batch_stats=tpl["batch_stats"])
    state = replicate(mesh, state)
    train_step = make_train_step(cfg, use_xbm_gate=use_xbm)
    aug_key = jax.random.PRNGKey(cfg.train.seed + 1)

    loss_stats = []
    for epoch in range(cfg.train.epochs):
        if epoch == 0 and cfg.loss.use_dcc:
            state = seed_dcc_luts(state, dataset, cfg.train.batch_size,
                                  cfg.model.num_classes)
        loader = make_train_loader(dataset, cfg.train.batch_size,
                                   cfg.train.num_instances,
                                   seed=cfg.train.seed, epoch=epoch,
                                   device_put=False)
        t0 = time.time()
        for i, batch in enumerate(loader):
            aug_key, k = jax.random.split(aug_key)
            # SIE view index = cam * num_seqs + seq for side-info models
            # (ref train_cnn_sie, image_reid_train.py:115-187).
            cams = batch["cams"]
            if cfg.model.num_seqs > 1:
                cams = cams * cfg.model.num_seqs + batch["seqs"]
            # uint8 images + key -> augmentation runs fused inside the train
            # step's program (single dispatch per step).
            dev_batch = {"images": batch["images"], "aug_key": k,
                         "labels": batch["labels"], "cams": cams}
            if use_xbm:
                dev_batch["xbm_active"] = jnp.asarray(
                    epoch > cfg.loss.xbm_start_epoch)
            # In the continual (cross-domain) phase, ALWAYS pass the weights
            # tensor — the reference passes weights on every batch, so a
            # pure-source batch contributes zero triplet/center loss (flags
            # all 0), not full unweighted loss. A constant batch signature
            # also keeps the jit cache to one entry.
            if dataset.cross_domain:
                dev_batch["weights"] = _continual_weights(batch["weights"])
            dev_batch = place_batch(mesh, dev_batch)
            state, metrics = train_step(state, dev_batch)
            if i % log_every == 0:
                loss = float(metrics["loss"])
                loss_stats.append(loss)
                print(f"epoch {epoch} step {i}: loss={loss:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    from ..utils import save_checkpoint
    save_checkpoint(os.path.join(
        ckpt_dir, f"cnn_net_checkpoint_{cfg.data.dataset}"), state)
    return state, loss_stats


def _continual_weights(flags: np.ndarray) -> jnp.ndarray:
    """Per-sample weights, exactly the reference semantics: flag 0.0 for
    real (source) samples, 1.0 for pseudo (data_prepare.py:88-89), divided
    by batch size in the driver (image_reid_train.py:452). Real samples thus
    contribute zero weighted loss but still shape the distance matrices."""
    w = np.asarray(flags, np.float32)
    return jnp.asarray(w / len(w))


def extract_embeddings(state: ReIDTrainState, dataset: ReIDDataset,
                       batch_size: int, tta_flip: bool = True,
                       strong: bool = False, seed: int = 0):
    """TTA dual-pass embeddings for a whole dataset (ref
    inference_efficient, image_reid_inference.py:78-135). `strong` enables
    the crop-jitter test-time transform (ref 'strong_inference')."""
    feats = []
    key = jax.random.PRNGKey(seed)
    for batch in make_eval_loader(dataset, batch_size):
        images = jnp.asarray(batch["images"])
        if strong:
            from ..data.transforms import strong_inference_batch
            key, k = jax.random.split(key)
            images = strong_inference_batch(k, images)
        else:
            images = inference_batch(images)
        if tta_flip:
            emb = embed_with_flip(state.apply_fn, state.params,
                                  state.batch_stats, images)
        else:
            f, l = eval_step(state.apply_fn, state.params, state.batch_stats,
                             images)
            f = normalize(f.astype(jnp.float32))
            l = normalize(l.astype(jnp.float32))
            emb = normalize(jnp.concatenate([f, l], axis=1))
        feats.append(np.asarray(emb, np.float32))
    n = len(dataset)
    return np.concatenate(feats)[:n]


def produce_pseudo_data(
    state: ReIDTrainState,
    target_dataset: ReIDDataset,
    cfg: Config,
    mesh=None,
    min_yield: float = 0.2,
) -> Tuple[list, np.ndarray, int]:
    """Pseudo-label a target-domain train set (ref :342-402):
    embed -> camera de-bias -> Jaccard -> DBSCAN -> (records, centroids, k).
    Returns pseudo records with pids offset by the source class count.
    When a multi-device mesh is given the Jaccard matrix is row-sharded."""
    from ..ops import jaccard_distance

    emb = extract_embeddings(state, target_dataset, cfg.train.batch_size,
                             cfg.retrieval.tta_flip)
    emb = np.asarray(diminish_camera_bias(
        jnp.asarray(emb), jnp.asarray(target_dataset.cams),
        lambda_reg=cfg.retrieval.cam_bias_lambda,
        num_cams=int(target_dataset.cams.max()) + 1))
    # big-gallery policy (ops/policy.py, the faiss search_option role):
    # dense <=15k, top-S sparse to 60k, IVF beyond — measured crossovers;
    # compute_jaccard_distance carries a runtime support-overflow guard
    # that falls back to the exact dense path.
    jac = np.asarray(jaccard_distance(
        jnp.asarray(emb), k1=cfg.retrieval.k1, k2=cfg.retrieval.k2,
        mesh=mesh, sparse_s=cfg.retrieval.rerank_sparse_s or None,
        search_option=cfg.retrieval.search_option))
    labels = dbscan_precomputed(jac, eps=cfg.retrieval.dbscan_eps,
                                min_samples=cfg.retrieval.dbscan_min_samples)
    num_clusters = int(labels.max()) + 1 if labels.max() >= 0 else 0
    # pseudo-label yield floor (ref image_reid_inference.py:304): refuse to
    # continue a continual run whose clustering collapsed.
    if num_clusters < min_yield * target_dataset.num_train_pids:
        raise RuntimeError(
            f"pseudo-label yield too low: {num_clusters} clusters < "
            f"{min_yield:.0%} of {target_dataset.num_train_pids} train pids")

    base = cfg.model.num_classes
    records, feats_kept, labels_kept = [], [], []
    for i, lbl in enumerate(labels):
        if lbl < 0:
            continue
        path, _, cam, seq = target_dataset.records[i]
        records.append((path, base + int(lbl), cam, seq))
        feats_kept.append(emb[i])
        labels_kept.append(lbl)
    centroids = np.zeros((num_clusters, emb.shape[1]), np.float32)
    for lbl in range(num_clusters):
        m = np.asarray(labels_kept) == lbl
        if m.any():
            centroids[lbl] = np.asarray(feats_kept)[m].mean(0)
    print(f"pseudo labels: {num_clusters} clusters over "
          f"{len(records)}/{len(target_dataset)} images", flush=True)
    return records, centroids, num_clusters


def expand_classifier(state: ReIDTrainState, cfg: Config,
                      num_new: int, centroids: Optional[np.ndarray] = None,
                      classifier_path=("classifier", "kernel"),
                      ) -> Tuple[ReIDTrainState, Config]:
    """Continual-phase classifier surgery (ref :405-412): widen the head to
    num_classes + num_new, keep prior rows, seed new rows from centroids
    (truncated/projected to the feature dim) or small noise; widen centers
    and DCC luts the same way."""
    params = jax.device_get(state.params)
    node = params
    for k in classifier_path[:-1]:
        node = node[k]
    kernel = np.asarray(node[classifier_path[-1]])     # (feat, C)
    feat_dim, n_old = kernel.shape
    new_cols = 0.001 * np.random.default_rng(0).normal(
        size=(feat_dim, num_new)).astype(kernel.dtype)
    if centroids is not None and centroids.shape[0] == num_new:
        # centroids are in embedding space [feat || logits]; take the first
        # feat_dim dims as the seed (ref seeds rows with cluster centroids)
        seed = centroids[:, :feat_dim].T.astype(kernel.dtype)
        norm = np.linalg.norm(seed, axis=0, keepdims=True)
        new_cols = np.where(norm > 0, seed / np.maximum(norm, 1e-9) *
                            np.linalg.norm(kernel, axis=0).mean(), new_cols)
    node[classifier_path[-1]] = np.concatenate([kernel, new_cols], axis=1)

    n_total = n_old + num_new
    centers = np.asarray(state.loss_state.centers)
    centers = np.concatenate([
        centers, np.random.default_rng(1).normal(
            size=(num_new, centers.shape[1])).astype(centers.dtype)])
    lut = np.zeros((n_total, n_total), np.float32)
    lut[:n_old, :n_old] = np.asarray(state.loss_state.dcc.lut_ccc)
    lut2 = np.zeros_like(lut)
    lut2[:n_old, :n_old] = np.asarray(state.loss_state.dcc.lut_icc)

    new_cfg = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "num_classes": n_total}))

    # rebuild optimizer state for the new shapes
    model = build_model(new_cfg.model.backbone,
                        num_classes=n_total,
                        num_cams=new_cfg.model.num_cams,
                        dtype=jnp.dtype(new_cfg.model.dtype))
    fresh = create_train_state(
        jax.random.PRNGKey(cfg.train.seed + 2), model, new_cfg,
        steps_per_epoch=1,
        input_shape=(2, cfg.data.height, cfg.data.width, 3))
    new_state = fresh.replace(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=state.batch_stats,
        loss_state=fresh.loss_state._replace(
            centers=jnp.asarray(centers),
            dcc=fresh.loss_state.dcc._replace(
                lut_ccc=jnp.asarray(lut), lut_icc=jnp.asarray(lut2)),
        ),
    )
    return new_state, new_cfg


def train_continual(
    cfg: Config,
    state: ReIDTrainState,
    source_dataset: ReIDDataset,
    target_records: list,
    centroids: np.ndarray,
    num_new: int,
    epochs: int = 40,
    mesh=None,
) -> Tuple[ReIDTrainState, list]:
    """Continual phase (ref train_cnn_continual :405-479): merge pseudo data
    into the source dataset, expand the classifier, train with weighted
    hybrid loss (+ label-smooth CE)."""
    source_dataset.add_pseudo(target_records, num_new)
    source_dataset.set_cross_domain()
    state, cfg = expand_classifier(state, cfg, num_new, centroids)
    # continual operating point (ref :415-424): Adam lr 7e-5, CE temperature
    # tao=2, label-smooth CE enabled (HybridLossWeighted adds it).
    cfg = cfg.replace(
        loss=cfg.loss.__class__(**{**cfg.loss.__dict__, "use_ce": True,
                                   "tao": 2.0}),
        train=cfg.train.__class__(**{**cfg.train.__dict__, "epochs": epochs,
                                     "lr": 7e-5, "warmup_epochs": 1,
                                     "hold_epochs": 20}),
    )
    return train_cnn(cfg, source_dataset, state=state, mesh=mesh)
