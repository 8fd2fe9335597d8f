"""Video ReID training (ref `reid/video_reid_train.py`).

`VideoTrackletDataset` parses MOT16 gt.txt files into per-identity tracklet
sequences of `seq_len` crops (ref VideoDataset :23-107: pedestrian class
only, lamda bbox dilation, tiny-box filter, pad-with-last / random subsample
to seq_len). The train loop (ref :110-138) uses the 3D video ResNet-50 with
HybridLoss on 2048-d features; the optimizer is MADGRAD(1e-4, wd 5e-4,
momentum 0) with the StepLR(300, 0.5) schedule — the reference's exact
recipe (ref :115-116; `train.optim.madgrad`, update-parity-tested).

The reference's DDP variant (:142-189) is subsumed by the framework's mesh
data-parallelism (reid_tpu.parallel) — no process groups needed.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..losses import hybrid_loss, init_hybrid_state
from ..models import build_model


class VideoTrackletDataset:
    """MOT16 gt.txt -> {identity: [(bbox, frame, seq_dir), ...]}."""

    def __init__(self, gt_paths: Sequence[str], seq_len: int = 10,
                 lamda: float = 1.0, prefix_image_path: str = "",
                 height: int = 256, width: int = 128):
        assert lamda >= 1.0
        self.seq_len = seq_len
        self.lamda = lamda
        self.prefix = prefix_image_path
        self.height = height
        self.width = width
        self.gt_info, self.labels = self._read_gt(gt_paths)

    def _read_gt(self, gt_paths):
        """Ref read_gt (:35-63): consecutive-id relabeling across sequences
        via the running (id - label) offset; class column == 1 (pedestrian);
        optional lamda bbox dilation; skip boxes with w/h <= 10."""
        gt_info = defaultdict(list)
        label = -1
        diff = 0
        labels = []
        for path in gt_paths:
            with open(path) as f:
                for raw in f:
                    line = [float(v) for v in raw.strip().split(",")]
                    if len(line) < 8 or line[-2] != 1:
                        continue
                    if line[1] - label != diff:
                        label += 1
                        labels.append(label)
                        diff = line[1] - label
                    x, y, w, h = line[2:6]
                    if self.lamda > 1.0:
                        x = max(0.0, x - x * (self.lamda - 1) / 2)
                        y = max(0.0, y - y * (self.lamda - 1) / 2)
                        w *= self.lamda
                        h *= self.lamda
                    if w <= 10 or h <= 10 or x + w <= 10 or y + h <= 10:
                        continue
                    seq_dir = path.split(os.sep)[-3] if os.sep in path else ""
                    gt_info[label].append(((x, y, w, h), int(line[0]),
                                           seq_dir))
        return gt_info, labels

    def __len__(self):
        return len(self.labels)

    def load_sequence(self, item: int, rng: np.random.Generator):
        """(seq_len, H, W, 3) uint8 crops + int label (ref __getitem__)."""
        from PIL import Image

        infos = self.gt_info[item]
        if len(infos) < self.seq_len:
            infos = list(infos) + [infos[-1]] * (self.seq_len - len(infos))
        else:
            idx = rng.choice(len(infos), size=self.seq_len, replace=False)
            infos = [infos[i] for i in idx]
        crops = []
        for (x, y, w, h), frame, seq_dir in infos:
            p = os.path.join(self.prefix, seq_dir, "img1",
                             f"{frame:06d}.jpg")
            with Image.open(p) as im:
                im = im.convert("RGB")
                box = (round(max(0, x)), round(max(0, y)),
                       round(min(im.size[0], x + w)),
                       round(min(im.size[1], y + h)))
                crop = im.crop(box).resize((self.width, self.height),
                                           Image.BILINEAR)
            crops.append(np.asarray(crop, np.uint8))
        return np.stack(crops), self.labels[item]

    def batches(self, batch_size: int, rng: np.random.Generator):
        order = rng.permutation(len(self))
        for s in range(0, len(order), batch_size):
            chunk = order[s:s + batch_size]
            if len(chunk) < batch_size:
                chunk = np.concatenate([chunk, order[:batch_size - len(chunk)]])
            seqs, labels = zip(*(self.load_sequence(int(i), rng)
                                 for i in chunk))
            yield {"images": np.stack(seqs).astype(np.float32) / 255.0,
                   "labels": np.asarray(labels, np.int32)}


def make_video_train_step(cfg: Config, model, tx):
    def loss_fn(params, centers, batch_stats, loss_state, batch):
        (feature, logits), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"])
        st = loss_state._replace(centers=centers)
        total, aux = hybrid_loss(st, feature.astype(jnp.float32),
                                 logits.astype(jnp.float32),
                                 batch["labels"], cfg.loss)
        return total, (aux, mut["batch_stats"])

    @jax.jit
    def step(carry, batch):
        params, batch_stats, opt_state, loss_state = carry
        (loss, (aux, new_bs)), (gp, gc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            params, loss_state.centers, batch_stats, loss_state, batch)
        updates, new_opt = tx.update(gp, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_centers = loss_state.centers - 0.5 * gc / cfg.loss.center_lamda
        new_loss_state = loss_state._replace(centers=new_centers)
        return (new_params, new_bs, new_opt, new_loss_state), loss

    return step


def train_video(cfg: Config, dataset: VideoTrackletDataset,
                epochs: int = 25, batch_size: int = 8,
                seq_len: int = 10, mesh=None) -> Tuple[dict, list]:
    """Ref train (:110-138). Returns (variables, loss_stats).

    Data-parallel over `mesh` (all local devices when None): params/opt-state
    replicated, batches sharded over axis "data" — the native counterpart of
    the reference's DDP path (ref distributed_train :142-181, ddp_trigger
    train_utils.py:45-77); XLA's GSPMD inserts the gradient all-reduce and
    the global 3D-BN statistics over ICI."""
    from ..parallel import fit_mesh, place_batch, replicate

    if mesh is None:
        mesh = fit_mesh(batch_size)
    assert batch_size % mesh.devices.size == 0, (
        f"batch_size {batch_size} not divisible by mesh {mesh.devices.size}")
    num_classes = len(dataset.labels)
    model = build_model("video_resnet50", num_classes=num_classes,
                        dtype=jnp.dtype(cfg.model.dtype))
    dummy = jnp.zeros((2, seq_len, dataset.height, dataset.width, 3))
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(cfg.train.seed), dummy)
    # MADGRAD(lr=1e-4, wd=5e-4, momentum=0) + StepLR(300, 0.5) — the
    # reference's exact video optimizer (ref video_reid_train.py:115-116)
    from .optim import madgrad
    schedule = optax.exponential_decay(1e-4, transition_steps=300,
                                       decay_rate=0.5, staircase=True)
    # no gradient clipping: the reference applies none on the video path
    # (ref video_reid_train.py:115 builds bare MADGRAD)
    tx = madgrad(schedule, momentum=0.0, weight_decay=5e-4)
    loss_state = init_hybrid_state(jax.random.PRNGKey(1), num_classes, 2048)
    step = make_video_train_step(cfg, model, tx)

    carry = (variables["params"], variables.get("batch_stats", {}),
             tx.init(variables["params"]), loss_state)
    carry = replicate(mesh, carry)
    losses = []
    rng = np.random.default_rng(cfg.train.seed)
    for epoch in range(epochs):
        for batch in dataset.batches(batch_size, rng):
            batch = place_batch(mesh, batch)
            carry, loss = step(carry, batch)
            losses.append(float(loss))
    params, batch_stats = carry[0], carry[1]
    return {"params": params, "batch_stats": batch_stats}, losses
