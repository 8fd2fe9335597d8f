"""Small training utilities. Ref `reid/train_utils.py`.

- `mixup_batch`      — mixup augmentation (ref :173-194)
- `plot_loss`        — loss-curve artifact (ref :80-91 -> images/loss_curve.png)
- `model_size_mb`    — parameter-size check (ref :161-170)
- `redetection`      — batched person re-detection crop hook (ref :105-147);
                       the detector is pluggable (the reference loads a YOLOv5
                       crowdhuman model at module scope, :102)
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mixup_batch(key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray,
                num_classes: int, alpha: float = 0.2):
    """Mixup (ref train_utils.py:173-194): convex-combine a shuffled copy.

    Returns (mixed images, soft labels (B, C))."""
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha)
    perm = jax.random.permutation(k2, images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[perm]
    onehot = jax.nn.one_hot(labels, num_classes)
    soft = lam * onehot + (1.0 - lam) * onehot[perm]
    return mixed, soft


def plot_loss(loss_stats: Sequence[float],
              out: str = "images/loss_curve.png") -> Optional[str]:
    """Save a loss-curve PNG (ref :80-91). No-op if matplotlib is absent."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    plt.figure(figsize=(8, 4))
    plt.plot(loss_stats)
    plt.xlabel("step")
    plt.ylabel("loss")
    plt.tight_layout()
    plt.savefig(out)
    plt.close()
    return out


def model_size_mb(params) -> float:
    """Parameter footprint in MB (ref check_model_size :161-170)."""
    total = sum(np.prod(p.shape) * np.dtype(p.dtype).itemsize
                for p in jax.tree_util.tree_leaves(params))
    return float(total) / (1 << 20)


def redetection(detector: Callable, images: np.ndarray,
                conf_thres: float = 0.4) -> np.ndarray:
    """Re-crop each image to the highest-confidence person detection.

    Ref train_utils.py:105-147: batched detector pass, keep the best box per
    image, crop (fall back to the full image when nothing is found).
    `detector(images) -> list of (boxes_tlwh (M,4), scores (M,))` per image —
    the detector itself is pluggable (YOLO in the reference).
    """
    out = []
    dets = detector(images)
    for img, (boxes, scores) in zip(images, dets):
        if len(scores) == 0 or scores.max() < conf_thres:
            out.append(img)
            continue
        x, y, w, h = boxes[int(np.argmax(scores))]
        h_img, w_img = img.shape[:2]
        x0, y0 = int(max(0, x)), int(max(0, y))
        x1, y1 = int(min(w_img, x + w)), int(min(h_img, y + h))
        if x1 <= x0 or y1 <= y0:
            out.append(img)
            continue
        crop = img[y0:y1, x0:x1]
        from PIL import Image
        out.append(np.asarray(Image.fromarray(crop).resize(
            (w_img, h_img), Image.BILINEAR)))
    return np.stack(out)
