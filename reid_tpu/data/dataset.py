"""ReIDDataset — host-side record store with image cache + pseudo-label merge.

Ref `reid/data_prepare.py:11-90` (reidDataset): PIL load + transform,
per-class stats (get_class_stats), continual-phase pseudo-label merging
(`add_pseudo` :51-67 relabels pseudo ids after the real ones and flags each
sample real=0/pseudo=1), cross-domain switch (`set_cross_domain` :40-44).

The torchvision transform chain moves to device (transforms.augment_batch);
this class only decodes + resizes to the static (H, W) once, caching uint8
arrays (role of the hdf5 cache, ref train_utils.py:26-42).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

Record = Tuple[str, int, int, int]


class ReIDDataset:
    def __init__(self, records: Sequence[Record], num_pids: int,
                 height: int = 256, width: int = 128, cache: bool = True,
                 hdf5_cache: str = ""):
        self.records: List[Record] = list(records)
        self.num_train_pids = num_pids
        self.height = height
        self.width = width
        # per-sample weight flag: 0 = real, 1 = pseudo (ref :89)
        self.flags: List[int] = [0] * len(self.records)
        self.cross_domain = False
        self._cache_enabled = cache
        self._cache: dict = {}
        # optional disk-backed cache (role of ref train_utils.py:26-42 h5py
        # image cache); entries are written lazily on first decode.
        self._h5 = None
        if hdf5_cache:
            import h5py
            self._h5 = h5py.File(hdf5_cache, "a")
            self._h5ds = self._h5.require_dataset(
                "images", shape=(len(self.records), height, width, 3),
                dtype="uint8")
            self._h5done = self._h5.require_dataset(
                "done", shape=(len(self.records),), dtype="uint8")

    def __len__(self):
        return len(self.records)

    # ---- continual phase -------------------------------------------------
    def add_pseudo(self, pseudo_records: Sequence[Record], num_new: int):
        """Append pseudo-labeled samples; pseudo pids come pre-offset by the
        caller (ref add_pseudo relabels to num_train_pids + cluster id)."""
        self.records.extend(pseudo_records)
        self.flags.extend([1] * len(pseudo_records))
        self.num_train_pids += num_new

    def set_cross_domain(self):
        self.cross_domain = True

    # ---- stats -----------------------------------------------------------
    @property
    def labels(self) -> np.ndarray:
        return np.asarray([r[1] for r in self.records], np.int64)

    @property
    def cams(self) -> np.ndarray:
        return np.asarray([r[2] for r in self.records], np.int64)

    @property
    def seqs(self) -> np.ndarray:
        return np.asarray([r[3] for r in self.records], np.int64)

    def get_class_stats(self) -> np.ndarray:
        """Per-class sample counts (ref get_class_stats usage,
        image_reid_train.py:40-41)."""
        counts = np.bincount(self.labels, minlength=self.num_train_pids)
        return np.maximum(counts, 1)

    # ---- image access ----------------------------------------------------
    def load_image(self, index: int) -> np.ndarray:
        """uint8 (H, W, 3), resized once and cached."""
        if index in self._cache:
            return self._cache[index]
        if self._h5 is not None and self._h5done[index]:
            return self._h5ds[index]
        from PIL import Image

        path = self.records[index][0]
        with Image.open(path) as im:
            im = im.convert("RGB").resize(
                (self.width, self.height), Image.BILINEAR
            )
            arr = np.asarray(im, np.uint8)
        if self._h5 is not None:
            self._h5ds[index] = arr
            self._h5done[index] = 1
        if self._cache_enabled:
            self._cache[index] = arr
        return arr

    def _decode_batch_native(self, indices: Sequence[int]) -> dict:
        """Batch-decode uncached JPEGs with the C++ loader (pthread pool +
        libjpeg, reid_tpu.native); returns {index: array} (empty when the
        native path is unavailable — callers fall back to PIL)."""
        missing = [i for i in indices if i not in self._cache]
        if not missing:
            return {}
        paths = [self.records[i][0] for i in missing]
        if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
            return {}
        try:
            from .. import native
            if not native.available():
                return {}
            batch = native.decode_batch(paths, self.height, self.width)
        except Exception:
            return {}
        decoded = dict(zip(missing, batch))
        if self._cache_enabled:
            self._cache.update(decoded)
        return decoded

    def preload(self, images: Sequence[np.ndarray]):
        """Inject decoded images directly (in-memory datasets: tests, the
        multi-chip dryrun) — bypasses file IO entirely."""
        for i, arr in enumerate(images):
            self._cache[i] = np.asarray(arr, np.uint8)
        return self

    def gather(self, indices: Sequence[int]) -> dict:
        """Assemble a host batch dict for the given indices."""
        decoded = self._decode_batch_native(indices)
        images = np.stack([
            decoded[i] if i in decoded else self.load_image(i)
            for i in indices
        ])
        recs = [self.records[i] for i in indices]
        return {
            "images": images,
            "labels": np.asarray([r[1] for r in recs], np.int32),
            "cams": np.asarray([r[2] for r in recs], np.int32),
            "seqs": np.asarray([r[3] for r in recs], np.int32),
            "weights": np.asarray([float(self.flags[i]) for i in indices],
                                  np.float32),
        }


def synthetic_dataset(n: int = 16, num_pids: int = 4, height: int = 32,
                      width: int = 16, num_cams: int = 2,
                      seed: int = 0, cam_offset: int = 0,
                      palette_seed: int = 0) -> ReIDDataset:
    """In-memory color-separable synthetic dataset — the no-filesystem
    fixture for multi-device tests and the driver's multi-chip dryrun.
    `palette_seed` fixes identity colors across query/gallery splits;
    `cam_offset` gives a split distinct camera ids (CMC junk rules mask
    same-id same-cam matches)."""
    rng = np.random.default_rng(seed)
    palette = np.random.default_rng(palette_seed).integers(
        40, 220, (num_pids, 3))
    records = [(f"<synthetic-{i}>", i % num_pids, i % num_cams + cam_offset, 0)
               for i in range(n)]
    ds = ReIDDataset(records, num_pids, height, width)
    images = []
    for i in range(n):
        base = np.broadcast_to(palette[i % num_pids],
                               (height, width, 3)).astype(np.int64)
        noise = rng.integers(-25, 25, (height, width, 3))
        images.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    return ds.preload(images)
