"""Data layer: dataset parsers, PK sampler, fused device-side augmentation,
host prefetch loader. Reference: `reid/datasets/`, `reid/data_prepare.py`,
`reid/data_transforms.py`, `reid/data_augment.py`, `reid/train_utils.py`."""

from .datasets import BaseImageDataset, DukeMTMC, Market1501, VeRi776, build_dataset
from .dataset import ReIDDataset, synthetic_dataset
from .sampler import pk_epoch_indices
from .transforms import (
    augment_batch,
    normalize_batch,
    resize_batch,
)
from .loader import PrefetchLoader, make_train_loader, make_eval_loader
