"""Flax model zoo. Reference: `reid/backbones/`, `gan/backbones/`."""

from .factory import build_model, MODEL_REGISTRY
from .seres18 import SERes18IBN, seres18_ibn
