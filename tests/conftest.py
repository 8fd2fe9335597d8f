"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the standard JAX idiom for testing pjit/collectives without a TPU
slice (SURVEY.md §4). Bench and the driver's graft entry use the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins the TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import tempfile

import jax

# The image's sitecustomize imports jax before conftest runs, so the env var
# alone is too late — update the config before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NOTE: jax_disable_most_optimizations was tried here (train-step compile
# 37.6s -> 16.2s) but rejected: unoptimized HLO executes 10-50x slower, which
# blows up the multi-step train/eval tests far beyond the compile savings.

# Persistent compilation cache: the suite is compile-bound (every train-step
# variant costs ~30 s to build on CPU); repeat runs hit the disk cache.
_cache_dir = os.path.join(tempfile.gettempdir(), "reid_tpu_xla_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
