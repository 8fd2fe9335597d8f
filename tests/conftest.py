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

# Smoke tier (`pytest -m smoke`): one fast path through every subsystem for
# inner-loop development. The FULL suite stays the round gate — this subset
# trades coverage breadth (per-backbone/per-variant programs) for a <5 min
# wall on the 1-CPU host, where the full suite's ~25 compile-bound tests
# cost ~20 min in XLA:CPU AOT cache loads alone (ROUND_NOTES r4). Curated
# here (not per-file markers) so the tier is auditable in one place.
_SMOKE = {
    # ops: distance kernels, re-rank identity, search policy
    "test_sqeuclidean_matches_numpy", "test_l1_matches_numpy",
    "test_jaccard_matches_oracle", "test_search_policy_tiers",
    "test_dbscan_matches_sklearn", "test_camera_debias_properties",
    # tracking: kalman, assignment, lifecycle, per-method behaviors
    "test_kalman_init_predict_update_converges", "test_iou_identity",
    "test_greedy_rounds_equals_sequential",
    "test_tracker_stable_ids_two_targets",
    "test_byte_low_score_keeps_track_alive",
    # chunked path incl. caps
    "test_frame_crop_cap_identical_when_sufficient",
    "test_frame_crop_cap_zero_means_uncapped",
    # metrics: CLEAR/Identity/HOTA + TrackEval preproc + JSON safety
    "test_mot16_distractor_matched_det_removed",
    "test_identity_counts_feasible_pairs_not_clear_matches",
    "test_evaluate_mot16_json_safe_and_pooling_optin",
    # data: parsers, samplers, device aug
    "test_market_parser", "test_pk_sampler_structure",
    "test_augment_batch_properties",
    # losses: torch-oracle triplet + the hybrid driver loss
    "test_wrt_matches_torch_oracle", "test_hybrid_loss_runs",
    "test_dcc_loss_and_update",
    # models: flagship backbone forward (one compile)
    "test_res18_family_shapes[seres18]",
    # native loader
    "test_native_builds", "test_decode_matches_pil",
    # quantize: int8 conv oracle
    "test_quantized_conv_oracle",
    # eval: CMC/mAP oracle
    "test_cmc_map_matches_reference_oracle",
    # detector + yolo: decode/NMS semantics
    "test_decode_yolo_grid_alignment", "test_nms_fixed_matches_greedy_oracle",
    "test_decode_finds_planted_peaks",
    # utils: checkpointing, timers
    "test_checkpoint_roundtrip", "test_stage_timer",
    # train: schedules + optimizer oracle (no train-step compile)
    "test_warmup_cosine_shape", "test_madgrad_matches_pytorch_oracle",
    # parallel: one 8-device sharded op
    "test_sharded_gallery_topk_matches_dense",
    # gan: loss + grouping (no driver compile)
    "test_lsro_loss", "test_get_groups_separates_appearance",
    # cli: config plumbing only
    "test_method_presets", "test_gmc_translation",
    # golden parity vs reference oracle
    "test_jaccard_matches_reference_oracle",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SMOKE:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
