"""On-device multi-object tracking.

TPU-native re-design of the capability held by the reference's
`yolov8_tracking` submodule + overlay files (`modification_tracking/`,
`modification_deepsort/`, SURVEY.md §2.3): Kalman predict/update per track,
appearance (cosine EMA gallery) + DIoU motion costs, gated assignment, track
lifecycle (tentative -> confirmed -> deleted with N_INIT/MAX_AGE), camera
motion compensation, MOT txt output.

Everything per-frame runs as ONE jit program over a fixed-capacity
track-slot SoA (masks instead of Python track objects) — this removes the
reference's per-frame device->host hop (`track_yolov5.py:253` det.cpu()).
"""

from .gmc import estimate_affine
from .methods import method_config
from .kalman import (
    kalman_gating_distance,
    kalman_initiate,
    kalman_predict,
    kalman_update,
)
from .costs import diou_matrix, iou_matrix, appearance_cost
from .assignment import auction_assign, hungarian_host
from .tracker import TrackerState, Tracker, init_tracker_state
from .metrics import (
    combine_sequences,
    combine_sequences_hota,
    evaluate_clear_identity,
    evaluate_hota,
    evaluate_mot16,
    load_mot_frames,
    load_mot_gt,
    preprocess_mot,
)
from .mot import load_mot_detections, write_mot_txt
from .streams import init_stream_states, make_stream_tracker
