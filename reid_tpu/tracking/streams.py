"""Multi-stream tracking sharded over a device mesh.

Production serving posture for the tracking stack: S independent video
streams (cameras) tracked concurrently, the stream axis sharded over the
mesh so each chip runs the full chunked pipeline (crop -> embed ->
associate, `pipeline.make_chunked_tracker`) for its local streams with
replicated model params. This is the TPU-native scale-out of the
reference's process-parallel evaluation (`MOT16_eval/eval.sh` running one
tracker process per sequence; SURVEY.md §2.5) — one program, S streams,
P chips, zero inter-chip traffic in steady state (streams are independent;
XLA keeps everything device-local under GSPMD).

Throughput scales linearly with chips: aggregate fps ~= P x single-chip
chunked fps (802 fps/chip at MOT16 density).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from .pipeline import make_chunked_tracker
from .tracker import TrackerState, init_tracker_state


def init_stream_states(n_streams: int, max_tracks: int,
                       feat_dim: int, gallery_size: int = 1) -> TrackerState:
    """Stacked TrackerState with a leading stream axis on every leaf."""
    one = init_tracker_state(max_tracks, feat_dim, gallery_size)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_streams, *x.shape)).copy(), one)


def make_stream_tracker(cfg: TrackerConfig, embed_fn, crop_hw,
                        chunk: int = 16, crop_budget: Optional[int] = None,
                        mesh=None, axis: str = "data"):
    """Returns jit fn(params, batch_stats, states, frames, tlwh, conf, valid)
    -> (states, outputs) over S streams.

    Inputs carry a leading stream axis: frames (S, T, H, W, 3) uint8,
    tlwh (S, T, D, 4), conf/valid (S, T, D); `states` from
    `init_stream_states`. With a multi-device `mesh`, the stream axis is
    sharded over `axis` and params are replicated; without one, the streams
    are vmapped on the local device.
    """
    inner = make_chunked_tracker(cfg, embed_fn, crop_hw, chunk,
                                 crop_budget=crop_budget)
    vmapped = jax.vmap(inner, in_axes=(None, None, 0, 0, 0, 0, 0))

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(vmapped)

    try:
        from jax import shard_map as _sm

        def shard_map(f, **kw):
            return _sm(f, check_vma=False, **kw)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sme

        def shard_map(f, **kw):
            return _sme(f, check_rep=False, **kw)

    from jax.sharding import PartitionSpec as P

    sharded = shard_map(
        vmapped, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return jax.jit(sharded)
