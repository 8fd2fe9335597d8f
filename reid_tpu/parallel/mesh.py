"""Device-mesh utilities — the framework's distributed layer.

Replaces the reference's parallelism inventory (SURVEY.md §2.5):
  - nn.DataParallel / DDP(NCCL|Gloo)  -> batch sharding over a `Mesh` axis
    "data" with params replicated; XLA inserts the gradient all-reduce over
    ICI (no rendezvous, no process groups — ref train_utils.py:45-77 gone).
  - faiss IndexShards multi-GPU search -> `sharded_gallery_topk`: gallery
    sharded over the mesh, per-shard top-k + all-gather merge
    (ref faiss_utils.py:121-139).

BatchNorm needs no special sync: under GSPMD a `jnp.mean` over a
batch-sharded array is a global mean (collective inserted by XLA).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Multi-host bootstrap (SURVEY §7.2-8 hardening; role of the
    reference's `ddp_trigger` NCCL/Gloo rendezvous, train_utils.py:45-77).

    Call once per process BEFORE any jax computation; afterwards
    `jax.devices()` spans the whole slice/pod and `make_mesh()` builds a
    global mesh — every sharded path in this package (train DP, sharded
    Jaccard/top-k, stream tracking) then scales across hosts unchanged,
    with XLA routing collectives over ICI within a slice and DCN across
    slices. With no arguments, JAX auto-discovers the TPU-pod topology
    from the environment (the normal TPU-VM case). Returns the process id.

    Single-host processes can skip this entirely — every mesh path in this
    package works on local devices without it (the default in this
    environment, which has one chip).
    """
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    return jax.process_index()


def default_mesh(axis: str = "data") -> Mesh:
    """Mesh over ALL local devices — the product train/eval loops' default
    (role of the reference's nn.DataParallel-wraps-everything default,
    image_reid_train.py:622,635). Size 1 on a single chip; the same code
    path then runs unsharded."""
    return make_mesh(0, axis)


def fit_mesh(batch_size: int, axis: str = "data") -> Mesh:
    """Default mesh for a train loop: the largest local-device count that
    divides `batch_size` (nn.DataParallel likewise splits whatever batch it
    gets over however many GPUs fit)."""
    n = len(jax.devices())
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(n, axis)


# Per-sample batch entries (leading dim = batch) — everything else in a batch
# dict (aug PRNG key, xbm gate scalar) is replicated.
_BATCH_KEYS = frozenset(
    {"images", "labels", "cams", "seqs", "weights", "conf", "valid", "tlwh"})


def place_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Device-place one train/eval batch: per-sample arrays sharded over the
    mesh axis, auxiliaries replicated. The explicit device_put doubles as the
    H2D prefetch boundary (role of ref `images.cuda(non_blocking=True)`)."""
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        if k in _BATCH_KEYS and v.ndim >= 1:
            spec = P(axis, *([None] * (v.ndim - 1)))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def make_mesh_2d(n_data: int, n_model: int,
                 axes=("data", "model")) -> Mesh:
    """2D mesh for combined data x tensor parallelism."""
    devs = np.asarray(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devs, axes)


def shard_params_tp(mesh: Mesh, params, min_size: int = 1 << 16,
                    model_axis: str = "model"):
    """Tensor-parallel parameter placement: shard the *output* dim of large
    2D kernels (classifiers / wide Dense layers) over the model axis, shard
    large embedding-style tables (centers, DCC luts, cam_bias) over their
    first dim, replicate everything else. GSPMD inserts the collectives —
    the classifier matmul runs column-parallel with an all-gather of logits
    only where consumed (CE/DCC reduce locally first)."""
    size = mesh.shape[model_axis]

    def place(x):
        spec = P()
        if hasattr(x, "ndim") and x.size >= min_size:
            if x.ndim == 2 and x.shape[1] % size == 0:
                spec = P(None, model_axis)
            elif x.ndim == 2 and x.shape[0] % size == 0:
                spec = P(model_axis, None)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of arrays batch-sharded over the mesh axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def sharded_gallery_topk(
    mesh: Mesh,
    query: jnp.ndarray,     # (Q, D) replicated
    gallery: jnp.ndarray,   # (N, D), N divisible by mesh size (pad upstream)
    k: int,
    axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed brute-force kNN: per-shard top-k then global merge.

    The faiss `IndexShards` replacement: each device scans its gallery shard
    (local (Q, N/p) distance + top-k), the (Q, k) candidates are all-gathered
    and reduced to a global (Q, k). Collective rides ICI via shard_map.
    """
    n = gallery.shape[0]
    p = mesh.devices.size
    shard = n // p

    try:
        from jax import shard_map as _sm

        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme

        def shard_map(f, mesh, in_specs, out_specs):
            return _sme(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                        check_rep=False)

    def local_topk(q, g_shard):
        # g_shard: (N/p, D) local block
        qf = q.astype(jnp.float32)
        gf = g_shard.astype(jnp.float32)
        d = (
            jnp.sum(qf * qf, 1, keepdims=True)
            + jnp.sum(gf * gf, 1)[None, :]
            - 2.0 * jnp.dot(qf, gf.T, preferred_element_type=jnp.float32)
        )
        neg, idx = jax.lax.top_k(-d, k)
        base = jax.lax.axis_index(axis) * shard
        # gather all shards' candidates, merge to global top-k
        all_d = jax.lax.all_gather(-neg, axis)        # (p, Q, k) distances
        all_i = jax.lax.all_gather(idx + base, axis)  # (p, Q, k) global idx
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(q.shape[0], p * k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], p * k)
        mneg, mpos = jax.lax.top_k(-all_d, k)
        return -mneg, jnp.take_along_axis(all_i, mpos, axis=1)

    fn = shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
    )
    return fn(query, gallery)
