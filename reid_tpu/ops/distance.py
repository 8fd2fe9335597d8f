"""Tiled pairwise-distance kernels + top-k gallery search.

TPU-native replacement for faiss brute-force GPU kNN
(ref `reid/faiss_utils.py:56-118` `search_raw_array_pytorch` -> bfKnn).

Two paths:
  * `_pallas_sqeuclidean` — Pallas kernel, (TM, TN) output tiles computed as
    |x|^2 + |y|^2 - 2 x yᵀ with the cross-term on the MXU. Tiles are sized to
    VMEM; the K (feature) axis is kept whole (ReID feature dims <= 3k: a
    256x3072 f32 tile is 3 MB — fits comfortably).
  * jnp fallback — identical math, used on CPU (tests) and for tiny inputs
    where one fused XLA matmul wins.

`topk_neighbors` = blocked distance + `jax.lax.top_k` per query block, so
gallery-scale search (N≈20-50k) never materializes the full N x N matrix.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; keep importable on CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------- jnp path

def _jnp_sqeuclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xx = jnp.sum(xf * xf, axis=-1, keepdims=True)
    yy = jnp.sum(yf * yf, axis=-1, keepdims=True)
    cross = jnp.dot(xf, yf.T, preferred_element_type=jnp.float32)
    return jnp.maximum(xx + yy.T - 2.0 * cross, 0.0)


# ------------------------------------------------------------- pallas path

def _sqeuclidean_kernel(x_ref, y_ref, out_ref):
    """One (TM, TN) tile: ||x_i - y_j||^2 via MXU cross-term."""
    x = x_ref[...].astype(jnp.float32)
    y = y_ref[...].astype(jnp.float32)
    cross = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    yy = jnp.sum(y * y, axis=1, keepdims=True)
    out_ref[...] = jnp.maximum(xx + yy.T - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n"))
def _pallas_sqeuclidean(x, y, tile_m: int = 256, tile_n: int = 512):
    m, d = x.shape
    n = y.shape[0]
    mp, np_, dp = _round_up(m, tile_m), _round_up(n, tile_n), _round_up(d, 128)
    xp = jnp.zeros((mp, dp), x.dtype).at[:m, :d].set(x)
    yp = jnp.zeros((np_, dp), y.dtype).at[:n, :d].set(y)
    out = pl.pallas_call(
        _sqeuclidean_kernel,
        grid=(mp // tile_m, np_ // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
    )(xp, yp)
    return out[:m, :n]


# ------------------------------------------------------------------ public

def pairwise_sqeuclidean(
    x: jnp.ndarray, y: jnp.ndarray, use_pallas: Optional[bool] = None
) -> jnp.ndarray:
    """Squared Euclidean distance matrix (M, N), float32."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and _on_tpu() and x.shape[0] * y.shape[0] >= 1 << 18
    if use_pallas:
        return _pallas_sqeuclidean(x, y)
    return _jnp_sqeuclidean(x, y)


def pairwise_cosine(
    x: jnp.ndarray, y: jnp.ndarray, use_pallas: Optional[bool] = None
) -> jnp.ndarray:
    """1 - cosine similarity; normalizes then reuses the sqeuclidean kernel
    (for unit vectors, cos_dist = sqeuclid / 2)."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    return 0.5 * pairwise_sqeuclidean(xn, yn, use_pallas)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "tile_k"))
def _pallas_l1(x, y, tile_m: int = 128, tile_n: int = 128, tile_k: int = 2048):
    """Pairwise L1, the Jaccard min-sum workhorse (see ops/rerank.py): for
    rows that sum to 1, sum_k min(a_k, b_k) = 1 - 0.5 * L1(a, b)."""
    m, d = x.shape
    n = y.shape[0]
    mp, np_, dp = _round_up(m, tile_m), _round_up(n, tile_n), _round_up(d, tile_k)
    xp = jnp.zeros((mp, dp), x.dtype).at[:m, :d].set(x)
    yp = jnp.zeros((np_, dp), y.dtype).at[:n, :d].set(y)

    def kernel(x_ref, y_ref, out_ref):
        k_idx = pl.program_id(2)

        @pl.when(k_idx == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        x_ = x_ref[...].astype(jnp.float32)
        y_ = y_ref[...].astype(jnp.float32)
        out_ref[...] += jnp.sum(jnp.abs(x_[:, None, :] - y_[None, :, :]), axis=-1)

    out = pl.pallas_call(
        kernel,
        grid=(mp // tile_m, np_ // tile_n, dp // tile_k),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
    )(xp, yp)
    return out[:m, :n]


def pairwise_l1(
    x: jnp.ndarray, y: jnp.ndarray, use_pallas: Optional[bool] = None,
    block: int = 128,
) -> jnp.ndarray:
    """Pairwise L1 (cityblock) distance matrix (M, N), float32."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and _on_tpu()
    if use_pallas:
        return _pallas_l1(x, y)
    m, d = x.shape
    mp = _round_up(m, block)
    xp = jnp.concatenate([x, jnp.zeros((mp - m, d), x.dtype)], axis=0)

    def body(xb):
        return jnp.sum(jnp.abs(xb[:, None, :] - y[None, :, :]), axis=-1)

    out = jax.lax.map(body, xp.reshape(mp // block, block, d))
    return out.reshape(mp, y.shape[0])[:m]


@functools.partial(jax.jit, static_argnames=("k", "block_q", "metric"))
def topk_neighbors(
    query: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    block_q: int = 1024,
    metric: str = "sqeuclidean",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest gallery rows per query: (dists (Q,k), idx (Q,k)).

    Blocked over queries so only (block_q, N) distance slabs exist at once —
    the faiss `bfKnn` replacement for gallery search & Jaccard initial
    ranking. Returns *ascending* distances.
    """
    q, d = query.shape
    n = gallery.shape[0]
    qp = _round_up(q, block_q)
    pad = jnp.full((qp - q, d), 1e6, query.dtype)
    qpad = jnp.concatenate([query, pad], axis=0)

    def body(qblock):
        if metric == "cosine":
            dist = pairwise_cosine(qblock, gallery, use_pallas=False)
        else:
            dist = pairwise_sqeuclidean(qblock, gallery, use_pallas=False)
        neg, idx = jax.lax.top_k(-dist, k)
        return -neg, idx

    blocks = qpad.reshape(qp // block_q, block_q, d)
    dists, idxs = jax.lax.map(body, blocks)
    return (dists.reshape(qp, k)[:q], idxs.reshape(qp, k)[:q])
