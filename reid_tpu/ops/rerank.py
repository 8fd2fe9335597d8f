"""k-reciprocal Jaccard re-ranking (Zhong et al., CVPR'17), TPU-native.

Replaces ref `reid/faiss_utils.py:142-244` (faiss GPU kNN + numpy loops) with
fully vectorized masked linear algebra:

  1. initial ranking       -> `topk_neighbors` (Pallas/XLA, replaces bfKnn)
  2. k-reciprocal sets     -> boolean scatter F, R = F & Fᵀ  (no loops)
  3. local query expansion -> one boolean matmul (the 2/3-overlap rule)
  4. V encoding            -> masked softmax of 2*sim over the expansion set
  5. query expansion (k2)  -> averaging matmul A_{k2} @ V
  6. Jaccard min-sum       -> since V rows sum to 1,
                              sum_k min(V_i, V_j) = 1 - L1(V_i, V_j)/2,
                              so the O(N^3) "min kernel" becomes one blocked
                              pairwise-L1 (Pallas `pairwise_l1`)
  7. J = 1 - tm / (2 - tm), clipped at 0  (ref :237-241)

Numerics match the reference; features are expected L2-normalized (the
reference computes dist = 2 - 2*sim, ref :202).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .distance import pairwise_l1, topk_neighbors


def _topk_mask(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Boolean (N, N) membership mask from top-k index rows (N, k)."""
    rows = jnp.arange(idx.shape[0])[:, None]
    m = jnp.zeros((idx.shape[0], n), bool)
    return m.at[rows, idx].set(True)


def _minsum_topk_rows(v_rows: jnp.ndarray, v_all: jnp.ndarray, s: int,
                      block_i: int = 128) -> jnp.ndarray:
    """tm[i, j] = sum_k min(v_rows[i, k], v_all[j, k]) via top-S
    sparsification of the v_rows side (the V encoding is a softmax over the
    k-reciprocal expansion set — a few hundred nonzeros — so the top-S
    entries carry essentially all mass). Per row-block, the S support columns
    are gathered from v_all and reduced with a broadcast min: HBM traffic
    drops from O(M*N*K) to O(M*N*S). Rectangular so it also serves the
    row-sharded mesh path (v_rows = this shard's (N/p, N) block).
    Measured on v5e at N=23k square: 3.2 s vs 7.5 s for the dense Pallas-L1
    path, max |error| ~2e-7 when the true support fits in S."""
    m, n = v_rows.shape[0], v_all.shape[0]
    nb = -(-m // block_i)
    mpad = nb * block_i
    vp = (jnp.zeros((mpad, v_rows.shape[1]), v_rows.dtype).at[:m].set(v_rows)
          if mpad != m else v_rows)
    val, idx = jax.lax.top_k(vp, s)                    # (Mp, S)

    def body(args):
        vb, ib = args                                  # (Bi, S) each
        g = v_all[:, ib.reshape(-1)].reshape(n, block_i, s)
        return jnp.sum(jnp.minimum(vb[None], g), axis=-1)   # (N, Bi)

    out = jax.lax.map(body, (val.reshape(nb, block_i, s),
                             idx.reshape(nb, block_i, s)))
    return jnp.transpose(out, (0, 2, 1)).reshape(mpad, n)[:m]


@functools.partial(jax.jit, static_argnames=("s", "block_i"))
def _minsum_topk(v: jnp.ndarray, s: int, block_i: int = 128) -> jnp.ndarray:
    """Square min-sum via `_minsum_topk_rows` (see there)."""
    return _minsum_topk_rows(v, v, s, block_i=block_i)


@functools.partial(jax.jit, static_argnames=("k1", "k2", "sparse_s"))
def compute_jaccard_distance(
    features: jnp.ndarray, k1: int = 20, k2: int = 6,
    sparse_s: Optional[int] = None,
) -> jnp.ndarray:
    """Jaccard distance matrix (N, N) float32. Ref faiss_utils.py:149-244.

    `sparse_s` enables the top-S approximate min-sum (see `_minsum_topk`) —
    the big-gallery mode: ~2.4x faster at N=23k and O(N^2 * S) instead of
    O(N^3) HBM traffic, numerically exact whenever each V row has <= S
    nonzeros (the k-reciprocal expansion sets are that sparse in practice;
    S=512 is a safe default for k1=20, k2=6)."""
    feats = features.astype(jnp.float32)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)

    # faiss search(x, k1) returns k1 columns with self first; the reference's
    # k_reciprocal_neigh slices [:k1+1] of those k1 columns (a no-op clamp),
    # so the forward set is self + (k1-1) neighbors — NOT k1+1 columns.
    _, initial_rank = topk_neighbors(feats, feats, k=k1)
    return _jaccard_from_rank(feats, initial_rank, k1=k1, k2=k2,
                              sparse_s=sparse_s)


def compute_jaccard_distance_ivf(
    features: jnp.ndarray, k1: int = 20, k2: int = 6,
    sparse_s: Optional[int] = None, nlist: int = 256, nprobe: int = 32,
    key=None,
) -> jnp.ndarray:
    """Jaccard with an IVF approximate initial ranking — the reference's
    big-gallery `search_option` IVF index paths (ref faiss_utils.py:158-181
    GpuIndexIVFFlat): the O(N^2 D) self-kNN becomes O(N * nprobe/nlist * N D)
    through `ops.ivf`. The re-ranking math downstream is unchanged; ranking
    recall follows the IVF recall (exact when nprobe == nlist)."""
    from .ivf import build_ivf, ivf_topk

    feats = features.astype(jnp.float32)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    if key is None:
        key = jax.random.PRNGKey(0)
    index = build_ivf(key, feats, nlist=min(nlist, feats.shape[0]))
    _, initial_rank = ivf_topk(index, feats, k=k1,
                               nprobe=min(nprobe, nlist))
    # IVF can return -1 pads if a probed bucket set is smaller than k1;
    # clamp to self so downstream masks stay valid
    initial_rank = jnp.where(
        initial_rank >= 0, initial_rank,
        jnp.arange(feats.shape[0])[:, None])
    return _jaccard_from_rank(feats, initial_rank, k1=k1, k2=k2,
                              sparse_s=sparse_s)


@functools.partial(jax.jit, static_argnames=("k1", "k2", "sparse_s"))
def _jaccard_from_rank(
    feats: jnp.ndarray, initial_rank: jnp.ndarray, k1: int, k2: int,
    sparse_s: Optional[int] = None,
) -> jnp.ndarray:
    """Shared Jaccard body given unit-norm features + top-k1 ranking."""
    n = feats.shape[0]
    k_half = int(round(k1 / 2))

    # k-reciprocal masks: R[i,j] = j in top(i) and i in top(j)  (ref :142-146)
    f_full = _topk_mask(initial_rank, n)
    f_half = _topk_mask(initial_rank[:, : k_half + 1], n)
    r_full = f_full & f_full.T
    r_half = f_half & f_half.T

    # local expansion (ref :191-198): candidate c of R[i] contributes R_h[c]
    # when |R_h[c] ∩ R[i]| > 2/3 |R_h[c]|.
    rf = r_full.astype(jnp.float32)
    rh = r_half.astype(jnp.float32)
    overlap = jnp.dot(rf, rh.T, preferred_element_type=jnp.float32)  # (i, c)
    sizes_h = jnp.sum(rh, axis=1)                                    # |R_h[c]|
    cond = r_full & (overlap > (2.0 / 3.0) * sizes_h[None, :])
    expansion = r_full | (
        jnp.dot(cond.astype(jnp.float32), rh,
                preferred_element_type=jnp.float32) > 0
    )

    # V: softmax of similarity over the expansion set (ref :199-207).
    # -dist = 2*sim - 2; the constant cancels inside softmax.
    # HIGHEST precision: TPU f32 matmuls default to one-pass bf16 on the MXU
    # (~1e-3 relative error) — too coarse for the similarity logits that set
    # the V weights the reference computes in full f32.
    sim = jnp.dot(feats, feats.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    logits = jnp.where(expansion, 2.0 * sim, -jnp.inf)
    v = jax.nn.softmax(logits, axis=1)

    # query expansion over the k2 original neighbors (ref :211-216).
    if k2 != 1:
        a = _topk_mask(initial_rank[:, :k2], n).astype(jnp.float32)
        v = jnp.dot(a, v, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) / k2
        # the dense min-sum identity below (sum_k min = 1 - L1/2) needs row
        # sums EXACTLY 1; renormalize away the matmul rounding residue
        v = v / jnp.sum(v, axis=1, keepdims=True)

    # min-sum: L1 identity (rows of v sum to 1) or top-S sparse gather.
    if sparse_s is not None and sparse_s < n:
        # exactness guard: the top-S min-sum is exact only while every V row
        # has <= S nonzeros. Support width depends on the data (k-reciprocal
        # expansion sets), so detect overflow at runtime and fall back to the
        # dense path — sparse_s may speed things up but must never silently
        # change retrieval results.
        max_support = jnp.max(jnp.sum(v > 0.0, axis=1))
        tm = jax.lax.cond(
            max_support <= sparse_s,
            lambda: _minsum_topk(v, sparse_s),
            lambda: 1.0 - 0.5 * pairwise_l1(v, v),
        )
    else:
        tm = 1.0 - 0.5 * pairwise_l1(v, v)
    jaccard = 1.0 - tm / (2.0 - tm)
    return jnp.maximum(jaccard, 0.0)


def compute_jaccard_distance_sharded(
    mesh, features: jnp.ndarray, k1: int = 20, k2: int = 6,
    axis: str = "data", sparse_s: Optional[int] = None,
) -> jnp.ndarray:
    """Row-sharded k-reciprocal Jaccard over a device mesh.

    The gallery distance matrix is the memory-heavy axis of this workload
    (SURVEY.md §5.7 — the conceptual relative of sequence parallelism): every
    (N, N) intermediate here lives as (N/p, N) row blocks on each device, so
    gallery size scales with the mesh. One all-gather reconstructs the V
    encoding for the L1 min-sum (V is the only tensor every row pair needs).

    Arbitrary N: rows are zero-padded to a multiple of the mesh size with a
    validity mask (padded rows form self-only reciprocal sets — masked out of
    every real row's ranking — and the result is sliced back to (N, N)).
    Numerics identical to `compute_jaccard_distance`.
    """
    from .distance import pairwise_l1

    try:
        from jax import shard_map as _sm

        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sme

        def shard_map(f, mesh, in_specs, out_specs):
            return _sme(f, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_rep=False)

    from jax.sharding import PartitionSpec as P

    n_real = features.shape[0]
    p = mesh.devices.size
    pad = (-n_real) % p
    k_half = int(round(k1 / 2))

    feats = features.astype(jnp.float32)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, feats.shape[1]), jnp.float32)])
    n = feats.shape[0]
    valid = jnp.arange(n) < n_real

    # initial ranking via masked similarity (dist = 2 - 2*sim for unit rows):
    # padded columns can never enter a real row's top-k; every row ranks
    # itself first so padded rows end up with self-only reciprocal sets.
    sim_all = jnp.dot(feats, feats.T, preferred_element_type=jnp.float32)
    simm = jnp.where(valid[None, :], sim_all, -jnp.inf)
    simm = jnp.where(jnp.eye(n, dtype=bool), 2.0, simm)
    # k1 columns incl. self — the reference's faiss convention (see above)
    _, initial_rank = jax.lax.top_k(simm, k1)

    f_full = _topk_mask(initial_rank, n) & valid[None, :]
    f_full = f_full | jnp.eye(n, dtype=bool)
    f_half = _topk_mask(initial_rank[:, : k_half + 1], n) & valid[None, :]
    f_half = f_half | jnp.eye(n, dtype=bool)
    r_full = f_full & f_full.T
    r_half = f_half & f_half.T
    sizes_h = jnp.sum(r_half.astype(jnp.float32), axis=1)
    a_qe = _topk_mask(initial_rank[:, :k2], n).astype(jnp.float32) \
        if k2 != 1 else None

    def rows(block_rf, r_half_full, feats_blk, feats_all, sizes_h_all):
        # block_rf: (N/p, N) rows of R; r_half_full replicated (N, N)
        rf = block_rf.astype(jnp.float32)
        overlap = jnp.dot(rf, r_half_full.T.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        cond = block_rf & (overlap > (2.0 / 3.0) * sizes_h_all[None, :])
        expansion = block_rf | (
            jnp.dot(cond.astype(jnp.float32),
                    r_half_full.astype(jnp.float32),
                    preferred_element_type=jnp.float32) > 0)
        sim = jnp.dot(feats_blk, feats_all.T,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        logits = jnp.where(expansion, 2.0 * sim, -jnp.inf)
        return jax.nn.softmax(logits, axis=1)          # (N/p, N) rows of V

    v_rows_fn = shard_map(
        rows, mesh,
        in_specs=(P(axis, None), P(), P(axis, None), P(), P()),
        out_specs=P(axis, None),
    )
    v = v_rows_fn(r_full, r_half, feats, feats, sizes_h)

    if k2 != 1:
        # query expansion needs arbitrary rows of V -> all-gather inside
        def qe(a_rows, v_all):
            out = jnp.dot(a_rows, v_all,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) / k2
            # keep row sums exactly 1 for the L1 min-sum identity
            return out / jnp.sum(out, axis=1, keepdims=True)
        v = shard_map(qe, mesh, in_specs=(P(axis, None), P()),
                      out_specs=P(axis, None))(a_qe, v)

    def jac_rows(v_rows, v_all):
        # auto-detect: Pallas on TPU (measured 69x over the XLA broadcast
        # at this slab shape — see ops/distance.py), jnp on the CPU test mesh
        if sparse_s is not None and sparse_s < n:
            # per-shard exactness guard, same contract as the single-device
            # path: the top-S min-sum is exact only while every LOCAL V row
            # has <= S nonzeros — overflow falls back to the dense identity
            # so sparse_s never silently changes retrieval results.
            max_support = jnp.max(jnp.sum(v_rows > 0.0, axis=1))
            tm = jax.lax.cond(
                max_support <= sparse_s,
                lambda: _minsum_topk_rows(v_rows, v_all, sparse_s),
                lambda: 1.0 - 0.5 * pairwise_l1(v_rows, v_all),
            )
        else:
            tm = 1.0 - 0.5 * pairwise_l1(v_rows, v_all)
        return jnp.maximum(1.0 - tm / (2.0 - tm), 0.0)

    out = shard_map(jac_rows, mesh, in_specs=(P(axis, None), P()),
                    out_specs=P(axis, None))(v, v)
    return out[:n_real, :n_real]


def jaccard_distance(features: jnp.ndarray, k1: int = 20, k2: int = 6,
                     mesh=None, sparse_s: Optional[int] = None,
                     search_option: Optional[str] = None) -> jnp.ndarray:
    """Mesh-aware dispatcher: row-sharded Jaccard when a multi-device mesh is
    given, the single-device path otherwise. This is what the product
    inference/pseudo-label drivers call. `sparse_s` selects the top-S
    min-sum on either path (2.1x at N=23k, S=256; runtime exactness guard
    with dense fallback on support overflow).

    `search_option` enables the gallery-size policy (ops/policy.py, the
    faiss search_option 0-3 role): "auto" picks dense / top-S sparse by N
    (never IVF — measured 5-8x slower than the brute-force MXU kNN on the
    v5e, see ops/policy.py); explicit "dense"/"sparse"/"ivf" override. None
    keeps the legacy behavior (dense unless sparse_s given). The sharded
    path has no IVF variant — "ivf" there degrades to sharded sparse (each
    chip already holds only N/devices rows)."""
    multi = mesh is not None and mesh.devices.size > 1
    if search_option is not None:
        from .policy import choose_search
        plan = choose_search(int(features.shape[0]), search_option,
                             sparse_s or 0,
                             n_devices=mesh.devices.size if multi else 1)
        sparse_s = plan.sparse_s
        if plan.strategy == "ivf" and not multi:
            return compute_jaccard_distance_ivf(
                features, k1=k1, k2=k2, sparse_s=plan.sparse_s,
                nlist=plan.nlist, nprobe=plan.nprobe)
    if multi:
        return compute_jaccard_distance_sharded(mesh, features, k1=k1, k2=k2,
                                                sparse_s=sparse_s)
    return compute_jaccard_distance(features, k1=k1, k2=k2,
                                    sparse_s=sparse_s)
