"""Vectorized CMC / mAP evaluation (Market1501 protocol).

Ref `reid/evaluate.py:33-105`: the reference loops over queries in Python and
per query does argsort + junk filtering + an AP loop. Here the whole protocol
is one jit program: a (Q, G) score matmul, per-row argsort, junk-mask
compaction via cumulative sums, and the *identical* trapezoid AP formula
(ref compute_mAP :96-103: ap += d_recall * (old_precision + precision) / 2,
with old_precision := 1 when the good hit is at rank 0).

Protocol facts mirrored exactly:
  good  = same pid, different cam       (ref :66-69)
  junk  = same pid + same cam, or pid == -1 (distractor)  (ref :70-72)
  queries with no good gallery match are skipped (CMC_tmp[0] == -1, ref :43-44)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_rank",))
def _evaluate_scores(
    scores: jnp.ndarray,     # (Q, G) similarity, higher = better
    ql: jnp.ndarray, qc: jnp.ndarray,
    gl: jnp.ndarray, gc: jnp.ndarray,
    max_rank: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    g = scores.shape[1]
    order = jnp.argsort(-scores, axis=1)                       # (Q, G)
    gl_sorted = gl[order]                                       # (Q, G)
    gc_sorted = gc[order]

    good = (gl_sorted == ql[:, None]) & (gc_sorted != qc[:, None])
    junk = ((gl_sorted == ql[:, None]) & (gc_sorted == qc[:, None])) | (
        gl_sorted == -1
    )
    good = good & ~junk

    # Compact away junk columns: pos = rank among non-junk entries.
    keep = (~junk).astype(jnp.float32)
    pos = jnp.cumsum(keep, axis=1) - 1.0                        # (Q, G) 0-based
    ngood = jnp.sum(good, axis=1)                               # (Q,)
    valid_q = ngood > 0

    goodf = good.astype(jnp.float32)
    # i-th good hit (1-based) at compacted rank pos -> AP trapezoid terms.
    i_idx = jnp.cumsum(goodf, axis=1)                           # hits so far
    precision = i_idx / (pos + 1.0)
    old_precision = jnp.where(pos > 0, (i_idx - 1.0) / jnp.maximum(pos, 1.0), 1.0)
    ap_terms = jnp.where(good, (old_precision + precision) * 0.5, 0.0)
    ap = jnp.sum(ap_terms, axis=1) / jnp.maximum(ngood, 1)
    ap = jnp.where(valid_q, ap, 0.0)

    # CMC: 1 from the first good compacted rank onward.
    first_good_pos = jnp.min(
        jnp.where(good, pos, jnp.inf), axis=1
    )                                                           # (Q,)
    ranks = jnp.arange(max_rank)[None, :]
    cmc_per_q = (ranks >= first_good_pos[:, None]).astype(jnp.float32)
    cmc_per_q = jnp.where(valid_q[:, None], cmc_per_q, 0.0)

    nq = jnp.maximum(jnp.sum(valid_q), 1)
    # Reference divides by the *total* query count, including skipped ones
    # (evaluate_all :49-50 divides by qf.size(0)) — match that.
    total_q = scores.shape[0]
    cmc = jnp.sum(cmc_per_q, axis=0) / total_q
    mean_ap = jnp.sum(ap) / total_q
    return cmc, mean_ap, valid_q


def evaluate_all(
    qf: jnp.ndarray, ql, qc, gf: jnp.ndarray, gl, gc,
    max_rank: int = 50, verbose: bool = True,
):
    """CMC + mAP from features. Score = gf . qf (dot product, ref :58)."""
    scores = jnp.dot(qf.astype(jnp.float32), gf.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
    cmc, mean_ap, _ = _evaluate_scores(
        scores, jnp.asarray(ql), jnp.asarray(qc), jnp.asarray(gl),
        jnp.asarray(gc), max_rank=max_rank,
    )
    cmc = np.asarray(cmc)
    mean_ap = float(mean_ap)
    if verbose:
        print("Rank@1:%f Rank@5:%f Rank@10:%f mAP:%f"
              % (cmc[0], cmc[4], cmc[9], mean_ap))
    return cmc, mean_ap


def evaluate_rerank(
    dist: jnp.ndarray, ql, qc, gl, gc, max_rank: int = 50, verbose: bool = True,
):
    """Same protocol from a (Q, G) *distance* matrix (Jaccard re-ranked)."""
    cmc, mean_ap, _ = _evaluate_scores(
        -jnp.asarray(dist, jnp.float32), jnp.asarray(ql), jnp.asarray(qc),
        jnp.asarray(gl), jnp.asarray(gc), max_rank=max_rank,
    )
    cmc = np.asarray(cmc)
    mean_ap = float(mean_ap)
    if verbose:
        print("Rank@1:%f Rank@5:%f Rank@10:%f mAP:%f"
              % (cmc[0], cmc[4], cmc[9], mean_ap))
    return cmc, mean_ap
