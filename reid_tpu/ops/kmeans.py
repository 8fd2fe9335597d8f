"""jit k-means (Lloyd) — replaces faiss KMeans (ref `gan/kmeans_.py:37-44`).

Assignment = argmin over a pairwise squared-distance matmul (MXU);
center update = segment mean. Fixed iteration count inside one jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .distance import pairwise_sqeuclidean


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    key: jax.Array, x: jnp.ndarray, k: int, iters: int = 25
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (labels (N,), centers (k, D))."""
    n, d = x.shape
    xf = x.astype(jnp.float32)
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers0 = xf[init_idx]

    def step(centers, _):
        dist = pairwise_sqeuclidean(xf, centers, use_pallas=False)
        labels = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.dot(onehot.T, xf, preferred_element_type=jnp.float32)
        new_centers = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None],
            centers,
        )
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0, None, length=iters)
    labels = jnp.argmin(pairwise_sqeuclidean(xf, centers, use_pallas=False), axis=1)
    return labels, centers
