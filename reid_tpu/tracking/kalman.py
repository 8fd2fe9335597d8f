"""Vectorized constant-velocity Kalman filter over track slots.

The standard DeepSort/StrongSort 8-state filter (state = [x, y, a, h,
vx, vy, va, vh], measurement = [x, y, a, h]) that lives in the reference's
tracker submodule (SURVEY.md §2.3 "Kalman filter predict/update per track").
All ops are batched over the slot axis with vmap and stay on device.

Noise scales follow the DeepSort convention: position std = w_pos * h,
velocity std = w_vel * h.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

W_POS = 1.0 / 20.0
W_VEL = 1.0 / 160.0
# chi-square 0.95 quantile, 4 dof — the DeepSort gating threshold.
CHI2_GATE_4DOF = 9.4877

_F = jnp.eye(8) + jnp.eye(8, k=4)      # x' = x + v
_H = jnp.eye(4, 8)                     # measure position block


def kalman_initiate(measurement: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """New track from an xyah measurement -> (mean (8,), cov (8, 8))."""
    h = measurement[3]
    mean = jnp.concatenate([measurement, jnp.zeros(4)])
    std = jnp.stack([
        2 * W_POS * h, 2 * W_POS * h, 1e-2, 2 * W_POS * h,
        10 * W_VEL * h, 10 * W_VEL * h, 1e-5, 10 * W_VEL * h,
    ])
    return mean, jnp.diag(std * std)


def _motion_noise(h):
    std = jnp.stack([W_POS * h, W_POS * h, 1e-2, W_POS * h,
                     W_VEL * h, W_VEL * h, 1e-5, W_VEL * h])
    return jnp.diag(std * std)


def _measurement_noise(h):
    std = jnp.stack([W_POS * h, W_POS * h, 1e-1, W_POS * h])
    return jnp.diag(std * std)


def kalman_predict(mean: jnp.ndarray, cov: jnp.ndarray):
    """One step of x' = Fx; batched over leading axes via vmap."""
    def one(m, c):
        q = _motion_noise(m[3])
        return _F @ m, _F @ c @ _F.T + q
    if mean.ndim == 1:
        return one(mean, cov)
    return jax.vmap(one)(mean, cov)


def _project(mean, cov):
    r = _measurement_noise(mean[3])
    proj_mean = _H @ mean
    proj_cov = _H @ cov @ _H.T + r
    return proj_mean, proj_cov


def kalman_update(mean, cov, measurement, confidence=None):
    """Measurement update; batched over leading axes via vmap.

    `confidence` (per measurement, in [0, 1]) enables the NSA Kalman of
    StrongSort: measurement noise R is scaled by (1 - confidence), so
    high-confidence detections correct the state more aggressively."""
    def one(m, c, z, conf):
        r = _measurement_noise(m[3])
        if conf is not None:
            r = r * jnp.maximum(1.0 - conf, 1e-4)
        pm = _H @ m
        pc = _H @ c @ _H.T + r
        chol = jnp.linalg.cholesky(pc)
        # gain K = C Hᵀ (H C Hᵀ + R)⁻¹, via cholesky solve of (H C)
        k = jax.scipy.linalg.cho_solve((chol, True), _H @ c).T     # (8, 4)
        innov = z - pm
        new_m = m + k @ innov
        new_c = c - k @ pc @ k.T
        return new_m, new_c
    if mean.ndim == 1:
        return one(mean, cov, measurement, confidence)
    if confidence is None:
        return jax.vmap(lambda m, c, z: one(m, c, z, None))(
            mean, cov, measurement)
    return jax.vmap(one)(mean, cov, measurement, confidence)


def kalman_gating_distance(mean, cov, measurements):
    """Squared Mahalanobis distance of each measurement to one track.

    mean (8,), cov (8,8), measurements (D, 4) -> (D,).
    """
    pm, pc = _project(mean, cov)
    chol = jnp.linalg.cholesky(pc)
    d = measurements - pm[None, :]
    z = jax.scipy.linalg.solve_triangular(chol, d.T, lower=True)
    return jnp.sum(z * z, axis=0)
