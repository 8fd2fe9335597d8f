"""Camera motion compensation (GMC) — host-side affine estimation.

Role of the submodule's `tracker.camera_update(prev, curr)` hook invoked at
ref `track_yolov5.py:229-231` (botsort-style). Estimates a 2x3 affine from
sparse feature correspondences (OpenCV if present) or phase-correlation
translation (pure NumPy fallback); `tracker.apply_gmc` then warps the track
means on device.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def estimate_affine(prev: np.ndarray, curr: np.ndarray,
                    downscale: int = 2) -> np.ndarray:
    """Returns a 2x3 affine mapping prev-frame coords to curr-frame coords."""
    identity = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    if prev is None or curr is None:
        return identity

    def gray(img):
        img = np.asarray(img)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        if downscale > 1:
            img = img[::downscale, ::downscale]
        return img.astype(np.float32)

    g0, g1 = gray(prev), gray(curr)
    if _HAS_CV2:
        p0 = cv2.goodFeaturesToTrack(g0.astype(np.uint8), maxCorners=200,
                                     qualityLevel=0.01, minDistance=8)
        if p0 is None or len(p0) < 8:
            return identity
        p1, st, _ = cv2.calcOpticalFlowPyrLK(
            g0.astype(np.uint8), g1.astype(np.uint8), p0, None)
        good = st.reshape(-1) == 1
        if good.sum() < 8:
            return identity
        m, _ = cv2.estimateAffinePartial2D(p0[good], p1[good],
                                           method=cv2.RANSAC)
        if m is None:
            return identity
        m = m.astype(np.float32)
        m[:, 2] *= downscale
        return m

    # NumPy fallback: translation-only via phase correlation.
    f0 = np.fft.rfft2(g0 - g0.mean())
    f1 = np.fft.rfft2(g1 - g1.mean())
    cross = f0 * np.conj(f1)
    denom = np.maximum(np.abs(cross), 1e-9)
    corr = np.fft.irfft2(cross / denom, s=g0.shape)
    dy, dx = np.unravel_index(np.argmax(corr), corr.shape)
    if dy > g0.shape[0] // 2:
        dy -= g0.shape[0]
    if dx > g0.shape[1] // 2:
        dx -= g0.shape[1]
    out = identity.copy()
    out[0, 2] = -dx * downscale
    out[1, 2] = -dy * downscale
    return out


def chunk_affines_translation(prev_last, frames, downscale: int = 0):
    """Device-side batched GMC for a whole chunk: translation-only phase
    correlation between consecutive frames, all T pairs in ONE batched FFT.

    prev_last (H, W, 3): the frame preceding the chunk (pass frames[0] to
    make the first affine identity); frames (T, H, W, 3). Returns (T, 2, 3)
    affines mapping frame t-1 coords -> frame t coords, the same semantics
    as `estimate_affine`'s NumPy fallback — but computed on the TPU inside
    the chunked program, so the throughput path gets camera-motion
    compensation at zero host cost (ref track_yolov5.py:229-231 runs GMC
    per frame on the host CPU).

    `downscale=0` picks an auto factor so the FFT plane stays near
    270x480 regardless of frame size (1080p frames paid ~30% of the
    MOT16-load frame budget for a 540x960 FFT at the old fixed ds2); the
    coarser grid costs no precision because the correlation peak is
    refined to SUBPIXEL accuracy with a separable parabolic fit over its
    3x3 neighborhood, so the returned translation resolves fractions of a
    downscaled bin (~1 px at ds4).
    """
    import jax.numpy as jnp

    if downscale <= 0:
        fh, fw = frames.shape[1], frames.shape[2]
        downscale = max(2, min(fh // 270, fw // 480))

    seq = jnp.concatenate([prev_last[None], frames]).astype(jnp.float32)
    g = seq.mean(axis=-1)[:, ::downscale, ::downscale]
    g = g - g.mean(axis=(-2, -1), keepdims=True)
    f = jnp.fft.rfft2(g)
    cross = f[:-1] * jnp.conj(f[1:])
    corr = jnp.fft.irfft2(cross / jnp.maximum(jnp.abs(cross), 1e-9),
                          s=g.shape[-2:])
    t, h, w = corr.shape
    flat = corr.reshape(t, -1)
    idx = jnp.argmax(flat, axis=-1)
    dy = idx // w
    dx = idx % w

    # separable parabolic subpixel refinement around the peak (wrapped
    # neighbors — the correlation plane is circular)
    def at(dyo, dxo):
        j = ((dy + dyo) % h) * w + (dx + dxo) % w
        return jnp.take_along_axis(flat, j[:, None], axis=1)[:, 0]

    c0 = at(0, 0)
    cym, cyp = at(-1, 0), at(1, 0)
    cxm, cxp = at(0, -1), at(0, 1)

    def sub(cm, cc, cp):
        denom = cm - 2.0 * cc + cp
        off = jnp.where(jnp.abs(denom) > 1e-12,
                        0.5 * (cm - cp) / jnp.where(denom == 0, 1.0, denom),
                        0.0)
        return jnp.clip(off, -0.5, 0.5)

    dy = jnp.where(dy > h // 2, dy - h, dy).astype(jnp.float32)
    dx = jnp.where(dx > w // 2, dx - w, dx).astype(jnp.float32)
    dy = dy + sub(cym, c0, cyp)
    dx = dx + sub(cxm, c0, cxp)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (t, 2, 2))
    trans = jnp.stack([-dx * downscale, -dy * downscale], axis=-1)
    return jnp.concatenate([eye, trans[..., None]], axis=-1)
