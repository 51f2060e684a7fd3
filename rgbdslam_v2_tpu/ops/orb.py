"""ORB orientation + steered-BRIEF description, batched over keypoints.

Capability parity: the reference's ORB path (OpenCV ORB detector/extractor,
reference: src/features.cpp:63-161) — FAST corners (see ops/fast.py), Harris
ranking, intensity-centroid orientation, rotated BRIEF descriptors. TPU
re-design: all keypoints are processed as one (K, ...) batch of gathers and
elementwise math; descriptors are stored as ±1 int8 so Hamming distance
becomes an MXU int matmul: ham = (256 - a.b) / 2.

The 256-bit sampling pattern is a fixed seeded Gaussian BRIEF pattern (we
match our own descriptors against our own; OpenCV bit-compatibility is not a
goal, the *capability* — rotation-invariant binary description — is).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .image import bilinear_sample, gaussian_blur

PATCH_R = 15  # orientation patch radius (ORB's 31x31 patch)
DESC_BITS = 256

# ---- fixed BRIEF pattern: 256 (p, q) offset pairs, sigma = patch/5, clipped ----
_rng = np.random.default_rng(1234)
_sigma = PATCH_R / 1.9
_pattern = np.clip(
    _rng.normal(0.0, _sigma, size=(DESC_BITS, 2, 2)), -(PATCH_R - 2), PATCH_R - 2
).astype(np.float32)
PATTERN_P = _pattern[:, 0]  # (256, 2) [dx, dy]
PATTERN_Q = _pattern[:, 1]

# ---- orientation patch offsets with circular mask ----
_oy, _ox = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
_circ = (_ox**2 + _oy**2) <= PATCH_R**2
ORIENT_DX = _ox[_circ].astype(np.float32)  # (P,)
ORIENT_DY = _oy[_circ].astype(np.float32)


def keypoint_orientations(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint.

    img: (H, W) float32 (lightly blurred); uv: (K, 2) [x, y] float32.
    Returns theta (K,) radians.
    """
    H, W = img.shape
    x = jnp.clip(
        jnp.round(uv[:, 0:1] + ORIENT_DX[None, :]).astype(jnp.int32), 0, W - 1
    )  # (K, P)
    y = jnp.clip(jnp.round(uv[:, 1:2] + ORIENT_DY[None, :]).astype(jnp.int32), 0, H - 1)
    patch = img[y, x]  # (K, P) gather
    m10 = jnp.sum(patch * ORIENT_DX[None, :], axis=1)
    m01 = jnp.sum(patch * ORIENT_DY[None, :], axis=1)
    return jnp.arctan2(m01, m10)


def steered_brief(img: jnp.ndarray, uv: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF: (K,) oriented 256-bit descriptors as ±1 int8 (K, 256).

    img should be smoothed (BRIEF noise sensitivity); bilinear sampling.
    """
    c = jnp.cos(theta)[:, None]  # (K, 1)
    s = jnp.sin(theta)[:, None]

    def rot(pat):  # pat: (256, 2) -> (K, 256, 2)
        px, py = pat[None, :, 0], pat[None, :, 1]
        rx = c * px - s * py
        ry = s * px + c * py
        return rx, ry

    pxr, pyr = rot(jnp.asarray(PATTERN_P))
    qxr, qyr = rot(jnp.asarray(PATTERN_Q))
    x0 = uv[:, 0:1]
    y0 = uv[:, 1:2]
    # Nearest-neighbor sampling (one gather instead of four): the smoothed
    # image makes subpixel interpolation unnecessary — classic ORB rounds too.
    H, W = img.shape

    def nn_sample(x, y):
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        return img[yi, xi]

    p_val = nn_sample(x0 + pxr, y0 + pyr)  # (K, 256)
    q_val = nn_sample(x0 + qxr, y0 + qyr)
    bits = p_val > q_val
    return jnp.where(bits, jnp.int8(1), jnp.int8(-1))


def describe(gray: jnp.ndarray, uv: jnp.ndarray, blur_sigma: float = 2.0):
    """Orientation + descriptor for fixed-size keypoint set. Returns (theta, desc)."""
    sm = gaussian_blur(gray, blur_sigma)
    theta = keypoint_orientations(sm, uv)
    desc = steered_brief(sm, uv, theta)
    return theta, desc
