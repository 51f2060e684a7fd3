"""Dense image ops: separable Gaussian blur, Sobel gradients, pooling, resize.

All ops are (H, W) float32 -> float32, XLA-fusable building blocks for the
feature kernels. Convolutions use lax.conv_general_dilated in NCHW with
feature_group_count=1 on single-channel images (they lower to MXU-friendly
convs; small kernels, XLA tiles them well).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv1d(img: jnp.ndarray, k, axis: int) -> jnp.ndarray:
    """Separable 1-D convolution along one axis via shift-and-add.

    TPU note: a 1-channel lax.conv wastes the MXU (measured ~18 ms for a
    13-tap blur at 640x480); the same filter as `taps` weighted slice-adds is
    pure VPU work that XLA fuses into a couple of passes (<1 ms).
    """
    k = np.asarray(k, np.float32)
    r = len(k) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="reflect")
    H, W = img.shape
    out = None
    for i, w in enumerate(k.tolist()):
        if axis == 0:
            term = x[i : i + H, :] * w
        else:
            term = x[:, i : i + W] * w
        out = term if out is None else out + term
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    k = gaussian_kernel_1d(sigma, radius)
    return _conv1d(_conv1d(img, k, 0), k, 1)


def sobel(img: jnp.ndarray):
    """Returns (gx, gy) Sobel gradients (shift-and-add separable form)."""
    # Sobel-x = smooth_y [1,2,1] (x) diff_x [-1,0,1]; Sobel-y transposed.
    smooth = np.asarray([1.0, 2.0, 1.0], np.float32)
    diff = np.asarray([-1.0, 0.0, 1.0], np.float32)
    gx = _conv1d(_conv1d(img, smooth, 0), diff, 1)
    gy = _conv1d(_conv1d(img, diff, 0), smooth, 1)
    return gx, gy


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = np.ones((2 * radius + 1,), np.float32) / (2 * radius + 1)
    return _conv1d(_conv1d(img, k, 0), k, 1)


def maxpool2d_same(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """Max over a size x size window, same shape (for NMS)."""
    r = size // 2
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (size, size), (1, 1), [(r, r), (r, r)]
    )


def resize_bilinear(img: jnp.ndarray, shape) -> jnp.ndarray:
    return jax.image.resize(img, shape, method="bilinear")


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) image at float coords x (cols), y (rows); clamped borders."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (1 - fy) * ((1 - fx) * v00 + fx * v01) + fy * ((1 - fx) * v10 + fx * v11)


def harris_response(img: jnp.ndarray, k: float = 0.04, window_sigma: float = 1.5) -> jnp.ndarray:
    """Harris corner response, used to rank FAST corners (ORB's HARRIS_SCORE)."""
    gx, gy = sobel(img)
    Ixx = gaussian_blur(gx * gx, window_sigma, radius=2)
    Iyy = gaussian_blur(gy * gy, window_sigma, radius=2)
    Ixy = gaussian_blur(gx * gy, window_sigma, radius=2)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr
