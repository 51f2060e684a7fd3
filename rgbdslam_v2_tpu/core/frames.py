"""Frame containers: statically-shaped RGB-D frames as pytrees.

Capability parity: the reference's Node holds per-frame visual image, depth,
organized point cloud, and feature data (reference: src/node.h:154-208,
cloud creation src/node.cpp:101-240 / misc.cpp:467-556). Here a frame is a
NamedTuple of fixed-shape arrays + validity masks (JAX static shapes — masks
replace the reference's NaN points and erase-loops).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .camera import Intrinsics, backproject_grid


class Frame(NamedTuple):
    """One RGB-D frame on device. All arrays static-shape.

    gray:   (H, W) float32 in [0, 1] — detection/description input.
    rgb:    (H, W, 3) uint8 — colors for mapping/export (optional; zeros ok).
    depth:  (H, W) float32 meters; 0 where invalid.
    points: (H, W, 3) float32 camera-frame xyz (z=0 where invalid).
    valid:  (H, W) bool — depth validity.

    Timestamps stay host-side (float64 precision matters for TUM stamps;
    the pipeline tracks them outside the device pytree).
    """

    gray: jnp.ndarray
    rgb: jnp.ndarray
    depth: jnp.ndarray
    points: jnp.ndarray
    valid: jnp.ndarray


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W, 3) -> float32 (H, W) in [0, 1] (ITU-R BT.601 luma)."""
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    return (0.299 * r + 0.587 * g + 0.114 * b) * (1.0 / 255.0)


def make_frame(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    cam: Intrinsics,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
) -> Frame:
    """Build a Frame from raw rgb uint8 (H, W, 3) + depth float32 (H, W) meters.

    Depth clipping mirrors the reference's `maximum_depth`/`minimum_depth`
    params (src/misc.cpp:480-520).
    """
    depth = depth.astype(jnp.float32)
    valid = jnp.isfinite(depth) & (depth > min_depth) & (depth < max_depth)
    depth = jnp.where(valid, depth, 0.0)
    points = backproject_grid(depth, cam)
    gray = rgb_to_gray(rgb) if rgb.ndim == 3 else rgb.astype(jnp.float32)
    return Frame(
        gray=gray,
        rgb=rgb if rgb.ndim == 3 else jnp.zeros(depth.shape + (3,), jnp.uint8),
        depth=depth,
        points=points,
        valid=valid,
    )
