"""Pinhole camera model: batched back/forward projection.

Capability parity: the reference backprojects pixels through the pinhole
inverse (reference: src/misc2.h:49-65 `backProject`) using intrinsics from
the ROS CameraInfo, optionally overridden by params (src/misc.cpp:56-70).
Here intrinsics are a small static NamedTuple carried through jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def fxi(self):
        return 1.0 / self.fx

    @property
    def fyi(self):
        return 1.0 / self.fy


# TUM freiburg-1 / freiburg-2 calibrations (the benchmark's standard values;
# the reference's test harness sets FR1 intrinsics in test/test_settings.launch).
TUM_FR1 = Intrinsics(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=640, height=480)
TUM_FR2 = Intrinsics(fx=520.9, fy=521.0, cx=325.1, cy=249.7, width=640, height=480)
TUM_DEFAULT = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


def backproject(u: jnp.ndarray, v: jnp.ndarray, z: jnp.ndarray, cam: Intrinsics) -> jnp.ndarray:
    """Pixel (u, v) + depth z -> camera-frame xyz. Shapes broadcast; returns (..., 3)."""
    x = (u - cam.cx) * z / cam.fx
    y = (v - cam.cy) * z / cam.fy
    return jnp.stack([x, y, jnp.broadcast_to(z, x.shape)], axis=-1)


def project(pts: jnp.ndarray, cam: Intrinsics):
    """Camera-frame points (..., 3) -> (u, v, z). No validity clipping."""
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = pts[..., 0] / safe_z * cam.fx + cam.cx
    v = pts[..., 1] / safe_z * cam.fy + cam.cy
    return u, v, z


def in_frustum(u, v, z, cam: Intrinsics, min_depth=0.0):
    return (
        (z > min_depth)
        & (u >= 0.0)
        & (u <= cam.width - 1.0)
        & (v >= 0.0)
        & (v <= cam.height - 1.0)
    )


def pixel_grid(cam: Intrinsics, dtype=jnp.float32):
    """(H, W) meshes of u and v pixel coordinates."""
    v = jnp.arange(cam.height, dtype=dtype)[:, None]
    u = jnp.arange(cam.width, dtype=dtype)[None, :]
    return jnp.broadcast_to(u, (cam.height, cam.width)), jnp.broadcast_to(
        v, (cam.height, cam.width)
    )


def backproject_grid(depth: jnp.ndarray, cam: Intrinsics) -> jnp.ndarray:
    """Dense depth (H, W) -> organized camera-frame point grid (H, W, 3).

    Invalid depths (<= 0 or non-finite) yield z = 0 points; carry a mask
    separately (JAX static shapes — no NaN-erasure like the reference's
    createXYZRGBPointCloud, src/misc.cpp:467).
    """
    u, v = pixel_grid(cam, dtype=depth.dtype)
    z = jnp.where(jnp.isfinite(depth) & (depth > 0), depth, 0.0)
    return backproject(u, v, z, cam)
