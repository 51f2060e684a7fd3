"""Feature containers: fixed-capacity keypoint sets as pytrees.

Capability parity: the reference Node's feature members — 2D keypoints, 3D
homogeneous feature locations, descriptor matrix
(reference: src/node.h:154-208). Static shapes + masks replace the
reference's erase-on-invalid loops (src/node.cpp:67-97 removeDepthless).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Keypoints(NamedTuple):
    """K keypoints with descriptors and 3D backprojections.

    uv:    (K, 2) float32 pixel [x, y] at full resolution.
    xyz:   (K, 3) float32 camera-frame position (0 where invalid).
    score: (K,)   float32 detector response (-inf for padding slots).
    theta: (K,)   float32 orientation (rad).
    desc:  (K, D) int8 ±1 (binary: Hamming via matmul) or float32 (SIFT L2).
    valid: (K,)   bool — detected AND has valid depth.
    level: (K,)   int32 pyramid level.
    """

    uv: jnp.ndarray
    xyz: jnp.ndarray
    score: jnp.ndarray
    theta: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
    level: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.uv.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)
