"""Device-resident per-node data: descriptors, 3D features, EMM depth maps.

Capability parity: the reference's Node objects own per-frame feature data
and (optionally reduced) point clouds, with memory-bounding controls
(reference: src/node.h:154-208; clearFeatureInformation node.cpp:1431,
reducePointCloud :1448, cloud_creation_skip_step misc.cpp:467). TPU
re-design: one fixed-capacity struct-of-arrays in HBM; node i is row i.
Candidate matching gathers rows by index — no host transfers on the hot path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.types import Keypoints


class NodeStore(NamedTuple):
    """Fixed-capacity SoA of per-node data (row = node id).

    Feature data (K = keypoint capacity, D = descriptor width):
      uv (N, K, 2) f32 | xyz (N, K, 3) f32 | desc (N, K, D) | valid (N, K) bool
    EMM data at stride s (h = H/s, w = W/s):
      depth (N, h, w) f32  — 0 where invalid
      emm_lohi (N, h, w) uint32 — precomputed 5x5 [min|max] depth pools,
        f16-packed (ops/emm.emm_pool_maps); candidate EMM validation is then
        ONE gather per point, no per-candidate reduce_windows
      color (N, h, w, 3) uint8 — for mapping/export
    """

    uv: jnp.ndarray
    xyz: jnp.ndarray
    desc: jnp.ndarray
    kp_valid: jnp.ndarray
    depth: jnp.ndarray
    emm_lohi: jnp.ndarray
    color: jnp.ndarray

    @classmethod
    def create(
        cls,
        n_cap: int,
        k_cap: int,
        desc_dim: int,
        emm_h: int,
        emm_w: int,
        desc_dtype=jnp.int8,
        store_color: bool = True,
    ) -> "NodeStore":
        """store_color=False (param store_pointclouds) shrinks the color
        plane to 1x1 — depth is always kept (EMM needs it), but the HBM for
        export colors (~h*w*3 bytes/node) is not allocated."""
        ch, cw = (emm_h, emm_w) if store_color else (1, 1)
        return cls(
            uv=jnp.zeros((n_cap, k_cap, 2), jnp.float32),
            xyz=jnp.zeros((n_cap, k_cap, 3), jnp.float32),
            desc=jnp.zeros((n_cap, k_cap, desc_dim), desc_dtype),
            kp_valid=jnp.zeros((n_cap, k_cap), bool),
            depth=jnp.zeros((n_cap, emm_h, emm_w), jnp.float32),
            # packed f16 [lo=+inf | hi=-inf] — the emm_pool_maps encoding of
            # an all-invalid depth row, so an uncommitted row decodes as
            # "unobserved" (isfinite(lo)=False) exactly like the on-the-fly
            # path, not as a spurious z=0 occluder
            emm_lohi=jnp.full((n_cap, emm_h, emm_w), 0xFC007C00, jnp.uint32),
            color=jnp.zeros((n_cap, ch, cw, 3), jnp.uint8),
        )

    @property
    def has_color(self) -> bool:
        return self.color.shape[1] > 1

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]

    def insert(self, idx: int, kp: Keypoints, depth_small, color_small) -> "NodeStore":
        from ..ops.emm import emm_pool_maps

        ch, cw = self.color.shape[1:3]
        return self._replace(
            uv=self.uv.at[idx].set(kp.uv),
            xyz=self.xyz.at[idx].set(kp.xyz),
            desc=self.desc.at[idx].set(kp.desc.astype(self.desc.dtype)),
            kp_valid=self.kp_valid.at[idx].set(kp.valid),
            depth=self.depth.at[idx].set(depth_small),
            emm_lohi=self.emm_lohi.at[idx].set(emm_pool_maps(depth_small)),
            color=self.color.at[idx].set(color_small[:ch, :cw]),
        )

    def clear_features(self, idx) -> "NodeStore":
        """Free feature slots (clearFeatureInformation capability).

        idx may be a scalar or an index array (batched clearing for the
        clear_non_keyframes auto-free path)."""
        return self._replace(kp_valid=self.kp_valid.at[jnp.asarray(idx)].set(False))
