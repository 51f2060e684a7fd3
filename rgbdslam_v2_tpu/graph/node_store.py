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
    EMM data at stride s (h = H/s, w = W/s) — ALL grid planes stored FLAT,
    one row per node (readers reshape after the gather, writers flatten
    before the scatter; both are free on contiguous rows):
      depth (N, h*w) f32  — 0 where invalid
      emm_lohi (N, h*w) uint32 — precomputed 5x5 [min|max] depth pools,
        f16-packed (ops/emm.emm_pool_maps); candidate EMM validation is then
        ONE gather per point, no per-candidate reduce_windows
      emm_zs (N, ceil(h/e)*ceil(w/e)) f32, e = emm_skip — the depth samples
        the EMM's direction-2 point set actually reads, precomputed so the
        candidate gather is a small contiguous row (150 KB) instead of a
        scalar-path strided gather over the full rows (~0.7 ms/frame)
      color (N, h*w*3) uint8 — for mapping/export.
    Why flat: with (N, h, w) shapes XLA's layout assignment let the commit
    program's row scatter pick a node-minor {0,2,1} layout for the buffer,
    and every compute call then paid a full-buffer relayout copy before the
    gather (2 x 314 MB ~ 2 ms/frame); a 2-D row-major store is the one
    layout both access patterns want.
    """

    uv: jnp.ndarray
    xyz: jnp.ndarray
    desc: jnp.ndarray
    kp_valid: jnp.ndarray
    depth: jnp.ndarray
    emm_lohi: jnp.ndarray
    emm_zs: jnp.ndarray
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
        emm_skip: int = 2,
    ) -> "NodeStore":
        """store_color=False (param store_pointclouds) shrinks the color
        plane to 3 bytes/node — depth is always kept (EMM needs it), but the
        HBM for export colors (~h*w*3 bytes/node) is not allocated."""
        color_len = emm_h * emm_w * 3 if store_color else 3
        return cls(
            uv=jnp.zeros((n_cap, k_cap, 2), jnp.float32),
            xyz=jnp.zeros((n_cap, k_cap, 3), jnp.float32),
            desc=jnp.zeros((n_cap, k_cap, desc_dim), desc_dtype),
            kp_valid=jnp.zeros((n_cap, k_cap), bool),
            depth=jnp.zeros((n_cap, emm_h * emm_w), jnp.float32),
            # packed f16 [lo=+inf | hi=-inf] — the emm_pool_maps encoding of
            # an all-invalid depth row, so an uncommitted row decodes as
            # "unobserved" (isfinite(lo)=False) exactly like the on-the-fly
            # path, not as a spurious z=0 occluder
            emm_lohi=jnp.full((n_cap, emm_h * emm_w), 0xFC007C00, jnp.uint32),
            emm_zs=jnp.zeros(
                (n_cap, -(-emm_h // emm_skip) * -(-emm_w // emm_skip)),
                jnp.float32,
            ),
            color=jnp.zeros((n_cap, color_len), jnp.uint8),
        )

    @property
    def has_color(self) -> bool:
        return self.color.shape[1] > 3

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]

    def color_row(self, color_small) -> "jnp.ndarray":
        """(h, w, 3) ingest color -> the flat row this store commits (the
        prefix slice only matters for store_color=False's 3-byte stub)."""
        return jnp.reshape(color_small, (-1,))[: self.color.shape[1]]

    def emm_skip_of(self, h: int, w: int) -> int:
        """Recover the emm_skip this store's zs plane was built with from
        the (static) shapes — lets jitted writers stride identically
        without threading the parameter through every signature."""
        zs_len = self.emm_zs.shape[1]
        for e in range(1, 33):
            if -(-h // e) * -(-w // e) == zs_len:
                return e
        raise ValueError(f"no emm_skip reproduces zs length {zs_len} "
                         f"for a {h}x{w} grid")

    def zs_row(self, depth_small) -> "jnp.ndarray":
        h, w = depth_small.shape
        e = self.emm_skip_of(h, w)
        return jnp.reshape(depth_small[::e, ::e], (-1,))

    def insert(self, idx: int, kp: Keypoints, depth_small, color_small) -> "NodeStore":
        from ..ops.emm import emm_pool_maps

        return self._replace(
            uv=self.uv.at[idx].set(kp.uv),
            xyz=self.xyz.at[idx].set(kp.xyz),
            desc=self.desc.at[idx].set(kp.desc.astype(self.desc.dtype)),
            kp_valid=self.kp_valid.at[idx].set(kp.valid),
            depth=self.depth.at[idx].set(jnp.reshape(depth_small, (-1,))),
            emm_lohi=self.emm_lohi.at[idx].set(
                jnp.reshape(emm_pool_maps(depth_small), (-1,))
            ),
            emm_zs=self.emm_zs.at[idx].set(self.zs_row(depth_small)),
            color=self.color.at[idx].set(self.color_row(color_small)),
        )

    def clear_features(self, idx) -> "NodeStore":
        """Free feature slots (clearFeatureInformation capability).

        idx may be a scalar or an index array (batched clearing for the
        clear_non_keyframes auto-free path)."""
        return self._replace(kp_valid=self.kp_valid.at[jnp.asarray(idx)].set(False))
