"""Multi-sequence evaluation sharded over the device mesh.

Capability: SURVEY.md §2.3's TPU-added scale axis — evaluate S sequences
simultaneously, one (or more) per device. The reference runs its benchmark
sequences serially through one process (test/run_tests.sh); on a TPU pod
slice the embarrassingly parallel axis is the sequence, so the whole sweep
costs one sequence's wall-clock.

The per-device program is the sequential visual-odometry chain (the
frontend's hot path: extract -> match to predecessor -> batched RANSAC),
compiled once and lax.scan-ned over frames; shard_map places one shard of
the sequence batch on each device. No collectives are needed (out_specs
keep results device-local until the host gathers them).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import Intrinsics
from ..models.orb import feature_depth_map
from ..ops.matching import match_descriptors
from ..ops.registration import ransac_register


class VoResult(NamedTuple):
    poses: jnp.ndarray  # (S, T, 4, 4) world_T_cam per frame
    n_inliers: jnp.ndarray  # (S, T) int32 per-frame inlier counts
    ok: jnp.ndarray  # (S, T) bool RANSAC success (frame 0 = True)


def _vo_one_sequence(
    grays, depths, valids, key, extractor, cam: Intrinsics,
    max_matches: int, ratio: float, n_hypotheses: int, min_inliers: int,
    sigma_depth: float,
):
    """Sequential VO over one (T, H, W) sequence via lax.scan."""

    def extract(gray, depth, valid):
        return extractor(gray, feature_depth_map(depth, valid, False), cam)

    kp0 = extract(grays[0], depths[0], valids[0])

    def step(carry, inp):
        pose, prev_desc, prev_valid, prev_xyz = carry
        gray, depth, valid, k = inp
        kp = extract(gray, depth, valid)
        m = match_descriptors(
            kp.desc, kp.valid, prev_desc, prev_valid, max_matches, ratio
        )
        reg = ransac_register(
            k,
            kp.xyz[m.src_idx],
            prev_xyz[m.dst_idx],
            m.dist,
            m.valid,
            cam_fx=cam.fx,
            cam_fy=cam.fy,
            n_hypotheses=n_hypotheses,
            min_inliers=min_inliers,
            sigma_depth=sigma_depth,
        )
        # prev_T_new on success; identity (constant-position) otherwise
        T = jnp.where(reg.success, reg.transform, jnp.eye(4, dtype=pose.dtype))
        pose_new = pose @ T
        return (pose_new, kp.desc, kp.valid, kp.xyz), (
            pose_new,
            reg.n_inliers,
            reg.success,
        )

    T_len = grays.shape[0]
    keys = jax.random.split(key, T_len - 1)
    init = (jnp.eye(4, dtype=jnp.float32), kp0.desc, kp0.valid, kp0.xyz)
    _, (poses, n_inl, ok) = jax.lax.scan(
        step, init, (grays[1:], depths[1:], valids[1:], keys)
    )
    poses = jnp.concatenate([jnp.eye(4, dtype=jnp.float32)[None], poses])
    n_inl = jnp.concatenate([jnp.zeros((1,), jnp.int32), n_inl])
    ok = jnp.concatenate([jnp.ones((1,), bool), ok])
    return poses, n_inl, ok


def vo_trajectories_sharded(
    mesh: Mesh,
    grays,  # (S, T, H, W) float32 — S divisible by mesh size
    depths,  # (S, T, H, W) float32
    key,
    extractor,
    cam: Intrinsics,
    max_matches: int = 128,
    ratio: float = 0.9,
    n_hypotheses: int = 128,
    min_inliers: int = 10,
    sigma_depth: float = 0.01,
) -> VoResult:
    """Run sequential VO on S sequences, sharded one-shard-per-device."""
    S = grays.shape[0]
    n_dev = mesh.devices.size
    if S % n_dev != 0:
        raise ValueError(f"{S} sequences not divisible by {n_dev} devices")

    run_one = functools.partial(
        _vo_one_sequence,
        extractor=extractor,
        cam=cam,
        max_matches=max_matches,
        ratio=ratio,
        n_hypotheses=n_hypotheses,
        min_inliers=min_inliers,
        sigma_depth=sigma_depth,
    )

    def shard_fn(g, d, k):
        valids = d > 0
        return jax.vmap(lambda gg, dd, vv, kk: run_one(gg, dd, vv, kk))(
            g, d, valids, k
        )

    keys = jax.random.split(key, S)
    spec = P("c")
    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec, spec, spec),
            # the scan carry starts from unvarying constants (identity pose);
            # disable the varying-manual-axes check rather than pcast-ing
            # every init leaf
            check_vma=False,
        )
    )
    sharding = NamedSharding(mesh, spec)
    g = jax.device_put(jnp.asarray(grays, jnp.float32), sharding)
    d = jax.device_put(jnp.asarray(depths, jnp.float32), sharding)
    k = jax.device_put(keys, sharding)
    poses, n_inl, ok = fn(g, d, k)
    return VoResult(poses=poses, n_inliers=n_inl, ok=ok)
