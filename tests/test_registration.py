import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.ops.registration import (
    RegistrationResult,
    mahalanobis_sq,
    ransac_register,
)


def _make_scene(seed, n=128, outlier_frac=0.4, noise=0.003):
    rng = np.random.default_rng(seed)
    src = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(0.8, 4.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    T_true = se3.exp_se3(
        jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
    )
    dst = np.array(se3.apply(T_true, jnp.asarray(src)))
    dst += rng.normal(0, noise, dst.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] += rng.uniform(0.5, 2.0, (n_out, 3)) * rng.choice([-1, 1], (n_out, 3))
    inlier_mask = np.ones(n, bool)
    inlier_mask[out_idx] = False
    return src, dst.astype(np.float32), np.asarray(T_true), inlier_mask


def test_mahalanobis_identity_zero():
    pts = jnp.asarray([[0.0, 0.0, 2.0], [1.0, -0.5, 3.0]])
    cov = jnp.ones((2, 3)) * 1e-4
    m2 = mahalanobis_sq(jnp.eye(4), pts, pts, cov, cov)
    assert np.allclose(np.asarray(m2), 0.0, atol=1e-5)


def test_mahalanobis_scales_with_depth_noise():
    src = jnp.asarray([[0.0, 0.0, 1.0]])
    dst_near = jnp.asarray([[0.0, 0.0, 1.05]])
    cov_lo = jnp.asarray([[1e-6, 1e-6, 1e-4]])  # confident depth
    cov_hi = jnp.asarray([[1e-6, 1e-6, 1e-2]])  # noisy depth
    m_lo = float(mahalanobis_sq(jnp.eye(4), src, dst_near, cov_lo, cov_lo)[0])
    m_hi = float(mahalanobis_sq(jnp.eye(4), src, dst_near, cov_hi, cov_hi)[0])
    assert m_lo > m_hi * 10


def test_ransac_recovers_transform_with_outliers():
    src, dst, T_true, inlier_mask = _make_scene(0)
    res = ransac_register(
        jax.random.PRNGKey(0),
        jnp.asarray(src),
        jnp.asarray(dst),
        match_dist=jnp.zeros(len(src)),
        match_valid=jnp.ones(len(src), bool),
        cam_fx=525.0,
        cam_fy=525.0,
        n_hypotheses=256,
    )
    assert bool(res.success)
    err = np.asarray(se3.relative(jnp.asarray(T_true), res.transform))
    assert float(se3.translation_norm(jnp.asarray(err))) < 0.02
    assert float(se3.rotation_angle(jnp.asarray(err))) < 0.02
    # inlier classification mostly correct
    found = np.asarray(res.inliers)
    agreement = (found == inlier_mask).mean()
    assert agreement > 0.85


def test_ransac_identity_fallback():
    """Static scene (src == dst): should find ~identity with full inliers."""
    rng = np.random.default_rng(3)
    src = np.stack(
        [rng.uniform(-1, 1, 64), rng.uniform(-1, 1, 64), rng.uniform(1, 3, 64)], -1
    ).astype(np.float32)
    res = ransac_register(
        jax.random.PRNGKey(1),
        jnp.asarray(src),
        jnp.asarray(src),
        match_dist=jnp.zeros(64),
        match_valid=jnp.ones(64, bool),
        cam_fx=525.0,
        cam_fy=525.0,
        n_hypotheses=64,
    )
    assert bool(res.success)
    assert float(se3.translation_norm(res.transform)) < 1e-3
    assert int(res.n_inliers) == 64


def test_ransac_fails_on_garbage():
    rng = np.random.default_rng(4)
    src = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    src[:, 2] = np.abs(src[:, 2]) + 0.5
    dst = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    dst[:, 2] = np.abs(dst[:, 2]) + 0.5
    res = ransac_register(
        jax.random.PRNGKey(2),
        jnp.asarray(src),
        jnp.asarray(dst),
        match_dist=jnp.zeros(64),
        match_valid=jnp.ones(64, bool),
        cam_fx=525.0,
        cam_fy=525.0,
        n_hypotheses=128,
        min_inliers=12,
    )
    assert not bool(res.success)


def test_ransac_respects_match_validity():
    src, dst, T_true, _ = _make_scene(5, outlier_frac=0.0)
    # corrupt the second half but mark it invalid
    dst2 = dst.copy()
    dst2[64:] += 10.0
    valid = np.arange(128) < 64
    res = ransac_register(
        jax.random.PRNGKey(3),
        jnp.asarray(src),
        jnp.asarray(dst2),
        match_dist=jnp.zeros(128),
        match_valid=jnp.asarray(valid),
        cam_fx=525.0,
        cam_fy=525.0,
        n_hypotheses=128,
    )
    assert bool(res.success)
    assert not np.asarray(res.inliers)[64:].any()
    err = se3.relative(jnp.asarray(T_true), res.transform)
    assert float(se3.translation_norm(err)) < 0.02


def test_frame_pair_visual_odometry():
    """Full frontend on two synthetic frames: extract, match, register."""
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.core.frames import make_frame
    from rgbdslam_v2_tpu.io import SyntheticWorld
    from rgbdslam_v2_tpu.models.orb import OrbExtractor, min_depth_map
    from rgbdslam_v2_tpu.ops.matching import match_descriptors

    cam = Intrinsics(fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320, height=240)
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=cam)
    poses = world.orbit_trajectory(40, seed=2)
    Ta, Tb = poses[0], poses[1]
    rgb_a, depth_a = world.render(Ta)
    rgb_b, depth_b = world.render(Tb)
    fa = make_frame((rgb_a * 255).astype(jnp.uint8), depth_a, cam)
    fb = make_frame((rgb_b * 255).astype(jnp.uint8), depth_b, cam)
    ext = OrbExtractor(max_keypoints=300, n_levels=3)
    kpa = ext(fa.gray, min_depth_map(fa.depth, fa.valid), cam)
    kpb = ext(fb.gray, min_depth_map(fb.depth, fb.valid), cam)
    m = match_descriptors(kpb.desc, kpb.valid, kpa.desc, kpa.valid, 200, ratio=0.9)
    assert int(m.count()) > 40
    res = ransac_register(
        jax.random.PRNGKey(0),
        kpb.xyz[m.src_idx],
        kpa.xyz[m.dst_idx],
        m.dist,
        m.valid,
        cam_fx=cam.fx,
        cam_fy=cam.fy,
        n_hypotheses=256,
    )
    assert bool(res.success)
    # estimated a_T_b vs ground truth
    T_gt = se3.relative(Ta, Tb)  # a_T_b
    err = se3.relative(T_gt, res.transform)
    assert float(se3.translation_norm(err)) < 0.03
    assert float(se3.rotation_angle(err)) < 0.03

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


def test_gumbel_sample_matches_topk():
    """The k-pass masked-argmax sampler must return exactly lax.top_k's
    index sets (same Gumbel perturbation -> same without-replacement
    samples); only the lowering differs (top_k full-sorts the (H, M)
    matrix on TPU)."""
    from rgbdslam_v2_tpu.ops.registration import _gumbel_topk_sample

    M, H, k = 300, 64, 4
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(0, 2, M).astype(np.float32))
    logits = jnp.where(jnp.arange(M) % 7 == 3, -jnp.inf, logits)
    key = jax.random.PRNGKey(5)
    idx = _gumbel_topk_sample(key, logits, H, k)
    g = jax.random.gumbel(key, (H, M)) + logits[None, :]
    _, ref_idx = jax.lax.top_k(g, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    # without replacement: no duplicate index inside a sample
    arr = np.asarray(idx)
    assert all(len(set(row)) == k for row in arr)


def test_gumbel_sample_distinct_with_few_finite_logits():
    """Fewer finite logits than the sample size: the sampler must still
    return k DISTINCT indices (like top_k over a mostly--inf row), never
    sample a valid match twice."""
    from rgbdslam_v2_tpu.ops.registration import _gumbel_topk_sample

    M, H, k = 300, 16, 4
    logits = jnp.full((M,), -jnp.inf).at[7].set(0.5).at[42].set(0.1)
    idx = np.asarray(_gumbel_topk_sample(jax.random.PRNGKey(3), logits, H, k))
    for row in idx:
        assert len(set(row)) == k, row
        assert {7, 42} <= set(row)  # finite entries always picked first
        # the -inf fill picks ascend by index (stable-sort tie-break)
        fill = [i for i in row if i not in (7, 42)]
        assert fill == sorted(fill)
