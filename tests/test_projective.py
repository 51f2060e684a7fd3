"""Projective pairwise refinement (g2o_transformation_refinement parity;
reference: src/transformation_estimation.cpp:37-170)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.ops.projective import refine_projective, uvz_from_xyz
from rgbdslam_v2_tpu.ops.registration import ransac_register

FX = FY = 525.0
CX, CY = 319.5, 239.5


def _far_scene(seed, n=96, z_lo=4.0, z_hi=9.0, sigma_depth=0.01):
    """Far-field correspondences with quadratic depth noise — the regime
    where pixel-space residuals out-condition 3D Mahalanobis refits."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(z_lo, z_hi, n)
    u = rng.uniform(40, 600, n)
    v = rng.uniform(40, 440, n)
    src = np.stack([(u - CX) * z / FX, (v - CY) * z / FY, z], -1).astype(np.float32)
    T_true = se3.exp_se3(jnp.asarray(
        rng.uniform(-0.15, 0.15, 6).astype(np.float32)))
    dst_clean = np.asarray(se3.apply(T_true, jnp.asarray(src)))
    # sensor model: ~0.5 px detection noise + 0.01 z^2 depth noise per frame
    def observe(pts):
        uvz = np.array(uvz_from_xyz(jnp.asarray(pts), FX, FY, CX, CY))
        uvz[:, :2] += rng.normal(0, 0.5, (len(pts), 2))
        uvz[:, 2] += rng.normal(0, sigma_depth, len(pts)) * uvz[:, 2] ** 2
        xyz = np.stack(
            [(uvz[:, 0] - CX) * uvz[:, 2] / FX,
             (uvz[:, 1] - CY) * uvz[:, 2] / FY, uvz[:, 2]], -1)
        return uvz.astype(np.float32), xyz.astype(np.float32)
    src_uvz, src_xyz = observe(src)
    dst_uvz, dst_xyz = observe(dst_clean)
    return src_uvz, src_xyz, dst_uvz, dst_xyz, np.asarray(T_true)


def _pose_err(T_est, T_true):
    err = se3.relative(jnp.asarray(T_true), jnp.asarray(T_est))
    return float(se3.translation_norm(err)), float(se3.rotation_angle(err))


def test_projective_converges_from_perturbed_init():
    src_uvz, src_xyz, dst_uvz, dst_xyz, T_true = _far_scene(0)
    T0 = np.asarray(
        se3.exp_se3(jnp.asarray([0.03, -0.02, 0.04, 0.01, -0.015, 0.02],
                                jnp.float32))
    ) @ T_true
    T = refine_projective(
        jnp.asarray(T0), jnp.asarray(src_uvz), jnp.asarray(dst_uvz),
        jnp.ones(len(src_uvz), jnp.float32), FX, FY, CX, CY,
        iterations=6,
    )
    t0_err, r0_err = _pose_err(T0, T_true)
    t_err, r_err = _pose_err(T, T_true)
    assert t_err < t0_err * 0.5
    assert r_err < r0_err * 0.5


def test_projective_beats_kabsch_on_far_noisy_depth():
    """VERDICT r2 #3 done-criterion: on far-field/noisy-depth matches the
    (u,v,z) GN refinement must beat pure 3D Kabsch refitting (median over
    seeds — both estimators see identical data)."""
    from rgbdslam_v2_tpu.core.alignment import weighted_kabsch

    rot_gains = []
    for seed in range(6):
        src_uvz, src_xyz, dst_uvz, dst_xyz, T_true = _far_scene(seed)
        w = jnp.ones(len(src_uvz), jnp.float32)
        # 3D path: weighted Kabsch refit (what refine_iterations does)
        T_kabsch = weighted_kabsch(
            jnp.asarray(src_xyz), jnp.asarray(dst_xyz), w
        )
        T_proj = refine_projective(
            T_kabsch, jnp.asarray(src_uvz), jnp.asarray(dst_uvz), w,
            FX, FY, CX, CY, iterations=6,
        )
        _, r_k = _pose_err(T_kabsch, T_true)
        _, r_p = _pose_err(T_proj, T_true)
        rot_gains.append(r_k / max(r_p, 1e-9))
    # pixel-space bearing residuals recover rotation far better than 3D
    # refits whose lateral covariance grows with z
    assert np.median(rot_gains) > 1.2, rot_gains


def test_ransac_projective_toggle():
    """projective_iterations>0 toggles the refinement inside ransac_register
    and must not degrade the standard scene."""
    rng = np.random.default_rng(7)
    src_uvz, src_xyz, dst_uvz, dst_xyz, T_true = _far_scene(7)
    res0 = ransac_register(
        jax.random.PRNGKey(0), jnp.asarray(src_xyz), jnp.asarray(dst_xyz),
        jnp.zeros(len(src_xyz)), jnp.ones(len(src_xyz), bool),
        cam_fx=FX, cam_fy=FY, n_hypotheses=128,
    )
    res1 = ransac_register(
        jax.random.PRNGKey(0), jnp.asarray(src_xyz), jnp.asarray(dst_xyz),
        jnp.zeros(len(src_xyz)), jnp.ones(len(src_xyz), bool),
        cam_fx=FX, cam_fy=FY, n_hypotheses=128,
        projective_iterations=4, cam_cx=CX, cam_cy=CY,
    )
    assert bool(res0.success) and bool(res1.success)
    _, r0 = _pose_err(res0.transform, T_true)
    _, r1 = _pose_err(res1.transform, T_true)
    assert r1 <= r0 * 1.05  # never worse; usually better
    # acceptance metric still healthy after the projective step
    assert int(res1.n_inliers) >= int(res0.n_inliers) * 0.8


def test_param_reaches_both_paths():
    """g2o_transformation_refinement must alter the compiled step config in
    the slow path AND the fast (device_step) path."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.graph.manager import GraphManager

    params = ParameterServer(dict(
        max_keypoints=64, tpu_max_nodes=8, tpu_max_edges=64,
        tpu_candidate_batch=2, g2o_transformation_refinement=3,
    ))
    mgr = GraphManager(TUM_DEFAULT, params)
    cfg = mgr._step_cfg()
    assert cfg["projective_iterations"] == 3
    assert cfg["refine_iterations"] == params["refine_iterations"]
