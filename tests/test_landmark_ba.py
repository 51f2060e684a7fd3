import pytest

import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.optim.landmark_ba import (
    chi2,
    make_landmark_graph,
    optimize_landmarks,
)

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


def _make_problem(seed=0, n_poses=5, n_lm=40, pose_noise=0.03, lm_noise=0.05):
    rng = np.random.default_rng(seed)
    # ground-truth poses along a small arc, looking at +z landmarks
    gt_poses = []
    for k in range(n_poses):
        xi = np.array([0.15 * k, 0.02 * k, 0.0, 0.0, 0.05 * k, 0.0], np.float32)
        gt_poses.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
    gt_poses = np.stack(gt_poses)
    gt_lm = np.stack(
        [rng.uniform(-1.5, 2.0, n_lm), rng.uniform(-1.0, 1.0, n_lm),
         rng.uniform(2.0, 4.0, n_lm)], -1
    ).astype(np.float32)

    obs_lm, obs_pose, obs_uvz = [], [], []
    for p in range(n_poses):
        Tcw = np.asarray(se3.inv(jnp.asarray(gt_poses[p])))
        pc = gt_lm @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        u = pc[:, 0] / z * CAM.fx + CAM.cx
        v = pc[:, 1] / z * CAM.fy + CAM.cy
        vis = (z > 0.5) & (u > 0) & (u < 160) & (v > 0) & (v < 120)
        for l in np.nonzero(vis)[0]:
            obs_lm.append(l)
            obs_pose.append(p)
            obs_uvz.append([u[l], v[l], z[l]])
    O = len(obs_lm)
    g = make_landmark_graph(n_poses, n_lm, O)
    # noisy initialization
    noisy_poses = np.stack(
        [
            gt_poses[k]
            @ np.asarray(
                se3.exp_se3(jnp.asarray(rng.normal(0, pose_noise, 6).astype(np.float32)))
            )
            if k > 0
            else gt_poses[k]
            for k in range(n_poses)
        ]
    )
    noisy_lm = gt_lm + rng.normal(0, lm_noise, gt_lm.shape).astype(np.float32)
    g = g._replace(
        poses=jnp.asarray(noisy_poses),
        pose_fixed=g.pose_fixed.at[0].set(True),
        landmarks=jnp.asarray(noisy_lm),
        lm_active=jnp.ones(n_lm, bool),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_uvz=jnp.asarray(np.asarray(obs_uvz, np.float32)),
        obs_active=jnp.ones(O, bool),
    )
    return g, gt_poses, gt_lm


def test_ba_reduces_chi2_and_recovers_geometry():
    g, gt_poses, gt_lm = _make_problem()
    c0 = float(chi2(g, CAM))
    g2 = optimize_landmarks(g, CAM, iterations=40)
    c1 = float(chi2(g2, CAM))
    assert c1 < c0 * 1e-3
    # poses recovered (alternating BA converges linearly; generous bound)
    err_t = np.linalg.norm(np.asarray(g2.poses)[:, :3, 3] - gt_poses[:, :3, 3], axis=-1)
    assert err_t.max() < 0.01
    # landmarks recovered
    lm_err = np.linalg.norm(np.asarray(g2.landmarks) - gt_lm, axis=-1)
    assert np.median(lm_err) < 0.01


def test_ba_fixed_pose_unchanged():
    g, gt_poses, _ = _make_problem()
    g2 = optimize_landmarks(g, CAM, iterations=5)
    np.testing.assert_allclose(
        np.asarray(g2.poses[0]), np.asarray(g.poses[0]), atol=1e-6
    )


def test_ba_inactive_observations_ignored():
    g, _, _ = _make_problem()
    # deactivate everything: nothing should move
    g = g._replace(obs_active=jnp.zeros_like(g.obs_active))
    g2 = optimize_landmarks(g, CAM, iterations=3)
    np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g.poses), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g2.landmarks), np.asarray(g.landmarks), atol=1e-5
    )

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier
