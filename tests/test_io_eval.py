import numpy as np
import jax.numpy as jnp

from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.eval import evaluate_ate, evaluate_rpe
from rgbdslam_v2_tpu.io import SyntheticWorld, associate, render_sequence
from rgbdslam_v2_tpu.io.tum import read_trajectory_file, write_trajectory
from rgbdslam_v2_tpu.io.synthetic import save_as_tum_dataset
from rgbdslam_v2_tpu.core.camera import Intrinsics


SMALL_CAM = Intrinsics(fx=80.0, fy=80.0, cx=40.0, cy=30.0, width=80, height=60)


def test_associate_basic():
    a = [0.0, 1.0, 2.0, 3.0]
    b = [0.01, 1.5, 2.005, 2.995]
    pairs = associate(a, b, max_difference=0.02)
    assert (0, 0) in pairs and (2, 2) in pairs and (3, 3) in pairs
    assert all(ib != 1 for _, ib in pairs)  # 1.5 matches nothing


def test_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xi = rng.normal(size=(10, 6)).astype(np.float32)
    poses = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    stamps = [100.0 + 0.1 * i for i in range(10)]
    write_trajectory(tmp_path / "traj.txt", stamps, poses, comment="test")
    data = read_trajectory_file(tmp_path / "traj.txt")
    assert data.shape == (10, 8)
    np.testing.assert_allclose(data[:, 0], stamps, atol=1e-6)
    # positions match
    np.testing.assert_allclose(data[:, 1:4], poses[:, :3, 3], atol=1e-5)
    # quaternions reconstruct the rotations
    R = np.asarray(se3.quat_to_rot(jnp.asarray(data[:, 4:8], jnp.float32)))
    np.testing.assert_allclose(R, poses[:, :3, :3], atol=1e-4)


def test_ate_zero_for_rigidly_displaced_trajectory():
    rng = np.random.default_rng(1)
    gt = rng.uniform(-3, 3, (50, 3))
    T = se3.exp_se3(jnp.array([1, 2, 3, 0.2, 0.3, 0.1], jnp.float32))
    est = np.asarray(se3.apply(T, jnp.asarray(gt, jnp.float32)))
    stamps = list(np.arange(50) * 0.1)
    res = evaluate_ate(stamps, est, stamps, gt)
    assert res.rmse < 1e-3
    assert res.n_pairs == 50


def test_ate_known_error():
    gt = np.zeros((10, 3))
    gt[:, 0] = np.arange(10)
    est = gt.copy()
    est[5, 1] += 0.1  # one 10 cm offset
    stamps = list(np.arange(10) * 0.1)
    res = evaluate_ate(stamps, est, stamps, gt)
    assert 0.0 < res.rmse < 0.1
    assert res.max > 0.05


def test_rpe():
    xi = np.zeros((20, 6), np.float32)
    xi[:, 0] = np.arange(20) * 0.1  # straight line
    gt = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    est = gt.copy()
    t_err, r_err = evaluate_rpe(est, gt, delta=1)
    assert t_err.rmse < 1e-6 and r_err.rmse < 1e-5


def test_synthetic_world_render():
    world = SyntheticWorld.create(seed=0, texture_size=128, cam=SMALL_CAM)
    poses, rgbs, depths = render_sequence(world, 4, seed=2)
    assert rgbs.shape == (4, 60, 80, 3) and rgbs.dtype == np.uint8
    assert depths.shape == (4, 60, 80)
    # camera is inside the box: every ray hits a wall
    assert np.all(depths > 0.05)
    assert np.all(depths < 10.0)
    # images have texture (not constant)
    assert rgbs[0].std() > 10
    # depth is geometrically consistent: backprojected points lie on walls
    from rgbdslam_v2_tpu.core.camera import backproject_grid

    pts_cam = np.asarray(backproject_grid(jnp.asarray(depths[0]), SMALL_CAM))
    pts_world = np.asarray(
        se3.apply(jnp.asarray(poses[0], jnp.float32), jnp.asarray(pts_cam.reshape(-1, 3)))
    )
    ext = np.asarray(world.extent)
    on_wall = (
        (np.abs(pts_world) < 1e-2).any(-1)
        | (np.abs(pts_world - ext) < 1e-2).any(-1)
    )
    on_box = np.zeros(len(pts_world), bool)
    for bmin, bmax in world.boxes:
        bmin = np.asarray(bmin) - 1e-2
        bmax = np.asarray(bmax) + 1e-2
        inside = ((pts_world >= bmin) & (pts_world <= bmax)).all(-1)
        on_box |= inside
    assert (on_wall | on_box).mean() > 0.99


def test_synthetic_tum_roundtrip(tmp_path):
    from rgbdslam_v2_tpu.io import TumDataset

    world = SyntheticWorld.create(seed=0, texture_size=128, cam=SMALL_CAM)
    poses, rgbs, depths = render_sequence(world, 3, seed=2)
    save_as_tum_dataset(tmp_path / "seq", poses, rgbs, depths)
    ds = TumDataset.open(tmp_path / "seq")
    assert len(ds) == 3
    ts, rgb, depth = ds.load(0)
    assert rgb.shape == (60, 80, 3)
    np.testing.assert_allclose(depth, depths[0], atol=1.0 / 5000.0)
    np.testing.assert_allclose(rgb, rgbs[0])
    assert ds.groundtruth is not None and ds.groundtruth.shape == (3, 8)


def test_rpe_cli_roundtrip(tmp_path):
    """`rgbdslam rpe`: a trajectory with known constant drift per frame vs
    its ground truth reports that drift as the translational RPE mean."""
    import json
    import sys

    from rgbdslam_v2_tpu.apps.cli import main
    from rgbdslam_v2_tpu.io.tum import write_trajectory

    n = 20
    stamps = [i / 30.0 for i in range(n)]
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n) * 0.10  # 10 cm/frame along x
    est = gt.copy()
    est[:, 0, 3] = np.arange(n) * 0.11  # 1 cm/frame drift
    write_trajectory(tmp_path / "gt.txt", stamps, gt)
    write_trajectory(tmp_path / "est.txt", stamps, est)
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = main(["rpe", str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")])
    assert rc == 0
    rep = json.loads(buf.getvalue())
    assert abs(rep["translational_m"]["mean"] - 0.01) < 1e-6
    assert rep["rotational_rad"]["mean"] < 1e-6
    assert rep["n_pairs"] == n
