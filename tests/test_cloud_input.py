"""Point-cloud input modality (reference: cloud-based Node ctor
node.cpp:252-369, pcdCallback openni_listener.cpp:536 via topic_points,
loadPCDFiles :1063-1100): PCD/PLY readers, cloud->RGB-D conversion, the
PointCloud2 bag transport, and the end-to-end `run --pcd-dir` path."""
import json

import numpy as np
import pytest

from rgbdslam_v2_tpu.core.camera import Intrinsics, backproject_grid
from rgbdslam_v2_tpu.io.cloud_input import (
    CloudDataset,
    cloud_to_rgbd,
    load_cloud,
    read_ply,
)
from rgbdslam_v2_tpu.io.pointcloud import read_pcd, write_pcd, write_ply

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


def _frame(seed=0):
    """One rendered synthetic frame + its organized camera-frame cloud."""
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence

    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses, rgbs, depths = render_sequence(world, 2, seed=seed)
    rgb, depth = rgbs[0], np.asarray(depths[0], np.float32)
    pts = np.asarray(backproject_grid(depth, CAM))
    return rgb, depth, pts


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.integers(0, 256, (100, 3), dtype=np.uint8)
    write_ply(tmp_path / "c.ply", pts, cols)
    p2, c2 = read_ply(tmp_path / "c.ply")
    np.testing.assert_array_equal(p2, pts)
    np.testing.assert_array_equal(c2, cols)


def test_pcd_organized_roundtrip(tmp_path):
    rgb, depth, pts = _frame()
    flat = pts.reshape(-1, 3).copy()
    flat[depth.reshape(-1) <= 0] = np.nan  # PCL invalid convention
    write_pcd(tmp_path / "c.pcd", flat, rgb.reshape(-1, 3),
              organized_hw=(CAM.height, CAM.width))
    p2, c2, (h, w) = read_pcd(tmp_path / "c.pcd", return_shape=True)
    assert (h, w) == (CAM.height, CAM.width)
    np.testing.assert_array_equal(
        np.isnan(p2[:, 0]), depth.reshape(-1) <= 0)
    np.testing.assert_array_equal(c2, rgb.reshape(-1, 3))


def test_cloud_to_rgbd_organized(tmp_path):
    """Organized cloud -> the exact depth/rgb grid it came from."""
    rgb, depth, pts = _frame()
    grid = pts.copy()
    grid[depth <= 0] = np.nan
    rgb2, depth2 = cloud_to_rgbd(grid, rgb.reshape(-1, 3), CAM)
    np.testing.assert_allclose(depth2, np.where(depth > 0, depth, 0.0),
                               atol=1e-6)
    np.testing.assert_array_equal(rgb2, rgb)


def test_cloud_to_rgbd_organized_subsampled():
    """A stride-2 organized cloud (cloud_creation_skip_step) upsamples
    back to camera resolution."""
    rgb, depth, pts = _frame()
    sub = pts[::2, ::2]
    rgb2, depth2 = cloud_to_rgbd(sub, rgb[::2, ::2].reshape(-1, 3), CAM)
    assert depth2.shape == (CAM.height, CAM.width)
    np.testing.assert_allclose(depth2[::2, ::2],
                               np.where(depth[::2, ::2] > 0,
                                        depth[::2, ::2], 0.0), atol=1e-6)


def test_cloud_to_rgbd_splat():
    """Unorganized points splat back onto their source pixels; nearest
    point wins where two land on one pixel."""
    rgb, depth, pts = _frame()
    valid = depth.reshape(-1) > 0
    flat = pts.reshape(-1, 3)[valid]
    cols = rgb.reshape(-1, 3)[valid]
    order = np.random.default_rng(1).permutation(len(flat))
    rgb2, depth2 = cloud_to_rgbd(flat[order], cols[order], CAM)
    np.testing.assert_allclose(
        depth2.reshape(-1)[valid], depth.reshape(-1)[valid], atol=1e-5)
    np.testing.assert_array_equal(rgb2.reshape(-1, 3)[valid], cols)
    # occlusion: a point straight behind an existing one must lose
    one = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]], np.float32)
    _, d = cloud_to_rgbd(one, None, CAM)
    assert d[int(CAM.cy), int(CAM.cx)] == pytest.approx(1.0)


def test_cloud_dataset_stamps(tmp_path):
    rgb, depth, pts = _frame()
    write_pcd(tmp_path / "4.50.pcd", pts.reshape(-1, 3),
              rgb.reshape(-1, 3), organized_hw=(CAM.height, CAM.width))
    write_ply(tmp_path / "frame_b.ply", pts.reshape(-1, 3)[:10])
    ds = CloudDataset.open(tmp_path, CAM)
    assert len(ds) == 2
    assert ds.stamps[0] == pytest.approx(4.50)  # float stem = timestamp
    ts, rgb2, depth2 = ds.load(0)
    assert rgb2.shape == (CAM.height, CAM.width, 3)
    pts2, cols2, hw = load_cloud(ds.files[1])
    assert hw is None and len(pts2) == 10


def test_pointcloud2_bag_roundtrip(tmp_path):
    """Organized clouds written as PointCloud2 into a bag come back
    bit-equal through read_cloud_frames."""
    from rgbdslam_v2_tpu.io.rosbag import (
        BagWriter,
        PointCloud2Msg,
        read_cloud_frames,
    )

    rgb, depth, pts = _frame()
    grid = pts.astype(np.float32)
    bag = tmp_path / "clouds.bag"
    with BagWriter(bag) as w:
        for k in range(2):
            w.write("/camera/depth_registered/points",
                    "sensor_msgs/PointCloud2", 10.0 + k / 30.0,
                    PointCloud2Msg.encode(10.0 + k / 30.0, "camera", grid,
                                          rgb))
    frames = list(read_cloud_frames(bag, "/camera/depth_registered/points"))
    assert len(frames) == 2
    ts, p2, c2 = frames[0]
    assert ts == pytest.approx(10.0)
    assert p2.shape == (CAM.height, CAM.width, 3)
    np.testing.assert_allclose(p2, grid, atol=1e-7)
    np.testing.assert_array_equal(c2, rgb)


@pytest.mark.heavy
def test_run_pcd_dir_e2e(tmp_path):
    """`rgbdslam run --pcd-dir`: a short organized-PCD sequence produces a
    trajectory end-to-end with low ATE vs exact ground truth (the VERDICT
    round-4 'done when')."""
    from rgbdslam_v2_tpu.apps.cli import main
    from rgbdslam_v2_tpu.eval import evaluate_ate
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.io.tum import read_trajectory_file

    n = 10
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses, rgbs, depths = render_sequence(world, n, seed=2)
    pcd_dir = tmp_path / "clouds"
    pcd_dir.mkdir()
    for i in range(n):
        depth = np.asarray(depths[i], np.float32)
        pts = np.array(backproject_grid(depth, CAM)).reshape(-1, 3)
        pts[depth.reshape(-1) <= 0] = np.nan
        write_pcd(pcd_dir / f"{i / 30.0:.6f}.pcd", pts,
                  rgbs[i].reshape(-1, 3),
                  organized_hw=(CAM.height, CAM.width))
    out = tmp_path / "out"
    rc = main([
        "run", "--pcd-dir", str(pcd_dir), "--out", str(out),
        "--camera", "130,130,80,60,160,120",
        "-p", "max_keypoints=256", "-p", "tpu_max_nodes=64",
        "-p", "tpu_max_edges=512", "-p", "tpu_candidate_batch=4",
        "-p", "ransac_iterations=128", "-p", "min_matches=12",
        "-p", "keep_all_nodes=true",
    ])
    assert rc == 0
    rows = read_trajectory_file(out / "estimate.txt")
    assert len(rows) == n
    res = evaluate_ate(rows[:, 0], rows[:, 1:4],
                       np.arange(n) / 30.0, poses[:, :3, 3])
    assert float(res.rmse) < 0.05

    # same frames through the cloud-topic transport (topic_points ->
    # run_clouds' iterator branch); compile cache is warm from above
    from rgbdslam_v2_tpu.io.rosbag import BagWriter, PointCloud2Msg

    bag = tmp_path / "clouds.bag"
    with BagWriter(bag) as w:
        for i in range(4):
            depth = np.asarray(depths[i], np.float32)
            grid = np.asarray(backproject_grid(depth, CAM), np.float32)
            w.write("/points", "sensor_msgs/PointCloud2", i / 30.0,
                    PointCloud2Msg.encode(i / 30.0, "camera", grid, rgbs[i]))
    out2 = tmp_path / "out_bag"
    rc = main([
        "run", "--bagfile", str(bag), "--out", str(out2),
        "--camera", "130,130,80,60,160,120",
        "-p", "topic_points=/points",
        "-p", "max_keypoints=256", "-p", "tpu_max_nodes=64",
        "-p", "tpu_max_edges=512", "-p", "tpu_candidate_batch=4",
        "-p", "ransac_iterations=128", "-p", "min_matches=12",
        "-p", "keep_all_nodes=true",
    ])
    assert rc == 0
    assert len(read_trajectory_file(out2 / "estimate.txt")) == 4
