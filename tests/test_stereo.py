"""Stereo input modality (reference stereoCallback,
openni_listener.cpp:559-598): on-device block-matching disparity -> depth
(ops/stereo.py) feeding the standard SLAM pipeline."""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.io import SyntheticWorld
from rgbdslam_v2_tpu.ops.stereo import stereo_depth

pytestmark = pytest.mark.heavy

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
BASELINE = 0.25  # disparity SNR: b=0.12 gives ~2% depth error, 0.25 ~1%


def _stereo_pair(world, T):
    Tr = np.asarray(T).copy()
    Tr[:3, 3] = Tr[:3, 3] + Tr[:3, 0] * BASELINE
    rgb_l, d_l = world.render(jnp.asarray(T))
    rgb_r, _ = world.render(jnp.asarray(Tr))
    return (jnp.mean(rgb_l, -1), jnp.mean(rgb_r, -1), np.asarray(d_l))


def test_stereo_depth_matches_rendered_depth():
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    T = world.orbit_trajectory(10, seed=2)[0]
    gl, gr, d_true = _stereo_pair(world, T)
    depth, valid = stereo_depth(gl, gr, CAM.fx, BASELINE, max_disp=64)
    depth = np.asarray(depth)
    valid = np.asarray(valid)
    ok = valid & (d_true > 0)
    assert ok.mean() > 0.4, "too little valid stereo coverage"
    rel = np.abs(depth[ok] - d_true[ok]) / d_true[ok]
    assert np.median(rel) < 0.05
    assert np.percentile(rel, 90) < 0.15
    # invalid pixels carry the depth=0 missing convention
    assert (depth[~valid] == 0).all()


def test_stereo_dataset_roundtrip_and_slam(tmp_path):
    """save_as_stereo_dataset -> StereoDataset.open -> run_stereo: full
    SLAM on stereo-only input with usable ATE vs exact ground truth."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.eval import evaluate_ate
    from rgbdslam_v2_tpu.io.stereo_input import (
        StereoDataset,
        render_stereo_sequence,
        save_as_stereo_dataset,
    )
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses, lefts, rights, _ = render_stereo_sequence(
        world, 12, BASELINE, seed=2
    )
    save_as_stereo_dataset(tmp_path, poses, lefts, rights)
    assert (tmp_path / "groundtruth.txt").exists()
    ds = StereoDataset.open(tmp_path)
    assert len(ds) == 12
    ts, rgb, gl, gr = ds.load(0)
    assert rgb.dtype == np.uint8 and rgb.shape == (120, 160, 3)
    assert gl.shape == (120, 160) and gl.dtype == np.float32

    params = ParameterServer(dict(
        max_keypoints=256, tpu_max_nodes=32, tpu_max_edges=256,
        tpu_candidate_batch=4, ransac_iterations=128, min_matches=12,
        keep_all_nodes=True, observability_threshold=0.5,
        stereo_baseline=BASELINE, stereo_max_disparity=64,
    ))
    pipe = SlamPipeline(CAM, params)
    pipe.run_stereo(ds)
    assert pipe.manager.n_nodes >= 10
    pipe.manager.optimize(blocking=True)
    est_stamps, est_poses = pipe.manager.trajectory()
    stamps = [k / 30.0 for k in range(12)]
    res = evaluate_ate(
        est_stamps, est_poses[:, :3, 3], stamps, np.asarray(poses)[:, :3, 3]
    )
    # stereo depth is noisier than RGB-D (3-5% median depth error) but the
    # trajectory must stay metrically sane on this short sequence
    print(f"[stereo] ATE rmse {res.rmse:.4f} m over {pipe.manager.n_nodes} nodes")
    assert res.rmse < 0.08
