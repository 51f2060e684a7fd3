"""End-to-end SLAM on a synthetic sequence with exact ground truth.
This is the contract test corresponding to the reference's benchmark
protocol (TUM sequences + evaluate_ate): run the full pipeline —
extraction, matching, RANSAC, EMM, pose graph, optimization, 5-level
evaluation — and require small ATE against exact synthetic ground truth.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.eval import evaluate_ate
from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
from rgbdslam_v2_tpu.pipeline import SlamPipeline

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
N_FRAMES = 25


@pytest.fixture(scope="module")
def synthetic_seq():
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses, rgbs, depths = render_sequence(world, N_FRAMES, seed=2)
    stamps = np.arange(N_FRAMES) / 30.0
    return poses, rgbs, depths, stamps


def _params(**over):
    base = dict(
        max_keypoints=256,
        tpu_max_nodes=64,
        tpu_max_edges=512,
        tpu_candidate_batch=4,
        ransac_iterations=128,
        min_matches=12,
        optimizer_skip_step=10,
        keep_all_nodes=True,
        observability_threshold=0.5,
    )
    base.update(over)
    return ParameterServer(base)


def test_sequential_slam_low_ate(synthetic_seq):
    poses, rgbs, depths, stamps = synthetic_seq
    pipe = SlamPipeline(CAM, _params())
    pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
    assert pipe.manager.n_nodes >= N_FRAMES - 3
    est_stamps, est_poses = pipe.manager.trajectory()
    res = evaluate_ate(est_stamps, est_poses[:, :3, 3], list(stamps), poses[:, :3, 3])
    # exact synthetic data, ~5 cm scene scale motion steps -> tight bound
    assert res.rmse < 0.05, f"ATE rmse {res.rmse}"
    stats = pipe.manager.statistics()
    assert stats["edges"] >= stats["nodes"] - 2


def test_brisk_family_ate_within_2x_of_orb(synthetic_seq):
    """feature_extractor_type=BRISK end to end (VERDICT r3 #8 done-when):
    ATE within 2x of ORB on the same sequence."""
    poses, rgbs, depths, stamps = synthetic_seq
    ates = {}
    for fam in ("ORB", "BRISK"):
        pipe = SlamPipeline(CAM, _params(feature_extractor_type=fam))
        pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
        assert pipe.manager.n_nodes >= N_FRAMES - 3, fam
        est_stamps, est_poses = pipe.manager.trajectory()
        res = evaluate_ate(
            est_stamps, est_poses[:, :3, 3], list(stamps), poses[:, :3, 3]
        )
        ates[fam] = res.rmse
    print(f"[A/B] ATE ORB {ates['ORB']:.4f} m vs BRISK {ates['BRISK']:.4f} m")
    assert ates["BRISK"] < 0.05
    assert ates["BRISK"] < max(2.0 * ates["ORB"], ates["ORB"] + 0.005)


def test_delta_wire_matches_absolute_ate(synthetic_seq):
    """tpu_wire_delta end to end: the temporal-delta wire (P-frames of
    4-bit luma + 5-bit depth-code residuals) must not cost accuracy vs the
    absolute yc12 wire on the contract sequence. On a low-motion sequence
    residuals rarely clamp, so the trajectories should agree to sub-mm."""
    poses, rgbs, depths, stamps = synthetic_seq
    ates = {}
    for delta in (False, True):
        pipe = SlamPipeline(CAM, _params(tpu_wire_delta=delta))
        pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
        assert pipe.manager.n_nodes >= N_FRAMES - 3
        est_stamps, est_poses = pipe.manager.trajectory()
        res = evaluate_ate(
            est_stamps, est_poses[:, :3, 3], list(stamps), poses[:, :3, 3]
        )
        ates[delta] = res.rmse
    print(f"[A/B] ATE absolute {ates[False]:.5f} vs delta {ates[True]:.5f} m")
    assert ates[True] < 0.05
    assert abs(ates[True] - ates[False]) < 0.002


def test_delta_wire_paired_step(synthetic_seq):
    """tpu_wire_delta + tpu_frames_per_step=2: the fused two-frame dispatch
    threads the wire state through both frames (frame 1 predicts from frame
    0's in-program reconstruction)."""
    poses, rgbs, depths, stamps = synthetic_seq
    pipe = SlamPipeline(
        CAM, _params(tpu_wire_delta=True, tpu_frames_per_step=2)
    )
    pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
    assert pipe.manager.n_nodes >= N_FRAMES - 3
    est_stamps, est_poses = pipe.manager.trajectory()
    res = evaluate_ate(
        est_stamps, est_poses[:, :3, 3], list(stamps), poses[:, :3, 3]
    )
    assert res.rmse < 0.05, f"ATE rmse {res.rmse}"


def test_evaluation_protocol_improves_or_holds(tmp_path, synthetic_seq):
    poses, rgbs, depths, stamps = synthetic_seq
    pipe = SlamPipeline(CAM, _params())
    pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
    report = pipe.evaluation_protocol(
        tmp_path, gt_stamps=list(stamps), gt_xyz=poses[:, :3, 3]
    )
    assert set(report.levels) == {0, 1, 2, 3, 4}
    for lvl in range(5):
        assert (tmp_path / f"estimate_iteration_{lvl}.txt").exists()
    assert 1 in report.ate_rmse
    # optimization should not blow up the trajectory
    assert report.ate_rmse[4] < max(report.ate_rmse[0] * 1.5, 0.08)
    assert report.fps > 0


def test_trajectory_file_readable(tmp_path, synthetic_seq):
    from rgbdslam_v2_tpu.io.tum import read_trajectory_file

    poses, rgbs, depths, stamps = synthetic_seq
    pipe = SlamPipeline(CAM, _params())
    pipe.run_arrays(rgbs[:10], depths[:10], stamps[:10], gt_poses=poses)
    report = pipe.evaluation_protocol(tmp_path)
    data = read_trajectory_file(report.levels[1])
    assert data.shape[1] == 8
    assert data.shape[0] == pipe.manager.n_nodes
