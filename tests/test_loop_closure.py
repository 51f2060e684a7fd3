"""Loop-closure regression test: the reason the backend exists.

A full-orbit (>360 deg) synthetic sequence with sensor noise revisits its
start; the graph must discover non-sequential loop edges — via random
keyframe sampling (the reference's getPotentialEdgeTargetsWithDijkstra
sampled candidates, graph_manager.cpp:204-324) and via appearance-based
global retrieval (loop_closing.cpp capability) — and full optimization must
reduce the accumulated odometry drift.
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
N = 130  # x 3 deg/frame = 390 deg: a full orbit plus overlap


@pytest.fixture(scope="module")
def orbit_seq():
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = np.asarray(world.orbit_trajectory(N, seed=2, deg_per_frame=3.0))
    import jax.numpy as jnp

    rgbs, depths = [], []
    rng = np.random.default_rng(7)
    for s in range(0, N, 16):
        chunk = jnp.asarray(poses[s : s + 16])
        pad = 16 - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad, 0)], 0)
        rgb, depth = world.render_batch(chunk)
        n = 16 - pad
        rgbs.append(np.asarray((rgb[:n] * 255).astype(jnp.uint8)))
        d = np.asarray(depth[:n])
        # Kinect-style quadratic noise + TUM 1/5000 quantization -> real drift
        d = np.where(d > 0, d + rng.normal(size=d.shape) * 0.01 * d * d, 0.0)
        depths.append(np.round(d * 5000.0) / 5000.0)
    rgbs = np.concatenate(rgbs, 0)
    depths = np.concatenate(depths, 0).astype(np.float32)
    stamps = np.arange(N) / 30.0
    return poses, rgbs, depths, stamps


def _params(**over):
    base = dict(
        max_keypoints=256,
        tpu_max_nodes=192,
        tpu_max_edges=2048,
        tpu_candidate_batch=6,
        ransac_iterations=128,
        min_matches=12,
        predecessor_candidates=2,
        neighbor_candidates=1,
        min_sampled_candidates=3,
        optimizer_skip_step=1000,  # no online optimize: isolate L0 drift
        keep_all_nodes=True,
        observability_threshold=0.5,
    )
    base.update(over)
    return ParameterServer(base)


def _run(seq, **over):
    poses, rgbs, depths, stamps = seq
    pipe = SlamPipeline(CAM, _params(**over))
    pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
    return pipe


def _ate(pipe, seq):
    poses, _rgbs, _depths, stamps = seq
    est_stamps, est_poses = pipe.manager.trajectory()
    return evaluate_ate(
        est_stamps, est_poses[:, :3, 3], list(stamps), poses[:, :3, 3]
    ).rmse


def test_keyframe_sampling_finds_loops_and_optimize_reduces_drift(orbit_seq):
    """Random keyframe sampling (graph_manager.cpp:204-324) discovers loop
    edges on a revisit, and full optimization reduces the drift they expose
    (measured ~0.73x; asserted with margin)."""
    pipe = _run(orbit_seq)
    stats = pipe.manager.statistics()
    assert stats["loop_edges"] > 0, f"no loop edges discovered: {stats}"
    ate_l0 = _ate(pipe, orbit_seq)
    pipe.manager.optimize(blocking=True)
    ate_l1 = _ate(pipe, orbit_seq)
    assert ate_l1 < 0.85 * ate_l0 or ate_l1 < 0.01, (
        f"loop closure did not reduce drift: L0={ate_l0:.4f} L1={ate_l1:.4f}"
    )


def test_global_retrieval_finds_loops(orbit_seq):
    """Deferred on-device appearance retrieval (loop_closing.py
    global_match_scores_from_store, consumed one frame later in
    select_candidates) proposes distant revisit candidates that become
    accepted loop edges — including orbit-closing spans."""
    pipe = _run(orbit_seq, min_sampled_candidates=0, global_loop_candidates=2)
    stats = pipe.manager.statistics()
    assert stats["loop_edges"] > 0, (
        f"appearance retrieval found no loop edges: {stats}"
    )
    spans = [abs(i - j) for e, (t, pair) in enumerate(
        zip(pipe.manager.edge_types, pipe.manager.edge_pairs))
        if t == 1 and pair is not None for (i, j) in [pair]]
    assert max(spans) > 50, f"no long-span loop edge found: spans={spans}"


def test_both_mechanisms_cut_drift_strongly(orbit_seq):
    """Sampling + retrieval together: the VERDICT bar — optimization cuts
    ATE by >=30% once genuine orbit-closing constraints exist (measured
    ~0.34x after the use_feature_min_depth fix removed the systematic
    scale bias that loop closures cannot correct)."""
    pipe = _run(orbit_seq, global_loop_candidates=2)
    stats = pipe.manager.statistics()
    assert stats["loop_edges"] > 0
    ate_l0 = _ate(pipe, orbit_seq)
    pipe.manager.optimize(blocking=True)
    ate_l1 = _ate(pipe, orbit_seq)
    assert ate_l1 < 0.7 * ate_l0, (
        f"expected >=30% drift reduction: L0={ate_l0:.4f} L1={ate_l1:.4f}"
    )
