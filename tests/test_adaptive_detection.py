"""Adaptive low-texture detection (DetectorAdjuster parity; reference:
src/feature_adjuster.cpp:131-175 — lower the detector threshold when too
few corners fire, recover toward the base when saturated)."""
import numpy as np
import pytest

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.graph.manager import GraphManager
from rgbdslam_v2_tpu.io import SyntheticWorld


CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


def _dark_frames(n=8, scale=0.055):
    """Low-contrast renders: texture amplitude ~14/255 intensity levels —
    just below the default FAST threshold (0.06*255 ~ 15 levels), solidly
    above half of it once the adjuster steps down a rung."""
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = world.orbit_trajectory(n, seed=3)
    frames = []
    for T in poses:
        rgb, depth = world.render(T)
        dark = (np.asarray(rgb) * scale * 255).astype(np.uint8)
        frames.append((dark, np.asarray(depth)))
    return frames


def _params(adjuster):
    return ParameterServer(dict(
        max_keypoints=128, tpu_max_nodes=16, tpu_max_edges=256,
        tpu_candidate_batch=2, ransac_iterations=64, min_matches=12,
        keep_all_nodes=False, keep_good_nodes=False,
        adjuster_max_iterations=adjuster,
    ))


def test_dark_scene_starves_without_adjuster():
    frames = _dark_frames()
    mgr = GraphManager(CAM, _params(0))
    for k, (rgb, depth) in enumerate(frames):
        mgr.add_frame(rgb, depth, k / 30.0)
    # base threshold finds too few depth-valid corners -> matching starves
    # and non-first frames are rejected (no fallback: keep_*_nodes False)
    assert mgr.n_nodes <= 2
    assert mgr.extractor.fast_threshold == pytest.approx(0.06)


def test_dark_scene_tracks_with_adjuster():
    frames = _dark_frames()
    mgr = GraphManager(CAM, _params(5))
    for k, (rgb, depth) in enumerate(frames):
        mgr.add_frame(rgb, depth, k / 30.0)
    # threshold stepped down the ladder...
    assert mgr.extractor.fast_threshold < 0.06
    # ...and the tail of the sequence tracks with visual edges
    assert mgr.n_nodes >= 4
    assert mgr.n_seq_edges >= 2


@pytest.mark.heavy
def test_threshold_recovers_on_rich_texture():
    """After adapting down on dark frames, bright frames with saturated
    detection walk the threshold back toward the base."""
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = world.orbit_trajectory(10, seed=3)
    mgr = GraphManager(CAM, _params(5))
    k = 0
    for T in poses[:4]:
        rgb, depth = world.render(T)
        dark = (np.asarray(rgb) * 0.04 * 255).astype(np.uint8)
        mgr.add_frame(dark, np.asarray(depth), k / 30.0)
        k += 1
    lowered = mgr.extractor.fast_threshold
    assert lowered < 0.06
    for T in poses[4:]:
        rgb, depth = world.render(T)
        bright = (np.asarray(rgb) * 255).astype(np.uint8)
        mgr.add_frame(bright, np.asarray(depth), k / 30.0)
        k += 1
    assert mgr.extractor.fast_threshold > lowered


@pytest.mark.heavy
def test_fast_path_adapts_via_drain():
    """keep_all_nodes fast path: the adjuster consumes the drained
    n_valid_kp summary — no extra device syncs."""
    frames = _dark_frames(n=8)
    params = ParameterServer(dict(
        max_keypoints=128, tpu_max_nodes=16, tpu_max_edges=256,
        tpu_candidate_batch=2, ransac_iterations=64, min_matches=12,
        keep_all_nodes=True, adjuster_max_iterations=5,
        tpu_drain_interval=2,
    ))
    mgr = GraphManager(CAM, params)
    for k, (rgb, depth) in enumerate(frames):
        mgr.add_frame(rgb, depth, k / 30.0)
    mgr._drain_pending()
    assert mgr.extractor.fast_threshold < 0.06
