import numpy as np

from rgbdslam_v2_tpu.io.visualization import draw_feature_flow, export_graph_ply


import pytest

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

def test_draw_feature_flow_marks_pixels():
    rgb = np.zeros((60, 80, 3), np.uint8)
    uv_now = np.asarray([[40.0, 30.0], [10.0, 10.0]])
    uv_prev = np.asarray([[35.0, 28.0], [12.0, 14.0]])
    valid = np.asarray([True, True])
    inl = np.asarray([True, False])
    img = draw_feature_flow(rgb, uv_now, uv_prev, valid, inl)
    assert img.shape == rgb.shape
    assert (img != 0).any()
    # inlier flow green somewhere along the first segment
    assert (img[:, :, 1] == 255).any()
    # outlier flow red somewhere
    assert (img[:, :, 0] == 255).any()
    # original not modified
    assert (rgb == 0).all()


def test_export_graph_ply(tmp_path):
    poses = np.stack([np.eye(4, dtype=np.float32)] * 4)
    for k in range(4):
        poses[k][0, 3] = k * 0.5
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), None]
    active = np.asarray([True, True, False, True, False])
    types = [0, 0, 0, 1, -1]
    path = tmp_path / "graph.ply"
    n = export_graph_ply(path, poses, pairs, active, types)
    assert n == 3  # two sequential + one loop; inactive and None skipped
    raw = path.read_bytes()
    assert raw.startswith(b"ply\n")
    assert b"element vertex 6" in raw
    assert b"element edge 3" in raw
