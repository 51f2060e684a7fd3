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


# ---------------------------------------------------------------------------
# Headless 3D rendering (glviewer capability; io/render3d.py)
# ---------------------------------------------------------------------------
def test_render_points_zbuffer_occlusion():
    from rgbdslam_v2_tpu.io.render3d import look_at, render_points

    # red plane at z=2 behind, green point cluster at z=1 in front
    yy, xx = np.mgrid[-1:1:40j, -1:1:40j]
    back = np.stack([xx.ravel(), yy.ravel(), np.full(xx.size, 2.0)], -1)
    front = np.stack([np.zeros(50), np.zeros(50), np.ones(50)], -1) \
        + np.random.default_rng(0).normal(scale=0.01, size=(50, 3))
    pts = np.concatenate([back, front])
    cols = np.concatenate([
        np.tile(np.array([[255, 0, 0]], np.uint8), (len(back), 1)),
        np.tile(np.array([[0, 255, 0]], np.uint8), (len(front), 1)),
    ])
    T = look_at(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    img, depth = render_points(pts, cols, T, size=(160, 120), splat=3)
    cy, cx = 60, 80
    center = img[cy - 2 : cy + 3, cx - 2 : cx + 3]
    # the front cluster must own the center pixels (z-buffer works)
    assert (center[..., 1].max() == 255) and (center[..., 0].max() == 0)
    assert abs(float(depth[cy, cx]) - 1.0) < 0.05


def test_render_orbit_views_with_trajectory(tmp_path):
    from rgbdslam_v2_tpu.io.render3d import render_orbit_views

    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (2000, 3))
    cols = rng.integers(0, 255, (2000, 3), dtype=np.uint8)
    traj = np.tile(np.eye(4), (20, 1, 1))
    traj[:, 0, 3] = np.linspace(-1, 1, 20)
    paths = render_orbit_views(pts, cols, tmp_path / "views", traj=traj,
                               edges=[(0, 19)], n_views=3, size=(160, 120))
    assert len(paths) == 3
    import pathlib
    for p in paths:
        raw = pathlib.Path(p).read_bytes()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n" or raw[:2] != b""  # png/cv2 jpeg?
        assert pathlib.Path(p).stat().st_size > 500
