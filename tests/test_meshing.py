"""Triangle meshing of organized node grids (io/meshing.py) + the viewer's
mesh / sigma-splat layers.

Capability parity: the reference GL viewer renders node clouds as triangle
strips with a per-quad depth-jump test (glviewer.cpp:776-880) and has an
ellipsoid uncertainty render mode (glviewer.cpp:922). Here the mesh is an
indexed triangle list persisted as binary PLY (`run --save-mesh`) and
rendered as a toggleable WebGL layer; sigma splats scale per-point by the
quadratic depth-noise model."""
import base64
import json
import re

import numpy as np
import pytest

from rgbdslam_v2_tpu.io.meshing import (
    compact_mesh,
    grid_mesh_faces,
    merge_meshes,
    read_ply_mesh,
    write_ply_mesh,
)


def test_grid_mesh_faces_depth_jump_and_validity():
    # flat 1 m plane: every interior quad yields 2 triangles
    depth = np.ones((4, 5), np.float32)
    valid = np.ones_like(depth, bool)
    faces = grid_mesh_faces(depth, valid)
    assert len(faces) == 2 * 3 * 4  # (H-1)*(W-1) quads x 2
    assert faces.min() >= 0 and faces.max() < 20

    # a depth discontinuity column removes the triangles that bridge it
    depth2 = depth.copy()
    depth2[:, 2:] = 2.0  # 1 m jump >> 5% of 2 m
    f2 = grid_mesh_faces(depth2, valid)
    cols = f2 % 5
    rows_span = [np.ptp(cols[i]) for i in range(len(f2))]
    assert len(f2) < len(faces)
    # no surviving triangle spans the jump between columns 1 and 2
    for tri, span in zip(f2, rows_span):
        c = np.sort(tri % 5)
        assert not (c[0] <= 1 and c[-1] >= 2), tri

    # invalid vertices kill their triangles
    valid3 = valid.copy()
    valid3[1, 1] = False
    f3 = grid_mesh_faces(depth, valid3)
    assert not (f3 == 1 * 5 + 1).any()
    assert len(f3) < len(faces)


def test_compact_merge_and_ply_roundtrip(tmp_path):
    depth = np.ones((3, 3), np.float32)
    valid = np.ones_like(depth, bool)
    valid[0, 0] = False
    faces = grid_mesh_faces(depth, valid)
    pts = np.arange(27, dtype=np.float32).reshape(9, 3)
    cols = np.arange(27, dtype=np.uint8).reshape(9, 3)
    v, c, f = compact_mesh(pts, cols, faces)
    assert len(v) < 9  # vertex 0 unused -> dropped
    assert f.max() < len(v)
    # geometry preserved through the remap
    np.testing.assert_array_equal(v[f[0]], pts[faces[0]])

    mv, mc, mf = merge_meshes([(v, c, f), (v + 100.0, c, f)])
    assert len(mv) == 2 * len(v) and len(mf) == 2 * len(f)
    assert mf[len(f):].min() == len(v)  # second part's indices offset

    p = tmp_path / "m.ply"
    write_ply_mesh(p, mv, mc, mf)
    rv, rc, rf = read_ply_mesh(p)
    np.testing.assert_array_equal(rv, mv)
    np.testing.assert_array_equal(rc, mc)
    np.testing.assert_array_equal(rf, mf)
    raw = p.read_bytes()
    head = raw[: raw.index(b"end_header")].decode(errors="replace")
    assert "binary_little_endian" in head and "vertex_indices" in head


def _payload(html: str) -> dict:
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m
    return json.loads(m.group(1))


def test_viewer_embeds_mesh_and_sigma_layers():
    from rgbdslam_v2_tpu.io.viewer_html import build_viewer_html

    pts = np.array([[0, 0, 1], [1, 0, 2], [0, 1, 3]], np.float32)
    mesh = (
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[10, 20, 30]] * 3, np.uint8),
        np.array([[0, 1, 2]], np.int32),
    )
    sig = np.array([0.01, 0.04, 0.09], np.float32)
    html = build_viewer_html(pts, mesh=mesh, sigmas=sig)
    d = _payload(html)
    np.testing.assert_array_equal(
        np.frombuffer(base64.b64decode(d["mpos"]), np.float32).reshape(-1, 3),
        mesh[0])
    np.testing.assert_array_equal(
        np.frombuffer(base64.b64decode(d["midx"]), np.uint32).reshape(-1, 3),
        [[0, 1, 2]])
    np.testing.assert_array_equal(
        np.frombuffer(base64.b64decode(d["sigma"]), np.float32), sig)
    assert "drawElements" in html and "tMesh" in html and "tSig" in html
    # layers absent -> empty payloads, JS guards stay off
    d0 = _payload(build_viewer_html(pts))
    assert d0["mpos"] == "" and d0["sigma"] == ""


@pytest.mark.heavy
def test_pipeline_save_mesh_end_to_end(tmp_path):
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=cam)
    poses, rgbs, depths = render_sequence(world, 4, seed=2)
    pipe = SlamPipeline(cam, ParameterServer(dict(
        max_keypoints=256, tpu_max_nodes=8, tpu_max_edges=64,
        tpu_candidate_batch=2, ransac_iterations=64, min_matches=12,
        optimizer_skip_step=100, keep_all_nodes=True,
        observability_threshold=0.5)))
    pipe.run_arrays(rgbs, depths, np.arange(4) / 30.0, gt_poses=poses)
    n = pipe.save_mesh(tmp_path / "mesh.ply")
    assert n > 1000  # a real surface, not a degenerate sliver
    v, c, f = read_ply_mesh(tmp_path / "mesh.ply")
    assert len(v) and f.max() < len(v)
    # world-frame sanity: mesh occupies the same volume as the cloud export
    assert np.isfinite(v).all()
    span = v.max(0) - v.min(0)
    assert (span > 0.5).all(), span
