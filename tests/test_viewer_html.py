"""Interactive WebGL viewer export + serve endpoint (io/viewer_html.py).

The reference's GL viewer is an interactive Qt widget (glviewer.cpp); the
TPU-host equivalent is a self-contained WebGL HTML file plus a live-reload
HTTP server. These tests decode the embedded typed arrays back out of the
HTML and drive the serve handler over a real socket."""
import base64
import json
import re
import threading
import urllib.request

import numpy as np
import pytest

from rgbdslam_v2_tpu.io.viewer_html import build_viewer_html, write_viewer_html


def _payload(html: str) -> dict:
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA object not found"
    return json.loads(m.group(1))


def _f32(b64: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(b64), np.float32)


def test_viewer_html_embeds_points_and_colors():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 2]], np.float32)
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    html = build_viewer_html(pts, cols, title="t3")
    d = _payload(html)
    np.testing.assert_array_equal(
        _f32(d["pos"]).reshape(-1, 3), pts)
    np.testing.assert_array_equal(
        np.frombuffer(base64.b64decode(d["col"]), np.uint8).reshape(-1, 3),
        cols)
    assert "<canvas" in html and "WebGL" not in d  # js inline, no ext deps
    assert "gen" in d and d["gen"] == 0
    # static export: no live polling
    assert "function poll" not in html


def test_viewer_html_line_groups():
    pts = np.zeros((4, 3), np.float32)
    traj = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    for k in range(5):
        traj[k, 0, 3] = k
    html = build_viewer_html(
        pts, None, traj=traj, edges=[(0, 4), (1, 2)], axis_every=1)
    d = _payload(html)
    groups = d["groups"]
    assert groups[0][1] == 8  # 4 polyline segments -> 8 verts
    assert groups[1][1] == 2  # only (0,4) survives the |i-j|>1 filter
    assert groups[2][1] == 5 * 3 * 2  # axes triads at every pose
    lines = _f32(d["lines"]).reshape(-1, 6)
    assert len(lines) == groups[2][0] + groups[2][1]
    # trajectory verts walk x = 0..4
    assert lines[0, 0] == 0.0 and lines[7, 0] == 4.0


def test_viewer_html_subsamples_to_max_points():
    pts = np.random.default_rng(0).normal(size=(5000, 3)).astype(np.float32)
    html = build_viewer_html(pts, None, max_points=1000)
    d = _payload(html)
    assert len(_f32(d["pos"])) == 3000


def test_write_viewer_html(tmp_path):
    p = tmp_path / "v.html"
    out = write_viewer_html(p, np.zeros((2, 3), np.float32))
    assert out == str(p)
    assert p.read_text().startswith("<!DOCTYPE html>")


@pytest.mark.heavy
def test_serve_live_viewer(tmp_path):
    """End-to-end: `rgbdslam serve` over a real socket — viewer page, /gen
    generation counter, 404s, and live reload wiring."""
    from rgbdslam_v2_tpu.io.pointcloud import write_pcd
    from rgbdslam_v2_tpu.apps import cli

    pts = np.array([[0, 0, 1], [1, 1, 2]], np.float32)
    cols = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    write_pcd(tmp_path / "cloud.pcd", pts, cols)
    (tmp_path / "estimate.txt").write_text(
        "0.0 0 0 0 0 0 0 1\n1.0 1 0 0 0 0 0 1\n")

    # run cmd_serve's server in a thread on an ephemeral port
    import http.server
    import socketserver

    # reuse the handler by invoking cmd_serve's internals via a tiny shim:
    # patch TCPServer to capture the instance and use port 0
    captured = {}
    real_tcp = socketserver.TCPServer

    class Cap(real_tcp):
        allow_reuse_address = True

        def __init__(self, addr, handler):
            super().__init__(("127.0.0.1", 0), handler)
            captured["srv"] = self

        def serve_forever(self, *a, **k):
            captured["ready"].set()
            real_tcp.serve_forever(self)

    captured["ready"] = threading.Event()
    socketserver.TCPServer = Cap
    try:
        args = type("A", (), {"result_dir": str(tmp_path), "port": 0,
                              "host": "127.0.0.1"})
        th = threading.Thread(target=cli.cmd_serve, args=(args,), daemon=True)
        th.start()
        assert captured["ready"].wait(5)
        port = captured["srv"].server_address[1]
        base = f"http://127.0.0.1:{port}"
        html = urllib.request.urlopen(f"{base}/", timeout=5).read().decode()
        d = _payload(html)
        np.testing.assert_array_equal(_f32(d["pos"]).reshape(-1, 3), pts)
        assert "function poll" in html  # live-reload JS present
        assert d["gen"] > 0
        gen = int(urllib.request.urlopen(f"{base}/gen", timeout=5).read())
        assert gen == d["gen"]
        try:
            urllib.request.urlopen(f"{base}/nope", timeout=5)
            assert False, "404 expected"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        socketserver.TCPServer = real_tcp
        if "srv" in captured:
            captured["srv"].shutdown()


def test_serve_handler_http_roundtrip(tmp_path):
    """`rgbdslam serve`: the live handler serves the viewer page, the /gen
    generation counter, 404s elsewhere, and shows the waiting page while
    results are absent."""
    import socketserver
    import threading
    import urllib.request

    from rgbdslam_v2_tpu.apps.cli import make_viewer_handler
    from rgbdslam_v2_tpu.io.pointcloud import write_pcd

    with socketserver.TCPServer(("127.0.0.1", 0),
                                make_viewer_handler(tmp_path)) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}"
            # no cloud.pcd yet: waiting page with auto-reload
            body = urllib.request.urlopen(f"{url}/", timeout=10).read()
            assert b"waiting for results" in body
            # write a result; page becomes the live viewer
            pts = np.array([[0, 0, 1], [0.1, 0, 1.2], [0, 0.1, 0.9]],
                           np.float32)
            write_pcd(tmp_path / "cloud.pcd", pts,
                      np.full((3, 3), 200, np.uint8))
            body = urllib.request.urlopen(f"{url}/viewer.html",
                                          timeout=10).read()
            assert b"webgl" in body and b"DATA" in body
            assert b"poll()" in body  # live-reload script present
            gen = urllib.request.urlopen(f"{url}/gen", timeout=10).read()
            assert int(gen) > 0
            try:
                urllib.request.urlopen(f"{url}/nope", timeout=10)
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            httpd.shutdown()


def test_live_run_serve_controls(tmp_path):
    """`rgbdslam run --serve` machinery: the pipeline's live refresh writes
    atomic estimate/graph outputs mid-run, the served page gains control
    buttons, and /ctl endpoints drive pause/step/save through host flags."""
    import json as _json
    import socketserver
    import threading
    import urllib.request

    from rgbdslam_v2_tpu.apps.cli import make_viewer_handler
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=65.0, fy=65.0, cx=40.0, cy=30.0, width=80, height=60)
    world = SyntheticWorld.create(seed=0, texture_size=128, cam=cam)
    poses, rgbs, depths = render_sequence(world, 6, seed=1)
    params = ParameterServer(dict(
        max_keypoints=64, tpu_max_nodes=16, tpu_max_edges=64,
        tpu_candidate_batch=2, ransac_iterations=32, min_matches=8,
        keep_all_nodes=True,
    ))
    pipe = SlamPipeline(cam, params)
    pipe.live_dir = tmp_path
    pipe.live_interval = 2  # refresh every other frame
    with socketserver.TCPServer(
        ("127.0.0.1", 0), make_viewer_handler(tmp_path, pipe=pipe)
    ) as httpd:
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{port}"

            def post(action):
                req = urllib.request.Request(f"{url}/ctl/{action}",
                                             method="POST")
                return _json.loads(
                    urllib.request.urlopen(req, timeout=10).read())

            # pause via HTTP; frames are then dropped by process_frame
            assert post("pause")["status"] == "paused"
            assert pipe.paused
            assert not pipe.process_frame(rgbs[0], depths[0], 0.0)
            # step exactly one frame while paused
            post("step")
            assert pipe.process_frame(rgbs[0], depths[0], 0.0,
                                      gt_pose=poses[0])
            assert not pipe.process_frame(rgbs[1], depths[1], 1 / 30)
            assert post("pause")["status"] == "running"
            # queue a cloud save, then run frames: live outputs appear
            post("save")
            for i in range(1, 6):
                pipe.process_frame(rgbs[i], depths[i], i / 30.0)
            assert (tmp_path / "estimate.txt").exists()
            assert (tmp_path / "graph.g2o").exists()
            assert (tmp_path / "cloud.pcd").exists()  # the queued save
            assert not pipe._live_save_requested
            # 2D panes: current frame + keypoints AND the depth image
            # (the GUI's visual/depth image labels) served as PNGs
            assert (tmp_path / "frame.png").exists()
            assert (tmp_path / "depth.png").exists()
            for name in ("frame.png", "depth.png"):
                png = urllib.request.urlopen(f"{url}/{name}?g=1",
                                             timeout=10).read()
                assert png[:8] == b"\x89PNG\r\n\x1a\n", name
            # the served page now carries data + control buttons + panes
            body = urllib.request.urlopen(f"{url}/", timeout=10).read()
            assert b"bPause" in body and b"ctl(" in body
            assert b"DATA" in body and b"frame.png" in body
            assert b"depth.png" in body and b"bParam" in body
        finally:
            httpd.shutdown()


def test_live_param_endpoint_changes_acceptance(tmp_path):
    """/ctl/param (the GUI's setParam + reload_config service,
    qt_gui.cpp:406-478, ros_service_ui.cpp:67): raising
    observability_threshold mid-run flips subsequent frames from accepted
    visual edges to EMM-rejected const-position fallbacks, live."""
    import json as _json
    import socketserver
    import threading
    import urllib.request

    from rgbdslam_v2_tpu.apps.cli import make_viewer_handler
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.graph.manager import EDGE_CONST_POSITION
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=65.0, fy=65.0, cx=40.0, cy=30.0, width=80, height=60)
    world = SyntheticWorld.create(seed=0, texture_size=128, cam=cam)
    poses, rgbs, depths = render_sequence(world, 6, seed=1)
    params = ParameterServer(dict(
        max_keypoints=64, tpu_max_nodes=16, tpu_max_edges=64,
        tpu_candidate_batch=2, ransac_iterations=32, min_matches=8,
        keep_all_nodes=True, observability_threshold=0.5,
    ))
    pipe = SlamPipeline(cam, params)
    with socketserver.TCPServer(
        ("127.0.0.1", 0), make_viewer_handler(tmp_path, pipe=pipe)
    ) as httpd:
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{port}"
            for i in range(3):
                pipe.process_frame(rgbs[i], depths[i], i / 30.0,
                                   gt_pose=poses[0] if i == 0 else None)
            assert pipe.manager.n_nodes == 3
            pipe.manager._drain_pending()  # decisions are drained lazily
            assert any(d.accepted for d in pipe.manager.last_decisions)
            # unknown params are rejected
            req = urllib.request.Request(
                f"{url}/ctl/param?name=bogus&value=1", method="POST")
            try:
                urllib.request.urlopen(req, timeout=10)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
            # raise the EMM bar to an unsatisfiable level (quality <= 1.0
            # always, and noise-free synthetic frames reach exactly 1.0)
            req = urllib.request.Request(
                f"{url}/ctl/param?name=observability_threshold&value=1.0",
                method="POST")
            out = _json.loads(urllib.request.urlopen(req, timeout=10).read())
            assert out["status"] == "observability_threshold=1.0"
            assert pipe.params["observability_threshold"] == 1.0
            pipe.process_frame(rgbs[3], depths[3], 3 / 30.0)
            pipe.manager._drain_pending()
            assert not any(d.accepted for d in pipe.manager.last_decisions)
            # keep_all_nodes: the rejected frame enters via the fallback edge
            last = pipe.manager.n_nodes - 1
            types = [
                t for t, pair, act in zip(pipe.manager.edge_types,
                                          pipe.manager.edge_pairs,
                                          pipe.manager.edge_active_host)
                if pair is not None and pair[1] == last and act
            ]
            assert types == [EDGE_CONST_POSITION]
        finally:
            httpd.shutdown()


def test_viewer_octomap_voxel_layer():
    """The octomap layer: voxel centers/colors embed as a separate buffer
    with the leaf size, the toggle row exists, and omitting voxels keeps
    the buffer empty (hidden row)."""
    pts = np.array([[0, 0, 1]], np.float32)
    vox = np.array([[0.1, 0.2, 0.9], [0.15, 0.2, 0.9]], np.float32)
    vcol = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    html = build_viewer_html(pts, voxels=vox, voxel_colors=vcol,
                             voxel_size=0.05)
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    got = np.frombuffer(base64.b64decode(data["vpos"]),
                        np.float32).reshape(-1, 3)
    np.testing.assert_allclose(got, vox)
    gcol = np.frombuffer(base64.b64decode(data["vcol"]),
                         np.uint8).reshape(-1, 3)
    np.testing.assert_array_equal(gcol, vcol)
    assert data["voxel_size"] == 0.05
    assert "tVox" in html and "voxRow" in html
    # no voxels -> empty buffer
    html2 = build_viewer_html(pts)
    m2 = re.search(r"const DATA = (\{.*?\});\n", html2, re.S)
    assert base64.b64decode(json.loads(m2.group(1))["vpos"]) == b""


def test_view_cli_html_includes_octomap(tmp_path):
    """`rgbdslam view --html` on a result dir with map.ot embeds the
    occupied voxels."""
    from contextlib import redirect_stdout
    import io as _io

    from rgbdslam_v2_tpu.apps.cli import main
    from rgbdslam_v2_tpu.io.pointcloud import write_pcd
    from rgbdslam_v2_tpu.mapping.octree_io import write_color_octree

    pts = np.array([[0, 0, 1], [0.1, 0, 1.1]], np.float32)
    write_pcd(tmp_path / "cloud.pcd", pts, np.full((2, 3), 180, np.uint8))
    centers = np.array([[0.025, 0.025, 1.025]], np.float64)
    write_color_octree(tmp_path / "map.ot", centers, np.array([0.9]),
                       np.array([[10, 200, 30]], np.uint8), 0.05)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = main(["view", str(tmp_path), "--html", "--views", "0"])
    assert rc == 0
    html = (tmp_path / "viewer.html").read_text()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    got = np.frombuffer(base64.b64decode(data["vpos"]),
                        np.float32).reshape(-1, 3)
    assert len(got) == 1
    np.testing.assert_allclose(got[0], centers[0], atol=0.05)
