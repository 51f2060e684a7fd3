"""rgbdslam CLI: the framework's service-command surface.

Capability parity: the reference's headless ROS service UI + batch driver
(reference: src/ros_service_ui.cpp:55-122 — reset/optimize/save_* commands;
offline batch evaluation openni_listener.cpp:431) becomes subcommands:

  run        process a TUM directory (or synthetic sequence), save outputs
  evaluate   run + the 5-level optimization/pruning evaluation protocol
  synthetic  generate a synthetic RGB-D dataset with ground truth
  ate        evaluate a trajectory file against ground truth
  params     list all parameters with defaults and docs

Parameters are passed as repeated `-p name=value` (same names as the
reference's launch-file options where applicable).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _build_params(pairs):
    from ..config import ParameterServer

    return ParameterServer.from_cli(pairs or [])


def _cam_from_args(args, params):
    from ..core.camera import TUM_DEFAULT, TUM_FR1, TUM_FR2, Intrinsics

    named = {"fr1": TUM_FR1, "fr2": TUM_FR2, "default": TUM_DEFAULT}
    if args.camera in named:
        cam = named[args.camera]
        # honor the static frame-shape params (tpu_image_*): scale the named
        # intrinsics when a non-default resolution is configured
        tw, th = params["tpu_image_width"], params["tpu_image_height"]
        if (tw, th) != (cam.width, cam.height):
            sx, sy = tw / cam.width, th / cam.height
            cam = Intrinsics(
                fx=cam.fx * sx, fy=cam.fy * sy,
                cx=cam.cx * sx, cy=cam.cy * sy, width=tw, height=th,
            )
        return cam
    fx, fy, cx, cy, w, h = (float(x) for x in args.camera.split(","))
    return Intrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=int(w), height=int(h))


def cmd_run(args):
    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    from ..io.tum import TumDataset
    from ..pipeline import SlamPipeline

    params = _build_params(args.param)
    cam = _cam_from_args(args, params)
    pipe = SlamPipeline(cam, params)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    pipe.online_octomap_path = str(out / "map_online.ot")
    httpd = None
    if getattr(args, "serve", None) is not None:
        # live interactive view + run controls while SLAM is in progress
        # (the reference's always-open GL window + GUI actions)
        import socketserver
        import threading

        pipe.live_dir = out
        pipe.live_interval = args.serve_interval
        httpd = socketserver.TCPServer(
            (args.host, args.serve), make_viewer_handler(out, pipe=pipe))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        print(json.dumps({"serving": str(out),
                          "url": f"http://{args.host}:{args.serve}/"}),
              file=sys.stderr, flush=True)
    gt_stamps = gt_xyz = None
    bagfile = args.bagfile or params["bagfile_name"]
    if args.tum_dir:
        ds = TumDataset.open(args.tum_dir)
        pipe.run_tum(ds, max_frames=args.max_frames)
        if ds.groundtruth is not None:
            gt_stamps = ds.groundtruth[:, 0].tolist()
            gt_xyz = ds.groundtruth[:, 1:4]
    elif getattr(args, "pcd_dir", None):
        # point-cloud file input (reference loadPCDFiles,
        # openni_listener.cpp:1063)
        from ..io.cloud_input import CloudDataset

        pipe.run_clouds(CloudDataset.open(args.pcd_dir, cam),
                        max_frames=args.max_frames)
    elif getattr(args, "stereo_dir", None):
        # stereo input (reference stereoCallback,
        # openni_listener.cpp:559-598; disparity front-end on device)
        from ..io.stereo_input import StereoDataset

        sds = StereoDataset.open(args.stereo_dir)
        pipe.run_stereo(sds, max_frames=args.max_frames)
        gt_file = Path(args.stereo_dir) / "groundtruth.txt"
        if gt_file.exists():
            from ..io.tum import read_trajectory_file

            gt = read_trajectory_file(gt_file)
            gt_stamps = gt[:, 0].tolist()
            gt_xyz = gt[:, 1:4]
    elif bagfile and params["topic_points"]:
        # cloud-topic input (reference pcdCallback via topic_points)
        from ..io.rosbag import read_cloud_frames

        pipe.run_clouds(read_cloud_frames(bagfile, params["topic_points"]),
                        max_frames=args.max_frames)
    elif bagfile:
        pipe.run_bag(bagfile, max_frames=args.max_frames)
        # Ground truth from /tf only when a child frame is named (real bags
        # carry calibration transforms on /tf too; reference
        # ground_truth_frame_name semantics, parameter_server.cpp:75).
        gt_frame = params["ground_truth_frame_name"]
        if gt_frame:
            from ..io.rosbag import read_tf_trajectory

            tf_stamps, tf_rows = read_tf_trajectory(
                bagfile, child_frame=gt_frame
            )
            if len(tf_stamps):
                gt_stamps, gt_xyz = tf_stamps.tolist(), tf_rows[:, :3]
    else:
        print("error: one of --tum-dir, --pcd-dir, --stereo-dir or "
              "--bagfile is required", file=sys.stderr)
        return 2
    if args.evaluate or params["batch_processing"]:
        report = pipe.evaluation_protocol(out, gt_stamps=gt_stamps, gt_xyz=gt_xyz)
        print(json.dumps(report.as_dict(), indent=2))
    else:
        pipe.manager.optimize()
        from ..io.tum import write_trajectory

        stamps, poses = pipe.manager.trajectory()
        write_trajectory(out / "estimate.txt", stamps, poses)
        print(json.dumps(pipe.manager.statistics(), indent=2))
    if args.landmark_ba:
        stats = pipe.manager.optimize_landmarks()
        print(f"landmark BA: {json.dumps(stats)}")
        from ..io.tum import write_trajectory

        stamps, poses = pipe.manager.trajectory()
        write_trajectory(out / "estimate_landmark_ba.txt", stamps, poses)
    if args.save_clouds:
        n = pipe.save_clouds(out / "cloud.pcd")
        print(f"saved cloud.pcd ({n} points)")
    if args.save_octomap:
        pipe.save_octomap(out / "map.ot")
        print("saved map.ot")
    if args.save_mesh:
        n = pipe.save_mesh(out / "mesh.ply")
        print(f"saved mesh.ply ({n} triangles)")
    if args.save_g2o:
        pipe.save_g2o(out / "graph.g2o")
        print("saved graph.g2o")
    if args.save_features:
        pipe.save_features(out / "features.npz")
        print("saved features.npz")
    if args.save_individual:
        files = pipe.save_individual_clouds(out / "clouds")
        print(f"saved {len(files)} per-node clouds")
    if args.save_bag:
        pipe.save_bagfile(out / "result.bag")
        print("saved result.bag")
    if httpd is not None:
        pipe._live_refresh(force=True)  # final state for the live page
        # the page polls every 2 s: keep serving long enough for the last
        # poll + reload to pick up the final generation before shutdown
        import time as _time

        _time.sleep(3.0)
        httpd.shutdown()
    return 0


def cmd_synthetic(args):
    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    from ..core.camera import TUM_DEFAULT, Intrinsics
    from ..io.synthetic import SyntheticWorld, render_sequence, save_as_tum_dataset

    if args.small:
        cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
    else:
        cam = TUM_DEFAULT
    world = SyntheticWorld.create(seed=args.seed, cam=cam)
    poses, rgbs, depths = render_sequence(
        world, args.frames, seed=args.seed + 1, depth_noise_sigma=args.depth_noise
    )
    save_as_tum_dataset(args.out, poses, rgbs, depths)
    if args.stereo > 0:
        from ..io.stereo_input import (
            render_stereo_sequence,
            save_as_stereo_dataset,
        )

        sposes, lefts, rights, _ = render_stereo_sequence(
            world, args.frames, args.stereo, seed=args.seed + 1
        )
        save_as_stereo_dataset(args.out, sposes, lefts, rights)
        print(f"wrote stereo pairs (baseline {args.stereo} m) to {args.out}")
    print(f"wrote {args.frames} frames to {args.out}")
    return 0


def cmd_vo_multi(args):
    """Multi-sequence evaluation, one sequence shard per device: the
    multi-chip scaling axis this domain actually has (SURVEY §2.3) — S
    sequences of visual odometry run in ONE sharded program over a
    jax.sharding.Mesh (parallel/multi_eval.py), per-sequence ATE out."""
    import jax

    if args.devices.startswith("cpu"):
        n_req = int(args.devices.split(":")[1]) if ":" in args.devices else 8
        # the env's sitecustomize may have initialized jax before this code
        # runs, so XLA_FLAGS would be ignored — the config knob is the
        # reliable way to size the virtual CPU platform, and we verify below
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_req)
        got = len(jax.devices("cpu"))
        if got < n_req:
            print(
                f"rgbdslam: error: requested cpu:{n_req} but only {got} CPU "
                "device(s) materialized (platform initialized too early?)",
                file=sys.stderr,
            )
            return 2

    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from ..eval import evaluate_ate
    from ..io.tum import TumDataset
    from ..models.orb import OrbExtractor
    from ..parallel import candidate_mesh
    from ..parallel.multi_eval import vo_trajectories_sharded

    params = _build_params(args.param)
    cam = _cam_from_args(args, params)
    datasets = [TumDataset.open(d) for d in args.tum_dirs]
    T = min(len(ds) for ds in datasets)
    if args.max_frames:
        T = min(T, args.max_frames)

    grays, depths, all_stamps = [], [], []
    for ds in datasets:
        g, d, st = [], [], []
        for i in range(T):
            ts, rgb, depth = ds.load(i)
            rgbf = np.asarray(rgb, np.float32)
            g.append((rgbf @ np.array([0.299, 0.587, 0.114], np.float32))
                     / 255.0)
            d.append(np.asarray(depth, np.float32))
            st.append(ts)
        grays.append(np.stack(g))
        depths.append(np.stack(d))
        all_stamps.append(st)

    platform = "cpu" if args.devices.startswith("cpu") else None
    n_dev = len(jax.devices(platform) if platform else jax.devices())
    mesh = candidate_mesh(n_dev, platform=platform)
    # pad the sequence axis to a multiple of the mesh size
    S = len(datasets)
    pad = (-S) % n_dev
    garr = np.stack(grays + [grays[-1]] * pad)
    darr = np.stack(depths + [depths[-1]] * pad)

    extractor = OrbExtractor(max_keypoints=params["max_keypoints"])
    res = vo_trajectories_sharded(
        mesh, jnp.asarray(garr), jnp.asarray(darr), jax.random.PRNGKey(0),
        extractor, cam,
        n_hypotheses=params["ransac_iterations"],
        min_inliers=params["min_matches"],
        sigma_depth=params["sigma_depth"],
    )
    poses = np.asarray(res.poses)[:S]
    report = {"devices": n_dev, "sequences": {}}
    for s, ds in enumerate(datasets):
        entry = {
            "frames": T,
            "ransac_success_rate": float(np.asarray(res.ok)[s].mean()),
        }
        if ds.groundtruth is not None:
            try:
                r = evaluate_ate(
                    all_stamps[s], poses[s][:, :3, 3],
                    ds.groundtruth[:, 0].tolist(), ds.groundtruth[:, 1:4],
                )
                entry["ate_rmse"] = r.rmse
            except ValueError:
                pass
        report["sequences"][str(ds.root)] = entry
    print(json.dumps(report, indent=2))
    return 0


def cmd_slam_multi(args):
    """Multi-sequence FULL SLAM, batched over sequences and sharded one
    shard per device (parallel/slam_multi.py): the complete system —
    device step, pose graph, 5-level protocol — per sequence, the batched
    analog of the reference's per-bagfile runs (test/run_tests.sh:21-76).
    Unlike vo-multi (frontend-only odometry chains), loop closures and
    graph optimization are live in every sequence."""
    import jax

    if args.devices.startswith("cpu"):
        n_req = int(args.devices.split(":")[1]) if ":" in args.devices else 8
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_req)
        got = len(jax.devices("cpu"))
        if got < n_req:
            print(
                f"rgbdslam: error: requested cpu:{n_req} but only {got} CPU "
                "device(s) materialized", file=sys.stderr,
            )
            return 2

    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    from ..io.tum import TumDataset, write_trajectory
    from ..parallel import candidate_mesh
    from ..parallel.slam_multi import MultiSequenceSlam

    params = _build_params(args.param)
    cam = _cam_from_args(args, params)
    datasets = [TumDataset.open(d) for d in args.tum_dirs]
    T = min(len(ds) for ds in datasets)
    if args.max_frames:
        T = min(T, args.max_frames)

    platform = "cpu" if args.devices.startswith("cpu") else None
    n_dev = len(jax.devices(platform) if platform else jax.devices())
    S = len(datasets)
    pad = (-S) % n_dev
    mesh = candidate_mesh(n_dev, platform=platform) if n_dev > 1 else None

    ms = MultiSequenceSlam(cam, S + pad, params=params, mesh=mesh)
    stamps = [[] for _ in range(S)]
    for k in range(T):
        cpts, ts = [], []
        for s, ds in enumerate(datasets):
            t, rgb, depth = ds.load(k)
            stamps[s].append(t)
            cpts.append(ms.compact(rgb, depth))
            ts.append(t)
        cpts += [cpts[-1]] * pad  # pad shards replay the last sequence
        ts += [ts[-1]] * pad
        ms.add_frames(np.stack(cpts), np.asarray(ts))
        if (k + 1) % params["optimizer_skip_step"] == 0:
            ms.optimize(
                iterations=params["online_optimizer_iterations"],
                blocking=False,
            )

    gt_stamps = gt_xyz = None
    if all(ds.groundtruth is not None for ds in datasets):
        gt_stamps = [ds.groundtruth[:, 0].tolist() for ds in datasets]
        gt_xyz = [ds.groundtruth[:, 1:4] for ds in datasets]
        gt_stamps += [gt_stamps[-1]] * pad
        gt_xyz += [gt_xyz[-1]] * pad
    levels, ate = ms.evaluation_protocol(gt_stamps=gt_stamps, gt_xyz=gt_xyz)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    report = {"devices": n_dev, "frames": T, "sequences": {}}
    for s, ds in enumerate(datasets):
        name = f"seq{s}_" + (Path(str(ds.root)).name or "")
        for level, poses in levels.items():
            write_trajectory(
                out / f"{name}_estimate_iteration_{level}.txt",
                stamps[s], poses[s],
            )
        entry = dict(ms.statistics()[s])
        if ate:
            entry["ate_rmse"] = {
                str(lv): float(ate[lv][s]) for lv in sorted(ate)
            }
        report["sequences"][name] = entry
    (out / "slam_multi_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return 0


def _load_result_dir(root: Path, require_cloud: bool = True):
    """Load a result dir's cloud + trajectory + graph edges for viewing.

    Returns (points, colors, traj(T,4,4)|None, edges|None); raises
    FileNotFoundError when cloud.pcd is absent (require_cloud=False
    tolerates a missing cloud — the live view starts from trajectory +
    edges alone — but raises when NOTHING viewable exists yet)."""
    import numpy as np

    from ..io.pointcloud import read_pcd
    from ..io.tum import read_trajectory_file

    cloud = root / "cloud.pcd"
    if cloud.exists():
        points, colors = read_pcd(cloud)
    elif require_cloud:
        raise FileNotFoundError(f"{cloud} not found (run with --save-clouds)")
    else:
        points = np.zeros((0, 3), np.float32)
        colors = np.zeros((0, 3), np.uint8)
    traj = edges = None
    # Prefer the FRESHEST estimate file (mtime): a live run rewrites
    # estimate.txt while a previous run's estimate_iteration_4.txt may
    # still sit in a reused out dir; for a finished protocol run the
    # level-4 file is the newest anyway.
    cands = [root / n for n in ("estimate_iteration_4.txt", "estimate.txt")]
    cands = sorted((p for p in cands if p.exists()),
                   key=lambda p: p.stat().st_mtime_ns, reverse=True)
    if cands:
        # numpy quaternion->rotation: keeps `view` off the accelerator
        from ..io.tum import rows_to_poses

        traj = rows_to_poses(read_trajectory_file(cands[0]))
    if (root / "graph.g2o").exists():
        from ..graph.g2o_io import read_g2o

        _poses, _fixed, g2o_edges = read_g2o(root / "graph.g2o")
        edges = [(int(i), int(j)) for (i, j, _m, _inf) in g2o_edges]
    if not require_cloud and len(points) == 0 and traj is None:
        raise FileNotFoundError(
            f"nothing viewable in {root} yet (no cloud.pcd / estimate*.txt)")
    return points, colors, traj, edges


def cmd_view(args):
    """Offline 3D views of a saved result (the GL-viewer capability,
    reference src/glviewer.cpp, rendered headless — io/render3d.py), plus
    the interactive WebGL export (io/viewer_html.py) with --html."""
    from ..io.render3d import render_orbit_views

    root = Path(args.result_dir)
    try:
        points, colors, traj, edges = _load_result_dir(root)
    except FileNotFoundError as exc:
        print(f"rgbdslam: error: {exc}", file=sys.stderr)
        return 2
    out_json = {}
    if args.html is not None:
        from ..io.viewer_html import write_viewer_html

        vox = vox_cols = None
        vox_res = 0.05
        if (root / "map.ot").exists():
            # octomap layer (the GL viewer's renderable-octomap surface)
            from ..mapping.octree_io import read_color_octree

            vox, probs, vox_cols, vox_res = read_color_octree(
                root / "map.ot")
            occ = probs > 0.5
            vox, vox_cols = vox[occ], vox_cols[occ]
        mesh = None
        if (root / "mesh.ply").exists():
            # triangle-mesh layer (run --save-mesh output; glviewer.cpp:776)
            from ..io.meshing import read_ply_mesh

            mesh = read_ply_mesh(root / "mesh.ply")
        sigmas = None
        if traj is not None and len(traj) and len(points):
            # sigma ellipsoid mode (glviewer.cpp:922): splat size from the
            # quadratic depth-noise model at each point's distance to the
            # nearest camera pose (sigma_depth * z^2, core/noise.py)
            import numpy as _np

            centers = _np.asarray(traj)[:: max(1, len(traj) // 64), :3, 3]
            z = _np.full(len(points), _np.inf, _np.float32)
            for i in range(0, len(points), 65536):
                d = _np.linalg.norm(
                    points[i:i + 65536, None, :] - centers[None], axis=-1)
                z[i:i + 65536] = d.min(1)
            sigmas = (0.01 * z * z).astype(_np.float32)
        html_path = args.html or str(root / "viewer.html")
        out_json["html"] = write_viewer_html(
            html_path, points, colors, traj=traj, edges=edges,
            title=root.name or "rgbdslam map",
            voxels=vox, voxel_colors=vox_cols, voxel_size=vox_res,
            mesh=mesh, sigmas=sigmas)
    if args.views > 0:
        w, h = (int(x) for x in args.size.split("x"))
        out = Path(args.out) if args.out else root / "views"
        out_json["views"] = render_orbit_views(
            points, colors, out, traj=traj, edges=edges,
            n_views=args.views, size=(w, h))
    print(json.dumps(out_json))
    return 0


def make_viewer_handler(root: Path, pipe=None):
    """Build the live-viewer HTTP handler class for `rgbdslam serve` /
    `rgbdslam run --serve` (factored out so tests can mount it on an
    ephemeral TCPServer).

    With a SlamPipeline attached, POST /ctl/{pause,step,save} maps onto
    the GUI action surface (the reference's pause / getOneFrame / save
    signals, openni_listener.cpp:119-120, qt_gui slots): the handler only
    flips host-side flags; all device work stays on the run-loop thread."""
    import http.server

    def generation() -> int:
        # nanosecond mtimes: two refreshes inside the same wall-clock
        # second (e.g. the final forced refresh) must still bump the
        # generation so the browser's poll sees the change
        gen = 0
        for name in ("cloud.pcd", "estimate.txt", "estimate_iteration_4.txt",
                     "graph.g2o", "frame.png"):
            p = root / name
            if p.exists():
                gen = max(gen, p.stat().st_mtime_ns)
        return gen

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body: bytes, ctype: str, code: int = 200):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/viewer.html"):
                from ..io.viewer_html import build_viewer_html

                try:
                    points, colors, traj, edges = _load_result_dir(
                        root, require_cloud=False)
                except Exception as exc:  # nothing yet / partial write
                    body = (f"<html><body><h3>waiting for results…</h3>"
                            f"<p>{exc}</p><script>setTimeout("
                            "()=>location.reload(),2000)</script>"
                            "</body></html>").encode()
                    self._send(body, "text/html; charset=utf-8")
                    return
                body = build_viewer_html(
                    points, colors, traj=traj, edges=edges,
                    title=root.name or "rgbdslam map", live=True,
                    controls=pipe is not None,
                    generation=generation()).encode()
                self._send(body, "text/html; charset=utf-8")
            elif self.path.endswith("/gen"):
                self._send(str(generation()).encode(), "text/plain")
            elif self.path.split("?")[0].endswith(("/frame.png",
                                                   "/depth.png")):
                p = root / self.path.split("?")[0].rsplit("/", 1)[1]
                if p.exists():
                    self._send(p.read_bytes(), "image/png")
                else:
                    self.send_error(404)
            else:
                self.send_error(404)

        def do_POST(self):
            if pipe is None or not self.path.startswith("/ctl/"):
                self.send_error(409 if pipe is None else 404)
                return
            action = self.path[len("/ctl/"):].split("?")[0].rstrip("/")
            if action == "pause":
                paused = pipe.toggle_pause()
                msg = "paused" if paused else "running"
            elif action == "step":
                pipe.get_one_frame()
                msg = "stepping one frame"
            elif action == "save":
                pipe.request_live_save()
                msg = "cloud save queued"
            elif action == "param":
                # live parameter editing (the reference GUI's setParam
                # dialog + reload_config service, qt_gui.cpp:406-478,
                # ros_service_ui.cpp:67): /ctl/param?name=k&value=v
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                name = (q.get("name") or [""])[0]
                if not name or "value" not in q:
                    self.send_error(400, "need name= and value=")
                    return
                try:
                    val = pipe.set_param(name, q["value"][0])
                except KeyError:
                    self.send_error(400, f"unknown parameter {name}")
                    return
                msg = f"{name}={val}"
            else:
                self.send_error(404)
                return
            self._send(json.dumps({"status": msg}).encode(),
                       "application/json")

    return Handler


def cmd_serve(args):
    """Serve the interactive viewer over HTTP with live reload — the
    closest headless equivalent of the reference's always-open GL window
    during a run (glviewer.cpp): a SLAM process periodically saving
    results makes the browser refresh within ~2 s."""
    import socketserver

    root = Path(args.result_dir)
    with socketserver.TCPServer((args.host, args.port),
                                make_viewer_handler(root)) as httpd:
        print(json.dumps({"serving": str(root),
                          "url": f"http://{args.host}:{args.port}/"}),
              flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
    return 0


def cmd_ate(args):
    from ..eval import evaluate_ate
    from ..io.tum import read_trajectory_file

    est = read_trajectory_file(args.estimate)
    gt = read_trajectory_file(args.groundtruth)
    res = evaluate_ate(est[:, 0], est[:, 1:4], gt[:, 0], gt[:, 1:4],
                       max_difference=args.max_difference)
    print(json.dumps(res.as_dict(), indent=2))
    return 0


def cmd_rpe(args):
    """Relative pose error — the TUM benchmark's second metric
    (rgbd_benchmark evaluate_rpe): drift over a fixed frame delta, both
    translational [m] and rotational [rad] statistics."""
    from ..eval import evaluate_rpe
    from ..io.tum import associate, read_trajectory_file, rows_to_poses

    est = read_trajectory_file(args.estimate)
    gt = read_trajectory_file(args.groundtruth)
    pairs = associate(est[:, 0].tolist(), gt[:, 0].tolist(),
                      max_difference=args.max_difference)
    if len(pairs) <= args.delta:
        print("rgbdslam: error: not enough associated pose pairs",
              file=sys.stderr)
        return 2
    pairs.sort()  # chronological (associate returns best-match-first)
    ei = [i for i, _ in pairs]
    gi = [j for _, j in pairs]
    t_err, r_err = evaluate_rpe(rows_to_poses(est[ei]),
                                rows_to_poses(gt[gi]), delta=args.delta)
    print(json.dumps({"translational_m": t_err.as_dict(),
                      "rotational_rad": r_err.as_dict(),
                      "delta": args.delta, "n_pairs": len(pairs)}, indent=2))
    return 0


def cmd_params(args):
    from ..config.params import PARAM_DEFS

    for d in PARAM_DEFS:
        print(f"{d.name:36s} {d.default!r:14} {d.doc}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rgbdslam", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run SLAM on a TUM directory or ROS bag")
    runp.add_argument("--tum-dir", default=None)
    runp.add_argument("--pcd-dir", default=None,
                      help="directory of .pcd/.ply clouds as frame input "
                      "(reference loadPCDFiles)")
    runp.add_argument("--stereo-dir", default=None,
                      help="directory with left/ right/ rectified image "
                      "pairs; on-device block-matching depth (reference "
                      "stereoCallback; -p stereo_baseline=... meters)")
    runp.add_argument("--bagfile", default=None,
                      help="ROS bag playback input (topics via -p "
                           "topic_image_mono/topic_image_depth)")
    runp.add_argument("--out", required=True)
    runp.add_argument("--save-bag", action="store_true",
                      help="record the optimized /tf trajectory into a bag")
    runp.add_argument("--camera", default="default",
                      help="fr1|fr2|default or fx,fy,cx,cy,w,h")
    runp.add_argument("--max-frames", type=int, default=None)
    runp.add_argument("-p", "--param", action="append", metavar="K=V")
    runp.add_argument("--evaluate", action="store_true",
                      help="run the 5-level evaluation protocol")
    runp.add_argument("--save-clouds", action="store_true")
    runp.add_argument("--save-octomap", action="store_true")
    runp.add_argument("--save-mesh", action="store_true",
                      help="triangle-mesh the node grids (depth-jump test, "
                           "glviewer.cpp:776) into mesh.ply")
    runp.add_argument("--save-g2o", action="store_true")
    runp.add_argument("--save-features", action="store_true")
    runp.add_argument("--save-individual", action="store_true",
                      help="one cloud file per node (saveIndividualClouds)")
    runp.add_argument("--landmark-ba", action="store_true",
                      help="refine with landmark bundle adjustment "
                           "(DO_FEATURE_OPTIMIZATION capability)")
    runp.add_argument("--serve", type=int, default=None, metavar="PORT",
                      help="serve the live WebGL viewer + run controls "
                           "(pause/step/save) on PORT while running")
    runp.add_argument("--serve-interval", type=int, default=30,
                      metavar="FRAMES",
                      help="frames between live-view output refreshes")
    runp.add_argument("--host", default="127.0.0.1",
                      help="bind address for --serve (default localhost; "
                           "the control endpoints are unauthenticated)")
    runp.set_defaults(fn=cmd_run)

    synp = sub.add_parser("synthetic", help="generate a synthetic TUM dataset")
    synp.add_argument("--out", required=True)
    synp.add_argument("--frames", type=int, default=60)
    synp.add_argument("--seed", type=int, default=0)
    synp.add_argument("--depth-noise", type=float, default=0.0)
    synp.add_argument("--small", action="store_true", help="160x120 frames")
    synp.add_argument("--stereo", type=float, default=0.0, metavar="BASELINE",
                      help="also write a rectified stereo pair dataset "
                      "(left/ right/ dirs) with this baseline in meters")
    synp.set_defaults(fn=cmd_synthetic)

    atep = sub.add_parser("ate", help="evaluate trajectory vs ground truth")
    atep.add_argument("estimate")
    atep.add_argument("groundtruth")
    atep.add_argument("--max-difference", type=float, default=0.02)
    atep.set_defaults(fn=cmd_ate)

    rpep = sub.add_parser(
        "rpe", help="relative pose error vs ground truth "
                    "(the benchmark's evaluate_rpe)")
    rpep.add_argument("estimate")
    rpep.add_argument("groundtruth")
    rpep.add_argument("--delta", type=int, default=1,
                      help="frame delta for relative motions")
    rpep.add_argument("--max-difference", type=float, default=0.02)
    rpep.set_defaults(fn=cmd_rpe)

    parp = sub.add_parser("params", help="list parameters")
    parp.set_defaults(fn=cmd_params)

    vmp = sub.add_parser(
        "vo-multi",
        help="sharded multi-sequence visual odometry (one sequence/device)",
    )
    vmp.add_argument("tum_dirs", nargs="+")
    vmp.add_argument("--devices", default="default",
                     help="'default' (current backend) or 'cpu:N' virtual mesh")
    vmp.add_argument("--camera", default="default")
    vmp.add_argument("--max-frames", type=int, default=None)
    vmp.add_argument("-p", "--param", action="append", metavar="K=V")
    vmp.set_defaults(fn=cmd_vo_multi)

    smp = sub.add_parser(
        "slam-multi",
        help="batched multi-sequence FULL SLAM (graph + loop closures + "
             "5-level protocol), sharded one shard per device",
    )
    smp.add_argument("tum_dirs", nargs="+")
    smp.add_argument("--out", default="slam_multi_out")
    smp.add_argument("--devices", default="auto",
                     help="'auto' (all devices) or 'cpu:N' virtual mesh")
    smp.add_argument("--camera", default="default")
    smp.add_argument("--max-frames", type=int, default=None)
    smp.add_argument("-p", "--param", action="append", metavar="K=V")
    smp.set_defaults(fn=cmd_slam_multi)

    viewp = sub.add_parser(
        "view", help="render a result dir (cloud + trajectory + edges) to PNGs"
    )
    viewp.add_argument("result_dir",
                       help="directory with cloud.pcd / estimate*.txt / graph.g2o")
    viewp.add_argument("--out", default=None,
                       help="output dir (default: <result_dir>/views)")
    viewp.add_argument("--views", type=int, default=6,
                       help="number of PNG orbit views (0: skip PNGs)")
    viewp.add_argument("--size", default="960x720")
    viewp.add_argument("--html", nargs="?", const="", default=None,
                       metavar="PATH",
                       help="also write the interactive WebGL viewer "
                            "(default: <result_dir>/viewer.html)")
    viewp.set_defaults(fn=cmd_view)

    servep = sub.add_parser(
        "serve",
        help="serve the interactive 3D viewer with live reload "
             "(the GL-window-during-a-run capability, in a browser)",
    )
    servep.add_argument("result_dir",
                        help="result dir to watch (cloud.pcd + estimate*.txt)")
    servep.add_argument("--port", type=int, default=8765)
    servep.add_argument("--host", default="127.0.0.1",
                        help="bind address (default localhost)")
    servep.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    try:
        return args.fn(args)
    except (FileNotFoundError, ValueError, KeyError) as exc:
        print(f"rgbdslam: error: {exc}", file=sys.stderr)
        return 2
    except RuntimeError as exc:
        print(f"rgbdslam: runtime error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
