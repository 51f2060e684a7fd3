"""SLAM pipeline: dataset -> frames -> graph -> trajectories/maps.

Capability parity: the reference's input pipeline and offline batch
evaluation driver (reference: src/openni_listener.cpp — frame skipping
:686-705, processing :743-860; the 5-level evaluation protocol
`evaluation()` :431-518) without ROS: a host loop feeding jitted device
kernels, with the same parameter semantics (data_skip_step,
skip_first_n_frames, batch_processing).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ParameterServer, default_params
from ..core.camera import Intrinsics
from ..core.frames import make_frame
from ..eval.ate import evaluate_ate
from ..graph.manager import GraphManager
from ..io.tum import TumDataset, write_trajectory


@dataclasses.dataclass
class EvaluationReport:
    """Per-level trajectory files + ATE (the reference's iteration_0..4)."""

    levels: Dict[int, str]
    ate_rmse: Dict[int, float]
    duration_s: float
    fps: float
    statistics: dict

    def as_dict(self):
        return dataclasses.asdict(self)


class SlamPipeline:
    def __init__(
        self,
        cam: Intrinsics,
        params: Optional[ParameterServer] = None,
    ):
        self.params = params or default_params()
        self.cam = cam
        self.manager = GraphManager(cam, self.params)
        self.n_processed = 0
        self.n_dropped = 0
        self.wall_time = 0.0
        # interactive run control (pause/step/one-frame); start_paused is the
        # reference's wait-for-user startup mode (parameter_server.cpp:154)
        self.paused = bool(self.params["start_paused"])
        self._step_once = False
        # online octomap creation (graph_manager.cpp:1044-1049)
        self._online_map = None
        self._online_inserts = 0
        self.online_octomap_path = "map_online.ot"
        # live viewing (`rgbdslam run --serve`): refresh trajectory + graph
        # outputs every live_interval processed frames so the served WebGL
        # page tracks the run (the reference GUI's always-updating render)
        self.live_dir = None
        self.live_interval = 30
        self._live_counter = 0
        self._live_save_requested = False
        # live 2D pane state: (raw frame, committed node id | None) — the
        # node id pins the keypoint overlay to the SAME frame (a dropped
        # frame or the second frame of a fused pair draws without markers
        # from some other node)
        self._last_rgb = None
        self._live_frame = None

    # ------------------------------------------------------------------
    # Interactive run control (the reference's pause / "space" / "enter"
    # step semantics: openni_listener.cpp:119-120, :262, :665-749).
    # ------------------------------------------------------------------
    def toggle_pause(self):
        self.paused = not self.paused
        return self.paused

    def get_one_frame(self):
        """Process exactly one frame while paused (getOneFrame signal)."""
        self._step_once = True

    def request_live_save(self):
        """Queue a cloud save at the next live refresh (the GUI's save
        action, executed on the run-loop thread — never on the HTTP
        handler thread, which must not touch device state)."""
        self._live_save_requested = True

    def set_param(self, name: str, value):
        """Set a parameter during a live run (the GUI's setParam dialog +
        reload_config service: qt_gui.cpp:406-478, ros_service_ui.cpp:67).

        The assignment is a single dict write (atomic under the GIL); the
        run loop re-reads parameters each frame, so host-side params
        (thresholds, skip steps, motion gates) take effect on the next
        frame. Params baked into the device program as static config
        (GraphManager._step_cfg) also apply, at the cost of a one-off
        recompile of the fast path — the same caveat the reference's GUI
        dialog carries for mid-run changes. Raises KeyError on unknown
        names. Returns the coerced value."""
        return self.params.set(name, value)

    def _live_refresh(self, force: bool = False, count: int = 1):
        """Refresh live-view outputs (estimate.txt + graph.g2o, plus
        cloud.pcd when requested) into live_dir. Writes are atomic
        (tmp + os.replace) so the serving thread never reads a torn file.
        count: frames represented by this call (2 for a fused pair)."""
        if self.live_dir is None:
            return
        before = self._live_counter
        self._live_counter += count
        iv = max(1, self.live_interval)
        if not force and before // iv == self._live_counter // iv:
            return
        import os

        from ..io.tum import write_trajectory

        out = Path(self.live_dir)
        out.mkdir(parents=True, exist_ok=True)
        if self.manager.n_nodes == 0:
            return
        stamps, poses = self.manager.trajectory()
        tmp = out / ".estimate.tmp"
        write_trajectory(tmp, stamps, poses)
        os.replace(tmp, out / "estimate.txt")
        tmp = out / ".graph.tmp"
        self.save_g2o(tmp)
        os.replace(tmp, out / "graph.g2o")
        if self._live_save_requested:
            self._live_save_requested = False
            tmp = out / ".cloud.tmp"
            self.save_clouds(tmp)
            os.replace(tmp, out / "cloud.pcd")
        if self._live_frame is not None:
            # 2D pane: current frame + ITS committed keypoints (the GUI's
            # visual/feature image panes, qt_gui.cpp image labels); a frame
            # with no committed node (dropped) draws without markers
            from ..io.render3d import write_png
            from ..io.visualization import draw_feature_flow

            rgb, depth, nid = self._live_frame
            if depth is not None:
                # depth pane (the GUI's depth image label; the reference
                # shows depthToCV8UC1 mono, misc.cpp:414): normalized gray,
                # invalid pixels black
                d = np.asarray(depth, np.float32)
                ok = np.isfinite(d) & (d > 0)
                lo = float(self.params["minimum_depth"])
                hi = float(self.params["maximum_depth"])
                g = np.clip((d - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
                img_d = np.where(ok, (g * 255.0), 0.0).astype(np.uint8)
                tmp = out / ".depth.tmp.png"
                write_png(tmp, np.repeat(img_d[..., None], 3, axis=-1))
                os.replace(tmp, out / "depth.png")
            rgb = np.asarray(rgb)
            if rgb.dtype.kind == "f":
                rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
            if rgb.ndim == 2:
                rgb = np.repeat(rgb[..., None], 3, axis=-1)
            if nid is not None:
                uv = np.asarray(self.manager.store.uv[nid])
                val = np.asarray(self.manager.store.kp_valid[nid])
                img = draw_feature_flow(rgb, uv, uv, val)
            else:
                img = rgb
            tmp = out / ".frame.tmp.png"  # .png so cv2.imwrite picks a codec
            write_png(tmp, img)
            os.replace(tmp, out / "frame.png")

    # ------------------------------------------------------------------
    def process_frame(self, rgb, depth, timestamp: float, gt_pose=None,
                      compact=None) -> bool:
        if self.paused and not self._step_once:
            return False
        self._step_once = False
        if self.live_dir is not None and rgb is not None:
            self._last_rgb = rgb
        t0 = time.perf_counter()
        took = self.manager.add_frame(rgb, depth, timestamp, gt_pose,
                                      compact=compact)
        self.wall_time += time.perf_counter() - t0
        self.n_processed += 1
        if not took:
            self.n_dropped += 1
        elif self.params["octomap_online_creation"]:
            self._online_octomap_insert(self.manager.n_nodes - 1)
        if self.live_dir is not None and self._last_rgb is not None:
            self._live_frame = (
                self._last_rgb, depth,
                self.manager.n_nodes - 1 if took else None,
            )
        self._live_refresh()
        return took

    def _online_octomap_insert(self, node_id: int):
        """octomap_online_creation: insert each accepted node's cloud as it
        arrives; autosave every octomap_autosave_step inserts
        (graph_mgr_io.cpp:292-295, ColorOctomapServer.cpp:84-87)."""
        from ..mapping import VoxelMap, VoxelMapConfig

        if self._online_map is None:
            self._online_map = VoxelMap(
                VoxelMapConfig(
                    resolution=self.params["octomap_resolution"],
                    prob_hit=self.params["octomap_prob_hit"],
                    prob_miss=self.params["octomap_prob_miss"],
                    clamp_min=self.params["octomap_clamping_min"],
                    clamp_max=self.params["octomap_clamping_max"],
                    occupancy_threshold=self.params["octomap_occupancy_threshold"],
                )
            )
        pts, cols, valid, origin = self._node_world_cloud(node_id)
        self._online_map.insert_cloud(pts, cols, valid, origin)
        self._online_inserts += 1
        step = self.params["octomap_autosave_step"]
        if step > 0 and self._online_inserts % step == 0:
            self._online_map.save(self.online_octomap_path)

    def run_arrays(self, rgbs, depths, stamps, gt_poses=None) -> None:
        """Feed pre-loaded arrays through the async per-frame device step.

        Every dispatch is non-blocking (the device queue runs ahead of the
        host; decisions drain in batches) — the TPU analog of the
        reference's concurrent_node_construction pipelining
        (openni_listener.cpp:788-814).
        """
        from ..graph.manager import compact_frame

        p = self.params
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        idxs = list(range(skip0, len(rgbs), step))
        if not idxs:
            return
        stride = self.manager.emm_stride
        fmt = self.manager.ingest_fmt
        gb = self.manager.gray_bits
        db = self.manager.depth_bits
        from ..graph.manager import maybe_scale_depth
        dscale = p["depth_scaling_factor"]

        # frames fused per device dispatch (tpu_frames_per_step = 1|2|4|8):
        # the delta wire's closed-loop host mirror is only exercised/tested
        # at group size 2, so it clamps there
        ngroup = max(1, min(int(p["tpu_frames_per_step"]), 8))
        delta = self.manager.wire_delta
        if delta:
            ngroup = min(ngroup, 2)
        pair = ngroup >= 2

        def enc_at(pos):
            i2 = idxs[pos]
            return compact_frame(
                rgbs[i2], maybe_scale_depth(depths[i2], dscale), stride,
                fmt=fmt, gray_bits=gb, depth_bits=db)

        # encode-ahead: one worker thread keeps the NEXT frames' host
        # encodes in flight while this thread blocks on the relay-socket
        # writes of the current dispatch (the compact encoder is native C —
        # the ctypes call releases the GIL, so the two genuinely overlap on
        # the single host core's wait time). Delta wire can't look ahead:
        # its closed-loop DPCM mirror must advance frame by frame.
        ex = None
        futs = {}
        if p["tpu_encode_ahead"] and not delta and len(idxs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(1)

        def get_enc(pos):
            if ex is None:
                return enc_at(pos)
            f = futs.pop(pos, None)
            out = f.result() if f is not None else enc_at(pos)
            for q in (pos + 1, pos + 2):
                if q < len(idxs) and q not in futs:
                    futs[q] = ex.submit(enc_at, q)
            return out

        try:
            self._run_arrays_loop(idxs, rgbs, depths, stamps, gt_poses,
                                  ngroup, delta, get_enc)
        finally:
            if ex is not None:
                ex.shutdown(wait=False, cancel_futures=True)

    def _run_arrays_loop(self, idxs, rgbs, depths, stamps, gt_poses,
                         ngroup, delta, get_enc):
        pair = ngroup >= 2
        k = 0
        while k < len(idxs):
            i = idxs[k]
            # compact+pack on host (ONE buffer); the packed array goes to
            # slam_step as a plain numpy argument — the jit call performs
            # the single h2d itself. Measured against explicit device_put
            # prefetching and 4-frame chunked transfers on the tunnel: the
            # direct argument is the fastest and the least variable (the
            # tunnel serializes transfer and compute anyway, so prefetch
            # buys nothing and extra dispatches cost latency). In delta-wire
            # mode the manager encodes at dispatch time instead (the host
            # mirror must advance in lockstep with the device state), so
            # cpt stays None here.
            cpt = None if delta else get_enc(k)
            if self.live_dir is not None:
                self._last_rgb = rgbs[i]
            g = min(ngroup, len(idxs) - k)
            if (
                pair
                and not self.paused
                and g >= 2
                and self.manager.can_group(g)
            ):
                # g frames fused into ONE device dispatch (slam_stepN)
                group = idxs[k : k + g]
                if delta:
                    # sequential encodes: each P-frame predicts from its
                    # predecessor's freshly advanced mirror, exactly as the
                    # fused device program reconstructs them in order
                    cpts = [self.manager._wire_encode(rgbs[q], depths[q])
                            for q in group]
                else:
                    cpts = [cpt] + [get_enc(k + m) for m in range(1, g)]
                t0 = time.perf_counter()
                self.manager.add_frame_group(
                    cpts, [float(stamps[q]) for q in group]
                )
                self.wall_time += time.perf_counter() - t0
                self.n_processed += g
                if self.params["octomap_online_creation"]:
                    # same per-frame post-commit work process_frame does —
                    # every grouped node entered the graph (keep_all fast
                    # path)
                    for m in range(g):
                        self._online_octomap_insert(
                            self.manager.n_nodes - g + m)
                if self.live_dir is not None:
                    # pane shows the group's last frame, whose node is the
                    # last committed
                    j = group[-1]
                    self._live_frame = (
                        rgbs[j], depths[j], self.manager.n_nodes - 1
                    )
                self._live_refresh(count=g)
                k += g
                continue
            # anchor the fixed first vertex at the GT of the first frame
            # actually processed (idxs[0] may be > 0 with skip_first_n_frames)
            gt = (
                gt_poses[idxs[0]]
                if (gt_poses is not None and self.manager.n_nodes == 0)
                else None
            )
            if delta:
                self.process_frame(rgbs[i], depths[i], float(stamps[i]), gt)
            else:
                self.process_frame(None, None, float(stamps[i]), gt,
                                   compact=cpt)
            k += 1

    def run_bag(self, bag_path, max_frames: Optional[int] = None) -> None:
        """ROS bag playback input (the reference's primary offline entry,
        processBagfile: src/openni_listener.cpp:218-340): RGB/depth messages
        are approximate-time paired and fed through the identical per-frame
        path, with frame skipping and prefetched compact h2d like run_tum."""
        from ..graph.manager import compact_frame
        from ..io.rosbag import read_rgbd_frames

        p = self.params
        frames = read_rgbd_frames(
            bag_path,
            rgb_topic=p["topic_image_mono"],
            depth_topic=p["topic_image_depth"],
            drop_async=p["drop_async_frames"],
        )
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        stride = self.manager.emm_stride
        fmt = self.manager.ingest_fmt
        gb = self.manager.gray_bits
        db = self.manager.depth_bits

        from ..graph.manager import maybe_scale_depth
        dscale = p["depth_scaling_factor"]

        def gen():
            count = 0
            for k, (ts, rgb, depth) in enumerate(frames):
                if k < skip0 or (k - skip0) % step:
                    continue
                depth = maybe_scale_depth(depth, dscale)
                if self.live_dir is not None:
                    self._last_rgb = rgb  # 2D pane source (live view)
                yield ts, compact_frame(rgb, depth, stride, fmt=fmt, gray_bits=gb,
                                depth_bits=db)
                count += 1
                if max_frames and count >= max_frames:
                    return

        it = gen()
        nxt = next(it, None)
        while nxt is not None:
            ts, cpt = nxt
            nxt = next(it, None)  # decode-ahead (the h2d rides the jit call)
            self.process_frame(None, None, ts, compact=cpt)

    def run_clouds(self, source, max_frames: Optional[int] = None) -> None:
        """Point-cloud input modality (reference: second Node ctor
        node.cpp:252-369, pcdCallback openni_listener.cpp:536, PCD file
        loading :1063-1100). ``source`` is an io.cloud_input.CloudDataset
        or an iterable of (stamp, points, colors); clouds are converted
        at this boundary to the organized RGB-D grid so the identical
        compiled per-frame device program runs."""
        from ..graph.manager import compact_frame
        from ..io.cloud_input import cloud_to_rgbd

        p = self.params
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        stride = self.manager.emm_stride
        fmt = self.manager.ingest_fmt
        gb = self.manager.gray_bits
        db = self.manager.depth_bits

        if hasattr(source, "load"):
            frames = (source.load(i) for i in range(len(source)))
        else:
            frames = (
                (ts,) + cloud_to_rgbd(pts, cols, self.cam)
                for ts, pts, cols in source
            )

        from ..graph.manager import maybe_scale_depth
        dscale = p["depth_scaling_factor"]

        def gen():
            count = 0
            for k, (ts, rgb, depth) in enumerate(frames):
                if k < skip0 or (k - skip0) % step:
                    continue
                depth = maybe_scale_depth(depth, dscale)
                if self.live_dir is not None:
                    self._last_rgb = rgb
                yield ts, compact_frame(rgb, depth, stride, fmt=fmt,
                                        gray_bits=gb, depth_bits=db)
                count += 1
                if max_frames and count >= max_frames:
                    return

        it = gen()
        nxt = next(it, None)
        while nxt is not None:
            ts, cpt = nxt
            nxt = next(it, None)
            self.process_frame(None, None, ts, compact=cpt)

    def run_stereo(self, source, max_frames: Optional[int] = None) -> None:
        """Stereo input modality (reference: stereoCallback,
        openni_listener.cpp:559-598). ``source`` is an
        io.stereo_input.StereoDataset (or yields the same load() tuples);
        the block-matching disparity -> depth front-end runs on device
        (ops/stereo.py) and the resulting RGB-D grid feeds the identical
        per-frame path."""
        import jax

        from ..graph.manager import compact_frame
        from ..ops.stereo import stereo_depth

        p = self.params
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        stride = self.manager.emm_stride
        fmt = self.manager.ingest_fmt
        gb = self.manager.gray_bits
        db = self.manager.depth_bits
        baseline = float(p["stereo_baseline"])
        max_disp = int(p["stereo_max_disparity"])
        block = int(p["stereo_block_size"])

        def gen():
            count = 0
            for k in range(len(source)):
                if k < skip0 or (k - skip0) % step:
                    continue
                ts, rgb, gl, gr = source.load(k)
                depth, _ = stereo_depth(
                    gl, gr, self.cam.fx, baseline,
                    max_disp=max_disp, block=block,
                )
                depth = np.asarray(jax.device_get(depth))
                if self.live_dir is not None:
                    self._last_rgb = rgb
                yield ts, compact_frame(rgb, depth, stride, fmt=fmt,
                                        gray_bits=gb, depth_bits=db)
                count += 1
                if max_frames and count >= max_frames:
                    return

        it = gen()
        nxt = next(it, None)
        while nxt is not None:
            ts, cpt = nxt
            nxt = next(it, None)
            self.process_frame(None, None, ts, compact=cpt)

    def save_bagfile(self, path, include_clouds: bool = False) -> str:
        """Record the optimized result into a bag: /tf trajectory messages
        (world -> camera per node), optionally per-node RGB-D images —
        saveBagfile capability (reference: src/graph_mgr_io.cpp:102-150)."""
        import numpy as np

        from ..core.se3 import rot_to_quat
        from ..io.rosbag import BagWriter, TransformStamped

        stamps, poses = self.manager.trajectory()
        mgr = self.manager
        with BagWriter(path) as bag:
            for nid, (t, T) in enumerate(zip(stamps, np.asarray(poses))):
                q = np.asarray(rot_to_quat(T[:3, :3]))
                bag.write_tf(
                    [TransformStamped(float(t), "/map", "/camera",
                                      T[:3, 3].copy(), q)]
                )
                if include_clouds:
                    # per-node sensor data alongside the trajectory, like the
                    # reference's bag writer records node images/clouds
                    # (graph_mgr_io.cpp:102-150); stored stride-s color +
                    # depth (meters f32) from the device store
                    depth = np.asarray(mgr.store.depth[nid], np.float32).reshape(
                        mgr.cam_small.height, mgr.cam_small.width
                    )
                    bag.write_image(
                        self.params["topic_image_depth"], float(t), depth
                    )
                    if mgr.store.has_color:
                        rgb = np.asarray(mgr.store.color[nid]).reshape(
                            mgr.cam_small.height, mgr.cam_small.width, 3
                        )
                        bag.write_image(
                            self.params["topic_image_mono"], float(t), rgb
                        )
        return str(path)

    def run_tum(self, dataset: TumDataset, max_frames: Optional[int] = None,
                use_native: bool = True) -> None:
        """Process a TUM dataset. Prefers the C++ threaded loader
        (io/native_loader.py) — decode happens on native worker threads
        while this thread dispatches TPU work."""
        p = self.params
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        idxs = list(range(skip0, len(dataset), step))
        if max_frames:
            idxs = idxs[:max_frames]
        if not idxs:
            return

        if use_native and step == 1 and skip0 == 0:
            # Fall back to the Python loader ONLY on construction/availability
            # failures. Once iteration has started, decode errors must
            # propagate — restarting from frame 0 would feed duplicate frames
            # into a graph that already holds the first N nodes.
            loader = None
            try:
                from ..io.native_loader import NativeTumLoader, native_available

                if native_available():
                    loader = NativeTumLoader(
                        dataset, width=self.cam.width, height=self.cam.height
                    )
            except Exception as exc:
                import logging

                logging.getLogger("rgbdslam.pipeline").warning(
                    "native loader unavailable (%s); using Python loader", exc
                )
                loader = None
            if loader is not None:
                try:
                    count = 0
                    for ts, rgb, depth in loader:
                        self.process_frame(rgb, depth, ts)
                        count += 1
                        if max_frames and count >= max_frames:
                            break
                finally:
                    loader.close()
                return

        from ..graph.manager import compact_frame

        stride = self.manager.emm_stride
        fmt = self.manager.ingest_fmt
        gb = self.manager.gray_bits
        db = self.manager.depth_bits

        def put(i):
            ts, rgb, depth = dataset.load(i)
            return ts, compact_frame(rgb, depth, stride, fmt=fmt, gray_bits=gb,
                                depth_bits=db)

        nxt = put(idxs[0])
        for k, i in enumerate(idxs):
            ts, cpt = nxt
            if k + 1 < len(idxs):
                nxt = put(idxs[k + 1])
            self.process_frame(None, None, ts, compact=cpt)

    # ------------------------------------------------------------------
    def evaluation_protocol(
        self,
        out_dir,
        prefix: str = "estimate",
        gt_stamps=None,
        gt_xyz=None,
    ) -> EvaluationReport:
        """The reference's 5-level offline protocol (openni_listener.cpp:431):

        L0: online estimates as-is; L1: full optimization; L2..L4: prune
        edges with chi² above 5 / 1 / 0.25, re-optimizing after each prune.
        """
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        mgr = self.manager
        levels: Dict[int, str] = {}
        ate: Dict[int, float] = {}

        def save_level(level: int):
            stamps, poses = mgr.trajectory()
            path = out / f"{prefix}_iteration_{level}.txt"
            write_trajectory(
                path,
                stamps,
                poses,
                comment=(
                    f"level {level}; frames "
                    f"{self.params['fixed_frame_name']}->"
                    f"{self.params['base_frame_name']}"
                ),
            )
            levels[level] = str(path)
            if gt_stamps is not None and gt_xyz is not None and len(stamps) > 2:
                try:
                    res = evaluate_ate(stamps, poses[:, :3, 3], gt_stamps, gt_xyz)
                    ate[level] = res.rmse
                except ValueError:
                    pass

        save_level(0)
        # The reference's protocol switches to full-graph optimization with
        # first-vertex fixation for the final runs (openni_listener.cpp:439).
        # Restored afterwards: leaking "first" into later use of this params
        # object would silently disable e.g. inaffected on a second sequence.
        saved_fixation = self.params["pose_relative_to"]
        try:
            self.params["pose_relative_to"] = "first"
            mgr.optimize(iterations=self.params["optimizer_iterations"] * 2)
            save_level(1)
            thresholds = ((2, self.params["edge_error_threshold"]), (3, 1.0), (4, 0.25))
            for level, thresh in thresholds:
                mgr.prune_edges_above(thresh)
                mgr.optimize(iterations=self.params["optimizer_iterations"])
                save_level(level)
        finally:
            self.params["pose_relative_to"] = saved_fixation

        fps = self.n_processed / self.wall_time if self.wall_time > 0 else 0.0
        report = EvaluationReport(
            levels=levels,
            ate_rmse=ate,
            duration_s=self.wall_time,
            fps=fps,
            statistics=mgr.statistics(),
        )
        (out / f"{prefix}_report.json").write_text(
            json.dumps(report.as_dict(), indent=2)
        )
        return report

    # ------------------------------------------------------------------
    # Output capabilities (graph_mgr_io.cpp parity)
    # ------------------------------------------------------------------
    def _node_world_cloud(self, node_id: int):
        """Rebuild node cloud from stored stride-s depth/color + current pose
        (the reference's updateCloudOrigin + transform, graph_mgr_io.cpp:216)."""
        from ..core.camera import backproject_grid
        from ..core import se3 as _se3

        mgr = self.manager
        depth = mgr.store.depth[node_id].reshape(
            mgr.cam_small.height, mgr.cam_small.width
        )
        pts_cam = backproject_grid(depth, mgr.cam_small)
        pose = mgr.graph.poses[node_id]
        pts_w = _se3.apply(pose, pts_cam.reshape(-1, 3))
        valid = (depth > 0).reshape(-1)
        if mgr.store.has_color:
            cols = np.asarray(mgr.store.color[node_id]).reshape(-1, 3)
        else:  # store_pointclouds=false: colors were not retained
            cols = np.zeros((int(np.prod(depth.shape)), 3), np.uint8)
        return (
            np.asarray(pts_w),
            cols,
            np.asarray(valid),
            np.asarray(pose[:3, 3]),
        )

    def save_octomap(self, path, map_config=None, node_stride: int = 1):
        """Raycast all node clouds into a color voxel map, save as .ot
        (saveOctomapImpl capability, graph_mgr_io.cpp:253-310)."""
        from ..mapping import VoxelMap, VoxelMapConfig

        cfg = map_config or VoxelMapConfig(
            resolution=self.params["octomap_resolution"],
            prob_hit=self.params["octomap_prob_hit"],
            prob_miss=self.params["octomap_prob_miss"],
            clamp_min=self.params["octomap_clamping_min"],
            clamp_max=self.params["octomap_clamping_max"],
            occupancy_threshold=self.params["octomap_occupancy_threshold"],
        )
        vmap_ = VoxelMap(cfg)
        for nid in range(0, self.manager.n_nodes, node_stride):
            pts, cols, valid, origin = self._node_world_cloud(nid)
            vmap_.insert_cloud(pts, cols, valid, origin)
        vmap_.save(path)
        if self.params["octomap_clear_after_save"]:
            # graph_mgr_io.cpp:303: free the map after the final save
            if getattr(self, "_online_map", None) is not None:
                self._online_map = None
            return VoxelMap(cfg)
        return vmap_

    def save_clouds(self, path, voxel: Optional[float] = None, fmt: str = "pcd",
                    occupancy_map=None):
        """Aggregate world cloud -> PCD/PLY (saveAllCloudsToFile capability).

        occupancy_map: optional VoxelMap — points whose voxel's occupancy
        probability falls below `occupancy_filter_threshold` are removed
        (the reference's occupancyFilterClouds, graph_manager.cpp:1376 /
        ColorOctomapServer.cpp:132-185)."""
        from ..io.pointcloud import voxel_downsample, write_pcd, write_ply

        occ_thr = self.params["occupancy_filter_threshold"]
        all_p, all_c = [], []
        for nid in range(self.manager.n_nodes):
            pts, cols, valid, _ = self._node_world_cloud(nid)
            if occupancy_map is not None:
                valid = np.asarray(
                    occupancy_map.occupancy_filter(pts, valid, occ_thr)
                )
            all_p.append(pts[valid])
            all_c.append(cols[valid])
        pts = np.concatenate(all_p, 0) if all_p else np.zeros((0, 3))
        cols = np.concatenate(all_c, 0) if all_c else np.zeros((0, 3), np.uint8)
        v = self.params["voxelfilter_size"] if voxel is None else voxel
        if v and v > 0:
            pts, cols = voxel_downsample(pts, cols, v)
        if fmt == "ply":
            write_ply(path, pts, cols)
        else:
            write_pcd(path, pts, cols)
        return len(pts)

    def save_individual_clouds(self, out_dir, fmt: str = "pcd"):
        """One world-frame cloud file per node (saveIndividualCloudsToFile
        capability, graph_mgr_io.cpp:330). Returns the file list."""
        from ..io.pointcloud import write_pcd, write_ply

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        files = []
        for nid in range(self.manager.n_nodes):
            pts, cols, valid, _ = self._node_world_cloud(nid)
            path = out / f"node_{nid:04d}.{fmt}"
            if fmt == "ply":
                write_ply(path, pts[valid], cols[valid])
            else:
                write_pcd(path, pts[valid], cols[valid])
            files.append(str(path))
        return files

    def save_mesh(self, path, node_stride: int = 1,
                  jump_frac: float = 0.05) -> int:
        """Triangle-mesh the organized node grids into one world-frame PLY
        (the GL viewer's triangle-strip rendering with depth-jump test,
        glviewer.cpp:776-880, persisted as an indexed mesh). Returns the
        face count."""
        from ..io.meshing import (
            compact_mesh, grid_mesh_faces, merge_meshes, write_ply_mesh)

        mgr = self.manager
        hw = (mgr.cam_small.height, mgr.cam_small.width)
        parts = []
        for nid in range(0, mgr.n_nodes, max(1, node_stride)):
            pts, cols, valid, _ = self._node_world_cloud(nid)
            depth = np.asarray(mgr.store.depth[nid]).reshape(hw)
            faces = grid_mesh_faces(depth, valid.reshape(hw), jump_frac)
            parts.append(compact_mesh(pts, cols, faces))
        verts, cols, faces = merge_meshes(parts)
        write_ply_mesh(path, verts, cols, faces)
        return len(faces)

    def save_g2o(self, path):
        """Export the pose graph in g2o text format (saveG2OGraph capability)."""
        from ..graph.g2o_io import write_g2o

        mgr = self.manager
        poses = mgr.poses()
        fixed = [i for i in range(mgr.n_nodes) if bool(mgr.graph.node_fixed[i])]
        active = np.asarray(mgr.graph.edge_active)
        meas = np.asarray(mgr.graph.edge_meas)
        info = np.asarray(mgr.graph.edge_info)
        ei = np.asarray(mgr.graph.edge_i)
        ej = np.asarray(mgr.graph.edge_j)
        edges = [
            (int(ei[e]), int(ej[e]), meas[e], info[e])
            for e in range(mgr.n_edges)
            if active[e]
        ]
        write_g2o(path, poses, fixed, edges)

    def save_graph_viz(self, path):
        """Graph nodes/edges as a colored PLY line set (RViz-marker
        equivalent, graph_mgr_io.cpp:687-932)."""
        from ..io.visualization import export_graph_ply

        mgr = self.manager
        mgr._drain_pending()
        return export_graph_ply(
            path,
            mgr.poses(),
            mgr.edge_pairs,
            np.asarray(mgr.graph.edge_active),
            mgr.edge_types,
        )

    def save_features(self, path):
        """World-frame feature positions + descriptors (.npz;
        saveAllFeaturesToFile capability, graph_mgr_io.cpp:445-497)."""
        from ..core import se3 as _se3
        import jax.numpy as _jnp

        mgr = self.manager
        pos, desc, node_ids = [], [], []
        for nid in range(mgr.n_nodes):
            valid = np.asarray(mgr.store.kp_valid[nid])
            xyz = np.asarray(
                _se3.apply(mgr.graph.poses[nid], mgr.store.xyz[nid])
            )[valid]
            pos.append(xyz)
            desc.append(np.asarray(mgr.store.desc[nid])[valid])
            node_ids.append(np.full(valid.sum(), nid, np.int32))
        np.savez_compressed(
            path,
            positions=np.concatenate(pos, 0) if pos else np.zeros((0, 3)),
            descriptors=np.concatenate(desc, 0) if desc else np.zeros((0, 256)),
            node_ids=np.concatenate(node_ids, 0) if node_ids else np.zeros(0, np.int32),
        )
