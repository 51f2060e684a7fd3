"""Parameter server: one registry of named, typed, documented options.

Capability parity: the reference's ParameterServer singleton defines ~100
typed options with defaults + descriptions in one table
(reference: src/parameter_server.cpp:22-173), overridable from launch files /
CLI / GUI, with cross-parameter consistency checks (:226-249). Here the same
*names and semantics* are kept for the SLAM-relevant subset, loadable from
YAML-ish config files and CLI ``key=value`` pairs. TPU-specific options are
added under the same scheme (static capacities, batch sizes, precision).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict


@dataclasses.dataclass(frozen=True)
class ParamDef:
    name: str
    default: Any
    doc: str


def _p(name, default, doc):
    return ParamDef(name, default, doc)


# Reference-parity options keep the reference's names (src/parameter_server.cpp:22-173).
# TPU-native additions are marked [tpu].
PARAM_DEFS = [
    # ---- input / frontend ----
    _p("feature_detector_type", "ORB", "ORB or SIFT (SIFTGPU maps to SIFT: TPU SIFT kernel)"),
    _p("feature_extractor_type", "ORB", "ORB or SIFT descriptor"),
    _p("max_keypoints", 600, "fixed keypoint budget per frame (static shape)"),
    _p("min_keypoints", 50, "warn below this many valid keypoints"),
    _p("adjuster_max_iterations", 5,
       "adaptive detection ladder depth: halve the FAST threshold (one "
       "cached compiled variant per rung) while depth-valid corners fall "
       "below max(min_keypoints, 2*min_matches) — i.e. real starvation; "
       "0 disables (DetectorAdjuster parity, feature_adjuster.cpp:131-175)"),
    _p("detector_grid_resolution", 3, "detect per grid cell (NxN) to spread keypoints"),
    _p("squareroot_descriptor_space", True, "RootSIFT: compare SIFT in sqrt(L1) space"),
    _p("max_matches", 300, "keep strongest N matches (static shape)"),
    _p("nn_distance_ratio", 0.95, "Lowe ratio test threshold (ORB default 0.95, SIFT 0.5-0.8)"),
    _p("min_matches", 20, "matches below this -> edge rejected"),
    _p("data_skip_step", 1, "process every n-th frame"),
    _p("drop_async_frames", False,
       "reject RGB-depth pairs whose timestamps differ by more than 1/30 s "
       "(reference asyncFrameDrop, misc.cpp:432-448; largely subsumed here "
       "by the stricter 0.02 s greedy association window, but honored as an "
       "explicit post-association gate)"),
    _p("depth_scaling_factor", 1.0,
       "multiply raw depth at ingest — some Kinects report wrongly scaled "
       "depth (reference misc.cpp:502, node.cpp:705)"),
    _p("sufficient_matches", int(1e9),
       "adaptive detection aims for at least this many depth-valid "
       "keypoints: values below max_keypoints raise the rung-ladder's "
       "starvation bound (reference parameter_server.cpp:88 — honored only "
       "by the adjustable detectors there too)"),
    _p("start_paused", False,
       "start with processing paused; unpause via SlamPipeline.toggle_pause "
       "or step single frames with get_one_frame"),
    _p("bagfile_name", "", "read input from a ROS bag file (playback input)"),
    _p("topic_image_mono", "/camera/rgb/image_color", "bag topic: color image"),
    _p("topic_image_depth", "/camera/depth/image", "bag topic: depth image"),
    _p("topic_points", "",
       "bag topic: PointCloud2 input; if set, frames come from clouds "
       "instead of the image topics (reference parameter_server.cpp:28, "
       "pcdCallback openni_listener.cpp:536)"),
    _p("stereo_baseline", 0.075,
       "stereo input: rectified pair baseline in meters (the reference's "
       "stereoCallback consumes stereo_image_proc output, "
       "openni_listener.cpp:559-598; this framework owns the block-matching "
       "front-end on device, ops/stereo.py)"),
    _p("stereo_max_disparity", 64, "stereo input: disparity search range (px)"),
    _p("stereo_block_size", 9, "stereo input: SAD matching window (px)"),
    _p("skip_first_n_frames", 0, "drop initial frames"),
    _p("cloud_creation_skip_step", 2, "subsample the point grid by this step"),
    _p("maximum_depth", 10.0, "depth clip (m)"),
    _p("minimum_depth", 0.1, "depth clip (m)"),
    _p("sigma_depth", 0.01, "depth noise: stddev = sigma_depth * z^2"),
    _p("use_feature_min_depth", False,
       "feature depth = 3x3 neighborhood minimum instead of the center pixel "
       "(biases depth low under noise; off by default like the reference)"),
    # ---- pairwise registration ----
    _p("ransac_iterations", 200, "RANSAC hypothesis count (batched on TPU)"),
    _p("sample_candidates", 4, "correspondences per RANSAC hypothesis"),
    _p("max_dist_for_inliers", 3.0, "Mahalanobis distance threshold (squared test)"),
    _p("refine_iterations", 4, "post-RANSAC weighted refit rounds"),
    _p("min_sampled_candidates", 4, "min graph-neighbor candidates sampled"),
    _p("observability_threshold", 0.0, "EMM: required inlier fraction; <=0 disables"),
    _p("emm_skip_step", 8,
       "EMM subsampling stride over the (already cloud-strided) depth grid "
       "(reference emm__skip_step default 8, parameter_server.cpp:112 — "
       "effective stride 16 at cloud_creation_skip_step=2)"),
    _p("use_icp", False, "GICP refinement fallback"),
    _p("icp_max_iterations", 20, "GICP Gauss-Newton rounds"),
    _p("icp_variant", "gicp",
       "dense rescue algorithm: 'gicp' = plane-to-plane Generalized ICP with "
       "per-point disk covariances and Mahalanobis GN (the algorithm the "
       "reference ships, external/gicp/gicp.h:85 AlignScan, node.cpp:396-425)"
       "; 'point_to_plane' = point-to-plane ICP (its PCL-ICP alternative, "
       "icp.cpp:47-89). [A/B tests/test_icp.py::test_gicp_vs_point_to_plane_"
       "rescue: gicp matches or beats p2p on corner + low-texture rescues]"),
    _p("g2o_transformation_refinement", 0,
       "projective pose+landmark GN rounds over (u,v,depth) residuals after "
       "RANSAC (0=off; transformation_estimation.cpp:37-170 equivalent)"),
    # ---- motion gates (per-second thresholds; reference misc.cpp:272-344) ----
    _p("min_translation_meter", 0.0, "drop frame if motion below (redundancy filter)"),
    _p("min_rotation_degree", 0.0, "drop frame if rotation below"),
    _p("max_translation_meter", 1e10, "reject edge if translation above (sanity)"),
    _p("max_rotation_degree", 1e10, "reject edge if rotation above"),
    # ---- graph / backend ----
    _p("geodesic_depth", 3, "candidates: geodesic-neighborhood depth"),
    _p("predecessor_candidates", 4, "sequential candidates"),
    _p("neighbor_candidates", 4, "graph-neighbor candidates"),
    _p("keep_all_nodes", False, "constant-position edge when no match (stay connected)"),
    _p("keep_good_nodes", False, "keep unmatched nodes if they have enough features"),
    _p("clear_non_keyframes", False, "free per-frame data for non-keyframes"),
    _p("optimizer_skip_step", 1, "optimize every n-th node"),
    _p("optimizer_iterations", 20, "max LM/GN iterations per (final) optimize call"),
    _p("online_optimizer_iterations", 3, "[tpu] LM iterations for online optimize"),
    _p("backend_solver", "auto", "auto | cholesky (dense direct) | pcg (implicit CG)"),
    _p("pose_relative_to", "first", "vertex fixation: first|previous|inaffected|largest_loop"),
    _p("edge_error_threshold", 5.0, "prune edges with chi2 error above (protocol levels)"),
    _p("huber_delta", 1.0, "robust kernel width for graph edges"),
    _p("odometry_information_factor", 1e6, "weight of odometry edges"),
    _p("use_robot_odom", False, "add odometry edges between consecutive nodes"),
    _p("use_robot_odom_only", False, "skip visual registration; odometry edges only"),
    _p("global_loop_candidates", 0, "appearance-based global retrieval count (0=off)"),
    _p("max_connections", -1,
       "stop accepting edges for a frame after this many successful "
       "matches; negative = no limit (reference node.cpp:1310-1312 — on "
       "the fast path the candidate batch already bounds edges per frame, "
       "so this gates the slow/concurrent path)"),
    _p("constant_position_information", 1e-3, "info scale of fallback edges"),
    # ---- mapping / output ----
    _p("octomap_resolution", 0.05, "voxel edge length (m)"),
    _p("octomap_clamping_min", 0.12, "occupancy clamp low (prob)"),
    _p("octomap_clamping_max", 0.97, "occupancy clamp high (prob)"),
    _p("octomap_prob_hit", 0.7, "hit update probability"),
    _p("octomap_prob_miss", 0.4, "miss update probability"),
    _p("octomap_occupancy_threshold", 0.5, "occupied decision threshold"),
    _p("octomap_online_creation", False, "insert clouds during mapping"),
    _p("octomap_autosave_step", 50, "autosave every N clouds"),
    _p("octomap_clear_after_save", False,
       "clear the voxel map after a (final) save (graph_mgr_io.cpp:303)"),
    _p("occupancy_filter_threshold", 0.9,
       "occupancy_filter: remove cloud points in voxels whose occupancy "
       "probability is below this (ColorOctomapServer.cpp:191, "
       "graph_manager.cpp:1376)"),
    _p("voxelfilter_size", -1.0, "cloud voxel-grid downsample size (m); <=0 off"),
    # ---- pipeline ----
    _p("batch_processing", False, "offline evaluation mode (5-level protocol)"),
    _p("min_time_reported", -1.0,
       "ScopedTimer profiling: log stages that exceed this many seconds; "
       "negative = report nothing (reference parameter_server.cpp:164, "
       "scoped_timer.cpp:22-33)"),
    _p("store_pointclouds", True, "retain clouds for mapping/export"),
    _p("fixed_frame_name", "/map", "world frame name in outputs"),
    _p("ground_truth_frame_name", "",
       "tf child frame carrying ground truth in bag playback; empty = none "
       "(reference parameter_server.cpp:75)"),
    _p("base_frame_name", "/openni_camera", "sensor/base frame name"),
    # ---- [tpu] static capacities & precision ----
    _p("tpu_max_nodes", 4096, "[tpu] pose-graph node capacity"),
    _p("tpu_max_edges", 65536, "[tpu] pose-graph edge capacity"),
    _p("tpu_candidate_batch", 8, "[tpu] candidate pairs registered per device call"),
    _p("tpu_descriptor_dtype", "int8", "[tpu] descriptor storage (int8 +-1 / bf16)"),
    _p("tpu_image_height", 480, "[tpu] static frame height"),
    _p("tpu_image_width", 640, "[tpu] static frame width"),
    _p("tpu_mesh_devices", 1, "[tpu] devices in the candidate-sharding mesh"),
    _p("tpu_seed", 0, "[tpu] PRNG seed for RANSAC / sampling"),
    _p("tpu_drain_interval", 8, "[tpu] frames between host bookkeeping drains (fast path)"),
    _p("tpu_drain_pipelined", True,
       "[tpu] drain step summaries as ONE stacked device array whose async "
       "copy is consumed at the NEXT drain (host-local get) instead of N "
       "separate blocking pulls — removes the ~80 ms fixed per-drain tunnel "
       "cost (tools/frame_budget.py); bookkeeping lags one extra drain "
       "interval on the fast path, consistency paths still flush "
       "synchronously"),
    _p("tpu_encode_ahead", False,
       "[tpu] run the host compact-frame encoder for upcoming frames on a "
       "single worker thread during run_arrays, overlapping the native C "
       "encode (ctypes releases the GIL) with the current frame's "
       "relay-socket dispatch writes. Off by default pending the on-chip "
       "A/B (tools/ab_ate.py ydct27-encahead); no effect on the delta "
       "wire, whose closed-loop mirror must encode in dispatch order"),
    _p("tpu_frames_per_step", 1,
       "[tpu] frames fused into one device dispatch (1|2|4|8): divides the "
       "fixed per-dispatch client/host cost — the round-5 measured frame "
       "bound once the wire streams pipelined (WIRE.md; step_resident "
       "11.1 ms vs device busy 4.3 ms at yc12) — by N. Results are "
       "bit-identical to N sequential steps (device_step.make_slam_stepN; "
       "equality-tested). The delta wire clamps the group to 2 (its "
       "closed-loop host mirror is validated at that size)"),
    _p("tpu_ingest_format", "yc12",
       "[tpu] wire format of the per-frame ingest buffer: yc12 (gray_bits "
       "luma + depth_bits sqrt stride-s depth + sparse 4:2:0 chroma, "
       "0.43 MB/frame at 8/12 defaults) | ydct (yc12 with the luma plane "
       "block-DCT coded at a fixed ~2.3 bits/px, 0.21 MB/frame — device "
       "decode is one MXU matmul; see ops/dct_wire.py; falls back to yc12 "
       "when the frame is not divisible by 8) | raw (u16 depth + stride-s "
       "RGB, 1.15 MB/frame). The tunnel link (~27-38 MB/s eager, WIRE.md) "
       "makes the payload size the throughput bound; falls back to raw "
       "when the frame size is not divisible by 2x the cloud stride"),
    _p("tpu_dct_quality", "2.3",
       "[tpu] rate/quality point of the ydct luma wire, bits/px: 2.3 "
       "(87 KB @ 640x480, the throughput point) | 2.7 (103 KB, same coded "
       "positions at finer quantizer steps) | 3.1 (118 KB, + 8 more coded "
       "high-frequency positions). Offline feature-stability scores in "
       "ops/dct_wire.SPECS; every default move is gated on the on-chip "
       "protocol-ATE A/B (tools/ab_ate.py). Process-global like the format "
       "itself (the wire is one contract between host encoder and device "
       "decoder; compiled programs are keyed by wire length)"),
    _p("tpu_gray_bits", 8,
       "[tpu] luma bits on the wire for the yc12 ingest: 8 (1 B/px, exact "
       "luma — the default), 6 (4 px -> 3 B with Bayer-ordered dithering, "
       "-77 KB/frame), or 5 (8 px -> 5 B dithered, another -38 KB/frame). "
       "Round-4 on-chip A/B (tools/r4d_ab_queue.sh; PARITY.md): at VGA the "
       "serialized tunnel wire is latency-dominated, so 6-bit saved no "
       "measurable fps while costing 60% L1 protocol ATE (0.0223 -> "
       "0.0355 m) — keep 8 unless the link is genuinely bandwidth-starved, "
       "and A/B any downgrade end-to-end"),
    _p("tpu_depth_bits", 12,
       "[tpu] sqrt-coded depth bits on the wire for the yc12 ingest: 12 "
       "(1.5 B/sample, error 0.9-1.3 mm — the default) or 10 "
       "(1.25 B/sample, 3.5-6 mm, -19 KB/frame; same A/B verdict as "
       "tpu_gray_bits: the byte savings bought no fps on the "
       "latency-dominated link and cost L1 ATE)"),
    _p("tpu_wire_delta", False,
       "[tpu] temporal-delta wire coding for the yc12 ingest (fast path, "
       "gray_bits=6/depth_bits=10): P-frames ship 4-bit luma-code residuals "
       "+ 5-bit depth-code residuals against the previous frame's "
       "reconstruction (closed-loop DPCM, host mirrors device integer-"
       "exactly) — 211 vs 336 KB/frame at VGA/s2 on the serialized tunnel "
       "link. Frames whose clamped-residual fraction exceeds "
       "tpu_wire_delta_max_clamp (fast motion, scene cuts, depth flicker) "
       "auto-ship as absolute I-frames, so accuracy never drops below the "
       "absolute wire format"),
    _p("tpu_wire_delta_max_clamp", 0.02,
       "[tpu] max fraction of clamped residual samples before the delta "
       "wire encoder falls back to an absolute I-frame"),
    _p("tpu_approx_select", False,
       "[tpu] per-cell keypoint selection via lax.approx_max_k (~0.95 "
       "recall hardware binned reduction) instead of exact top_k, which "
       "full-sorts every pyramid level's score map on TPU; exact off-TPU. "
       "A/B before enabling by default (tools/ab_ate.py)"),
    _p("tpu_edge_info", "scalar",
       "[tpu] visual edge information matrix: scalar (inliers/rmse^2 * I6, "
       "the reference's isotropic weight) | hessian (anisotropic GN pose "
       "information from the match geometry, trace-matched to the scalar "
       "magnitude; ops/registration.pose_information). End-to-end A/B "
       "(tools/ab_ate.py hess): hessian degrades protocol ATE ~1.8x on the "
       "bench sequence — scalar stays the default"),
    _p("tpu_emm_exact", False,
       "[tpu] use the reference's verbatim 9-sample EMM neighborhood search "
       "instead of the pooled [min,max] fast path (precision studies; "
       "~9x the gather traffic)"),
    _p("tpu_retrieval_min_matches", 10,
       "[tpu] min descriptor hits for a deferred appearance-retrieval "
       "candidate (fast-path analog of the ratio-test retrieval gate)"),
]

_DEFS_BY_NAME = {d.name: d for d in PARAM_DEFS}


class ParameterServer:
    """Typed key-value config with reference-parity names.

    Unlike the reference's mutable singleton, instances are explicit; a
    process-default instance is available via :func:`default_params`.
    """

    def __init__(self, overrides: Dict[str, Any] | None = None):
        self._values: Dict[str, Any] = {d.name: d.default for d in PARAM_DEFS}
        if overrides:
            for k, v in overrides.items():
                self.set(k, v)

    def get(self, name: str):
        try:
            return self._values[name]
        except KeyError:
            raise KeyError(f"unknown parameter {name!r}") from None

    def set(self, name: str, value: Any):
        if name not in _DEFS_BY_NAME:
            raise KeyError(f"unknown parameter {name!r}")
        default = _DEFS_BY_NAME[name].default
        # Coerce to the default's type (typed options like the reference).
        if isinstance(default, bool):
            if isinstance(value, str):
                value = value.lower() in ("1", "true", "yes", "on")
            value = bool(value)
        elif isinstance(default, int) and not isinstance(default, bool):
            value = int(value)
        elif isinstance(default, float):
            value = float(value)
        elif isinstance(default, str):
            value = str(value)
        self._values[name] = value
        return value

    def __getitem__(self, name):
        return self.get(name)

    def __setitem__(self, name, value):
        self.set(name, value)

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._values)

    def check_values(self):
        """Cross-parameter consistency checks (reference :226-249)."""
        warnings = []
        if self.get("nn_distance_ratio") >= 1.0:
            warnings.append("nn_distance_ratio >= 1 disables the ratio test")
        if self.get("max_keypoints") < self.get("min_matches"):
            warnings.append("max_keypoints below min_matches: no edge can ever form")
        if self.get("sample_candidates") < 3:
            warnings.append("sample_candidates < 3 cannot constrain SE(3); forcing 3")
            self.set("sample_candidates", 3)
        return warnings

    # -- persistence ---------------------------------------------------
    def save(self, path):
        Path(path).write_text(json.dumps(self._values, indent=2, sort_keys=True))

    @classmethod
    def load(cls, path):
        return cls(json.loads(Path(path).read_text()))

    @classmethod
    def from_cli(cls, pairs):
        """Build from ['key=value', ...] CLI overrides."""
        out = {}
        for pair in pairs:
            k, _, v = pair.partition("=")
            if not _:
                raise ValueError(f"expected key=value, got {pair!r}")
            out[k.strip()] = v.strip()
        return cls(out)


_DEFAULT: ParameterServer | None = None


def default_params() -> ParameterServer:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = ParameterServer()
    return _DEFAULT
