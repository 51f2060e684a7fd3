#!/usr/bin/env python
"""Benchmark: end-to-end RGB-D SLAM throughput on one TPU chip, at the
reference benchmark's scale.

Phase 1 (fr1-class, the headline number): 520 frames of 640x480 RGB-D
(synthetic textured room with exact ground truth — no TUM data ships in
this environment), Kinect-style quadratic depth noise (sigma 0.01*z^2)
plus the TUM 1/5000 u16 depth quantization, fr1-class angular rate
(2 deg/frame), multiple full orbits so appearance/keyframe loop closures
fire. Three measurement windows; the MEDIAN window is the reported value
(the tunnel shows ~1.6x run-to-run contention variance; best is printed
too). Then the reference's full 5-level evaluation protocol ATE.

Phase 2 (fr2-class scale): the same orbit repeated 4x (2080 frames — a
4-revisit trajectory) into a 4096-node / 65536-edge graph, reporting fps
per 520-frame chunk (nodes ~500/1000/1500/2000) to expose O(nodes) cost
growth, plus the >1024-node full-graph optimization (PCG path) runtime.
Reference: fr2_desk builds 2866 nodes / 37k edges in 273.7 s (~10 fps,
test/README:114).

Measured work per frame: compact yc12 ingest (0.46 MB: 8-bit Y + 12-bit
sqrt-coded stride-2 depth + 4:2:0 chroma at stride 8, C-packed; the r4
wire A/B showed lower-precision variants cost L1 ATE without fps gains),
ORB-600 extraction, 8-candidate MXU matching +
batched RANSAC with Mahalanobis inliers + bidirectional EMM validation,
donated graph commit, amortized subgraph (inaffected) optimization — the
full online protocol of the reference at fr1_desk settings
(test/test_settings.launch).

Baseline: the reference processes TUM fr1_desk at ~16.6 fps end-to-end
(550 nodes / 33.2 s, test/README:106, contemporary desktop CPU+GPU).

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Stage budgets and per-scale fps go to stderr.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

BASELINE_FPS = 16.6  # reference fr1_desk end-to-end (test/README:106)


def _release_pipes(*ps):
    """Drop a pipeline's device buffers (HBM) before the next phase.

    One v5e chip holds the 5 fps windows + the 4096-node fr2 graph + the
    spin360 pipe only if each phase's buffers are actually freed in
    between; reference-cycle garbage keeps jax.Arrays alive past the
    rebinding, so break the cycles explicitly and collect. Shared
    module-level constants (DCT tables, FAST offsets, jit caches) are
    refcounted elsewhere and survive — only this pipe's state dies."""
    import gc

    for p in ps:
        try:
            p.manager.__dict__.clear()
        except Exception:
            pass
        try:
            p.__dict__.clear()
        except Exception:
            pass
    gc.collect()


def wait_for_backend(attempts: int = None, probe_timeout: float = None):
    """Gate on the device backend actually answering.

    The tunnel link to the chip can be transiently down; jax.devices() then
    blocks indefinitely INSIDE this process with no way to cancel it. Probe
    from a killable subprocess (sequential, so the single-jax-process rule
    holds). Real outages run for hours (round 3 lost its official number to
    a ~20 min gate), so the default rides out ~2 h: 60 probes x (110 s probe
    + 10 s sleep), one heartbeat line per probe. Override with
    BENCH_BACKEND_PROBES / BENCH_BACKEND_PROBE_TIMEOUT."""
    import os
    if attempts is None:
        attempts = int(os.environ.get("BENCH_BACKEND_PROBES", "60"))
    if probe_timeout is None:
        probe_timeout = float(
            os.environ.get("BENCH_BACKEND_PROBE_TIMEOUT", "110"))
    code = "import jax; jax.devices(); print('ok')"
    t_start = time.time()
    for i in range(attempts):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                timeout=probe_timeout, text=True,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                if i:
                    print(f"[bench] backend up after {time.time()-t_start:.0f}s"
                          f" ({i + 1} probes)", file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"[bench] device backend not answering "
              f"(probe {i + 1}/{attempts}, {time.time()-t_start:.0f}s "
              f"elapsed); retrying", file=sys.stderr, flush=True)
        # keep a steady cadence even when the probe fails fast
        time.sleep(max(0.0, probe_timeout + 10.0 - (time.time() - t0)))
    print(json.dumps({"metric": "slam_fps", "value": None, "unit": "fps",
                      "vs_baseline": None,
                      "error": "device backend unavailable"}))
    sys.exit(3)


def main():
    wait_for_backend()
    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    import numpy as np

    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 520
    warmup = 20

    t0 = time.perf_counter()
    cache = Path(__file__).parent / ".bench_cache" / f"frames_{n_frames}_s2_n01.npz"
    if cache.exists():
        z = np.load(cache)
        poses, rgbs = z["poses"], z["rgbs"]
        # keep depth as u16: compact_frame quantizes from it (the TUM
        # recording format; meters = u16/5000 after device decode)
        depths = z["depths_u16"]
        print(f"[bench] loaded {n_frames} cached frames in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    else:
        world = SyntheticWorld.create(seed=0, cam=TUM_DEFAULT)
        poses, rgbs, depths = render_sequence(
            world, n_frames, seed=2, depth_noise_sigma=0.01
        )
        poses = np.asarray(poses)
        print(f"[bench] rendered {n_frames} noisy frames in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        try:
            # parents=True + realpath: the cache dir may be a symlink into
            # the live repo (tools/r4_tpu_watch.sh snapshots); a DANGLING
            # symlink made mkdir throw FileExistsError and killed the whole
            # round-3 bench after the 14-minute render (r4 lesson: never
            # let cache bookkeeping abort the deliverable)
            Path(os.path.realpath(cache.parent)).mkdir(
                parents=True, exist_ok=True
            )
            # depth is already 1/5000-quantized by the noise model -> u16
            np.savez(cache, poses=poses, rgbs=rgbs,
                     depths_u16=np.clip(
                         depths * 5000.0 + 0.5, 0, 65535
                     ).astype(np.uint16))
        except OSError as e:
            print(f"[bench] frame cache unavailable ({e}); continuing",
                  file=sys.stderr)
    stamps = np.arange(n_frames) / 30.0

    # BENCH_OVERRIDES='{"tpu_wire_delta": true}' A/Bs a full bench config
    # without editing the file (the A/B queue uses it before a default flips)
    overrides = json.loads(os.environ.get("BENCH_OVERRIDES", "{}"))
    if overrides:
        print(f"[bench] param overrides: {overrides}", file=sys.stderr)

    def make_pipe(n_nodes=1024, n_edges=8192):
        params = ParameterServer(
            dict(
                max_keypoints=600,
                tpu_max_nodes=n_nodes,
                tpu_max_edges=n_edges,
                tpu_candidate_batch=8,
                ransac_iterations=200,
                optimizer_skip_step=10,
                keep_all_nodes=True,
                observability_threshold=0.5,
                pose_relative_to="inaffected",
                # reference benchmark protocol: EMM at effective stride 8
                # (test_settings.launch: cloud skip 8 x emm skip 1; here
                # cloud stride 2 x emm skip 4)
                emm_skip_step=4,
                # round-5 wire + dispatch verdicts (PARITY.md round-5
                # frontier + the interleaved Wilcoxon A/Bs, tools/ab_perf.py):
                # - luma: 2.7 bpp block-DCT restores the yc12-8 L1 band
                #   (0.0222-0.0285 draws vs 0.0291+ at 2.3 bpp; 3.1 bpp buys
                #   nothing) at 103 KB vs 307 KB
                # - depth: 10-bit sqrt is band-neutral at this luma point
                #   (L1 0.0261 / L4 0.0199 draw); r4's 6/10 regression was
                #   the 6-bit luma, not the depth
                # - the frame bound is the fixed per-dispatch client cost,
                #   NOT wire bytes (yc12-8 vs ydct27 fps-indistinguishable,
                #   p=0.18; fused 2-frame dispatch 139.6 vs 83.2 fps,
                #   p=0.0007) -> frames_per_step=4 divides it by 4
                tpu_ingest_format="ydct",
                tpu_dct_quality="2.7",
                tpu_gray_bits=8,
                tpu_depth_bits=10,
                tpu_frames_per_step=4,
                tpu_encode_ahead=True,
                **overrides,
            )
        )
        return SlamPipeline(TUM_DEFAULT, params)

    # Warm-up: compiles every program (step, optimize buckets); reruns hit
    # the persistent compile cache.
    pipe = make_pipe()
    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    pipe.manager.optimize(blocking=True)

    # ---- phase 1: N windows; median reported, best printed -----------------
    # 5 windows by default (BENCH_WINDOWS): both fps (~1.5x tunnel mood)
    # and protocol ATE (graph topology depends on async-optimize timing
    # relative to the frame stream) are per-window draws, so the official
    # median needs more than 3 samples to be a stable statistic.
    n_windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    window_fps = []
    pipes = []
    for window in range(n_windows):
        pipe = make_pipe()
        for i in range(warmup):
            pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                               gt_pose=poses[0] if i == 0 else None)
        float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))  # real fence
        t0 = time.perf_counter()
        pipe.params.set("skip_first_n_frames", warmup)
        pipe.run_arrays(rgbs, depths, stamps)
        float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
        dt = time.perf_counter() - t0
        fps = (n_frames - warmup) / dt
        print(f"[bench] window {window}: {fps:.2f} fps "
              f"({dt/(n_frames-warmup)*1e3:.1f} ms/frame)", file=sys.stderr)
        window_fps.append(fps)
        pipes.append(pipe)
    order = int(np.argsort(window_fps)[len(window_fps) // 2])
    median_fps = window_fps[order]
    best_fps = max(window_fps)
    pipe = pipes[order]  # evaluate the median window's graph
    print(f"[bench] median {median_fps:.2f} fps / best {best_fps:.2f} fps",
          file=sys.stderr)

    # ---- accuracy at scale: the full 5-level protocol ATE ------------------
    # (the reference's published-results protocol, openni_listener.cpp:431:
    # L0 online, L1 full optimization, L2-L4 prune@5/1/0.25 + re-optimize).
    # Evaluated on ALL THREE windows' graphs, reporting the per-level MEDIAN:
    # the async online optimize makes graph topology mildly timing-dependent
    # through the tunnel, so a single window's ATE is a noisy draw.
    import tempfile

    stats = pipe.manager.statistics()
    gt_xyz = poses[:, :3, 3]
    per_window = []
    for w, pw in enumerate(pipes):
        with tempfile.TemporaryDirectory() as td:
            rep = pw.evaluation_protocol(
                td, gt_stamps=list(stamps), gt_xyz=gt_xyz
            )
        per_window.append(rep.ate_rmse)
        w_str = "/".join(
            f"{rep.ate_rmse.get(l, float('nan')):.4f}" for l in range(5))
        print(f"[bench] window {w} protocol ATE (L0..L4): {w_str} m",
              file=sys.stderr)
    ate = {
        l: float(np.median([a.get(l, float("nan")) for a in per_window]))
        for l in range(5)
    }
    ate_str = "/".join(f"{ate.get(l, float('nan')):.4f}" for l in range(5))
    print(f"[bench] 5-level protocol ATE (L0..L4, median of {len(pipes)} windows): "
          f"{ate_str} m", file=sys.stderr)

    # phase 1 is done with every window but the median one (still needed
    # by the stage/roofline tables): free their HBM before the fr2-scale
    # and hard-sequence phases allocate their own graphs.
    _release_pipes(*[pw for pw in pipes if pw is not pipe])
    pipes = [pipe]

    # BENCH_PHASE1_ONLY=1: headline fps + protocol ATE only — the A/B
    # queue uses it to compare wire configs in ~3 min instead of ~12
    phase1_only = os.environ.get("BENCH_PHASE1_ONLY", "") == "1"

    # ---- phase 2: fr2-class scale (4 orbits -> ~2080 nodes, PCG final) -----
    fr2 = {}
    if not phase1_only:
        try:
            fr2 = _fr2_scale_phase(make_pipe, rgbs, depths, n_frames, warmup)
        except Exception as exc:  # diagnostic phase, never fatal
            print(f"[bench] fr2-scale phase failed: {exc}", file=sys.stderr)

    # ---- degenerate sequence at product scale (stderr) ---------------------
    # VERDICT r4 #4: hard-sequence behavior measured at VGA/bench scale,
    # not 160x120 miniature. spin360 = the fr1_360 analog (90 deg/s yaw,
    # ref ATE 0.051 m at 0.106 m/s, test/README:87).
    if not phase1_only:
        try:
            _hard_sequence_phase(make_pipe, warmup)
        except Exception as exc:  # diagnostic phase, never fatal
            print(f"[bench] hard-sequence phase failed: {exc}",
                  file=sys.stderr)

    # ---- per-stage budget (stderr) -----------------------------------------
    if not phase1_only:
        try:
            stage = _stage_table(pipe, rgbs, depths)
        except Exception as exc:  # the table is diagnostic, never fatal
            stage = None
            print(f"[bench] stage table failed: {exc}", file=sys.stderr)

        # ---- per-kernel device-time table (stderr) -------------------------
        try:
            _device_table(pipe, rgbs, depths, median_fps, stage=stage)
        except Exception as exc:
            print(f"[bench] device table failed: {exc}", file=sys.stderr)

        # ---- per-stage roofline: FLOPs/HBM-bytes vs device time (stderr) ---
        try:
            from rgbdslam_v2_tpu.utils.roofline import report as roofline_report

            roofline_report(pipe.manager, rgbs[-1], depths[-1])
        except Exception as exc:
            print(f"[bench] roofline failed: {exc}", file=sys.stderr)

    fr2_str = ""
    if fr2:
        fr2_str = (
            f"; fr2-scale {fr2['nodes']} nodes / {fr2['edges']} edges: "
            + " ".join(
                f"{f:.1f}fps@{n}n" for n, f in fr2["chunk_fps"]
            )
            + f", final full optimize (PCG) {fr2['opt_s']:.1f}s"
            + f"; ref fr2_desk 2866 nodes at ~10 fps, optimizer 41.8 s"
        )

    print(
        json.dumps(
            {
                "metric": (
                    "end-to-end SLAM throughput (median of " + str(n_windows) + " windows; best "
                    f"{best_fps:.1f}), 640x480 RGB-D, ORB-600, 8 candidates, "
                    "RANSAC-200, EMM on, depth noise 0.01z^2 + u16 "
                    "quantization, "
                    f"{stats['nodes']} nodes / {stats['active_edges']} edges "
                    f"({stats['loop_edges']} loop), 5-level protocol ATE RMSE "
                    f"L0..L4 {ate_str} m vs exact GT; "
                    f"ref fr1_desk={BASELINE_FPS} fps at 550 nodes, "
                    "ATE 0.019 m on real fr1_desk data" + fr2_str
                ),
                "value": round(median_fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(median_fps / BASELINE_FPS, 2),
            }
        )
    )


def _fr2_scale_phase(make_pipe, rgbs, depths, n_frames, warmup):
    """Process the orbit 4x into a 4096-node graph; fps per 520-frame chunk
    exposes O(nodes) growth; the final blocking optimize runs the >1024-node
    PCG path (reference scale: fr2_desk 2866 nodes / 37k edges,
    test/README:114)."""
    import numpy as np

    pipe = make_pipe(n_nodes=4096, n_edges=65536)
    try:
        return _fr2_scale_body(pipe, rgbs, depths, n_frames, warmup)
    finally:
        _release_pipes(pipe)


def _fr2_scale_body(pipe, rgbs, depths, n_frames, warmup):
    import numpy as np

    pipe.params.set("optimizer_skip_step", 10)
    # warm-up: the 4096-node buffer shapes compile fresh programs; keep
    # that out of chunk 0's timing
    frame_idx = 0
    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], frame_idx / 30.0)
        frame_idx += 1
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    n_rounds = 4
    chunk_fps = []
    for r in range(n_rounds):
        start = warmup if r == 0 else 0
        t0 = time.perf_counter()
        for i in range(start, n_frames):
            ts = frame_idx / 30.0
            pipe.process_frame(rgbs[i], depths[i], ts)
            frame_idx += 1
        float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
        dt = time.perf_counter() - t0
        fps = (n_frames - start) / dt
        nodes_now = pipe.manager.n_nodes
        chunk_fps.append((nodes_now, fps))
        print(f"[bench] fr2-scale chunk {r}: {fps:.2f} fps at "
              f"{nodes_now} nodes", file=sys.stderr)
    t0 = time.perf_counter()
    pipe.params.set("pose_relative_to", "first")
    chi2 = pipe.manager.optimize(blocking=True)
    opt_s = time.perf_counter() - t0
    stats = pipe.manager.statistics()
    n_it = getattr(pipe.manager, "last_optimize_iters", -1)
    print(f"[bench] fr2-scale final optimize ({stats['nodes']} nodes, "
          f"{stats['active_edges']} edges, PCG): {opt_s:.1f}s chi2={chi2:.1f} "
          f"({n_it} LM iterations; wall includes the blocking tunnel pull — "
          "cross-session draws 3.3-122s at identical iteration bounds are "
          "tunnel mood, see WIRE.md)",
          file=sys.stderr)
    return dict(nodes=stats["nodes"], edges=stats["active_edges"],
                chunk_fps=chunk_fps, opt_s=opt_s)


def _hard_sequence_phase(make_pipe, warmup):
    """spin360 at full VGA scale: 260 frames of 3 deg/frame yaw (90 deg/s at
    30 Hz — the fr1_360 regime; reference ATE 0.051 m, test/README:87).
    Reuses phase 1's compiled step programs (same shapes/params), reports
    fps + 5-level protocol ATE + robustness counters to stderr."""
    import tempfile

    import numpy as np

    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.graph.manager import EDGE_CONST_POSITION
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence

    n = 260
    t0 = time.perf_counter()
    cache = Path(__file__).parent / ".bench_cache" / f"spin360_{n}_n01.npz"
    if cache.exists():
        z = np.load(cache)
        poses, rgbs, depths = z["poses"], z["rgbs"], z["depths_u16"]
    else:
        world = SyntheticWorld.create(seed=0, cam=TUM_DEFAULT)
        traj = world.spin_trajectory(n, seed=2, deg_per_frame=3.0)
        poses, rgbs, depths = render_sequence(
            world, n, seed=2, depth_noise_sigma=0.01, trajectory=traj)
        poses = np.asarray(poses)
        depths = np.clip(depths * 5000.0 + 0.5, 0, 65535).astype(np.uint16)
        try:
            Path(os.path.realpath(cache.parent)).mkdir(
                parents=True, exist_ok=True)
            np.savez(cache, poses=poses, rgbs=rgbs, depths_u16=depths)
        except OSError as e:
            print(f"[bench] spin360 cache unavailable ({e}); continuing",
                  file=sys.stderr)
    print(f"[bench] spin360 frames ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    stamps = np.arange(n) / 30.0
    pipe = make_pipe()
    try:
        _hard_sequence_body(pipe, poses, rgbs, depths, stamps, n, warmup)
    finally:
        _release_pipes(pipe)


def _hard_sequence_body(pipe, poses, rgbs, depths, stamps, n, warmup):
    import tempfile

    import numpy as np

    from rgbdslam_v2_tpu.graph.manager import EDGE_CONST_POSITION

    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    t0 = time.perf_counter()
    pipe.params.set("skip_first_n_frames", warmup)
    pipe.run_arrays(rgbs, depths, stamps)
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    fps = (n - warmup) / (time.perf_counter() - t0)
    with tempfile.TemporaryDirectory() as td:
        rep = pipe.evaluation_protocol(
            td, gt_stamps=list(stamps), gt_xyz=poses[:, :3, 3])
    ate_str = "/".join(
        f"{rep.ate_rmse.get(l, float('nan')):.4f}" for l in range(5))
    m = pipe.manager
    const_pos = sum(1 for t in m.edge_types if t == EDGE_CONST_POSITION)
    st = m.statistics()
    print(
        f"[bench] spin360 VGA (90 deg/s yaw, fr1_360 regime): {fps:.1f} fps, "
        f"protocol ATE L0..L4 {ate_str} m, {st['nodes']} nodes / "
        f"{st['active_edges']} edges, {const_pos} const-pos, "
        f"{m.n_icp_rescues} GICP rescues; ref fr1_360 ATE 0.051 m",
        file=sys.stderr,
    )


def _stage_table(pipe, rgbs, depths):
    """ms-per-stage budget, measured with real value-pull fences (stderr)."""
    import numpy as np
    import jax

    from rgbdslam_v2_tpu.graph.manager import compact_frame

    m = pipe.manager
    t0 = time.perf_counter()
    for _ in range(10):
        cpt_np = compact_frame(rgbs[-1], depths[-1], m.emm_stride,
                               fmt=m.ingest_fmt, gray_bits=m.gray_bits,
                               depth_bits=m.depth_bits)
    t_compact = (time.perf_counter() - t0) / 10 * 1e3

    def fence():
        float(np.asarray(m.graph.poses[0, 0, 0]))

    fence()
    t0 = time.perf_counter()
    for _ in range(10):
        cpt = jax.device_put(cpt_np)
    jax.block_until_ready(cpt)
    h2d = (time.perf_counter() - t0) / 10 * 1e3

    nb = cpt_np.nbytes
    t0 = time.perf_counter()
    n = 10
    for k in range(n):
        m._add_frame_device(cpt, 1e6 + 0.03 * k, m.n_nodes, m.n_nodes - 1)
    fence()
    step = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    m.optimize(blocking=False)
    opt_disp = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    fence()
    opt_wall = (time.perf_counter() - t0) * 1e3

    print(
        f"[bench] stage budget: host compact {t_compact:.1f} ms, "
        f"h2d {h2d:.1f} ms ({nb/1e6:.2f} MB {m.ingest_fmt}), "
        f"slam step {step:.1f} ms (compute+commit, fence incl), "
        f"online optimize dispatch {opt_disp:.1f} ms / complete {opt_wall:.1f} ms",
        file=sys.stderr,
    )
    return {"compact": t_compact, "wire": h2d, "step_resident": step,
            "bytes": nb}


def _device_table(pipe, rgbs, depths, median_fps, n_steps=10, stage=None):
    """jax.profiler trace of n_steps steady-state frames -> per-op device
    times + a device-busy vs frame-budget split (the round-3 requirement:
    device-side evidence, not host-fenced wall time)."""
    import collections
    import glob
    import gzip
    import tempfile

    import jax
    import numpy as np

    from rgbdslam_v2_tpu.graph.manager import compact_frame

    m = pipe.manager
    cpt = compact_frame(rgbs[-1], depths[-1], m.emm_stride, fmt=m.ingest_fmt,
                        gray_bits=m.gray_bits, depth_bits=m.depth_bits)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for k in range(n_steps):
                m._add_frame_device(cpt, 2e6 + 0.03 * k, m.n_nodes,
                                    m.n_nodes - 1)
            float(np.asarray(m.graph.poses[0, 0, 0]))
        files = sorted(glob.glob(f"{td}/**/*.trace.json.gz", recursive=True))
        if not files:
            print("[bench] no profiler trace produced", file=sys.stderr)
            return
        with gzip.open(files[-1], "rt") as f:
            trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    dev_pids = {pid for pid, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    total_us = 0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e.get("name", "?")] += e.get("dur", 0)
            if e.get("name", "").startswith("jit_"):
                total_us += e.get("dur", 0)
    frame_ms = 1e3 / max(median_fps, 1e-6)
    busy_ms = total_us / n_steps / 1e3
    print(f"[bench] device busy {busy_ms:.2f} ms/frame of "
          f"{frame_ms:.2f} ms budget ({100*busy_ms/frame_ms:.0f}% — "
          "remainder is the tunnel wire + host dispatch; ~0.46 MB/frame "
          "ingest on a ~25-45 MB/s link)", file=sys.stderr)
    if stage:
        # budget reconciliation (VERDICT r4 #1: the stage arithmetic must
        # explain the frame time). Model: frame = wire(bytes) + device busy
        # + per-dispatch host/client overhead (+ host compact when not
        # overlapped by tpu_encode_ahead). step_resident times the dispatch
        # with the wire ALREADY device-resident, so its excess over device
        # busy is the pure dispatch/bookkeeping overhead per frame.
        disp = max(stage["step_resident"] - busy_ms, 0.0)
        compact = 0.0 if pipe.params["tpu_encode_ahead"] else stage["compact"]
        explained = stage["wire"] + busy_ms + disp + compact
        print(
            f"[bench] budget reconciliation: frame {frame_ms:.2f} ms vs "
            f"wire {stage['wire']:.2f} + busy {busy_ms:.2f} + dispatch "
            f"{disp:.2f} + compact {compact:.2f} = {explained:.2f} ms "
            f"({100 * explained / frame_ms:.0f}% explained)",
            file=sys.stderr,
        )
    print("[bench] top device ops (ms/frame):", file=sys.stderr)
    for name, us in agg.most_common(12):
        print(f"[bench]   {us/n_steps/1e3:7.3f}  {name[:80]}", file=sys.stderr)


if __name__ == "__main__":
    main()
