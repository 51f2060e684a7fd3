#!/usr/bin/env python
"""Decompose the steady-state ms/frame into wire vs device compute.

Round-2 numbers were contradictory (queued slam_step w/ device-resident
input ~23 ms; full loop incl. 1.15 MB/frame h2d ~22 ms; "blocking" h2d
~34 ms) because block_until_ready is unreliable through the axon tunnel
and scalar-pull fences cost ~30 ms each. This tool measures everything
the tunnel-safe way — queue N identical dispatches, ONE value-pull fence,
amortize — and answers:

  1. wire: per-dispatch fixed overhead + payload bandwidth (dispatch-arg
     path, the one the pipeline uses — NOT device_put)
  2. device: slam_step with a device-resident constant input (zero wire)
  3. sub-stages: extract / compare / commit, each queued+amortized
  4. steady loop: the real pipeline (wire + compute serialization)

Run ALONE (single-jax-process rule). Usage: python tools/profile_device.py
[--frames N] [--trace]  (--trace additionally captures a jax.profiler trace
and prints a per-op device-time table if the plugin supports it).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    """Tunnel-reliable sync: pull one value (~30 ms round trip)."""
    return float(np.asarray(x).reshape(-1)[0])


def amortized_ms(dispatch, n=50, warmup=5):
    """Queue n dispatches of `dispatch()` (must return a device array),
    fence once. Returns ms per dispatch with the ~30 ms RT amortized."""
    for _ in range(warmup):
        out = dispatch()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = dispatch()
    fence(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/jax_trace")
    args = ap.parse_args()

    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline
    from rgbdslam_v2_tpu.graph.manager import compact_frame, _prepare_and_extract
    from rgbdslam_v2_tpu.graph.compare import compare_to_candidates

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr)

    n_frames = args.frames
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "frames_520_s2_n01.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        poses, rgbs, depths = z["poses"][:n_frames], z["rgbs"][:n_frames], \
            z["depths_u16"][:n_frames]
        print(f"[prof] loaded {len(rgbs)} cached frames", file=sys.stderr)
    else:
        world = SyntheticWorld.create(seed=0, cam=TUM_DEFAULT)
        poses, rgbs, depths = render_sequence(world, n_frames, seed=2,
                                              depth_noise_sigma=0.01)
    stamps = np.arange(len(rgbs)) / 30.0

    params = ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
        keep_all_nodes=True, observability_threshold=0.5,
        pose_relative_to="inaffected", emm_skip_step=4,
    ))
    pipe = SlamPipeline(TUM_DEFAULT, params)
    m = pipe.manager
    p = m.params
    warmup = 20
    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    m.optimize(blocking=True)
    fence(m.graph.poses[0, 0, 0])

    rows = []

    # ---- 0. round-trip latency of the fence itself ------------------------
    t0 = time.perf_counter()
    for _ in range(5):
        fence(m.graph.poses[0, 0, 0])
    rt = (time.perf_counter() - t0) / 5 * 1e3
    rows.append(("scalar-pull round trip", rt))

    # ---- 1. wire: dispatch-arg payload cost -------------------------------
    # A trivial jitted sum over a numpy arg of size S: device work ~0, so the
    # amortized per-dispatch time = fixed dispatch overhead + S / link_BW.
    sink = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    for mb in (0.0, 0.25, 1.15):
        buf = np.random.randint(0, 255, (max(64, int(mb * 1e6)),), np.uint8)
        ms = amortized_ms(lambda b=buf: sink(b), n=40)
        rows.append((f"dispatch w/ {mb:.2f} MB numpy arg", ms))

    # ---- 2. device compute: slam_step with device-resident input ---------
    cpt_np = compact_frame(rgbs[-1], depths[-1], m.emm_stride)
    cpt_dev = jax.device_put(cpt_np)
    fence(cpt_dev[0])

    def step_resident():
        m._add_frame_device(cpt_dev, 1e6 + 0.03 * m.n_nodes, m.n_nodes,
                            m.n_nodes - 1)
        return m.graph.poses
    ms_step_dev = amortized_ms(step_resident, n=50)
    rows.append(("slam_step, device-resident input", ms_step_dev))

    # rebuild (capacity was consumed)
    pipe = SlamPipeline(TUM_DEFAULT, params)
    m = pipe.manager
    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    m.optimize(blocking=True)
    fence(m.graph.poses[0, 0, 0])

    # ---- 3. slam_step with per-dispatch numpy payload (wire + compute) ----
    def step_wire():
        m._add_frame_device(cpt_np, 1e6 + 0.03 * m.n_nodes, m.n_nodes,
                            m.n_nodes - 1)
        return m.graph.poses
    ms_step_wire = amortized_ms(step_wire, n=50)
    rows.append(("slam_step, numpy payload arg", ms_step_wire))
    rows.append(("  -> implied wire cost/frame", ms_step_wire - ms_step_dev))

    # ---- 4. sub-stages ----------------------------------------------------
    extract = jax.jit(lambda c: _prepare_and_extract(
        m.extractor, m.cam, m.emm_stride, p["minimum_depth"],
        p["maximum_depth"], p["use_feature_min_depth"], c))
    ms_extract = amortized_ms(lambda: extract(cpt_dev)[0].uv, n=50)
    rows.append(("  extract (prepare+orb)", ms_extract))

    kp, depth_small, _ = extract(cpt_dev)
    cand_idx = np.asarray([m.n_nodes - 1 - i for i in range(m.cand_batch)],
                          np.int32)
    key = jax.random.PRNGKey(0)
    cmp_fn = jax.jit(lambda kp, ds, store, ci, key: compare_to_candidates(
        kp, ds, store, ci, key, m.cam_small, cam_fx=m.cam.fx, cam_fy=m.cam.fy,
        max_matches=p["max_matches"], ratio=p["nn_distance_ratio"],
        n_hypotheses=p["ransac_iterations"],
        max_mahal_sq=p["max_dist_for_inliers"] ** 2,
        min_inliers=p["min_matches"], emm_skip=p["emm_skip_step"],
        sigma_depth=p["sigma_depth"], sample_size=p["sample_candidates"],
        refine_iterations=p["refine_iterations"]))
    ms_cmp = amortized_ms(
        lambda: cmp_fn(kp, depth_small, m.store, cand_idx, key).transform,
        n=50)
    rows.append(("  compare B=8", ms_cmp))
    rows.append(("  residual (commit+decide+unacct)",
                 ms_step_dev - ms_extract - ms_cmp))

    # ---- 5. steady-state loop (the real pipeline) -------------------------
    pipe = SlamPipeline(TUM_DEFAULT, params)
    m = pipe.manager
    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    fence(m.graph.poses[0, 0, 0])
    t0 = time.perf_counter()
    pipe.params.set("skip_first_n_frames", warmup)
    pipe.run_arrays(rgbs, depths, stamps)
    fence(m.graph.poses[0, 0, 0])
    ms_loop = (time.perf_counter() - t0) / (len(rgbs) - warmup) * 1e3
    rows.append(("steady loop (wire+compute)", ms_loop))

    print(f"\n{'stage':<38}{'ms':>9}")
    for name, v in rows:
        print(f"{name:<38}{v:>9.2f}")

    # ---- 6. optional jax.profiler trace -----------------------------------
    if args.trace:
        try:
            import glob
            import gzip
            import json
            import collections

            with jax.profiler.trace(args.trace_dir):
                for _ in range(10):
                    out = step_wire()
                fence(out[0, 0, 0])
            files = sorted(glob.glob(
                os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                recursive=True))
            if not files:
                print("[prof] no trace.json.gz produced", file=sys.stderr)
                return
            with gzip.open(files[-1], "rt") as f:
                trace = json.load(f)
            events = trace.get("traceEvents", [])
            pid_names = {e["pid"]: e["args"].get("name", "")
                         for e in events
                         if e.get("ph") == "M" and e.get("name") == "process_name"
                         and "args" in e}
            dev_pids = {pid for pid, n in pid_names.items()
                        if "TPU" in n or "Axon" in n or "/device" in n.lower()}
            agg = collections.Counter()
            for e in events:
                if e.get("ph") == "X" and e.get("pid") in dev_pids:
                    agg[e.get("name", "?")] += e.get("dur", 0)
            print("\nper-op device time over 10 steps (top 25):")
            for name, us in agg.most_common(25):
                print(f"  {us/10/1000.0:8.3f} ms  {name[:90]}")
        except Exception as exc:
            print(f"[prof] trace failed: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
