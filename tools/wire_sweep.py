#!/usr/bin/env python
"""Bytes x dispatch sweep of the tunnel wire, interleaved to control for
time-varying contention (VERDICT r4 weak #2: the wire analysis rested on
single-window probes; this commits the curve).

Measures, in ONE process, round-robin so tunnel drift hits all cells
equally:
  - raw device_put latency for sizes 0.05..1.6 MB (fresh numpy buffers)
  - the SAME put with a live GraphManager resident (state-dependence test)
  - N frames packed into ONE put (1/2/4/8) -> per-frame amortization
Each cell is sampled R times spread across the whole run; prints
median/min/max per cell so drift is visible.
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import numpy as np

SIZES_MB = [0.05, 0.1, 0.2, 0.432, 0.8, 1.6]
ROUNDS = 7

bufs = {mb: np.random.randint(0, 255, (int(mb * 1e6),), np.uint8)
        for mb in SIZES_MB}

mgr = None
if "--with-manager" in sys.argv:
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.graph.manager import GraphManager, compact_frame

    z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
    rgbs, depths = z["rgbs"], z["depths_u16"]
    params = ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200,
        optimizer_skip_step=10_000, keep_all_nodes=True,
        observability_threshold=0.5, pose_relative_to="inaffected",
        emm_skip_step=4, tpu_gray_bits=8, tpu_depth_bits=12,
    ))
    mgr = GraphManager(TUM_DEFAULT, params)
    for i in range(20):
        cpt = compact_frame(rgbs[i], depths[i], mgr.emm_stride,
                            fmt=mgr.ingest_fmt, gray_bits=mgr.gray_bits,
                            depth_bits=mgr.depth_bits)
        mgr.add_frame(None, None, i / 30.0, compact=cpt)
    float(np.asarray(mgr.graph.poses[0, 0, 0]))
    print("[sweep] manager resident (20 warm frames)", flush=True)


def one_put(buf):
    t0 = time.perf_counter()
    r = jax.device_put(buf)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) * 1e3


# warm each size once (allocator path)
for mb in SIZES_MB:
    one_put(bufs[mb])

samples = {mb: [] for mb in SIZES_MB}
t_run0 = time.perf_counter()
for r in range(ROUNDS):
    for mb in SIZES_MB:
        samples[mb].append(one_put(bufs[mb]))
print(f"[sweep] wall {time.perf_counter()-t_run0:.1f}s for "
      f"{ROUNDS}x{len(SIZES_MB)} puts", flush=True)

print("size_MB  med_ms  min_ms  max_ms  med_MB/s")
fixed_bw = []
for mb in SIZES_MB:
    s = sorted(samples[mb])
    med = s[len(s) // 2]
    print(f"{mb:7.3f} {med:7.2f} {s[0]:7.2f} {s[-1]:7.2f} {mb/med*1e3:9.1f}")
    fixed_bw.append((mb, med))

# least squares: t = a + b * MB  -> a = per-put latency, 1/b = bandwidth
A = np.array([[1.0, mb] for mb, _ in fixed_bw])
y = np.array([t for _, t in fixed_bw])
coef, *_ = np.linalg.lstsq(A, y, rcond=None)
print(f"[sweep] fit: t_ms = {coef[0]:.2f} + {coef[1]:.2f}*MB "
      f"(latency {coef[0]:.2f} ms, bw {1e3/max(coef[1],1e-9):.0f} MB/s)")

# ---- N frames per put: same bytes, fewer transfers -------------------------
frame = np.random.randint(0, 255, (432000,), np.uint8)
print("\nframes_per_put  med_ms_total  med_ms_per_frame")
for n in (1, 2, 4, 8):
    big = np.tile(frame, n)
    ts = []
    one_put(big)
    for _ in range(ROUNDS):
        ts.append(one_put(big))
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{n:14d} {med:13.2f} {med/n:16.2f}")

# ---- dispatch-only cost: trivially small jitted program --------------------
@jax.jit
def f(x):
    return x + 1

xdev = jax.device_put(np.zeros(8, np.float32))
jax.block_until_ready(f(xdev))
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    jax.block_until_ready(f(xdev))
    ts.append((time.perf_counter() - t0) * 1e3)
ts.sort()
print(f"\n[sweep] tiny jit dispatch round-trip: med {ts[len(ts)//2]:.2f} ms "
      f"min {ts[0]:.2f} max {ts[-1]:.2f}")

# queued (non-blocking) dispatch enqueue cost
t0 = time.perf_counter()
rs = [f(xdev) for _ in range(50)]
enq = (time.perf_counter() - t0) / 50 * 1e3
jax.block_until_ready(rs)
tot = (time.perf_counter() - t0) / 50 * 1e3
print(f"[sweep] 50 queued tiny dispatches: enqueue {enq:.3f} ms/disp, "
      f"drain {tot:.2f} ms/disp")

if mgr is not None:
    # steady-state frame loop again, for the same session's context
    packs = [compact_frame(rgbs[i], depths[i], mgr.emm_stride,
                           fmt=mgr.ingest_fmt, gray_bits=mgr.gray_bits,
                           depth_bits=mgr.depth_bits)
             for i in range(20, 80)]
    float(np.asarray(mgr.graph.poses[0, 0, 0]))
    t0 = time.perf_counter()
    for k, cpt in enumerate(packs):
        mgr.add_frame(None, None, (20 + k) / 30.0, compact=cpt)
    float(np.asarray(mgr.graph.poses[0, 0, 0]))
    ms = (time.perf_counter() - t0) / len(packs) * 1e3
    print(f"\n[sweep] manager steady-state: {ms:.2f} ms/frame "
          f"({1e3/ms:.1f} fps)")
