#!/usr/bin/env python
"""Is the wire slow only when the GraphManager is resident/active?

Interleaves raw device_put timings INSIDE the steady-state frame loop so
tunnel drift and manager-state effects can be told apart (the r4 overlap
probe measured 13 ms/put with a manager; the raw sweep says 0.5 ms).
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.graph.manager import GraphManager, compact_frame

t0 = time.perf_counter()
z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
rgbs, depths = z["rgbs"], z["depths_u16"]
print(f"[probe] npz load {time.perf_counter()-t0:.1f}s", flush=True)

params = ParameterServer(dict(
    max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
    tpu_candidate_batch=8, ransac_iterations=200,
    optimizer_skip_step=10_000, keep_all_nodes=True,
    observability_threshold=0.5, pose_relative_to="inaffected",
    emm_skip_step=4, tpu_gray_bits=8, tpu_depth_bits=12,
))
m = GraphManager(TUM_DEFAULT, params)
probe_buf = np.random.randint(0, 255, (432000,), np.uint8)

t0 = time.perf_counter()
for i in range(20):
    cpt = compact_frame(rgbs[i], depths[i], m.emm_stride,
                        fmt=m.ingest_fmt, gray_bits=m.gray_bits,
                        depth_bits=m.depth_bits)
    m.add_frame(None, None, i / 30.0, compact=cpt)
float(np.asarray(m.graph.poses[0, 0, 0]))
print(f"[probe] 20 warm frames {time.perf_counter()-t0:.1f}s", flush=True)


def raw_put():
    t0 = time.perf_counter()
    r = jax.device_put(probe_buf)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) * 1e3

raw_put()
print(f"[probe] raw put after warm (manager idle): "
      f"{np.median([raw_put() for _ in range(5)]):.2f} ms", flush=True)

packs = [compact_frame(rgbs[i], depths[i], m.emm_stride, fmt=m.ingest_fmt,
                       gray_bits=m.gray_bits, depth_bits=m.depth_bits)
         for i in range(20, 140)]

# steady-state loop with raw puts interleaved every 10 frames
frame_ms, put_ms = [], []
float(np.asarray(m.graph.poses[0, 0, 0]))
for k, cpt in enumerate(packs):
    t0 = time.perf_counter()
    m.add_frame(None, None, (20 + k) / 30.0, compact=cpt)
    frame_ms.append((time.perf_counter() - t0) * 1e3)
    if k % 10 == 9:
        put_ms.append(raw_put())
float(np.asarray(m.graph.poses[0, 0, 0]))

frame_ms = np.array(frame_ms)
print(f"[probe] per-frame dispatch wall: med {np.median(frame_ms):.2f} ms "
      f"p10 {np.percentile(frame_ms,10):.2f} p90 {np.percentile(frame_ms,90):.2f}",
      flush=True)
print(f"[probe] interleaved raw puts: med {np.median(put_ms):.2f} ms "
      f"min {min(put_ms):.2f} max {max(put_ms):.2f}", flush=True)

# full-loop throughput with a final fence
float(np.asarray(m.graph.poses[0, 0, 0]))
t0 = time.perf_counter()
for k, cpt in enumerate(packs):
    m.add_frame(None, None, (140 + k) / 30.0, compact=cpt)
float(np.asarray(m.graph.poses[0, 0, 0]))
ms = (time.perf_counter() - t0) / len(packs) * 1e3
print(f"[probe] steady-state (no interleave): {ms:.2f} ms/frame "
      f"({1e3/ms:.1f} fps)", flush=True)
