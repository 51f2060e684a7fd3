#!/usr/bin/env python
"""Characterize the slow-put-after-device-step effect on the tunnel.

mgr-full reproduces 38 ms puts with fresh-process controls at 0.5 ms and
identical-footprint mgr-fresh at 0.5 ms: residency is innocent, *running the
step program* is implicated. This probe measures, in one process after 20
warm frames + full fence:
  - put latency vs size (8 B .. 3.5 MB): latency vs bandwidth collapse
  - device_get (d2h) latency for small arrays
  - tiny jitted dispatch round-trip
  - decay: puts at t+0s, +1s, +5s after the last step
  - del manager + gc: does the effect die with the state?
"""
import gc
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

SIZES = [8, 4096, 65536, 432_000, 3_500_000]
bufs = {n: np.random.randint(0, 255, (n,), np.uint8) for n in SIZES}


def put_ms(n):
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(bufs[n]))
    return (time.perf_counter() - t0) * 1e3


def profile(tag):
    for n in SIZES:
        ts = sorted(put_ms(n) for _ in range(5))
        mbs = n / 1e6 / (ts[2] / 1e3)
        print(f"[{tag}] put {n:>9d} B: med {ts[2]:7.2f} ms  min {ts[0]:7.2f} "
              f"max {ts[-1]:7.2f}  ({mbs:8.1f} MB/s)", flush=True)


profile("fresh")

z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
rgbs, depths = z["rgbs"][:40], z["depths_u16"][:40]
del z
params = ParameterServer(dict(
    max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
    tpu_candidate_batch=8, ransac_iterations=200,
    optimizer_skip_step=10_000, keep_all_nodes=True,
    observability_threshold=0.5, pose_relative_to="inaffected",
    emm_skip_step=4, tpu_gray_bits=8, tpu_depth_bits=12,
))
m = GraphManager(TUM_DEFAULT, params)
for i in range(20):
    cpt = compact_frame(rgbs[i], depths[i], m.emm_stride,
                        fmt=m.ingest_fmt, gray_bits=m.gray_bits,
                        depth_bits=m.depth_bits)
    m.add_frame(None, None, i / 30.0, compact=cpt)
m._drain_pending(keep_newest=0)
jax.block_until_ready(list(m.store) + list(m.graph))
print("[mech] 20 frames, store+graph fenced", flush=True)

profile("mgr+0s")

# d2h latency
small_dev = m.graph.poses[:1]
for _ in range(2):
    np.asarray(small_dev)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(m.graph.poses[:1])
    ts.append((time.perf_counter() - t0) * 1e3)
print(f"[mech] d2h small: med {sorted(ts)[2]:.2f} ms", flush=True)

# tiny dispatch round-trip
f = jax.jit(lambda x: x + 1)
xdev = jax.device_put(np.zeros(8, np.float32))
jax.block_until_ready(f(xdev))
ts = sorted((lambda: (lambda t0: (jax.block_until_ready(f(xdev)),
            (time.perf_counter() - t0) * 1e3)[1])(time.perf_counter()))()
            for _ in range(10))
print(f"[mech] tiny dispatch: med {ts[5]:.2f} ms", flush=True)

time.sleep(1.0)
profile("mgr+1s")
time.sleep(5.0)
profile("mgr+6s")

del m
gc.collect()
time.sleep(0.5)
profile("deleted")
