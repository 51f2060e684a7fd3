#!/usr/bin/env python
"""Bisect WHAT makes h2d puts slow when a GraphManager is resident.

Conditions (pass one as argv[1]):
  none        fresh process, nothing else          (control: ~0.5 ms/put)
  npz         host loads the 800 MB frame cache    (host RAM pressure)
  devmem      1 GB of dummy device arrays          (device HBM pressure)
  devmem3     3 GB of dummy device arrays
  mgr-fresh   manager constructed, no frames       (buffers allocated)
  mgr-small   manager n_cap=64, 20 frames          (donation churn, small)
  mgr-full    manager n_cap=1024, 20 frames        (the failing case)
  mgr-nocolor store_pointclouds=False n_cap=1024, 20 frames
Each prints the median of 10 timed 432 KB puts.
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import numpy as np

cond = sys.argv[1] if len(sys.argv) > 1 else "none"
buf = np.random.randint(0, 255, (432000,), np.uint8)
keep = []

if cond == "npz":
    z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
    keep.append((z["rgbs"], z["depths_u16"]))
elif cond in ("devmem", "devmem3"):
    gb = 3 if cond == "devmem3" else 1
    for _ in range(gb * 4):
        keep.append(jax.device_put(np.zeros((256, 1024, 1024), np.uint8)))
    jax.block_until_ready(keep)
elif cond.startswith("mgr"):
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.graph.manager import GraphManager, compact_frame

    n_cap = 64 if cond == "mgr-small" else 1024
    extra = {}
    if cond == "mgr-nocolor":
        extra["store_pointclouds"] = False
    params = ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=n_cap, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200,
        optimizer_skip_step=10_000, keep_all_nodes=True,
        observability_threshold=0.5, pose_relative_to="inaffected",
        emm_skip_step=4, tpu_gray_bits=8, tpu_depth_bits=12, **extra,
    ))
    m = GraphManager(TUM_DEFAULT, params)
    keep.append(m)
    if cond != "mgr-fresh":
        z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
        rgbs, depths = z["rgbs"][:20], z["depths_u16"][:20]
        del z
        for i in range(20):
            cpt = compact_frame(rgbs[i], depths[i], m.emm_stride,
                                fmt=m.ingest_fmt, gray_bits=m.gray_bits,
                                depth_bits=m.depth_bits)
            m.add_frame(None, None, i / 30.0, compact=cpt)
        float(np.asarray(m.graph.poses[0, 0, 0]))


def one_put():
    t0 = time.perf_counter()
    r = jax.device_put(buf)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) * 1e3


one_put()
ts = sorted(one_put() for _ in range(10))
print(f"[bisect] {cond}: put med {ts[5]:.2f} ms  min {ts[0]:.2f}  "
      f"max {ts[-1]:.2f}", flush=True)
