#!/usr/bin/env python
"""Steady-state frame budget in the REAL (eager) tunnel regime.

WIRE.md: the tunnel is ~28 ms RTT / ~27-38 MB/s once flipped eager, so the
per-frame cost model is  wire(bytes) + host work + sync stalls. This probe
measures, in ONE eager-mode process (flip forced up front):
  - in-process pipelined put rate at the current wire size (the wire floor)
  - steady-state ms/frame for config variants passed as JSON overrides
  - the implied overhead = frame - wire_floor - host_encode
Usage: python tools/frame_budget.py '{"tpu_drain_interval": 32}' ...
(no args: default config only)
"""
import json
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

z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
rgbs, depths = z["rgbs"], z["depths_u16"]
del z

# force eager mode NOW so every measurement sees the real link
jax.block_until_ready(jax.device_put(np.zeros(8, np.uint8)))
np.asarray(jax.device_put(np.zeros(8, np.uint8)))

variants = [json.loads(a) for a in sys.argv[1:]] or [{}]

for over in variants:
    base = dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
        keep_all_nodes=True, observability_threshold=0.5,
        pose_relative_to="inaffected", emm_skip_step=4,
    )
    base.update(over)
    params = ParameterServer(base)
    m = GraphManager(TUM_DEFAULT, params)
    enc = lambda i: compact_frame(  # noqa: E731
        rgbs[i], depths[i], m.emm_stride, fmt=m.ingest_fmt,
        gray_bits=m.gray_bits, depth_bits=m.depth_bits)
    # warmup (compiles)
    for i in range(20):
        m.add_frame(None, None, i / 30.0, compact=enc(i))
    float(np.asarray(m.graph.poses[0, 0, 0]))

    # host encode cost
    t0 = time.perf_counter()
    for _ in range(10):
        cpt = enc(20)
    t_enc = (time.perf_counter() - t0) / 10 * 1e3
    nb = cpt.nbytes

    # wire floor at this size: 20 pipelined puts
    jax.block_until_ready(jax.device_put(cpt))
    t0 = time.perf_counter()
    rs = [jax.device_put(cpt) for _ in range(20)]
    jax.block_until_ready(rs)
    del rs
    t_wire = (time.perf_counter() - t0) / 20 * 1e3

    # steady state: 200 frames, encode inline (the product loop shape)
    n0, n1 = 20, min(220, len(rgbs))
    float(np.asarray(m.graph.poses[0, 0, 0]))
    t0 = time.perf_counter()
    for i in range(n0, n1):
        m.add_frame(None, None, i / 30.0, compact=enc(i))
    float(np.asarray(m.graph.poses[0, 0, 0]))
    t_frame = (time.perf_counter() - t0) / (n1 - n0) * 1e3

    print(f"[budget] {json.dumps(over)}: wire {nb/1e3:.0f} KB "
          f"floor {t_wire:.2f} ms ({nb/1e6/t_wire*1e3:.1f} MB/s), "
          f"encode {t_enc:.2f} ms, frame {t_frame:.2f} ms "
          f"({1e3/t_frame:.1f} fps), overhead "
          f"{t_frame - t_wire:.2f} ms", flush=True)
