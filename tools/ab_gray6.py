#!/usr/bin/env python
"""A/B: tpu_gray_bits on the real chip — fps + 5-level protocol ATE.

Decides whether a lower-bit luma wire format keeps the protocol ATE at
the reference-beating level. Pass the bit list as argv (default '6 5';
round-2 verdict: 6 beat 8 at equal ATE). Run ALONE."""
import sys
import tempfile
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.pipeline import SlamPipeline

z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
poses, rgbs, depths = z["poses"], z["rgbs"], z["depths_u16"]
n = len(rgbs)
stamps = np.arange(n) / 30.0
warmup = 20

for bits in ([int(a) for a in sys.argv[1:]] or (6, 5)):
    params = ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
        keep_all_nodes=True, observability_threshold=0.5,
        pose_relative_to="inaffected", emm_skip_step=4,
        tpu_gray_bits=bits,
    ))
    pipe = SlamPipeline(TUM_DEFAULT, params)
    for i in range(warmup):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    pipe.manager.optimize(blocking=True)
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    t0 = time.perf_counter()
    pipe.params.set("skip_first_n_frames", warmup)
    pipe.run_arrays(rgbs, depths, stamps)
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    fps = (n - warmup) / (time.perf_counter() - t0)
    with tempfile.TemporaryDirectory() as td:
        rep = pipe.evaluation_protocol(
            td, gt_stamps=list(stamps), gt_xyz=poses[:, :3, 3]
        )
    ate = "/".join(f"{rep.ate_rmse.get(l, float('nan')):.4f}"
                   for l in range(5))
    print(f"[A/B] gray_bits={bits}: {fps:.2f} fps, ATE L0..L4 {ate} m",
          flush=True)
