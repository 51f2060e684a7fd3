"""Trace per-frame wall time of the steady-state pipeline on the real chip.

Loads the cached bench frames, runs the pipeline for ~120 frames, and
records per-frame host time split into put (h2d dispatch) and step
(process_frame), printing percentiles — resolves where the ~30 ms/frame
actually goes (the stage table and a cold h2d probe disagree by 20x).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.graph.manager import compact_frame
from rgbdslam_v2_tpu.pipeline import SlamPipeline

cache = Path(__file__).parent.parent / ".bench_cache" / "frames_520_s2_n01.npz"
z = np.load(cache)
poses, rgbs = z["poses"], z["rgbs"]
depths = z["depths_u16"].astype(np.float32) / 5000.0
N = 140
stamps = np.arange(N) / 30.0

params = ParameterServer(
    dict(max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
         tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
         keep_all_nodes=True, observability_threshold=0.5,
         pose_relative_to="inaffected")
)
pipe = SlamPipeline(TUM_DEFAULT, params)
m = pipe.manager
stride = m.emm_stride

t_compact, t_put, t_step = [], [], []
nxt = None
for i in range(N):
    t0 = time.perf_counter()
    c = compact_frame(rgbs[i], depths[i], stride)
    t1 = time.perf_counter()
    cpt = jax.device_put(c)
    t2 = time.perf_counter()
    pipe.process_frame(None, None, float(stamps[i]),
                       gt_pose=poses[0] if i == 0 else None, compact=cpt)
    t3 = time.perf_counter()
    t_compact.append(t1 - t0)
    t_put.append(t2 - t1)
    t_step.append(t3 - t2)

def pct(a, warm=30):
    a = np.array(a[warm:]) * 1e3
    return (f"p50={np.percentile(a,50):.1f} p90={np.percentile(a,90):.1f} "
            f"max={a.max():.1f} mean={a.mean():.1f}")

print(f"compact: {pct(t_compact)}")
print(f"put:     {pct(t_put)}")
print(f"step:    {pct(t_step)}")
tot = (np.array(t_compact) + np.array(t_put) + np.array(t_step))[30:]
print(f"total:   mean {tot.mean()*1e3:.1f} ms -> {1/tot.mean():.1f} fps")
# what are the slowest 8 frames doing?
order = np.argsort(-tot)[:8]
for k in order:
    i = k + 30
    print(f"  frame {i}: compact {t_compact[i]*1e3:.1f} put {t_put[i]*1e3:.1f} "
          f"step {t_step[i]*1e3:.1f}")
