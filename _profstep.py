import rgbdslam_v2_tpu; rgbdslam_v2_tpu.enable_compilation_cache()
import time, numpy as np, jax, jax.numpy as jnp
from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
from rgbdslam_v2_tpu.graph.manager import GraphManager

world = SyntheticWorld.create(seed=0, cam=TUM_DEFAULT)
poses, rgbs, depths = render_sequence(world, 60, seed=2)
params = ParameterServer(dict(max_keypoints=600, tpu_max_nodes=256, tpu_max_edges=4096,
    tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
    keep_all_nodes=True, observability_threshold=0.5, tpu_drain_interval=8))
mgr = GraphManager(TUM_DEFAULT, params)
for i in range(11):
    mgr.add_frame(rgbs[i], depths[i], i/30.0, poses[0] if i==0 else None)
mgr._drain_pending()
print("warm", flush=True)

# time 16 frames but instrument drains and optimize separately
import rgbdslam_v2_tpu.graph.manager as M
t_drain = []
orig_drain = mgr._drain_pending
def timed_drain():
    t0=time.perf_counter(); orig_drain(); t_drain.append(time.perf_counter()-t0)
mgr._drain_pending = timed_drain
t_opt = []
orig_opt = mgr.optimize
def timed_opt(**kw):
    t0=time.perf_counter(); r=orig_opt(**kw); t_opt.append(time.perf_counter()-t0); return r
mgr.optimize = timed_opt

t0=time.perf_counter()
for i in range(11, 43):
    mgr.add_frame(rgbs[i], depths[i], i/30.0)
mgr._drain_pending()
total = time.perf_counter()-t0
print("32 frames: %.0f ms/frame -> %.2f fps" % (total/32*1000, 32/total))
print("drains:", [f"{x*1000:.0f}" for x in t_drain])
print("optimize dispatches:", [f"{x*1000:.0f}" for x in t_opt])
