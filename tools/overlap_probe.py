#!/usr/bin/env python
"""Can the tunnel overlap h2d with device compute? Run ALONE.

The steady-state frame budget is host-pack + wire + device-compute, and
bench r3 measured it fully SERIAL (device busy 27% of the frame). Round 2
measured device_put prefetch as no-help, but the program set has changed
(0.38 MB yc12 vs 1.15 MB raw; 5.3 ms compute vs 11.5). Re-measure three
dispatch disciplines over the same 60-frame steady-state loop on a live
GraphManager:

  A jit-arg     compact -> slam step with the numpy buffer as jit arg
                (the current pipeline: transfer happens inside dispatch)
  B put-ahead   device_put frame k+1 right after dispatching step k
                (same thread: transfer queued behind compute on the FIFO,
                overlap only if the client streams it early)
  C thread-put  a worker thread device_puts frames from a queue while the
                main thread dispatches steps on already-resident buffers

Also prints the raw link rate for the current wire size and the dispatch
enqueue cost, so A/B/C can be decomposed.
"""
import queue
import sys
import threading
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

N_WARM, N_MEAS = 20, 60


def make_mgr():
    params = ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200,
        optimizer_skip_step=10_000,  # isolate the step itself
        keep_all_nodes=True, observability_threshold=0.5,
        pose_relative_to="inaffected", emm_skip_step=4,
    ))
    m = GraphManager(TUM_DEFAULT, params)
    for i in range(N_WARM):
        cpt = compact_frame(rgbs[i], depths[i], m.emm_stride,
                            fmt=m.ingest_fmt, gray_bits=m.gray_bits)
        m.add_frame(None, None, i / 30.0, compact=cpt)
    float(np.asarray(m.graph.poses[0, 0, 0]))
    return m


def fence(m):
    float(np.asarray(m.graph.poses[0, 0, 0]))


# ---- raw link + dispatch overhead ------------------------------------------
m = make_mgr()
cpt0 = compact_frame(rgbs[0], depths[0], m.emm_stride, fmt=m.ingest_fmt,
                     gray_bits=m.gray_bits)
wire_mb = cpt0.nbytes / 1e6
r = jax.device_put(cpt0)
jax.block_until_ready(r)
t0 = time.perf_counter()
bufs = [jax.device_put(cpt0) for _ in range(20)]
jax.block_until_ready(bufs)
link = (time.perf_counter() - t0) / 20 * 1e3
print(f"[probe] wire {cpt0.nbytes} B; 20 queued puts: {link:.2f} ms/put "
      f"({wire_mb / link * 1e3:.1f} MB/s)", flush=True)

# ---- A: jit-arg (current pipeline) -----------------------------------------
packs = [compact_frame(rgbs[i], depths[i], m.emm_stride, fmt=m.ingest_fmt,
                       gray_bits=m.gray_bits)
         for i in range(N_WARM, N_WARM + N_MEAS)]
fence(m)
t0 = time.perf_counter()
for k, cpt in enumerate(packs):
    m.add_frame(None, None, (N_WARM + k) / 30.0, compact=cpt)
fence(m)
a = (time.perf_counter() - t0) / N_MEAS * 1e3
print(f"[probe] A jit-arg resident-pack: {a:.2f} ms/frame", flush=True)

# ---- B: put-ahead, same thread ---------------------------------------------
m = make_mgr()
fence(m)
t0 = time.perf_counter()
dev = jax.device_put(packs[0])
for k in range(N_MEAS):
    nxt = jax.device_put(packs[k + 1]) if k + 1 < N_MEAS else None
    m.add_frame(None, None, (N_WARM + k) / 30.0, compact=dev)
    dev = nxt
fence(m)
b = (time.perf_counter() - t0) / N_MEAS * 1e3
print(f"[probe] B put-ahead same-thread: {b:.2f} ms/frame", flush=True)

# ---- C: worker-thread puts -------------------------------------------------
m = make_mgr()
fence(m)
q_in: "queue.Queue" = queue.Queue(maxsize=2)
q_out: "queue.Queue" = queue.Queue(maxsize=2)


def putter():
    while True:
        item = q_in.get()
        if item is None:
            return
        q_out.put(jax.device_put(item))


th = threading.Thread(target=putter, daemon=True)
th.start()
t0 = time.perf_counter()
q_in.put(packs[0])
for k in range(N_MEAS):
    if k + 1 < N_MEAS:
        q_in.put(packs[k + 1])
    dev = q_out.get()
    m.add_frame(None, None, (N_WARM + k) / 30.0, compact=dev)
fence(m)
c = (time.perf_counter() - t0) / N_MEAS * 1e3
q_in.put(None)
print(f"[probe] C thread-put: {c:.2f} ms/frame", flush=True)

# ---- D: A but with per-frame host pack included (true end-to-end) ----------
m = make_mgr()
fence(m)
t0 = time.perf_counter()
for k in range(N_MEAS):
    i = N_WARM + k
    cpt = compact_frame(rgbs[i], depths[i], m.emm_stride, fmt=m.ingest_fmt,
                        gray_bits=m.gray_bits)
    m.add_frame(None, None, i / 30.0, compact=cpt)
fence(m)
d = (time.perf_counter() - t0) / N_MEAS * 1e3
print(f"[probe] D jit-arg + per-frame pack: {d:.2f} ms/frame "
      f"(pack cost rides the loop)", flush=True)
