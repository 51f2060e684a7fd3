#!/usr/bin/env python
"""Find the HBM-occupancy threshold that flips the tunnel into slow mode.

wire_mechanism.py showed: after 20 slam steps EVERY rpc costs ~30 ms and
bandwidth collapses ~50x, persisting after `del manager` — while an
identical-footprint idle manager is fine and 3 GB of dummy arrays alone
reproduces it. Hypothesis: allocator high-water (pool growth from step
temporaries), not live bytes. This probe:
  1. put latency vs dummy occupancy 0.5..6 GB (live arrays)
  2. then FREES the dummies -> does latency recover (live) or stay (pool)?
  3. memory_stats() at each stage, if the backend exposes it
"""
import gc
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import numpy as np

buf = np.random.randint(0, 255, (432_000,), np.uint8)
dev = jax.devices()[0]


def put_ms(k=5):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[k // 2]


def stats(tag):
    try:
        s = dev.memory_stats()
        print(f"[occ] {tag}: in_use {s.get('bytes_in_use', -1)/1e9:.2f} GB, "
              f"peak {s.get('peak_bytes_in_use', -1)/1e9:.2f} GB, "
              f"limit {s.get('bytes_limit', -1)/1e9:.2f} GB", flush=True)
    except Exception as e:
        print(f"[occ] {tag}: memory_stats unavailable ({e})", flush=True)


stats("fresh")
print(f"[occ] fresh put: {put_ms():.2f} ms", flush=True)

chunk_mb = 512
keep = []
for step in range(12):  # up to 6 GB
    keep.append(jax.device_put(np.zeros((chunk_mb, 1024, 1024), np.uint8)))
    jax.block_until_ready(keep[-1])
    gb = (step + 1) * chunk_mb / 1024
    print(f"[occ] live {gb:4.1f} GB: put {put_ms():7.2f} ms", flush=True)
stats("at 6GB")

keep.clear()
gc.collect()
time.sleep(1.0)
stats("after free")
print(f"[occ] after free: put {put_ms():.2f} ms", flush=True)
time.sleep(5.0)
print(f"[occ] after free +5s: put {put_ms():.2f} ms", flush=True)
