#!/usr/bin/env python
"""Attribute the hot fusions inside the compiled step programs to source
ops. Run ALONE (single-jax-process rule).

The jax.profiler trace names leaf ops (fusion.833, sort.16, while.131...)
but not their source. This compiles the exact bench-config slam_compute /
slam_commit / optimize programs (cache-hit if already compiled), dumps the
optimized HLO, and prints each named op's definition plus the source
metadata XLA attaches (op_name="jit(...)/..." paths), so device-table
entries map to Python.

Usage: python tools/hlo_attrib.py fusion.833 sort.16 while.131 ...
       (no args: print the 40 largest fusions by bytes touched)
"""
import re
import sys

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.graph.manager import GraphManager, compact_frame

params = ParameterServer(dict(
    max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
    tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10_000,
    keep_all_nodes=True, observability_threshold=0.5,
    pose_relative_to="inaffected", emm_skip_step=4,
))
m = GraphManager(TUM_DEFAULT, params)
rng = np.random.default_rng(0)
rgb = rng.integers(0, 255, (480, 640, 3), np.uint8).astype(np.uint8)
depth = rng.uniform(0.5, 5.0, (480, 640)).astype(np.float32)
cpt = compact_frame(rgb, depth, m.emm_stride, fmt=m.ingest_fmt,
                    gray_bits=m.gray_bits, depth_bits=m.depth_bits)
# run two frames so both compute and commit trace (and compile via cache)
m.add_frame(None, None, 0.0, compact=cpt)
m.add_frame(None, None, 1 / 30.0, compact=cpt)

from rgbdslam_v2_tpu.graph.device_step import slam_compute

padded, dup, dts = m._frame_slots(2, 2 / 30.0)
lowered = slam_compute.lower(
    m.store, m.graph, cpt, np.int32(2), np.int32(1),
    np.asarray(padded, np.int32), np.asarray(dup, bool),
    np.asarray(dts, np.float32), np.uint32(7), **m._step_cfg(),
)
txt = lowered.compile().as_text()
print(f"[hlo] compute program: {len(txt)} chars", flush=True)

targets = sys.argv[1:]
if targets:
    for t in targets:
        # print the computation or instruction definition block
        pat = re.compile(
            rf"^.*\b{re.escape(t)}\b.*$", re.M)
        hits = pat.findall(txt)
        print(f"\n==== {t}: {len(hits)} mentions ====")
        for h in hits[:12]:
            line = h.strip()
            meta = ""
            mm = re.search(r'op_name="([^"]+)"', line)
            if mm:
                meta = mm.group(1)
            print(f"  {line[:200]}")
            if meta:
                print(f"    -> {meta}")
else:
    # largest fusion roots by output bytes
    rows = []
    for mline in re.finditer(r"^\s*(ROOT\s+)?%?([\w.-]+) = (\S+) fusion\(.*$",
                             txt, re.M):
        name = mline.group(2)
        shape = mline.group(3)
        nums = [int(x) for x in re.findall(r"\d+", shape.split("{")[0])]
        size = 1
        for n in nums:
            size *= max(n, 1)
        rows.append((size, name, shape, mline.group(0)))
    rows.sort(reverse=True)
    for size, name, shape, line in rows[:40]:
        mm = re.search(r'op_name="([^"]+)"', line)
        print(f"{size:>12}  {name:<22} {shape[:40]:<42} "
              f"{mm.group(1)[:90] if mm else ''}")
