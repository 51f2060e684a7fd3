#!/usr/bin/env python
"""Offline optimizer study on a checkpointed bench graph (CPU, run ALONE).

Loads the post-run state saved by tools/save_bench_graph.py and replays the
5-level protocol tail (full optimize; prune@5/1/0.25 + re-optimize) under
different optimizer disciplines, reporting ATE per level. Drives the fix
for the round-3 observation that the full optimize barely improves on the
online result (L1 ~ L0) while round 2 went 0.0361 -> 0.0195: from a good
init, plain Huber-LM stays in the init basin; robustness scheduling
(graduated non-convexity) or prune-reoptimize rounds may escape it.

Usage: python tools/opt_study.py [state_name=yc126] [variant ...]
"""
import copy
import sys

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.eval.ate import evaluate_ate
from rgbdslam_v2_tpu.graph.manager import GraphManager
from rgbdslam_v2_tpu.optim.pose_graph import optimize

z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
gt_poses = z["poses"]
gt_stamps = list(np.arange(len(gt_poses)) / 30.0)
gt_xyz = gt_poses[:, :3, 3]

state_name = sys.argv[1] if len(sys.argv) > 1 else "yc126"

params = ParameterServer(dict(
    max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
    tpu_candidate_batch=8, keep_all_nodes=True,
    pose_relative_to="first", emm_skip_step=4,
))
mgr = GraphManager(TUM_DEFAULT, params)
mgr.load_state(f"/root/repo/.bench_cache/graph_state_{state_name}.npz")
print(f"[study] {state_name}: {mgr.n_nodes} nodes, {mgr.n_edges} edges, "
      f"{mgr.n_loop_edges} loop", flush=True)

# Snapshot for resets between variants (graph arrays + host edge mirrors).
snap_graph = jax.tree.map(np.asarray, mgr.graph)
snap_host = (
    copy.deepcopy(mgr.edge_types),
    copy.deepcopy(mgr.edge_pairs),
    np.array(mgr.edge_active_host),
    mgr.n_edges,
)


def reset():
    import jax.numpy as jnp

    mgr.graph = jax.tree.map(jnp.asarray, snap_graph)
    mgr.edge_types = copy.deepcopy(snap_host[0])
    mgr.edge_pairs = copy.deepcopy(snap_host[1])
    mgr.edge_active_host = np.array(snap_host[2])
    mgr.n_edges = snap_host[3]


def ate_now():
    n = mgr.n_nodes
    poses = np.asarray(mgr.graph.poses[:n])
    return evaluate_ate(
        list(mgr.timestamps), poses[:, :3, 3], gt_stamps, gt_xyz
    ).rmse


def run_opt(iterations, huber, pcg_iters=64, solver="auto"):
    mgr._apply_fixation()
    mgr.graph, chi2, _ = optimize(
        mgr.graph, iterations=iterations, huber_delta=huber,
        pcg_iters=pcg_iters, solver=solver,
    )
    return float(chi2)


def protocol(opt_fn):
    """opt_fn() -> chi2 runs the variant's 'full optimize'; then the
    standard prune levels with the same discipline at default settings."""
    out = {0: ate_now()}
    opt_fn()
    out[1] = ate_now()
    for level, thresh in ((2, 5.0), (3, 1.0), (4, 0.25)):
        mgr.prune_edges_above(thresh)
        run_opt(20, 1.0)
        out[level] = ate_now()
    return out


VARIANTS = {
    # current protocol discipline
    "base": lambda: run_opt(40, 1.0),
    "iters100": lambda: run_opt(100, 1.0),
    # graduated non-convexity: quadratic-ish -> robust
    "gnc": lambda: [run_opt(15, 10.0), run_opt(15, 3.0), run_opt(30, 1.0)],
    "gnc2": lambda: [run_opt(20, 5.0), run_opt(40, 1.0)],
    # pure quadratic first (no robustness), then Huber
    "quad-first": lambda: [run_opt(20, 1e6), run_opt(40, 1.0)],
    # prune-reoptimize interleave before the levels
    "prune-inter": lambda: [run_opt(20, 1.0), mgr.prune_edges_above(25.0),
                            run_opt(30, 1.0)],
    "pcg": lambda: run_opt(40, 1.0, pcg_iters=128, solver="pcg"),
}

names = sys.argv[2:] or list(VARIANTS)
for name in names:
    reset()
    levels = protocol(VARIANTS[name])
    s = "/".join(f"{levels[l]:.4f}" for l in range(5))
    print(f"[study] {state_name} {name}: ATE L0..L4 {s}", flush=True)
