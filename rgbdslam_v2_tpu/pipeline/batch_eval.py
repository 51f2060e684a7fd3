"""Batch evaluation harness: many sequences / parameter sweeps -> CSV + plots.

Capability parity: the reference's evaluation tooling —
  test/run_tests.sh          (run the binary over every bag with param sweeps)
  rgbd_benchmark/summarize_evaluation.sh (per-sequence ATE at optimization
                              levels 0-4 + runtime + node/edge counts -> CSV)
  test/figures.py            (plots over collected ATE results)
— as one host-side driver over SlamPipeline.
"""
from __future__ import annotations

import csv
import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import ParameterServer
from ..core.camera import Intrinsics
from ..io.tum import TumDataset
from .slam import SlamPipeline


@dataclasses.dataclass
class SequenceResult:
    name: str
    config: str
    ate_by_level: Dict[int, float]
    duration_s: float
    fps: float
    nodes: int
    edges: int


def evaluate_sequences(
    sequences: Sequence,  # (name, tum_dir) pairs
    cam: Intrinsics,
    configs: Optional[Dict[str, dict]] = None,
    out_dir="eval_out",
    max_frames: Optional[int] = None,
) -> List[SequenceResult]:
    """Run the 5-level protocol over every (sequence, config) combination.

    configs: {config_name: param overrides}; default single config mirrors
    the reference's test_settings.launch (keep_all_nodes, offline eval).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if configs is None:
        configs = {"default": {"keep_all_nodes": True, "observability_threshold": 0.5}}
    results: List[SequenceResult] = []
    for name, tum_dir in sequences:
        ds = TumDataset.open(tum_dir)
        gt_stamps = gt_xyz = None
        if ds.groundtruth is not None:
            gt_stamps = ds.groundtruth[:, 0].tolist()
            gt_xyz = ds.groundtruth[:, 1:4]
        for cfg_name, overrides in configs.items():
            pipe = SlamPipeline(cam, ParameterServer(dict(overrides)))
            pipe.run_tum(ds, max_frames=max_frames)
            rep = pipe.evaluation_protocol(
                out / f"{name}__{cfg_name}",
                gt_stamps=gt_stamps,
                gt_xyz=gt_xyz,
            )
            stats = rep.statistics
            results.append(
                SequenceResult(
                    name=name,
                    config=cfg_name,
                    ate_by_level={int(k): v for k, v in rep.ate_rmse.items()},
                    duration_s=rep.duration_s,
                    fps=rep.fps,
                    nodes=stats["nodes"],
                    edges=stats["active_edges"],
                )
            )
    write_summary_csv(out / "summary.csv", results)
    (out / "summary.json").write_text(
        json.dumps([dataclasses.asdict(r) for r in results], indent=2)
    )
    return results


def evaluate_sequences_sharded(
    sequences: Sequence,  # (name, grays (T,H,W), depths (T,H,W), gt_poses) tuples
    cam: Intrinsics,
    params: Optional[ParameterServer] = None,
    out_dir="eval_out_sharded",
) -> List[SequenceResult]:
    """One sequence per mesh device (SURVEY §2.3's TPU scale axis).

    Runs the sequential-VO frontend for all sequences simultaneously on a
    tpu_mesh_devices-wide mesh (parallel/multi_eval.py) and reports per-
    sequence ATE. The full graph-SLAM protocol stays per-device-serial in
    evaluate_sequences; this driver is the throughput path for frontend
    sweeps (e.g. feature/RANSAC ablations over many sequences at once).
    """
    import jax

    from ..eval.ate import evaluate_ate
    from ..graph.manager import GraphManager
    from ..parallel import candidate_mesh, vo_trajectories_sharded

    params = params or ParameterServer()
    n_dev = params["tpu_mesh_devices"]
    mesh = candidate_mesh(n_dev)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # pad the sequence batch to a multiple of the mesh size
    names = [s[0] for s in sequences]
    grays = [np.asarray(s[1], np.float32) for s in sequences]
    depths = [np.asarray(s[2], np.float32) for s in sequences]
    gts = [s[3] for s in sequences]
    S = len(sequences)
    pad = (-S) % n_dev
    grays += [grays[0]] * pad
    depths += [depths[0]] * pad
    mgr = GraphManager(cam, params)  # for the configured extractor
    res = vo_trajectories_sharded(
        mesh,
        np.stack(grays),
        np.stack(depths),
        jax.random.PRNGKey(params["tpu_seed"]),
        mgr.extractor,
        cam,
        max_matches=min(params["max_matches"], params["max_keypoints"]),
        ratio=params["nn_distance_ratio"],
        n_hypotheses=params["ransac_iterations"],
        min_inliers=params["min_matches"],
        sigma_depth=params["sigma_depth"],
    )
    poses_all = np.asarray(res.poses)
    results: List[SequenceResult] = []
    for i, name in enumerate(names):
        T = poses_all[i]
        stamps = np.arange(T.shape[0]) / 30.0
        ate = float("nan")
        if gts[i] is not None:
            ate = evaluate_ate(
                stamps, T[:, :3, 3], stamps, np.asarray(gts[i])[:, :3, 3]
            ).rmse
        results.append(
            SequenceResult(
                name=name,
                config="vo_sharded",
                ate_by_level={0: ate},
                duration_s=0.0,
                fps=0.0,
                nodes=T.shape[0],
                edges=int(np.asarray(res.ok[i]).sum()),
            )
        )
    write_summary_csv(out / "summary.csv", results)
    return results


def write_summary_csv(path, results: List[SequenceResult]):
    """The summarize_evaluation.sh output shape: one row per run."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["sequence", "config"]
            + [f"ate_L{l}" for l in range(5)]
            + ["duration_s", "fps", "nodes", "edges"]
        )
        for r in results:
            w.writerow(
                [r.name, r.config]
                + [f"{r.ate_by_level.get(l, float('nan')):.5f}" for l in range(5)]
                + [f"{r.duration_s:.2f}", f"{r.fps:.2f}", r.nodes, r.edges]
            )


def plot_summary(results: List[SequenceResult], path):
    """ATE-per-level bars per sequence (the figures.py capability)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = [f"{r.name}\n{r.config}" for r in results]
    levels = range(5)
    x = np.arange(len(results))
    width = 0.16
    fig, ax = plt.subplots(figsize=(max(6, 1.2 * len(results)), 4))
    for li in levels:
        vals = [r.ate_by_level.get(li, np.nan) for r in results]
        ax.bar(x + (li - 2) * width, vals, width, label=f"L{li}")
    ax.set_xticks(x)
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_ylabel("ATE RMSE (m)")
    ax.legend(title="opt. level")
    ax.set_title("ATE by optimization/pruning level")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
