"""SLAM pipeline: dataset -> frames -> graph -> trajectories/maps.

Capability parity: the reference's input pipeline and offline batch
evaluation driver (reference: src/openni_listener.cpp — frame skipping
:686-705, processing :743-860; the 5-level evaluation protocol
`evaluation()` :431-518) without ROS: a host loop feeding jitted device
kernels, with the same parameter semantics (data_skip_step,
skip_first_n_frames, batch_processing).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ParameterServer, default_params
from ..core.camera import Intrinsics
from ..core.frames import make_frame
from ..eval.ate import evaluate_ate
from ..graph.manager import GraphManager
from ..io.tum import TumDataset, write_trajectory


@dataclasses.dataclass
class EvaluationReport:
    """Per-level trajectory files + ATE (the reference's iteration_0..4)."""

    levels: Dict[int, str]
    ate_rmse: Dict[int, float]
    duration_s: float
    fps: float
    statistics: dict

    def as_dict(self):
        return dataclasses.asdict(self)


class SlamPipeline:
    def __init__(
        self,
        cam: Intrinsics,
        params: Optional[ParameterServer] = None,
    ):
        self.params = params or default_params()
        self.cam = cam
        self.manager = GraphManager(cam, self.params)
        self.n_processed = 0
        self.n_dropped = 0
        self.wall_time = 0.0

    # ------------------------------------------------------------------
    def process_frame(self, rgb, depth, timestamp: float, gt_pose=None) -> bool:
        p = self.params
        frame = make_frame(
            jnp.asarray(rgb),
            jnp.asarray(depth),
            self.cam,
            min_depth=p["minimum_depth"],
            max_depth=p["maximum_depth"],
        )
        t0 = time.perf_counter()
        took = self.manager.add_node(frame, timestamp, gt_pose)
        self.wall_time += time.perf_counter() - t0
        self.n_processed += 1
        if not took:
            self.n_dropped += 1
        return took

    def run_arrays(self, rgbs, depths, stamps, gt_poses=None) -> None:
        """Feed pre-loaded arrays (synthetic data path)."""
        p = self.params
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        for i in range(skip0, len(rgbs), step):
            gt = gt_poses[0] if (gt_poses is not None and self.manager.n_nodes == 0) else None
            self.process_frame(rgbs[i], depths[i], float(stamps[i]), gt)

    def run_tum(self, dataset: TumDataset, max_frames: Optional[int] = None) -> None:
        p = self.params
        skip0 = p["skip_first_n_frames"]
        step = max(1, p["data_skip_step"])
        idxs = list(range(skip0, len(dataset), step))
        if max_frames:
            idxs = idxs[:max_frames]
        for i in idxs:
            ts, rgb, depth = dataset.load(i)
            self.process_frame(rgb, depth, ts)

    # ------------------------------------------------------------------
    def evaluation_protocol(
        self,
        out_dir,
        prefix: str = "estimate",
        gt_stamps=None,
        gt_xyz=None,
    ) -> EvaluationReport:
        """The reference's 5-level offline protocol (openni_listener.cpp:431):

        L0: online estimates as-is; L1: full optimization; L2..L4: prune
        edges with chi² above 5 / 1 / 0.25, re-optimizing after each prune.
        """
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        mgr = self.manager
        levels: Dict[int, str] = {}
        ate: Dict[int, float] = {}

        def save_level(level: int):
            stamps, poses = mgr.trajectory()
            path = out / f"{prefix}_iteration_{level}.txt"
            write_trajectory(path, stamps, poses, comment=f"level {level}")
            levels[level] = str(path)
            if gt_stamps is not None and gt_xyz is not None and len(stamps) > 2:
                try:
                    res = evaluate_ate(stamps, poses[:, :3, 3], gt_stamps, gt_xyz)
                    ate[level] = res.rmse
                except ValueError:
                    pass

        save_level(0)
        mgr.optimize(iterations=self.params["optimizer_iterations"] * 2)
        save_level(1)
        for level, thresh in ((2, 5.0), (3, 1.0), (4, 0.25)):
            mgr.prune_edges_above(thresh)
            mgr.optimize(iterations=self.params["optimizer_iterations"])
            save_level(level)

        fps = self.n_processed / self.wall_time if self.wall_time > 0 else 0.0
        report = EvaluationReport(
            levels=levels,
            ate_rmse=ate,
            duration_s=self.wall_time,
            fps=fps,
            statistics=mgr.statistics(),
        )
        (out / f"{prefix}_report.json").write_text(
            json.dumps(report.as_dict(), indent=2)
        )
        return report
