"""Trajectory evaluation: ATE (absolute) and RPE (relative) errors.

Capability parity with the TUM benchmark tooling the reference ships:
  - evaluate_ate: timestamp-associate estimate vs ground truth, Horn/SVD
    align, report translational error stats
    (reference: rgbd_benchmark/evaluate_ate_module.pyx:12-55);
  - evaluate_rpe: relative pose error over a fixed time/frame delta.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core import alignment, se3
from ..io.tum import associate


@dataclasses.dataclass
class TrajectoryError:
    rmse: float
    mean: float
    median: float
    std: float
    min: float
    max: float
    n_pairs: int

    def as_dict(self):
        return dataclasses.asdict(self)


def _stats(err: np.ndarray) -> TrajectoryError:
    return TrajectoryError(
        rmse=float(np.sqrt(np.mean(err**2))),
        mean=float(np.mean(err)),
        median=float(np.median(err)),
        std=float(np.std(err)),
        min=float(np.min(err)),
        max=float(np.max(err)),
        n_pairs=int(err.shape[0]),
    )


def evaluate_ate(
    est_stamps: Sequence[float],
    est_xyz: np.ndarray,
    gt_stamps: Sequence[float],
    gt_xyz: np.ndarray,
    max_difference: float = 0.02,
) -> TrajectoryError:
    """Absolute trajectory error after Horn alignment (translational)."""
    pairs = associate(list(est_stamps), list(gt_stamps), max_difference)
    if len(pairs) < 2:
        raise ValueError(f"only {len(pairs)} associated pose pairs")
    ei = np.asarray([p[0] for p in pairs])
    gi = np.asarray([p[1] for p in pairs])
    est = jnp.asarray(np.asarray(est_xyz)[ei], jnp.float32)
    gt = jnp.asarray(np.asarray(gt_xyz)[gi], jnp.float32)
    T, _ = alignment.horn_align_trajectories(est, gt)
    aligned = np.asarray(se3.apply(T, est))
    err = np.linalg.norm(aligned - np.asarray(gt), axis=-1)
    return _stats(err)


def evaluate_rpe(
    est_poses: np.ndarray,
    gt_poses: np.ndarray,
    delta: int = 1,
) -> tuple[TrajectoryError, TrajectoryError]:
    """Relative pose error over a frame delta on index-aligned pose arrays.

    Returns (translational [m], rotational [rad]) error statistics.
    """
    est = jnp.asarray(est_poses, jnp.float32)
    gt = jnp.asarray(gt_poses, jnp.float32)
    rel_est = se3.relative(est[:-delta], est[delta:])
    rel_gt = se3.relative(gt[:-delta], gt[delta:])
    err_T = se3.relative(rel_gt, rel_est)
    terr = np.asarray(se3.translation_norm(err_T))
    rerr = np.asarray(se3.rotation_angle(err_T))
    return _stats(terr), _stats(rerr)
