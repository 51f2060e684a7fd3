"""Robot odometry integration: odometry edges between consecutive nodes.

Capability parity: the reference's graph_mgr_odom.cpp — for consecutive node
pairs lacking visual edges (or always, with use_robot_odom), add an edge from
the robot's odometry delta with information `diag * 0.001 *
odometry_information_factor` (reference: graph_mgr_odom.cpp:11-60
createOdometryEdge, :62-131 addOdometry, :133-181 addOdometryEdgeToG2O;
params use_robot_odom{,_only}, odom_frame_name).

Here odometry arrives as per-frame world_T_base poses (from any source: wheel
odometry file, another tracker); the delta between consecutive node stamps
becomes the edge measurement.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core import se3


class OdometryProvider:
    """Interpolating odometry lookup: timestamp -> world_T_base (4, 4).

    Mirrors tf lookup at node timestamps (graph_mgr_odom.cpp:76-101) with
    linear interpolation on SE(3) (twist-space blend between brackets).
    """

    def __init__(self, stamps, poses):
        order = np.argsort(stamps)
        self.stamps = np.asarray(stamps, np.float64)[order]
        self.poses = np.asarray(poses, np.float32)[order]

    def lookup(self, t: float) -> Optional[np.ndarray]:
        if len(self.stamps) == 0:
            return None
        i = int(np.searchsorted(self.stamps, t))
        if i == 0:
            return self.poses[0] if abs(self.stamps[0] - t) < 0.5 else None
        if i >= len(self.stamps):
            return self.poses[-1] if abs(self.stamps[-1] - t) < 0.5 else None
        t0, t1 = self.stamps[i - 1], self.stamps[i]
        a = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
        A = jnp.asarray(self.poses[i - 1])
        B = jnp.asarray(self.poses[i])
        delta = se3.log_se3(se3.relative(A, B))
        return np.asarray(A @ se3.exp_se3(delta * a))

    def delta(self, t0: float, t1: float) -> Optional[np.ndarray]:
        """odom-frame motion between two stamps: base0_T_base1."""
        A = self.lookup(t0)
        B = self.lookup(t1)
        if A is None or B is None:
            return None
        return np.asarray(se3.relative(jnp.asarray(A), jnp.asarray(B)))


def odometry_information(dt: float, odometry_information_factor: float) -> np.ndarray:
    """Reference semantics: Ones * 0.001 * factor (graph_mgr_odom.cpp:41-54),
    here as a diagonal information matrix (off-diagonal ones in the reference
    are an acknowledged quirk; diagonal is the sound equivalent)."""
    return np.eye(6, dtype=np.float32) * (0.001 * odometry_information_factor)
