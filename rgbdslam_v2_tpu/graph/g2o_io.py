"""g2o text-format graph export/import (VERTEX_SE3:QUAT / EDGE_SE3:QUAT).

Capability parity: the reference saves its optimizer state as a .g2o file
(reference: graph_mgr_io.cpp:933 saveG2OGraph) usable by the g2o toolchain.
The text format is interoperable: our files load in g2o_viewer and vice
versa (within float precision).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core import se3
import jax.numpy as jnp


def _pose_to_line(T):
    t, q = se3.pose_to_tum(jnp.asarray(T, jnp.float32))
    t = np.asarray(t)
    q = np.asarray(q)
    return " ".join(f"{x:.9g}" for x in (*t, *q))


def write_g2o(path, poses, fixed_ids, edges):
    """poses: (N, 4, 4); fixed_ids: iterable of int;
    edges: iterable of (i, j, meas (4, 4), info (6, 6))."""
    lines = []
    for i, T in enumerate(poses):
        lines.append(f"VERTEX_SE3:QUAT {i} {_pose_to_line(T)}")
    for i in fixed_ids:
        lines.append(f"FIX {i}")
    for i, j, meas, info in edges:
        info = np.asarray(info)
        iu = info[np.triu_indices(6)]
        lines.append(
            f"EDGE_SE3:QUAT {i} {j} {_pose_to_line(meas)} "
            + " ".join(f"{x:.9g}" for x in iu)
        )
    Path(path).write_text("\n".join(lines) + "\n")


def read_g2o(path):
    """Returns (poses dict id -> (4, 4), fixed set, edges list (i, j, meas, info))."""
    poses, fixed, edges = {}, set(), []
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "VERTEX_SE3:QUAT":
            vid = int(parts[1])
            vals = np.asarray([float(x) for x in parts[2:9]])
            T = np.asarray(
                se3.tum_to_pose(jnp.asarray(vals[:3], jnp.float32), jnp.asarray(vals[3:7], jnp.float32))
            )
            poses[vid] = T
        elif parts[0] == "FIX":
            fixed.add(int(parts[1]))
        elif parts[0] == "EDGE_SE3:QUAT":
            i, j = int(parts[1]), int(parts[2])
            vals = np.asarray([float(x) for x in parts[3:10]])
            meas = np.asarray(
                se3.tum_to_pose(jnp.asarray(vals[:3], jnp.float32), jnp.asarray(vals[3:7], jnp.float32))
            )
            iu = np.asarray([float(x) for x in parts[10:31]])
            info = np.zeros((6, 6))
            info[np.triu_indices(6)] = iu
            info = info + np.triu(info, 1).T
            edges.append((i, j, meas, info))
    return poses, fixed, edges
