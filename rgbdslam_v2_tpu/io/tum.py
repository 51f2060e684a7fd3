"""TUM RGB-D benchmark dataset I/O.

Capability parity:
  - timestamp association of rgb/depth/groundtruth lists
    (reference: rgbd_benchmark/associate_module.pyx:20-30) — greedy
    best-match pairing within max_difference;
  - TUM trajectory format read/write "stamp tx ty tz qx qy qz qw"
    (reference: graph_mgr_io.cpp:615-677 `saveTrajectory`);
  - dataset reading replaces the ROS message_filters ApproximateTime input
    path (reference: openni_listener.cpp:139-217) with direct file pairing.

Depth PNGs are 16-bit, meters = value / 5000 (TUM convention).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _read_file_list(path: Path) -> Dict[float, List[str]]:
    """Parse a TUM index file: 'timestamp data...' lines, '#' comments."""
    out: Dict[float, List[str]] = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        out[float(parts[0])] = parts[1:]
    return out


def associate(
    a_stamps: Sequence[float],
    b_stamps: Sequence[float],
    max_difference: float = 0.02,
    offset: float = 0.0,
) -> List[Tuple[int, int]]:
    """Greedy closest-pair association of two timestamp lists.

    Same contract as the benchmark's associate (best matches first, each
    stamp used once). Returns index pairs into the input sequences.
    """
    a = list(enumerate(a_stamps))
    b = list(enumerate(b_stamps))
    candidates = []
    bs = sorted(b, key=lambda kv: kv[1])
    b_times = [t for _, t in bs]
    for ia, ta in a:
        lo = int(np.searchsorted(b_times, ta + offset - max_difference))
        hi = int(np.searchsorted(b_times, ta + offset + max_difference, side="right"))
        for k in range(lo, hi):
            ib, tb = bs[k]
            candidates.append((abs(ta + offset - tb), ia, ib))
    candidates.sort()
    used_a, used_b, out = set(), set(), []
    for _, ia, ib in candidates:
        if ia not in used_a and ib not in used_b:
            used_a.add(ia)
            used_b.add(ib)
            out.append((ia, ib))
    out.sort()
    return out


@dataclasses.dataclass
class TumDataset:
    """A TUM RGB-D sequence directory: rgb.txt, depth.txt, groundtruth.txt."""

    root: Path
    pairs: List[Tuple[float, str, float, str]]  # (rgb_stamp, rgb_file, d_stamp, d_file)
    groundtruth: np.ndarray | None  # (N, 8): stamp tx ty tz qx qy qz qw

    @classmethod
    def open(cls, root, max_difference: float = 0.02) -> "TumDataset":
        root = Path(root)
        rgb = _read_file_list(root / "rgb.txt")
        depth = _read_file_list(root / "depth.txt")
        rgb_stamps = sorted(rgb)
        d_stamps = sorted(depth)
        match = associate(rgb_stamps, d_stamps, max_difference)
        pairs = [
            (rgb_stamps[ia], rgb[rgb_stamps[ia]][0], d_stamps[ib], depth[d_stamps[ib]][0])
            for ia, ib in match
        ]
        gt = None
        gt_path = root / "groundtruth.txt"
        if gt_path.exists():
            rows = []
            for line in gt_path.read_text().splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rows.append([float(x) for x in line.split()])
            gt = np.asarray(rows, dtype=np.float64)
        return cls(root=root, pairs=pairs, groundtruth=gt)

    def __len__(self):
        return len(self.pairs)

    def timestamps(self) -> List[float]:
        return [p[0] for p in self.pairs]

    def load(self, i: int):
        """Load pair i -> (timestamp, rgb uint8 (H, W, 3), depth float32 meters)."""
        import cv2

        ts, rgb_file, _, d_file = self.pairs[i]
        bgr = cv2.imread(str(self.root / rgb_file), cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(self.root / rgb_file)
        rgb = bgr[..., ::-1].copy()
        d16 = cv2.imread(str(self.root / d_file), cv2.IMREAD_UNCHANGED)
        if d16 is None:
            raise FileNotFoundError(self.root / d_file)
        depth = d16.astype(np.float32) / 5000.0
        return ts, rgb, depth


def read_trajectory_file(path) -> np.ndarray:
    """Read TUM trajectory -> (N, 8) float64 [stamp tx ty tz qx qy qz qw]."""
    rows = []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        vals = [float(x) for x in line.replace(",", " ").split()]
        if len(vals) >= 8:
            rows.append(vals[:8])
    return np.asarray(rows, dtype=np.float64)


def rows_to_poses(rows: np.ndarray) -> np.ndarray:
    """(N, 8) TUM rows [stamp t q(xyzw)] -> (N, 4, 4) pose matrices.

    Pure numpy (no device work) — viewer/eval paths convert whole files."""
    n = len(rows)
    T = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    T[:, :3, 3] = rows[:, 1:4]
    x, y, z, w = (rows[:, 4 + i] for i in range(4))
    T[:, 0, 0] = 1 - 2 * (y * y + z * z)
    T[:, 0, 1] = 2 * (x * y - z * w)
    T[:, 0, 2] = 2 * (x * z + y * w)
    T[:, 1, 0] = 2 * (x * y + z * w)
    T[:, 1, 1] = 1 - 2 * (x * x + z * z)
    T[:, 1, 2] = 2 * (y * z - x * w)
    T[:, 2, 0] = 2 * (x * z - y * w)
    T[:, 2, 1] = 2 * (y * z + x * w)
    T[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return T


def write_trajectory(path, stamps: Sequence[float], poses: np.ndarray, comment: str = ""):
    """Write TUM-format trajectory. poses: (N, 4, 4) world_T_cam.

    Same output contract as the reference's saveTrajectory
    (graph_mgr_io.cpp:615-677): one line per node, quaternion xyzw order.
    """
    from ..core import se3
    import jax.numpy as jnp

    t, q = se3.pose_to_tum(jnp.asarray(poses, jnp.float32))
    t = np.asarray(t)
    q = np.asarray(q)
    lines = []
    if comment:
        lines.append(f"# {comment}")
    for i, ts in enumerate(stamps):
        lines.append(
            f"{ts:.6f} "
            + " ".join(f"{x:.7f}" for x in t[i])
            + " "
            + " ".join(f"{x:.7f}" for x in q[i])
        )
    Path(path).write_text("\n".join(lines) + "\n")
