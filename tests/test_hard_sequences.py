"""Hard-sequence stress suite bounds (VERDICT r3 #4).

The reference's published table spans degenerate sequences (fr1_360 fast
rotation, low-texture, depth dropout — test/README:87-101). This asserts
the synthetic stress suite (tools/hard_sequences.py) stays bounded at the
CPU-runnable --small scale: no sequence collapses to constant-position
edges, the protocol ATE stays within per-sequence bounds, and the ICP
rescue actually fires on the feature-starved world. The full-scale table
lives in HARD_SEQUENCES.md (generated on the chip by the same tool)."""
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from hard_sequences import (  # noqa: E402
    SMALL_CAM,
    build_sequences,
    protocol_params,
    run_sequence,
)


def _clip(seq, n):
    poses, rgbs, depths, note = seq
    return poses[:n], rgbs[:n], depths[:n], note


# per-sequence L1 (full-optimization) ATE bounds, meters, at 160x120 small
# scale. The room is ~4 m across: anything under ~0.1 m tracks; the bounds
# are ~3x observed so tunnel-free CPU jitter doesn't flake the tier.
BOUNDS = {
    "spin360": 0.15,      # ref fr1_360: 0.051 m at full res
    "depth_holes": 0.10,
    "dark_stretch": 0.20,  # 20% of frames at ~3% contrast
}


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_hard_sequence_within_bounds(name, tmp_path):
    seqs = build_sequences(SMALL_CAM, small=True, with_fr2=False)
    seq = _clip(seqs[name](), 48)
    r = run_sequence(SMALL_CAM, seq, protocol_params(True), tmp_path / name)
    ate_l1 = r["ate"].get(1, float("nan"))
    assert np.isfinite(ate_l1), r
    assert ate_l1 < BOUNDS[name], (name, r["ate"])
    # the trajectory must be tracked, not bridged: constant-position
    # fallback edges stay a small minority of the graph
    assert r["const_pos_edges"] <= max(2, r["edges"] // 10), r
    assert r["nodes"] >= len(seq[1]) - 2, r


def test_dark_stretch_icp_rescue_fires(tmp_path):
    # dark_stretch drops the middle frames to ~3% contrast: visual matching
    # fails there, so the FAST path's retroactive GICP rescue (drain-batched,
    # constant-velocity seeded — see manager._retro_rescue_kernel) must fire
    # on the starved stretch and actually rescue accuracy, not just fire:
    # without it the const-pos chain freezes mid-orbit (L1 0.114 m measured);
    # with it L1 reads 0.0580 m deterministically (VERDICT r4 #3 bound).
    seqs = build_sequences(SMALL_CAM, small=True, with_fr2=False)
    seq = _clip(seqs["dark_stretch"](), 48)
    r = run_sequence(
        SMALL_CAM, seq,
        protocol_params(True, use_icp=True, icp_max_iterations=12),
        tmp_path / "ds",
    )
    assert r["icp_rescue_edges"] >= 1, r
    assert r["ate"].get(1, float("nan")) < 0.06, r["ate"]
    assert r["const_pos_edges"] <= 2, r


def test_dark_stretch_slow_path_rescue_fires(tmp_path):
    # the slow path (min_translation_meter forces it) runs the same rescue
    # inline per frame (node.cpp:1381-1413 equivalent) and must also hold
    seqs = build_sequences(SMALL_CAM, small=True, with_fr2=False)
    seq = _clip(seqs["dark_stretch"](), 48)
    r = run_sequence(
        SMALL_CAM, seq,
        protocol_params(True, use_icp=True, icp_max_iterations=12,
                        min_translation_meter=0.001),
        tmp_path / "ds_slow", rescue_counts=True,
    )
    assert r["icp_rescue_edges"] >= 1, r
    assert r["ate"].get(1, float("nan")) < 0.25, r["ate"]
    assert r["const_pos_edges"] <= max(2, r["edges"] // 5), r
