import csv
import numpy as np
import pytest

from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
from rgbdslam_v2_tpu.io.synthetic import save_as_tum_dataset
from rgbdslam_v2_tpu.pipeline.batch_eval import evaluate_sequences, plot_summary


pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


@pytest.fixture(scope="module")
def two_sequences(tmp_path_factory):
    dirs = []
    for seed in (0, 1):
        world = SyntheticWorld.create(seed=seed, texture_size=128, cam=CAM)
        poses, rgbs, depths = render_sequence(world, 8, seed=seed + 2)
        d = tmp_path_factory.mktemp(f"seq{seed}")
        save_as_tum_dataset(d, poses, rgbs, depths)
        dirs.append((f"seq{seed}", d))
    return dirs


def test_batch_eval_csv_and_plot(tmp_path, two_sequences):
    overrides = dict(
        keep_all_nodes=True,
        max_keypoints=128,
        tpu_max_nodes=16,
        tpu_max_edges=128,
        tpu_candidate_batch=2,
        ransac_iterations=64,
        min_matches=10,
        observability_threshold=0.5,
    )
    results = evaluate_sequences(
        two_sequences,
        CAM,
        configs={"a": overrides, "b": {**overrides, "nn_distance_ratio": 0.8}},
        out_dir=tmp_path,
    )
    assert len(results) == 4  # 2 sequences x 2 configs
    rows = list(csv.reader(open(tmp_path / "summary.csv")))
    assert rows[0][:2] == ["sequence", "config"]
    assert len(rows) == 5
    # per-run protocol outputs exist
    assert (tmp_path / "seq0__a" / "estimate_iteration_4.txt").exists()
    assert (tmp_path / "summary.json").exists()
    # ATE values parse and are sane for exact synthetic data
    for r in results:
        assert 1 in r.ate_by_level
        assert r.ate_by_level[4] < 0.5
    plot_summary(results, tmp_path / "summary.png")
    assert (tmp_path / "summary.png").stat().st_size > 1000
