"""Wilcoxon sweep comparison (test/figures.py:17-25 parity)."""
import numpy as np

from rgbdslam_v2_tpu.eval.stats import wilcoxon_compare


def test_clear_improvement_is_significant():
    rng = np.random.default_rng(0)
    base = rng.uniform(0.02, 0.08, 12)
    better = base * 0.6 + rng.normal(0, 0.001, 12)
    res = wilcoxon_compare(better, base)
    assert res.significant
    assert res.median_diff < 0  # A (better) has lower ATE
    assert res.n == 12


def test_noise_is_not_significant():
    rng = np.random.default_rng(1)
    base = rng.uniform(0.02, 0.08, 10)
    same = base + rng.normal(0, 1e-4, 10)
    res = wilcoxon_compare(same, base)
    assert not res.significant


def test_identical_results_degenerate():
    base = [0.02, 0.03, 0.04]
    res = wilcoxon_compare(base, base)
    assert res.n == 0 and not res.significant
