"""Significance testing over benchmark sweeps.

Capability parity: the reference's evaluation figures run Wilcoxon
signed-rank tests over per-sequence ATE results when comparing two
configurations (reference: test/figures.py:17-25 — scipy.stats.wilcoxon
over paired sequence errors, annotated onto the comparison plots).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence


class PairedComparison(NamedTuple):
    """Result of comparing configuration A vs B over paired sequences."""

    n: int  # usable pairs (ties dropped, like the reference's test)
    median_diff: float  # median(a - b); negative = A better (lower ATE)
    statistic: float  # Wilcoxon W
    p_value: float
    significant: bool  # p < alpha


def wilcoxon_compare(
    ate_a: Sequence[float],
    ate_b: Sequence[float],
    alpha: float = 0.05,
) -> PairedComparison:
    """Paired Wilcoxon signed-rank test over per-sequence ATE results.

    Use over a batch_eval sweep: same sequences evaluated under two
    parameter sets (the reference compares e.g. EMM on/off or adjuster
    settings this way before claiming an improvement)."""
    import numpy as np
    from scipy.stats import wilcoxon

    a = np.asarray(ate_a, float)
    b = np.asarray(ate_b, float)
    if a.shape != b.shape:
        raise ValueError("paired comparison needs equal-length results")
    diff = a - b
    nz = diff[diff != 0]
    if len(nz) < 1:
        return PairedComparison(0, 0.0, 0.0, 1.0, False)
    stat, p = wilcoxon(a, b, zero_method="wilcox")
    return PairedComparison(
        n=int(len(nz)),
        median_diff=float(np.median(diff)),
        statistic=float(stat),
        p_value=float(p),
        significant=bool(p < alpha),
    )
