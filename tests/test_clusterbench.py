"""Methodology unit tests for the local-cluster scaling pair
(kgeng/clusterbench.py) — the pure summary math, no cluster spin-up
(the multi-executor mechanism itself is covered by test_cluster.py)."""

from kgeng.clusterbench import pair_efficiency


def test_pair_efficiency_min_of_n_per_level():
    """A slow-window outlier in either level's samples must not touch
    the ratio: min-of-N per level, eff = t1 / (2 * t2)."""
    s = pair_efficiency([100.0, 260.0], [55.0, 140.0])
    assert s["t1_s"] == 100.0 and s["t2_s"] == 55.0
    assert s["speedup"] == round(100.0 / 55.0, 3)
    assert s["efficiency"] == round(100.0 / 110.0, 3)


def test_pair_efficiency_perfect_scaling_is_one():
    assert pair_efficiency([84.0], [42.0])["efficiency"] == 1.0
