"""plan_lsh: the (bands, rows) planner behind MinHashLSH.from_threshold.

Proves by exhaustive enumeration — not spot values — that the planner
returns the minimum-false-positive-area factorization among those whose
S-curve meets the recall target at the threshold, and that the strict
constructor refuses an unreachable target instead of under-recalling.
"""

import math

import pytest

from recordlinkage_spark.minhash import (
    MinHashLSH,
    lsh_candidate_probability,
    plan_lsh,
)


def _factorizations(num_perm):
    return [
        (num_perm // r, r) for r in range(1, num_perm + 1) if num_perm % r == 0
    ]


def _fp_area(bands, rows, threshold, grid=1000):
    step = threshold / grid
    return sum(
        lsh_candidate_probability((i + 0.5) * step, bands, rows) * step
        for i in range(grid)
    )


def test_curve_basic_properties():
    # endpoints and monotonicity of the public S-curve formula
    assert lsh_candidate_probability(0.0, 32, 4) == 0.0
    assert lsh_candidate_probability(1.0, 32, 4) == 1.0
    prev = -1.0
    for i in range(101):
        p = lsh_candidate_probability(i / 100.0, 32, 4)
        assert p >= prev
        prev = p


@pytest.mark.parametrize("num_perm", [64, 128, 256])
@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.8, 0.9])
def test_planner_optimal_by_enumeration(num_perm, threshold):
    target = 0.99
    plan = plan_lsh(threshold, num_perm=num_perm, target_recall=target)
    assert plan["bands"] * plan["rows"] == num_perm

    feasible = [
        (b, r)
        for b, r in _factorizations(num_perm)
        if lsh_candidate_probability(threshold, b, r) >= target
    ]
    if not feasible:
        assert not plan["meets_target"]
        best_recall = max(
            lsh_candidate_probability(threshold, b, r)
            for b, r in _factorizations(num_perm)
        )
        assert plan["recall_at_threshold"] == pytest.approx(best_recall)
        return

    assert plan["meets_target"]
    assert (plan["bands"], plan["rows"]) in feasible
    # no feasible plan has a strictly smaller FP area (same grid rule)
    chosen_area = _fp_area(plan["bands"], plan["rows"], threshold)
    assert plan["fp_area"] == pytest.approx(chosen_area, rel=1e-9)
    for b, r in feasible:
        assert chosen_area <= _fp_area(b, r, threshold) + 1e-12


def test_default_config_picks_32x4():
    # The pinned pair the lsh_plan_curve oracle hard-codes.
    plan = plan_lsh(0.8, num_perm=128, target_recall=0.99)
    assert (plan["bands"], plan["rows"]) == (32, 4)
    assert plan["meets_target"]
    assert plan["recall_at_threshold"] > 0.99
    # s50 is the exact half-probability midpoint: p(s50) == 0.5
    p_at_s50 = lsh_candidate_probability(plan["s50"], 32, 4)
    assert abs(p_at_s50 - 0.5) < 1e-9


def test_fp_area_bounds():
    plan = plan_lsh(0.8, num_perm=128)
    assert 0.0 < plan["fp_area"] < plan["threshold"]  # integral of p<=1 over [0,t]


def test_from_threshold_wires_plan():
    idx = MinHashLSH.from_threshold(0.8, num_perm=128, target_recall=0.99)
    assert (idx.bands, idx.rows) == (32, 4)
    assert idx.num_perm == 128
    assert idx.plan["meets_target"]


def test_from_threshold_strict_raises_on_unreachable():
    # num_perm=4 at j=0.5: best recall over {(4,1),(2,2),(1,4)} is
    # p(0.5; 4, 1) = 1 - 0.5^4 = 0.9375 < 0.99.
    with pytest.raises(ValueError, match="raise num_perm"):
        MinHashLSH.from_threshold(0.5, num_perm=4, target_recall=0.99)
    idx = MinHashLSH.from_threshold(
        0.5, num_perm=4, target_recall=0.99, strict=False
    )
    assert not idx.plan["meets_target"]
    assert idx.plan["recall_at_threshold"] == pytest.approx(1 - 0.5**4)


def test_validation():
    with pytest.raises(ValueError):
        plan_lsh(0.0)
    with pytest.raises(ValueError):
        plan_lsh(1.0)
    with pytest.raises(ValueError):
        plan_lsh(0.5, num_perm=0)


def test_recall_is_lower_bound_above_threshold():
    # monotonicity => p(s) >= p(threshold) for all s >= threshold
    plan = plan_lsh(0.7, num_perm=128)
    b, r = plan["bands"], plan["rows"]
    floor = plan["recall_at_threshold"]
    for i in range(71, 101):
        assert lsh_candidate_probability(i / 100.0, b, r) >= floor - 1e-12


def test_engine_config_for_threshold():
    from recordlinkage_spark.config import EngineConfig

    cfg = EngineConfig.for_threshold(0.8, num_perm=128, shingle_size=5)
    assert (cfg.lsh_bands, cfg.lsh_rows) == (32, 4)
    assert cfg.num_perm == 128
    assert cfg.shingle_size == 5
    with pytest.raises(ValueError, match="raise num_perm"):
        EngineConfig.for_threshold(0.5, num_perm=4)
    relaxed = EngineConfig.for_threshold(0.5, num_perm=4, strict=False)
    assert relaxed.lsh_bands * relaxed.lsh_rows == 4
