"""Pins for the bench A/B mover selection (VERDICT r12 #3): the round's
most expensive queries must always be A/B'd, and the mover fill ranks by
ratio-weighted absolute seconds — a 15 s query at raw 1.3x outranks a
0.4 s query at raw 1.6x. Pure-function tests, no Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_ab import AB_ALWAYS, MAX_AB_QUERIES, TOP_COST_AB, pick_movers


def test_top_cost_queries_always_selected():
    # 15 s query at raw 1.3x (below nothing — it IS a mover, but even if
    # crowded, top-cost membership alone must keep it in)
    current = {q: 0.5 for q in AB_ALWAYS}
    current["q_expensive_ingest"] = 15.0
    current["q_mid"] = 3.0
    baseline = dict(current)
    # many sub-second 1.6x movers competing for fill slots
    for i in range(12):
        current[f"q_cheap_{i}"] = 0.64
        baseline[f"q_cheap_{i}"] = 0.4
    baseline["q_expensive_ingest"] = 11.5  # raw 1.30x
    picked = pick_movers(current, baseline)
    assert len(picked) <= MAX_AB_QUERIES
    assert "q_expensive_ingest" in picked, (
        "the round's biggest absolute cost escaped A/B attribution"
    )
    # the always-A/B family still leads
    for q in AB_ALWAYS:
        assert q in picked


def test_fill_ranks_by_ratio_weighted_seconds():
    current = {"q_big": 19.5, "q_small": 0.64}
    baseline = {"q_big": 15.0, "q_small": 0.4}  # 1.3x vs 1.6x
    picked = pick_movers(current, baseline)
    # both fit, but the big mover must rank first (after top-cost, which
    # it also is) — |log 1.3| * 15 = 3.9 >> |log 1.6| * 0.4 = 0.19
    assert picked.index("q_big") < picked.index("q_small")


def test_top_cost_cap_respected():
    current = {f"q_{i}": float(i) for i in range(20)}
    picked = pick_movers(current, {})  # no baseline ratios at all
    assert len(picked) == TOP_COST_AB
    assert set(picked) == {"q_19", "q_18", "q_17"}
