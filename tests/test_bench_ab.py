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
    """The mover fill itself must rank by |log ratio| x old_sec — so
    the top-cost rule alone cannot make this pass: q_big is kept OUT of
    the top-cost slots (three more expensive non-movers occupy them)
    and must win its fill slot against five cheap 1.6x movers, which
    all outrank it under unweighted |log ratio|."""
    current = {q: 0.5 for q in AB_ALWAYS}  # 5 always-A/B slots
    baseline = {q: 0.5 for q in AB_ALWAYS}
    for i, sec in enumerate((30.0, 29.0, 28.0)):  # top-cost, ratio 1.0
        current[f"q_huge_{i}"] = sec
        baseline[f"q_huge_{i}"] = sec
    current["q_big"] = 19.5  # raw 1.3x, weighted score |log1.3|*15=3.9
    baseline["q_big"] = 15.0
    for i in range(5):  # raw 1.6x, weighted score |log1.6|*0.4=0.19
        current[f"q_small_{i}"] = 0.64
        baseline[f"q_small_{i}"] = 0.4
    picked = pick_movers(current, baseline)
    assert len(picked) == MAX_AB_QUERIES
    # 5 always + 3 top-cost leave 2 fill slots: q_big must take one
    # (unweighted |log ratio| would rank all five smalls above it)
    assert "q_big" in picked
    small_idx = [
        picked.index(q) for q in picked if q.startswith("q_small_")
    ]
    assert small_idx, f"no small mover survived the fill at all: {picked}"
    assert picked.index("q_big") < min(small_idx)


def test_top_cost_cap_respected():
    current = {f"q_{i}": float(i) for i in range(20)}
    picked = pick_movers(current, {})  # no baseline ratios at all
    assert len(picked) == TOP_COST_AB
    assert set(picked) == {"q_19", "q_18", "q_17"}


def test_touched_movers_get_guaranteed_slots():
    """VERDICT r13 #3: a query whose module changed since the baseline
    commit AND whose raw ratio crossed the mover threshold must never
    be crowded out of the block by bigger untouched movers (r13's
    q_doc_repeated_chunk_removal escape). The touched mover here is the
    WEAKEST-scored mover in the pool — without the touched set it loses
    the fill; with it, it outranks every untouched mover."""
    current = {q: 0.5 for q in AB_ALWAYS}
    baseline = {q: 0.5 for q in AB_ALWAYS}
    for i, sec in enumerate((30.0, 29.0, 28.0)):  # top-cost, ratio 1.0
        current[f"q_huge_{i}"] = sec
        baseline[f"q_huge_{i}"] = sec
    # the touched-but-small mover: raw 1.24x on 0.6 s
    current["q_touched_small"] = 0.71
    baseline["q_touched_small"] = 0.58
    # enough big untouched movers to flood every fill slot
    for i in range(8):
        current[f"q_big_mover_{i}"] = 13.0
        baseline[f"q_big_mover_{i}"] = 10.0
    without = pick_movers(current, baseline)
    assert "q_touched_small" not in without, (
        "fixture no longer reproduces the crowd-out; strengthen the pool"
    )
    with_touched = pick_movers(
        current, baseline, touched={"q_touched_small"}
    )
    assert "q_touched_small" in with_touched
    assert len(with_touched) <= MAX_AB_QUERIES


def test_reference_closure_follows_import_edges_only():
    """An operators/ change must reach the query modules that import it
    (directly or through an operator chain), WITHOUT flooding: docstring
    citations and __init__ re-export hubs must not propagate, or every
    seed marks ~every query module and 'touched' stops discriminating."""
    from tools.bench_ab import _PKG, _reference_closure

    seed = f"{_PKG}/operators/substring_ingest.py"
    c = _reference_closure({seed})
    assert seed in c
    # streaming_queries lazily imports substring_ingest inside the gate
    # query — the exact operator→query edge the closure exists for
    assert f"{_PKG}/queries/streaming_queries.py" in c
    # no flood: this repo cross-cites module names in prose everywhere;
    # a text-match closure saturates to ~every query module (measured
    # 42 files in round 14) while the import-edge closure stays small
    assert len(c) <= 6, sorted(c)
    # dedup_ingest MENTIONS substring_ingest in its docstring but does
    # not import it — must not join
    assert f"{_PKG}/operators/dedup_ingest.py" not in c
