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


def test_soft_cap_never_drops_touched_movers():
    """ADVICE r14: with 5+ touched movers the old hard cap silently
    dropped the overflow. The cap now bounds only the weighted fill —
    every touched mover keeps its slot even when the block grows past
    MAX_AB_QUERIES."""
    current = {q: 0.5 for q in AB_ALWAYS}
    baseline = {q: 0.5 for q in AB_ALWAYS}
    for i, sec in enumerate((30.0, 29.0, 28.0)):  # top-cost, ratio 1.0
        current[f"q_huge_{i}"] = sec
        baseline[f"q_huge_{i}"] = sec
    touched = set()
    for i in range(6):  # 6 touched movers > the 4 slots the cap left
        current[f"q_touched_{i}"] = 0.71
        baseline[f"q_touched_{i}"] = 0.58
        touched.add(f"q_touched_{i}")
    for i in range(8):  # big untouched movers flooding the fill
        current[f"q_big_mover_{i}"] = 13.0
        baseline[f"q_big_mover_{i}"] = 10.0
    picked = pick_movers(current, baseline, touched=touched)
    for q in touched:
        assert q in picked, f"touched mover {q} dropped by the cap"
    # the fill itself still respects the cap: total = mandatory + fill
    mandatory = len(AB_ALWAYS) + 3 + len(touched)
    assert len(picked) <= max(mandatory, MAX_AB_QUERIES) + 0


def test_phantom_single_pair_hiccup_suppressed_by_median():
    """VERDICT r14 #2 reproduction: r14's kmeans phantom was ONE
    old/new pair landing on a GC/JIT hiccup (1.845 s -> 4.949 s,
    "2.682x") while the tree's true ratio was ~1.05. With 3 alternating
    pairs the median ignores the hiccup pair entirely."""
    from tools.bench_ab import inconsistency, summarize_pairs

    pairs = [(1.845, 4.949), (1.9, 2.0), (1.85, 1.93)]  # pair 1 = hiccup
    entry = summarize_pairs(pairs)
    assert entry["pairs"] == 3
    assert entry["ab_ratio"] < 1.3, entry  # median, not the 2.68 hiccup
    # and even the hiccup-dominated entry self-reports: the pair spread
    # exceeds the consistency bar
    flag = inconsistency(entry, cold_sec=None)
    assert flag is not None and "spread" in flag


def test_phantom_flagged_against_same_session_cold():
    """The r14 driver-run shape: a 1-pair heavy query whose new-tree
    warm time (4.949 s) exceeded the same session's cold time (2.474 s)
    — caching cannot explain warm > cold, so the entry must be marked
    inconsistent rather than read as a 2.68x mover."""
    from tools.bench_ab import inconsistency, summarize_pairs

    entry = summarize_pairs([(1.845, 4.949)])
    assert entry["ab_ratio"] > 2.6  # the phantom the raw pair reads
    flag = inconsistency(entry, cold_sec=2.474)
    assert flag is not None and "cold" in flag
    # the normal case stays unflagged: warm below cold, stable pairs
    ok = summarize_pairs([(1.9, 2.0), (1.85, 1.93), (1.95, 2.02)])
    assert inconsistency(ok, cold_sec=2.474) is None


def test_pair_count_tiers():
    from tools.bench_ab import HEAVY_AB_SEC, MID_AB_SEC, n_pairs_for

    assert n_pairs_for(0.4) == 3
    assert n_pairs_for(None) == 3
    assert n_pairs_for(MID_AB_SEC + 0.1) == 2
    assert n_pairs_for(HEAVY_AB_SEC + 1) == 1


def test_registry_change_detection_degrades_to_unknown():
    """registry_changed is TRI-STATE: None (unknown) when git diff
    fails — 'could not determine' must stay distinguishable from
    'determined nothing changed'. With a real sha it reports
    __init__.py changes only (a boolean)."""
    import subprocess

    from tools.bench_ab import REPO, registry_changed

    assert registry_changed("not-a-sha") is None
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    assert registry_changed(head) in (True, False)
