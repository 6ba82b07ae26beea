"""Same-session code A/B for bench movers (VERDICT r11 #2).

Three rounds running, raw per-query round-over-round ratios were
unreadable for shared-host drift (`q_doc_quality_scores` r10, the ANN
maintenance family r11) and the answer each time was a MANUAL
``git worktree`` A/B. This automates it: check out the previous
round's bench commit in a detached worktree, import BOTH trees into
the one live SparkSession (sequentially, with the package purged from
``sys.modules`` between phases so a tree never executes against the
other tree's modules), re-time the movers warm back-to-back, and emit
``ab_ratio = new/old`` per query. A ratio near 1.0 says the
round-over-round move was host drift; a ratio matching the raw move
says the code changed the query.

Used by ``bench.py`` (full per-query results land in
BENCH_DETAIL.json's ``ab`` block; the compact line carries only a
summary) and runnable standalone::

    python tools/bench_ab.py q_ann_ivfpq_index_search ...

Baseline resolution: the newest ``BENCH_r{N}.json`` in the repo root
names the previous round; the commit that last touched it is the tree
that produced those numbers (the driver commits artifacts at round
end, code-identical to the round's HEAD).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the store-protocol-sensitive family: always A/B'd, whether or not
# the raw round-over-round ratio flags them (VERDICT r11 asked for the
# whole family after r11's single-member manual A/B)
AB_ALWAYS = (
    "q_ann_ivfpq_versioned_lifecycle",
    "q_ann_ivfpq_index_retrain",
    "q_ann_ivfpq_recall_monitor",
    "q_ann_ivfpq_index_search",
    "q_ann_ivfpq_index_expire",
)
MOVER_RATIO = 1.2
MAX_AB_QUERIES = 12
# pair-count tiers (VERDICT r14 #2: a single alternating pair is still
# a one-sample measurement — r14's driver run read a phantom 2.68× on
# kmeans from one GC/JIT hiccup): cheap queries take the median of 3
# alternating old/new pairs, mid-cost 2, and only the heavy family
# keeps 1 pair (disclosed per-entry via "pairs")
MID_AB_SEC = 2.0
HEAVY_AB_SEC = 6.0
# self-consistency bar: an ab new-tree time that exceeds the SAME
# session's cold time by >1.3× cannot be a code property (warm ≤ cold
# is the only direction caching explains) — flag, don't report as a
# mover; same bar for the spread between a query's own pair ratios
CONSISTENCY_RATIO = 1.3
# the N most expensive queries this round are ALWAYS A/B'd (VERDICT r12
# #3: r12's biggest absolute cost, a 15 s query at raw 1.3×, was crowded
# out of the fill by sub-second 1.6× movers)
TOP_COST_AB = 3
_PKG = "data_pipeline_with_big_data_stack_spark"


def _imported_modules(src: str) -> set[str]:
    """Every dotted module name ``src`` imports — AST-walked, so lazy
    in-function imports count and docstring citations (this repo
    cross-cites module names liberally in prose) do NOT. A ``from X
    import y`` records both X and X.y: y may be a module or a symbol,
    and the ambiguity only ever ADDS an edge."""
    import ast

    out: set[str] = set()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return out
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            out.add(node.module)
            for a in node.names:
                out.add(node.module + "." + a.name)
        elif isinstance(node, ast.Import):
            for a in node.names:
                out.add(a.name)
    return out


def _reference_closure(changed_files: set[str]) -> set[str]:
    """Expand a changed-file set along IMPORT edges to a fixpoint: a
    module joins when it imports a changed (or already-joined) module.
    Queries import their operators lazily by dotted name, so an
    operator-module change must mark the query modules that use it —
    transitively (operators → operators → queries → queries: e.g. a
    rollup_maintenance change reaches streaming_queries through
    curation, one import level past a single hop). Import edges are
    PRECISE, so the fixpoint stays small — the flood risk belonged to
    text matching (this repo cross-cites module names in prose
    everywhere, which saturated a basename closure at ~every module).
    ``__init__.py`` re-export hubs are excluded: everything imports the
    registry, so letting ``queries/__init__`` join-and-propagate would
    mark every module whenever any query module changes."""
    pkg_root = os.path.join(REPO, _PKG)
    imports: dict[str, set[str]] = {}
    for dirpath, _dirs, files in os.walk(pkg_root):
        for f in files:
            if f.endswith(".py") and f != "__init__.py":
                p = os.path.join(dirpath, f)
                rel = os.path.relpath(p, REPO)
                try:
                    with open(p) as fh:
                        imports[rel] = _imported_modules(fh.read())
                except OSError:
                    continue
    changed = {f for f in changed_files if f in imports}
    while True:
        names = {f[: -len(".py")].replace("/", ".") for f in changed}
        grown = changed | {
            rel
            for rel, imp in imports.items()
            if rel not in changed and imp & names
        }
        if grown == changed:
            return changed
        changed = grown


def registry_changed(sha: str) -> bool | None:
    """True when a package ``__init__.py`` changed since ``sha`` —
    registry-level files (the ``@query`` decorator and re-export hubs in
    ``queries/__init__.py``) are deliberately EXCLUDED from the import
    closure (everything imports the registry, so letting them propagate
    would mark every query), which means a registry change used to
    yield a silently empty touched set (ADVICE r14). The flag is
    recorded in the ab block instead: "every query is potentially
    touched this round". TRI-STATE: None when git itself failed —
    'could not determine' must stay distinguishable from 'determined
    nothing changed', or the degraded path recreates the silent
    misread the flag exists to prevent (code-review r15)."""
    try:
        diff = subprocess.run(
            ["git", "diff", "--name-only", sha, "--", _PKG],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except Exception:  # noqa: BLE001 - no git → unknown
        return None
    return any(f.endswith("__init__.py") for f in diff)


def touched_queries(sha: str, modules: dict[str, str]) -> set[str]:
    """Queries whose defining module — or any package module it
    (transitively) references — changed between the baseline commit and
    the working tree (VERDICT r13 #3: a touched-this-round query
    deserves a guaranteed A/B slot — r13's `q_doc_repeated_chunk_removal`
    moved 1.24× raw after a code change but was crowded out of the fill
    by bigger absolute movers, so the regression escaped attribution).
    ``modules`` maps query name → defining module (the registry
    callable's ``__module__``). Module-granular by design: the diff
    can't see which function inside a changed file moved, and the
    mover filter below keeps the set from flooding the block when a
    wide module changes."""
    try:
        diff = subprocess.run(
            ["git", "diff", "--name-only", sha, "--", _PKG],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except Exception:  # noqa: BLE001 - no git → no touched set
        return set()
    changed = _reference_closure(set(diff))
    return {
        q
        for q, mod in modules.items()
        if mod.replace(".", "/") + ".py" in changed
    }


def previous_round_baseline() -> tuple[int, str, dict] | None:
    """(round, commit, best-of-3 times) of the newest bench snapshot,
    or None when unresolvable (first round, no git, missing files).
    Filenames come from the directory listing itself — early rounds are
    zero-padded (``BENCH_r01.json``), so reconstructing the name from
    the parsed number would silently miss them. The per-query detail
    snapshot is preferred; the compact ``BENCH_r{N}.json`` fallback
    carries only the top-12 queries, so baseline coverage is recorded
    for the ab block to disclose."""
    rounds: dict[int, str] = {}
    for f in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            rounds[int(m.group(1))] = f
    if not rounds:
        return None
    n = max(rounds)
    bench = rounds[n]
    # detail snapshots are unpadded (BENCH_DETAIL_r6.json) while early
    # compact snapshots are padded (BENCH_r06.json) — try both forms
    src = bench
    for cand in (f"BENCH_DETAIL_r{n}.json", bench.replace("BENCH_r", "BENCH_DETAIL_r")):
        if os.path.exists(os.path.join(REPO, cand)):
            src = cand
            break
    try:
        with open(os.path.join(REPO, src)) as fh:
            times = json.load(fh).get("queries") or {}
        sha = subprocess.run(
            ["git", "log", "-n1", "--format=%H", "--", bench],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 - no git / unreadable snapshot
        return None
    return (n, sha, times) if sha else None


def pick_movers(
    current: dict, baseline: dict, touched: set[str] | None = None
) -> list[str]:
    """Queries to A/B: the always-A/B family, then the TOP_COST_AB most
    expensive queries this round (the biggest absolute cost must never
    escape attribution), then TOUCHED movers — queries whose module
    changed since the baseline AND whose raw ratio crossed MOVER_RATIO
    (VERDICT r13 #3: a code-touched mover must never be crowded out by
    bigger untouched movers) — then remaining raw movers ranked by
    ``|log ratio| × old_sec`` — ratio-weighted absolute seconds, so a
    15 s query at raw 1.3× outranks a 0.4 s query at raw 1.6×.

    MAX_AB_QUERIES caps only the weighted FILL: the three mandatory
    tiers (always family, top-cost, touched movers) are exempt, so a
    round with 5+ touched movers grows the block instead of silently
    dropping the overflow (ADVICE r14 — the hard cap contradicted the
    'never crowded out' guarantee)."""
    import math

    touched = touched or set()
    scored = []
    for q, new in current.items():
        old = baseline.get(q)
        if not old or not new:
            continue
        r = new / old
        if r > MOVER_RATIO or r < 1.0 / MOVER_RATIO:
            scored.append((abs(math.log(r)) * old, q))
    movers = [q for _s, q in sorted(scored, reverse=True)]
    top_cost = sorted(current, key=lambda q: current[q] or 0.0, reverse=True)
    out = [q for q in AB_ALWAYS if q in current]
    out += [q for q in top_cost[:TOP_COST_AB] if q not in out]
    out += [q for q in movers if q in touched and q not in out]
    fill = [q for q in movers if q not in out]
    out += fill[: max(0, MAX_AB_QUERIES - len(out))]
    return out


def _purge_pkg() -> None:
    for k in list(sys.modules):
        if k == _PKG or k.startswith(_PKG + "."):
            del sys.modules[k]


def _load_queries(tree_root: str) -> dict:
    """Import the tree at ``tree_root`` and return its QUERIES registry.
    The package is purged first so EVERY module (operators included)
    resolves inside this tree — queries import operators lazily by
    absolute name at call time, and a stale sys.modules entry would
    silently mix the two trees."""
    _purge_pkg()
    sys.path.insert(0, tree_root)
    try:
        mod = __import__(_PKG + ".queries", fromlist=["QUERIES"])
        return mod.QUERIES
    finally:
        sys.path.remove(tree_root)


def _time_query(
    spark, queries: dict, name: str, sf_dir: str, timed_runs: int = 2
) -> float | None:
    """Warmup + best-of-``timed_runs`` warm executions via the noop
    sink (the same semantics as bench.run_query's best-of-3, cheaper —
    the A/B compares numbers taken seconds apart on one host). Multi-
    pair queries pass ``timed_runs=1``: the cross-pair median supplies
    the robustness there, so each measurement stays cheap. None:
    missing from this tree's registry, or errored (an old-tree query
    can legitimately fail under the new session/fixtures — one such
    failure must not abort the whole A/B)."""
    if name not in queries:
        return None
    best = None
    try:
        for i in range(1 + timed_runs):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            if i > 0:  # the warmup run pays this tree's codegen/file-index
                best = dt if best is None else min(best, dt)
    except Exception:  # noqa: BLE001 - isolate per query
        return None
    return best


def n_pairs_for(cost_sec: float | None) -> int:
    """Alternating old/new pair count by query cost: 3 for cheap, 2 for
    mid, 1 for the heavy family (disclosed per-entry as "pairs" — the
    single-pair exception VERDICT r14 #2 allows)."""
    if cost_sec is None or cost_sec <= MID_AB_SEC:
        return 3
    if cost_sec <= HEAVY_AB_SEC:
        return 2
    return 1


def summarize_pairs(pairs: list[tuple[float, float]]) -> dict:
    """Fold a query's (old_sec, new_sec) pairs into the ab entry:
    medians per tree, ab_ratio = MEDIAN of the per-pair ratios (a
    single GC/JIT hiccup in one pair cannot move it), the pair count,
    and the raw per-pair ratios for the spread check."""
    import statistics

    ratios = [n / o for o, n in pairs]
    return {
        "old_sec": round(statistics.median(o for o, _ in pairs), 3),
        "new_sec": round(statistics.median(n for _, n in pairs), 3),
        "ab_ratio": round(statistics.median(ratios), 3),
        "pairs": len(pairs),
        "pair_ratios": [round(r, 3) for r in ratios],
    }


def inconsistency(
    entry: dict, cold_sec: float | None, threshold: float = CONSISTENCY_RATIO
) -> str | None:
    """Self-consistency check (VERDICT r14 #2): the reason string when
    the entry's ab_ratio must NOT be read as a code mover, else None.
    Two independent triggers: (a) the new-tree warm median exceeds the
    SAME session's cold time by >threshold — warm ≤ cold is the only
    direction caching explains, so the excess is a measurement hiccup,
    not code (r14's kmeans "2.682×" read 4.949 s warm against a 2.474 s
    same-session cold); (b) the query's own pair ratios disagree by
    >threshold — the method is unstable on this query this session."""
    if cold_sec and entry["new_sec"] > threshold * cold_sec:
        return (
            f"new_sec {entry['new_sec']} > {threshold}x same-session "
            f"cold {cold_sec} — measurement hiccup, not code"
        )
    pr = entry.get("pair_ratios") or []
    if len(pr) > 1 and min(pr) > 0 and max(pr) / min(pr) > threshold:
        return (
            f"pair ratios {min(pr)}..{max(pr)} spread >{threshold}x — "
            "unstable measurement this session"
        )
    return None


def _host_probe(spark, sf_dir: str) -> float:
    """Tiny fixed host-speed probe (best-of-3 constant scan+aggregate),
    recorded at both ends of the A/B block: a load ramp across the
    block would stretch late pairs' measurements — the probe pair makes
    that visible (each ratio's own exposure is only its interleaved
    old→new window)."""
    li = os.path.join(sf_dir, "lineitem.parquet")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(li).selectExpr("sum(l_quantity)", "count(*)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def run_ab(
    spark,
    sf_dir: str,
    names: list[str],
    baseline: tuple[int, str, dict] | None = None,
    cold: dict | None = None,
) -> dict:
    """A/B the named queries against the previous round's tree inside
    THIS session. Returns the BENCH_DETAIL ``ab`` block. Never raises —
    an unresolvable baseline returns {"skipped": reason}; a query that
    errors on either tree is simply absent from ``ratios``. Pass the
    already-resolved ``baseline`` tuple (from
    :func:`previous_round_baseline`) to avoid re-resolving it, and the
    same-session cold times (``cold``) so every entry is self-checked
    against them (:func:`inconsistency`)."""
    base = baseline if baseline is not None else previous_round_baseline()
    if base is None:
        return {"skipped": "no previous bench snapshot or git history"}
    if not names:
        return {"skipped": "no movers and no always-A/B queries present"}
    n, sha, times = base
    wt = f"/tmp/bench_ab_r{n}_{os.getpid()}"
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        )
    except Exception as exc:  # noqa: BLE001
        return {"skipped": f"worktree add failed: {exc}"[:200]}
    out: dict[str, dict] = {}
    probe_old = probe_new = None
    err = None
    try:
        # INTERLEAVED per query (round 14), MEDIAN OF PAIRS (round 15,
        # VERDICT r14 #2): the original two-phase design left each
        # ratio exposed to minutes of host/JVM drift; interleaving
        # shrank the window to one old→new pair — but one pair is one
        # sample, and r14's driver run landed a pair on a GC/JIT
        # hiccup and read a phantom 2.68× on an untouched query. Now
        # each query runs n_pairs_for(cost) alternating pairs (3 cheap
        # / 2 mid / 1 heavy, pair count disclosed per entry) and
        # ab_ratio is the MEDIAN of per-pair ratios; every entry is
        # additionally self-checked against the same-session cold time
        # and its own pair spread (`inconsistency`) so a phantom is
        # marked instead of reported as a mover. The per-phase host
        # probes bracket the whole block as before.
        probe_old = _host_probe(spark, sf_dir)
        alt = 0  # global alternation index across all measurements
        for q in names:
            cost = (cold or {}).get(q) or times.get(q)
            k = n_pairs_for(cost)
            pairs: list[tuple[float, float]] = []
            for _p in range(k):
                order = ("old", "new") if alt % 2 == 0 else ("new", "old")
                alt += 1
                m = {}
                for tree in order:
                    qs = _load_queries(wt if tree == "old" else REPO)
                    m[tree] = _time_query(
                        spark, qs, q, sf_dir, timed_runs=1 if k > 1 else 2
                    )
                if m.get("old") is not None and m.get("new") is not None:
                    pairs.append((m["old"], m["new"]))
            if not pairs:
                continue
            entry = summarize_pairs(pairs)
            flag = inconsistency(entry, (cold or {}).get(q))
            if flag:
                entry["inconsistent"] = flag
            out[q] = entry
        probe_new = _host_probe(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 - never fail the bench over A/B
        err = f"{type(exc).__name__}: {exc}"[:200]
    finally:
        _purge_pkg()  # leave the process on the current tree's modules
        try:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO,
                capture_output=True,
                check=False,
            )
        except Exception:  # noqa: BLE001 - stale worktrees are harmless
            pass
    if err and not out:
        return {"skipped": f"A/B failed: {err}"}
    result = {
        "baseline_round": n,
        "baseline_commit": sha[:12],
        # top-12-only compact fallback baselines can't flag cheap movers
        "baseline_query_coverage": len(times),
        "phase_probe_old_sec": probe_old,
        "phase_probe_new_sec": probe_new,
        # queries whose ab_ratio failed the self-consistency check —
        # read these as measurement artifacts, never as code movers
        "inconsistent": sorted(q for q, e in out.items() if "inconsistent" in e),
        "ratios": out,
    }
    if err:
        result["error"] = err
    return result


def main() -> None:
    sys.path.insert(0, REPO)
    from data_pipeline_with_big_data_stack_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(AB_ALWAYS)
    spark = get_spark(app_name="bench-ab")
    print(json.dumps(run_ab(spark, sf_dir, names), indent=1))


if __name__ == "__main__":
    main()
