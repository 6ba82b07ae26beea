#!/usr/bin/env python
"""Order-of-magnitude scale probe (VERDICT r13 #8): the parquet
fixtures stop at sf0.1 (5,000 docs / 0.6 MB), so every linear-plan
claim above that is plan-shape argument. This probe generates an
~sf1-equivalent corpus — 10× the sf0.1 row counts, same generator
family and distributions as tools/scale_audit.py — runs the heavy
curation + substring-dedup family ONCE, and reports per-query wall
seconds plus SHUFFLE BYTES (read/write deltas from Spark's
AppStatusStore stage metrics): direct evidence the claims hold an
order of magnitude up, and a better drift anchor than kB-scale files.

Used by bench.py when ``SPARK_GRAFT_SCALE_PROBE=1`` (results land in
BENCH_DETAIL.json under ``scale_probe``); runnable standalone::

    python tools/scale_probe.py [n_docs]

Shuffle bytes are cumulative across a query's stages (AQE re-uses
nothing between the probe queries' fresh inputs), measured as a
before/after snapshot delta — concurrent Spark work in the same
session would pollute the delta, so the probe runs its queries
serially and nothing else.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the order-of-magnitude set: the end-to-end curation pipeline, both
# exact-substring dedup forms (batch + the incremental drain WITH its
# in-drain folds), and the LSH dedup — the operators whose 100 TB story
# depends on banded/bucketed candidate generation staying linear
PROBE_QUERIES = [
    "q_curation_pipeline",
    "q_doc_exact_substring_dedup",
    "q_stream_exact_substring_dedup",
    "q_dedup_minhash_lsh",
]
N_DOCS_SF1 = 50_000  # 10x the sf0.1 fixture's 5,000 docs


def _stage_rows(spark) -> list[tuple[int, int, int]]:
    """(stage_id, write_bytes, read_bytes) for every stage the
    AppStatusStore currently RETAINS — the store evicts old stages past
    spark.ui.retainedStages, so whole-app sums are not delta-safe."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    seq = store.stageList(
        gw.jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        gw.jvm.java.util.ArrayList(),
    )
    it = seq.iterator()
    out = []
    while it.hasNext():
        s = it.next()
        out.append(
            (s.stageId(), s.shuffleWriteBytes(), s.shuffleReadBytes())
        )
    return out


def max_stage_id(spark) -> int:
    """High-water stage id — the eviction-safe interval marker (stage
    ids are monotonic, so 'stages run since' = ids above the mark)."""
    return max((sid for sid, _w, _r in _stage_rows(spark)), default=-1)


def shuffle_since(spark, after_stage_id: int) -> tuple[int, int]:
    """(write_bytes, read_bytes) summed over stages with id >
    ``after_stage_id``. Id-based rather than a whole-app before/after
    sum: in a long-lived session (the bench's, after the 150+-query
    headline pass) the status store is saturated and every new stage
    EVICTS an old one, so a sum delta under-counts or goes negative;
    new-id stages are always retained long enough to read here because
    nothing else runs between a probe query and its snapshot."""
    w = r = 0
    for sid, sw, sr in _stage_rows(spark):
        if sid > after_stage_id:
            w += sw
            r += sr
    return w, r


def gen_corpus(n_docs: int) -> str:
    """A fresh sf1-equivalent dataset dir (documents + the small events/
    embeddings side tables some probe queries join)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import scale_audit

    d = tempfile.mkdtemp(prefix="scale_probe_sf1_")
    # events/vecs scaled with docs (same ratios as the audit's twins)
    scale_audit.gen(d, n_events=20 * n_docs, n_docs=n_docs, n_vecs=2 * n_docs)
    return d


def run_probe(spark, n_docs: int = N_DOCS_SF1) -> dict:
    """One pass over PROBE_QUERIES at the generated scale. Wall seconds
    include plan construction (iterative operators run driver actions
    while building); shuffle bytes are the app-level stage-metric delta
    around each query's single execution."""
    import shutil

    from data_pipeline_with_big_data_stack_spark.queries import QUERIES

    d = gen_corpus(n_docs)
    out: dict = {"n_docs": n_docs, "queries": {}}
    try:
        for name in PROBE_QUERIES:
            try:
                mark = max_stage_id(spark)
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                sec = time.perf_counter() - t0
                w, r = shuffle_since(spark, mark)
                out["queries"][name] = {
                    "sec": round(sec, 3),
                    "shuffle_write_bytes": int(w),
                    "shuffle_read_bytes": int(r),
                }
            except Exception as exc:  # noqa: BLE001 - isolate per query
                out["queries"][name] = {
                    "error": f"{type(exc).__name__}: {exc}"[:200]
                }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def main() -> None:
    from data_pipeline_with_big_data_stack_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_SF1
    spark = get_spark(app_name="scale-probe")
    print(json.dumps(run_probe(spark, n_docs), indent=1))


if __name__ == "__main__":
    main()
