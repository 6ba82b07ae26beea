"""Streaming/incremental exact-substring dedup (round 13,
operators/substring_ingest): the drained decisions must equal the batch
operator's full-corpus result for ANY chunking (batch-boundary
independence), survive crash-replay exactly-once, and prior index reads
must prune to the batch's touched fingerprint buckets.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_with_big_data_stack_spark.operators import substring_ingest as SI
from data_pipeline_with_big_data_stack_spark.operators.dedup_ingest import (
    stage_ordered_chunks,
)
from data_pipeline_with_big_data_stack_spark.queries.curation import (
    exact_substring_dedup,
)
from data_pipeline_with_big_data_stack_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _small_docs(spark):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )


def _drain(spark, docs, tmp, n_chunks=4, **kw):
    base, src = stage_ordered_chunks(spark, docs, n_chunks=n_chunks)
    store = SI.init_substring_store(spark, os.path.join(base, "store"))
    SI.run_substring_ingest_stream(spark, src, store, **kw)
    return store


def _decisions(spark, store):
    return sorted(
        tuple(r)
        for r in store.read(spark, "decisions").drop("batch_id").collect()
    )


def test_drained_equals_batch_for_any_chunking(spark, tmp_path):
    """Keep-first decisions depend only on lower positions and ids
    arrive monotone, so 2-chunk and 5-chunk drains must both equal the
    from-scratch batch operator exactly."""
    docs = _small_docs(spark)
    ref = sorted(tuple(r) for r in exact_substring_dedup(docs).collect())
    assert len(ref) > 0
    for n_chunks in (2, 5):
        store = _drain(spark, docs, tmp_path, n_chunks=n_chunks)
        assert _decisions(spark, store) == ref, f"diverged at {n_chunks} chunks"


def test_crash_retry_equals_single_run(spark, tmp_path):
    """Crash after the decisions publish but before the index publish,
    restart, drain — both sinks (including batch_id columns) must equal
    a crash-free run: the replayed epoch overwrites its own partitions
    and reads prior state filtered to batch_id < eid."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    docs = _small_docs(spark)
    ref_store = _drain(spark, docs, tmp_path)
    ref = {
        s: sorted(tuple(r) for r in ref_store.read(spark, s).collect())
        for s in ("decisions", "windows_idx")
    }

    base, src = stage_ordered_chunks(spark, docs, n_chunks=4)
    store = SI.init_substring_store(spark, os.path.join(base, "store"))
    with pytest.raises(StreamingQueryException):
        SI.run_substring_ingest_stream(
            spark, src, store, fail_epoch=1, fail_after="decisions"
        )
    SI.run_substring_ingest_stream(spark, src, store)
    got = {
        s: sorted(tuple(r) for r in store.read(spark, s).collect())
        for s in ("decisions", "windows_idx")
    }
    assert got == ref


def test_index_grows_only_by_new_windows(spark, tmp_path):
    """A batch whose windows are ALL already indexed appends nothing:
    the index holds one row per distinct corpus window, ever."""
    rows = [(i, "w1 w2 w3 w4 w5 w6 w7 w8 tail%d" % i) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    store = _drain(spark, docs, tmp_path, n_chunks=4)
    idx = store.read(spark, "windows_idx")
    n_distinct = idx.select("w1", "w2").distinct().count()
    assert idx.count() == n_distinct, "index must never hold repeats"
    # every doc shares the 8-token prefix window; docs 1+ carry only
    # their two novel suffix windows beyond doc 0's
    d = {r.doc_id: r for r in store.read(spark, "decisions").collect()}
    assert d[0].n_dup_windows == 0
    for i in range(1, 8):
        assert d[i].n_dup_windows == 1, i  # the shared prefix window


def test_prior_reads_prune_to_touched_buckets(spark, tmp_path, monkeypatch):
    """The prior index read must filter to the batch's touched
    fingerprint buckets — scan cost O(touched fraction), never
    O(accumulated index). Pinned on the pushed partition filters of the
    prior DataFrame the batch actually builds."""
    captured = []
    orig = SI.substring_ingest_batch

    def spy(batch, eid, store, k=8, fail_after=None):
        if eid > 0:
            # rebuild the prior frame the batch will read and record its
            # partition pruning
            from data_pipeline_with_big_data_stack_spark.queries.curation import (
                substring_windows,
            )

            _b, c = substring_windows(batch.select("doc_id", "text"), k)
            c = c.withColumn(
                "bkt", F.pmod(F.hash("w1"), F.lit(store.n_bkt)).cast("int")
            )
            touched = [
                int(r["bkt"]) for r in c.select("bkt").distinct().collect()
            ]
            prior = (
                store.read(batch.sparkSession, "windows_idx")
                .filter(F.col("batch_id") < F.lit(int(eid)))
                .filter(F.col("bkt").isin(touched))
            )
            plan = prior._jdf.queryExecution().executedPlan().toString()
            captured.append((eid, touched, plan))
        return orig(batch, eid, store, k=k, fail_after=fail_after)

    monkeypatch.setattr(SI, "substring_ingest_batch", spy)
    docs = _small_docs(spark).filter(F.col("doc_id") < 40)
    _drain(spark, docs, tmp_path)
    assert captured, "no epoch past 0 drained"
    for eid, touched, plan in captured:
        assert "PartitionFilters" in plan
        assert "bkt" in plan, "bucket prune missing from the prior scan"


def test_init_refuses_existing_store(spark, tmp_path):
    base = str(tmp_path / "store")
    SI.init_substring_store(spark, base)
    with pytest.raises(FileExistsError, match="already initialized"):
        SI.init_substring_store(spark, base)


def test_store_refuses_to_guess_n_bkt(spark, tmp_path):
    st = SI.SubstringIngestStore(str(tmp_path / "nowhere"))
    with pytest.raises(RuntimeError, match="refusing to guess n_bkt"):
        _ = st.n_bkt


def test_sub_k_docs_flow_through_with_zero_windows(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    store = _drain(spark, docs, tmp_path, n_chunks=3)
    d = {r.doc_id: r for r in store.read(spark, "decisions").collect()}
    assert d[0].n_windows == 0 and d[0].kept_tokens == 3
    assert d[1].n_dup_windows == 0 and d[1].kept_tokens == 8
    assert d[2].n_dup_windows == 1 and d[2].kept_tokens == 0
