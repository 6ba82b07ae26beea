"""Materialized dedup-index tests: index-then-query equals the inline
registry query; incremental append; bucket layout used."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import dedup_index
from data_pipeline_with_big_data_stack_spark.queries.textops import q_dedup_minhash_lsh, q_dedup_ngram_jaccard
from data_pipeline_with_big_data_stack_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def index_table(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    dedup_index.build_minhash_index(docs, "mh_index_test", n_buckets=8)
    yield "mh_index_test"
    spark.sql("DROP TABLE IF EXISTS mh_index_test")


def test_index_pairs_match_inline_query(spark, index_table):
    docs = load_table(spark, SF_SMOKE, "documents")
    via_index = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_index.candidate_pairs(spark.table(index_table)).collect()
    }
    inline = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    assert via_index == inline


def test_index_verify_matches_inline_jaccard(spark, index_table):
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = dedup_index.candidate_pairs(spark.table(index_table))
    via_index = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_index.verify_jaccard(pairs, docs).collect()
    }
    inline = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in q_dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    assert via_index == inline


def test_incremental_append_unions_signatures(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    first = docs.filter(F.col("doc_id") < 100)
    second = docs.filter(F.col("doc_id") >= 100)
    dedup_index.build_minhash_index(first, "mh_index_incr", n_buckets=4)
    dedup_index.build_minhash_index(
        second, "mh_index_incr", n_buckets=4, mode="append"
    )
    try:
        assert spark.table("mh_index_incr").count() == docs.count()
        # appended index yields the same pairs as a from-scratch build
        inc = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_index.candidate_pairs(spark.table("mh_index_incr")).collect()
        }
        full = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_index.candidate_pairs(
                dedup_index.minhash_signatures(docs)
            ).collect()
        }
        assert inc == full
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_index_incr")


def test_stream_dedup_ingest_equals_batch_lowest_partner_rule(spark):
    """The streaming ingestion dedup (batch-vs-materialized-index, round
    7) must emit exactly the batch rule's rejections: a doc is a dup iff
    it Jaccard-verifies against any lower-id doc, with dup_of = the
    lowest such partner — independent of micro-batch boundaries."""
    from data_pipeline_with_big_data_stack_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    pairs = QUERIES["q_dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    expected = {}
    for r in pairs:  # doc_a < doc_b by construction
        cur = expected.get(r.doc_b)
        if cur is None or r.doc_a < cur[0]:
            expected[r.doc_b] = (r.doc_a, r.jaccard)
    got = {
        r.doc_id: (r.dup_of, r.jaccard)
        for r in QUERIES["q_stream_dedup_ingest"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(got) > 0


# ---------------------------------------------------------------------
# Round 8: exactly-once streaming dedup (per-epoch overwrite partitions
# on ALL four sinks), the per-bucket count sidecar, and small-file
# compaction of the accumulated stores.
# ---------------------------------------------------------------------
import os

from pyspark.sql import functions as _F

from data_pipeline_with_big_data_stack_spark.operators import dedup_ingest as DI


def _small_docs(spark):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )


def _drain(spark, docs, **kw):
    base, src = DI.stage_ordered_chunks(spark, docs, n_chunks=4)
    store = DI.init_dedup_ingest_store(spark, base)
    DI.run_dedup_ingest_stream(spark, src, store, **kw)
    return store


def _snapshot(spark, store):
    out = {}
    for sink in ("decisions", "bands_idx", "counts", "docstore"):
        df = spark.read.parquet(getattr(store, sink))
        out[sink] = sorted(tuple(r) for r in df.collect())
    return out


def test_dedup_ingest_crash_retry_equals_single_run(spark):
    """Crash-injection: fail between a sink write and the checkpoint
    commit, restart, drain — every sink (including batch_id columns)
    must equal a crash-free single run. This is the exactly-once claim:
    a replayed epoch overwrites its own partitions and reads prior
    state partition-pruned to batch_id < eid, so retry == single run."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    docs = _small_docs(spark)
    ref = _snapshot(spark, _drain(spark, docs))

    for fail_after in ("decisions", "bands_idx", "counts", "docstore"):
        base, src = DI.stage_ordered_chunks(spark, docs, n_chunks=4)
        store = DI.init_dedup_ingest_store(spark, base)
        try:
            DI.run_dedup_ingest_stream(
                spark, src, store, fail_epoch=1, fail_after=fail_after
            )
            raise AssertionError("injected crash did not fire")
        except StreamingQueryException:
            pass
        # epoch 1's partitions may exist half-written; restart resumes
        # from the checkpoint and must replay epoch 1 idempotently
        DI.run_dedup_ingest_stream(spark, src, store)
        assert _snapshot(spark, store) == ref, f"diverged after {fail_after} crash"


def test_dedup_ingest_prior_counts_come_from_sidecar(spark):
    """Behavioral pin for the O(batch) claim: poison the counts sidecar
    for one bucket (leave the bands index untouched) and check the next
    batch's assigned ranks follow the SIDECAR value — impossible if the
    code still aggregated the accumulated bands index for prior
    occupancy."""
    import tempfile

    base = tempfile.mkdtemp(prefix="dedup_sidecar_pin_")
    store = DI.init_dedup_ingest_store(spark, base)
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "totally unrelated words here entirely different")],
        "doc_id long, text string",
    )
    DI.dedup_ingest_batch(b1, 0, store)
    counts = spark.read.parquet(store.counts).filter("batch_id = 0")
    assert counts.count() > 0
    # poison: claim every bucket already holds 1000 prior members
    # (collect first — writing a plan that reads the dir it overwrites
    # races its own source files)
    rows = [
        (r["band"], r["band_key"], 1000)
        for r in counts.drop("batch_id").collect()
    ]
    spark.createDataFrame(
        rows, "band int, band_key string, n long"
    ).write.mode("overwrite").parquet(os.path.join(store.counts, "batch_id=0"))
    b2 = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    DI.dedup_ingest_batch(b2, 1, store, max_bucket=256)
    ep1 = spark.read.parquet(store.bands_idx).filter("batch_id = 1")
    # every bucket doc 3 shares with doc 1 claims 1000 prior members →
    # rk > 256 → capped away; sidecar-driven, so nothing survives
    assert ep1.count() == 0


def test_dedup_ingest_sidecar_consistent_with_index(spark):
    """After a multi-epoch drain the sidecar's running max per bucket
    equals the bands index's max rank per bucket."""
    store = _drain(spark, _small_docs(spark))
    from_counts = (
        spark.read.parquet(store.counts)
        .groupBy("band", "band_key")
        .agg(_F.max("n").alias("n"))
    )
    from_index = (
        spark.read.parquet(store.bands_idx)
        .groupBy("band", "band_key")
        .agg(_F.max("rk").alias("n"))
    )
    assert sorted(map(tuple, from_counts.collect())) == sorted(
        map(tuple, from_index.collect())
    )


def test_compact_dedup_ingest_store_preserves_contents(spark):
    """Small-file hygiene: folding all committed epochs into the highest
    batch_id partition must preserve every sink's rows (modulo the
    batch_id column) and cut the file count to O(1)."""
    from data_pipeline_with_big_data_stack_spark.operators.layout import table_files

    store = _drain(spark, _small_docs(spark))
    before = {
        sink: sorted(
            tuple(r)
            for r in spark.read.parquet(getattr(store, sink))
            .drop("batch_id")
            .collect()
        )
        for sink in ("decisions", "bands_idx", "counts", "docstore")
    }
    pre_files = {
        sink: len(table_files(spark, getattr(store, sink)))
        for sink in before
    }
    new_counts = DI.compact_dedup_ingest_store(spark, store)
    for sink, rows in before.items():
        after = sorted(
            tuple(r)
            for r in spark.read.parquet(getattr(store, sink))
            .drop("batch_id")
            .collect()
        )
        assert after == rows, f"{sink} contents changed by compaction"
        assert new_counts[sink] <= 2, f"{sink} still has {new_counts[sink]} files"
        assert new_counts[sink] < pre_files[sink]
