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
