"""Behavioral tests for the training-data curation operators —
redaction on crafted PII, connected-component exactness, chunk window
arithmetic, split determinism. Cross-engine parity for the registry
queries themselves lives in test_parity.py."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_pipeline_with_big_data_stack_spark.queries.curation import (
    _CHUNK,
    _STRIDE,
    connected_components,
    q_doc_chunking,
    q_doc_gopher_quality,
    q_doc_hash_split,
    redact_pii,
)
from tests.conftest import SF_SMOKE


def test_pii_redaction_replaces_and_counts(spark):
    rows = [
        ("reach me at jane.doe+x@example.co.uk today", "<EMAIL>"),
        ("call +1 (555) 123-4567 now", "<PHONE>"),
        ("server at 10.0.255.7 rebooted", "<IP>"),
        ("no pii here at all", None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    out = df.select(redact_pii(F.col("text")).alias("red")).collect()
    for (text, token), r in zip(rows, out):
        if token is None:
            assert r.red == text
        else:
            assert token in r.red, (text, r.red)
            # nothing of the original sensitive token survives
            assert "@" not in r.red if token == "<EMAIL>" else True


def test_pii_email_redacted_before_phone():
    # digits inside an email local-part must not be phone-matched
    import duckdb  # noqa: F401  (parity engine for the same regexes)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([("mail 12345678901@example.com end",)], ["text"])
    red = df.select(redact_pii(F.col("text")).alias("r")).head().r
    assert red == "mail <EMAIL> end"


def test_connected_components_exact(spark):
    # chain 1-2-3, separate pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)], ["a", "b"]
    )
    got = {
        (r.node, r.label) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_chain_converges(spark):
    # 64-node path graph: diameter 63 exceeds the old one-hop 20-round
    # bound (which silently returned wrong labels); pointer doubling must
    # collapse it in ~log2(63) rounds. Oracle: DuckDB recursive CTE.
    import duckdb

    n = 63
    pairs = [(i, i + 1) for i in range(n)]
    edges = spark.createDataFrame(pairs, ["a", "b"])
    labels = {(r.node, r.label) for r in connected_components(edges).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", pairs)
    oracle = {
        (node, lab)
        for node, lab in con.execute(
            """
            WITH RECURSIVE sym AS (
              SELECT a, b FROM e UNION SELECT b, a FROM e),
            reach AS (
              SELECT a AS node, b AS peer FROM sym
              UNION
              SELECT r.node, s.b FROM reach r JOIN sym s ON r.peer = s.a)
            SELECT node, least(node, min(peer)) FROM reach GROUP BY node
            """
        ).fetchall()
    }
    con.close()
    assert labels == oracle
    assert {lab for _, lab in labels} == {0}


def test_connected_components_random_graph_matches_union_find(spark):
    # fixed-seed random sparse graph vs a driver-side union-find
    import random

    rng = random.Random(7)
    n = 400
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(300)})
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component for every node that appears in an edge
    touched = {x for p in pairs for x in p}
    expected = {}
    comp_min = {}
    for x in sorted(touched):
        comp_min.setdefault(find(x), x)
    for x in touched:
        expected[x] = comp_min[find(x)]

    edges = spark.createDataFrame(pairs, ["a", "b"])
    got = {r.node: r.label for r in connected_components(edges).collect()}
    assert got == expected


def test_chunking_covers_every_token_once_per_window(spark):
    out = q_doc_chunking(spark, SF_SMOKE).toPandas()
    assert (out.n_chunk_tokens <= _CHUNK).all()
    assert (out.n_chunk_tokens >= 1).all()
    # chunk_idx dense from 0 per doc
    for _, g in out.groupby("doc_id"):
        idx = sorted(g.chunk_idx)
        assert idx == list(range(len(idx)))
    # every chunk except possibly the last per doc is full-width when the
    # doc has >= _CHUNK tokens
    g0 = out[out.doc_id == out.doc_id.iloc[0]].sort_values("chunk_idx")
    if len(g0) > 1:
        assert (g0.n_chunk_tokens.iloc[:-1] >= _CHUNK - _STRIDE).all()


def test_hash_split_deterministic_and_proportioned(spark):
    a = q_doc_hash_split(spark, SF_SMOKE).toPandas()
    b = q_doc_hash_split(spark, SF_SMOKE).toPandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))
    frac = a.split.value_counts(normalize=True)
    assert frac["train"] == pytest.approx(0.90, abs=0.06)
    assert frac.get("val", 0) + frac.get("test", 0) == pytest.approx(
        0.10, abs=0.06
    )


def test_gopher_quality_flags_vary(spark):
    out = q_doc_gopher_quality(spark, SF_SMOKE).toPandas()
    assert out.mean_word_len.between(1, 20).all()
    assert out.dup_word_frac.between(0, 1).all()
    assert out.top_bigram_frac.between(0, 1).all()


def test_gapfill_locf_fills_holes(spark):
    from data_pipeline_with_big_data_stack_spark.queries.timeseries import q_events_gapfill_locf
    from tests.conftest import SF_SMOKE

    out = q_events_gapfill_locf(spark, SF_SMOKE).toPandas()
    # dense grid: every type has every hour exactly once
    per_type = out.groupby("event_type").hour.count()
    assert per_type.nunique() == 1
    # unobserved buckets after the first observation carry a value
    for _, g in out.groupby("event_type"):
        g = g.sort_values("hour")
        seen = g.observed.cummax()
        filled = g[seen & ~g.observed]
        if len(filled):
            assert filled.value_filled.notna().all()
    assert (~out.observed).any(), "fixture should contain gaps"


def test_cluster_aware_split_never_splits_a_dup_cluster(spark):
    """The leakage guard's whole contract: every member of a duplicate
    cluster carries the same split_key and therefore the same split —
    a near-duplicate can never straddle train/test. Singletons must
    key on themselves, making their assignment identical to the naive
    per-doc hash split (same salt, same device)."""
    from data_pipeline_with_big_data_stack_spark.queries.curation import (
        q_cluster_aware_split,
        q_dedup_clusters,
        q_doc_hash_split,
    )
    from tests.conftest import SF_SMOKE

    out = q_cluster_aware_split(spark, SF_SMOKE).toPandas()
    clusters = q_dedup_clusters(spark, SF_SMOKE).toPandas()
    assert len(clusters) > 0, "fixture should contain duplicate clusters"
    merged = out.merge(clusters, on="doc_id")
    spans = merged.groupby("cluster_id")["split"].nunique()
    assert (spans == 1).all(), "a duplicate cluster straddles splits"
    # cluster members key on the cluster id, not themselves
    assert (merged.split_key == merged.cluster_id).all()
    # singletons: identical to the naive hash split
    naive = q_doc_hash_split(spark, SF_SMOKE).toPandas()
    singles = out[~out.doc_id.isin(clusters.doc_id)]
    j = singles.merge(naive, on="doc_id", suffixes=("", "_naive"))
    assert (j.split_key == j.doc_id).all()
    assert (j.split == j.split_naive).all()


def test_exact_substring_dedup_merges_overlapping_spans(spark):
    """The sliding-window dedup (Lee-et-al exact-substring form): a
    duplicated K-window at ANY offset marks its span; overlapping
    windows merge into one span (9 removed tokens for two overlapping
    8-windows, never 16); the position-packed first occurrence keeps
    everything; sub-K docs legitimately have zero windows."""
    from data_pipeline_with_big_data_stack_spark.queries.curation import exact_substring_dedup

    uniq = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"  # canonical doc 0
    rows = [
        (0, uniq),                                   # first occurrence
        (1, "a1 a2 " + uniq),                        # dup at offset 2 (whole 12-token run)
        (2, "b1 " + " ".join(uniq.split()[:9]) + " b2"),  # two overlapping dup windows
        (3, "x y z"),                                # sub-K: no windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in exact_substring_dedup(df, k=8).collect()}
    assert got[0].removed_tokens == 0 and got[0].kept_tokens == 12
    assert got[0].n_windows == 5 and got[0].n_dup_windows == 0
    # doc 1: all five 8-windows of the embedded run are duplicates of
    # doc 0's; their union is one 12-token span
    assert got[1].n_dup_windows == 5
    assert got[1].removed_tokens == 12 and got[1].kept_tokens == 2
    # doc 2: windows at s=1 (u1..u8) and s=2 (u2..u9) both duplicate
    # doc 0's — merged span covers 9 tokens, not 16
    assert got[2].n_dup_windows == 2
    assert got[2].removed_tokens == 9 and got[2].kept_tokens == 2
    # doc 3: too short for any window; everything kept
    assert got[3].n_windows == 0 and got[3].removed_tokens == 0
    assert got[3].kept_tokens == 3


def test_repeated_chunk_removal_collision_free_past_65k_tokens(spark):
    """Regression for the 4096-stride position packing (VERDICT r12 #2):
    with the old ``doc_id * 4096 + chunk_index`` packing, doc 1's chunk
    index 4096 (tokens 65,536..65,551) packed to the SAME int64 as doc
    2's chunk 0, so when those chunks are identical both looked like
    "the first occurrence" and nothing was removed. The 2^20 stride
    attributes collision-free for docs up to ~16.8M tokens."""
    from data_pipeline_with_big_data_stack_spark.queries.curation import repeated_chunk_removal

    shared = " ".join(f"s{i}" for i in range(16))
    filler = " ".join(f"f{i}" for i in range(65536))  # 4096 unique chunks
    rows = [
        (1, filler + " " + shared),  # shared chunk at index 4096 (first)
        (2, shared),                 # same chunk at index 0 of a later doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repeated_chunk_removal(df).collect()}
    # doc 1 owns the first occurrence: nothing removed
    assert got[1].n_chunks == 4097
    assert got[1].n_removed == 0 and got[1].kept_tokens == 65552
    # doc 2's only chunk is a later duplicate: removed (the old packing
    # collided pos(1, 4096) == pos(2, 0) == 8192 and kept it)
    assert got[2].n_chunks == 1
    assert got[2].n_removed == 1 and got[2].kept_tokens == 0


@pytest.mark.parametrize("bad_doc_id", [-1, 2**43])
def test_position_packing_overflow_raises_loudly(spark, bad_doc_id):
    """ADVICE r12: a doc_id outside [0, 2^43) must raise in-plan, not
    silently bleed into a neighboring doc's position range (the oracle
    packs identically, so the hash gate could never catch a silent
    collision). Same guard on both corpus-dedup ops."""
    from data_pipeline_with_big_data_stack_spark.queries.curation import (
        exact_substring_dedup,
        repeated_chunk_removal,
    )

    text = " ".join(f"t{i}" for i in range(16))
    df = spark.createDataFrame([(bad_doc_id, text)], "doc_id long, text string")
    with pytest.raises(Exception, match="position-packing overflow"):
        exact_substring_dedup(df, k=8).collect()
    with pytest.raises(Exception, match="position-packing overflow"):
        repeated_chunk_removal(df).collect()
