"""Physical-plan property tests — the scale contract.

Correctness says WHAT each operator computes; these tests pin HOW: the
plan shapes that keep working at 1000 executors / 100 TB. A regression
that silently turns a broadcast join into a cartesian product, loses a
parquet filter pushdown, or drops map-side partial aggregation would
still pass value checks at test SF — these assertions catch it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.queries import QUERIES
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def plan_of(spark, name: str) -> str:
    return (
        QUERIES[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


class TestNoCartesian:
    """No registered query may degrade to an unconstrained cross product
    (the broadcast ANN probes are bounded crossJoins by design)."""

    BOUNDED_CROSS_OK = {"q_ann_cosine_topk", "q_media_frame_sample"}

    @pytest.mark.parametrize(
        "name",
        sorted(
            n
            for n in QUERIES
            if not n.startswith("q_stream")  # streaming queries execute eagerly
        ),
    )
    def test_no_cartesian(self, spark, name):
        plan = plan_of(spark, name)
        if name in self.BOUNDED_CROSS_OK:
            # must be a BROADCAST nested loop (probe side tiny), never a
            # shuffle cartesian
            assert "CartesianProduct" not in plan
        else:
            assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


class TestPushdownAndPruning:
    def test_filter_pushed_to_parquet(self, spark):
        # q6 filters on shipdate/discount/quantity — all must reach the scan
        plan = plan_of(spark, "q6_forecast_revenue")
        assert "PushedFilters: [" in plan
        pushed = plan.split("PushedFilters: [")[1].split("]")[0]
        assert "l_shipdate" in pushed and "l_discount" in pushed

    def test_column_pruning(self, spark):
        # q1 touches 7 of lineitem's 11 columns; the scan must not read more
        plan = plan_of(spark, "q1_pricing_summary")
        read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
        assert "l_orderkey" not in read_schema
        assert "l_partkey" not in read_schema
        assert "l_quantity" in read_schema

    def test_events_time_filter_pushed(self, spark):
        plan = plan_of(spark, "q_druid_hourly_dashboard")
        # time-range dashboards must skip row groups via pushed ts filter
        assert "PushedFilters: [" in plan


class TestJoinStrategies:
    def test_small_dims_broadcast(self, spark):
        # q5 joins lineitem⋈orders⋈customer⋈supplier⋈nation⋈region —
        # nation/region are broadcastable; no sort-merge for them
        plan = plan_of(spark, "q5_local_supplier_volume")
        assert "BroadcastHashJoin" in plan

    def test_range_join_is_broadcast_nested_loop(self, spark):
        plan = plan_of(spark, "q_range_join_value_bands")
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan

    def test_semi_join_for_exists(self, spark):
        plan = plan_of(spark, "q4_late_shipment_priority")
        assert "LeftSemi" in plan

    def test_lsh_band_join_not_expanded(self, spark):
        # fuzzy dedup must shuffle on band keys (hash agg), never
        # self-join the corpus
        plan = plan_of(spark, "q_dedup_minhash_lsh")
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan or "band" in plan


class TestAggregationShape:
    def test_partial_aggregation_before_shuffle(self, spark):
        # A1-shaped agg: map-side partial + reduce-side final
        plan = plan_of(spark, "q_doc_source_profile")
        assert plan.count("HashAggregate") >= 2

    def test_topk_fuses_to_take_ordered(self, spark):
        plan = plan_of(spark, "q_topk_orders_by_value")
        assert "TakeOrderedAndProject" in plan

    def test_whole_stage_codegen_on_hot_path(self, spark):
        # codegen spans only materialize in the AQE final plan — collect()
        # executes this DF's own queryExecution (a write would spawn a new one)
        df = QUERIES["q1_pricing_summary"](spark, SF_SMOKE)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "*(" in plan  # whole-stage-codegen star markers on the agg/scan


class TestGeneratorPitfall:
    def test_no_interpreted_shingle_filter(self, spark):
        """The explode-of-aliased-complex-array pitfall (re-evaluation of
        the generator expression inside its implicit size>0 filter) must
        not reappear in the simhash pipeline."""
        plan = plan_of(spark, "q_dedup_simhash")
        for line in plan.splitlines():
            if line.strip().startswith("+- Filter") or line.strip().startswith("Filter"):
                assert "transform" not in line, (
                    "shingle transform re-evaluated inside a Filter node"
                )


class TestPartitionPruning:
    def test_date_partition_pruning_on_ingested_table(self, spark, tmp_path):
        """Druid prunes segments by __time; our date-partitioned layout
        must prune parquet partitions for __date predicates — the scan's
        PartitionFilters must carry the filter and read fewer partitions."""
        from data_pipeline_with_big_data_stack_spark import ingest
        from data_pipeline_with_big_data_stack_spark.schemas import SPARK_ANALYTICS
        from data_pipeline_with_big_data_stack_spark.sources import generators

        # 3 days of sessions
        src = generators.sessions_source(spark, n=300, seed=9).withColumn(
            "timestamp",
            F.lit(1_709_251_200) + (F.col("user_id") % 3).cast("long") * 86400,
        )
        path = str(tmp_path / "sessions_3d")
        ingest.ingest_batch(SPARK_ANALYTICS, src, path, mode="overwrite")
        t = spark.read.parquet(path)
        assert t.select("__date").distinct().count() == 3

        q = t.filter(F.col("__date") == "2024-03-01")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        pf = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "__date" in pf  # predicate reached the partition filter
        # and only the matching day's rows are read
        assert q.count() == t.filter(F.col("__date") == "2024-03-01").count() > 0


class TestScaleShapes:
    def test_asof_join_is_single_shuffle(self, spark):
        """The union+window as-of must shuffle ONCE on user_id — a
        range-join formulation would explode; extra exchanges would mean
        the union lost its common partitioning."""
        plan = plan_of(spark, "q_asof_purchase_to_click")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # exchanges: one hashpartitioning(user_id) for the window (+ AQE
        # may add a final coalesce read; no join exchanges at all)
        assert plan.count("SortMergeJoin") == 0
        assert plan.count("BroadcastHashJoin") == 0

    def test_ivf_assignment_broadcasts_codebook(self, spark):
        plan = plan_of(spark, "q_ann_ivf_topk")
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan

    def test_ivf_assignment_is_shuffle_free(self, spark):
        """Cell assignment must be a map-side argmin over the broadcast
        codebook array — the corpus is never exchanged for it. The r1
        shape (broadcast-join expand ×K + row_number over
        partitionBy(vec_id)) shuffled K× the corpus; pin its absence: no
        hashpartitioning on vec_id anywhere, and the only row_number
        window is the final per-probe top-k on q_id (group-limited)."""
        plan = plan_of(spark, "q_ann_ivf_topk")
        assert "hashpartitioning(vec_id" not in plan
        # every Window node must partition by q_id (candidate top-k),
        # never by a corpus-wide key
        for line in plan.splitlines():
            if "windowspecdefinition" in line:
                assert "q_id" in line, line
        # the top-k window is pre-limited map-side before its exchange
        assert "WindowGroupLimit" in plan

    def test_embed_neardup_bucket_cardinality_scales(self, spark):
        """The SRP-LSH blocking key must have cardinality that grows
        with the corpus (near-singleton buckets), not a constant — the
        r1 shape keyed on 4 axis-aligned sign bits (16 buckets total),
        making the bucket join all-pairs/16. Key space is now
        bands × 2^bits = 4·4096; observed distinct buckets must track
        corpus size across SFs."""
        from data_pipeline_with_big_data_stack_spark.queries.vector import (
            _SRP_BANDS,
            _SRP_BITS,
            _emb,
            _srp_band_rows,
        )

        assert _SRP_BANDS * (2**_SRP_BITS) >= 4096
        counts = {}
        for sf in (SF_SMOKE, SF_CORRECTNESS):
            e = _emb(spark, sf)
            counts[sf] = (
                _srp_band_rows(e).select("band_idx", "band_val").distinct().count()
            )
        assert counts[SF_SMOKE] > 16 * 4  # far above the r1 constant
        assert counts[SF_CORRECTNESS] > counts[SF_SMOKE]

    def test_bpe_tokenizer_stays_native(self, spark):
        # regexp_extract_all must appear in the plan (JVM-side), and no
        # python UDF evaluation node
        plan = plan_of(spark, "q_doc_bpe_token_stats")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_media_decode_is_arrow_batched(self, spark):
        # the one legitimate Python stage must be Arrow-vectorized
        # (mapInPandas), never row-at-a-time pickled UDFs
        plan = plan_of(spark, "q_media_byte_features")
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan


def test_ngram_jaccard_reuses_shingle_exchange(spark):
    """The verify join reads the shingled corpus twice (doc_a side,
    doc_b side); both sides hash-partition the identical subplan on
    doc_id, so Catalyst must plan a ReusedExchange — shingling is
    computed at most twice overall (signature branch + one verify
    branch), never once per join side."""
    from data_pipeline_with_big_data_stack_spark.queries.textops import q_dedup_ngram_jaccard
    from tests.conftest import SF_SMOKE

    df = q_dedup_ngram_jaccard(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


class TestRound3ScaleShapes:
    """Plan pins for the round-3 operators."""

    def test_unigram_vocab_join_is_broadcast(self, spark):
        # at smoke scale the OPTIMIZER must choose broadcast for the
        # Zipf-bounded vocabulary (round 6 removed the forced hint —
        # raw web vocab is unbounded, so the choice belongs to measured
        # statistics, same reasoning as the hash-bucketed DSIR); a
        # sort-merge join here would mean statistics broke
        plan = plan_of(spark, "q_doc_unigram_logprob")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_sequence_packing_window_is_sharded(self, spark):
        # the cumulative-offset window must be partitioned by source —
        # a global (empty-partition-spec) window serializes the corpus
        # through one task
        df = QUERIES["q_doc_sequence_packing"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "windowspecdefinition(source" in plan.replace(" ", "").lower().replace(
            "#", ""
        ).replace("string", "") or "partitionBy" not in plan  # fallback textual check
        # physical check: Window node's partition spec is non-empty
        phys = plan_of(spark, "q_doc_sequence_packing")
        import re

        w = re.search(r"Window \[.*?\], \[(.*?)\]", phys)
        assert w is not None and "source" in w.group(1)

    def test_pq_assignment_broadcasts_codebooks(self, spark):
        # both subspace codebooks are 1-row aggregates broadcast to the
        # scan; the only shuffles are the K×dim centroid updates
        plan = plan_of(spark, "q_embed_pq_codes")
        assert plan.count("BroadcastNestedLoopJoin") >= 2 or plan.count(
            "BroadcastExchange"
        ) >= 2
        assert "SortMergeJoin" not in plan

    def test_fuzzy_decontamination_probe_is_broadcast(self, spark):
        # the benchmark-probe band table must broadcast; the corpus side
        # is never re-shuffled for the candidate join
        plan = plan_of(spark, "q_fuzzy_decontamination")
        assert "BroadcastHashJoin" in plan

    def test_funnel_joins_copartition_on_user(self, spark):
        # after the first user_id shuffle the later step-joins must not
        # introduce a cartesian or nested-loop expansion
        plan = plan_of(spark, "q_events_funnel")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRound4ScaleShapes:
    """Plan pins for the round-3 headline operators (VERDICT r3 #7)."""

    def test_rollup_increment_reads_only_touched_partitions(self, spark, tmp_path):
        # the incremental-maintenance read-back must partition-prune to
        # the touched days: PartitionFilters on __date, and only the
        # touched partition directories in the scan
        import datetime

        from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as rm
        from data_pipeline_with_big_data_stack_spark.tables import load_table

        path = str(tmp_path / "rollup")
        events = load_table(spark, SF_SMOKE, "events")
        rm.build_rollup(events, path)
        n_days = (
            spark.read.parquet(path).select("__date").distinct().count()
        )
        assert n_days > 3  # pruning must have something to prune
        one_day = spark.read.parquet(path).select(F.min("__date")).collect()[0][0]
        sliced = rm.touched_slice(spark, path, [one_day])
        plan = sliced._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        pf = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "__date" in pf, plan
        # the pruned scan must read one partition's rows, not history
        assert sliced.count() == spark.read.parquet(path).filter(
            F.col("__date") == one_day
        ).count()

    def test_pq_coding_never_shuffles_the_corpus(self, spark):
        # per-subspace lloyd shuffles only K×dim partials (keyed on
        # cluster_id) and 1-row codebooks (SinglePartition); the corpus
        # itself must never enter an Exchange — final coding is a
        # map-side projection under broadcast codebooks
        plan = plan_of(spark, "q_embed_pq_codes")
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "cluster_id" in line, f"corpus-side exchange: {line}"
        assert "SortMergeJoin" not in plan

    def test_retention_cohort_join_is_broadcast_no_reshuffle(self, spark):
        # the per-user cohort minimum aggregates then BROADCASTS back to
        # the (user, day) activity side — the big side shuffles once per
        # aggregation and is never re-shuffled for the join
        plan = plan_of(spark, "q_events_retention_cohorts")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # exactly: user-day distinct, per-user min, final cohort agg
        assert plan.count("Exchange hashpartitioning") <= 3, plan


class TestContinuationScaleShapes:
    """Plan pins for the frequent-items sketch and SemDeDup."""

    def test_mg_sketch_single_pass(self, spark):
        # the corpus-wide MG fold must run ONCE: the aggregated summary
        # is cut with localCheckpoint before its two consumers (item
        # counts + error total), so the final plan reads the checkpoint
        # — zero MapInPandas nodes — instead of re-folding the corpus
        # per branch (Catalyst pushes the branch filters below the
        # groupBy, which otherwise defeats ReuseExchange)
        plan = plan_of(spark, "q_frequent_items_users")
        assert "MapInPandas" not in plan, plan

    def test_semdedup_pairs_join_on_salted_cluster(self, spark):
        # within-cluster pairing must join on (cluster_id, __salt) —
        # never an unconstrained cartesian — so the O(n_c²) dot-product
        # work spreads over K × n_salts tasks even at the demo K=8
        plan = plan_of(spark, "q_semdedup_embeddings")
        assert "CartesianProduct" not in plan
        joins = [
            ln
            for ln in plan.splitlines()
            if "HashJoin" in ln or "SortMergeJoin" in ln
        ]
        pair = [ln for ln in joins if "__salt" in ln and "cluster_id" in ln]
        assert pair, joins

    def test_rollup_serving_never_scans_raw_events(self, spark):
        # the served dashboard must read the materialized rollup store
        # only — at scale the difference between hours×types rows and
        # the raw events table
        plan = plan_of(spark, "q_rollup_served_daily_dashboard")
        assert "rollup_serve_" in plan, plan
        assert "events.parquet" not in plan, plan

    def test_ivfpq_search_never_shuffles_the_corpus(self, spark):
        # index build + ADC ranking are map-side under broadcast
        # codebooks; the only hash exchanges allowed are the PQ
        # training aggregations (cluster_id keys) and the final top-k
        # window over CANDIDATES (q_id — nprobe/K of the index per
        # probe, same bounded shape as q_ann_ivf_topk). The full corpus
        # itself must never enter an Exchange or a sort-merge join
        plan = plan_of(spark, "q_ann_ivfpq_topk")
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "cluster_id" in line or "q_id" in line, (
                    f"corpus-side exchange: {line}"
                )
        assert "SortMergeJoin" not in plan
