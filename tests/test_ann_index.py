"""Materialized IVF index: build-once / partition-pruned search."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
    build_ivf_index,
    search_ivf_index,
)
from data_pipeline_with_big_data_stack_spark.queries.vector import _emb
from tests.conftest import SF_SMOKE


def _codebook(e, k=4):
    return (
        e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < k * 100))
        .select(
            (F.col("vec_id") / 100).cast("long").alias("cell_id"),
            F.col("emb").alias("c_emb"),
        )
        .agg(F.collect_list(F.struct("cell_id", "c_emb")).alias("cb"))
    )


def test_build_search_roundtrip_and_pruning(spark, tmp_path):
    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, _codebook(e))

    # index is physically partitioned by cluster_id
    import glob

    parts = glob.glob(path + "/cluster_id=*")
    assert len(parts) >= 2

    probes = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    out = search_ivf_index(spark, path, probes, nprobe=2, k=5)
    res = out.collect()
    got = {}
    for r in res:
        got.setdefault(r.q_id, []).append(r)
    assert set(got) == {0, 1, 2}
    for q_id, rows in got.items():
        assert len(rows) == 5
        sims = [r.cosine for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != q_id for r in rows)

    # the scan only reads the probed partitions (partition pruning)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_search_matches_within_probed_cells(spark, tmp_path):
    """Within the probed cells the index search is EXACT: equal to
    brute-force cosine restricted to those cells."""
    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    path = str(tmp_path / "ivf")
    cb = _codebook(e)
    build_ivf_index(e, path, cb)
    probes = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    out = {r.vec_id: r.cosine for r in
           search_ivf_index(spark, path, probes, nprobe=2, k=3).collect()}

    idx = spark.read.parquet(path)
    cells = sorted({r.cluster_id for r in
                    idx.filter(F.col("vec_id").isin(list(out))).select("cluster_id").collect()})
    brute = (
        idx.filter(F.col("cluster_id").isin(cells))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    from data_pipeline_with_big_data_stack_spark.operators.ann_index import _dot, _norm

    brute = brute.select(
        "vec_id",
        F.round(_dot(F.col("q_emb"), F.col("emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("emb"))), 6).alias("cosine"),
    )
    top = {r.vec_id: r.cosine for r in
           brute.orderBy(F.col("cosine").desc(), "vec_id").limit(3).collect()}
    assert out == top


def test_ivfpq_index_equals_inline_query(spark, tmp_path):
    """The materialized IVF-PQ index must return the IDENTICAL top-k to
    the inline q_ann_ivfpq_topk (whose DuckDB oracle replays the whole
    trajectory) given the same codebooks — the train-once/serve-many
    production shape of the same operator."""
    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from data_pipeline_with_big_data_stack_spark.queries.vector import (
        _K_CELLS,
        _NPROBE,
        _PQ_SUB,
        N_QUERY_VECS,
        TOP_K,
        _pq_train_codebooks,
        q_ann_ivfpq_topk,
    )

    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    coarse = _codebook(e, k=_K_CELLS)
    cb0, cb1 = _pq_train_codebooks(e)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(e, path, coarse, [cb0, cb1], sub_dim=_PQ_SUB)

    probes = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    out = search_ivfpq_index(spark, path, probes, nprobe=_NPROBE, k=TOP_K)
    got = sorted(
        (r.q_id, r.vec_id, r.cell_id, r.adc_dist) for r in out.collect()
    )
    want = sorted(
        (r.q_id, r.vec_id, r.cell_id, r.adc_dist)
        for r in q_ann_ivfpq_topk(spark, SF_SMOKE).collect()
    )
    assert got == want


def test_ivfpq_index_prunes_partitions_and_stores_no_vectors(spark, tmp_path):
    """Scale pins: (a) the index holds CODES ONLY — no raw-vector column
    anywhere in its files; (b) a search's index scan is partition-pruned
    to the probed cells (PartitionFilters), so nprobe/K of the corpus is
    read, never the rest."""
    import glob

    import pyarrow.parquet as pq

    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from data_pipeline_with_big_data_stack_spark.queries.vector import (
        _PQ_SUB,
        _pq_train_codebooks,
    )

    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        e, path, _codebook(e), _pq_train_codebooks(e), sub_dim=_PQ_SUB
    )
    files = glob.glob(path + "/cell_id=*/*.parquet")
    assert files, "index is physically partitioned by cell_id"
    for f in files[:3]:
        names = set(pq.read_schema(f).names)
        assert "emb" not in names and "q_emb" not in names
        assert {"vec_id", "code_0", "code_1"} <= names

    probes = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    out = search_ivfpq_index(spark, path, probes, nprobe=2, k=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan
    # no corpus shuffle: every hash exchange in the search plan
    # partitions on q_id (the PROBE key, candidate-scale rows) — the
    # codes relation is never repartitioned and never shuffle-joined
    import re

    keys = re.findall(r"Exchange (?:hash|range)partitioning\((\w+)", plan)
    assert keys and all(k.startswith("q_id") for k in keys), keys
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_ivfpq_append_equals_build_over_union(spark, tmp_path):
    """Incremental corpus growth: append codes the new vectors with the
    sidecar codebooks, so search over (build(half) + append(half)) is
    IDENTICAL to search over build(all) — and the original partition
    files are not rewritten (O(new vectors), not O(corpus))."""
    import glob
    import os

    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from data_pipeline_with_big_data_stack_spark.queries.vector import (
        _PQ_SUB,
        _pq_train_codebooks,
    )

    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    coarse = _codebook(e)
    pq = _pq_train_codebooks(e)

    full_path = str(tmp_path / "full")
    build_ivfpq_index(e, full_path, coarse, pq, sub_dim=_PQ_SUB)

    inc_path = str(tmp_path / "inc")
    build_ivfpq_index(
        e.filter(F.col("vec_id") % 2 == 0), inc_path, coarse, pq, sub_dim=_PQ_SUB
    )
    before = {
        f: os.path.getmtime(f) for f in glob.glob(inc_path + "/cell_id=*/*.parquet")
    }
    append_to_ivfpq_index(spark, inc_path, e.filter(F.col("vec_id") % 2 == 1))
    after = {f: os.path.getmtime(f) for f in before}
    assert after == before, "append must not rewrite existing files"

    probes = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )

    def res(path):
        return sorted(
            (r.q_id, r.vec_id, r.cell_id, r.adc_dist)
            for r in search_ivfpq_index(spark, path, probes, nprobe=2, k=5).collect()
        )

    assert res(inc_path) == res(full_path)


def test_ivfpq_compaction_preserves_results(spark, tmp_path):
    """Repeated appends fragment the cell partitions; compaction
    rewrites to one file per cell without changing a single search
    result (codes and sidecars are untouched semantically)."""
    import glob
    import os
    from collections import Counter

    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        search_ivfpq_index,
    )
    from data_pipeline_with_big_data_stack_spark.queries.vector import (
        _PQ_SUB,
        _pq_train_codebooks,
    )

    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    path = str(tmp_path / "idx")
    build_ivfpq_index(
        e.filter(F.col("vec_id") % 4 == 0), path, _codebook(e),
        _pq_train_codebooks(e), sub_dim=_PQ_SUB,
    )
    for r in (1, 2, 3):
        append_to_ivfpq_index(spark, path, e.filter(F.col("vec_id") % 4 == r))

    def per_cell():
        return Counter(
            os.path.dirname(f) for f in glob.glob(path + "/cell_id=*/*.parquet")
        )

    assert max(per_cell().values()) >= 4, "appends fragmented the cells"
    probes = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )

    def res():
        return sorted(
            (r.q_id, r.vec_id, r.cell_id, r.adc_dist)
            for r in search_ivfpq_index(spark, path, probes, nprobe=2, k=5).collect()
        )

    before = res()
    n = compact_ivfpq_index(spark, path, max_files_per_cell=3)
    assert n > 0
    assert max(per_cell().values()) == 1, "one file per cell after compaction"
    assert res() == before
    # under threshold → no-op
    assert compact_ivfpq_index(spark, path, max_files_per_cell=3) == 0
