"""Fused multi-codebook Lloyd training (optimization r15).

``lloyd_kmeans_multi`` trains N codebooks over column slices of ONE
embedding column with a single corpus scan and a single
(codebook, cluster, pos) partial-agg shuffle per round, instead of one
independent lloyd chain per codebook. The contract that makes it safe
to swap under the oracle-gated IVF-PQ family: per codebook the trained
values are BIT-IDENTICAL to running ``lloyd_kmeans`` on the sliced
corpus separately — assignment argmin ties break the same way and the
decimal-mean update groups are disjoint per codebook with the same
addends. These tests pin that equivalence on the real embeddings
fixture for both trainer entry points.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _cb_rows(df, col):
    """1-row codebook frame → {cell_id: tuple(c_emb floats)} (exact)."""
    [row] = df.collect()
    return {int(c["cell_id"]): tuple(c["c_emb"]) for c in row[col]}


def test_lloyd_multi_equals_per_slice_lloyd(spark):
    from data_pipeline_with_big_data_stack_spark.operators.kmeans import (
        lloyd_kmeans,
        lloyd_kmeans_multi,
    )
    from data_pipeline_with_big_data_stack_spark.queries.vector import (
        _PQ_ITERS,
        _PQ_K,
        _PQ_SUB,
        _emb,
        _km_demo_init,
    )

    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    slices = [(m * _PQ_SUB + 1, _PQ_SUB) for m in range(2)]

    # the fused combined init, built the same way _pq_train_codebooks does
    init = e.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _PQ_K * 100)
    ).agg(
        *[
            F.collect_list(
                F.struct(
                    (F.col("vec_id") / 100).cast("long").alias("cell_id"),
                    F.slice("emb", off, ln).alias("c_emb"),
                )
            ).alias(f"cb_{m}")
            for m, (off, ln) in enumerate(slices)
        ]
    )
    fused = lloyd_kmeans_multi(e, init, slices, iters=_PQ_ITERS)

    for m, (off, ln) in enumerate(slices):
        sub = e.select("vec_id", F.slice("emb", off, ln).alias("emb"))
        _a, cb = lloyd_kmeans(sub, _km_demo_init(sub, _PQ_K), iters=_PQ_ITERS)
        want = _cb_rows(cb, "cb")
        got = _cb_rows(fused.select(f"cb_{m}"), f"cb_{m}")
        assert got == want, f"subspace {m}: fused != per-slice lloyd"


def test_pq_train_codebooks_values_unchanged(spark):
    """The public trainer keeps its exact pre-fusion trajectory: each
    returned codebook equals the per-slice lloyd_kmeans run it used to
    be (the IVF-PQ oracles replay this trajectory in DuckDB)."""
    from data_pipeline_with_big_data_stack_spark.operators.kmeans import lloyd_kmeans
    from data_pipeline_with_big_data_stack_spark.queries.vector import (
        _PQ_ITERS,
        _PQ_K,
        _PQ_SUB,
        _emb,
        _km_demo_init,
        _pq_train_codebooks,
    )

    e = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    for eager in (False, True):
        cbs = _pq_train_codebooks(e, eager=eager)
        for m, cbm in enumerate(cbs):
            sub = e.select(
                "vec_id", F.slice("emb", m * _PQ_SUB + 1, _PQ_SUB).alias("emb")
            )
            _a, want = lloyd_kmeans(
                sub, _km_demo_init(sub, _PQ_K), iters=_PQ_ITERS
            )
            assert _cb_rows(cbm, f"cb{m}") == _cb_rows(want, "cb"), (
                f"eager={eager} subspace {m}"
            )


def test_train_ivfpq_codebooks_values_unchanged(spark):
    """The md5-seeded general trainer (retrain/versioned path) keeps its
    exact pre-fusion trajectory: coarse + each PQ codebook equal the
    separate _seed_codebook + lloyd_kmeans chains they used to be."""
    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        _seed_codebook,
        train_ivfpq_codebooks,
    )
    from data_pipeline_with_big_data_stack_spark.operators.kmeans import lloyd_kmeans
    from data_pipeline_with_big_data_stack_spark.queries.vector import _emb

    k_coarse, k_pq, sub_dim, n_sub = 6, 4, 32, 2
    v = _emb(spark, SF_SMOKE).select("vec_id", "emb")
    coarse, pqs = train_ivfpq_codebooks(
        v, k_coarse, k_pq, sub_dim=sub_dim, n_sub=n_sub, iters=2
    )

    _a, want_coarse = lloyd_kmeans(v, _seed_codebook(v, k_coarse), iters=2)
    assert _cb_rows(coarse, "cb") == _cb_rows(want_coarse, "cb"), "coarse"
    for m in range(n_sub):
        sub = v.select(
            "vec_id", F.slice("emb", m * sub_dim + 1, sub_dim).alias("emb")
        )
        _a, want = lloyd_kmeans(sub, _seed_codebook(sub, k_pq), iters=2)
        assert _cb_rows(pqs[m], f"cb{m}") == _cb_rows(want, "cb"), f"pq {m}"
