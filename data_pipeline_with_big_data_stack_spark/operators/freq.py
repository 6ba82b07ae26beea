"""Misra-Gries frequent-items (heavy hitters) sketch.

Completes the engine's DataSketches parity set next to HLL / Theta / KLL
(Druid loads ``druid-datasketches`` — ``M/app_druid/environment.env:5`` —
whose fourth family is the Frequencies sketch): which items appear most
often, answered from k-bounded mergeable state instead of a full
groupBy over every distinct key.

Scale shape (the reason the sketch exists at 100 TB):

- **map side**: each partition folds its rows into ONE Misra-Gries
  summary of at most ``k`` counters (an Arrow-batched ``mapInPandas``
  fold — per-batch ``value_counts`` merged into the running dict, then
  the standard batched MG reduction: subtract the (k+1)-th largest
  count from every counter and drop the non-positives). A partition
  emits ≤ k+1 rows no matter how many distinct items it saw.
- **merge side**: summing per-item counts across partition summaries is
  exactly the mergeable-summaries MG merge (Agarwal et al., "Mergeable
  Summaries", PODS 2012): for every item,
  ``true - Σ err_p  ≤  Σ cnt_p  ≤  true``, where ``err_p`` is the total
  amount partition *p* subtracted during reductions
  (``err_p ≤ n_p / (k+1)``). So the shuffle moves O(k) rows per
  partition — never the raw key space — and the result carries a hard
  deterministic error bracket, not a probabilistic one.
- **exact regime**: a partition that never exceeds k distinct items
  never reduces (``err_p = 0``), so the merged counts equal an exact
  groupBy — the same exact-below-capacity device the Theta query uses
  for its full value oracle (``queries/sketches.py``). Estimate-mode
  accuracy at >100 K distinct keys is pinned in
  ``tests/test_sketches.py``.

MG is deterministic (no hashing, no RNG): the summary is a pure
function of partition contents, which is what lets the exact regime
carry a value oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.session import materialize

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)


def mg_update(counts: dict, items, k: int, weights=None) -> int:
    """Fold one batch of items (a pandas Series) into a running MG
    counter dict in place; returns the reduction error added (0 unless
    the dict exceeded ``k`` and the batched reduction ran). With
    ``weights`` (an integer Series aligned with ``items``) this is the
    standard weighted-MG generalization — each item accumulates its
    weight sum instead of its row count, and the reduction subtracts
    the (k+1)-th largest weight sum; the error bracket statement is
    unchanged with "count" read as "total weight". Shared by the batch
    per-partition fold below and the streaming per-key state operator
    (streaming/stateful.stream_frequent_items)."""
    batch = (
        items.value_counts()
        if weights is None
        else weights.groupby(items.values).sum()
    )
    for item, c in batch.items():
        counts[item] = counts.get(item, 0) + int(c)
    if len(counts) <= k:
        return 0
    # batched MG reduction: one sort of the k-bounded dict, not one
    # decrement pass per excess row. t < 0 is impossible once callers
    # enforce non-negative weights (mg_summaries filters them) — the
    # assert guards any future caller that forgets, because a negative
    # t would INCREASE every counter and void the error bracket.
    t = sorted(counts.values(), reverse=True)[k]
    assert t >= 0, "Misra-Gries requires non-negative weights"
    for i, c in list(counts.items()):
        if c > t:
            counts[i] = c - t
        else:
            del counts[i]
    return t


def mg_summaries(
    df: DataFrame, item_col: str, k: int, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``item_col`` (cast to
    string): rows ``(item, cnt)`` with ``item IS NULL`` carrying the
    partition's total reduction error ``err_p`` in ``cnt``. At most
    k + 1 output rows per partition. NULL items are excluded up front
    (NULL is not a countable item, and it is the error-row sentinel) —
    the filter also reaches the parquet scan as an IsNotNull pushdown.
    With ``weight_col`` (integer — callers quantize money/size metrics
    to micros first; must be NON-NEGATIVE, since MG's undercount
    guarantee assumes monotone counters) items accumulate weight sums:
    Druid's topN ranks keys by an aggregated METRIC, and this is that
    shape sketched. NULL weights are dropped (weight 0) — a NaN in the
    pandas sum would poison the integer counters — and so are NEGATIVE
    weights: a negative weight sum would let the (k+1)-th largest
    counter go negative, turning the reduction's ``c - t`` into an
    INCREASE that silently breaks both the est ≤ true ≤ max bracket
    and the ≤ k size bound, so the non-negativity precondition is
    enforced here rather than assumed."""

    cols = [F.col(item_col).cast("string").alias("item")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    src = df.select(*cols).filter(F.col("item").isNotNull())
    if weight_col is not None:
        src = src.filter(F.col("w").isNotNull() & (F.col("w") >= 0))

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict[str, int] = {}
        err = 0
        for pdf in batches:
            err += mg_update(
                counts,
                pdf["item"],
                k,
                weights=pdf["w"] if weight_col is not None else None,
            )
        out = pd.DataFrame(
            {
                "item": [*counts.keys(), None],
                "cnt": [*counts.values(), err],
            }
        )
        yield out.astype({"cnt": "int64"})

    return src.mapInPandas(fold, schema="item string, cnt long")


def mg_frequent_items(
    df: DataFrame,
    item_col: str,
    k: int,
    top_n: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Top ``top_n`` items by Misra-Gries estimate with deterministic
    error bracket: ``est_count ≤ true ≤ max_count``. Ordering is total
    ((est_count DESC, item ASC)) so the result set is stable. With
    ``weight_col``, counts are integer weight sums (weighted MG)."""
    summ = mg_summaries(df, item_col, k, weight_col=weight_col)
    # ONE aggregation over the summaries, materialized
    # (localCheckpoint) because two consumers read it (item counts +
    # error total): Catalyst pushes each branch's item-null filter
    # BELOW the groupBy, so without the cut the exchange subtrees
    # differ, ReuseExchange can't kick in, and the corpus-wide MG fold
    # would execute twice. The checkpointed table is summary-bounded
    # (≤ partitions × (k+1) rows pre-merge), never corpus-sized.
    agg = materialize(
        summ.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    )
    est = agg.filter(F.col("item").isNotNull())
    total_err = agg.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("est_count"), F.lit(0)).alias("__err")
    )
    return (
        est.join(F.broadcast(total_err))
        .select(
            "item",
            "est_count",
            (F.col("est_count") + F.col("__err")).alias("max_count"),
        )
        .orderBy(F.desc("est_count"), "item")
        .limit(top_n)
    )
