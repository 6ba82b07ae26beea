"""Uniform checkpoint policy (VERDICT r6 #4): every lineage-cut site
routes through session.materialize, which upgrades to RELIABLE
checkpoints when a checkpoint dir is configured and falls back to
localCheckpoint otherwise. The toggle must be behavior-preserving —
same results either way — and actually write to the configured dir."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_with_big_data_stack_spark.session import materialize


def _unset_checkpoint_dir(spark):
    sc = spark.sparkContext
    scala_none = sc._jvm.scala.Option.apply(None)
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)
    assert sc.getCheckpointDir() is None


@pytest.fixture
def reliable_dir(spark, tmp_path, monkeypatch):
    """Point SPARK_GRAFT_CHECKPOINT_DIR at a temp dir for the test and
    restore the no-checkpoint-dir state afterwards (setCheckpointDir is
    sticky on the shared context)."""
    d = str(tmp_path / "ckpt")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", d)
    try:
        yield d
    finally:
        _unset_checkpoint_dir(spark)


def test_materialize_local_fallback(spark, monkeypatch):
    assert spark.sparkContext.getCheckpointDir() is None
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    df = spark.range(100).select((F.col("id") * 2).alias("x"))
    out = materialize(df)
    assert out.agg(F.sum("x")).head()[0] == 9900
    # no reliable dir was configured as a side effect
    assert spark.sparkContext.getCheckpointDir() is None


def test_materialize_reliable_when_configured(spark, reliable_dir):
    df = spark.range(100).select((F.col("id") * 3).alias("x"))
    out = materialize(df)
    assert out.agg(F.sum("x")).head()[0] == 14850
    got = spark.sparkContext.getCheckpointDir()
    assert got is not None and got.rstrip("/").startswith("file:" + reliable_dir)
    # blocks actually landed on the configured path
    assert any(
        files for _root, _dirs, files in os.walk(reliable_dir)
    ), "reliable checkpoint wrote no files"


def test_materialize_consumers_agree_across_modes(spark, tmp_path, monkeypatch):
    """An operator that loops over materialize (the MG sketch: two
    consumers of one checkpointed aggregate) returns identical results
    under both checkpoint modes."""
    from data_pipeline_with_big_data_stack_spark.operators.freq import mg_frequent_items

    df = spark.range(2000).select(
        F.concat(F.lit("u"), (F.col("id") % 37).cast("string")).alias("user")
    )
    base = [tuple(r) for r in mg_frequent_items(df, "user", k=5, top_n=5).collect()]
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ck2"))
    try:
        again = [
            tuple(r) for r in mg_frequent_items(df, "user", k=5, top_n=5).collect()
        ]
    finally:
        _unset_checkpoint_dir(spark)
    assert base == again
