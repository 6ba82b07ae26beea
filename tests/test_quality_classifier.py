"""Behavior contracts for the trained NB quality classifier.

q_quality_classifier_nb is oracle-checked for mechanism (bit-exact
DuckDB replay), but mechanism agreement can't show the math is a
working classifier. These tests plant corpora with KNOWN structure and
require the model to learn it: disjoint class vocabularies must
separate perfectly, a class-imbalanced corpus of identical texts must
fall back to the prior's direction, and the bigram featureizer must
produce exactly len(words)-1 features with sub-2-word docs excluded.
Deterministic: seeded data, md5-derived hashing throughout."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline_with_big_data_stack_spark.queries import QUERIES


def _write_docs(tmp_path_factory, name, rows):
    """rows: [(doc_id, text, lang)] → a dir holding documents.parquet."""
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    langs = [r[2] for r in rows]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src_{i % 5}" for i in ids], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp(name)
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def disjoint_vocab_dir(tmp_path_factory):
    """120 docs; positive (en) docs draw words from vocab A, negative
    docs from a DISJOINT vocab B — every bigram is fully class-pure, so
    a working NB must separate the classes perfectly."""
    rng = np.random.RandomState(4242)
    rows = []
    for i in range(120):
        pos = i % 3 != 0  # 80 positive, 40 negative
        base = "a" if pos else "b"
        words = [
            "%s%03d" % (base, rng.randint(0, 200))
            for _ in range(int(rng.randint(20, 60)))
        ]
        rows.append((i, " ".join(words), "en" if pos else "de"))
    return _write_docs(tmp_path_factory, "nb_disjoint", rows)


def test_disjoint_vocabularies_separate_perfectly(spark, disjoint_vocab_dir):
    out = {
        r.doc_id: r
        for r in QUERIES["q_quality_classifier_nb"](
            spark, disjoint_vocab_dir
        ).collect()
    }
    assert len(out) == 120
    pos_scores = [r.nb_score for i, r in out.items() if i % 3 != 0]
    neg_scores = [r.nb_score for i, r in out.items() if i % 3 == 0]
    # sign-separated with a margin: every class-pure bigram contributes
    # a log-odds term of the same sign, far outweighing the prior
    assert min(pos_scores) > 0 > max(neg_scores)
    assert all(out[i].predicted_pos == (i % 3 != 0) for i in out)


def test_identical_texts_fall_back_to_prior_direction(
    spark, tmp_path_factory
):
    """When text carries NO class signal (every doc identical), the only
    information is the class prior — the majority class must win, in
    BOTH directions."""
    text = "alpha beta gamma delta epsilon zeta"
    for n_pos, n_neg in [(30, 10), (10, 30)]:
        rows = [
            (i, text, "en" if i < n_pos else "fr")
            for i in range(n_pos + n_neg)
        ]
        d = _write_docs(
            tmp_path_factory, f"nb_prior_{n_pos}_{n_neg}", rows
        )
        out = QUERIES["q_quality_classifier_nb"](spark, d).collect()
        assert len(out) == n_pos + n_neg
        want = n_pos > n_neg
        assert all(r.predicted_pos == want for r in out)


def test_feature_counts_and_short_doc_exclusion(spark, tmp_path_factory):
    """n_feat must equal len(words)-1 (bigram count), and docs with
    fewer than 2 words contribute nothing — not even a zero-feature
    output row."""
    rows = [
        (0, "one", "en"),  # 1 word → excluded
        (1, "two words", "en"),  # 1 bigram
        (2, "a b c d e", "fr"),  # 4 bigrams
        (3, "x " * 49 + "x", "en"),  # 100 words → 99... see below
    ]
    # row 3: "x " * 49 + "x" = 50 words
    d = _write_docs(tmp_path_factory, "nb_feat", rows)
    out = {
        r.doc_id: r.n_feat
        for r in QUERIES["q_quality_classifier_nb"](spark, d).collect()
    }
    assert out == {1: 1, 2: 4, 3: 49}


def test_stream_scored_equals_batch_scored(spark, disjoint_vocab_dir):
    """The streaming twin (train-once model + per-micro-batch
    nb_score_documents) must emit EXACTLY the batch classifier's rows —
    scores are a per-doc pure function of the frozen model, so batch
    boundaries cannot matter."""
    batch = {
        tuple(r)
        for r in QUERIES["q_quality_classifier_nb"](
            spark, disjoint_vocab_dir
        ).collect()
    }
    streamed = {
        tuple(r)
        for r in QUERIES["q_stream_quality_scores"](
            spark, disjoint_vocab_dir
        ).collect()
    }
    assert streamed == batch


def test_score_documents_handles_unseen_buckets(spark, tmp_path):
    """A scored doc whose bigrams hash to buckets absent from training
    must get the pure-Laplace default log-odds, not drop out or NULL."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.queries.curation import (
        nb_score_documents,
        nb_train_quality_model,
    )

    train = spark.createDataFrame(
        [(1, "good words here", "en"), (2, "schlechte worte hier", "de")],
        "doc_id long, text string, lang string",
    )
    model = nb_train_quality_model(train)
    novel = spark.createDataFrame(
        [(99, "zzz qqq xxx www vvv")], "doc_id long, text string"
    )
    out = nb_score_documents(model, novel).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 99 and r.n_feat == 4
    assert r.nb_score is not None
    # default log-odds = ln((nn+v)/(np+v)) + prior, replayed exactly
    np_, nn_, v_ = 2.0, 2.0, 4.0
    import math

    want = round(math.log(1.0 / 1.0) + 4 * math.log((nn_ + v_) / (np_ + v_)), 4)
    assert abs(r.nb_score - want) < 1e-9


def test_single_class_corpus_yields_null_scores_not_a_crash(spark, tmp_path_factory):
    """A seed corpus with only one class is a degenerate training set:
    ANSI Spark would THROW on the prior's x/0 (killing the job) and
    DuckDB would emit ±inf — with the nullif guards both engines agree
    on NULL scores and the pipeline survives."""
    import duckdb

    from data_pipeline_with_big_data_stack_spark.queries import ORACLES

    rows = [(i, "all english words here", "en") for i in range(30)]
    d = _write_docs(tmp_path_factory, "nb_oneclass", rows)
    out = QUERIES["q_quality_classifier_nb"](spark, d).toPandas()
    assert len(out) == 30
    assert out["nb_score"].isna().all()
    assert out["predicted_pos"].isna().all()
    assert (out["n_feat"] == 3).all()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    opdf = con.sql(ORACLES["q_quality_classifier_nb"]).df()
    assert len(opdf) == 30 and opdf["nb_score"].isna().all()
