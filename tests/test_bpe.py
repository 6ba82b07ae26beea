"""Distributed BPE merge training vs the pure-Python reference."""

from __future__ import annotations

from data_pipeline_with_big_data_stack_spark.operators.bpe import train_bpe, train_bpe_reference
from tests.conftest import SF_SMOKE


def test_bpe_small_vocabulary_exact(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    got = train_bpe(words, 6)
    exp = train_bpe_reference(freqs, 6)
    assert got == exp
    # classic example: 'est' family dominates ('e','s') then ('es','t')
    assert (got[0]["left"], got[0]["right"]) == ("e", "s")
    assert (got[1]["left"], got[1]["right"]) == ("es", "t")


def test_bpe_on_fixture_corpus_matches_reference(spark):
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.tables import load_table

    words = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    freqs = {r.word: r.freq for r in words.collect()}
    got = train_bpe(words, 8)
    exp = train_bpe_reference(freqs, 8)
    assert got == exp
    assert len(got) == 8
    assert all(m["pair_count"] > 0 for m in got)


def test_bpe_exhausts_gracefully(spark):
    words = spark.createDataFrame([("ab", 1)], ["word", "freq"])
    got = train_bpe(words, 50)  # only a few merges possible
    exp = train_bpe_reference({"ab": 1}, 50)
    assert got == exp
    assert len(got) < 50


def test_apply_bpe_matches_reference_tokenization(spark):
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators.bpe import END, apply_bpe

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    merges = train_bpe(words, 6)

    docs = spark.createDataFrame(
        [(0, "newest lower low"), (1, "widest widest")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
        for r in apply_bpe(docs, "text", merges, "doc_id").collect()
    }

    # reference: re-apply the same merges in python per word
    def ref_word(w):
        s = [*w, END]
        for m in merges:
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == m["left"] and s[i + 1] == m["right"]:
                    out.append(m["merged"])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    for doc_id, text in [(0, "newest lower low"), (1, "widest widest")]:
        exp = [t for w in text.split(" ") for t in ref_word(w)]
        assert got[doc_id] == (exp, len(exp)), doc_id
    # merged symbols actually appear (tokenization is not char-level)
    assert any(len(t) > 1 and t != END for t in got[0][0])
