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


def _synthetic_vocab(n_words: int, seed: int = 7) -> dict[str, int]:
    """Deterministic wide-alphabet vocabulary with enough symbol mass
    to support 1000+ merges."""
    import random
    import string

    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits
    freqs: dict[str, int] = {}
    while len(freqs) < n_words:
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 12)))
        freqs[w] = rng.randint(1, 50)
    return freqs


def test_batched_training_matches_reference(spark):
    """merges_per_round > 1: Spark batched rounds bit-identical to the
    batched pure-Python reference (same candidate window + greedy
    disjoint selection)."""
    freqs = _synthetic_vocab(120)
    words = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    got = train_bpe(words, 200, merges_per_round=32)
    exp = train_bpe_reference(freqs, 200, merges_per_round=32)
    assert got == exp
    assert len(got) == 200
    # batching actually batched: far fewer rounds than merges means
    # ranks stay dense and ordered regardless
    assert [m["rank"] for m in got] == list(range(200))


def test_apply_bpe_1000_merges_bounded_plan(spark):
    """The scale flag from round 3: a realistic-size merge table must
    tokenize with CONSTANT plan depth (one mapInPandas over the
    vocabulary), and match the pure-Python sequential apply exactly."""
    from data_pipeline_with_big_data_stack_spark.operators.bpe import (
        END,
        apply_bpe,
        apply_merges_to_symbols,
    )

    freqs = _synthetic_vocab(400, seed=11)
    words = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    merges = train_bpe(words, 1000, merges_per_round=64)
    exp_merges = train_bpe_reference(freqs, 1000, merges_per_round=64)
    assert merges == exp_merges
    assert len(merges) >= 1000

    all_words = sorted(freqs)
    docs = spark.createDataFrame(
        [(i, " ".join(all_words[i * 40 : (i + 1) * 40])) for i in range(10)],
        ["doc_id", "text"],
    )
    out = apply_bpe(docs, "text", merges, "doc_id")

    # plan depth is bounded: one MapInPandas node, not one projection
    # per merge (1000 merges would be a >1000-line plan otherwise)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(extended=False)
    plan = buf.getvalue()
    assert plan.count("MapInPandas") >= 1
    assert len(plan.splitlines()) < 250, "plan depth grew with merge count"

    merges_seq = [(m["left"], m["right"], m["merged"]) for m in merges]
    got = {r.doc_id: list(r.bpe_tokens) for r in out.collect()}
    for i in range(10):
        exp = [
            t
            for w in all_words[i * 40 : (i + 1) * 40]
            for t in apply_merges_to_symbols([*w, END], merges_seq)
        ]
        assert got[i] == exp, f"doc {i} mismatch"


def test_batched_training_equals_sequential_apply_property():
    """The batched-merge equivalence claim, property-tested without
    Spark: for random corpora and batch sizes, applying the
    batched-learned merge table SEQUENTIALLY (rank order, one pair at a
    time) to every training word reproduces the trainer's own final
    symbol states — i.e. the greedy disjoint selection really does make
    the one-pass batch rewrite equal to sequential application."""
    import random

    from data_pipeline_with_big_data_stack_spark.operators.bpe import (
        END,
        apply_merges_to_symbols,
        train_bpe_reference,
    )

    rng = random.Random(42)
    for trial in range(25):
        alphabet = "abcdef" if trial % 2 else "abcdefghij"
        freqs = {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 10))
            ): rng.randint(1, 20)
            for _ in range(rng.randint(5, 40))
        }
        batch = rng.choice([1, 2, 3, 7, 16])
        n_merges = rng.randint(1, 60)
        state: dict[str, list[str]] = {}
        merges = train_bpe_reference(
            freqs, n_merges, merges_per_round=batch, state_out=state
        )
        seq = [(m["left"], m["right"], m["merged"]) for m in merges]
        # the trainer's one-pass batch rewrites must leave every word in
        # EXACTLY the state a sequential rank-order fold produces
        for w in freqs:
            assert apply_merges_to_symbols([*w, END], seq) == state[w], (
                trial,
                w,
                batch,
            )
        # ranks dense and pair_counts positive regardless of batching
        assert [m["rank"] for m in merges] == list(range(len(merges)))
        assert all(m["pair_count"] > 0 for m in merges)


def test_batched_apply_one_pass_equals_sequential():
    """Direct check of the simultaneous-pass == sequential-fold claim on
    the exact table-lookup rewrite train_bpe_reference uses."""
    import random

    from data_pipeline_with_big_data_stack_spark.operators.bpe import (
        END,
        _select_batch,
        apply_merges_to_symbols,
    )

    rng = random.Random(9)
    for _ in range(200):
        syms = [rng.choice("abcd") for _ in range(rng.randint(2, 12))] + [END]
        cands = [("a", "b", 5), ("c", "d", 4), ("b", "c", 3), ("d", "a", 2)]
        batch = _select_batch([(a, b, c) for a, b, c in cands], 3)
        table = {(a, b): a + b for a, b, _ in batch}
        # one simultaneous left-to-right pass
        out, i = [], 0
        while i < len(syms):
            nxt = table.get((syms[i], syms[i + 1])) if i < len(syms) - 1 else None
            if nxt is not None:
                out.append(nxt)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        # sequential per-pair folds in selection order
        seq = apply_merges_to_symbols(
            list(syms), [(a, b, a + b) for a, b, _ in batch]
        )
        assert out == seq, (syms, batch)


def test_empty_word_symbols_and_apply(spark):
    """'' (double/leading spaces) must become just [</w>] — unguarded
    sequence(1,0) DESCENDS in Spark and would fabricate two empty
    symbols (wrong pair counts and token totals)."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators.bpe import (
        END,
        apply_bpe,
        to_symbols,
    )

    row = (
        spark.createDataFrame([("",), ("ab",)], ["word"])
        .select("word", to_symbols("word").alias("syms"))
        .orderBy("word")
        .collect()
    )
    assert list(row[0].syms) == [END]
    assert list(row[1].syms) == ["a", "b", END]

    # training on a vocab containing '' matches the reference
    freqs = {"": 3, "aa": 2, "ab": 5}
    words = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    assert train_bpe(words, 3) == train_bpe_reference(freqs, 3)

    # apply over text with a double space (split yields an empty word)
    docs = spark.createDataFrame([(0, "ab  ab")], ["doc_id", "text"])
    merges = train_bpe_reference({"ab": 2, "": 1}, 2)
    got = apply_bpe(docs, "text", merges, "doc_id").collect()[0]
    # 'ab', '', 'ab' → per-word tokens with '' contributing only </w>
    toks = list(got.bpe_tokens)
    assert toks.count(END) >= 1 and got.n_bpe_tokens == len(toks)
