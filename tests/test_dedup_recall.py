"""Recall contracts for the fuzzy-dedup family on planted duplicates.

The dedup queries are oracle-checked for mechanism (bit-exact agreement
with a DuckDB replay), but a mechanism can agree with its oracle and
still miss real duplicates. These tests plant KNOWN near-duplicate
pairs — word-edited copies (high Jaccard), lightly-noised embeddings
(cosine ≈ 0.99) — in synthetic corpora and require each pipeline to
surface them. Deterministic: seeded data, md5-derived hashes."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_with_big_data_stack_spark.queries import QUERIES

# SLOW TIER (r16, VERDICT r15 #7): multi-scale / planted-corpus
# sweeps — excluded from the default run so the driver's verify
# window fits; run with `-m slow`.
pytestmark = pytest.mark.slow


def _rand_doc(rng, n_words: int) -> list[str]:
    return [
        "w%04d" % rng.randint(0, 3000) for _ in range(n_words)
    ]


@pytest.fixture(scope="module")
def planted_docs_dir(tmp_path_factory):
    """300 random documents with two planted duplicate classes, matched
    to the detectors' design points: 8 LIGHT pairs (one word edited —
    the near-identical boilerplate case simhash's hamming ≤ 3 targets)
    and 8 MODERATE pairs (~4% of words edited — the fuzzy-copy case
    minhash-LSH + Jaccard-verify targets)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(31337)
    docs: dict[int, list[str]] = {
        i: _rand_doc(rng, int(rng.randint(60, 180))) for i in range(300)
    }
    light, moderate = [], []
    for k in range(16):
        a = 10 + k * 18
        b = a + 7  # the copy's id
        if k < 8:
            # light pairs ride on LONG documents: one edited word in
            # 400-800 words keeps the changed-shingle fraction ~1%,
            # which is the regime simhash's hamming ≤ 3 detects
            docs[a] = _rand_doc(rng, int(rng.randint(400, 800)))
        words = list(docs[a])
        n_edits = 1 if k < 8 else max(2, len(words) // 25)
        for _ in range(n_edits):
            words[rng.randint(0, len(words))] = "w%04d" % rng.randint(0, 3000)
        docs[b] = words
        (light if k < 8 else moderate).append((a, b))
    pairs = {"light": light, "moderate": moderate}
    ids = sorted(docs)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([" ".join(docs[i]) for i in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(
                [f"src_{i % 5}" for i in ids], pa.string()
            ),
            "n_chars": pa.array(
                [len(" ".join(docs[i])) for i in ids], pa.int64()
            ),
        }
    )
    d = tmp_path_factory.mktemp("planted_docs")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d), pairs


def _pairs(spark, name, sf):
    return {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in QUERIES[name](spark, sf).collect()
    }


def test_minhash_lsh_finds_planted_duplicates(spark, planted_docs_dir):
    sf, planted = planted_docs_dir
    got = _pairs(spark, "q_dedup_minhash_lsh", sf)
    both = planted["light"] + planted["moderate"]
    found = sum(1 for p in both if p in got)
    assert found / len(both) >= 0.8, (found, len(both), sorted(got)[:20])
    # the near-identical class must be essentially complete
    found_light = sum(1 for p in planted["light"] if p in got)
    assert found_light / len(planted["light"]) >= 0.85, found_light


def test_simhash_finds_planted_duplicates(spark, planted_docs_dir):
    """SimHash's hamming ≤ 3 targets near-identical documents: the
    one-word-edit class must be found; the ~4% class is legitimately
    out of its design range (minhash covers it)."""
    sf, planted = planted_docs_dir
    got = {(a, b) for a, b in _pairs(spark, "q_dedup_simhash", sf)}
    found = sum(1 for p in planted["light"] if p in got)
    assert found / len(planted["light"]) >= 0.75, (found, sorted(got)[:20])


def test_ngram_jaccard_verifies_planted_duplicates(spark, planted_docs_dir):
    """The verify stage must keep the near-identical pairs (true
    Jaccard far above threshold) with high reported scores."""
    sf, planted = planted_docs_dir
    rows = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)): r.jaccard
        for r in QUERIES["q_dedup_ngram_jaccard"](spark, sf).collect()
    }
    found = [p for p in planted["light"] if p in rows]
    assert len(found) / len(planted["light"]) >= 0.75, (len(found), rows)
    assert all(rows[p] >= 0.5 for p in found), {p: rows[p] for p in found}


def _write_docs(tmp_path_factory, name, rows):
    """rows: [(doc_id, text)] → a documents.parquet dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp(name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_gopher_quality_flags_planted_spam(spark, tmp_path_factory):
    """Planted degenerate documents (one word repeated, boilerplate
    trigram loops) must fail the Gopher filter; normal varied documents
    must pass it."""
    rng = np.random.RandomState(7)
    rows, expect_ok = [], {}
    for i in range(10):  # healthy: varied words, sane lengths
        rows.append((i, " ".join(_rand_doc(rng, 120))))
        expect_ok[i] = True
    for i in range(10, 16):  # spam: one token repeated
        rows.append((i, " ".join(["w0001"] * 150)))
        expect_ok[i] = False
    for i in range(16, 20):  # boilerplate: 3-word loop
        rows.append((i, " ".join(["alpha", "beta", "gamma"] * 50)))
        expect_ok[i] = False
    sf = _write_docs(tmp_path_factory, "planted_spam", rows)
    got = {
        r.doc_id: r.quality_ok
        for r in QUERIES["q_doc_gopher_quality"](spark, sf).collect()
    }
    for i, ok in expect_ok.items():
        assert got[i] == ok, (i, got[i], ok)


def test_unigram_logprob_ranks_planted_rare_docs_lower(spark, tmp_path_factory):
    """A doc of corpus-rare words must score lower average logprob than
    docs of corpus-common words — the ordering the perplexity-proxy
    filter exists for."""
    rng = np.random.RandomState(8)
    common = ["c%02d" % i for i in range(20)]
    rows = []
    for i in range(30):  # common-vocabulary corpus mass
        rows.append((i, " ".join(rng.choice(common, 100))))
    rows.append((100, " ".join("r%04d" % k for k in range(100))))  # all-rare
    sf = _write_docs(tmp_path_factory, "planted_rare", rows)
    got = {
        r.doc_id: r.avg_logprob
        for r in QUERIES["q_doc_unigram_logprob"](spark, sf).collect()
    }
    rare = got.pop(100)
    assert rare < min(got.values()), (rare, min(got.values()))


def test_language_id_classifies_planted_languages(spark, tmp_path_factory):
    """Effectiveness contract for the stopword lang-ID: documents salted
    with one language's stopwords classify as that language (ambiguous
    es/fr shared words — de/la/que — resolve by distinct-hit count);
    stopword-free documents classify unknown."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    salt = {
        "en": ["the", "a", "of", "and", "to"],
        "es": ["el", "la", "y", "que", "el"],
        "de": ["der", "die", "das", "und", "zu"],
        "fr": ["le", "et", "la", "de", "le"],
    }
    rng = np.random.RandomState(99)
    rows = []
    expected = {}
    i = 0
    for lang, words in salt.items():
        for _ in range(5):
            body = _rand_doc(rng, 40) + words * 4
            rng.shuffle(body)
            rows.append((i, " ".join(body), lang))
            expected[i] = lang
            i += 1
    for _ in range(5):  # no stopwords at all
        rows.append((i, " ".join(_rand_doc(rng, 40)), "xx"))
        expected[i] = "unknown"
        i += 1
    d = tmp_path_factory.mktemp("planted_langs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {
        r.doc_id: r.predicted_lang
        for r in QUERIES["q_doc_language_id"](spark, str(d)).collect()
    }
    correct = sum(1 for i, lang in expected.items() if got[i] == lang)
    assert correct / len(expected) >= 0.9, {
        i: (got[i], expected[i]) for i in expected if got[i] != expected[i]
    }


def test_fuzzy_decontamination_catches_planted_leaks(spark, tmp_path_factory):
    """Effectiveness contract for the decontamination pass: corpus docs
    that are lightly-paraphrased copies of benchmark probes (doc_id <
    N_PROBE_DOCS plays the benchmark) must be flagged contaminated;
    unrelated docs must not be."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_with_big_data_stack_spark.queries.curation import _N_PROBE_DOCS

    rng = np.random.RandomState(555)
    docs: dict[int, list[str]] = {
        i: _rand_doc(rng, int(rng.randint(80, 200)))
        for i in range(_N_PROBE_DOCS + 120)
    }
    leaked = []
    for k in range(8):
        probe = k % _N_PROBE_DOCS
        cid = _N_PROBE_DOCS + 5 + k * 12
        words = list(docs[probe])
        for _ in range(max(1, len(words) // 30)):  # ~3% paraphrased
            words[rng.randint(0, len(words))] = "w%04d" % rng.randint(0, 3000)
        docs[cid] = words
        leaked.append(cid)
    ids = sorted(docs)
    d = tmp_path_factory.mktemp("planted_contam")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([" ".join(docs[i]) for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array([f"src_{i % 5}" for i in ids], pa.string()),
                "n_chars": pa.array(
                    [len(" ".join(docs[i])) for i in ids], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    rows = {
        r.doc_id: r
        for r in QUERIES["q_fuzzy_decontamination"](spark, str(d)).collect()
    }
    flagged = {i for i, r in rows.items() if r.contaminated}
    found = sum(1 for c in leaked if c in flagged)
    assert found / len(leaked) >= 0.85, (found, leaked, sorted(flagged))
    # precision: nothing outside the planted leaks gets flagged (random
    # docs share no meaningful shingles with the probes)
    assert flagged <= set(leaked), flagged - set(leaked)


def test_embedding_neardup_finds_planted_pairs(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(4096)
    n, dim = 1500, 64
    vecs = rng.randn(n, dim).astype(np.float32)
    planted = []
    for k in range(10):
        a, b = 50 + k * 30, 50 + k * 30 + 11
        vecs[b] = vecs[a] + rng.randn(dim).astype(np.float32) * 0.03
        planted.append((a, b))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, n), pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("planted_neardup")
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    got = {
        (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
        for r in QUERIES["q_embed_near_duplicates"](spark, str(d)).collect()
    }
    found = sum(1 for p in planted if p in got)
    assert found / len(planted) >= 0.8, (found, len(planted), sorted(got)[:10])
