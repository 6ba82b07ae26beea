"""Distributed BPE merge training (byte-pair encoding, Sennrich et al.
2016) over a word-frequency table.

The training loop the GPT-style tokenizers run, in Spark shape:

- The corpus is touched ONCE to build the distinct (word, freq) table —
  Zipf-bounded, orders of magnitude smaller than the corpus, and it
  stays distributed (never collected).
- Each merge round: explode adjacent symbol pairs weighted by word
  freq (one combiner-friendly groupBy on pair keys — vocabulary-
  bounded, not corpus-bounded), take the argmax (ONE tiny row to the
  driver — the same documented driver-coordination exception as the
  k-means / connected-components loops), broadcast the winning pair
  back as literals, and rewrite every word's symbol array with a
  left-to-right non-overlapping fold.
- ``localCheckpoint`` per round caps lineage growth, exactly like
  ``connected_components``.

Determinism: ties break on (count DESC, left ASC, right ASC), so the
merge table is bit-reproducible — pinned against a pure-Python
reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)

END = "</w>"


def to_symbols(word_col) -> F.Column:
    """word → [c, h, a, r, s, </w>]."""
    chars = F.expr(
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
    )
    return F.concat(chars, F.array(F.lit(END)))


def _merge_fold(arr: F.Column, a: str, b: str, ab: str) -> F.Column:
    """Replace every non-overlapping left-to-right (a, b) adjacency in
    ``arr`` with the merged symbol ``ab`` — the BPE apply step, as one
    JVM-side fold (no UDF)."""
    idx = F.sequence(F.lit(0), F.size(arr) - 1)
    init = F.struct(
        F.expr("cast(array() as array<string>)").alias("out"),
        F.lit(False).alias("skip"),
    )

    def step(acc, i):
        # F.get (0-based) returns null past the end; element_at THROWS
        # there under ANSI mode (the Spark 4 default)
        cur = F.get(arr, i)
        nxt = F.get(arr, i + 1)
        is_pair = nxt.isNotNull() & (cur == F.lit(a)) & (nxt == F.lit(b))
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                is_pair,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(ab))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(idx, init, step, lambda acc: acc["out"])


def train_bpe(words: DataFrame, n_merges: int) -> list[dict]:
    """``words``: (word string, freq long), distinct. Returns the learned
    merge table: [{rank, left, right, merged, pair_count}, ...]."""
    syms = words.select(to_symbols("word").alias("arr"), "freq")
    syms = syms.localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(n_merges):
        # guard: sequence(0, -1) DESCENDS in Spark, so a fully-merged
        # single-symbol word would index arr[-1] (ANSI error)
        pairs = syms.select(
            "freq",
            F.explode(
                F.expr(
                    "CASE WHEN size(arr) >= 2 THEN "
                    "transform(sequence(0, size(arr) - 2), "
                    "i -> struct(arr[i] AS a, arr[i+1] AS b)) "
                    "ELSE cast(array() as array<struct<a string, b string>>) END"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        best = top[0]
        ab = best.a + best.b
        merges.append(
            {
                "rank": rank,
                "left": best.a,
                "right": best.b,
                "merged": ab,
                "pair_count": int(best.cnt),
            }
        )
        syms = syms.select(
            _merge_fold(F.col("arr"), best.a, best.b, ab).alias("arr"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def train_bpe_reference(word_freqs: dict[str, int], n_merges: int) -> list[dict]:
    """Pure-Python reference (test oracle): identical semantics and
    tie-breaks, no Spark."""
    syms = {w: [*w, END] for w in word_freqs}
    merges: list[dict] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        ab = a + b
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": ab, "pair_count": cnt}
        )
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def apply_bpe(df: DataFrame, text_col: str, merges: list[dict], id_col: str) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table, the
    vocabulary-cached way real tokenizers run at scale: fold the merges
    over the DISTINCT word table (each fold is its own projection
    referencing the previous by column name — a LINEAR plan; inlining
    the fold chain per row duplicates the array expression per level
    and blows up exponentially), broadcast the word→tokens map back
    onto the exploded text, and reassemble per document in word order.
    Adds ``bpe_tokens`` (array<string>) and ``n_bpe_tokens``."""
    words = F.split(F.col(text_col), " ")
    vocab = df.select(F.explode(words).alias("word")).distinct()
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    tok = vocab.withColumn("toks", F.concat(chars, F.array(F.lit(END))))
    for m in merges:
        tok = tok.withColumn(
            "toks", _merge_fold(F.col("toks"), m["left"], m["right"], m["merged"])
        )
    ex = df.select(
        id_col, F.posexplode(words).alias("__pos", "word")
    )
    agg = (
        ex.join(F.broadcast(tok), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
    )
    return df.join(agg, id_col, "left")
