"""Distributed BPE merge training (byte-pair encoding, Sennrich et al.
2016) over a word-frequency table.

The training loop the GPT-style tokenizers run, in Spark shape:

- The corpus is touched ONCE to build the distinct (word, freq) table —
  Zipf-bounded, orders of magnitude smaller than the corpus, and it
  stays distributed (never collected).
- Each merge round: explode adjacent symbol pairs weighted by word
  freq (one combiner-friendly groupBy on pair keys — vocabulary-
  bounded, not corpus-bounded), take the top candidates (a handful of
  tiny rows to the driver — the same documented driver-coordination
  exception as the k-means / connected-components loops), broadcast
  the winning pairs back as literals, and rewrite every word's symbol
  array with a left-to-right non-overlapping fold.
- ``merges_per_round`` > 1 enables the standard batched-merge trick:
  per round, greedily select the top-N candidate pairs whose symbol
  sets (left, right, merged) are pairwise disjoint, then apply them in
  ONE rewrite pass. Disjointness guarantees no selected pair can
  create or consume another's symbols, so the simultaneous pass is
  exactly equivalent to applying them sequentially — realistic
  tokenizer training (30 K+ merges) becomes O(n_merges / N) Spark
  rounds instead of one job per merge.
- ``localCheckpoint`` per round caps lineage growth, exactly like
  ``connected_components``.

Determinism: candidates sort on (count DESC, left ASC, right ASC) and
the greedy batch selection is a pure function of that order, so the
merge table is bit-reproducible — pinned against a pure-Python
reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.session import materialize

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)

END = "</w>"


def to_symbols(word_col) -> F.Column:
    """word → [c, h, a, r, s, </w>].

    The empty word ('' from double/leading spaces, or NULL) maps to
    just [</w>]: ``sequence(1, 0)`` DESCENDS in Spark (ANSI sequence
    semantics), so an unguarded transform would fabricate two
    empty-string symbols — the same hazard ``train_bpe`` guards in its
    pair expansion."""
    chars = F.expr(
        f"CASE WHEN length({word_col}) >= 1 THEN "
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1)) "
        f"ELSE cast(array() as array<string>) END"
    )
    return F.concat(chars, F.array(F.lit(END)))


def _merge_fold_multi(arr: F.Column, pairs: list[tuple[str, str, str]]) -> F.Column:
    """Replace every non-overlapping left-to-right adjacency matching
    any of ``pairs`` [(a, b, ab), ...] in ``arr`` with its merged
    symbol — the BPE apply step for one training round, as one
    JVM-side fold (no UDF, one projection regardless of batch size).

    Only valid for pairs with pairwise-disjoint symbol sets (what
    ``_select_batch`` guarantees): then occurrences of different pairs
    can never share a position and one pass equals sequential
    application."""
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
        merged = F.lit(None).cast("string")
        for a, b, ab in reversed(pairs):
            merged = F.when((cur == F.lit(a)) & (nxt == F.lit(b)), F.lit(ab)).otherwise(
                merged
            )
        is_pair = nxt.isNotNull() & merged.isNotNull()
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                is_pair,
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
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


def _merge_fold(arr: F.Column, a: str, b: str, ab: str) -> F.Column:
    """Single-pair special case of :func:`_merge_fold_multi`."""
    return _merge_fold_multi(arr, [(a, b, ab)])


def _select_batch(
    candidates: list[tuple[str, str, int]], limit: int
) -> list[tuple[str, str, int]]:
    """Greedy top-N selection of non-interacting merge pairs.

    ``candidates`` must already be sorted by (count DESC, a ASC,
    b ASC). A candidate conflicts if any of its symbols {a, b, a+b}
    intersects a previously selected pair's {a, b, a+b} — reserving
    the MERGED symbol too guarantees no selected pair can create
    another selected pair's operands (or vice versa) mid-pass, which
    is what makes one simultaneous rewrite exactly equal to
    sequential application."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for a, b, cnt in candidates:
        if a in used or b in used or (a + b) in used:
            continue
        out.append((a, b, cnt))
        used.update((a, b, a + b))
        if len(out) == limit:
            break
    return out


def train_bpe(
    words: DataFrame, n_merges: int, merges_per_round: int = 1
) -> list[dict]:
    """``words``: (word string, freq long), distinct. Returns the learned
    merge table: [{rank, left, right, merged, pair_count}, ...].

    ``merges_per_round=1`` is classic sequential BPE (one Spark round
    per merge — fine for small demo tables, documented ceiling for
    real 30 K-merge training). Larger values batch non-interacting
    merges per round; the candidate window is ``4 * merges_per_round``
    rows collected to the driver, so the per-round driver traffic
    stays O(batch), never O(vocabulary)."""
    syms = words.select(to_symbols("word").alias("arr"), "freq")
    syms = materialize(syms)
    merges: list[dict] = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
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
            .limit(4 * want)
            .collect()
        )
        if not top:
            break
        batch = _select_batch([(r.a, r.b, int(r.cnt)) for r in top], want)
        selected: list[tuple[str, str, str]] = []
        for a, b, cnt in batch:
            merges.append(
                {
                    "rank": len(merges),
                    "left": a,
                    "right": b,
                    "merged": a + b,
                    "pair_count": cnt,
                }
            )
            selected.append((a, b, a + b))
        syms = materialize(
            syms.select(
                _merge_fold_multi(F.col("arr"), selected).alias("arr"), "freq"
            )
        )
    return merges


def train_bpe_reference(
    word_freqs: dict[str, int],
    n_merges: int,
    merges_per_round: int = 1,
    state_out: dict | None = None,
) -> list[dict]:
    """Pure-Python reference (test oracle): identical semantics,
    tie-breaks, candidate window, and batch selection — no Spark.
    ``state_out``, if given, receives each word's FINAL symbol list
    (used by the batched-equivalence property test)."""
    syms = {w: [*w, END] for w in word_freqs}
    merges: list[dict] = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        ordered = sorted(
            ((a, b, c) for (a, b), c in counts.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )[: 4 * want]
        batch = _select_batch(ordered, want)
        table = {}
        for a, b, cnt in batch:
            merges.append(
                {
                    "rank": len(merges),
                    "left": a,
                    "right": b,
                    "merged": a + b,
                    "pair_count": cnt,
                }
            )
            table[(a, b)] = a + b
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                nxt = table.get((s[i], s[i + 1])) if i < len(s) - 1 else None
                if nxt is not None:
                    out.append(nxt)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    if state_out is not None:
        state_out.update(syms)
    return merges


def apply_merges_to_symbols(
    syms: list[str], merges_seq: list[tuple[str, str, str]]
) -> list[str]:
    """Apply a learned merge table to one symbol sequence: fold the
    merges in rank order, each as a left-to-right non-overlapping
    replacement pass — the canonical sequential-apply semantics the
    Spark paths and the test reference all share.

    The ``present``-superset prune (skip a merge whose operands were
    never both produced) keeps the common case O(symbols) per merge
    actually touching the word, without changing semantics."""
    present = set(syms)
    for a, b, ab in merges_seq:
        if a not in present or b not in present:
            continue
        out, i, n = [], 0, len(syms)
        changed = False
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
                changed = True
            else:
                out.append(syms[i])
                i += 1
        if changed:
            syms = out
            present.add(ab)
    return syms


def tokenize_vocabulary(vocab: DataFrame, merges: list[dict]) -> DataFrame:
    """(word) → (word, toks array<string>): fold ALL merges over the
    distinct word table in ONE Arrow-batched ``mapInPandas`` stage.

    This is the scale-correct apply shape: plan depth is constant in
    the merge-table size (one MapInPandas node — a 32 K-merge GPT-style
    table is the same plan as a 12-merge demo), and the UDF runs over
    the Zipf-bounded VOCABULARY, never the corpus, so this is not the
    per-row-Python anti-pattern. The per-merge-projection alternative
    blows up Catalyst analysis at realistic merge counts."""
    merges_seq = [(m["left"], m["right"], m["merged"]) for m in merges]

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            toks = [
                apply_merges_to_symbols([*w, END] if w else [END], merges_seq)
                for w in pdf["word"]
            ]
            yield pd.DataFrame({"word": pdf["word"], "toks": toks})

    return vocab.mapInPandas(fold, schema="word string, toks array<string>")


def apply_bpe(df: DataFrame, text_col: str, merges: list[dict], id_col: str) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table, the
    vocabulary-cached way real tokenizers run at scale: fold the merges
    over the DISTINCT word table (:func:`tokenize_vocabulary` — one
    mapInPandas stage, constant plan depth in merge count), broadcast
    the word→tokens map back onto the exploded text, and reassemble per
    document in word order. Adds ``bpe_tokens`` (array<string>) and
    ``n_bpe_tokens``."""
    words = F.split(F.col(text_col), " ")
    vocab = df.select(F.explode(words).alias("word")).distinct()
    tok = tokenize_vocabulary(vocab, merges)
    ex = df.select(
        id_col, F.posexplode(words).alias("__pos", "word")
    )
    # no forced broadcast on the word→tokens map: it is DISTINCT-WORD
    # sized (Zipf-bounded on natural language, but unbounded on raw web
    # text — URLs/typos/code grow it near-linearly). Let the optimizer
    # broadcast when the measured size allows; a shuffled join on
    # `word` is the correct fallback at open-web scale.
    agg = (
        ex.join(tok, "word")
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
