"""DuckDB replay oracles for the BPE trainer/tokenizer (round 8).

``operators/bpe.train_bpe`` is deterministic end to end — candidate
ordering is (count DESC, left ASC, right ASC), batch selection is a
pure greedy scan of that order, and the rewrite is a left-to-right
non-overlapping fold — so the whole k-round trajectory replays in SQL,
the same chained-CTE device the MMR and k-means oracles use
(`queries/vector.py`). Two pieces make the replay exact:

- **Greedy batch selection** (`_select_batch`'s used-set scan) runs as
  a RECURSIVE CTE over candidate ranks carrying (used symbols, picked
  ranks) — DuckDB 1.0's ``list_reduce`` mis-evaluates nested lambdas
  over non-constant lists, so the recursion is the reliable encoding.
- **Left-to-right non-overlapping merge**: for a pair (a, b) with
  a ≠ b, two occurrences can never overlap (an occurrence at i and
  i+1 would force a = b), so EVERY adjacency merges; for a = b,
  occurrences chain and the greedy fold takes alternate ones from the
  left of each run. Uniform SQL: group consecutive match positions
  into islands (gaps-and-islands on the cumulative match count) and
  merge the odd-indexed positions of each island; a position is
  consumed iff its left neighbour merged. Batched rounds reuse the
  same device unchanged — selected pairs have pairwise-disjoint
  symbol sets, so cross-pair matches can never overlap either.

Every chained CTE is MATERIALIZED: the merge table and symbol state
are each referenced more than once per round, and DuckDB's default
inlining would re-expand the whole prefix exponentially (the
12-round chain exhausts file handles re-opening the parquet scan).

The trainer is corpus-shaped only through the distinct word-frequency
table, so the oracle stays cheap at any document scale.
"""

from __future__ import annotations


def _round_ctes(r: int, n: int, batched: bool) -> str:
    """CTEs for training round ``r`` (1-based): candidate counting,
    winner selection, merge-table append, and the state rewrite."""
    prev = f"s{r - 1}"
    if not batched:
        # sequential mode: want == 1, the greedy batch over the top-4
        # window degenerates to the global argmax (the first candidate
        # is always selectable against an empty used-set)
        sel = f"""
  p{r} AS MATERIALIZED (
    SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS cnt
    FROM {prev}, unnest(range(1, len(syms))) AS t(i)
    GROUP BY 1, 2),
  chosen{r} AS MATERIALIZED (
    SELECT 1::BIGINT AS ord, a, b, cnt
    FROM (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1)),"""
    else:
        sel = f"""
  want{r} AS MATERIALIZED (SELECT {n} - count(*) AS want FROM m{r - 1}),
  p{r} AS MATERIALIZED (
    SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS cnt
    FROM {prev}, unnest(range(1, len(syms))) AS t(i)
    GROUP BY 1, 2),
  top{r} AS MATERIALIZED (
    SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
    FROM p{r} QUALIFY rn <= 4 * (SELECT want FROM want{r})),
  gr{r} AS (
    SELECT 0::BIGINT AS rn, CAST([] AS VARCHAR[]) AS used,
           CAST([] AS BIGINT[]) AS picked
    UNION ALL
    SELECT t.rn,
      CASE WHEN len(g.picked) < (SELECT want FROM want{r})
             AND NOT (list_contains(g.used, t.a) OR list_contains(g.used, t.b)
                      OR list_contains(g.used, t.a || t.b))
        THEN g.used || [t.a, t.b, t.a || t.b] ELSE g.used END,
      CASE WHEN len(g.picked) < (SELECT want FROM want{r})
             AND NOT (list_contains(g.used, t.a) OR list_contains(g.used, t.b)
                      OR list_contains(g.used, t.a || t.b))
        THEN g.picked || [t.rn] ELSE g.picked END
    FROM gr{r} g JOIN top{r} t ON t.rn = g.rn + 1),
  pick{r} AS MATERIALIZED (
    SELECT coalesce((SELECT picked FROM gr{r} ORDER BY rn DESC LIMIT 1),
                    CAST([] AS BIGINT[])) AS picked),
  chosen{r} AS MATERIALIZED (
    SELECT u.i AS ord, t.a, t.b, t.cnt
    FROM pick{r}, unnest(range(1, len(picked)+1)) AS u(i)
    JOIN top{r} t ON t.rn = pick{r}.picked[u.i]),"""
    rewrite = f"""
  m{r} AS MATERIALIZED (
    SELECT * FROM m{r - 1}
    UNION ALL
    SELECT (SELECT count(*) FROM m{r - 1}) + ord - 1 AS rank, a, b, cnt
    FROM chosen{r}),
  e{r} AS MATERIALIZED (
    SELECT base.word, base.freq, base.pos, base.sym, c.a AS ca, c.b AS cb
    FROM (SELECT s.word, s.freq, t.i AS pos, s.syms[t.i] AS sym,
                 coalesce(s.syms[t.i+1], '') AS nxt
          FROM {prev} s, unnest(range(1, len(s.syms)+1)) AS t(i)) base
    LEFT JOIN chosen{r} c ON c.a = base.sym AND c.b = base.nxt),
  i{r} AS MATERIALIZED (
    SELECT *, ca IS NOT NULL AS match,
           CASE WHEN ca IS NOT NULL THEN
             pos - count(*) FILTER (WHERE ca IS NOT NULL)
               OVER (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)
           END AS island
    FROM e{r}),
  g2{r} AS MATERIALIZED (
    SELECT *, match AND (row_number()
      OVER (PARTITION BY word, island ORDER BY pos) % 2 = 1) AS mstart
    FROM i{r}),
  c2{r} AS MATERIALIZED (
    SELECT *, coalesce(lag(mstart)
      OVER (PARTITION BY word ORDER BY pos), FALSE) AS consumed
    FROM g2{r}),
  s{r} AS MATERIALIZED (
    SELECT word, any_value(freq) AS freq,
           list(CASE WHEN mstart THEN ca || cb ELSE sym END ORDER BY pos)
             FILTER (WHERE mstart OR NOT consumed) AS syms
    FROM c2{r} GROUP BY word),"""
    return sel + rewrite


def _train_ctes(n: int, batched: bool) -> str:
    """The shared CTE prefix: word frequencies, the char+``</w>``
    initial symbol state, and ``n`` chained training rounds producing
    merge table ``m{n}`` and final vocabulary state ``s{n}``."""
    ctes = """
  w0 AS MATERIALIZED (
    SELECT word, count(*)::BIGINT AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word),
  s0 AS MATERIALIZED (
    SELECT word, freq,
           list_append(list_transform(range(1, length(word)+1),
                                      i -> word[i]), '</w>') AS syms
    FROM w0),
  m0 AS MATERIALIZED (
    SELECT NULL::BIGINT AS rank, NULL::VARCHAR AS a, NULL::VARCHAR AS b,
           NULL::BIGINT AS cnt WHERE FALSE),"""
    for r in range(1, n + 1):
        ctes += _round_ctes(r, n, batched)
    return ctes


def bpe_train_oracle(n: int, batched: bool = False) -> str:
    """Full-trajectory oracle for ``q_bpe_train_merges`` (sequential)
    or the batched trainer: replays all ``n`` rounds and emits the
    merge table."""
    return "WITH RECURSIVE" + _train_ctes(n, batched) + f"""
  final AS (SELECT * FROM m{n})
  SELECT rank, a AS "left", b AS "right", a || b AS merged,
         cnt AS pair_count
  FROM final ORDER BY rank
"""


def bpe_tokenize_oracle(n: int) -> str:
    """Oracle for ``q_doc_tokenize_bpe``: batched-train the merges,
    then tokenize. Applying the learned merges in rank order to the
    training corpus reproduces the trainer's FINAL symbol state
    (sequential application to each word is exactly the training
    trajectory; within-round batches are disjoint, so simultaneous ≡
    sequential), so per-doc BPE token counts come straight from
    ``s{n}``. ``tokens_per_word`` rounds in integer space on both
    engines (the ``round4`` half-offset device; counts are
    non-negative — allowlisted in tests/test_oracle_rounding_lint)."""
    return "WITH RECURSIVE" + _train_ctes(n, batched=True) + f"""
  ws AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_ws FROM documents),
  ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
  bpe AS (SELECT e.doc_id, sum(len(s.syms))::BIGINT AS n_bpe
          FROM ex e JOIN s{n} s USING (word) GROUP BY e.doc_id)
  SELECT w.doc_id, w.n_ws AS n_ws_tokens, b.n_bpe AS n_bpe_tokens,
         ((2 * b.n_bpe * 10000 + w.n_ws) // (2 * w.n_ws)) / 10000.0
           AS tokens_per_word
  FROM ws w JOIN bpe b USING (doc_id)
"""
