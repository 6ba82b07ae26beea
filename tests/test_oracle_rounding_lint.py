"""Registry lint: sign-less half-offset rounding devices (ADVICE r6).

The engine's exact 4-dp rounding devices are sign-aware on BOTH sides:
Spark's ``round4_micros``/``round_ratio`` compute
``sign(m) * ((2*|m| + q) div 2q)`` and the DuckDB oracles must replay
exactly that. A sign-LESS oracle form ``((2*m + q) // 2q)`` silently
diverges for negative ``m`` because DuckDB's ``//`` truncates toward
zero (-10000 micros / 3 rows → -0.0032 instead of the half-away
-0.0033). The fixtures happen to be non-negative today, so the bug
class is latent — this lint keeps it extinct: every half-offset
device in every registered oracle must either wrap its numerator in
``abs(...)`` (with the ``sign(...)`` factor outside) or be allowlisted
here with a proof of non-negativity.
"""

from __future__ import annotations

import re

from data_pipeline_with_big_data_stack_spark.queries import ORACLES

# Queries whose sign-less devices are PROVABLY non-negative — the
# numerator is a count, a length, or a decoder-emitted dimension, none
# of which can go negative for any input:
ALLOW_NONNEG = {
    # step-count conversion rates: count(t_click)/count(*) etc.
    "q_events_funnel",
    "q_events_funnel_one_pass",
    # token/word counts and length sums over string_split output
    "q_doc_gopher_quality",
    "q_doc_quality_scores",
    "q_corpus_mixture_sampling",
    "q_source_capped_sampling",
    # decoder-emitted dimensions: width/height are nibble-derived
    # (64 + nib*8 >= 64), pixbytes/hist bins are products of those
    "q_media_metadata_profile",
    # precision/recall ratios: tp / n_pred_pos / n_pos are CASE-counted
    # row tallies
    "q_quality_classifier_pr",
    # BPE tokens_per_word: both numerator (BPE token count) and
    # denominator (whitespace token count) are list-length tallies
    "q_doc_tokenize_bpe",
}

# A half-offset rounding device: a doubled (or 10^4-scaled) numerator
# plus a half-divisor offset, integer-divided. The lookbehind window
# bounds how far back the numerator can start.
_DEVICE_MARK = re.compile(r"\(2\s*\*|\(20000\s*\*|\*10000\s*\+")
_WINDOW = 300


def _device_windows(sql: str):
    for m in re.finditer(r"//", sql):
        w = sql[max(0, m.start() - _WINDOW) : m.start()]
        if _DEVICE_MARK.search(w):
            yield w


def test_no_signless_rounding_over_possibly_negative_sums():
    bad: dict[str, int] = {}
    for name, sql in ORACLES.items():
        if name in ALLOW_NONNEG:
            continue
        for w in _device_windows(sql):
            if "abs(" not in w:
                bad[name] = bad.get(name, 0) + 1
    assert not bad, (
        "sign-less half-offset rounding device(s) over a numerator that "
        "is not provably non-negative — DuckDB // truncates toward zero, "
        "so these oracles diverge from Spark's sign-aware round4_* on "
        f"negative sums: {bad}. Wrap the numerator in abs() with a "
        "sign() factor outside, or add the query to ALLOW_NONNEG with a "
        "non-negativity proof."
    )


def test_allowlist_entries_still_have_devices():
    """An allowlist entry whose oracle no longer contains any device is
    stale — prune it so the list stays an honest inventory."""
    stale = [
        n
        for n in ALLOW_NONNEG
        if n not in ORACLES or not any(_device_windows(ORACLES[n]))
    ]
    assert not stale, f"ALLOW_NONNEG entries without devices: {stale}"
