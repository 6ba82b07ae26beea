"""CI guard against superlinear regressions (VERDICT r4 #7).

tools/scale_audit.py found exactly one superlinear hotspot in round 4
(per-row Decimal.quantize in grouped normalize) — but only because a
human ran it. This suite runs the same twin-dataset audit at 1×/4×
inside pytest so the next accidental pair-explosion or driver loop
fails CI instead of waiting for a manual audit.

Threshold: 4× data must stay under 8× wall-clock. Linear operators land
near 4× (often below — fixed-output aggregations amortize); a quadratic
defect lands near 16×. 8× leaves shared-host noise headroom (single
runs here swing ~25%, see COVERAGE r4 §6) while still catching every
defect class the audit is for.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import scale_audit  # noqa: E402

# SLOW TIER (r16, VERDICT r15 #7): multi-scale / planted-corpus
# sweeps — excluded from the default run so the driver's verify
# window fits; run with `-m slow`.
pytestmark = pytest.mark.slow

FACTOR = 4
MAX_RATIO = 8.0
# one representative per heavy family: window/session, LSH dedup,
# simhash dedup, iterative graph (pointer-doubling CC), text windowing,
# vector (inline IVF-PQ incl. training), grouped-map pandas, MG sketch
AUDITED = [
    "q_events_sessionization",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_clusters",
    "q_doc_sequence_packing",
    "q_ann_ivfpq_topk",
    "q_grouped_normalize_values",
    "q_frequent_items_users",
    # round 6: index lifecycle with per-cell tombstone expiry — build is
    # linear, expiry must stay O(affected cells), never O(pairs)
    "q_ann_ivfpq_index_expire",
    # round 7: full reindex (md5-seeded codebook retrain + re-code +
    # tri-dir swap) — O(corpus) by design, must stay LINEAR in it
    "q_ann_ivfpq_index_retrain",
    # round 7: trained NB classifier (train counts + broadcast-model
    # scoring) — the model is fixed-size, so scoring must scale with
    # the corpus only
    "q_quality_classifier_nb",
    # round 7: streaming ingestion dedup — per batch it joins batch
    # bands against the accumulated index and verifies candidates;
    # a bucket-cap regression here is exactly the pair-explosion class
    # this audit exists for
    "q_stream_dedup_ingest",
]


@pytest.fixture(scope="module")
def twin_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("scale_twins")
    d1, dN = str(base / "x1"), str(base / f"x{FACTOR}")
    scale_audit.gen(d1, 30_000, 1_500, 2_000)
    scale_audit.gen(dN, 30_000 * FACTOR, 1_500 * FACTOR, 2_000 * FACTOR)
    return d1, dN


@pytest.mark.parametrize("name", AUDITED)
def test_ratio_stays_sublinear_enough(spark, twin_dirs, name):
    d1, dN = twin_dirs

    def measure():
        t1 = scale_audit.run(spark, scale_audit.QUERIES[name], d1)
        tN = scale_audit.run(spark, scale_audit.QUERIES[name], dN)
        return t1, tN, tN / t1

    t1, tN, ratio = measure()
    if ratio >= MAX_RATIO:
        # one re-measure before failing: a neighbor job on this shared
        # host can skew a single wall-clock pair; a REAL superlinear
        # operator is over the ceiling both times
        t1, tN, ratio = measure()
    assert ratio < MAX_RATIO, (
        f"{name}: {FACTOR}x data took {ratio:.1f}x wall-clock "
        f"({t1:.2f}s -> {tN:.2f}s) — superlinear regression (re-measured)"
    )


def test_dedup_ingest_per_batch_cost_sublinear_in_accumulated_state(spark, tmp_path):
    """Round 10 (VERDICT r8 #2 done-criterion): one identical
    incremental micro-batch against 4x the ACCUMULATED index state must
    not cost 4x — the prior reads (bands index, count sidecar, doc
    store) partition-prune to the batch's touched buckets, so per-batch
    cost tracks the batch, not the store. Ceiling is FACTOR (4x): an
    unpruned rescan of the accumulated state is linear in it and lands
    at ~FACTOR once state dominates; the pruned path stays near 1x."""
    import time

    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators import dedup_ingest as DI

    words = [f"w{i:04d}" for i in range(3000)]

    def corpus(n, start=0):
        import random

        rng = random.Random(7)
        rows = [
            (
                start + i,
                " ".join(rng.choice(words) for _ in range(80)),
            )
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def build_store(n_docs, name):
        # n_bkt well above the incremental batch's key count, so the
        # prune is actually exercised (touched ≪ n_bkt) instead of the
        # batch touching every bucket and the test measuring only fixed
        # per-job overhead
        store = DI.init_dedup_ingest_store(spark, str(tmp_path / name), n_bkt=64)
        docs = corpus(n_docs)
        # accumulate in 4 epochs of ascending ids
        for e in range(4):
            chunk = docs.filter(
                (F.col("doc_id") >= n_docs * e // 4)
                & (F.col("doc_id") < n_docs * (e + 1) // 4)
            )
            DI.dedup_ingest_batch(chunk, e, store)
        return store

    n1 = 1_500
    s1 = build_store(n1, "x1")
    sN = build_store(n1 * FACTOR, f"x{FACTOR}")
    # 4 docs → ≤12 band keys → ≤12 of 64 buckets touched
    batch = corpus(4, start=10_000_000)

    def measure():
        def one(store):
            t0 = time.perf_counter()
            DI.dedup_ingest_batch(batch, 4, store)
            return time.perf_counter() - t0

        t1, tN = one(s1), one(sN)
        return t1, tN, tN / t1

    t1, tN, ratio = measure()
    if ratio >= FACTOR:
        t1, tN, ratio = measure()  # re-measure once (shared-host noise)
    assert ratio < FACTOR, (
        f"per-batch ingest: {FACTOR}x accumulated state took {ratio:.1f}x "
        f"wall-clock ({t1:.2f}s -> {tN:.2f}s) — prior reads are scanning "
        "the store instead of pruning to touched buckets (re-measured)"
    )


def test_substring_ingest_per_batch_cost_sublinear_in_accumulated_state(
    spark, tmp_path
):
    """Round 14 (VERDICT r13 #1 done-criterion b): one identical tiny
    micro-batch against 4x the ACCUMULATED window-fingerprint index
    must not cost 4x — the prior index read partition-prunes to the
    batch's touched buckets (<= 3 of 64 here), so per-batch cost tracks
    the batch, not the store. Mirrors the dedup_ingest twin above."""
    import time

    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators import (
        substring_ingest as SI,
    )

    words = [f"w{i:04d}" for i in range(3000)]

    def corpus(n, start=0):
        import random

        rng = random.Random(11)
        rows = [
            (start + i, " ".join(rng.choice(words) for _ in range(40)))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def build_store(n_docs, name):
        store = SI.init_substring_store(
            spark, str(tmp_path / name), n_bkt=64
        )
        docs = corpus(n_docs)
        for e in range(4):
            chunk = docs.filter(
                (F.col("doc_id") >= n_docs * e // 4)
                & (F.col("doc_id") < n_docs * (e + 1) // 4)
            )
            SI.substring_ingest_batch(chunk, e, store)
        return store

    n1 = 1_000
    s1 = build_store(n1, "sub_x1")
    sN = build_store(n1 * FACTOR, f"sub_x{FACTOR}")
    # 1 doc, 10 novel tokens -> 3 windows -> <= 3 of 64 buckets touched
    trickle = spark.createDataFrame(
        [(10_000_000, " ".join(f"zz{j}" for j in range(10)))],
        "doc_id long, text string",
    )

    def measure():
        def one(store):
            t0 = time.perf_counter()
            SI.substring_ingest_batch(trickle, 4, store)
            return time.perf_counter() - t0

        t1, tN = one(s1), one(sN)
        return t1, tN, tN / t1

    t1, tN, ratio = measure()
    if ratio >= FACTOR:
        t1, tN, ratio = measure()  # re-measure once (shared-host noise)
    assert ratio < FACTOR, (
        f"per-batch substring ingest: {FACTOR}x accumulated index took "
        f"{ratio:.1f}x wall-clock ({t1:.2f}s -> {tN:.2f}s) — the prior "
        "read is scanning the index instead of pruning to touched "
        "buckets (re-measured)"
    )


def test_substring_ingest_per_epoch_listing_stays_bounded_with_folds(
    spark, tmp_path, monkeypatch
):
    """Round 14 (VERDICT r13 #5): per-epoch evidence on a DETERMINISTIC
    metric, not wall-clock — each epoch's prior-read file LISTING.
    Without folds it grows O(epochs) (exactly n_bkt new files per epoch
    at this fixture: every epoch touches every bucket). With in-drain
    folds (compact_every=2) the listing is a bounded LSM sawtooth: the
    incremental-fold chain grows the listing ~log-fashion between full
    upgrades, and every size-ratio full upgrade resets it to the
    O(buckets) floor — so later epochs list strictly less than the
    unfolded drain and keep returning to the floor as the index grows.
    A regression to no-op folds makes the folded drain track the
    unfolded one's linear growth and fails both asserts."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators import (
        dedup_ingest as DI,
    )
    from data_pipeline_with_big_data_stack_spark.operators import (
        substring_ingest as SI,
    )
    from data_pipeline_with_big_data_stack_spark.queries.curation import (
        substring_windows,
    )
    from data_pipeline_with_big_data_stack_spark.tables import load_table
    from tests.conftest import SF_SMOKE
    from tests.test_substring_ingest import _prior_idx_files

    n_bkt, n_chunks = 8, 12
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 240)
    )

    counts: dict[int, int] = {}
    orig = SI.substring_ingest_batch

    def spy(batch, eid, store, k=8, fail_after=None, **kw):
        if eid > 0:
            _b, c = substring_windows(batch.select("doc_id", "text"), k)
            touched = {
                int(r[0])
                for r in c.select(
                    F.pmod(F.hash("w1"), F.lit(store.n_bkt)).cast("int")
                )
                .distinct()
                .collect()
            }
            counts[eid] = _prior_idx_files(store, eid, touched)
        return orig(batch, eid, store, k=k, fail_after=fail_after, **kw)

    monkeypatch.setattr(SI, "substring_ingest_batch", spy)

    def drain(**kw):
        counts.clear()
        base, src = DI.stage_ordered_chunks(spark, docs, n_chunks=n_chunks)
        store = SI.init_substring_store(
            spark, os.path.join(base, "store"), n_bkt=n_bkt
        )
        SI.run_substring_ingest_stream(spark, src, store, **kw)
        return dict(counts)

    unfolded = drain()
    folded = drain(compact_every=2)
    last = n_chunks - 1
    # O(epochs) accretion without folds: ~n_bkt new index files per epoch
    assert unfolded[last] >= n_bkt * (last - 1), (
        "unfolded drains must accrete ~n_bkt files per epoch — the "
        "fixture no longer exercises O(epochs) growth"
    )
    # folds must have collapsed at least two epochs' worth of files by
    # the last epoch (a no-op fold tracks the unfolded line exactly)
    assert folded[last] <= unfolded[last] - 2 * n_bkt, (
        f"folded drain listed {folded[last]} files at epoch {last} vs "
        f"{unfolded[last]} unfolded — the in-drain folds are not "
        "collapsing the listing"
    )
    # every LSM full upgrade resets the listing to the O(buckets)
    # floor: some later epoch lists ~(1 fold partition + 1 in-flight
    # epoch) x n_bkt files even though 4x the corpus has accumulated
    assert min(folded[e] for e in range(4, n_chunks)) <= 3 * n_bkt, (
        f"folded listings never returned to the O(buckets) floor: "
        f"{folded} — the size-ratio full upgrade is not firing"
    )
