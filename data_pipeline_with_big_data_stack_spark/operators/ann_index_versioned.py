"""Generation-versioned IVF-PQ index root — Druid-segment-style serving
(the reference's Druid datasource swaps whole immutable segment
versions under readers, `M/druid-goes-satellite-datasource.json`; this
is the same versioning applied to the ANN index lifecycle).

The single-generation ops in ``operators/ann_index`` swap live
directories in place, so their documented contract is "readers must
pause during maintenance". This layer removes that pause: writers
publish whole immutable GENERATIONS and readers resolve an atomic
``_CURRENT`` pointer once per query, so a search never observes a
half-swapped index and never errors under concurrent maintenance
(pinned in tests/test_ann_versioned.py).

Layout::

    root/
      _CURRENT               # text file: name of the live generation
      gen-000001/
        index/               # codes, partitioned by cell_id
        index_codebook/      # coarse centroids sidecar
        index_pq_codebook/   # PQ sub-codebooks sidecar
      gen-000002/
        index/               # .manifest.json references unchanged
        ...                  #   cell dirs in gen-000001 + new files

Writer protocol (build / append / compact / expire / retrain), all under
the root's single-writer lock:

1. materialize a NEW generation — a fresh physical build
   (build/retrain/compact) or, for the incremental ops, segment
   MANIFESTS (`operators/segman`) that reference the predecessor's
   unchanged immutable directories plus physical files for only the
   delta. A manifest is one small object write, so appends and expiries
   move ZERO bytes of carried data on every scheme — including linkless
   object stores, where the previous hardlink/copy clone was an
   O(index bytes) copy (VERDICT r11 #1; this mirrors Druid reusing
   unchanged segments across datasource versions);
2. publish by atomically flipping the ``_CURRENT`` pointer
   (`operators/fsio.write_text_atomic` — scheme-adaptive);
3. GC every generation except the new one and the generation that was
   PUBLISHED before it (passed explicitly — a directory listing cannot
   tell the real predecessor from a crashed writer's unpublished
   orphan). GC is manifest-aware: segment directories the kept
   generations still reference survive in place; a superseded
   generation is pruned down to its referenced segments and disappears
   entirely after the next full rewrite (compact/retrain) drops the
   references. Orphan generations are never pointer-visible and always
   vanish at the next publish's GC.

Scale notes: the pointer file, generation naming and manifests are
O(metadata); no lifecycle step copies carried bytes on ANY scheme, and
none of the steps below require an atomic rename (the in-place swap
gates in ``operators/ann_index`` do not apply here) — the whole
lifecycle is object-store-safe. Every data job inside is the
corresponding ``ann_index`` op unchanged (broadcast codebooks,
partition-pruned code scans, zero corpus shuffles); reads resolve
manifests via ``segman.read_table``, which keeps cell pruning on every
referenced segment group.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import fsio
from data_pipeline_with_big_data_stack_spark.operators import generations as G
from data_pipeline_with_big_data_stack_spark.operators import segman
from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
    _index_write_lock,
    build_ivfpq_index,
    search_ivfpq_index,
    train_ivfpq_codebooks,
)

# pointer/GC primitives live in operators/generations (shared with the
# streaming-dedup store's compactor); the names below are this module's
# original surface, kept as aliases.
_POINTER = G.POINTER
_GEN_PREFIX = G.GEN_PREFIX
_gen_name = G.gen_name
_list_generations = G.list_generations
_publish = G.publish
_gc = G.gc_generations
_next_gen = G.next_gen

# the three component tables a generation carries; "index" holds the
# codes (partitioned by cell_id), the other two are flat sidecars
_SIDECARS = ("index_codebook", "index_pq_codebook")


def _gen_index(root: str, gen: str) -> str:
    """Inner index path of a generation — the ``path`` every
    single-generation ``ann_index`` op takes (its two codebook sidecars
    are siblings ``<path>_codebook`` / ``<path>_pq_codebook``, which the
    generation dir naturally contains)."""
    return os.path.join(root, gen, "index")


def read_current(root: str) -> str:
    """Resolve the live generation name. Readers call this ONCE per
    query and then touch only that generation's files."""
    return G.read_current(root, init_hint="build_ivfpq_versioned")


def current_index_path(root: str) -> str:
    """Resolved inner index path of the live generation — hand this to
    any read-only ``ann_index`` helper (search, recall estimate); they
    resolve segment manifests themselves."""
    return _gen_index(root, read_current(root))


def _ref_sidecars(fs: fsio.Fs, root: str, cur: str, gen: str) -> None:
    """Carry the predecessor's codebook sidecars into the new
    generation BY REFERENCE — two manifest writes, zero data bytes."""
    for comp in _SIDECARS:
        segman.write_manifest(
            fs,
            os.path.join(root, gen, comp),
            segman.resolve_all(fs, os.path.join(root, cur, comp)),
            merge="union",
            reuse_from=os.path.join(root, cur, comp),
        )


def build_ivfpq_versioned(
    vecs: DataFrame,
    root: str,
    coarse_codebook: DataFrame,
    pq_codebooks: list[DataFrame],
    sub_dim: int,
    id_col: str = "vec_id",
) -> str:
    """Initialize (or wholesale-replace) a versioned index root: build
    generation N+1 from scratch (fully physical, no references),
    publish, GC. Returns the generation name."""
    fs = fsio.Fs(vecs.sparkSession, root)
    fs.mkdirs(root)
    lease = _index_write_lock(vecs.sparkSession, root)
    try:
        prev = G.read_current_or_none(root, fs=fs)
        gen = _next_gen(root, fs=fs)
        build_ivfpq_index(
            vecs,
            _gen_index(root, gen),
            coarse_codebook,
            pq_codebooks,
            sub_dim=sub_dim,
            id_col=id_col,
        )
        _publish(root, gen, fs=fs)
        _gc(root, gen, prev, fs=fs)
        return gen
    finally:
        lease.release()


def search_ivfpq_versioned(
    spark: SparkSession,
    root: str,
    probes: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Search the LIVE generation: resolve the pointer once, then run
    the single-generation search against that immutable generation.
    Safe under concurrent maintenance — a publish during the query flips
    the pointer for FUTURE resolutions; this query keeps reading the
    generation it resolved (retained as the grace predecessor, and its
    referenced segments are GC-protected by manifest liveness)."""
    return search_ivfpq_index(
        spark, current_index_path(root), probes, nprobe=nprobe, k=k, id_col=id_col
    )


def append_ivfpq_versioned(
    spark: SparkSession, root: str, vecs: DataFrame, id_col: str = "vec_id"
) -> str:
    """Append without retraining: the new generation's manifests
    REFERENCE every predecessor segment (three small writes, zero bytes
    of carried data on any scheme — the r11 hardlink clone copied the
    whole index on linkless stores), then the new vectors are coded
    with the referenced frozen codebooks via ``append_to_ivfpq_index``
    and land as physical files in the new generation only. The
    predecessor's files are untouched and shared by name."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
            append_to_ivfpq_index,
        )

        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        gen = _next_gen(root, fs=fs)
        segman.write_manifest(
            fs,
            _gen_index(root, gen),
            segman.resolve_all(fs, _gen_index(root, cur)),
            merge="union",
            reuse_from=_gen_index(root, cur),
        )
        _ref_sidecars(fs, root, cur, gen)
        append_to_ivfpq_index(spark, _gen_index(root, gen), vecs, id_col=id_col)
        _publish(root, gen, fs=fs)
        _gc(root, gen, cur, fs=fs)
        return gen
    finally:
        lease.release()


def _per_cell_file_counts(fs: fsio.Fs, entries: dict[str, list[str]]) -> dict:
    """Parquet-file count per LOGICAL cell across all referenced and
    physical segment dirs — one recursive listing per segment parent,
    attributed to cells by partition-dir basename (never by comparing
    absolute URI renderings)."""
    from collections import Counter

    counts: Counter = Counter()
    bases: dict[str, set[str]] = {}
    for logical, dirs in entries.items():
        for d in dirs:
            bases.setdefault(os.path.dirname(d.rstrip("/")), set()).add(logical)
    for base, logicals in bases.items():
        for f, _n in fs.file_sizes_recursive(base):
            if not f.endswith(".parquet"):
                continue
            part = os.path.basename(os.path.dirname(f))
            if part in logicals:
                counts[part] += 1
    return counts


def compact_ivfpq_versioned(
    spark: SparkSession, root: str, max_files_per_cell: int = 4
) -> str | None:
    """Compaction as a new generation: when any logical cell's file
    count (across every referenced segment) exceeds the threshold,
    rewrite ALL codes into one fresh fully-physical generation — one
    file per cell — and publish it; the sidecars are carried by
    reference. Returns the new generation, or None if no cell was over
    threshold. The no-op path is detected from listings alone BEFORE
    anything is materialized (ADVICE r11: it writes nothing, clones
    nothing, publishes nothing). A full CODE rewrite drops every code
    reference into older generations, which lets the next GC reclaim
    their code segments — compaction is what bounds segment
    accumulation, exactly as in an LSM/Druid segment store. The
    codebook SIDECARS stay referenced (compaction never retrains), so
    the generation that physically hosts them — the last build/retrain
    — survives as a pruned remnant until the next retrain/build."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        cur_index = _gen_index(root, cur)
        entries = segman.resolve_all(fs, cur_index)
        per_cell = _per_cell_file_counts(fs, entries)
        if not per_cell or max(per_cell.values()) <= max_files_per_cell:
            return None
        gen = _next_gen(root, fs=fs)
        df = segman.read_table(spark, fs, cur_index)
        (
            df.repartition(len(per_cell), F.col("cell_id"))
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(_gen_index(root, gen))
        )
        _ref_sidecars(fs, root, cur, gen)
        _publish(root, gen, fs=fs)
        _gc(root, gen, cur, fs=fs)
        return gen
    finally:
        lease.release()


def expire_ivfpq_versioned(
    spark: SparkSession,
    root: str,
    ids=None,
    predicate=None,
    id_col: str = "vec_id",
) -> str | None:
    """Retention as a new generation: find the affected cells, rewrite
    only THEIR survivors as physical files of the new generation, and
    carry every unaffected cell by reference (manifest entries, zero
    bytes moved — O(affected cells) data work, O(1 small writes)
    carry). Returns None without creating anything when nothing matched
    (the tombstone scan runs BEFORE any generation exists — an empty
    opt-out list pays one read, not a clone-publish-GC cycle; ADVICE
    r11). Same ids-or-predicate surface as ``ann_index.expire_vectors``."""
    if (ids is None) == (predicate is None):
        raise ValueError("pass exactly one of ids / predicate")
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        cur_index = _gen_index(root, cur)
        index = segman.read_table(spark, fs, cur_index)
        tomb = None
        if predicate is not None:
            # three-valued logic guard: a predicate that evaluates NULL
            # must mean KEEP (see ann_index.expire_vectors)
            predicate = F.coalesce(predicate, F.lit(False))
            doomed = index.filter(predicate)
        elif isinstance(ids, DataFrame):
            tomb = ids.select(F.col(ids.columns[0]).alias(id_col))
            doomed = index.join(tomb, id_col, "left_semi")
        else:
            tomb_list = list(ids)
            predicate = F.coalesce(
                F.col(id_col).isin(tomb_list) if tomb_list else F.lit(False),
                F.lit(False),
            )
            doomed = index.filter(predicate)
        # (unlike the standalone expire_vectors, no removal count is
        # returned here — the result is the generation name)
        tomb_agg = doomed.agg(F.collect_set("cell_id").alias("cells")).head()
        cells = sorted(tomb_agg["cells"])
        if not cells:
            return None
        gen = _next_gen(root, fs=fs)
        gen_index = _gen_index(root, gen)
        affected = index.filter(F.col("cell_id").isin(cells))
        if predicate is not None:  # null-coalesced above: ~pred is total
            survivors = affected.filter(~predicate)
        else:
            survivors = affected.join(tomb, id_col, "left_anti")
        (
            survivors.repartition(len(cells), F.col("cell_id"))
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(gen_index)
        )
        expired = {f"cell_id={c}" for c in cells}
        refs = {
            logical: dirs
            for logical, dirs in segman.resolve_all(fs, cur_index).items()
            if logical not in expired
        }
        if not refs and not any(
            n.startswith("cell_id=") for n in fs.list_names(gen_index)
        ):
            # an expiry that emptied EVERY cell (full purge) must not
            # leave a table Spark can't infer a schema from: park a
            # 0-row sentinel partition (cell ids are codebook row
            # numbers >= 0, so -1 never collides or gets probed)
            (
                survivors.limit(0)
                .drop("cell_id")
                .write.mode("overwrite")
                .parquet(os.path.join(gen_index, "cell_id=-1"))
            )
        segman.write_manifest(fs, gen_index, refs, merge="union", reuse_from=cur_index)
        _ref_sidecars(fs, root, cur, gen)
        _publish(root, gen, fs=fs)
        _gc(root, gen, cur, fs=fs)
        return gen
    finally:
        lease.release()


def retrain_ivfpq_versioned(
    spark: SparkSession,
    root: str,
    source_vecs: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    k_coarse: int | None = None,
    k_pq: int | None = None,
) -> str:
    """Retrain as a new generation — the reader-safe form of
    ``ann_index.retrain_ivfpq_index`` (same deterministic md5-seeded
    trainer, same semi-join to the live generation's ids so expired
    vectors never re-enter, and the retrain ≡ fresh-build identity is
    inherited because the new generation IS a fresh build — fully
    physical, every reference into older generations dropped). Readers
    of the old generation are undisturbed; the publish is one pointer
    write."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        cur_index = _gen_index(root, cur)
        # ONE bounded 1-row collect for all geometry/K stats
        # (metadata-scale sidecars): a single aggregate covers
        # n_sub/sub_dim/k_pq, and the coarse K rides along via a 1-row
        # cross join instead of a second count job (r15)
        geo = segman.read_table(spark, fs, cur_index + "_pq_codebook").agg(
            F.max("m").alias("mm"),
            F.max(F.size("c_emb")).alias("sd"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("k0"),
        )
        if k_coarse is None:
            geo = geo.crossJoin(
                segman.read_table(spark, fs, cur_index + "_codebook").agg(
                    F.count(F.lit(1)).alias("kc")
                )
            )
        r = geo.head()
        n_sub = int(r["mm"]) + 1
        sub_dim = int(r["sd"])
        if k_pq is None:
            k_pq = int(r["k0"])
        if k_coarse is None:
            k_coarse = int(r["kc"])
        ids = segman.read_table(spark, fs, cur_index).select(F.col(id_col))
        # materialized ONCE — see retrain_ivfpq_index: the seed/lloyd/
        # build passes below otherwise re-run the scan + semi-join ~10×
        from data_pipeline_with_big_data_stack_spark.session import materialize

        vecs = materialize(
            source_vecs.select(F.col(id_col), "emb").join(ids, id_col, "left_semi")
        )
        coarse_cb, pq_cbs = train_ivfpq_codebooks(
            vecs, k_coarse, k_pq, sub_dim, n_sub, iters=iters, id_col=id_col
        )
        gen = _next_gen(root, fs=fs)
        build_ivfpq_index(
            vecs,
            _gen_index(root, gen),
            coarse_cb,
            pq_cbs,
            sub_dim=sub_dim,
            id_col=id_col,
        )
        _publish(root, gen, fs=fs)
        _gc(root, gen, cur, fs=fs)
        return gen
    finally:
        lease.release()
