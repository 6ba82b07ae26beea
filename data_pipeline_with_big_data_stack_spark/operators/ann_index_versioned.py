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
      gen-000002/ ...

Writer protocol (build / append / compact / expire / retrain), all under
the root's single-writer lock:

1. materialize a NEW generation dir — a fresh build (build/retrain/
   compact/expire) or a clone of the current generation plus the delta
   (append). On local/linking filesystems the clone is hardlinks —
   O(#files) metadata, zero byte copies, code files shared with the
   predecessor; on linkless object stores it is a byte copy
   (O(index bytes) per append — batch appends accordingly, or adopt a
   manifest-reference layout; see ``fsio.Fs.clone_tree``);
2. publish by atomically replacing the ``_CURRENT`` pointer
   (write-temp + atomic rename, `operators/fsio`);
3. GC every generation except the new one and the generation that was
   PUBLISHED before it (passed explicitly — a directory listing cannot
   tell the real predecessor from a crashed writer's unpublished
   orphan). Keeping the published predecessor gives in-flight readers
   that resolved the old pointer a full grace generation: a reader
   would have to survive TWO subsequent maintenance publishes
   mid-query before its files could vanish. Orphan generations are
   never pointer-visible and always vanish at the next publish's GC.

Scale notes: the pointer file and generation naming are O(1) metadata;
hardlink cloning is metadata-only on any POSIX filesystem (remote
roots clone by copy — ``fsio.Fs.clone_tree``); every data job inside
is the corresponding ``ann_index`` op unchanged (broadcast codebooks,
partition-pruned code scans, zero corpus shuffles). All protocol
filesystem access goes through the Hadoop FS API (`operators/fsio`),
so the root may live on any supported scheme.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import fsio
from data_pipeline_with_big_data_stack_spark.operators import generations as G
from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
    _index_write_lock,
    build_ivfpq_index,
    search_ivfpq_index,
    train_ivfpq_codebooks,
)

# pointer/GC/clone primitives live in operators/generations (shared with
# the streaming-dedup store's compactor); the names below are this
# module's original surface, kept as aliases.
_POINTER = G.POINTER
_GEN_PREFIX = G.GEN_PREFIX
_gen_name = G.gen_name
_list_generations = G.list_generations
_publish = G.publish
_gc = G.gc_generations
_next_gen = G.next_gen
_clone_generation = G.clone_generation


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
    any read-only ``ann_index`` helper (search, recall estimate)."""
    return _gen_index(root, read_current(root))


def build_ivfpq_versioned(
    vecs: DataFrame,
    root: str,
    coarse_codebook: DataFrame,
    pq_codebooks: list[DataFrame],
    sub_dim: int,
    id_col: str = "vec_id",
) -> str:
    """Initialize (or wholesale-replace) a versioned index root: build
    generation N+1 from scratch, publish, GC. Returns the generation
    name."""
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
    the single-generation search against that immutable dir. Safe under
    concurrent maintenance — a publish during the query flips the
    pointer for FUTURE resolutions; this query keeps reading the
    generation it resolved (retained as the grace predecessor)."""
    return search_ivfpq_index(
        spark, current_index_path(root), probes, nprobe=nprobe, k=k, id_col=id_col
    )


def append_ivfpq_versioned(
    spark: SparkSession, root: str, vecs: DataFrame, id_col: str = "vec_id"
) -> str:
    """Append without retraining: hardlink-clone the live generation
    (metadata-only), code the new vectors with the clone's frozen
    codebooks via ``append_to_ivfpq_index``, publish the clone. The
    predecessor's files are untouched — appended files exist only in
    the new generation."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
            append_to_ivfpq_index,
        )

        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        gen = _next_gen(root, fs=fs)
        _clone_generation(os.path.join(root, cur), os.path.join(root, gen), fs=fs)
        append_to_ivfpq_index(spark, _gen_index(root, gen), vecs, id_col=id_col)
        _publish(root, gen, fs=fs)
        _gc(root, gen, cur, fs=fs)
        return gen
    finally:
        lease.release()


def compact_ivfpq_versioned(
    spark: SparkSession, root: str, max_files_per_cell: int = 4
) -> str | None:
    """Compaction as a new generation: clone (hardlinks), compact the
    clone in place (its rewrite replaces the clone's links with fresh
    files — the predecessor keeps the originals), publish. Returns the
    new generation, or None if no cell was over threshold (no new
    generation is published for a no-op)."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
            compact_ivfpq_index,
        )

        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        gen = _next_gen(root, fs=fs)
        _clone_generation(os.path.join(root, cur), os.path.join(root, gen), fs=fs)
        # the clone is reader-invisible until the publish below, so a
        # half-applied in-place swap is just an orphan generation —
        # the compact may run on non-atomic-rename schemes too
        changed = compact_ivfpq_index(
            spark,
            _gen_index(root, gen),
            max_files_per_cell=max_files_per_cell,
            _unpublished_tree=True,
        )
        if not changed:
            fs.delete(os.path.join(root, gen))
            return None
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
    """Retention as a new generation: clone, drop the expired vectors
    from the clone via ``expire_vectors`` (same ids-or-predicate
    surface), publish. Returns None without publishing when nothing
    matched (same no-op contract as ``compact_ivfpq_versioned``) — an
    empty opt-out list must not pay a full clone-publish-GC cycle,
    which on a linkless store copies every index byte for a
    byte-identical result."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
            expire_vectors,
        )

        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        gen = _next_gen(root, fs=fs)
        _clone_generation(os.path.join(root, cur), os.path.join(root, gen), fs=fs)
        n_removed = expire_vectors(
            spark,
            _gen_index(root, gen),
            ids=ids,
            predicate=predicate,
            id_col=id_col,
            _unpublished_tree=True,  # reader-invisible until the publish
        )
        if not n_removed:
            fs.delete(os.path.join(root, gen))
            return None
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
    inherited because the new generation IS a fresh build). Readers of
    the old generation are undisturbed; the publish is one pointer
    rename."""
    fs = fsio.Fs(spark, root)
    lease = _index_write_lock(spark, root)
    try:
        cur = G.read_current(root, init_hint="build_ivfpq_versioned", fs=fs)
        cur_index = _gen_index(root, cur)
        pq_tbl = spark.read.parquet(cur_index + "_pq_codebook")
        n_sub = pq_tbl.agg(F.max("m")).head()[0] + 1
        sub_dim = len(pq_tbl.select("c_emb").head()["c_emb"])
        if k_pq is None:
            k_pq = pq_tbl.filter(F.col("m") == 0).count()
        if k_coarse is None:
            k_coarse = spark.read.parquet(cur_index + "_codebook").count()
        ids = spark.read.parquet(cur_index).select(F.col(id_col))
        vecs = source_vecs.select(F.col(id_col), "emb").join(
            ids, id_col, "left_semi"
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
