"""Materialized IVF index for ANN search (the at-scale shape).

The registry query ``q_ann_ivf_topk`` assigns cells inline — correct,
but at 100 TB the corpus-side assignment is the dominant linear cost
and must be paid ONCE, not per probe batch. The production pipeline:

    build_ivf_index(vecs, path)  →  assignments written PARTITIONED BY
                                     cell_id + codebook sidecar  (one
                                     broadcast-argmin pass, one write)
    search_ivf_index(probes)     →  rank probe cells against the tiny
                                     codebook, then read ONLY the
                                     nprobe partitions — the scan's
                                     partition filter prunes the other
                                     K-nprobe cells entirely

The probe-side cell list is collected to build the pruning predicate —
a deliberate, documented driver-side step at METADATA scale (nprobe ×
|probe batch| ints, like ``catalog.upstream_of``); the corpus is never
collected and never re-assigned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import fsio
from data_pipeline_with_big_data_stack_spark.operators.kmeans import _assign, _sqdist

# Single-writer guard for the mutating index operations (append /
# compact / expire): an append racing a compaction's read→swap window
# would have its new code files silently discarded with the backup dir
# (ADVICE r5). Same machinery as the rollup store's maintenance lock —
# pid@host payload, automatic stale-holder reclaim — under an
# index-specific sibling suffix.
_INDEX_LOCK_SUFFIX = ".__index_lock"


def _index_write_lock(spark: SparkSession, path: str):
    """Acquire the index's single-writer lock; returns a heartbeat
    lease — caller calls ``lease.release()`` in a finally."""
    from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
        _acquire_lock,
        break_stale_lock,
    )

    break_stale_lock(spark, path, suffix=_INDEX_LOCK_SUFFIX)
    return _acquire_lock(spark, path, suffix=_INDEX_LOCK_SUFFIX)


def _require_atomic_rename(fs: fsio.Fs, path: str, op: str) -> None:
    """The in-place maintenance swaps infer crash state from which
    directories exist — sound only where a rename cannot be
    half-applied. Object-store renames are copy+delete, so a crash
    mid-swap would leave a PARTIAL live tree that the recovery's
    "live exists ⇒ swap completed" inference would then treat as
    final, deleting the parked originals (the ADVICE r5 hazard the old
    local-only guard existed for, re-stated as the actual capability).
    The generation-versioned ops (`operators/ann_index_versioned`)
    are the object-store path: they swap nothing in place — writers
    materialize a new generation and flip the pointer object."""
    if not fs.rename_is_atomic:
        raise NotImplementedError(
            f"{op} swaps directories in place and requires an "
            f"atomic-rename filesystem; {path!r} ({fs.scheme}) renames "
            "by copy+delete. Use the generation-versioned index ops "
            "(operators/ann_index_versioned) on object stores"
        )


def _read_table(
    spark: SparkSession,
    path: str,
    fs: fsio.Fs | None = None,
    logicals: set[str] | None = None,
):
    """Manifest-aware read (`operators/segman`): a plain physical dir
    reads exactly as ``spark.read.parquet(path)``; a generation table
    whose manifest references segments in older generations reads the
    union. Every read-only consumer of an index component goes through
    here so the versioned stores can carry segments by reference.
    ``logicals`` (partition dir names, e.g. ``cell_id=5``) lets the
    cell-pruned search paths restrict MANIFEST resolution to the probed
    partitions — the metadata-side twin of the data-side partition
    pruning they already do; callers must still filter the frame."""
    from data_pipeline_with_big_data_stack_spark.operators import segman

    return segman.read_table(
        spark, fs or fsio.Fs(spark, path), path, logicals=logicals
    )


def _refuse_manifested(fs: fsio.Fs, path: str, op: str) -> None:
    """The in-place maintenance ops rewrite and swap PHYSICAL trees;
    on a manifest-reference generation table (`operators/segman`) they
    would read only the physically-present files — silently dropping
    every referenced segment — and their swap would strand the
    manifest. Those tables are maintained by the generation-versioned
    ops, which supersede a manifest with a new generation instead of
    editing one in place."""
    from data_pipeline_with_big_data_stack_spark.operators import segman

    p = path.rstrip("/")
    for comp in (p, p + "_codebook", p + "_pq_codebook"):
        if fs.exists(os.path.join(comp, segman.MANIFEST)):
            raise NotImplementedError(
                f"{op} rewrites directories in place, but {comp!r} is a "
                "manifest-reference generation table — use the "
                "generation-versioned ops (operators/ann_index_versioned), "
                "which publish a new generation instead"
            )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def build_ivf_index(
    vecs: DataFrame, path: str, codebook: DataFrame, id_col: str = "vec_id"
) -> None:
    """``vecs(id, emb, ...)`` + 1-row ``codebook(cb)`` → parquet at
    ``path`` partitioned by ``cluster_id`` (+ ``_codebook`` sidecar).
    One broadcast map-side argmin pass over the corpus, zero shuffle
    before the partitioned write."""
    assigned = _assign(vecs, codebook)
    (
        assigned.write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(path)
    )
    codebook.select(F.explode("cb").alias("c")).select(
        F.col("c.cell_id").alias("cell_id"), F.col("c.c_emb").alias("c_emb")
    ).write.mode("overwrite").parquet(path + "_codebook")


def _coded_projection(
    vecs: DataFrame,
    coarse_codebook: DataFrame,
    pq_codebooks: list[DataFrame],
    sub_dim: int,
    id_col: str,
) -> DataFrame:
    """One map-side projection per vector under broadcast codebooks:
    ``(id, cell_id, code_0..code_{M-1})`` — coarse argmin + M subspace
    argmins, the raw vector dropped. Shared by the initial build and
    the incremental append (same codebooks ⇒ bit-identical codes)."""
    coarse = coarse_codebook.select(
        F.col(coarse_codebook.columns[0]).alias("__cb")
    )
    coded = vecs.join(F.broadcast(coarse))
    ranked = F.array_sort(
        F.transform(
            F.col("__cb"),
            lambda c: F.struct(
                _sqdist(F.col("emb"), c["c_emb"]).alias("dist"),
                c["cell_id"].alias("cell_id"),
            ),
        )
    )

    # NB: helper factories, not `lambda c, sub=sub:` — PySpark reads a
    # two-parameter lambda as (element, index) and would bind the array
    # index where the captured column belongs
    def _best_code(cname: str, sub):
        def entry(c):
            return F.struct(
                _sqdist(sub, c["c_emb"]).alias("dist"),
                c["cell_id"].alias("cell_id"),
            )

        return F.element_at(F.array_sort(F.transform(F.col(cname), entry)), 1)[
            "cell_id"
        ]

    cols = [F.col(id_col), F.element_at(ranked, 1)["cell_id"].alias("cell_id")]
    for m, cbm in enumerate(pq_codebooks):
        cname = f"__pq{m}"
        coded = coded.join(
            F.broadcast(cbm.select(F.col(cbm.columns[0]).alias(cname)))
        )
        cols.append(
            _best_code(cname, F.slice("emb", m * sub_dim + 1, sub_dim)).alias(
                f"code_{m}"
            )
        )
    return coded.select(*cols)


def build_ivfpq_index(
    vecs: DataFrame,
    path: str,
    coarse_codebook: DataFrame,
    pq_codebooks: list[DataFrame],
    sub_dim: int,
    id_col: str = "vec_id",
) -> None:
    """IVF-PQ index build — the train-once/serve-many half of
    ``queries/vector.q_ann_ivfpq_topk`` (which retrains its codebooks
    inline on every run so its DuckDB oracle can replay the trajectory;
    at scale you pay PQ training once and serve from this index).

    ``vecs(id, emb)`` + 1-row ``coarse_codebook(cb)`` + per-subspace
    1-row ``pq_codebooks`` (``operators/kmeans.lloyd_kmeans`` output,
    any column name) → parquet at ``path`` partitioned by ``cell_id``
    holding CODES ONLY (``id, code_0..code_{M-1}``) — the raw vector is
    dropped at build time and never read again — plus two sidecars:
    ``path + "_codebook"`` (coarse cells) and ``path + "_pq_codebook"``
    (``m, code, c_emb`` — K_PQ × M rows). The build is ONE map-side
    projection per vector under broadcast codebooks: coarse argmin +
    M subspace argmins, zero shuffle before the partitioned write."""
    # the build joins the locked lifecycle writers (ADVICE r7): the
    # residue purge below deletes retrain staging/park state, and doing
    # that against a LIVE locked retrain on the same path would destroy
    # its swap mid-protocol — so the whole build runs under the same
    # single-writer lock as append/compact/expire/retrain
    lease = _index_write_lock(vecs.sparkSession, path)
    try:
        # a fresh build supersedes ALL retrain state: discard any staged
        # or parked retrain residue first, or the next writer's
        # roll-forward recovery would publish a stale staged retrain
        # OVER this rebuild (retrain is re-runnable, so dropping a
        # crashed retrain's staging loses nothing)
        fs = fsio.Fs(vecs.sparkSession, path)
        fs.delete(path.rstrip("/") + "__retraining")
        fs.delete(path.rstrip("/") + "__preretrain")
        coded = _coded_projection(
            vecs, coarse_codebook, pq_codebooks, sub_dim, id_col
        )
        coarse = coarse_codebook.select(
            F.col(coarse_codebook.columns[0]).alias("__cb")
        )
        coarse_rows = coarse.select(F.explode("__cb").alias("c")).select(
            F.col("c.cell_id").alias("cell_id"), F.col("c.c_emb").alias("c_emb")
        )
        pq_rows = None
        for m, cbm in enumerate(pq_codebooks):
            rows = (
                cbm.select(F.explode(F.col(cbm.columns[0])).alias("c"))
                .select(
                    F.lit(m).alias("m"),
                    F.col("c.cell_id").alias("code"),
                    F.col("c.c_emb").alias("c_emb"),
                )
            )
            pq_rows = rows if pq_rows is None else pq_rows.unionByName(rows)
        # the three component writes are independent (codes + two tiny
        # sidecars): overlap them on a driver thread pool (guide §2.6,
        # r15) — the sidecar jobs back-fill the codes write's tail. A
        # crash mid-build leaves the same partial-component state as the
        # sequential writes did; build is re-runnable either way.
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            lambda: coded.write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(path),
            lambda: coarse_rows.write.mode("overwrite").parquet(
                path + "_codebook"
            ),
            lambda: pq_rows.write.mode("overwrite").parquet(
                path + "_pq_codebook"
            ),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(lambda w: w(), writes))
    finally:
        lease.release()


def _seed_codebook(vecs: DataFrame, k: int, id_col: str = "vec_id") -> DataFrame:
    """Deterministic k-seed codebook for retraining: the k vectors whose
    md5(id) sorts lowest, numbered 0..k-1 in that order. Hash-ranked
    (not first-k-by-id) so seeds spread over the corpus even when ids
    are clustered by ingest order; a distributed sort-limit picks them —
    no global window, no driver collect. Replayable in an oracle as
    ``row_number() OVER (ORDER BY md5(id::VARCHAR)) - 1`` over the same
    ``LIMIT k``."""
    seeds = (
        vecs.select(
            F.md5(F.col(id_col).cast("string")).alias("__h"), F.col("emb")
        )
        .orderBy("__h")
        .limit(k)
    )
    return seeds.agg(
        F.array_sort(F.collect_list(F.struct("__h", "emb"))).alias("s")
    ).select(
        F.transform(
            F.col("s"),
            lambda x, i: F.struct(
                i.cast("long").alias("cell_id"), x["emb"].alias("c_emb")
            ),
        ).alias("cb")
    )


def train_ivfpq_codebooks(
    vecs: DataFrame,
    k_coarse: int,
    k_pq: int,
    sub_dim: int,
    n_sub: int,
    iters: int = 2,
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[DataFrame]]:
    """Train a coarse codebook + ``n_sub`` per-subspace PQ codebooks over
    ``vecs(id, emb)`` — the general-corpus trainer behind
    :func:`retrain_ivfpq_index` (the inline registry queries keep their
    own ``_km_demo_init`` trainer so their DuckDB oracles replay an
    unchanged trajectory). Deterministic end to end: md5-ranked seed
    init (:func:`_seed_codebook`) + ``operators/kmeans.lloyd_kmeans``
    (decimal-mean updates, id tie-breaks). Scale shape per codebook: the
    lloyd loop shuffles only K×dim partial-aggregate rows per round; the
    corpus is only map-scanned."""
    from data_pipeline_with_big_data_stack_spark.operators.kmeans import (
        lloyd_kmeans_multi,
    )
    from data_pipeline_with_big_data_stack_spark.session import materialize

    # FUSED since r15 (guide §1.2/§2.4): the 1 + n_sub trainings share
    # one md5 seed ranking (the per-codebook hash order is identical —
    # md5 over the same ids, so each codebook's seed set is a prefix of
    # one sorted sample) and train in one lloyd_kmeans_multi chain —
    # each round is a single corpus scan + a single partial-agg shuffle
    # for every codebook, materialized with ONE checkpoint action (the
    # r15 first pass overlapped 1 + n_sub separate chains on a thread
    # pool; fusing removes the extra chains and seed jobs outright).
    # Values are bit-identical per codebook to the separate
    # _seed_codebook + lloyd_kmeans chains (tests/test_kmeans_fused.py),
    # so every oracle replay is unchanged — with ONE documented edge
    # (ADVICE r15): the shared ranking tie-breaks equal md5 hashes on
    # the FULL emb (array_sort of struct(__h, emb), then per-codebook
    # slicing), where the old per-slice seeding tie-broke on the sliced
    # emb. Equal hashes require duplicate vec_ids, which the trainer
    # input contract forbids (ids are unique index/corpus keys
    # everywhere this is called); under that contract the trajectories
    # are identical.
    v = vecs.select(F.col(id_col).alias("vec_id"), "emb")
    slices = [(None, None)] + [
        (m * sub_dim + 1, sub_dim) for m in range(n_sub)
    ]
    ks = [k_coarse] + [k_pq] * n_sub
    seeds = (
        v.select(
            F.md5(F.col("vec_id").cast("string")).alias("__h"), F.col("emb")
        )
        .orderBy("__h")
        .limit(max(ks))
    )
    seeded = seeds.agg(
        F.array_sort(F.collect_list(F.struct("__h", "emb"))).alias("s")
    )

    def _seed_cb(k: int, off, ln):
        def entry(x, i):
            sub = x["emb"] if off is None else F.slice(x["emb"], off, ln)
            return F.struct(
                i.cast("long").alias("cell_id"), sub.alias("c_emb")
            )

        return F.transform(F.slice(F.col("s"), 1, k), entry)

    init = seeded.select(
        *[
            _seed_cb(ks[i], off, ln).alias(f"cb_{i}")
            for i, (off, ln) in enumerate(slices)
        ]
    )
    combined = materialize(lloyd_kmeans_multi(v, init, slices, iters=iters))
    coarse = combined.select(F.col("cb_0").alias("cb"))
    pq = [
        combined.select(F.col(f"cb_{m + 1}").alias(f"cb{m}"))
        for m in range(n_sub)
    ]
    return coarse, pq


def _retrain_components(path: str) -> list[tuple[str, str]]:
    """(live_path, staged/parked name) for the three dirs a retrain
    swaps as one unit: the codes and both codebook sidecars."""
    p = path.rstrip("/")
    return [
        (p, "index"),
        (p + "_codebook", "index_codebook"),
        (p + "_pq_codebook", "index_pq_codebook"),
    ]


def _recover_retrain(path: str, fs: fsio.Fs) -> bool:
    """Heal a crashed :func:`retrain_ivfpq_index` so the index is always
    fully-old or fully-new, never mixed codes-vs-codebooks. Protocol
    invariants this decodes: the ``_ALL_STAGED`` marker is written only
    after all three staged dirs are complete, and the ``__preretrain``
    park dir is created only after the marker — so park-exists ⇒ the
    staged set is publishable and we roll FORWARD; staging without park
    ⇒ the commit never started and we roll BACK (drop staging). Within a
    forward roll each component's state is unambiguous from the swap
    order (park live, then publish staged): live+staged ⇒ live is the
    not-yet-parked original; live only ⇒ already published; staged only
    ⇒ parked but unpublished. Returns True if anything changed."""
    staging = path.rstrip("/") + "__retraining"
    park = path.rstrip("/") + "__preretrain"
    marker = os.path.join(staging, "_ALL_STAGED")
    changed = False
    if fs.exists(park):
        if fs.exists(marker):
            for live, name in _retrain_components(path):
                staged = os.path.join(staging, name)
                parked = os.path.join(park, name)
                if not fs.exists(live):
                    if fs.exists(staged):
                        fs.rename(staged, live)
                    elif fs.exists(parked):
                        # staged dir gone despite the _ALL_STAGED
                        # invariant (external cleanup/tampering): fall
                        # back to the parked pre-retrain copy so the
                        # index stays serveable instead of failing
                        # every writer entry with a bare rename error
                        fs.rename(parked, live)
                    else:
                        raise RuntimeError(
                            "retrain recovery: index component "
                            f"{live!r} is missing and neither its "
                            f"staged copy ({staged!r}) nor its parked "
                            f"pre-retrain copy ({parked!r}) exists — "
                            "the protocol dirs were externally "
                            "modified; rebuild the index with "
                            "build_ivfpq_index"
                        )
                    changed = True
                elif fs.exists(staged):
                    fs.rename(live, os.path.join(park, name))
                    fs.rename(staged, live)
                    changed = True
        else:  # defensive: commit dir without a complete stage — roll back
            for live, name in _retrain_components(path):
                parked = os.path.join(park, name)
                if fs.exists(parked) and not fs.exists(live):
                    fs.rename(parked, live)
                    changed = True
        fs.delete(park)
    fs.delete(staging)
    return changed


def retrain_ivfpq_index(
    spark: SparkSession,
    path: str,
    source_vecs: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    k_coarse: int | None = None,
    k_pq: int | None = None,
) -> None:
    """Refresh a materialized IVF-PQ index's codebooks over the CURRENT
    corpus — the reindex half of the lifecycle (VERDICT r6 #2).
    :func:`append_to_ivfpq_index` codes new vectors with codebooks
    frozen at build time, so after heavy appends of a shifted
    distribution the coarse cells and PQ sub-codebooks mis-model the
    corpus and recall decays with no signal (pinned in
    tests/test_ann_index.py::test_retrain_restores_recall_after_shifted_appends).
    This is the Druid-reindex analog of the rollup store's compaction:
    same single-writer lock, same staged-write → atomic-swap contract.

    ``source_vecs(id, emb)`` is the raw-vector source of truth (the
    index stores codes only); it is semi-joined to the index's current
    ids so vectors expired via :func:`expire_vectors` can never
    re-enter, and extra source rows are ignored. New codebooks come from
    :func:`train_ivfpq_codebooks` (md5-seeded, deterministic); geometry
    (n_sub, sub_dim) and — unless overridden — K sizes are read from the
    existing sidecars. The rebuilt codes + both sidecars are staged
    under ``path__retraining`` and swapped as ONE unit (an index with
    new codes under old codebooks, or vice versa, returns garbage);
    :func:`_recover_retrain` makes a crash anywhere in the swap heal to
    fully-old or fully-new on the next writer entry. The result is
    bit-identical to a fresh :func:`build_ivfpq_index` over the same
    corpus with the same trainer (pinned in tests/test_ann_index.py).

    O(corpus) by design — retraining re-reads every source vector; run
    it at reindex cadence (recall-floor alerts, distribution-shift
    monitors), not per append. Readers must pause during the swap, same
    contract as compact/expire; on object stores use
    ``retrain_ivfpq_versioned`` (a fresh build + pointer flip — no
    in-place swap at all)."""
    fs = fsio.Fs(spark, path)
    _require_atomic_rename(fs, path, "retrain_ivfpq_index")
    _refuse_manifested(fs, path, "retrain_ivfpq_index")
    lease = _index_write_lock(spark, path)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.layout import (
            recover_compaction,
        )

        recover_compaction(path, fs=fs)
        _recover_expire(path, fs)
        _recover_retrain(path, fs)
        # ONE bounded 1-row collect for all geometry/K stats (the
        # sidecars are metadata-scale): a single aggregate covers
        # n_sub/sub_dim/k_pq, and the coarse K rides along via a 1-row
        # cross join instead of a second count job (r15)
        geo = spark.read.parquet(path + "_pq_codebook").agg(
            F.max("m").alias("mm"),
            F.max(F.size("c_emb")).alias("sd"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("k0"),
        )
        if k_coarse is None:
            geo = geo.crossJoin(
                spark.read.parquet(path + "_codebook").agg(
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
        ids = spark.read.parquet(path).select(F.col(id_col))
        # materialize the semi-joined training corpus ONCE: the passes
        # below (3 seed rankings, 3 lloyd chains, the coded-projection
        # build) otherwise each re-run the corpus scan + ids semi-join —
        # ~10 full source passes per retrain at any scale (guide §1.2)
        from data_pipeline_with_big_data_stack_spark.session import materialize

        vecs = materialize(
            source_vecs.select(F.col(id_col), "emb").join(ids, id_col, "left_semi")
        )
        coarse_cb, pq_cbs = train_ivfpq_codebooks(
            vecs, k_coarse, k_pq, sub_dim, n_sub, iters=iters, id_col=id_col
        )
        staging = path.rstrip("/") + "__retraining"
        fs.delete(staging)
        fs.mkdirs(staging)
        build_ivfpq_index(
            vecs,
            os.path.join(staging, "index"),
            coarse_cb,
            pq_cbs,
            sub_dim=sub_dim,
            id_col=id_col,
        )
        fs.write_text_atomic(os.path.join(staging, "_ALL_STAGED"), "staged\n")
        park = path.rstrip("/") + "__preretrain"
        fs.mkdirs(park)
        comps = _retrain_components(path)
        for live, name in comps:
            fs.rename(live, os.path.join(park, name))
        for live, name in comps:
            fs.rename(os.path.join(staging, name), live)
        fs.delete(park)
        fs.delete(staging)
    finally:
        lease.release()


def _sidecar_codebooks(
    spark: SparkSession, path: str, fs: fsio.Fs | None = None
) -> tuple[DataFrame, list[DataFrame], int]:
    """Read the coarse + PQ codebooks back from an index's sidecars in
    the 1-row array-of-struct shape ``_coded_projection`` expects.
    Returns (coarse, [pq_m...], sub_dim). Manifest-aware: a versioned
    generation's sidecars may be segment references. (r15 note: an
    eager collected-rows variant of this helper was tried and REVERTED —
    the extra driver actions cost more wall time than the lazy
    aggregates' nested broadcast-subtree re-execution on a fast host.)"""
    coarse = (
        _read_table(spark, path + "_codebook", fs=fs)
        .agg(F.collect_list(F.struct("cell_id", "c_emb")).alias("cb"))
    )
    pq_tbl = _read_table(spark, path + "_pq_codebook", fs=fs)
    # ONE geometry job instead of two (r15): max(m) and the (uniform)
    # sub-vector length come from a single aggregate over the
    # metadata-scale sidecar
    geo = pq_tbl.agg(
        F.max("m").alias("mm"), F.max(F.size("c_emb")).alias("sd")
    ).head()
    n_sub = int(geo["mm"]) + 1
    sub_dim = int(geo["sd"])
    pq_codebooks = [
        pq_tbl.filter(F.col("m") == m).agg(
            F.collect_list(
                F.struct(F.col("code").alias("cell_id"), F.col("c_emb"))
            ).alias(f"cb{m}")
        )
        for m in range(n_sub)
    ]
    return coarse, pq_codebooks, sub_dim


def append_to_ivfpq_index(
    spark: SparkSession, path: str, vecs: DataFrame, id_col: str = "vec_id"
) -> None:
    """Grow the indexed corpus WITHOUT retraining — the streaming-ingest
    half of the IVF-PQ lifecycle (a training corpus that gains documents
    daily re-codes only the new vectors). Reads the codebook sidecars
    back, codes the new vectors with the SAME codebooks (so the result
    is bit-identical to having built the index over the union — pinned
    in tests/test_ann_index.py), and appends codes-only files into the
    cell partitions: O(new vectors) map-side work, existing partition
    files untouched. Callers own id uniqueness across appends, same as
    any append-mode sink. Holds the index's single-writer lock so an
    append can never race a compaction/expire swap (whose backup-dir
    teardown would silently discard the freshly appended files). Appends
    also heal crashed swap states BEFORE writing: recreating a live cell
    dir on top of a crashed expire/compaction swap would poison the
    "live exists ⇒ swap completed" inference those recoveries rely on,
    and the next maintenance entry would discard the parked originals."""
    fs = fsio.Fs(spark, path)
    lease = _index_write_lock(spark, path)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.layout import (
            recover_compaction,
        )

        recover_compaction(path, fs=fs)
        _recover_expire(path, fs)
        _recover_retrain(path, fs)
        # sidecars are read AFTER the lock + recovery: retrain rewrites
        # them, so a pre-lock read could code this batch against stale
        # (or crash-mixed) codebooks and poison the index silently
        coarse, pq_codebooks, sub_dim = _sidecar_codebooks(spark, path, fs=fs)
        coded = _coded_projection(vecs, coarse, pq_codebooks, sub_dim, id_col)
        coded.write.mode("append").partitionBy("cell_id").parquet(path)
    finally:
        lease.release()


def compact_ivfpq_index(
    spark: SparkSession,
    path: str,
    max_files_per_cell: int = 4,
) -> int:
    """Druid-style auto-compaction for the append path: every
    ``append_to_ivfpq_index`` leaves ≥1 new file per touched cell, and
    scan cost eventually drowns in per-file overhead. When any cell
    exceeds ``max_files_per_cell``, rewrite the codes hash-partitioned
    BY cell (each cell lands in exactly one task → one file per cell —
    a plain repartition(n) would spray every task across every cell
    dir) and swap directories; the codebook sidecars are untouched and
    search results are byte-identical. Returns the new file count, or
    0 if no cell was over threshold (no-op). Same rename-swap contract
    as ``operators/layout.compact_table``, including crash recovery on
    entry (``layout.recover_compaction``); holds the index's
    single-writer lock for the whole read→rewrite→swap cycle so
    concurrent appends can't be lost.

    Reader contract: the lock serializes WRITERS only. A concurrent
    ``search_ivfpq_index`` that lists the directory inside the
    live→``__precompact``→live rename window can hit FileNotFound —
    serving must pause (or search a snapshot copy) while a compaction
    runs on a shared index (ADVICE r6)."""
    from collections import Counter

    from data_pipeline_with_big_data_stack_spark.operators.layout import (
        recover_compaction,
        table_files,
    )

    fs = fsio.Fs(spark, path)
    _require_atomic_rename(fs, path, "compact_ivfpq_index")
    _refuse_manifested(fs, path, "compact_ivfpq_index")
    lease = _index_write_lock(spark, path)
    try:
        # heal ALL writers' crash states before reading: a compaction
        # over an index with a cell still parked in __preexpire would
        # rewrite without it and the swap would orphan the parked copy
        recover_compaction(path, fs=fs)
        _recover_expire(path, fs)
        _recover_retrain(path, fs)
        per_cell = Counter(os.path.dirname(f) for f in table_files(spark, path))
        if not per_cell or max(per_cell.values()) <= max_files_per_cell:
            return 0
        df = spark.read.parquet(path)
        staging = path.rstrip("/") + "__compacting"
        (
            df.repartition(len(per_cell), F.col("cell_id"))
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(staging)
        )
        backup = path.rstrip("/") + "__precompact"
        fs.rename(path, backup)
        fs.rename(staging, path)
        fs.delete(backup)
        return len(table_files(spark, path))
    finally:
        lease.release()


def _recover_expire(path: str, fs: fsio.Fs) -> bool:
    """Heal a crashed :func:`expire_vectors` swap. For every cell dir
    parked in ``__preexpire``: if the live cell is MISSING the crash hit
    between the two renames — restore the original (a retry of the
    expire re-filters it; expiry is idempotent, unlike rollup merges);
    if the live cell exists the swap completed — the parked copy is the
    superseded original, drop it. Stale staging is removed either way.
    Returns True if anything was restored."""
    trash = path.rstrip("/") + "__preexpire"
    staging = path.rstrip("/") + "__expiring"
    restored = False
    if fs.exists(trash):
        for name in fs.list_names(trash):
            if not name.startswith("cell_id="):
                continue
            live = os.path.join(path, name)
            parked = os.path.join(trash, name)
            if fs.exists(live):
                fs.delete(parked)
            else:
                fs.rename(parked, live)
                restored = True
        fs.delete(trash)
    fs.delete(staging)
    return restored


def expire_vectors(
    spark: SparkSession,
    path: str,
    ids=None,
    predicate=None,
    id_col: str = "vec_id",
) -> int:
    """Remove vectors from a materialized IVF-PQ index — the retention/
    delete half of the lifecycle (a training corpus also LOSES documents:
    opt-outs, takedowns, retention windows), mirroring the rollup
    store's ``expire_partitions``. ``ids`` is an iterable of vector ids
    or a 1-column DataFrame of them (the opt-out list shape); or pass
    ``predicate`` (a boolean Column over the codes schema). Returns the
    number of vectors removed.

    Scale shape: the tombstone scan finds the affected CELLS (metadata-
    scale collect, like the nprobe pruning), survivors of only those
    cells are rewritten hash-partitioned by cell, and each affected cell
    directory is swapped by rename (live → ``__preexpire``,
    staged → live). Untouched cells are never read or rewritten —
    O(affected cells), not O(index). Crash-safe: :func:`_recover_expire`
    runs on entry, restoring any half-swapped cell before the retry
    re-filters it. Holds the index's single-writer lock; codebook
    sidecars are untouched, so search-after-expire is byte-identical to
    a rebuild over the survivors (pinned in tests/test_ann_index.py).

    Reader contract: the lock serializes WRITERS only. A concurrent
    ``search_ivfpq_index`` listing the index between an affected cell's
    live→``__preexpire`` and staged→live renames can hit FileNotFound
    or silently miss that cell's candidates — serving must pause (or
    search a snapshot copy) while an expiry runs on a shared index;
    unaffected cells are never disturbed (ADVICE r6)."""
    if (ids is None) == (predicate is None):
        raise ValueError("pass exactly one of ids / predicate")
    fs = fsio.Fs(spark, path)
    _require_atomic_rename(fs, path, "expire_vectors")
    _refuse_manifested(fs, path, "expire_vectors")
    lease = _index_write_lock(spark, path)
    try:
        from data_pipeline_with_big_data_stack_spark.operators.layout import recover_compaction

        # compaction recovery FIRST: a crashed compaction swap leaves
        # the index dir itself missing, and restoring parked expire
        # cells needs the dir back in place
        recover_compaction(path, fs=fs)
        _recover_expire(path, fs)
        _recover_retrain(path, fs)
        index = spark.read.parquet(path)
        if predicate is not None:
            # three-valued logic guard: a predicate that evaluates NULL
            # must mean KEEP — without the coalesce, such a row is
            # excluded from doomed (filter drops null) AND from
            # survivors (~null is null) and silently vanishes uncounted
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
        # one aggregation produces both the affected-cell list
        # (metadata-scale) and the removal count — a separate .count()
        # would pay a second full traversal of the tombstone scan
        tomb_agg = doomed.agg(
            F.collect_set("cell_id").alias("cells"),
            F.count(F.lit(1)).alias("n"),
        ).head()
        cells = sorted(tomb_agg["cells"])
        if not cells:
            return 0
        n_removed = tomb_agg["n"]
        affected = index.filter(F.col("cell_id").isin(cells))
        if predicate is not None:  # null-coalesced above: ~pred is total
            survivors = affected.filter(~predicate)
        else:  # DataFrame ids: anti-join is the exact complement
            survivors = affected.join(tomb, id_col, "left_anti")
        staging = path.rstrip("/") + "__expiring"
        trash = path.rstrip("/") + "__preexpire"
        (
            survivors.repartition(len(cells), F.col("cell_id"))
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(staging)
        )
        # retire each affected live cell (parked in __preexpire — crash
        # recovery rolls it back), then publish its staged replacement
        fs.mkdirs(trash)
        for c in cells:
            part = f"cell_id={c}"
            live = os.path.join(path, part)
            fs.rename(live, os.path.join(trash, part))
            staged = os.path.join(staging, part)
            if fs.exists(staged):  # absent ⇒ the cell expired empty
                fs.rename(staged, live)
        if not any(
            n.startswith("cell_id=") for n in fs.list_names(path)
        ):
            # an expiry that emptied EVERY cell (full purge / total
            # opt-out) must not leave a directory Spark can't infer a
            # schema from: park a 0-row sentinel partition. Cell ids
            # are codebook row numbers (always >= 0), so -1 never
            # collides and is never probed by a search.
            (
                survivors.limit(0)
                .drop("cell_id")
                .write.mode("overwrite")
                .parquet(os.path.join(path, "cell_id=-1"))
            )
        fs.delete(trash)
        fs.delete(staging)
        return n_removed
    finally:
        lease.release()


# --------------------------------------------------------------------------
# Serve-path sidecar cache (r16, VERDICT r15 #2). A steady-state search
# re-reads two METADATA-scale sidecar tables (coarse cells; K_PQ × M PQ
# rows) from parquet at several broadcast sites of every probe batch's
# plan — pure driver/plan-build latency re-paid per search, the dominant
# serve component in the r15 bench breakdown (plan_build 0.58 s of a
# ~0.9 s serve). The r15 sidecar-collect rewrite fixed this per-search
# and REGRESSED (extra collect actions + createDataFrame conversions per
# search cost more than the nested broadcast re-executions they
# replaced); the r16 shape amortizes instead:
#   - a cache MISS keeps the exact lazy plan shape, but the search's one
#     existing driver action additionally HARVESTS both sidecars' rows
#     (they ride the same collect as broadcast 1-row aggregates — zero
#     extra actions, a few KB wider result row);
#   - a cache HIT serves both sidecars as immutable LocalRelation
#     DataFrames — no sidecar parquet scans in either the plan-build
#     collect or the final execution, and the createDataFrame conversion
#     is paid once per index VERSION, not per search.
# Staleness is checked per search against a file-listing token of both
# sidecar dirs ((path, size) sets — every sidecar rewrite produces fresh
# part-file names): an in-place retrain's tri-dir swap, a versioned
# store's new generation (a different path entirely), or any external
# rewrite misses the cache and re-harvests. Values are bit-identical by
# construction (the harvested rows ARE the sidecar rows, doubles
# round-tripping exactly through the driver), so warm and cold searches
# return identical frames — pinned in tests/test_ann_index.py.
# NOT cross-run caching: the cache is in-process state keyed by the live
# session's applicationId; every bench/oracle invocation starts empty.
# --------------------------------------------------------------------------
_SERVE_CACHE: dict = {}
_SERVE_CACHE_MAX = 8


def _sidecar_token(fs: fsio.Fs, path: str):
    """(path, size) listing of both sidecar dirs — the cache staleness
    token. Two driver-side recursive listings of few-file metadata-scale
    dirs (no Spark job)."""
    p = path.rstrip("/")
    return (
        tuple(sorted(fs.file_sizes_recursive(p + "_codebook"))),
        tuple(sorted(fs.file_sizes_recursive(p + "_pq_codebook"))),
    )


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """``probes(q_id, q_emb)`` → top-``k`` by asymmetric-distance
    (ADC) per probe, from the materialized IVF-PQ index: rank probe
    cells against the tiny coarse sidecar, read ONLY the ``nprobe``
    index partitions (codes, no vectors — the scan's ReadSchema carries
    id + codes only, plan-pinned), and rank candidates by summing
    per-subspace squared distances between the probe's sub-vectors and
    the K_PQ-row PQ codebook centroids their codes point at. Identical
    top-k to the inline ``q_ann_ivfpq_topk`` given the same codebooks
    (equality-pinned in tests/test_ann_index.py). Repeat searches of an
    unchanged index version serve the sidecars from the process-local
    cache above — same values, no sidecar scans."""
    fs = fsio.Fs(spark, path)  # ONE handle for all three component reads
    token = _sidecar_token(fs, path)
    key = (spark.sparkContext.applicationId, path.rstrip("/"))
    hit = _SERVE_CACHE.get(key)
    if hit is not None and hit["token"] != token:
        hit = None
    if hit is not None:
        if hit["cb_df"] is None:
            # first hit: build the session-local frames once per index
            # version. localCheckpoint (eager) matters: a bare
            # createDataFrame(list) is an RDD of PYTHON rows, so every
            # broadcast build would re-run a Python-worker conversion
            # stage per action (measured SLOWER than re-scanning the
            # parquet sidecars); checkpointing converts once and every
            # later scan reads JVM-local blocks
            hit["cb_df"] = spark.createDataFrame(
                hit["cb_rows"], hit["cb_schema"]
            ).localCheckpoint(eager=True)
            hit["pq_df"] = spark.createDataFrame(
                hit["pq_rows"], hit["pq_schema"]
            ).localCheckpoint(eager=True)
        cb_tbl, pq_tbl = hit["cb_df"], hit["pq_df"]
    else:
        cb_tbl = _read_table(spark, path + "_codebook", fs=fs)
        pq_tbl = _read_table(spark, path + "_pq_codebook", fs=fs)
    cb = cb_tbl.agg(F.collect_list(F.struct("cell_id", "c_emb")).alias("cb"))
    ranked = F.array_sort(
        F.transform(
            F.col("cb"),
            lambda c: F.struct(
                _sqdist(F.col("q_emb"), c["c_emb"]).alias("dist"),
                c["cell_id"].alias("cell_id"),
            ),
        )
    )
    probe_cells = (
        probes.join(F.broadcast(cb))
        .select(
            "q_id",
            "q_emb",
            F.explode(F.slice(ranked, 1, nprobe)).alias("cell"),
        )
        .select("q_id", "q_emb", F.col("cell")["cell_id"].alias("cell_id"))
    )
    # metadata-scale collect: nprobe cells per probe → partition-pruning
    # predicate for the codes scan, map-side-deduped via collect_set
    # (r16; the r15 shape shuffled a distinct). On a cache miss the SAME
    # driver action harvests the sidecar rows + PQ sub_dim as broadcast
    # 1-row cross joins — on the serve path driver action COUNT is the
    # scarce resource (r15 measured the per-search collect rewrite
    # regressing for exactly this reason), so everything rides one job
    cells_agg = probe_cells.agg(F.collect_set("cell_id").alias("__cells"))
    if hit is None:
        meta = (
            cells_agg.crossJoin(
                F.broadcast(
                    pq_tbl.agg(
                        F.collect_list(
                            F.struct(*pq_tbl.columns)
                        ).alias("__pq"),
                        F.max(F.size("c_emb")).alias("__sd"),
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    cb_tbl.agg(
                        F.collect_list(
                            F.struct(*cb_tbl.columns)
                        ).alias("__cb")
                    )
                )
            )
            .head()
        )
        sub_dim = int(meta["__sd"])
        _SERVE_CACHE[key] = {
            "token": token,
            "sub_dim": sub_dim,
            "cb_rows": list(meta["__cb"]),
            "pq_rows": list(meta["__pq"]),
            "cb_schema": cb_tbl.schema,
            "pq_schema": pq_tbl.schema,
            "cb_df": None,
            "pq_df": None,
        }
        while len(_SERVE_CACHE) > _SERVE_CACHE_MAX:
            _SERVE_CACHE.pop(next(iter(_SERVE_CACHE)))
    else:
        meta = cells_agg.head()
        sub_dim = hit["sub_dim"]
    cells = sorted(meta["__cells"])
    index = _read_table(
        spark, path, fs=fs, logicals={f"cell_id={c}" for c in cells}
    ).filter(F.col("cell_id").isin(cells))
    n_sub = len([c for c in index.columns if c.startswith("code_")])
    cand = index.join(F.broadcast(probe_cells), "cell_id").filter(
        F.col(id_col) != F.col("q_id")
    )
    def _centroid(cname: str, code_col: str):
        def match(c):
            return c["code"] == F.col(code_col)

        return F.element_at(F.filter(F.col(cname), match), 1)["c_emb"]

    adc = F.lit(0.0)
    for m in range(n_sub):
        cname = f"__pqcb{m}"
        cbm = pq_tbl.filter(F.col("m") == m).agg(
            F.collect_list(F.struct("code", "c_emb")).alias(cname)
        )
        cand = cand.join(F.broadcast(cbm))
        adc = adc + _sqdist(
            F.slice("q_emb", m * sub_dim + 1, sub_dim),
            _centroid(cname, f"code_{m}"),
        )
    cand = cand.select(
        "q_id", id_col, "cell_id", F.round(adc, 4).alias("adc_dist")
    )
    w = W.partitionBy("q_id").orderBy("adc_dist", F.col(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def search_ivf_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """``probes(q_id, q_emb)`` → top-``k`` cosine matches per probe,
    reading only each probe's ``nprobe`` nearest index partitions."""
    fs = fsio.Fs(spark, path)
    cb_tbl = _read_table(spark, path + "_codebook", fs=fs)
    cb = cb_tbl.agg(
        F.collect_list(F.struct("cell_id", "c_emb")).alias("cb")
    )
    ranked = F.array_sort(
        F.transform(
            F.col("cb"),
            lambda c: F.struct(
                _sqdist(F.col("q_emb"), c["c_emb"]).alias("dist"),
                c["cell_id"].alias("cell_id"),
            ),
        )
    )
    probe_cells = (
        probes.join(F.broadcast(cb))
        .select(
            "q_id",
            "q_emb",
            F.explode(F.slice(ranked, 1, nprobe)).alias("cell"),
        )
        .select("q_id", "q_emb", F.col("cell")["cell_id"].alias("cluster_id"))
    )
    # metadata-scale collect: nprobe cells per probe → partition-pruning
    # predicate for the index scan
    cells = sorted(
        {r.cluster_id for r in probe_cells.select("cluster_id").distinct().collect()}
    )
    index = _read_table(
        spark, path, fs=fs, logicals={f"cluster_id={c}" for c in cells}
    ).filter(F.col("cluster_id").isin(cells))
    cand = (
        index.join(F.broadcast(probe_cells), "cluster_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            "cluster_id",
            F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def estimate_ivfpq_recall(
    spark: SparkSession,
    path: str,
    source_vecs: DataFrame,
    n_probes: int = 64,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> float:
    """Recall@k estimate for a materialized IVF-PQ index — the DRIFT
    SIGNAL that closes the retrain loop. Appends code new vectors with
    build-time codebooks, so recall decays silently as the ingested
    distribution shifts (VERDICT r6: "recall can drift silently");
    this monitor makes the decay observable, and its output falling
    below a floor is the trigger for :func:`retrain_ivfpq_index`.

    Method: a deterministic md5-ranked sample of ``n_probes`` indexed
    vectors becomes the probe set; exact L2 top-``k`` over the indexed
    subset of ``source_vecs`` (the same metric ADC approximates) is the
    ground truth; the index answers the same probes via
    :func:`search_ivfpq_index`; returns mean |intersection|/k.

    Cost/scale: the ground-truth pass is the registry's brute-force
    baseline shape — probes ride as ONE broadcast, distances are a
    map-side projection, and the top-k window shuffles n_probes ×
    |corpus| skinny (q_id, id, dist) rows. O(n_probes · corpus): an
    audit-cadence job, not a serving path — at very large scale pass a
    sampled ``source_vecs`` (the estimate degrades gracefully: ground
    truth is then top-k of the sample, which the index is still
    expected to retrieve). Monitoring contract pinned in
    tests/test_ann_index.py: fresh-index estimate high, shifted-append
    estimate drops, post-retrain estimate recovers."""
    from data_pipeline_with_big_data_stack_spark.session import materialize

    ids = _read_table(spark, path).select(F.col(id_col))
    # materialized ONCE each (r15): the corpus semi-join feeds both the
    # ground-truth scan and the probe ranking, and the probe sample is
    # re-evaluated by the ground-truth broadcast AND the index search —
    # without the cut, the scan + semi-join (and the md5 sort-limit)
    # re-run per consumer. The probe set is n_probes rows; vecs is the
    # indexed corpus — an audit-cadence job's working set by contract.
    vecs = materialize(
        source_vecs.select(F.col(id_col), "emb").join(ids, id_col, "left_semi")
    )
    probes = materialize(
        vecs.select(
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("q_id"),
            F.col("emb").alias("q_emb"),
        )
        .orderBy("__h")
        .limit(n_probes)
        .drop("__h")
    )
    cand = (
        vecs.join(F.broadcast(probes))
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", id_col, _sqdist(F.col("emb"), F.col("q_emb")).alias("d"))
    )
    w = W.partitionBy("q_id").orderBy("d", F.col(id_col))
    truth = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("q_id")
        .agg(F.collect_set(id_col).alias("true_ids"))
    )
    got = (
        search_ivfpq_index(spark, path, probes, nprobe=nprobe, k=k, id_col=id_col)
        .groupBy("q_id")
        .agg(F.collect_set(id_col).alias("got_ids"))
    )
    # denominator is k (matching the oracle and the standard recall@k
    # definition), not |true_ids| — on a corpus smaller than k+1 the
    # estimate tops out below 1.0 rather than inflating
    per_probe = truth.join(got, "q_id", "left").select(
        (
            F.size(F.array_intersect("true_ids", F.coalesce("got_ids", F.array())))
            / F.lit(float(k))
        ).alias("recall")
    )
    row = per_probe.agg(F.avg("recall")).head()
    return float(row[0]) if row and row[0] is not None else 0.0
