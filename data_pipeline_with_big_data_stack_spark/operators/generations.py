"""Generation-pointer machinery shared by the versioned stores.

The reference serves analytics from immutable Druid segment versions
swapped atomically under readers (`M/druid-goes-satellite-datasource.json`
— a new segment version becomes queryable only when fully published).
This module is that protocol reduced to its filesystem primitives, so
any materialized store in the engine can adopt it:

* writers materialize a whole new ``gen-NNNNNN/`` directory,
* publish it by atomically replacing a ``_CURRENT`` pointer file
  (write-temp + atomic rename) and stamping the generation with its
  publish time,
* GC every generation except the new one, its immediate predecessor —
  the predecessor is the READER GRACE generation: a reader that
  resolved the old pointer keeps a fully intact tree until two further
  publishes happen, so maintenance never pauses serving — and (when the
  store opts in) any generation published within the last
  ``grace_seconds``, so the serving contract is a wall-clock promise
  independent of how often the writer publishes,
* orphan generations (a writer crashed after materializing, before
  publishing) are never pointer-visible and vanish at the next GC.

Users: ``operators/ann_index_versioned`` (the IVF-PQ index root) and
``operators/dedup_ingest`` (the streaming-dedup store's compactor).

Every filesystem touch goes through ``operators/fsio`` — the JVM's
Hadoop ``FileSystem`` API resolved from the root's scheme — so the
protocol runs unchanged on ``file:``, ``hdfs:`` or object-store roots
(the clone primitive adapts: hardlinks locally, copy remotely; see
``fsio.Fs.clone_tree``). Call sites that hold a store handle pass its
cached ``fs``; the ``fs=None`` default resolves one from the live
SparkSession for the pre-port public signatures.
"""

from __future__ import annotations

import time

from data_pipeline_with_big_data_stack_spark.operators import fsio

POINTER = "_CURRENT"
GEN_PREFIX = "gen-"
# publish-time stamp inside each generation (dot-prefixed — invisible
# to Spark's file index, like the dedup store's fold marker)
PUBLISHED_AT = ".published_at"


def _join(*parts: str) -> str:
    return "/".join(p.rstrip("/") for p in parts)


def gen_name(n: int) -> str:
    return f"{GEN_PREFIX}{n:06d}"


def list_generations(root: str, fs: fsio.Fs | None = None) -> list[str]:
    fs = fs or fsio.default_fs(root)
    return sorted(
        d
        for d in fs.list_dir_names(root, missing_ok=True)
        if d.startswith(GEN_PREFIX)
    )


def read_current_or_none(root: str, fs: fsio.Fs | None = None) -> str | None:
    """Like :func:`read_current` but None when the pointer does not
    exist yet — for writers (initial build, re-init) that must pass the
    previously-published generation to :func:`gc_generations`."""
    fs = fs or fsio.default_fs(root)
    try:
        gen = fs.read_text(_join(root, POINTER)).strip()
    except FileNotFoundError:
        return None
    return gen if gen and fs.is_dir(_join(root, gen)) else None


def read_current(
    root: str,
    init_hint: str = "the store's init/build op",
    fs: fsio.Fs | None = None,
) -> str:
    """Resolve the live generation name. Readers call this ONCE per
    query and then touch only that generation's files."""
    fs = fs or fsio.default_fs(root)
    ptr = _join(root, POINTER)
    try:
        gen = fs.read_text(ptr).strip()
    except FileNotFoundError:
        raise FileNotFoundError(
            f"versioned store at {root!r} has no {POINTER} pointer — "
            f"not initialized ({init_hint}) or externally damaged"
        ) from None
    if not gen or not fs.is_dir(_join(root, gen)):
        raise RuntimeError(
            f"versioned store pointer {ptr!r} names {gen!r} which does "
            f"not exist — externally damaged; rebuild with {init_hint}"
        )
    return gen


def atomic_write(path: str, text: str, fs: fsio.Fs | None = None) -> None:
    """Durably replace a small metadata file — crash leaves either the
    old content or the new, never a torn file (``fsio.Fs.
    write_text_atomic``: locally rename + parent-directory fsync; on
    HDFS-likes Hadoop's atomic rename-overwrite; on object stores a
    single-object overwrite PUT)."""
    fs = fs or fsio.default_fs(path)
    fs.write_text_atomic(path, text)


def publish(root: str, gen: str, fs: fsio.Fs | None = None) -> None:
    """Atomically flip the pointer to ``gen``, then stamp the
    generation with its publish time (the age signal
    :func:`gc_generations`'s ``grace_seconds`` reads). Stamp AFTER the
    flip: an unpublished orphan must never carry a stamp — the age rule
    would otherwise keep a crashed writer's half-written tree for a
    full grace window. A crash between flip and stamp only costs that
    one generation its age protection (it still gets the one-
    predecessor grace), never keeps garbage."""
    fs = fs or fsio.default_fs(root)
    fs.write_text_atomic(_join(root, POINTER), gen + "\n")
    fs.write_text_atomic(_join(root, gen, PUBLISHED_AT), f"{time.time():.3f}\n")


def published_at(root: str, gen: str, fs: fsio.Fs | None = None) -> float | None:
    """Publish time of ``gen`` by the STORAGE system's clock — the
    stamp file's mtime, not its content: the GC's age comparison must
    use one clock for both sides, and two drivers' wall clocks can
    disagree by more than a grace window. The content carries the
    publisher's wall time for humans. None: never published (or
    stamped by a pre-port writer with no stamp at all)."""
    fs = fs or fsio.default_fs(root)
    return fs.mtime(_join(root, gen, PUBLISHED_AT))


def gc_generations(
    root: str,
    new: str,
    prev: str | None,
    grace_seconds: float = 0.0,
    fs: fsio.Fs | None = None,
) -> None:
    """Drop every generation except ``new``, ``prev`` — the generation
    that was PUBLISHED before this publish (the reader grace
    generation), passed explicitly by the writer that just resolved it
    — and, with ``grace_seconds`` > 0, any generation PUBLISHED within
    that window (so a slow reader's contract is wall-clock time, not
    "fewer than two publishes" — a self-maintaining drain can publish
    on every fold without shrinking the serving window). Inferring the
    grace generation from the directory listing is wrong: a crashed
    writer's unpublished orphan can sort between the real predecessor
    and ``new``, and a listing-based GC would then keep the
    half-written orphan while deleting the very tree an in-flight
    reader resolved. With ``prev`` explicit, orphans (never equal to
    either, and never carrying a publish stamp) always vanish here.

    Ages are measured entirely on the STORAGE system's clock: each
    stamp's mtime against the mtime of a probe file written now —
    never against this driver's ``time.time()``, which another
    publisher's clock may lead or trail by more than the whole
    window."""
    fs = fs or fsio.default_fs(root)
    keep = {new, prev} if prev else {new}
    now = None
    if grace_seconds > 0:
        probe = _join(root, ".gc_clock_probe")
        fs.write_text_atomic(probe, "storage-clock probe\n")
        now = fs.mtime(probe)
    for g in list_generations(root, fs):
        if g in keep:
            continue
        if grace_seconds > 0 and now is not None:
            ts = published_at(root, g, fs)
            if ts is not None and (now - ts) < grace_seconds:
                continue
        # best-effort: GC runs AFTER a successful publish, so a delete
        # blocked by e.g. a reader's open handle on an NFS mount — or a
        # remote store's throttling/permission error, which surfaces as
        # a raw JVM exception, not OSError — must not fail the writer
        # operation (or abort a whole drain) over an already-consistent
        # store; the next publish's GC retries
        try:
            fs.delete(_join(root, g))
        except Exception as exc:  # noqa: BLE001 - any delete failure is retryable
            # visible, non-fatal: a PERSISTENT failure (lost delete
            # permission, chronic throttling) would otherwise accrete
            # stale generations with no signal at all
            import warnings

            warnings.warn(
                f"generation GC could not delete {g!r} under {root!r} "
                f"({exc}); it will be retried at the next publish",
                RuntimeWarning,
                stacklevel=2,
            )


def next_gen(root: str, fs: fsio.Fs | None = None) -> str:
    """Numerically after every existing generation — NOT the
    lexicographically last one: at the 6-digit rollover
    'gen-1000000' sorts BEFORE 'gen-999999', and deriving from the
    sorted tail would hand a writer the name of the LIVE generation."""
    fs = fs or fsio.default_fs(root)
    gens = list_generations(root, fs)
    n = max((int(g[len(GEN_PREFIX):]) for g in gens), default=0) + 1
    return gen_name(n)


def clone_generation(src: str, dst: str, fs: fsio.Fs | None = None) -> None:
    """Clone a generation tree — hardlinks on a local filesystem
    (O(#files) metadata ops, zero bytes moved; EXDEV falls back to
    copy), a real copy on remote stores. Parquet files are immutable
    once written, so sharing them between generations is safe; deleting
    either generation only unlinks its names. The source's publish
    stamp is NOT carried: the clone is a new, unpublished tree, and a
    copied stamp would let a crashed writer's orphan masquerade as
    recently published to :func:`gc_generations`'s age rule."""
    fs = fs or fsio.default_fs(src)
    fs.clone_tree(src, dst)
    fs.delete(_join(dst, PUBLISHED_AT))
