"""Generation-pointer machinery shared by the versioned stores.

The reference serves analytics from immutable Druid segment versions
swapped atomically under readers (`M/druid-goes-satellite-datasource.json`
— a new segment version becomes queryable only when fully published).
This module is that protocol reduced to its filesystem primitives, so
any materialized store in the engine can adopt it:

* writers materialize a whole new ``gen-NNNNNN/`` directory,
* publish it by atomically replacing a ``_CURRENT`` pointer file
  (write-temp + ``os.replace``),
* GC every generation except the new one and its immediate predecessor
  — the predecessor is the READER GRACE generation: a reader that
  resolved the old pointer keeps a fully intact tree until two further
  publishes happen, so maintenance never pauses serving,
* orphan generations (a writer crashed after materializing, before
  publishing) are never pointer-visible and vanish at the next GC.

Users: ``operators/ann_index_versioned`` (the IVF-PQ index root) and
``operators/dedup_ingest`` (the streaming-dedup store's compactor).
Local filesystems only — an object store would implement ``publish``
as a manifest/pointer object and ``clone_generation`` as a manifest
copy; the protocol is unchanged.
"""

from __future__ import annotations

import os
import shutil

POINTER = "_CURRENT"
GEN_PREFIX = "gen-"


def gen_name(n: int) -> str:
    return f"{GEN_PREFIX}{n:06d}"


def list_generations(root: str) -> list[str]:
    return sorted(
        d
        for d in os.listdir(root)
        if d.startswith(GEN_PREFIX) and os.path.isdir(os.path.join(root, d))
    )


def read_current_or_none(root: str) -> str | None:
    """Like :func:`read_current` but None when the pointer does not
    exist yet — for writers (initial build, re-init) that must pass the
    previously-published generation to :func:`gc_generations`."""
    try:
        with open(os.path.join(root, POINTER)) as fh:
            gen = fh.read().strip()
    except FileNotFoundError:
        return None
    return gen if gen and os.path.isdir(os.path.join(root, gen)) else None


def read_current(root: str, init_hint: str = "the store's init/build op") -> str:
    """Resolve the live generation name. Readers call this ONCE per
    query and then touch only that generation's files."""
    ptr = os.path.join(root, POINTER)
    try:
        with open(ptr) as fh:
            gen = fh.read().strip()
    except FileNotFoundError:
        raise FileNotFoundError(
            f"versioned store at {root!r} has no {POINTER} pointer — "
            f"not initialized ({init_hint}) or externally damaged"
        ) from None
    if not gen or not os.path.isdir(os.path.join(root, gen)):
        raise RuntimeError(
            f"versioned store pointer {ptr!r} names {gen!r} which does "
            f"not exist — externally damaged; rebuild with {init_hint}"
        )
    return gen


def atomic_write(path: str, text: str) -> None:
    """Durably replace a small metadata file: write-temp + fsync +
    rename, so a crash leaves either the old content or the new —
    never a torn file."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(text)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def publish(root: str, gen: str) -> None:
    """Atomically flip the pointer to ``gen`` (write-temp + rename)."""
    atomic_write(os.path.join(root, POINTER), gen + "\n")


def gc_generations(root: str, new: str, prev: str | None) -> None:
    """Drop every generation except ``new`` and ``prev`` — the
    generation that was PUBLISHED before this publish (the reader grace
    generation), passed explicitly by the writer that just resolved it.
    Inferring the grace generation from the directory listing is wrong:
    a crashed writer's unpublished orphan can sort between the real
    predecessor and ``new``, and a listing-based GC would then keep the
    half-written orphan while deleting the very tree an in-flight
    reader resolved. With ``prev`` explicit, orphans (never equal to
    either) always vanish here."""
    keep = {new, prev} if prev else {new}
    for g in list_generations(root):
        if g not in keep:
            shutil.rmtree(os.path.join(root, g), ignore_errors=True)


def next_gen(root: str) -> str:
    """Numerically after every existing generation — NOT the
    lexicographically last one: at the 6-digit rollover
    'gen-1000000' sorts BEFORE 'gen-999999', and deriving from the
    sorted tail would hand a writer the name of the LIVE generation."""
    gens = list_generations(root)
    n = max((int(g[len(GEN_PREFIX):]) for g in gens), default=0) + 1
    return gen_name(n)


def clone_generation(src: str, dst: str) -> None:
    """Hardlink-copy a generation tree: directories recreated, files
    linked — O(#files) metadata ops, zero bytes moved. Parquet files
    are immutable once written, so sharing them between generations is
    safe; deleting either generation only unlinks its names."""
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        tgt = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(tgt, exist_ok=True)
        for f in filenames:
            os.link(os.path.join(dirpath, f), os.path.join(tgt, f))
