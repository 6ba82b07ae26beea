"""Exactly-once, locking, recovery, and schema-evolution contracts of
the rollup maintenance loop (VERDICT r4 "Next round" items 1, 3, 4).

The at-least-once hazard being pinned: ``foreachBatch`` re-runs a batch
after a mid-write failure, and the merge is not idempotent — so a crash
between two touched-partition writes followed by a retry used to
double-count the batch in the partitions the crashed attempt had
already written. With ``batch_id`` the merge is staged + published by
atomic rename with a per-partition marker, making retries exactly-once:
every test here asserts the invariant *store == full recompute from all
raw events* after a crash + retry.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM
from data_pipeline_with_big_data_stack_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _final(spark, path):
    return {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in RM.read_rollup(spark, path).collect()
    }


def _expected(spark, tmp_path, e):
    full = str(tmp_path / "full_recompute")
    RM.build_rollup(e, full)
    return _final(spark, full)


def _split(e, salt=3):
    return e.filter(F.col("event_id") % salt != 0), e.filter(
        F.col("event_id") % salt == 0
    )


def test_retry_of_published_batch_is_noop(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events")
    initial, late = _split(e)
    path = str(tmp_path / "store")
    RM.build_rollup(initial, path)
    RM.apply_increment(spark, path, late, batch_id=1)
    once = _final(spark, path)
    assert once == _expected(spark, tmp_path, e)
    # the retry the checkpoint would issue after a post-commit crash:
    # same epoch, same data — must change nothing
    RM.apply_increment(spark, path, late, batch_id=1)
    assert _final(spark, path) == once


def test_crash_between_partition_publishes_then_retry(spark, tmp_path, monkeypatch):
    """The exact double-count scenario from VERDICT r4: fail AFTER the
    first touched partition published but before the second, retry the
    batch, and require store == full recompute (the legacy path would
    re-merge the batch into the already-published partition)."""
    e = load_table(spark, SF_SMOKE, "events")
    initial, late = _split(e)
    path = str(tmp_path / "store")
    RM.build_rollup(initial, path)
    assert late.select(F.to_date("ts")).distinct().count() > 1

    real = RM._publish_partition
    calls = {"n": 0}

    def crashy(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between partition publishes")
        return real(*args, **kwargs)

    monkeypatch.setattr(RM, "_publish_partition", crashy)
    with pytest.raises(RuntimeError, match="injected crash"):
        RM.apply_increment(spark, path, late, batch_id=7)
    monkeypatch.setattr(RM, "_publish_partition", real)
    # retry of the same epoch (what the restarted stream does)
    RM.apply_increment(spark, path, late, batch_id=7)
    assert _final(spark, path) == _expected(spark, tmp_path, e)


def test_crash_between_renames_is_recovered(spark, tmp_path):
    """Tightest window: live partition already moved to trash, staged
    dir not yet renamed in — the partition is MISSING from the store.
    _recover must restore the original before the retry merges."""
    e = load_table(spark, SF_SMOKE, "events")
    initial, late = _split(e)
    path = str(tmp_path / "store")
    RM.build_rollup(initial, path)
    days = sorted(d for d in os.listdir(path) if d.startswith("__date="))
    victim = days[0]
    trash = os.path.join(path, ".trash_batch_3")
    os.makedirs(trash)
    os.rename(os.path.join(path, victim), os.path.join(trash, victim))
    assert not os.path.exists(os.path.join(path, victim))
    RM.apply_increment(spark, path, late, batch_id=3)
    assert _final(spark, path) == _expected(spark, tmp_path, e)
    assert not os.path.exists(trash)


def test_streaming_restart_after_midbatch_crash(spark, tmp_path, monkeypatch):
    """End-to-end: the stream itself crashes mid-publish, restarts from
    its checkpoint (same epoch id replays), and the served store equals
    the full recompute — at-least-once delivery, exactly-once effect."""
    e = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    e.write.mode("overwrite").parquet(src)
    path = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    real = RM._publish_partition
    calls = {"n": 0}

    def crashy(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mid-publish crash")
        return real(*args, **kwargs)

    def run_stream():
        st = spark.readStream.schema(e.schema).parquet(src)
        q = (
            st.writeStream.foreachBatch(
                lambda df, eid: RM.apply_increment(
                    df.sparkSession, path, df, batch_id=eid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    monkeypatch.setattr(RM, "_publish_partition", crashy)
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run_stream()
    monkeypatch.setattr(RM, "_publish_partition", real)
    run_stream()  # restart: checkpoint replays the failed epoch
    assert _final(spark, path) == _expected(spark, tmp_path, e)


def test_maintenance_lock_blocks_second_writer(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e, path)
    lock = path + RM._LOCK_SUFFIX
    open(lock, "w").close()  # a concurrent job holds the store
    with pytest.raises(RuntimeError, match="locked by another maintenance job"):
        RM.apply_increment(spark, path, e.limit(10))
    with pytest.raises(RuntimeError, match="locked by another maintenance job"):
        RM.expire_partitions(spark, path, "2030-01-01")
    os.remove(lock)
    RM.apply_increment(spark, path, e.limit(0))  # lock released → proceeds
    assert not os.path.exists(lock), "lock must be released on exit"


def test_lock_released_after_failure(spark, tmp_path, monkeypatch):
    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e, path)

    def boom(*a, **k):
        raise RuntimeError("injected")

    monkeypatch.setattr(RM, "_publish_partition", boom)
    with pytest.raises(RuntimeError, match="injected"):
        RM.apply_increment(spark, path, e.limit(50), batch_id=4)
    assert not os.path.exists(path + RM._LOCK_SUFFIX)


def test_explicit_conflicting_dims_raise(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e, path, dims=("event_type",))
    # additive conflict without opting in
    with pytest.raises(ValueError, match="evolve"):
        RM.apply_increment(spark, path, e.limit(10), dims=("event_type", "user_id"))
    # dropping a dimension is never allowed
    with pytest.raises(ValueError, match="never lose"):
        RM.apply_increment(spark, path, e.limit(10), dims=())
    # same set (order-insensitive) is NOT a conflict
    RM.apply_increment(spark, path, e.limit(0), dims=("event_type",))


def test_schema_evolution_backfills_null(spark, tmp_path):
    """Druid's per-segment schema behavior: a batch carrying a new
    dimension grows the store, and pre-evolution rows serve NULL for
    it. Post-evolution rows carry real values, and totals still equal
    the full recompute when the new dim is rolled away."""
    e = load_table(spark, SF_SMOKE, "events")
    cut = F.to_date("ts") < F.lit("2024-01-15").cast("date")
    path = str(tmp_path / "store")
    RM.build_rollup(e.filter(cut), path, dims=("event_type",))
    RM.apply_increment(
        spark,
        path,
        e.filter(~cut),
        dims=("event_type", "user_id"),
        on_new_columns="evolve",
        batch_id=11,
    )
    # the evolution marker is what re-enables schema-merged reads (a
    # never-evolved store reads single-footer — r15); it must exist the
    # moment the store can hold mixed-schema partitions
    assert os.path.exists(os.path.join(path, RM._EVOLVED_MARKER)), (
        "evolve path must persist the schema-evolution marker"
    )
    served = RM.serve_rollup(
        spark, path, grain="day", dims=("event_type", "user_id")
    ).collect()
    assert any(r.user_id is None for r in served), "pre-evolution rows → NULL"
    assert any(r.user_id is not None for r in served), "new batches carry the dim"
    # rolling the evolved dim away must reproduce the full recompute
    assert {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in RM.serve_rollup(spark, path, grain="hour").collect()
    } == {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in RM.serve_rollup(spark, str(_build_full(spark, tmp_path, e)), grain="hour").collect()
    }
    # a LATER increment with dims=None must maintain the EVOLVED dim
    # set: the marker-gated schema-merged read is what surfaces the new
    # dimension when single-footer inference could sample a
    # pre-evolution partition (r15 — never-evolved stores skip the
    # all-footers mergeSchema job; this pins that evolved stores don't)
    before = {
        (r.bucket, r.event_type, r.user_id): r.n_events
        for r in RM.serve_rollup(
            spark, path, grain="day", dims=("event_type", "user_id")
        ).collect()
    }
    late = e.filter(cut).limit(25)
    RM.apply_increment(spark, path, late, batch_id=12)
    after = {
        (r.bucket, r.event_type, r.user_id): r.n_events
        for r in RM.serve_rollup(
            spark, path, grain="day", dims=("event_type", "user_id")
        ).collect()
    }
    assert sum(after.values()) == sum(before.values()) + late.count()
    assert any(k[2] is not None for k in after), "evolved dim still maintained"


def _build_full(spark, tmp_path, e):
    full = tmp_path / "full_for_evolution"
    if not os.path.exists(str(full)):
        RM.build_rollup(e, str(full))
    return full


def test_expire_skips_hive_default_partition(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e, path)
    weird = os.path.join(path, "__date=__HIVE_DEFAULT_PARTITION__")
    os.makedirs(weird)
    dropped = RM.expire_partitions(spark, path, "2030-01-01")
    assert dropped, "real day partitions expire"
    assert os.path.exists(weird), "unparsable partition survives, no crash"
    shutil.rmtree(weird)


def test_every_crash_point_recovers_exactly_once(spark, tmp_path, monkeypatch):
    """Exhaustive sweep: inject the crash at EVERY publish position of a
    multi-partition batch (including before the first and after the
    last), retry, and require store == full recompute each time. Also
    covers a double-crash (two failed attempts at different positions
    before the successful retry)."""
    e = load_table(spark, SF_SMOKE, "events")
    initial, late = _split(e)
    expected = _expected(spark, tmp_path, e)
    n_parts = late.select(F.to_date("ts")).distinct().count()
    assert n_parts >= 2
    real = RM._publish_partition

    def crash_at(pos):
        calls = {"n": 0}

        def fn(*args, **kwargs):
            calls["n"] += 1
            if calls["n"] == pos:
                raise RuntimeError(f"injected@{pos}")
            return real(*args, **kwargs)

        return fn

    # cap sweep size for suite time: first, second, middle, last
    positions = sorted({1, 2, max(1, n_parts // 2), n_parts})
    for pos in positions:
        path = str(tmp_path / f"store_{pos}")
        RM.build_rollup(initial, path)
        monkeypatch.setattr(RM, "_publish_partition", crash_at(pos))
        with pytest.raises(RuntimeError, match="injected"):
            RM.apply_increment(spark, path, late, batch_id=9)
        monkeypatch.setattr(RM, "_publish_partition", real)
        RM.apply_increment(spark, path, late, batch_id=9)
        assert _final(spark, path) == expected, f"crash@{pos}"

    # double crash: attempt 1 dies at position 1, attempt 2 at its last
    # remaining position, attempt 3 completes
    path = str(tmp_path / "store_double")
    RM.build_rollup(initial, path)
    monkeypatch.setattr(RM, "_publish_partition", crash_at(1))
    with pytest.raises(RuntimeError):
        RM.apply_increment(spark, path, late, batch_id=9)
    monkeypatch.setattr(RM, "_publish_partition", crash_at(n_parts - 1))
    with pytest.raises(RuntimeError):
        RM.apply_increment(spark, path, late, batch_id=9)
    monkeypatch.setattr(RM, "_publish_partition", real)
    RM.apply_increment(spark, path, late, batch_id=9)
    assert _final(spark, path) == expected


def test_sequential_batches_with_ids_equal_full_recompute(spark, tmp_path):
    """The steady-state streaming shape: several epochs in sequence,
    each through the staged exactly-once path, no crashes — must equal
    the full recompute (and leave no staging/trash debris behind)."""
    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    for i in range(4):
        RM.apply_increment(
            spark, path, e.filter(F.col("event_id") % 4 == i), batch_id=i
        )
    assert _final(spark, path) == _expected(spark, tmp_path, e)
    debris = [
        d for d in os.listdir(path)
        if d.startswith((".staging_batch_", ".trash_batch_"))
    ]
    assert debris == []


def test_null_timestamps_rejected_like_druid(spark, tmp_path):
    """Druid rejects rows with unparseable timestamps; the rollup does
    the same — a null-ts batch creates no __HIVE_DEFAULT_PARTITION__
    dir and the store still equals the recompute over parseable rows."""
    e = load_table(spark, SF_SMOKE, "events")
    poisoned = e.unionByName(
        e.limit(20).withColumn("ts", F.lit(None).cast(e.schema["ts"].dataType))
    )
    path = str(tmp_path / "store")
    RM.apply_increment(spark, path, poisoned.filter(F.col("event_id") % 2 == 0), batch_id=1)
    RM.apply_increment(spark, path, poisoned.filter(F.col("event_id") % 2 == 1), batch_id=2)
    assert not any("HIVE_DEFAULT" in d for d in os.listdir(path))
    assert _final(spark, path) == _expected(spark, tmp_path, e)


def test_multi_epoch_stream_equals_recompute(spark, tmp_path):
    """Real multi-epoch stream (maxFilesPerTrigger=1 → one epoch per
    source file): every epoch goes through the staged exactly-once
    path with its own batch id, and the served store equals the full
    recompute."""
    e = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    e.repartition(5).write.mode("overwrite").parquet(src)
    path = str(tmp_path / "store")
    st = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        st.writeStream.foreachBatch(
            lambda df, eid: RM.apply_increment(
                df.sparkSession, path, df, batch_id=eid
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _final(spark, path) == _expected(spark, tmp_path, e)


def _dead_pid() -> int:
    import subprocess

    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_stale_lock_of_dead_holder_reclaimed_automatically(spark, tmp_path):
    """ADVICE r5: a hard process crash used to leave the store
    permanently locked. The lock now carries pid@host; a maintenance
    retry detects the dead holder and self-heals — no manual removal."""
    import socket

    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e.filter(F.col("event_id") % 3 != 0), path)
    lock = path + RM._LOCK_SUFFIX
    with open(lock, "w") as fh:
        fh.write(f"{_dead_pid()}@{socket.gethostname()} 0.0\n")
    # crash-then-retry: acquires without manual intervention
    RM.apply_increment(
        spark, path, e.filter(F.col("event_id") % 3 == 0), batch_id=11
    )
    assert _final(spark, path) == _expected(spark, tmp_path, e)
    assert not os.path.exists(lock)


def test_live_holder_lock_still_blocks(spark, tmp_path):
    import socket

    import pytest

    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e, path)
    lock = path + RM._LOCK_SUFFIX
    with open(lock, "w") as fh:  # this very process: alive
        fh.write(f"{os.getpid()}@{socket.gethostname()} 0.0\n")
    with pytest.raises(RuntimeError, match="locked by another maintenance job"):
        RM.apply_increment(spark, path, e.limit(10), batch_id=12)
    os.remove(lock)


def test_foreign_lock_reclaimed_by_age_only(spark, tmp_path):
    """A lock from another host (pid-liveness unknowable) blocks inside
    the age window and is reclaimed beyond it."""
    import time

    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "store")
    RM.build_rollup(e, path)
    lock = path + RM._LOCK_SUFFIX
    with open(lock, "w") as fh:
        fh.write("999999@some-other-host 0.0\n")
    # fresh → blocked (default 1h window)
    assert RM.break_stale_lock(spark, path) is False
    # age it past the window → reclaimed
    old = time.time() - 2 * RM._STALE_LOCK_MAX_AGE
    os.utime(lock, (old, old))
    assert RM.break_stale_lock(spark, path) is True
    assert not os.path.exists(lock)


def test_break_stale_lock_noop_when_absent(spark, tmp_path):
    path = str(tmp_path / "store")
    assert RM.break_stale_lock(spark, path) is False


def test_publish_rename_failure_raises(spark, tmp_path, monkeypatch):
    """ADVICE r5: Hadoop rename reports most failures by returning
    false. A false return during publish must surface as an error, not
    a silently inconsistent store."""
    import pytest

    e = load_table(spark, SF_SMOKE, "events")
    initial, late = _split(e)
    path = str(tmp_path / "store")
    RM.build_rollup(initial, path)

    real = RM._checked_rename
    calls = {"n": 0}

    def lying(fs, src, dest):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate FileSystem.rename returning false (the dest is
            # NOT moved — exactly the partial state a false return means)
            raise IOError(f"rename {src} -> {dest} failed (FileSystem returned false)")
        return real(fs, src, dest)

    monkeypatch.setattr(RM, "_checked_rename", lying)
    with pytest.raises(Exception, match="rename .* failed"):
        RM.apply_increment(spark, path, late, batch_id=13)
    monkeypatch.setattr(RM, "_checked_rename", real)
    # the failure is retryable: the same epoch converges to recompute
    RM.apply_increment(spark, path, late, batch_id=13)
    assert _final(spark, path) == _expected(spark, tmp_path, e)


def test_lock_heartbeat_keeps_long_jobs_alive(spark, tmp_path, monkeypatch):
    """The lease heartbeat refreshes the lock mtime while held, so the
    age-based breaker measures LIVENESS, not job duration — an hours-
    long maintenance job can no longer be mis-killed by a foreign
    breaker's age window."""
    import time

    monkeypatch.setattr(RM, "_HEARTBEAT_SECONDS", 0.2)
    path = str(tmp_path / "store")
    lease = RM._acquire_lock(spark, path)
    lock = path + RM._LOCK_SUFFIX
    try:
        old = time.time() - 7200
        os.utime(lock, (old, old))  # simulate a long-running hold
        deadline = time.time() + 5
        while os.path.getmtime(lock) < time.time() - 60:
            assert time.time() < deadline, "heartbeat never refreshed mtime"
            time.sleep(0.1)
        # even an aggressive age-only breaker now sees a fresh lock
        assert RM.break_stale_lock(spark, path, max_age_seconds=30.0) is False
    finally:
        lease.release()
    assert not os.path.exists(lock), "release deletes the lock"


def test_release_leaves_a_successors_lock_alone(spark, tmp_path):
    """ADVICE r6: if a breaker reclaimed our lock and a NEW holder
    acquired the same path, release() must NOT delete the new holder's
    lock — it re-reads the body and backs off when the payload isn't
    its own."""
    path = str(tmp_path / "store")
    lock = path + RM._LOCK_SUFFIX
    stale = RM._acquire_lock(spark, path)
    # a racing breaker reclaims the lock out from under the holder...
    fs, jlock = RM._lock_path(spark, path)
    assert fs.delete(jlock, False)
    # ...and a new holder claims the same path
    new = RM._acquire_lock(spark, path)
    assert new.payload != stale.payload

    stale.release()  # must notice the foreign payload and back off
    assert os.path.exists(lock), "stale release deleted the new lock"
    assert RM._read_lock_body(spark._jvm, fs, jlock) == new.payload

    new.release()  # the rightful owner still cleans up
    assert not os.path.exists(lock)


def test_failed_body_write_does_not_leave_empty_lock(spark, tmp_path, monkeypatch):
    """ADVICE r6: a write/close failure after the atomic create must
    remove the just-created (empty, unparseable) lock on the way out —
    otherwise maintenance is blocked for the full age window."""
    path = str(tmp_path / "store")
    lock = path + RM._LOCK_SUFFIX

    def boom(out, payload):
        out.close()
        raise OSError("disk full")

    monkeypatch.setattr(RM, "_write_lock_body", boom)
    with pytest.raises(OSError, match="disk full"):
        RM._acquire_lock(spark, path)
    assert not os.path.exists(lock), "empty lock left behind"

    monkeypatch.undo()
    lease = RM._acquire_lock(spark, path)  # path is immediately usable
    lease.release()
    assert not os.path.exists(lock)
