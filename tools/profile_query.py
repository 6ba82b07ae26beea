#!/usr/bin/env python
"""Per-query overhead profiler for the optimization rounds (guide §1).

For each named registry query: wall seconds (cold + warm repeats, noop
sink), the number of Spark JOBS the run launched (job-group scoped —
includes driver-coordinated actions like collects and stream
micro-batches, the fixed-overhead culprits at fixture scale), the
number of STAGES, and shuffle read/write byte deltas (AppStatusStore,
degrading to None like tools/scale_probe).

Usage::

    python tools/profile_query.py q_name [q_name ...] [--runs N]

Prints one JSON line per query plus a summary. The job/stage counts are
the key signal this round: at sf0.1 most headline queries are bounded
by sequential-job fixed costs, not data volume, and every removed pass
is also one fewer full-corpus scan at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _stage_rows, max_stage_id, shuffle_since  # noqa: E402


def profile_one(spark, name: str, sf_dir: str, runs: int = 2) -> list[dict]:
    from data_pipeline_with_big_data_stack_spark.queries import QUERIES

    sc = spark.sparkContext
    out = []
    for i in range(runs):
        group = f"prof_{name}_{i}"
        sc.setJobGroup(group, name)
        mark = max_stage_id(spark)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        sec = time.perf_counter() - t0
        try:
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        except Exception:  # noqa: BLE001
            jobs = None
        w, r = shuffle_since(spark, mark)
        rows = _stage_rows(spark)
        n_stages = (
            None
            if (rows is None or mark is None)
            else sum(1 for sid, _w, _r in rows if sid > mark)
        )
        sc.setLocalProperty("spark.jobGroup.id", None)
        out.append(
            {
                "sec": round(sec, 3),
                "n_jobs": jobs,
                "n_stages": n_stages,
                "shuffle_write": w,
                "shuffle_read": r,
            }
        )
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_pipeline_with_big_data_stack_spark.session import get_spark

    spark = get_spark(app_name="profile-query")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()  # warmup
    for name in names:
        try:
            rows = profile_one(spark, name, sf_dir, runs=runs)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"query": name, "error": f"{type(exc).__name__}: {exc}"[:300]}))
            continue
        print(json.dumps({"query": name, "runs": rows}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
