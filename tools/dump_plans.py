#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Usage::

    python tools/dump_plans.py OUT_DIR SUFFIX q_name [q_name ...]

Writes ``OUT_DIR/<q_name>_<SUFFIX>.txt`` per query. Note that building
a query's DataFrame executes its construction-time side effects (index
builds, stream drains), so this costs near-query runtime for the
materialized-store family.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from data_pipeline_with_big_data_stack_spark.queries import QUERIES
    from data_pipeline_with_big_data_stack_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
