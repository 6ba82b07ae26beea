#!/usr/bin/env python
"""Driver-sim sweep: run every oracled registry query the way the
round driver does and hash-compare against DuckDB.

This is the strongest pre-driver check available: a VANILLA
SparkSession (no engine factory confs) with a hostile non-UTC session
timezone, launched from OUTSIDE the repo (so worker-side functions must
ship by value), each query's DataFrame canonicalized and compared
value-for-value against its DuckDB oracle on the same parquet tables.
The per-round gate samples ~50 queries; this sweeps all of them, plus a
non-empty check on the rows-only queries.

Usage (from any cwd — the tool re-execs itself from /tmp):
    python tools/driver_sim_sweep.py [sf_dir] [lo] [hi]
    python tools/driver_sim_sweep.py [sf_dir] q_name [q_name ...]
Defaults: /root/testdata/sf0.01, full range. A non-integer second arg
selects queries by name instead of index range. Prints one line per
failure and a summary; exit code 1 if anything mismatched.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if os.path.abspath(os.getcwd()).startswith(REPO):
    # Run from /tmp so worker-side deserialization cannot lean on the
    # repo being the cwd: closures must ship fully by value, exactly as
    # they would on a real multi-node cluster.
    os.chdir("/tmp")

sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    lo, hi, names = 0, 10**9, None
    rest = sys.argv[2:]
    if rest and not rest[0].lstrip("-").isdigit():
        names = rest
    else:
        lo = int(rest[0]) if len(rest) > 0 else 0
        hi = int(rest[1]) if len(rest) > 1 else 10**9

    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim-sweep")
        .config("spark.sql.session.timeZone", "America/New_York")  # hostile
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif np.issubdtype(df[c].dtype, np.floating):
                df[c] = df[c].round(4)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    Q, O = E.queries(), E.oracle_sql()
    if names is not None:
        unknown = [n for n in names if n not in Q]
        if unknown:
            print(f"unknown queries: {unknown}")
            sys.exit(2)
    res: dict[str, str] = {}
    for name in names if names is not None else list(Q)[lo:hi]:
        try:
            s = Q[name](spark, sf_dir).toPandas()
            if name in O:
                sc, oc = canon(s), canon(con.sql(O[name]).df())
                ok = sc.shape == oc.shape and (
                    sc.astype(str).values == oc.astype(str).values
                ).all()
                res[name] = "OK" if ok else f"MISMATCH {sc.shape} vs {oc.shape}"
            else:
                res[name] = "OK(rows-only)" if len(s) > 0 else "EMPTY"
        except Exception as exc:  # noqa: BLE001
            res[name] = f"ERROR {type(exc).__name__}: {exc}"[:300]
        if not res[name].startswith("OK"):
            print(f"{name}: {res[name]}", flush=True)
    bad = {k: v for k, v in res.items() if not v.startswith("OK")}
    print(
        json.dumps(
            {"checked": len(res), "ok": len(res) - len(bad), "bad": bad}
        )
    )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
