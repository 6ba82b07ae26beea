#!/usr/bin/env python
"""Targeted driver-sim: hash-compare NAMED registry queries against
their DuckDB oracles, exactly like tools/driver_sim_sweep.py but for a
short list — the fast inner loop after touching a query.

Usage: python tools/driver_sim_one.py q_name [q_name ...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.abspath(os.getcwd()).startswith(REPO):
    os.chdir("/tmp")
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args

    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim-one")
        .config("spark.sql.session.timeZone", "America/New_York")
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
    res: dict[str, str] = {}
    for name in names:
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
            res[name] = f"ERROR {type(exc).__name__}: {exc}"[:500]
        print(f"{name}: {res[name]}", flush=True)
    bad = {k: v for k, v in res.items() if not v.startswith("OK")}
    print(json.dumps({"checked": len(res), "ok": len(res) - len(bad)}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
