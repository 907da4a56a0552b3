"""Driver simulation — run queries under a BARE SparkSession.

The grading driver runs `__spark_entry__.queries()` under ITS OWN
SparkSession, not the engine's `get_session` (which sets AQE, Arrow,
UTC timezone, partition sizing, the NANOS-parquet legacy flag, ...).
A query that silently depends on any of those configs would be green
in every local run and red on the driver. This tool closes that gap:
default-config session, strict hasher, DuckDB oracles.

Round-5 result: 191/191 pass (recorded in NOTES.md).

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--front-only]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--front-only",
        action="store_true",
        help="only the first DRIVER_WINDOW queries (the verification front)",
    )
    ap.add_argument(
        "names",
        nargs="*",
        help="subset of query names (default: all, or the front with --front-only)",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from presto_cached_examples_spark import registry
    from presto_cached_examples_spark.sources.catalog import TABLES, table_path
    from tools.check_oracles import canon

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")  # cosmetic only
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(args.sf, t)}'")

    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[: registry.DRIVER_WINDOW] if args.front_only else list(qs)
    if args.names:
        unknown = sorted(set(args.names) - set(qs))
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        names = [n for n in names if n in set(args.names)]
    n_pass = n_fail = 0
    for name in names:
        try:
            s = canon(qs[name](spark, args.sf).toPandas())
            o = canon(con.sql(osql[name]).df())
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if s == o:
            n_pass += 1
            print(f"PASS {name}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {s[:2]} vs {o[:2]}")
    print(f"{n_pass}/{len(names)} pass under bare session")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
