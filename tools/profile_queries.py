"""Warm-session per-query profiler (guide §1.4): noop sink, min-of-N.

Usage: python tools/profile_queries.py [--sf DIR] [--n N] [--alternate] q1 q2 ...
       python tools/profile_queries.py --all            # full registry sweep

Prints one line per query: name, min, median, all samples. With
--alternate, queries are interleaved round-robin (A/B discipline from
OPTIMIZATION_r15) instead of back-to-back.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_cached_examples_spark import get_session, registry  # noqa: E402


def run_once(spark, name, fn, sf_dir):
    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--alternate", action="store_true")
    args = ap.parse_args()

    spark = get_session()
    specs = registry.all_specs()  # name -> QuerySpec
    names = list(specs) if args.all else args.queries
    by_name = {n: s.fn for n, s in specs.items()}
    for q in names:
        if q not in by_name:
            raise SystemExit(f"unknown query: {q}")

    # warm the session: tiny action
    spark.range(1000).selectExpr("sum(id)").collect()

    samples: dict[str, list[float]] = {q: [] for q in names}
    if args.alternate:
        for _ in range(args.n):
            for q in names:
                samples[q].append(run_once(spark, q, by_name[q], args.sf))
    else:
        for q in names:
            for _ in range(args.n):
                samples[q].append(run_once(spark, q, by_name[q], args.sf))

    total_min = 0.0
    for q in names:
        ss = sorted(samples[q])
        total_min += ss[0]
        med = ss[len(ss) // 2]
        print(f"{q:36s} min={ss[0]:7.3f} med={med:7.3f}  {['%.3f' % x for x in samples[q]]}")
    print(f"TOTAL(min) {total_min:.3f}s over {len(names)} queries")


if __name__ == "__main__":
    main()
