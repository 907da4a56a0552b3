"""Scale probe — measure the heavy text/dedup operators on a synthetic
10x-documents corpus (fixture rows replicated with distinct doc_ids,
shuffled sources) to check the growth CURVE, not just the sf0.1 point.

Writes the enlarged corpus once under the session warehouse (never
touches /root/testdata) and reports per-query wall seconds at 1x vs
10x. Sub-quadratic growth on the pair-generating queries is the pass
criterion — the blocked joins should grow ~linearly with corpus size
while candidate pairs stay bounded per block.

Usage: python tools/scale_probe.py [--mult 10] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from presto_cached_examples_spark import get_session, registry
from presto_cached_examples_spark.sources.catalog import load_table

QUERIES = [
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_near",
    "q_dedup_containment",
    "q_boilerplate_scrub",
    "q_text_entropy",
    "q_text_pmi",
    "q_quality_tiers",
    "q_text_repetition",
    "q_decontam_hashed",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_session(app_name="pce-scale-probe")
    wh = re.sub(r"^file:/*", "/", spark.conf.get("spark.sql.warehouse.dir"))
    big_dir = os.path.join(wh, f"scaleprobe_x{args.mult}")
    big_docs = os.path.join(big_dir, "documents.parquet")
    if not os.path.exists(os.path.join(big_docs, "_SUCCESS")):
        shutil.rmtree(big_docs, ignore_errors=True)
        d = load_table(spark, args.sf, "documents")
        n = d.count()
        copies = spark.range(args.mult).select(F.col("id").alias("copy"))
        big = (
            d.crossJoin(F.broadcast(copies))
            .select(
                (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
                "text",
                "lang",
                # spread copies over fresh sources so per-source blocks
                # keep realistic sizes instead of multiplying in place
                F.concat_ws(
                    "_", F.col("source"), F.col("copy").cast("string")
                ).alias("source"),
                "n_chars",
            )
            .repartition(32)
        )
        big.write.mode("overwrite").parquet(big_docs)
        print(f"wrote {args.mult}x corpus: {big.count()} docs -> {big_docs}")

    qs = registry.queries()

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    print(f"{'query':26s} {'1x':>7s} {'%dx' % args.mult:>7s}  ratio")
    for name in QUERIES:
        t1 = best_of_2(name, args.sf)
        tn = best_of_2(name, big_dir)
        print(f"{name:26s} {t1:7.2f} {tn:7.2f}  {tn / t1:5.1f}x")


if __name__ == "__main__":
    main()
