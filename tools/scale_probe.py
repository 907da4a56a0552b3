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

#: documents-family probes
QUERIES = [
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_near",
    # round-11 addition: the other 64-wide signature op, after both were
    # folded to generic nested-HOF expressions. Copies are verbatim, so
    # identical signatures put every copy in the same bands and the true
    # pair OUTPUT grows ~mult^2 (measured 166k -> 16.9M pairs = 101x at
    # mult=10) — read the wall ratio against THAT, like q_dedup_embed
    # (measured 20x wall vs 101x output: sub-linear in the problem)
    "q_dedup_simhash",
    "q_dedup_containment",
    "q_boilerplate_scrub",
    "q_text_entropy",
    "q_text_pmi",
    "q_quality_tiers",
    "q_text_repetition",
    "q_decontam_hashed",
    # round-6 additions
    "q_dedup_span",
    "q_quality_dsir",
    "q_dedup_incremental_bloom",
    # round-7 additions
    "q_scrub_dup_spans",
    "q_bpe_pair_stats",
    "q_vocab_coverage",
    "q_mix_schedule",
    "q_quality_gopher",
    "q_doc_length_hist",
    "q_source_jaccard",
    "q_dedup_soft",
    "q_quality_ensemble",
    "q_minhash_calibration",
    "q_langid_confusion",
    # round-8 additions (VERDICT r7 item 4: the heavy round-7 families
    # get >=30x curves, not just the 10x point)
    "q_text_kn_bigram",
    "q_quality_ppl_filter",
    "q_curation_pipeline",
    # round-10 additions (VERDICT r9 item 6: the round-9 reshaped
    # plans — tfidf's df-from-pairs, the funnel's single-scan rollup;
    # q_quality_dsir's 2-scan rollup is already probed above)
    "q_text_tfidf",
    "q_curation_funnel",
    # round-10 addition: the real MJPEG-in-MP4 frame path — synthesis
    # encodes every frame, extraction demuxes the sample table and
    # JPEG-decodes only every 4th; the work is per-document Python in
    # an Arrow stage with no shuffle at all, so the curve should be
    # ~linear in corpus bytes (pure map scaling)
    "q_mm_frames",
]

#: events-family probes (10x events = same horizon, 10x denser, fresh
#: users per copy so per-user partitions keep realistic sizes)
EVENT_QUERIES = [
    "q_sessionize",
    "q_markov_transitions",
    "q_path_trigrams",
    "q_rolling_wau",
    "q_concurrency_peak",
    "q_attribution_linear",
    "q_cdc_scd2",
    "q_stream_interval_join",
    # round-7 additions
    "q_events_autocorr",
    "q_events_mad",
    "q_ab_lift",
    "q_events_heatmap",
    "q_stream_alert",
]

#: lineitem-family probes (10x orders over the SAME part space — the
#: co-purchase graph densifies SUPER-linearly: measured 3.6k -> 1.2M
#: edges (335x) and 3 -> 5.65M triangle incidences at mult=10, so read
#: these ratios against the PROBLEM growth, not the input growth. The
#: 10x run also pushes edges past DRIVER_EDGE_THRESHOLD, exercising
#: the distributed label-propagation loop — the actual 100 TB path —
#: for real.)
GRAPH_QUERIES = [
    "q_graph_components",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_graph_degree_stats",
    "q_graph_khop",
]

#: URL-curation probes (documents-derived; canonical-URL/domain key
#: cardinality SATURATES — 124 pages / 4 domains regardless of corpus
#: size — so growth should be scan-dominated ~linear while group sizes
#: multiply; the domain-caps window must stay O(cap) per task via
#: WindowGroupLimit no matter how large a domain gets)
URL_QUERIES = [
    "q_dedup_url",
    "q_domain_caps",
]

#: lineitem aggregate probes (round-5 cent-bucket percentile rewrite:
#: the window leg runs over DISTINCT (flag, cent) rows, which saturate
#: at the price domain, so 10x data should grow only the count
#: aggregate — the curve separating it from the old buffer-everything
#: percentile state whose memory grew with data)
AGG_QUERIES = [
    "q_agg_percentiles",
    # round-16 addition: shares the cent-bucket decomposition and the
    # round-16 single-exchange repartition — same expected curve
    "q_agg_percentiles_approx",
]

#: embeddings-family probes (10x vectors with fresh vec_ids; the probe
#: set stays the fixed vec_id < 10 originals, so these measure SERVING
#: cost against a growing corpus: the IVF join prunes by cell, ADC by
#: code tables, embed-dedup by cell blocking. Copies are identical
#: vectors, so q_dedup_embed's true-pair OUTPUT grows ~mult^2 per cell
#: — read its ratio against that. k-means retrains on the big corpus;
#: collects stay centroid-sized.)
#: TPC-H-analog probes over 10x lineitem (dims unscaled — supplier/
#: part/nation keep fixture size, so these measure fact-side growth:
#: the derived-partsupp aggregates, the threshold joins, and the
#: distinct-pair shuffles all see 10x input rows on the same key
#: domains). q_shipmode_priority is excluded: it joins orders, which
#: the probe does not scale, so its semantics would change.
TPCH_QUERIES = [
    "q_min_cost_supplier",
    "q_important_stock",
    "q_parts_supplier_count",
    "q_dominant_supplier",
    # 10x/30x lineitem over the same part space: baskets multiply and
    # supports grow, but the capped pair HOF keeps per-row cost at
    # CAP^2/2 — the curve should track basket COUNT, not density^2
    "q_basket_rules",
    # round-16 addition: the shared-orderkey-repartition rewrite —
    # expect ~linear (one partitioned pass over the fact rows)
    "q_sole_return_supplier",
]

#: orders-family probes (10x orders with fresh orderkeys, SAME custkey
#: domain — customers get 10x denser order histories, so the per-customer
#: lag windows and the day/month spines see 10x input on fixed key
#: domains; dims stay 1x)
ORDERS_QUERIES = [
    # round-11 addition (VERDICT r10 item 5): 10 static shuffles — the
    # customer-grain checkpoint + three parallel ranking branches must
    # hold their curve as orders densify on the fixed custkey domain
    "q_rfm_segments",
    "q_revenue_ewma",
    "q_seasonal_naive",
    "q_order_gaps",
    "q_returns_wilson",
    "q_anomaly_zscore",
    "q_revenue_moving_median",
    "q_priority_shift",
]

EMBED_QUERIES = [
    "q_sim_topk_kmeans",
    "q_ann_recall_sweep",
    "q_sim_pq",
    "q_sim_adc",
    "q_dedup_embed",
    "q_embed_centroids",
    # round-7 additions
    "q_embed_power_topvec",
    "q_embed_dim_stats",
    "q_embed_label_margin",
    "q_rank_fusion",
    "q_cluster_purity",
    # round-8 addition: k sequential scans — expect ~linear growth
    # (k fixed), the documented latency-bound of greedy farthest-point
    "q_sample_kcenter",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--families",
        default="docs,events,graph,urls,agg",
        help="comma list of docs/events/graph/urls/agg/embed/tpch/orders to probe",
    )
    ap.add_argument(
        "--only",
        default="",
        help="comma list restricting the probed queries within the chosen families",
    )
    args = ap.parse_args()

    spark = get_session(app_name="pce-scale-probe")
    wh = re.sub(r"^file:/*", "/", spark.conf.get("spark.sql.warehouse.dir"))
    big_dir = os.path.join(wh, f"scaleprobe_x{args.mult}")
    big_docs = os.path.join(big_dir, "documents.parquet")
    copies = spark.range(args.mult).select(F.col("id").alias("copy"))

    def materialize(name: str, build) -> None:
        path = os.path.join(big_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        shutil.rmtree(path, ignore_errors=True)
        big = build(load_table(spark, args.sf, name)).repartition(32)
        big.write.mode("overwrite").parquet(path)
        print(f"wrote {args.mult}x {name}: {big.count()} rows -> {path}")

    def big_docs_build(d):
        n = d.count()
        return d.crossJoin(F.broadcast(copies)).select(
            (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
            "text",
            "lang",
            # spread copies over fresh sources so per-source blocks
            # keep realistic sizes instead of multiplying in place
            F.concat_ws("_", F.col("source"), F.col("copy").cast("string")).alias(
                "source"
            ),
            "n_chars",
        )

    def big_events_build(e):
        mx_id = e.agg(F.max("event_id")).collect()[0][0] + 1
        mx_u = e.agg(F.max("user_id")).collect()[0][0] + 1
        return e.crossJoin(F.broadcast(copies)).select(
            (F.col("event_id") + F.col("copy") * mx_id).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * mx_u).alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    def big_lineitem_build(li):
        mx_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
        return li.crossJoin(F.broadcast(copies)).select(
            (F.col("l_orderkey") + F.col("copy") * mx_ok).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )

    def big_embeddings_build(e):
        n = e.count()
        return e.crossJoin(F.broadcast(copies)).select(
            (F.col("vec_id") + F.col("copy") * n).alias("vec_id"),
            "embedding",
            "label",
        )

    def big_orders_build(o):
        mx_ok = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
        return o.crossJoin(F.broadcast(copies)).select(
            (F.col("o_orderkey") + F.col("copy") * mx_ok).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )

    scale_orders = "orders" in set(args.families.split(","))
    # dimension tables are NOT scaled: the probes measure fact-side
    # growth on fixed key domains. Symlink the 1x dims into the big
    # dir so load_table resolves them there. (orders flips to a scaled
    # fact when the orders family is probed — drop a stale symlink.)
    dims = ["region", "nation", "supplier", "part", "customer"]
    if scale_orders:
        dst = os.path.join(big_dir, "orders.parquet")
        if os.path.islink(dst):
            os.remove(dst)
    else:
        dims.append("orders")
    for dim in dims:
        dst = os.path.join(big_dir, f"{dim}.parquet")
        if not os.path.exists(dst):
            os.makedirs(big_dir, exist_ok=True)
            # abspath: a relative --sf would otherwise be stored
            # verbatim and resolve relative to big_dir → dangling link
            # (ADVICE r6 item 2).
            os.symlink(os.path.abspath(os.path.join(args.sf, f"{dim}.parquet")), dst)

    materialize("documents", big_docs_build)
    if scale_orders:
        materialize("orders", big_orders_build)
    materialize("events", big_events_build)
    materialize("lineitem", big_lineitem_build)
    materialize("embeddings", big_embeddings_build)

    qs = registry.queries()

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    fams = set(args.families.split(","))
    names = (
        (QUERIES if "docs" in fams else [])
        + (EVENT_QUERIES if "events" in fams else [])
        + (GRAPH_QUERIES if "graph" in fams else [])
        + (URL_QUERIES if "urls" in fams else [])
        + (AGG_QUERIES if "agg" in fams else [])
        + (EMBED_QUERIES if "embed" in fams else [])
        + (TPCH_QUERIES if "tpch" in fams else [])
        + (ORDERS_QUERIES if "orders" in fams else [])
    )
    if args.only:
        keep = {n.strip() for n in args.only.split(",") if n.strip()}
        names = [n for n in names if n in keep]
    print(f"{'query':26s} {'1x':>7s} {'%dx' % args.mult:>7s}  ratio")
    for name in names:
        t1 = best_of_2(name, args.sf)
        tn = best_of_2(name, big_dir)
        print(f"{name:26s} {t1:7.2f} {tn:7.2f}  {tn / t1:5.1f}x")


if __name__ == "__main__":
    main()
