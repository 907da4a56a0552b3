"""Scale-safe rewrites of the distribution-style window queries.

The exact twins (q_window_dist / q_window_range_frame in analytics.py)
partition their windows by `c_mktsegment` — 5 values — so one task
sorts 20% of the table; fine as cross-engine oracles, fatal at 100 TB.
These variants compute the SAME results (same DuckDB oracles) with no
window partition proportional to table size:

- q_window_dist_scalable: exact rank via bucket decomposition. Rows
  get a value bucket (integer cents — injective, monotone); rank =
  (prefix-summed count of lower buckets) + (row_number inside the
  bucket). The only window over raw rows is partitioned by
  (segment, bucket); the prefix-sum window runs over per-bucket count
  rows, whose cardinality is bounded by the value domain (~1.1M cent
  values for TPC-H acctbal), not by the data.
- q_window_range_scalable: the ±100 RANGE frame count becomes
  C(cents+10000) - C(cents-10001), with C evaluated by a sweep-line
  running sum over per-cent counts plus zero-weight probe points —
  two shuffle equi-joins against a domain-bounded helper relation;
  no row-level pair join at all.

Both decompositions require a value key with bounded domain/ties (true
for any fixed-precision decimal); for unbounded domains substitute
approx_percentile cut points as the bucket key at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.plans.persistence import maybe_persist
from presto_cached_examples_spark.sources.catalog import load_table

_SEG = "c_mktsegment"


def _cents(col):
    """acctbal is cent-quantized; integer cents are an exact, monotone
    bucket key (floor(x*100) would float-drift on values like 8280.65)."""
    return F.round(F.col(col) * 100, 0).cast("long")


@register(
    "q_window_dist_scalable",
    category="window",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4)       OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_dist_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist per segment WITHOUT a segment-wide
    sort: exact global rank = bucket offset + intra-bucket row_number,
    then the three distribution functions are arithmetic on (rank, n).

    Windows in this plan: raw rows are only ever partitioned by
    (segment, cent-bucket) — tie-group sized; the offset prefix-sum
    runs over per-bucket counts (domain-bounded, ~1.1M rows max
    forever). ntile follows Spark/DuckDB semantics: first n%4 buckets
    take the extra row. The order key (acctbal, custkey) is unique, so
    cume_dist = rank/n exactly."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", _SEG, "c_acctbal", _cents("c_acctbal").alias("bucket")
    )
    w_in = Window.partitionBy(_SEG, "bucket").orderBy("c_acctbal", "c_custkey")
    rows = c.withColumn("r_in", F.row_number().over(w_in))

    counts = c.groupBy(_SEG, "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.partitionBy(_SEG).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        _SEG,
        "bucket",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy(_SEG)).alias("n"),
    )

    j = rows.join(offsets, [_SEG, "bucket"])
    rank = (F.col("off") + F.col("r_in")).alias("rank")
    j = j.select("c_custkey", _SEG, "n", rank)

    # ntile(4): base = n//4 rows per bucket, first n%4 buckets get one more
    base, rem = F.floor(F.col("n") / 4), F.col("n") % 4
    big = rem * (base + 1)  # rows covered by the larger buckets
    quartile = (
        F.when(F.col("rank") <= big, F.floor((F.col("rank") + base) / (base + 1)))
        .otherwise(rem + F.floor((F.col("rank") - big + base - 1) / base))
        .cast("int")
    )
    pct_rank = F.when(
        F.col("n") > 1, (F.col("rank") - 1).cast("double") / (F.col("n") - 1)
    ).otherwise(F.lit(0.0))
    cume = F.col("rank").cast("double") / F.col("n")
    return j.select(
        "c_custkey",
        _SEG,
        quartile.alias("quartile"),
        F.round(pct_rank, 6).alias("pct_rank"),
        F.round(cume, 6).alias("cume"),
    )


@register(
    "q_window_range_scalable",
    category="window",
    oracle="""
    SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal,
           COUNT(*) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal
             RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING
           ) AS n_within_100
    FROM customer
    """,
)
def q_window_range_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peers within ±100.00 acctbal WITHOUT a segment-wide RANGE window:
    in integer cents the frame is y ∈ [x-10000, x+10000], so the count
    is C(x+10000) - C(x-10001) for C(k) = # rows with cents ≤ k.

    Sweep-line evaluation of C at exactly the needed points: per
    distinct cent value, emit its count (weight=cnt) plus two
    zero-weight probes (one at cents+10000, one at cents-10001); a
    single running sum ordered by (position, probe-after-value) yields
    C at every probe. The sweep window holds ≤ 3 × distinct-cents rows
    per segment — bounded by the fixed cent domain (~3.3M), not by row
    count — and the base table rejoins its probe results with ordinary
    uniform-key equi-joins. No pair join, no data-sized partition."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", _SEG, "c_acctbal", _cents("c_acctbal").alias("cents")
    )
    counts = c.groupBy(_SEG, "cents").agg(F.count(F.lit(1)).alias("cnt"))
    # (segment, cents) grain — bounded by the cent domain, not rows;
    # 3 consumers (values + both probe streams) otherwise re-scan the
    # base table once each (7 customer scans pre-round-9)
    counts = maybe_persist(counts, sf_dir)
    values = counts.select(
        _SEG, F.col("cents").alias("pos"), F.col("cnt").alias("w"),
        F.lit(None).cast("long").alias("base"), F.lit(0).alias("is_probe"),
    )
    probe_hi = counts.select(
        _SEG, (F.col("cents") + 10000).alias("pos"), F.lit(0).cast("long").alias("w"),
        F.col("cents").alias("base"), F.lit(1).alias("is_probe"),
    )
    probe_lo = counts.select(
        _SEG, (F.col("cents") - 10001).alias("pos"), F.lit(0).cast("long").alias("w"),
        F.col("cents").alias("base"), F.lit(2).alias("is_probe"),
    )
    # probes sort AFTER the value at the same position, so the running
    # sum at a probe is exactly C(pos)
    w_sweep = Window.partitionBy(_SEG).orderBy("pos", "is_probe", "base").rowsBetween(
        Window.unboundedPreceding, 0
    )
    swept = (
        values.unionByName(probe_hi).unionByName(probe_lo)
        .select(_SEG, "base", "is_probe", F.sum("w").over(w_sweep).alias("cum"))
        .filter(F.col("is_probe") > 0)
    )
    swept = maybe_persist(swept, sf_dir)  # probe grain; hi+lo consumers (lazy, gated)
    hi = swept.filter("is_probe = 1").select(
        _SEG, F.col("base").alias("cents"), F.col("cum").alias("c_hi")
    )
    lo = swept.filter("is_probe = 2").select(
        _SEG, F.col("base").alias("cents"), F.col("cum").alias("c_lo")
    )
    return (
        c.join(hi, [_SEG, "cents"])
        .join(lo, [_SEG, "cents"])
        .select(
            "c_custkey",
            _SEG,
            F.round("c_acctbal", 2).alias("c_acctbal"),
            (F.col("c_hi") - F.col("c_lo")).alias("n_within_100"),
        )
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    *,
    descending: bool = False,
    out_rank: str = "rank",
    out_n: str = "n",
    n_buckets: int = 64,
    rel_err: float = 0.001,
    quantile_source: DataFrame | None = None,
    splits: "list[float] | None" = None,
) -> DataFrame:
    """Exact global 1-based rank by (value_col [DESC], tiebreak_col ASC)
    with NO data-proportional window partition — the explicit form of
    the range-partitioned sort a distributed engine uses for global
    ORDER BY, kept inside the DataFrame API so the rank is exact and
    the plan auditable.

    Mechanics: split points from approxQuantile (a deterministic
    Greenwald-Khanna pass — the "sample" step of RangePartitioning,
    adaptive to skew where fixed-width buckets are not) define value
    ranges; every row's bucket is a pure expression over the broadcast
    split array (ties share a bucket by construction, so ranks never
    straddle a boundary); rank = prefix-summed count of earlier buckets
    + row_number within the bucket. The only window over raw rows is
    partitioned by bucket (~n/n_buckets rows); the offset prefix-sum
    runs over <= n_buckets rows. Results are invariant to the split
    points themselves — they shape the plan, never the answer — so the
    SQL oracles of callers are untouched. `quantile_source` lets a
    caller chaining several rankings point the split-point pass at the
    shallow base relation instead of the growing chain (same rows,
    same distribution, cheaper eager pass). `splits` lets a caller
    hand in pre-computed split points instead — e.g. ONE multi-column
    `approxQuantile` call shared across several rankings of the same
    relation (q_rfm_segments) — turning k rankings' k sample passes
    into one; the split values still shape only the plan, never the
    answer.

    At 100 TB: split points come from the same sampled pass Spark's
    own range exchange does; n_buckets scales with cluster
    parallelism. The approxQuantile collect is split-point-sized
    (ingest-time artifact, like the k-means codebooks)."""
    for tmp in ("__grk_bucket", "__grk_rin", "__grk_cnt", "__grk_off"):
        assert tmp not in df.columns, f"column {tmp} collides with global_rank internals"
    if splits is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        src = df if quantile_source is None else quantile_source
        splits = src.approxQuantile(value_col, qs, rel_err)
    splits = sorted(set(splits))
    if splits:
        arr = F.array(*[F.lit(float(s)) for s in splits])
        v = F.col(value_col).cast("double")
        # bucket id increases along the RANK direction; ties (v == split)
        # always fall on the same side, so equal values share a bucket
        cond = (lambda s: v < s) if descending else (lambda s: v > s)
        bucket = F.aggregate(
            arr, F.lit(0), lambda acc, s: acc + F.when(cond(s), 1).otherwise(0)
        )
    else:
        bucket = F.lit(0)  # degenerate: all values equal
    order = [
        F.col(value_col).desc() if descending else F.col(value_col).asc(),
        F.col(tiebreak_col).asc(),
    ]
    b = df.withColumn("__grk_bucket", bucket)
    w_in = Window.partitionBy("__grk_bucket").orderBy(*order)
    rows = b.withColumn("__grk_rin", F.row_number().over(w_in))
    counts = b.groupBy("__grk_bucket").agg(F.count(F.lit(1)).alias("__grk_cnt"))
    w_off = Window.orderBy("__grk_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__grk_bucket",
        F.coalesce(F.sum("__grk_cnt").over(w_off), F.lit(0)).alias("__grk_off"),
        F.sum("__grk_cnt").over(Window.partitionBy()).alias(out_n),
    )
    return (
        rows.join(F.broadcast(offsets), "__grk_bucket")
        .withColumn(out_rank, F.col("__grk_off") + F.col("__grk_rin"))
        .drop("__grk_bucket", "__grk_rin", "__grk_off")
    )


def ntile_from_rank(rank, n, k: int):
    """NTILE(k) as arithmetic on an exact (rank, n) pair — Spark/DuckDB
    semantics: the first n%k tiles take one extra row. Requires n >= k
    (the otherwise-branch divides by base = n//k)."""
    base, rem = F.floor(n / k), n % k
    big = rem * (base + 1)
    return (
        F.when(rank <= big, F.floor((rank + base) / (base + 1)))
        .otherwise(rem + F.floor((rank - big + base - 1) / base))
        .cast("int")
    )
