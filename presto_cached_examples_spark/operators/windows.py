"""Window-function operators (SURVEY.md §2.B: q_window_*, q_topk_group,
q_sort_limit).

Reference analog: the dx/dy delta vs previous poll (FT6236.h:110-113)
is exactly `lag() OVER (PARTITION BY id ORDER BY ts)` — C5/R16.

Scale posture: every window partitions by a high-cardinality key
(customer, user), so state per partition is bounded and the single
shuffle is by that key. Window orderings always carry a unique
tie-break column (orderkey / event_id) so results are total-ordered —
nondeterministic row_number over ties is a correctness bug at any
scale. The one global sort (q_sort_limit) is TakeOrderedAndProject:
per-partition top-N then a driver-side merge of N·partitions rows,
never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table


@register(
    "q_window_rank",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number of orders per customer by price.
    The (price DESC, orderkey) ordering is a total order, so all three
    ranking functions are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "q_window_lag",
    category="window",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - LAG(value) OVER w                       AS value_delta,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w)         AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas — the literal Spark form of the reference's
    dx/dy computation against the previous poll (FT6236.h:110-113).
    First event per user keeps NULL deltas (no prior state)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("us_since_prev"),
    )


@register(
    "q_window_frame",
    category="window",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT day, revenue,
           ROUND(AVG(revenue) OVER (
             ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ), 2) AS ma7
    FROM daily
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row centered moving average of daily revenue (C4's sliding
    dirty-region analog). Inner daily sums are rounded before the
    moving average so both engines average identical inputs.

    The unpartitioned window (Spark warns "No Partition Defined") is
    deliberate and safe: it runs over the DAILY aggregate, whose row
    count is bounded by the date domain (~2.4k rows for 7 years),
    never by order volume — the same domain-bounded argument as the
    distwindows sweep relations. The raw scan reduces via a two-phase
    aggregate first."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").cast("timestamp").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return daily.select("day", "revenue", F.round(F.avg("revenue").over(w), 2).alias("ma7"))


@register(
    "q_window_running",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer — cumulative frame ordered by a total
    order (orderdate, orderkey)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q_topk_group",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn AS k
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with deterministic tie-break. The
    row_number+filter shape lets Spark push the limit into the window
    (WindowGroupLimit) — per-group top-k without materializing full
    partitions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "k")
    )


@register(
    "q_sort_limit",
    category="sort",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N, total-order tie-broken. Physical plan is
    TakeOrderedAndProject: no full sort, no single-partition shuffle —
    each partition contributes its local top-20."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority")
    )
