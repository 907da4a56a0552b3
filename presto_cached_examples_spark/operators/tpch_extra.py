"""Deep TPC-H-style analytics (round-3 block, extends SURVEY.md §2.C).

Completes the classic decision-support shapes expressible over the
driver fixtures (no partsupp table, no commit/receipt dates): Q7/Q8
nation-volume and market-share joins, Q13 distribution, Q15 argmax
view join, Q17 correlated-average filter, Q18 having-IN fact
self-aggregation, Q19 disjunctive predicates, Q21-style multi-line
blame analysis, Q22 anti-join opportunity scan.

All plans follow the engine discipline: dimension sides broadcast,
filters reach scans before joins, doubles ROUND(..., 2) on both
engines, LIMIT queries totally ordered with explicit tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table


@register(
    "q_volume_shipping",
    category="join",
    oracle="""
    SELECT sn.supp_nation, cn.cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN (SELECT s_suppkey, n_name AS supp_nation
          FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey) sn
      ON sn.s_suppkey = l.l_suppkey
    JOIN (SELECT c_custkey, n_name AS cust_nation
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) cn
      ON cn.c_custkey = o.o_custkey
    WHERE ((sn.supp_nation = 'NATION_1' AND cn.cust_nation = 'NATION_2')
        OR (sn.supp_nation = 'NATION_2' AND cn.cust_nation = 'NATION_1'))
      AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) <  DATE '1998-01-01'
    GROUP BY sn.supp_nation, cn.cust_nation, CAST(YEAR(l.l_shipdate) AS INT)
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: bilateral trade revenue between
    one nation pair per ship year. Supplier and customer sides each
    pre-join their nation dimension (broadcast) so the disjunctive
    nation-pair predicate becomes a plain filter BEFORE the fact joins.
    The nation dim is a forced broadcast; the supplier/customer slices
    grow with SF, so they carry no forced hint — AQE broadcasts them
    while they fit and falls back to shuffle join beyond that."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    sn = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cn = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_mkt_share",
    category="join",
    oracle="""
    SELECT o_year,
           ROUND(ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END), 2)
                 / ROUND(SUM(volume), 2), 4) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN part p      ON p.p_partkey = l.l_partkey
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation n1   ON n1.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation n2   ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o.o_orderdate AS DATE) <  DATE '1998-01-01'
    ) v
    GROUP BY o_year
    """,
)
def q_mkt_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: one nation's fraction of
    regional revenue for one part type, per order year. Every dimension
    slice (part slice, supplier+nation, customer+nation+region slice)
    shrinks before the fact scan is touched; the bounded dims (nation,
    region) are forced broadcasts, while the SF-proportional slices are
    left to AQE, which promotes them to broadcast exactly while they
    fit (at fixture scale: always) instead of OOMing the driver at
    100 TB. Both revenue sums round to cents BEFORE the division so
    summation-order drift cannot flip the 4th decimal of the share."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    v = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_asia, o.o_custkey == F.col("c_custkey"))
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "nation")
    )
    return v.groupBy("o_year").agg(
        F.round(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0)), 2
            )
            / F.round(F.sum("volume"), 2),
            4,
        ).alias("mkt_share")
    )


@register(
    "q_cust_order_dist",
    category="aggregation",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) co
    GROUP BY c_count
    """,
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order distribution: how many customers
    placed exactly k non-urgent orders (k=0 included via the outer
    join). Two aggregations: the first shuffles on custkey (same key as
    the join — one exchange reused), the second is a tiny re-agg on the
    count value. COUNT(o_orderkey) over the null-extended rows gives
    the correct 0 for order-less customers on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_top_supplier",
    category="join",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: the supplier(s) achieving the
    maximum quarterly revenue. The revenue "view" aggregates once; the
    scalar max is a 1-row broadcast joined back (no second scan of
    lineitem, no window over the whole table). Revenue is rounded to
    cents BEFORE the max comparison on both engines so ULP noise can't
    flip the argmax."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    # mx is a 1-row aggregate — forced broadcast; supplier grows with
    # SF, so no hint (AQE promotes it while it fits)
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_small_qty_revenue",
    category="subquery",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: lineitems of one brand
    whose quantity is below half the part's average order quantity.
    The correlated AVG decorrelates into one per-part aggregate joined
    back on partkey; restricting to the brand's parts FIRST means the
    threshold aggregate only shuffles the brand slice, not all 100 TB
    of lineitem. The brand slice and per-part thresholds grow with SF,
    so neither carries a forced broadcast hint — AQE decides."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem")
    brand_items = li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    thresh = brand_items.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_thresh")
    )
    return (
        brand_items.join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_big_orders",
    category="subquery",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: top-100 orders whose total
    quantity exceeds a threshold, with their customer. The HAVING
    subquery is the same fact aggregation the outer query needs, so it
    is computed ONCE and joined back; no second lineitem scan. The
    filtered key set is selective but still SF-proportional, so it
    carries no forced broadcast hint (AQE promotes it while it fits).
    The LIMIT is TakeOrderedAndProject with an explicit orderkey
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("total_qty"))
    big = per_order.filter(F.col("total_qty") > 250)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q_disjunctive_revenue",
    category="aggregation",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: three OR'd
    brand/size/quantity clauses spanning both join sides. The
    join-independent parts of the disjunction (brand ∈ {1,2,3}, the
    quantity hull 1-30) are factored out and pushed to each scan so
    the hash join probes only candidate rows; the full disjunction
    applies post-join. The brand slice of part is SF-proportional, so
    no forced broadcast — AQE decides per run."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_sole_return_supplier",
    category="subquery",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_ret_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o     ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN per_order po ON po.l_orderkey = l1.l_orderkey
    JOIN supplier s   ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R' AND po.n_supp > 1 AND po.n_ret_supp = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style sole-blame analysis: suppliers whose returned
    lines sit on finished multi-supplier orders where NO other supplier
    had a return. The classic EXISTS / NOT EXISTS pair of correlated
    self-joins collapses into ONE per-order aggregate (distinct
    suppliers, distinct returning suppliers) joined back — at 100 TB
    that replaces two extra fact shuffles with one, and the blame
    condition becomes a plain filter. Semantics are identical:
    `NOT EXISTS other returning supplier` ⇔ n_ret_supp = 1 given l1
    itself returns; `EXISTS other supplier` ⇔ n_supp > 1."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("n_ret_supp"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q_global_sales_opp",
    category="subquery",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 3, 7, 12, 18)
    )
    SELECT p.c_nationkey AS cntry, COUNT(*) AS numcust,
           ROUND(SUM(p.c_acctbal), 2) AS totacctbal
    FROM pool p
    WHERE p.c_acctbal > (SELECT AVG(c_acctbal) FROM pool WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY p.c_nationkey
    """,
)
def q_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style sales opportunity: well-funded customers in
    selected nations with no URGENT order. (The classic "never ordered"
    predicate is vacuous on the driver fixtures — every customer has
    orders at every SF — so the anti-join target is the urgent-order
    slice, which keeps the result non-empty at sf0.001/0.01/0.1 and the
    parity check meaningful; ADVICE r2.) The scalar average is one tiny
    aggregate broadcast back; the NOT EXISTS is a left-anti join
    against the filtered orders key projection — both scale-safe (the
    anti join shuffles only custkeys). Customer pool filter reaches the
    scan."""
    pool = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 7, 12, 18)
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o_keys, pool.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_local_supplier_volume",
    category="join",
    oracle="""
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local supplier volume: revenue from orders where
    the supplier and the customer share a nation, per nation of one
    region, one order year. The interesting join is the NON-key equality
    s_nationkey = c_nationkey riding on the l_suppkey equi-join — the
    correlated-dimension pattern.

    Scale: the date filter prunes orders at the scan; nation⨝region
    collapses to a broadcast ≤25-row allow-list applied to supplier
    BEFORE the fact joins, so lineitem only shuffles twice (orderkey,
    then suppkey) and the nation equality is a cheap post-join filter
    on already-joined ints. Revenue rounds at 2dp on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(asia_n),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_product_profit",
    category="join",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(l.l_shipdate) AS INT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit: per supplier-nation,
    per ship-year profit on one product family, with cost modeled as
    60% of retail price x quantity (the fixture has no partsupp
    supplycost — the adaptation is documented, the join/agg shape is
    Q9's).

    Scale: the LIKE filter prunes part before the join, and the
    filtered part slice plus supplier->nation map are the small sides —
    part carries no forced hint (it grows with SF; AQE broadcasts it
    while it fits), nation is a forced broadcast. lineitem shuffles
    once for the final (nation, year) aggregate; profit is a map-side
    expression. ROUND(.,2) on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )
