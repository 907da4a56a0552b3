"""UDF / UDAF / UDTF surface (SURVEY.md §2.B rows udf_pack_pen,
udaf_weighted_avg, udtf_explode_props).

Each is Arrow-vectorized (pandas batches — never row-at-a-time Python)
and oracle-checked against a pure-SQL twin, proving the UDF boundary
produces exactly what the JVM expression would.

Scale note: a pandas UDF costs one Arrow serialize/deserialize per
batch (~10k rows here). That's the acceptable slow path; the unusable
one is `spark.udf.register` row-at-a-time Python, which this engine
never uses.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table


@F.pandas_udf(T.LongType())
def pack_pen(r: pd.Series, g: pd.Series, b: pd.Series) -> pd.Series:
    """RGB→RGB565 bit pack as a vectorized pandas UDF — the reference's
    `create_pen(r,g,b)` (/root/reference/src/DoublePsramBuffer480x480.cpp:125)
    expressed over Arrow batches: ((r&31)<<11) | ((g&63)<<5) | (b&31).
    (pandas Series lack <<, so the shifts are exact multiplications.)"""
    return (r & 31) * 2048 + (g & 63) * 32 + (b & 31)


@register(
    "udf_pack_pen",
    category="udf",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(
        ((CAST(l_linenumber * 4 AS BIGINT) & 31) << 11)
        | ((CAST(l_suppkey % 64 AS BIGINT) & 63) << 5)
        | (CAST(l_partkey % 32 AS BIGINT) & 31)
      AS BIGINT) AS pen
    FROM lineitem
    """,
)
def udf_pack_pen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches) vs the bitwise-SQL oracle —
    identical output to q_math_funcs' JVM-side pack."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pack_pen(
            (F.col("l_linenumber").cast("long") * 4),
            F.col("l_suppkey") % 64,
            F.col("l_partkey") % 32,
        ).alias("pen"),
    )


@register(
    "udaf_weighted_avg",
    category="udf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped weighted average via a pandas grouped-agg UDF, oracle =
    SUM(x*w)/SUM(w). The UDAF path is applyInPandas-style grouped Arrow
    batches; partial aggregation is unavailable to Python UDAFs, which
    is exactly why engine queries prefer built-ins."""

    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price")
    )


@register(
    "udtf_explode_props",
    category="udf",
    oracle="""
    -- DuckDB 1.0 has no json_each; the fixture's props always hold the
    -- single key 'k' (verified over all rows), so the oracle enumerates
    -- it. The Spark side explodes arbitrary keys.
    SELECT event_id,
           'k'                                                AS prop_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT)  AS prop_value
    FROM events
    """,
)
def udtf_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating surface: one row per parsed JSON key/value of
    events.props. No separate UDTF machinery needed — explode(from_json)
    is the Spark-native form (SURVEY.md §2.B), fully JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.explode(F.from_json("props", T.MapType(T.StringType(), T.LongType()))).alias(
            "prop_key", "prop_value"
        ),
    )
    return parsed
