"""Source/sink layer tests (C7): format round-trips, partition pruning,
and the bucketed shuffle-free join (the write-time layout contract)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from presto_cached_examples_spark.sources import formats
from presto_cached_examples_spark.sources.catalog import SCHEMAS, load_table
from tests.conftest import SF_TINY


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_csv_json_round_trip(spark, tmp_path):
    """CSV and JSON scans with explicit schemas reproduce the parquet
    source exactly (modulo the timestamp column, carried as ISO text in
    csv to sidestep format-specific timestamp dialects)."""
    src = load_table(spark, SF_TINY, "customer")
    expected = sorted(src.collect())
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"customer_{fmt}")
        formats.write_files(src, path, fmt=fmt)
        back = formats.read_files(spark, path, fmt=fmt, schema=SCHEMAS["customer"])
        assert back.schema == src.schema
        assert sorted(back.collect()) == expected


def test_text_round_trip(spark, tmp_path):
    src = load_table(spark, SF_TINY, "documents").select(F.col("text").alias("value"))
    path = str(tmp_path / "docs_text")
    formats.write_files(src, path, fmt="text")
    back = formats.read_files(spark, path, fmt="text")
    assert back.columns == ["value"]
    assert back.count() == src.count()


def test_partitioned_write_prunes(spark, tmp_path):
    """A filter on the partition column must prune at the directory
    level: PartitionFilters carries the predicate and the row count
    matches the partition, proving non-matching directories are never
    read."""
    o = load_table(spark, SF_TINY, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    formats.write_partitioned(o, path, ["o_year"])

    scan = formats.read_files(spark, path).filter(F.col("o_year") == 1996)
    p = plan_of(scan)
    assert "PartitionFilters" in p
    assert "o_year" in p.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert scan.count() == o.filter(F.col("o_year") == 1996).count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key with equal bucket counts →
    the join plans with ZERO Exchange (shuffle paid once at write
    time). Broadcast is disabled so the assert targets the sort-merge
    path a 100 TB fact-fact join would take."""
    o = load_table(spark, SF_TINY, "orders")
    li = load_table(spark, SF_TINY, "lineitem")
    formats.write_bucketed(
        o, "b_orders", ["o_orderkey"], 4, path=str(tmp_path / "b_orders"),
        sort_cols=["o_orderkey"],
    )
    formats.write_bucketed(
        li, "b_lineitem", ["l_orderkey"], 4, path=str(tmp_path / "b_lineitem"),
        sort_cols=["l_orderkey"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        p = plan_of(joined)
        assert "Exchange" not in p, "bucketed join still shuffles"
        # and it is the co-located sort-merge join, not a fallback
        assert "SortMergeJoin" in p
        assert joined.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_orc_round_trip(spark, tmp_path):
    """ORC is the second columnar at-rest format; scans carry the same
    pushdown machinery as parquet."""
    src = load_table(spark, SF_TINY, "customer")
    path = str(tmp_path / "customer_orc")
    formats.write_files(src, path, fmt="orc")
    back = formats.read_files(spark, path, fmt="orc")
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())
    scan = back.filter(F.col("c_acctbal") > 5000)
    assert "PushedFilters" in plan_of(scan)


def test_zstd_compression_round_trip(spark, tmp_path):
    src = load_table(spark, SF_TINY, "orders")
    path = str(tmp_path / "orders_zstd")
    formats.write_files(src, path, fmt="parquet", compression="zstd")
    import glob

    assert glob.glob(f"{path}/*.zstd.parquet"), "zstd codec not applied"
    back = formats.read_files(spark, path)
    assert back.count() == src.count()
