"""Salted-join tests: result-identical to the plain join, and the
shuffle actually spreads — the hot key's rows leave on more than one
sub-key."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from presto_cached_examples_spark.operators.skew import salted_join
from presto_cached_examples_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def test_salted_equals_plain_join(spark):
    o = load_table(spark, SF_TINY, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_TINY, "customer").select("c_custkey", "c_nationkey")
    plain = sorted(o.join(c, o.o_custkey == c.c_custkey).collect())
    salted = sorted(
        salted_join(o, c, keys=[("o_custkey", "c_custkey")], n_salts=8).collect()
    )
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    """Build a deliberately skewed side (one key holds every row) and
    check the derived salt fans it out across multiple sub-keys."""
    hot = spark.range(1000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    salt = F.pmod(F.xxhash64("payload"), F.lit(8))
    n_subkeys = hot.select(salt.alias("s")).distinct().count()
    assert n_subkeys == 8  # the single hot key now occupies 8 shuffle keys


def test_salted_outer_join_keeps_unmatched(spark):
    """Left join through salting must keep big-side rows with no match
    exactly once (the replicated small side must not duplicate them)."""
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "X")], "k2 long, w string")
    out = salted_join(big, small, keys=[("k", "k2")], n_salts=4, how="left")
    rows = {(r.k, r.w) for r in out.collect()}
    assert rows == {(1, "X"), (2, None), (3, None)}
    assert out.count() == 3


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit each unmatched small-side row once per salt
    replica — the API must refuse rather than silently duplicate."""
    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(9, "X")], "k2 long, w string")
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(big, small, keys=[("k", "k2")], n_salts=4, how=how)
