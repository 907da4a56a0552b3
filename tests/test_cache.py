"""Cache-tier engine-feature checks (SURVEY.md §2.B end): identical
results cached vs uncached, the hit observable in the plan, and the
allocator surface (pin/resize/free/size/available) behaving like the
reference's R5-R10."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from presto_cached_examples_spark.plans.cache import TIERS, CacheTiers
from presto_cached_examples_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


@pytest.fixture()
def tiers(spark):
    t = CacheTiers(spark)
    yield t
    for name in t.names():
        t.free(name)


def test_cached_equals_uncached_and_hit_in_plan(spark, tiers):
    """C1 equivalence: pinning must never change results, and the
    pinned relation must re-enter downstream plans via the in-memory
    scan (the RAM-cache read path)."""
    src = load_table(spark, SF_TINY, "orders")
    agg = lambda df: (  # noqa: E731
        df.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    uncached = sorted(agg(src).collect())

    pinned = tiers.pin("orders_hot", src, tier="hot")
    assert "InMemoryTableScan" in plan_of(agg(pinned))
    assert sorted(agg(pinned).collect()) == uncached


def test_tiers_map_to_storage_levels(spark, tiers):
    """One plan can hold only one storage level at a time (Spark's
    CacheManager keys on the canonicalized plan), so pin/assert/free
    per tier."""
    df = load_table(spark, SF_TINY, "region")
    for tier in TIERS:
        pinned = tiers.pin(f"r_{tier}", df, tier=tier, eager=False)
        assert pinned.storageLevel == TIERS[tier]
        tiers.free(f"r_{tier}")


def test_resize_preserves_contents(spark, tiers):
    """Realloc analog: re-layout changes partitioning, never data."""
    df = load_table(spark, SF_TINY, "customer")
    tiers.pin("cust", df, tier="warm")
    before = sorted(tiers.get("cust").collect())
    resized = tiers.resize("cust", 2)
    assert resized.rdd.getNumPartitions() == 2
    assert sorted(resized.collect()) == before


def test_free_releases(spark, tiers):
    df = load_table(spark, SF_TINY, "nation")
    pinned = tiers.pin("nat", df, tier="warm")
    assert tiers.size_of("nat")["partitions"] >= 1
    tiers.free("nat")
    assert "nat" not in tiers.names()
    assert pinned.storageLevel.useMemory is False  # StorageLevel.NONE

    # double-free is an error, like any allocator
    with pytest.raises(KeyError):
        tiers.free("nat")


def test_available_reports_headroom(spark, tiers):
    stats = tiers.available()
    assert stats["max_bytes"] > 0
    assert 0 < stats["free_bytes"] <= stats["max_bytes"]
