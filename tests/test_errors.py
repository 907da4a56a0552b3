"""Negative-path tests. The reference handles errors with silent NULL
returns (/root/reference/src/fileio.cpp:12-17, PicoPlusPsram.cpp:119-121)
— a gap SURVEY.md §5.1 says not to inherit: every engine boundary here
fails loudly and typed."""

from __future__ import annotations

import pytest

from presto_cached_examples_spark.sources import formats
from presto_cached_examples_spark.sources.catalog import SCHEMAS, load_table
from tests.conftest import SF_TINY


def test_unknown_table_raises(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF_TINY, "no_such_table")


def test_unknown_format_raises(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        formats.read_files(spark, "/nowhere", fmt="avro")


def test_schemaless_csv_scan_rejected(spark):
    """Schema inference is banned in the engine core — a csv scan
    without an explicit schema must be refused, not silently inferred."""
    with pytest.raises(ValueError, match="explicit schema"):
        formats.read_files(spark, "/nowhere", fmt="csv")


def test_unknown_cache_tier_rejected(spark):
    from presto_cached_examples_spark.plans.cache import CacheTiers

    tiers = CacheTiers(spark)
    df = load_table(spark, SF_TINY, "region")
    with pytest.raises(ValueError, match="unknown tier"):
        tiers.pin("r", df, tier="plutonium")


def test_double_pin_rejected(spark):
    from presto_cached_examples_spark.plans.cache import CacheTiers

    tiers = CacheTiers(spark)
    df = load_table(spark, SF_TINY, "region")
    tiers.pin("r", df, eager=False)
    try:
        with pytest.raises(KeyError, match="already pinned"):
            tiers.pin("r", df)
    finally:
        tiers.free("r")


def test_schema_drift_detected(spark, tmp_path):
    """A fixture whose columns drift from the declared schema must fail
    the load-time assertion, not flow through with surprise columns."""
    bad = load_table(spark, SF_TINY, "region").withColumnRenamed("r_name", "region_name")
    path = str(tmp_path / "region.parquet")
    bad.write.parquet(path)
    with pytest.raises(ValueError, match="columns"):
        load_table(spark, str(tmp_path), "region")
