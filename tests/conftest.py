"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_cached_examples_spark import get_session  # noqa: E402
from presto_cached_examples_spark.sources.catalog import TABLES, table_path  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="pce-spark-tests", cpus="4", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_TINY, t)}'")
    yield con
    con.close()
