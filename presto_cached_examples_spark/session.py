"""SparkSession factory — the engine's bring-up path.

Reference analog (SURVEY.md §2.A R1-R4): `PicoPlusPsram::getInstance()`
(/root/reference/src/PicoPlusPsram.h:61-65) lazily constructs the one
allocator instance, and its ctor sizes/tunes the memory + IO path
(/root/reference/src/PicoPlusPsram.cpp:14-29,107-203). Here the same
role is played by `SparkSession.builder.getOrCreate()` plus a fixed set
of configs sized for the target: AQE for runtime re-planning, Arrow for
the pandas boundary, shuffle partitions matched to parallelism rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "presto-cached-examples-spark"


def default_cpus() -> str:
    """Parallelism knob; the driver exports SPARK_GRAFT_CPUS for bench."""
    return os.environ.get("SPARK_GRAFT_CPUS", "*")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(
    app_name: str = DEFAULT_APP_NAME,
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session with scale-aware defaults.

    The configs mirror the reference's init-time IO tuning (clock
    divisor / page-break sizing, PicoPlusPsram.cpp:139-170) as the
    Spark-native knobs: partition byte sizing, AQE coalescing/skew
    handling, broadcast threshold.
    """
    cpus = str(cpus if cpus is not None else default_cpus())
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as int64 ns and convert at the catalog edge
        # (sources/catalog.py) — same µs truncation DuckDB applies.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
