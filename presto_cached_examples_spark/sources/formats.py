"""Multi-format scan sources and layout-aware sinks (C7).

Reference ground truth: the file layer is open/read/getc/tell/seek over
FatFS byte streams with no schema at all
(/root/reference/src/fileio.cpp:8-44). The engine generalizes that to
schema-ful, format-aware scans — and, because layout decides cost at
100 TB, to two write-side layouts the reference cannot express:

- partitioned parquet — directory-level partition pruning: a filter on
  the partition column skips whole directories before any IO
  (PartitionFilters in the scan node, asserted in tests/test_sources.py).
- bucketed tables — both join sides pre-hashed into the same number of
  buckets on the join key, so the join runs with ZERO shuffle: the
  sort-merge join reads co-located buckets directly. This is the
  at-rest analog of the reference's cache-tier idea (C1): pay the
  layout cost once at write time, then every subsequent join of the
  100 TB fact tables skips its Exchange.

Explicit schemas everywhere: the engine core never infers (SURVEY.md
§1.2) — inference is allowed only as an opt-in at the ingest boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "orc", "csv", "json", "text")


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Scan files of any supported format with an explicit schema.

    CSV/JSON require `schema` (schema inference means an extra full
    pass over the data — never acceptable on the 100 TB path). Text
    yields a single `value` column. Parquet carries its own schema in
    the footer.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} scans require an explicit schema (no inference in core)")
        reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    compression: str | None = None,
    **options: str,
) -> None:
    """Write a DataFrame as plain files (one directory per call).

    `compression` passes through to the format writer (parquet/orc:
    e.g. zstd, snappy; csv/json/text: gzip …) — at 100 TB the codec is
    a first-order cost knob: zstd typically halves storage and scan
    bytes vs snappy for a few % extra CPU."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {_FORMATS}")
    writer = df.write.format(fmt).mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write parquet hive-partitioned by `partition_cols`.

    Scans that filter on a partition column prune at the directory
    level (PartitionFilters) — the static partition-pruning half of the
    §4.2 built-ins; dynamic partition pruning extends it through joins.
    Choose low-cardinality, filter-frequent columns (event date, source,
    language) — at 100 TB a date partition keeps any daily query's scan
    to ~1/365 of the table before a single row is read.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed table: rows pre-hashed on
    `bucket_cols` into `n_buckets` files per partition.

    Two tables bucketed on the same key with the same bucket count join
    with no Exchange on either side (asserted in tests/test_sources.py)
    — the shuffle is paid once here, at write time, instead of on every
    query. `sort_cols` additionally orders within buckets so the
    sort-merge join skips its sort. Bucket count is a layout contract:
    pick it for the target scale (e.g. 4096 for a 100 TB fact table →
    ~25 GB/bucket-spread) and keep it identical across co-joined tables.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
