"""C9: resource detection and derived sizing (session.py)."""

from __future__ import annotations

from presto_cached_examples_spark.session import derived_conf, detect_resources


def test_detect_resources_probes_runtime():
    res = detect_resources()
    assert res["cores"] >= 1
    assert res["available_mem_bytes"] > 0  # /proc/meminfo exists on linux


def test_derived_conf_scales_and_clamps():
    assert derived_conf(32, 128 << 30)["shuffle_partitions"] == 32
    assert derived_conf(1, 0)["shuffle_partitions"] == 4
    # plentiful memory -> split size capped at 128 MiB
    assert derived_conf(32, 128 << 30)["max_partition_bytes"] == 128 << 20
    # tight memory -> floor of 16 MiB, never zero
    assert derived_conf(64, 1 << 30)["max_partition_bytes"] == 16 << 20
    # unknown memory -> safe default
    assert derived_conf(8, 0)["max_partition_bytes"] == 128 << 20


def test_session_reflects_detected_sizing(spark):
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert parts >= 4
