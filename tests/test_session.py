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


# ---- input-size-gated persistence (plans/persistence.py) ----------------

from presto_cached_examples_spark.plans import persistence
from presto_cached_examples_spark.registry import all_specs
from tests.conftest import SF_TINY


def _gate_conf(spark, mode):
    spark.conf.set(persistence.MODE_CONF, mode)


def test_persist_gate_auto_off_at_fixture_scale(spark):
    """auto mode: every test fixture (<= ~18 MB) sits far below the
    256 MiB threshold, so maybe_persist returns the frame unchanged and
    tracks nothing — the fixture-scale plan re-scans tiny parquet
    instead of paying an InMemoryRelation build (NOTES r9 item 6)."""
    _gate_conf(spark, "auto")
    df = spark.range(10)
    out = persistence.maybe_persist(df, SF_TINY)
    assert out is df
    assert not df.storageLevel.useMemory
    assert persistence.release_intermediates(spark) == 0


def test_persist_gate_auto_on_for_big_or_remote_input(spark):
    """auto mode flips on when the input dir exceeds the threshold and
    for non-local paths (object stores can't be stat'ed — assume
    production scale)."""
    _gate_conf(spark, "auto")
    spark.conf.set(persistence.MIN_BYTES_CONF, "1")  # fixtures now "big"
    try:
        assert persistence.persist_enabled(spark, SF_TINY)
    finally:
        spark.conf.set(persistence.MIN_BYTES_CONF, str(persistence.DEFAULT_MIN_BYTES))
    assert persistence.persist_enabled(spark, "s3://bucket/snapshots/ingest")


def test_persist_gate_on_tracks_and_releases(spark):
    """on mode: the frame is persisted (lazy) and tracked per session;
    release_intermediates unpersists everything exactly once."""
    _gate_conf(spark, "on")
    try:
        df = spark.range(10)
        out = persistence.maybe_persist(df, SF_TINY)
        assert out.storageLevel.useMemory
        assert persistence.release_intermediates(spark, blocking=True) == 1
        assert not out.storageLevel.useMemory
        assert persistence.release_intermediates(spark) == 0
    finally:
        _gate_conf(spark, "auto")


def test_persist_gate_rejects_unknown_mode(spark):
    import pytest as _pytest

    _gate_conf(spark, "maybe")
    try:
        with _pytest.raises(ValueError):
            persistence.persist_enabled(spark, SF_TINY)
    finally:
        _gate_conf(spark, "auto")


def test_persist_gate_parity(spark, duck):
    """The gate is a semantic no-op: one representative gated query per
    shape (funnel chain, (day,user) expansion, bounded rollup) hashes
    identically against its oracle with the gate forced on and off."""
    from tests.util import assert_frames_match

    specs = all_specs()
    for name in ("q_events_funnel", "q_rolling_wau", "q_priority_shift"):
        spec = specs[name]
        for mode in ("off", "on"):
            _gate_conf(spark, mode)
            try:
                assert_frames_match(
                    spec.fn(spark, SF_TINY), duck.sql(spec.oracle), context=f"{name}[{mode}]"
                )
            finally:
                _gate_conf(spark, "auto")
        persistence.release_intermediates(spark, blocking=True)
