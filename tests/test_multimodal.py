"""Multimodal plumbing tests: the mapInPandas feature extractor's
schema, determinism, and stub behavior (llm/multimodal.py)."""

from __future__ import annotations

import pytest

from presto_cached_examples_spark.llm.multimodal import (
    FEATURE_SCHEMA,
    decode_payload,
    media_table,
    q_mm_features,
)
from tests.conftest import SF_TINY


def test_features_schema_and_rows(spark):
    df = q_mm_features(spark, SF_TINY)
    assert df.schema == FEATURE_SCHEMA
    rows = df.collect()
    assert len(rows) == 500  # documents fixture is 500 rows at every sf
    r = {row.doc_id: row for row in rows}[0]
    assert r.n_bytes > 0 and 0 <= r.mean_byte <= 255
    hist = [r[f"hist_{b}"] for b in range(8)]
    assert sum(hist) == r.n_bytes and all(h >= 0 for h in hist)


def test_features_deterministic(spark):
    a = sorted(map(tuple, q_mm_features(spark, SF_TINY).collect()))
    b = sorted(map(tuple, q_mm_features(spark, SF_TINY).collect()))
    assert a == b


def test_features_match_source_bytes(spark):
    """n_bytes from the decoder equals octet_length computed JVM-side."""
    feats = q_mm_features(spark, SF_TINY).select("doc_id", "n_bytes")
    meta = media_table(spark, SF_TINY).select("doc_id", "meta.n_bytes")
    mismatch = feats.exceptAll(meta)
    assert mismatch.count() == 0


def test_decode_stub_fails_loudly():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\xff\xd8\xff", "image/jpeg")



def test_resize_payload_bounded_and_deterministic(spark):
    from presto_cached_examples_spark.llm import multimodal as mm
    from presto_cached_examples_spark.registry import queries

    out = queries()["q_mm_resize"](spark, SF_TINY).collect()
    assert out
    for r in out:
        assert r.new_bytes <= mm._RESIZE_TARGET
        assert r.new_bytes * 2 == len(r.payload_hex)  # hex pair per byte
        assert r.orig_bytes >= r.new_bytes
    # deterministic: python reference agrees on one sample
    sample = out[0]
    src = {m.doc_id: bytes(m.payload) for m in mm.media_table(spark, SF_TINY).collect()}
    assert bytes.fromhex(sample.payload_hex) == mm.resize_payload(src[sample.doc_id], "bytes")


def test_frame_sampling_expands_rows(spark):
    from presto_cached_examples_spark.llm import multimodal as mm
    from presto_cached_examples_spark.registry import queries

    rows = queries()["q_mm_frames"](spark, SF_TINY).collect()
    assert rows
    docs = {}
    for r in rows:
        assert r.frame_idx % mm._FRAME_STRIDE == 0
        assert len(r.frame_hex) <= 2 * mm._FRAME_BYTES
        docs.setdefault(r.doc_id, []).append(r)
    # a doc with n frames emits ceil(n/stride) rows
    for doc_rows in docs.values():
        n = doc_rows[0].n_frames
        assert len(doc_rows) == -(-n // mm._FRAME_STRIDE)
    # expansion really happened: more rows than docs
    assert len(rows) > len(docs)
