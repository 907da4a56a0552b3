"""Round-7 checks: warm-build laziness of the learned-quantizer
queries (VERDICT r6 item 4), Bloom filter self-sizing (ADVICE r6 item
1), and the anchored stale-sibling reaper (ADVICE r6 item 3).
"""

from __future__ import annotations

import os

from tests.conftest import SF_TINY
from tests.test_plans import build


def test_codebook_queries_build_without_jobs_when_warm(spark):
    """Plan construction for the learned-quantizer family must trigger
    ZERO Spark jobs once the per-session codebook cache is warm — the
    quantizer is an ingest-time artifact, and a caller that
    builds-but-doesn't-run (explain, plan audit, registration sweeps)
    must not pay training jobs on every build. The first build per
    (session, sf) is allowed to train (that's the documented
    build-time-action contract); every later build must be pure plan
    assembly."""
    warm = (
        "q_sim_topk_kmeans",
        "q_sim_pq",
        "q_sim_adc",
        "q_ann_pipeline",
        "q_ann_recall_sweep",
        "q_dedup_embed",
        "q_dedup_incremental_bloom",  # memoized standing-corpus count
    )
    # Warm every cache (codebooks, bloom count) — may run jobs.
    for name in warm:
        build(spark, name)

    sc = spark.sparkContext
    group = "r7-warm-build-probe"
    sc.setJobGroup(group, "warm builds must be job-free")
    try:
        for name in warm:
            build(spark, name)
    finally:
        sc.setJobGroup(None, None)
    ran = sc.statusTracker().getJobIdsForGroup(group)
    assert ran == [], f"warm plan-build ran Spark jobs: {ran}"


def test_bloom_bits_scale_with_corpus():
    """_bloom_bits keeps >= ~16 bits/key (so the advertised pruning
    survives corpus growth instead of saturating at ~15-20k keys),
    floors at the fixture-tuned 65536, and stays a power of two."""
    from presto_cached_examples_spark.llm.dedup import (
        _FP_BLOOM_BITS_FLOOR,
        _FP_BLOOM_BITS_PER_KEY,
        _bloom_bits,
    )

    assert _bloom_bits(0) == _FP_BLOOM_BITS_FLOOR
    assert _bloom_bits(1000) == _FP_BLOOM_BITS_FLOOR
    for n in (20_000, 1_000_000, 123_456_789):
        bits = _bloom_bits(n)
        assert bits >= _FP_BLOOM_BITS_PER_KEY * n
        assert bits & (bits - 1) == 0, "not a power of two"
    # monotone
    assert _bloom_bits(10**6) <= _bloom_bits(10**7)


def test_dedup_incremental_bloom_matches_plain_anti_join(spark):
    """Self-sized Bloom prefilter must stay bit-identical to the plain
    anti-join (no false negatives), independent of the sizing change."""
    from presto_cached_examples_spark.registry import queries

    plain = {
        tuple(r) for r in queries()["q_dedup_incremental"](spark, SF_TINY).collect()
    }
    bloom = {
        tuple(r)
        for r in queries()["q_dedup_incremental_bloom"](spark, SF_TINY).collect()
    }
    assert {t[0] for t in plain} == {t[0] for t in bloom}


def test_reaper_is_anchored_to_fingerprint_token(tmp_path):
    """_reap_stale_siblings must only remove dirs whose name is exactly
    prefix + one <mtime_hex>_<size_hex> fingerprint token — a sibling
    fixture whose sftag EXTENDS this one (sf0_1 vs sf0_1_bak) must
    survive (ADVICE r6 item 3)."""
    from presto_cached_examples_spark.operators.scans import _reap_stale_siblings

    wh = str(tmp_path)
    keep = os.path.join(wh, "evolved_orders_sf0_1_aaaa_bbbb")
    stale = os.path.join(wh, "evolved_orders_sf0_1_1234_cafe")
    other_fixture = os.path.join(wh, "evolved_orders_sf0_1_bak_1234_cafe")
    unrelated = os.path.join(wh, "evolved_orders_sf0_1_notes")
    for d in (keep, stale, other_fixture, unrelated):
        os.makedirs(d)
    _reap_stale_siblings(wh, "evolved_orders_sf0_1_", keep)
    assert os.path.exists(keep)
    assert not os.path.exists(stale), "true stale sibling must be reaped"
    assert os.path.exists(other_fixture), "other fixture's artifacts reaped"
    assert os.path.exists(unrelated), "non-fingerprint dir reaped"
