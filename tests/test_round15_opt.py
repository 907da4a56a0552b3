"""Round-15 optimization pins.

Each optimization this round REWROTE an operator's internals while
promising bit-identical values; the oracle gate proves result equality
end-to-end, and these tests pin the specific internal equivalences the
rewrites lean on, so a future refactor (or Spark upgrade) that breaks
one fails HERE with a named invariant instead of as an opaque oracle
hash mismatch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY


def test_langid_fold_matches_greatest_when_chain(spark):
    """Change 15: the single-evaluation argmax fold must reproduce the
    old greatest()+when-chain guess — including the en>de>es>fr>zh tie
    order — on every fixture document."""
    from presto_cached_examples_spark.llm.text import _LANG_MARKERS, _langid_best
    from presto_cached_examples_spark.sources.catalog import load_table

    d = load_table(spark, SF_TINY, "documents")
    toks = F.split("text", " ")

    def count_marker(m):
        return F.size(F.filter(toks, lambda t: t == F.lit(m)))

    scores = {
        lang: sum((count_marker(m) for m in markers), F.lit(0))
        for lang, markers in _LANG_MARKERS.items()
    }
    top = F.greatest(*scores.values())
    old_guess = (
        F.when(scores["en"] == top, "en")
        .when(scores["de"] == top, "de")
        .when(scores["es"] == top, "es")
        .when(scores["fr"] == top, "fr")
        .otherwise("zh")
    )
    best = _langid_best()
    rows = d.select(
        old_guess.alias("old_guess"),
        top.cast("int").alias("old_top"),
        best["l"].alias("new_guess"),
        best["s"].cast("int").alias("new_top"),
    ).collect()
    assert rows, "fixture produced no documents"
    for r in rows:
        assert r.old_guess == r.new_guess and r.old_top == r.new_top, r


def test_langid_fold_tie_order_synthetic(spark):
    """The fold keeps the FIRST maximum in array order; with every
    language scoring zero (no markers present) the guess must be 'en'
    — the head of the old when-chain."""
    from presto_cached_examples_spark.llm.text import _langid_best

    df = spark.createDataFrame([("xyzzy quux",)], "text string")
    row = df.select(_langid_best().alias("b")).collect()[0]
    assert row.b.l == "en" and row.b.s == 0


def test_percentiles_approx_exact_side_matches_percentile(spark):
    """Change 14: the cent-histogram rank-lookup quantiles must equal
    Spark's own exact percentile aggregate bit-for-bit at 0.49/0.50/
    0.51 per return flag (the interpolation replays
    Percentile.getPercentile's double arithmetic)."""
    from presto_cached_examples_spark.registry import queries
    from presto_cached_examples_spark.sources.catalog import load_table

    li = load_table(spark, SF_TINY, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0)
    ref = {
        r["l_returnflag"]: r["ex"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                cents, F.array(F.lit(0.49), F.lit(0.50), F.lit(0.51))
            ).alias("ex")
        )
        .collect()
    }
    got = {
        r["l_returnflag"]: (r["exact_p50"], r["within_band"])
        for r in queries()["q_agg_percentiles_approx"](spark, SF_TINY).collect()
    }
    assert set(got) == set(ref)
    for flag, ex in ref.items():
        # the query's exact_p50 must be the round-2dp of Spark's own
        # exact median (bit-identical interpolation upstream of the round)
        assert got[flag][0] == round(ex[1], 2) / 100, (flag, got[flag], ex)
        assert got[flag][1] is True


def test_simhash_fold_matches_per_bit_votes(spark):
    """Change 9: the one-pass vote fold must equal an independent
    per-bit recomputation of the SimHash signature (python md5
    reference) on a sample of fixture docs."""
    import hashlib

    from presto_cached_examples_spark.llm.dedup import simhash_signatures
    from presto_cached_examples_spark.sources.catalog import load_table

    sigs = {
        r.doc_id: r.sig
        for r in simhash_signatures(spark, SF_TINY).filter(F.col("doc_id") < 20).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_TINY, "documents")
        .filter(F.col("doc_id") < 20)
        .collect()
    }
    assert sigs and set(sigs) == set(docs)
    for doc_id, text in docs.items():
        toks = list(dict.fromkeys(text.split(" ")))  # array_distinct order
        votes = [0] * 64
        for t in toks:
            hx = hashlib.md5(t.encode()).hexdigest()
            h = (int(hx[:8], 16) << 32) | int(hx[8:16], 16)  # _md5_long, as unsigned bits
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        sig = 0
        for j in range(64):  # MSB-first pack: bit j lands at position 63-j
            sig = (sig << 1) | (1 if votes[j] > 0 else 0)
        # python int -> signed 64-bit long
        if sig >= 1 << 63:
            sig -= 1 << 64
        assert sig == sigs[doc_id], doc_id


def test_agg_approx_two_level_matches_exact_distinct(spark):
    """Change 7: count over the deduped (event_type, user_id) grain
    must equal countDistinct over raw events, and the HLL band flag
    must hold."""
    from presto_cached_examples_spark.registry import queries
    from presto_cached_examples_spark.sources.catalog import load_table

    ev = load_table(spark, SF_TINY, "events")
    ref = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: (r["exact_users"], r["within_5pct"])
        for r in queries()["q_agg_approx"](spark, SF_TINY).collect()
    }
    assert set(got) == set(ref)
    for et, n in ref.items():
        assert got[et] == (n, True), (et, got[et], n)


def test_sole_return_two_level_matches_count_distinct(spark):
    """Change 16: the (order, supplier)-grain counts must equal the old
    countDistinct pair on every order."""
    from presto_cached_examples_spark.sources.catalog import load_table

    li = load_table(spark, SF_TINY, "lineitem")
    ref = (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_ret_supp"),
        )
    )
    grain = li.groupBy(F.col("l_orderkey").alias("k"), "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_ret")
    )
    new = grain.groupBy("k").agg(
        F.count("l_suppkey").alias("n_supp"),
        F.sum(
            F.when(F.col("l_suppkey").isNotNull(), F.col("has_ret")).otherwise(0)
        ).alias("n_ret_supp"),
    )
    diff = ref.join(new, "k").filter(
        (ref["n_supp"] != new["n_supp"]) | (ref["n_ret_supp"] != new["n_ret_supp"])
    )
    assert diff.count() == 0
