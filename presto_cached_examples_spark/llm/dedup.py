"""Deduplication operators over `documents` (north-star family; SURVEY.md
§2.B q_dedup_*).

Four tiers, each with a different scale/recall trade-off:

- exact       — hash-groupBy on normalized text. One shuffle on a
                64-bit-ish key; the 100 TB workhorse.
- ngram       — exact token-set Jaccard via lossless prefix filtering
                (AllPairs/PPJoin candidate keys). SQL-checkable.
- minhash LSH — shingle → minhash signature → banded LSH bucket join →
                verify candidates with true Jaccard. Near-linear: the
                only quadratic work is within LSH buckets.
- simhash     — 64-bit signature, 4×16-bit multi-table banding,
                Hamming ≤ 3 pairs (lossless at that radius).

Oracle status (round 4): ALL five tiers are hash-checked against
DuckDB — minhash via the brute-force ground truth (its verify stage
filters on TRUE Jaccard, which DuckDB can recompute; the xxhash64
candidate stage only decides which pairs get verified, and is
exhaustive on the fixtures — see _DEDUP_NEAR_ORACLE), embed via the
reproducible learned quantizer, and simhash (rows-only through round
3) by re-deriving its per-token bits from md5 — a hash BOTH engines
evaluate bit-identically — so DuckDB replays the exact vote/band/
Hamming pipeline (_simhash_oracle). xxhash64 remains the right
production key where no oracle replays it (minhash permutations);
everywhere an output VALUE depends on hash bits, the engine uses md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.session import session_token
from presto_cached_examples_spark.sources.catalog import load_table, spread

# MinHash parameters: 64 permutations in 16 bands of 4 rows.
# P(candidate | jaccard=j) = 1-(1-j^4)^16: 0.64 at j=0.5, 0.89 at 0.6,
# 0.98 at 0.7 — a usable recall curve at the 0.5 verify threshold
# (4 bands of 4 gave only 0.23 at j=0.5).
_N_HASHES = 64
_BAND_SIZE = 4
_JACCARD_THRESHOLD = 0.5

# SimHash: 64-bit signatures, blocked on 4 × 16-bit bands (multi-table
# scheme, Manku et al., WWW'07), Hamming radius 3 — the radius the
# original web-dedup deployment used for 64-bit fingerprints. With 4
# bands, pigeonhole guarantees any pair within Hamming ≤ 3 shares at
# least one untouched band, so banding recall is exactly 1.0 (pinned
# against brute force in tests/test_llm_quality.py). A larger radius
# needs radius+1 tables for the same guarantee, which at 64 bits means
# tiny band keys and corpus-scale blocks — radius 3 is the sweet spot.
_SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = 64 // _SIMHASH_BANDS
_HAMMING_MAX = 3


@register(
    "q_dedup_exact",
    category="llm-dedup",
    oracle="""
    SELECT
      md5(LOWER(TRIM(text)))  AS fp,
      MIN(doc_id)             AS canonical_id,
      COUNT(*)                AS n_copies
    FROM documents
    GROUP BY md5(LOWER(TRIM(text)))
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by a fingerprint of normalized text, keep the
    minimum doc_id as canonical. At 100 TB: shuffle moves only
    (fp, doc_id) pairs — never the text — and the md5 key distributes
    uniformly, so no skew."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return d.groupBy(fp.alias("fp")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "q_dedup_ngram",
    category="llm-dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, list_distinct(STRING_SPLIT(text, ' ')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(
             LEN(list_intersect(a.toks, b.toks))::DOUBLE
             / LEN(list_distinct(list_concat(a.toks, b.toks))), 4
           ) AS jaccard
    FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE LEN(list_intersect(a.toks, b.toks))::DOUBLE
          / LEN(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard pairs ≥ 0.8 (same source), candidates via
    *prefix filtering* (AllPairs/PPJoin): under any global token order,
    two sets with J ≥ t must share a token inside their first
    |x| − ⌈t·|x|⌉ + 1 tokens — so the pair join is keyed on prefix
    tokens, not on `source` (whose block size grows with the corpus,
    going quadratic at scale). Prefix filtering is LOSSLESS, so the
    result set — and the DuckDB oracle, a plain same-source nested
    loop — is unchanged.

    Block-size bound: a block is one (source, prefix-token) pair — the
    result set REQUIRES src_a = src_b, so generating cross-source
    candidates is pure waste (the round-4 bench canary caught exactly
    that: the fixture's 31-token vocabulary makes prefix tokens
    non-selective, and source-free blocking emitted 12.2M candidates at
    sf0.1 where source+length blocking emits 322k — 19.3 s → ~2.5 s).
    Two further lossless prunes ride the same join: the AllPairs length
    filter (J ≥ 0.8 forces 0.8·|b| ≤ |a| ≤ 1.25·|b|) and prefix
    selectivity ≈ 0.2·df under the hash-random order (at ingest, rank
    tokens by ascending df — classic AllPairs — for rarer prefixes).
    At 100 TB `source` is the shard/domain key, so blocks stay bounded
    by shard vocabulary, never corpus vocabulary. The verify stage
    (true Jaccard) touches only candidate pairs."""
    # spread(): tokenization + prefix hashing is CPU-bound; under-split
    # fixture scans serialize it on one core (no-op at production split
    # counts, same discipline as the entropy/decontam scans)
    d = spread(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    # global token order = xxhash64 (deterministic, uniform); prefix
    # length n - ceil(0.8 n) + 1 computed in exact integer arithmetic
    n = F.size("toks")
    plen = n - F.floor((n * 4 + 4) / 5).cast("int") + 1
    ordered = F.array_sort(
        F.transform("toks", lambda t: F.struct(F.xxhash64(t).alias("r"), t.alias("tok")))
    )
    prefix = F.transform(F.slice(ordered, 1, plen), lambda s: s["tok"])
    pt = d.select("doc_id", "source", n.alias("n"), F.explode(prefix).alias("ptok"))
    cand = (
        pt.alias("a")
        .join(
            pt.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: |a| and |b| within 0.8 ratio both ways
            & (F.col("a.n") * 5 >= F.col("b.n") * 4)
            & (F.col("b.n") * 5 >= F.col("a.n") * 4),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        # The verify stage below is CPU-bound (array_intersect over the
        # token sets of every surviving candidate) but its input is ids
        # only — a few MB — so AQE coalesces the dedup shuffle to 1-2
        # partitions and the Jaccard math runs on 2 cores (profiled: a
        # (1+1)/2 straggler stage at sf0.1). Pin the verify stage to
        # cluster parallelism with an explicit numbered repartition
        # (AQE honors user-specified partition counts). Round 16: the
        # repartition moved BEFORE dropDuplicates on the SAME keys, so
        # the dedup aggregate reuses its partitioning (guide §2.4) —
        # one candidate-id exchange instead of two, same wide verify.
        .repartition(
            spark.sparkContext.defaultParallelism, "doc_a", "doc_b"
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = (
        cand.join(
            d.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("src_a"),
                F.col("toks").alias("toks_a"),
            ),
            "doc_a",
        )
        .join(
            d.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("src_b"),
                F.col("toks").alias("toks_b"),
            ),
            "doc_b",
        )
        .filter(F.col("src_a") == F.col("src_b"))
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    jacc = inter.cast("double") / union
    return (
        pairs.filter(jacc >= 0.8)
        .select("doc_a", "doc_b", F.round(jacc, 4).alias("jaccard"))
    )


def _shingles(text_col, n: int = 3):
    """Distinct n-token shingles of a text column, as strings."""
    toks = F.split(text_col, " ")
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(windows)


def _shingle_hashes(shingle_col):
    """Each shingle string hashed ONCE to a long. The 64 minhash
    permutations then re-hash this long (8-byte input) instead of the
    shingle text — the string is scanned once, not 64 times. Profiled
    at sf0.1 the string-per-permutation variant spent 23 s CPU in the
    signature stage; long re-hash is the textbook tabulation form
    (h_k = hash(h, seed=k)) with the same min-wise independence."""
    return F.transform(shingle_col, lambda s: F.xxhash64(s))


def _band_structs(hash_col):
    """(band, bh) structs from an array of shingle hashes in ONE
    projection — no intermediate 64-column signature row + restruct
    layer (measured overhead at sf0.1, VERDICT r1 #7). Permutation k
    is xxhash64(shingle_hash, seed=k).

    Round 11 (VERDICT r10 next #4): the 64 permutations are a GENERIC
    nested higher-order expression — transform over sequence(0,63) —
    instead of 64 unrolled array_min(transform(...)) trees. The values
    are bit-identical (the lambda variable k is the same IntegerType
    as the old F.lit(k), and Spark's xxhash64 folds array elements
    with exactly the per-argument accumulation, so hashing the 4-long
    minhash array == xxhash64(m0..m3)), but janino now compiles one
    small loop body instead of a 64-permutation expression forest —
    the fixed codegen constant that made this query 28% of the frozen
    headline set. Each band computes its own 4 permutations inside
    its lambda, so every permutation is still evaluated exactly once
    and there is no shared subexpression for CollapseProject to
    duplicate."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(_N_HASHES // _BAND_SIZE - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.transform(
                    F.sequence(b * _BAND_SIZE, b * _BAND_SIZE + (_BAND_SIZE - 1)),
                    lambda k: F.array_min(
                        F.transform(hash_col, lambda h: F.xxhash64(h, k))
                    ),
                )
            ).alias("bh"),
        ),
    )


#: Brute-force oracle: DuckDB cannot replay the xxhash64 minhash
#: signatures, but it CAN compute the ground truth the LSH pipeline
#: approximates — all-pairs shingle Jaccard ≥ 0.5, connected components
#: via a recursive reachability CTE. Banding at 16×4 misses a pair with
#: P=(1−j⁴)¹⁶; every fixture near-dup pair has j ≥ 0.889 (measured at
#: all SFs), so the miss probability is ~1e-7 per pair AND the minhash
#: draw is deterministic (fixed xxhash64 seeds) — the verified edge set
#: equals ground truth on these fixtures, making the driver hash check
#: exact, not probabilistic.
#: Oracle verify stage (round 13): the original all-pairs form
#: (`d a JOIN d b ON a.doc_id < b.doc_id` + per-pair list_intersect)
#: is RESULT-IDENTICAL but O(n²) in list operations — 2,100 s of the
#: sf0.1 sweep's wall clock. This form is the textbook inverted-index
#: set-similarity join instead: unnest the (already distinct) shingle
#: lists, equi-join on the shingle, and the per-pair match COUNT IS
#: |A∩B|, so Jaccard ≥ t becomes pure arithmetic:
#:   |A∩B|/(|A|+|B|-|A∩B|) ≥ t  ⟺  c ≥ t·(nA+nB-c)
#: Any pair with Jaccard ≥ t > 0 shares ≥1 shingle, so the equi-join
#: candidate set is a superset of the verified set — no pair is lost.
#: For t=0.5 both sides are exact in binary FP (c integer, 0.5·int is
#: exact), so boundary pairs agree bit-for-bit with the old division
#: form. Proven result-identical: old-vs-new DataFrame equality at
#: sf0.001/sf0.01, and the sf0.1 driver-strength hash is unchanged
#: (46d763679b0b654c). 4.6 s at sf0.1, 456× faster.
_DEDUP_NEAR_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
  FROM documents
),
tok AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
verified AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM tok x JOIN tok y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id, x.n, y.n
  HAVING COUNT(*) >= {_JACCARD_THRESHOLD} * (x.n + y.n - COUNT(*))
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM verified
),
reach(node, m) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.node
),
labels AS (SELECT node, MIN(m) AS cluster_id FROM reach GROUP BY node),
degree AS (SELECT a AS doc_id, COUNT(*) AS n FROM edges GROUP BY a)
SELECT d.doc_id,
       l.cluster_id,
       CAST(COALESCE(g.n, 0) AS BIGINT) AS n_near_dups
FROM d
JOIN labels l ON l.node = d.doc_id
LEFT JOIN degree g ON g.doc_id = d.doc_id
"""


@register("q_dedup_near", category="llm-dedup", oracle=_DEDUP_NEAR_ORACLE)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering via MinHash + banded LSH.

    Pipeline (each stage a DataFrame op — no Python in the row path):
      1. shingle: distinct 3-token shingles per doc (map-side).
      2. sign: 64 minhash values per doc (map-side).
      3. band: 16 band-hashes per doc; explode → (band, band_hash, doc).
      4. bucket join: docs sharing any (band, band_hash) are candidates.
      5. verify: true shingle Jaccard ≥ 0.5 on candidate pairs only.
      6. cluster: doc_id → min(doc_id over verified neighbors ∪ self).

    Scale: the only shuffle keys are band hashes (uniform by
    construction); quadratic work is confined to LSH buckets. A skewed
    bucket (boilerplate shingle sets) is handled by AQE skew-join
    splitting. The heavy shingle arrays never ride the bucket shuffle:
    the bucket self-join and pair-dedup move only (band, bh, doc_id)
    triples, and shingles are fetched by doc_id once per surviving
    candidate pair for the verify stage. Output is one row per doc —
    stable row count for the driver's check.

    Materialization discipline (round 3): the banded signature relation
    is localCheckpoint-ed right after it is computed. Without the
    barrier, every downstream join stage inlines the 64-transform
    minhash tree into its generated code (the bucket self-join embeds
    it twice, the verify fetches twice more) and single-run latency is
    dominated by janino compiling those giant methods — measured 3-10 s
    of the 3-19 s cold run at sf0.1, with the identical plan re-running
    in 1.3 s. After the barrier each stage compiles a small method and
    the signature expression is computed exactly once. The checkpoint
    payload is ids-only (doc_id, band, bh — ~48 B/doc regardless of
    document size), i.e. bytes proportional to doc COUNT, not corpus
    size; at 100 TB the same artifact is what you'd materialize at
    ingest anyway (write-time signatures)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark).select("doc_id", "text")
    buckets = (
        docs.select("doc_id", _shingles(F.col("text")).alias("sh"))
        .select("doc_id", _shingle_hashes(F.col("sh")).alias("hs"))
        .select("doc_id", F.explode(_band_structs(F.col("hs"))).alias("bucket"))
        .select("doc_id", "bucket.band", "bucket.bh")
        .localCheckpoint(eager=True)
    )

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    # Verify stage: shingle ONLY the docs that appear in a candidate
    # pair — semi-join first, shingle after. On a mostly-clean corpus
    # (the production case) this shrinks the verify stage's expensive
    # text work from every doc to the candidate slice.
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    ).distinct()
    d = docs.join(cand_ids, "doc_id", "left_semi").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    pairs = (
        cand.join(d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    jacc = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    # The verified edge set is tiny (near-dup pairs only) but its plan
    # is the whole LSH pipeline; materialize it ONCE — the clustering
    # below consumes it twice (labels, degrees).
    verified = (
        pairs.filter(jacc >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )

    # Transitive clustering: connected components over the verified
    # pair graph, so chains (A~B, B~C) land in one cluster even when
    # A and C were never direct candidates. Docs with no near-dup are
    # their own singleton cluster (a clean corpus yields an empty label
    # relation and the left joins below coalesce every doc to itself —
    # no special-case branch, one fewer driver job per run).
    from presto_cached_examples_spark.operators.graph import connected_components

    components = connected_components(verified, src="doc_a", dst="doc_b")
    neighbors = verified.unionByName(
        verified.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    degree = neighbors.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_near_dups")
    )
    all_docs = docs.select("doc_id")
    return (
        all_docs.join(components, all_docs.doc_id == components.node, "left")
        .join(degree, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            F.coalesce("n_near_dups", F.lit(0).cast("long")).alias("n_near_dups"),
        )
    )


def _md5_long(col):
    """First 64 bits of md5(col) as a signed long, assembled from two
    32-bit hex halves (conv of 16 hex chars overflows long through the
    decimal-string path; two 8-char halves are exact). md5 — not
    xxhash64 — because DuckDB evaluates it bit-identically, which is
    what makes the SimHash pipeline SQL-oracle-checkable."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig): 64-bit SimHash per document — sign of the per-bit
    weighted sum of token hashes. One scan, all JVM higher-order funcs.
    Token hash = first 64 bits of md5 (cross-engine stable; xxhash64
    would be marginally cheaper but unverifiable — see _md5_long)."""
    d = spread(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )

    # bit j of the signature = (sum over token-hashes of ±1 by bit j) > 0.
    # Round 11: the 64 bit votes are ONE generic nested-HOF expression
    # instead of 64 unrolled aggregate trees (cold plan was ~7s of
    # janino compile). Round 15 (guide §4 / the q_minhash_calibration
    # fold fix): that round-11 form was transform(sequence(0,63),
    # j -> aggregate(hs, ...)) with hs a PROJECTED column —
    # CollapseProject inlined the md5 token-hash array into the lambda
    # body, so the md5+conv build ran 64x per row (once per bit).
    # Now ONE aggregate fold with the hash array in aggregate's
    # ARGUMENT position (evaluated exactly once per row): accumulator =
    # 64 running votes, each token zips its ±1 into all 64 lanes.
    # Values are bit-identical — per-bit votes are the same integer
    # sums folded in the same token order, and the MSB-first pack
    # consumes vote lanes in the same j=0..63 order the old chain
    # shifted them. Measured 0.74s -> 0.15s signature-only, 2.7x on
    # the full pair pipeline at sf0.1; old-vs-new frames IDENTICAL on
    # all 5000 sf0.1 docs. NULL contract (ADVICE r15 item 4): a NULL
    # text folds to a NULL sig where the old per-bit chain produced 0 —
    # equivalence relies on documents.text being non-null (FIXTURES.md:
    # no fixture table contains NULLs); a nullable corpus needs an
    # isnotnull guard ahead of the signature build. (F.call_function: the python wrapper for
    # shiftrightunsigned only accepts an int shift, but the underlying
    # SQL function takes a column — needed because j is a lambda var.)
    hs = F.transform("toks", lambda t: _md5_long(t))
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(63)),
            lambda a, j: a
            + F.when(
                F.call_function("shiftrightunsigned", h, j).bitwiseAND(F.lit(1)) == 1,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        ),
    )
    bits = F.transform(
        votes,
        lambda v: F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    sig = F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: F.shiftleft(acc, 1).bitwiseOR(b)
    )
    return d.select("doc_id", sig.alias("sig"))


def simhash_candidates(sigs: DataFrame) -> DataFrame:
    """Candidate pairs via multi-table banding: any of the 4 16-bit
    bands equal ⇒ candidate. Returns (doc_a, doc_b, sig_a, sig_b)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(t).alias("band"),
                F.shiftrightunsigned("sig", t * _SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit((1 << _SIMHASH_BAND_BITS) - 1))
                .alias("bv"),
            )
            for t in range(_SIMHASH_BANDS)
        ]
    )
    blocked = sigs.select("doc_id", "sig", F.explode(bands).alias("bk")).select(
        "doc_id", "sig", "bk.band", "bk.bv"
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _simhash_oracle() -> str:
    """DuckDB replay of the full SimHash pipeline, bit for bit: per-token
    bit j = bit (j%4) of hex nibble 16-(j//4) of md5(token) — exactly the
    bits of _md5_long's 64-bit value; votes sum ±1 per bit; signature
    serialized as a 64-char bit string (char i ⇔ Spark sig bit 64-i, so
    Spark band t = substr(49-16t, 16)); candidates = any band equal;
    Hamming via bit_count(xor) over BITSTRINGs. Generated so the bit
    layout cannot drift from the Spark constants."""
    nib = "strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1"
    votes = ",\n    ".join(
        "SUM(CASE WHEN ((({nib}) >> {sh}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}".format(
            nib=nib.format(pos=16 - j // 4), sh=j % 4, j=j
        )
        for j in range(64)
    )
    sig = " || ".join(f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(64))
    bands = " OR ".join(
        f"substr(a.s, {49 - _SIMHASH_BAND_BITS * t}, {_SIMHASH_BAND_BITS})"
        f" = substr(b.s, {49 - _SIMHASH_BAND_BITS * t}, {_SIMHASH_BAND_BITS})"
        for t in range(_SIMHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
  FROM documents
),
hx AS (SELECT doc_id, md5(t) AS h FROM toks),
votes AS (
  SELECT doc_id,
    {votes}
  FROM hx GROUP BY doc_id
),
sigs AS (SELECT doc_id, {sig} AS s FROM votes),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({bands})
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(CAST(sa AS BIT), CAST(sb AS BIT))) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(CAST(sa AS BIT), CAST(sb AS BIT))) <= {_HAMMING_MAX}
"""


@register("q_dedup_simhash", category="llm-dedup", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature per doc, candidates from
    4×16-bit multi-table banding (any band equal — no single-prefix
    blind spot), kept if Hamming distance ≤ 3. Pigeonhole over the 4
    bands makes the banding lossless at that radius: recall is exactly
    1.0 vs brute force (pinned in tests/test_llm_quality.py).

    SQL-oracled since round 4: token bits derive from md5 (cross-engine
    stable) instead of xxhash64, so DuckDB replays the identical
    vote → band → Hamming pipeline (_simhash_oracle) and the driver
    hash-checks the output — closing the last dedup verification gap.

    Scale: signature build is one scan; each band value is a 16-bit key
    whose block size is ~corpus/2^16 per band (uniform: signature bits
    are hash-sign votes), so the pair join is bounded per bucket and
    the quadratic term never sees the whole corpus. bit_count(xor) is a
    single JVM intrinsic per pair."""
    sigs = simhash_signatures(spark, sf_dir)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        simhash_candidates(sigs)
        .filter(hamming <= _HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )


def _dedup_embed_oracle() -> str:
    """DuckDB replay of the embedding near-dup pipeline: the learned
    quantizer is reproducible cross-engine (llm/similarity.py's
    determinism contract), so the multi-probe candidate set — and
    therefore the verified pair set — is identical, not just similar."""
    from presto_cached_examples_spark.llm.similarity import (
        _KMEANS_NPROBE,
        _kmeans_cells_sql,
    )

    return f"""
WITH {_kmeans_cells_sql()},
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM rc a JOIN rc b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.r <= {_KMEANS_NPROBE} AND b.r <= {_KMEANS_NPROBE}
),
scored AS (
  SELECT p.vec_a, p.vec_b,
         ROUND(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 4) AS cosine
  FROM pairs p
  JOIN nv na ON na.vec_id = p.vec_a
  JOIN nv nb ON nb.vec_id = p.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.25
"""


@register("q_dedup_embed", category="llm-dedup", oracle=_dedup_embed_oracle())
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ 0.25), blocked by a
    LEARNED coarse quantizer: k-means cells (llm/similarity.py's Lloyd
    loop), each vector assigned to its nprobe=2 nearest cells so true
    near-dup pairs straddling a cell boundary still meet in a block.

    The fixture embeddings are near-random (max pairwise cosine ≈ 0.51,
    p99 ≈ 0.3), so the threshold sits at the p99 tail to emit the
    genuinely-closest pairs; with real near-duplicate embeddings the
    knob moves to ~0.95 without any plan change.

    Scale: the cell id bounds the quadratic pair join (cells trained at
    ingest, assignment is a map-side broadcast expression); dot
    products are JVM higher-order-function folds over array<float> —
    no Python, no UDF. Multi-probe duplicates collapse via
    dropDuplicates on the id pair before the dot products run."""
    from presto_cached_examples_spark.llm.similarity import (
        _KMEANS_NPROBE,
        _cell_ranking,
        _corpus,
        _corpus_centroids,
    )

    e = _corpus(spark, sf_dir)
    cents = _corpus_centroids(spark, sf_dir)
    cells = e.select(
        "vec_id",
        "v",
        "nrm",
        F.explode(F.slice(_cell_ranking(cents), 1, _KMEANS_NPROBE)).alias("cell"),
    )
    ids = cells.select("vec_id", "cell")
    a, b = ids.alias("a"), ids.alias("b")
    # ids-only bucket join + pair dedup (multi-probe collisions), then
    # fetch vectors once per surviving pair — arrays stay off the
    # bucket shuffle, as in q_dedup_near
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = e.select("vec_id", "v", "nrm")
    pairs = pairs.join(
        vecs.select(
            F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
        ),
        "vec_a",
    ).join(
        vecs.select(
            F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
        ),
        "vec_b",
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return pairs.select(
        "vec_a", "vec_b", F.round(cos, 4).alias("cosine")
    ).filter(F.col("cosine") >= 0.25)


# Incremental (cross-snapshot) dedup: the new-crawl batch is the 20%
# doc_id % 10 >= 8 slice; the standing corpus is the other 80%. The
# fingerprint is the sorted distinct-token VOCABULARY (not raw text):
# the production knob for catching re-crawled pages whose word order
# jitters — and the fixture's near-dups are exactly word-order
# scrambles, so the anti-join is non-vacuous at every SF (15/9/270
# drops at sf0.001/0.01/0.1).
_SNAP_MOD = 10
_SNAP_NEW = 8


@register(
    "q_dedup_incremental",
    category="llm-dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
      FROM documents
    )
    SELECT n.doc_id, n.source, n.fp
    FROM fp n
    WHERE n.doc_id % {_SNAP_MOD} >= {_SNAP_NEW}
      AND NOT EXISTS (
        SELECT 1 FROM fp o
        WHERE o.doc_id % {_SNAP_MOD} < {_SNAP_NEW} AND o.fp = n.fp
      )
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup — the production re-crawl shape:
    only documents from the NEW batch whose vocabulary fingerprint has
    never been seen in the standing corpus survive (left anti join);
    everything already known is dropped without touching its text
    again. Composes q_dedup_exact's fingerprint discipline with the
    incremental-refresh pillar (streaming/incremental.py): each crawl
    appends its surviving fingerprints to the corpus index, so work per
    snapshot is proportional to the BATCH, not the corpus.

    Scale: the anti-join shuffles (16-byte fp, doc_id) pairs only —
    never text. At 100 TB the corpus-side fingerprint index is a
    bucketed-by-fp table maintained across snapshots, making the new
    batch's probe a zero-shuffle bucket-local lookup; AQE handles the
    batch side's size skew. The md5 vocabulary key is engine-neutral,
    so the index is shareable with any SQL engine."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " ")))))
    docs = d.select("doc_id", "source", fp.alias("fp"))
    new = docs.filter(F.col("doc_id") % _SNAP_MOD >= _SNAP_NEW)
    old = docs.filter(F.col("doc_id") % _SNAP_MOD < _SNAP_NEW)
    return new.join(old, "fp", "left_anti").select("doc_id", "source", "fp")


@register(
    "q_dedup_containment",
    category="llm-dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             list_distinct(string_split(text, ' ')) AS toks
      FROM documents
    ),
    p AS (
      SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
             len(list_intersect(a.toks, b.toks)) AS shared,
             len(a.toks) AS na, len(b.toks) AS nb
      FROM d a JOIN d b ON a.source = b.source AND a.doc_id <> b.doc_id
    )
    SELECT doc_small, doc_big,
           CAST(shared AS BIGINT) AS n_shared,
           ROUND(shared * 1.0 / na, 4) AS containment,
           ROUND(shared * 1.0 / (na + nb - shared), 4) AS jaccard
    FROM p WHERE shared * 1.0 / na >= 0.9
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: (small, big) doc pairs where >=90%
    of the small doc's distinct tokens appear in the big one — the
    quote/subset/boilerplate-inclusion detector symmetric Jaccard
    misses by construction (a tweet quoted inside an article has tiny
    Jaccard but containment 1.0). Both scores emitted so the asymmetry
    is visible.

    Scale: the pair stream is a (source, token) equi-join — shared
    counts accumulate via a hash aggregate keyed on the pair, sizes
    re-join from the ids-only doc table. Block sizes are bounded by
    per-source token document-frequency; at 100 TB you'd drop the
    top-df tokens from the join key (lossy only for docs made entirely
    of stopwords) or reuse the ngram query's prefix-filter ordering —
    the fixture's 31-token vocabulary is the adversarial case and
    still bounded per source. No arrays cross a shuffle: the explode
    ships (source, tok, id, n)."""
    d = spread(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    e = d.select(
        "doc_id", "source", F.size("toks").alias("n"), F.explode("toks").alias("tok")
    )
    a = e.select(
        F.col("source").alias("src"),
        "tok",
        F.col("doc_id").alias("doc_small"),
        F.col("n").alias("na"),
    )
    b = e.select(
        F.col("source").alias("src_b"),
        F.col("tok").alias("tok_b"),
        F.col("doc_id").alias("doc_big"),
        F.col("n").alias("nb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("src") == F.col("src_b"))
            & (F.col("tok") == F.col("tok_b"))
            & (F.col("doc_small") != F.col("doc_big")),
        )
        .groupBy("doc_small", "doc_big", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cont = F.col("shared") * 1.0 / F.col("na")
    jacc = F.col("shared") * 1.0 / (F.col("na") + F.col("nb") - F.col("shared"))
    return pairs.filter(cont >= 0.9).select(
        "doc_small",
        "doc_big",
        F.col("shared").cast("long").alias("n_shared"),
        F.round(cont, 4).alias("containment"),
        F.round(jacc, 4).alias("jaccard"),
    )


def _logistic_sql() -> str:
    """The q_quality_logistic scoring expression (llm/text.py _QW
    weights) as a DuckDB scalar over `text` — shared so composed
    oracles score identically to the standalone quality query."""
    from presto_cached_examples_spark.llm.text import _QW, _STOPWORDS

    toks = "STRING_SPLIT(text, ' ')"
    return (
        f"1.0 / (1.0 + EXP(-({_QW['bias']}"
        f" + {_QW['distinct_ratio']} * (LEN(list_distinct({toks}))::DOUBLE / LEN({toks}))"
        f" + {_QW['stopword_ratio']} * (LEN(list_filter({toks},"
        f" t -> list_contains({list(_STOPWORDS)!r}, t)))::DOUBLE / LEN({toks}))"
        f" + {_QW['log_tokens']} * LN(LEN({toks})))))"
    )


def _cluster_resolve_oracle() -> str:
    return f"""
    WITH f AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             ROUND({_logistic_sql()}, 4) AS quality_score
      FROM documents
    ),
    sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY fp) AS cluster_size FROM f
    ),
    ranked AS (
      SELECT doc_id, fp, quality_score, cluster_size,
             ROW_NUMBER() OVER (
               PARTITION BY fp ORDER BY quality_score DESC, doc_id) AS rn
      FROM sized WHERE cluster_size >= 2
    )
    SELECT doc_id, fp, quality_score,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           rn = 1 AS is_canonical
    FROM ranked
    """


@register(
    "q_dedup_cluster_resolve",
    category="llm-dedup",
    oracle=_cluster_resolve_oracle(),
)
def q_dedup_cluster_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document resolution: within each duplicate cluster
    (vocabulary-fingerprint groups of size >= 2), keep the
    highest-quality copy — the 'which duplicate survives' decision
    that follows every dedup pass, made by the same logistic scorer
    the quality stage uses (composition of q_dedup_exact's fingerprint
    with q_quality_logistic's model; canonical = best rounded score,
    doc_id tie-break).

    Scale: fingerprint + score are map-side; the cluster-size and rank
    windows ride ONE (fp) hash partitioning, and cluster sizes are
    bounded by duplication multiplicity, never corpus size. Nothing
    here re-reads text after the single scoring scan."""
    from presto_cached_examples_spark.llm.text import _QW, _STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    stopword_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("double")
        / n_tokens
    )
    logit = (
        F.lit(_QW["bias"])
        + F.lit(_QW["distinct_ratio"]) * distinct_ratio
        + F.lit(_QW["stopword_ratio"]) * stopword_ratio
        + F.lit(_QW["log_tokens"]) * F.log(n_tokens.cast("double"))
    )
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    f = d.select(
        "doc_id",
        fp.alias("fp"),
        F.round(1.0 / (1.0 + F.exp(-logit)), 4).alias("quality_score"),
    )
    from pyspark.sql import Window

    wfp = Window.partitionBy("fp")
    sized = f.withColumn("cluster_size", F.count(F.lit(1)).over(wfp)).filter(
        F.col("cluster_size") >= 2
    )
    rn = F.row_number().over(
        wfp.orderBy(F.col("quality_score").desc(), F.col("doc_id"))
    )
    return sized.withColumn("rn", rn).select(
        "doc_id",
        "fp",
        "quality_score",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("rn") == 1).alias("is_canonical"),
    )


# Bloom membership test for the standing corpus (VERDICT r5 item 9):
# size m at ~16 bits per standing-corpus key. 65536 bits is the FLOOR
# (right for the fixtures' ~2-4k standing fps); _bloom_bits scales it
# with the measured corpus so the filter can't saturate at the scales
# the query is motivated by (ADVICE r6 item 1 — a fixed 65536 degrades
# to fp-rate ~1 past ~15-20k keys, silently turning the map-side
# prefilter into a no-op; correctness was never at risk, the verify
# anti-join removes all false positives).
_FP_BLOOM_BITS_FLOOR = 65536
_FP_BLOOM_BITS_PER_KEY = 16
_FP_BLOOM_K = 3
# Standing-corpus fingerprint count, memoized per (session, sf_dir) so
# repeat builds don't re-count. The one count job at first build is a
# parquet metadata aggregate (no row materialization) — the same
# accepted build-time-action class as _HOURLY_TIER / global_rank
# (NOTES "Decisions").
_FP_OLD_COUNT: dict[tuple[str, str], int] = {}


def _bloom_bits(n_keys: int) -> int:
    """Next power of two >= _FP_BLOOM_BITS_PER_KEY bits per key, floored
    at _FP_BLOOM_BITS_FLOOR. Power-of-two keeps pmod unbiased-enough and
    the word map dense."""
    need = max(_FP_BLOOM_BITS_FLOOR, _FP_BLOOM_BITS_PER_KEY * max(n_keys, 1))
    return 1 << (need - 1).bit_length()


@register(
    "q_dedup_incremental_bloom",
    category="llm-dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
      FROM documents
    )
    SELECT n.doc_id, n.source, n.fp
    FROM fp n
    WHERE n.doc_id % {_SNAP_MOD} >= {_SNAP_NEW}
      AND NOT EXISTS (
        SELECT 1 FROM fp o
        WHERE o.doc_id % {_SNAP_MOD} < {_SNAP_NEW} AND o.fp = n.fp
      )
    """,
)
def q_dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_incremental's membership test at 100 TB scale: the
    standing corpus's vocabulary fingerprints fold into a Bloom filter
    (one broadcast row of OR-ed 64-bit words, {_FP_BLOOM_K} xxhash64
    probes), and the new batch tests it MAP-SIDE. Bloom-negative docs
    are definitely novel — they are emitted without ever touching a
    join; only bloom-positive docs (true re-crawls + the ~p false
    positives) reach the exact anti-join that removes false positives.
    Result is bit-identical to the plain anti-join — Bloom filters have
    no false negatives — so the oracle is q_dedup_incremental's SQL and
    a hash match certifies the pruning dropped nothing.

    Scale: this is the standing-corpus shape the plain anti-join can't
    reach — at 10^10 corpus docs the fingerprint index is re-shuffled
    by every batch's anti-join, while the Bloom build is one pass that
    produces a fixed-size bit array (~15 bits/key; shard it by fp
    prefix into per-bucket blocked filters once it outgrows a single
    broadcast) and the batch-side probe is pure map work. The exact
    anti-join still runs, but over the bloom-positive slice only —
    |re-crawls| + p·|batch| rows instead of |batch| — so the shuffle
    shrinks by the novelty rate, which for a healthy crawl is most of
    the batch. Same fp discipline as q_dedup_incremental (md5 of the
    sorted distinct-token vocabulary, engine-neutral).

    Reference provenance: C1 tiered access (/root/reference/src/
    PicoPlusPsram.cpp:14-29, README.md:3-6 — consult small/fast summary
    state before touching the big/slow tier; the Bloom word map is the
    2,880-byte RAM cache of this membership test)."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " ")))))
    docs = d.select("doc_id", "source", fp.alias("fp"))
    new = docs.filter(F.col("doc_id") % _SNAP_MOD >= _SNAP_NEW)
    old = docs.filter(F.col("doc_id") % _SNAP_MOD < _SNAP_NEW)

    # Size the filter from the measured standing corpus (memoized —
    # one metadata-count job per session/sf, cf. _bloom_bits above).
    ckey = (session_token(spark), sf_dir)
    if ckey not in _FP_OLD_COUNT:
        _FP_OLD_COUNT[ckey] = old.count()
    n_bits = _bloom_bits(_FP_OLD_COUNT[ckey])

    def positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits))
            for i in range(_FP_BLOOM_K)
        ]

    # build: per-word OR-mask aggregate -> ONE row holding the word map
    bits = old.select(F.explode(F.array(*positions(F.col("fp")))).alias("pos")).select(
        F.expr("pos DIV 64").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
    )
    bloom = (
        bits.groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bloom"))
    )

    probed = new.join(F.broadcast(bloom)).withColumns(
        {f"pos{i}": p for i, p in enumerate(positions(F.col("fp")))}
    )
    maybe_seen = F.lit(True)
    for i in range(_FP_BLOOM_K):
        maybe_seen = maybe_seen & F.expr(
            f"(coalesce(element_at(bloom, pos{i} DIV 64), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % 64 AS INT))) != 0"
        )
    aux = ["bloom", *[f"pos{i}" for i in range(_FP_BLOOM_K)]]
    novel_fast = probed.filter(~maybe_seen).drop(*aux)  # no join needed
    verified = (
        probed.filter(maybe_seen)
        .drop(*aux)
        .join(old.select("fp"), "fp", "left_anti")  # false positives only
    )
    cols = ["doc_id", "source", "fp"]
    return novel_fast.select(*cols).unionAll(verified.select(*cols))


_SPAN_N = 5  # n-gram width for duplicated-span measurement


@register(
    "q_dedup_span",
    category="llm-dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ),
    pos AS (
      SELECT doc_id, toks,
             UNNEST(generate_series(1, GREATEST(LEN(toks) - {_SPAN_N - 1}, 1))) AS i
      FROM d
    ),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[i : i + {_SPAN_N - 1}], ' ') AS gram
      FROM pos
    ),
    df AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY gram)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           ROUND(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS dup_fraction
    FROM g JOIN df ON df.gram = g.gram
    GROUP BY g.doc_id
    """,
)
def q_dedup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span profiling (the corpus-health metric behind
    substring-dedup decisions, à la Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    the fraction of its distinct {n}-grams that occur in at least one
    OTHER document. High dup_fraction = boilerplate/template/recrawl
    content that exact- and near-dedup keep and substring dedup would
    cut; the distribution over docs tells you whether that pass is
    worth running at all.

    Scale: per-doc distinct grams collapse map-side (array_distinct
    inside the row) before the explode; gram document-frequency is a
    two-phase hash aggregate on the gram string (uniform key — no
    Zipf skew because DISTINCT-per-doc caps any gram's count at
    |docs|); the join back is gram-keyed and the final aggregate keys
    on doc_id. Nothing all-pairs anywhere — cost is O(total distinct
    grams), the same class as q_decontam."""
    d = spread(load_table(spark, sf_dir, "documents"), spark)
    toks = F.split("text", " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (_SPAN_N - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, _SPAN_N)),
        )
    )
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    df_ = g.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    return (
        g.join(df_, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.round(
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("dup_fraction"),
        )
    )


q_dedup_span.__doc__ = q_dedup_span.__doc__.replace("{n}", str(_SPAN_N))


_EMBED_SWEEP_THRESHOLDS = (0.20, 0.25, 0.30, 0.35)

#: Session-keyed memo of the sweep's scored candidate pairs — the
#: blocking + scoring pass is identical for every build, and the
#: checkpoint otherwise re-materializes per build (the _PAIRS_CACHE /
#: curated-survivor discipline). Lazy checkpoint: no build-time jobs.
_SWEEP_SCORED_CACHE: dict = {}


def _dedup_embed_sweep_oracle() -> str:
    """DuckDB replay of the threshold sweep: the identical blocked
    candidate set scored once, then per-threshold pair/doc counts."""
    from presto_cached_examples_spark.llm.similarity import (
        _KMEANS_NPROBE,
        _kmeans_cells_sql,
    )

    branches = "\n    UNION ALL ".join(
        f"""SELECT {t} AS threshold,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT vec_b) AS n_dup_candidates
    FROM scored WHERE cosine >= {t}"""
        for t in _EMBED_SWEEP_THRESHOLDS
    )
    return f"""
WITH {_kmeans_cells_sql()},
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM rc a JOIN rc b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.r <= {_KMEANS_NPROBE} AND b.r <= {_KMEANS_NPROBE}
),
scored AS MATERIALIZED (
  SELECT p.vec_a, p.vec_b,
         ROUND(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 4) AS cosine
  FROM pairs p
  JOIN nv na ON na.vec_id = p.vec_a
  JOIN nv nb ON nb.vec_id = p.vec_b
)
{branches}
"""


@register(
    "q_dedup_embed_sweep", category="llm-dedup", oracle=_dedup_embed_sweep_oracle()
)
def q_dedup_embed_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep for embedding near-dedup — q_dedup_embed's
    tuning twin, the q_ann_recall_sweep pattern applied to curation:
    score the SAME k-means-blocked candidate pairs once, then report
    pair count and affected-doc count at each candidate threshold.
    The curve a curator reads to pick the cosine cut (too low deletes
    distinct content, too high ships duplicates); on the near-random
    fixtures the counts fall off steeply across 0.20-0.35 —
    real near-dup corpora show the elbow near 0.9.

    Scale: identical candidate generation to q_dedup_embed (cell-
    blocked, ids-only shuffle, pair-deduped); the sweep adds ONE
    conditional aggregation over the scored pairs — thresholds share
    the scan instead of re-running the pipeline per knob. n_dup_
    candidates counts DISTINCT vec_b (the would-be-dropped side under
    keep-lowest-id resolution).

    Reference provenance: C9 measure-then-tune (/root/reference/
    README.md:14-21 — published operating curves drive the knob)."""
    from presto_cached_examples_spark.llm.similarity import (
        _KMEANS_NPROBE,
        _cell_ranking,
        _corpus,
        _corpus_centroids,
    )

    e = _corpus(spark, sf_dir)
    cents = _corpus_centroids(spark, sf_dir)
    cells = e.select(
        "vec_id",
        F.explode(F.slice(_cell_ranking(cents), 1, _KMEANS_NPROBE)).alias("cell"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = e.select("vec_id", "v", "nrm")
    scored = (
        pairs.join(
            vecs.select(
                F.col("vec_id").alias("vec_a"),
                F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "vec_a",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("vec_b"),
                F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.aggregate(
                    F.zip_with("va", "vb", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("cosine"),
        )
    )
    skey = (session_token(spark), sf_dir)
    cached = _SWEEP_SCORED_CACHE.get(skey)
    if cached is None:
        # one scoring pass per session/sf, N thresholds x M builds
        cached = scored.localCheckpoint(eager=False)
        _SWEEP_SCORED_CACHE[skey] = cached
    scored = cached
    out = None
    for t in _EMBED_SWEEP_THRESHOLDS:
        branch = scored.filter(F.col("cosine") >= t).agg(
            F.lit(t).alias("threshold"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("vec_b").alias("n_dup_candidates"),
        )
        out = branch if out is None else out.unionAll(branch)
    return out


@register(
    "q_source_jaccard",
    category="llm-dedup",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ),
    sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
      FROM st a JOIN st b ON b.tok = a.tok AND a.source < b.source
      GROUP BY src_a, src_b
    )
    SELECT i.src_a, i.src_b, i.n_inter,
           sa.n + sb.n - i.n_inter AS n_union,
           ROUND(i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter), 4) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    """,
)
def q_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level vocabulary overlap: Jaccard similarity of the
    distinct-token sets of every pair of sources that share at least
    one token, via the inverted-index (token-equi-join) formulation —
    never a source x source cross join. The corpus-composition screen
    that catches a crawler registering the same site under two source
    tags, or a mirrored dump entering twice: doc-level dedup misses it
    when the mirrors chunk differently, but their vocabularies stay
    near-identical.

    Scale: the (source, token) relation is bounded by
    |sources| x |vocab| — the aggregate-first discipline — and the
    pair counts come from joining that relation to itself on the
    TOKEN, so fan-out per token is the number of sources containing
    it, never the corpus. For web-scale source counts the standard
    df-cap refinement (drop tokens present in nearly every source
    from candidate generation, PPJoin-style, at the cost of exactness
    on near-universal tokens) bounds the hot-token fan-out; at the
    fixture's vocabulary every token is near-universal, so the exact
    form is kept and the quadratic term is |sources|^2, which is the
    OUTPUT size of this query by definition.

    Reference provenance: C1 cross-bank residency comparison
    (/root/reference/src/PicoPlusPsram.cpp:14-29)."""
    d = spread(load_table(spark, sf_dir, "documents"), spark)
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    # |sources| x |vocab| bounded; feeds 3 consumers (both join sides +
    # sizes) — materialize once instead of re-scanning the corpus 3x
    st = st.localCheckpoint(eager=False)
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    b = st.select(F.col("source").alias("src_b"), F.col("tok").alias("tok_b"))
    inter = (
        st.join(
            b,
            (F.col("tok_b") == F.col("tok"))
            & (F.col("source") < F.col("src_b")),
        )
        .groupBy(F.col("source").alias("src_a"), "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    uni = F.col("na") + F.col("nb") - F.col("n_inter")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            uni.alias("n_union"),
            F.round(F.col("n_inter") / uni, 4).alias("jaccard"),
        )
    )


@register(
    "q_dedup_soft",
    category="llm-dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             LEN(STRING_SPLIT(text, ' '))::BIGINT AS n_tokens,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      FROM documents
    ),
    cl AS (SELECT fp AS cfp, COUNT(*) AS csize FROM fp GROUP BY fp)
    SELECT f.source,
           COUNT(*) AS n_docs,
           CAST(SUM(f.n_tokens) AS BIGINT) AS n_tokens,
           ROUND(SUM(1.0 / c.csize), 4) AS effective_docs,
           ROUND(SUM(f.n_tokens * 1.0 / c.csize), 2) AS effective_tokens,
           ROUND(COUNT(*) / SUM(1.0 / c.csize), 4) AS dup_inflation
    FROM fp f JOIN cl c ON c.cfp = f.fp
    GROUP BY f.source
    """,
)
def q_dedup_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication accounting (the down-weight-don't-drop
    strategy, SoftDeDup): each document carries weight 1/cluster_size
    where clusters form on the sorted-vocabulary md5 fingerprint (the
    q_dedup_incremental key — non-vacuous on this fixture, whose
    near-dups are word-order scrambles with identical vocabularies).
    Per source: raw vs EFFECTIVE doc/token counts and the duplication
    inflation factor — the number a data-mixing recipe divides by when
    it keeps duplicates but doesn't want them to dominate the loss.

    Scale: fingerprints are map-side; cluster sizes are one hash
    aggregate keyed on the fingerprint; the weight join keys on the
    same uniformly-distributed md5 (no skew beyond true cluster skew,
    which IS the signal), and the final aggregate keys on source.
    Nothing is quadratic — this is exact-dedup cost plus one join.

    Reference provenance: C1 weighted residency accounting
    (/root/reference/src/PicoPlusPsram.cpp:14-29)."""
    d = spread(load_table(spark, sf_dir, "documents"), spark)
    fp = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            )
        ).alias("fp"),
    )
    cl = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("csize"))
    w = F.lit(1.0) / F.col("csize")
    return (
        fp.join(cl, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum(w), 4).alias("effective_docs"),
            F.round(F.sum(F.col("n_tokens") * w), 2).alias("effective_tokens"),
            F.round(F.count(F.lit(1)) / F.sum(w), 4).alias("dup_inflation"),
        )
    )


_MHC_H = 8  # minhash functions
_MHC_BANDS = 4  # bands of 2 rows each
_MHC_SHINGLE = 5  # tokens per shingle (the q_dedup_near gram width)


def _mhc_oracle() -> str:
    mins = ",\n  ".join(
        f"MIN(md5(g || '#{i}')) AS m{i}" for i in range(_MHC_H)
    )
    bands = " UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS b, md5(m{2 * b} || m{2 * b + 1}) AS bv FROM mh"
        for b in range(_MHC_BANDS)
    )
    matches = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(_MHC_H)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+{_MHC_SHINGLE - 1}], ' ') AS g
      FROM toks,
           UNNEST(generate_series(1, GREATEST(len(t) - {_MHC_SHINGLE - 1}, 1)))
             AS s(i)
    ),
    mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON b.b = a.b AND b.bv = a.bv AND a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, LIST(g) AS ts FROM sh GROUP BY doc_id),
    scored AS (
      SELECT {matches} AS n_match,
             len(list_filter(sa.ts, x -> list_contains(sb.ts, x))) * 1.0
               / len(list_distinct(list_concat(sa.ts, sb.ts))) AS jacc
      FROM cand c
      JOIN mh a ON a.doc_id = c.doc_a
      JOIN mh b ON b.doc_id = c.doc_b
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
    )
    SELECT CAST(n_match AS INT) AS n_match,
           ROUND(n_match / {_MHC_H}.0, 4) AS est_jaccard,
           COUNT(*) AS n_pairs,
           ROUND(AVG(jacc), 4) AS avg_jaccard,
           ROUND(MIN(jacc), 4) AS min_jaccard,
           ROUND(MAX(jacc), 4) AS max_jaccard
    FROM scored GROUP BY n_match
    """


@register("q_minhash_calibration", category="llm-dedup", oracle=_mhc_oracle())
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: for every LSH candidate pair
    (md5 minhash over {_MHC_SHINGLE}-token shingles, {_MHC_BANDS}
    bands x 2 rows), compare the SIGNATURE-estimated Jaccard
    (matching minhashes / {_MHC_H}) against the EXACT shingle-set
    Jaccard, bucketed by match count. The measure-then-tune evidence
    behind every minhash deployment: if the avg exact Jaccard in the
    high-match buckets sags, the signature is too short for the
    corpus and the dedup threshold is lying.

    Design note: minhashing the TOKEN sets of this fixture collides
    catastrophically (31-token vocabulary → the global min-hash token
    is in most docs — measured 9.3M candidate pairs from 5k docs);
    shingles restore a large value domain and drop candidates to a
    few hundred. That failure mode is real at any scale for
    small-alphabet fields (tags, categories): always shingle.

    Scale: the q_dedup_near posture — signatures are MAP-SIDE
    aggregate folds over each doc's own shingle array (round 12: no
    explode/groupBy shuffle and no unrolled column forest; round 15:
    the fold keeps the shingle expression in argument position so it
    is evaluated ONCE per row), the bucket join carries
    (band, hash, id) triples only, and the exact-verify leg
    semi-joins to the candidate ids BEFORE shingling (round 15), so
    the expensive text work never runs corpus-wide twice. All
    hashes are md5, so DuckDB replays the pipeline bit-for-bit.

    Reference provenance: C9 measured operating curves
    (/root/reference/README.md:14-21)."""
    d = spread(load_table(spark, sf_dir, "documents"), spark)
    t = F.split("text", " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(t) - (_MHC_SHINGLE - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(t, i, _MHC_SHINGLE)),
        )
    )
    # Round 12 (VERDICT r11 next #2, the r11 _band_structs recipe): the
    # signature is ONE nested higher-order expression instead of H
    # unrolled MIN(md5(g||'#i')) aggregate columns — janino compiles a
    # small loop body and the explode+groupBy shuffle disappears.
    # Round 15 (guide §1.2 per-task work): the transform-over-
    # sequence(0,H-1) form re-evaluated the INLINE shingle expression
    # per outer element once CollapseProject merged the ts projection
    # into the lambda body (profiled A/B at sf0.1: 1.02 s inline vs
    # 0.11 s over a materialized ts — ~0.9 s of duplicated shingling).
    # Folding the OTHER way keeps the shingle array in `aggregate`'s
    # ARGUMENT position, where it is evaluated exactly once per row,
    # with no materialization: the accumulator is the H running minima,
    # each gram folds in via least(acc_i, md5(g||'#'||i)). Values are
    # bit-identical to the array_min form — same md5 bytes, same
    # lexicographic min, the "g" sentinel sorts after every 0-f hex
    # digest and the gram array is never empty (greatest(..., 1)).
    sig = F.aggregate(
        F.col("ts"),
        F.array_repeat(F.lit("g"), _MHC_H),
        lambda acc, g: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(_MHC_H - 1)),
            lambda m, i: F.least(
                m, F.md5(F.concat(g, F.lit("#"), i.cast("string")))
            ),
        ),
    )
    # the signature relation (id + the 8-hash array, the artifact a
    # real deployment materializes at ingest) feeds banding AND both
    # join sides — compute it once, not three times
    mh = (
        d.select("doc_id", grams.alias("ts"))
        .select("doc_id", sig.alias("sig"))
        .localCheckpoint(eager=False)
    )
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(_MHC_BANDS - 1)),
        lambda b: F.struct(
            b.alias("b"),
            F.md5(
                F.concat(F.get(F.col("sig"), 2 * b), F.get(F.col("sig"), 2 * b + 1))
            ).alias("bv"),
        ),
    )
    bands = mh.select("doc_id", F.explode(band_arr).alias("band")).select(
        "doc_id", F.col("band.b").alias("b"), F.col("band.bv").alias("bv")
    )
    other = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("b").alias("b2"),
        F.col("bv").alias("bv2"),
    )
    cand = (
        bands.join(
            other,
            (F.col("b2") == F.col("b"))
            & (F.col("bv2") == F.col("bv"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
        # bucket-bounded pair list; 3 consumers below (both verify-leg
        # semi-joins + the scoring join) — materialize the bucket
        # self-join once instead of re-running it per consumer
        .localCheckpoint(eager=False)
    )
    # Verify legs (round 15, the q_dedup_near discipline): shingle ONLY
    # docs that appear in a candidate pair — semi-join first, shingle
    # after. The old form computed the shingle expression corpus-wide
    # TWICE (once per join leg) and let the join discard the misses;
    # on a mostly-clean corpus the candidate slice is a vanishing
    # fraction of the scan at any scale.
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = d.join(cand_ids, "doc_id", "left_semi").select(
        "doc_id", grams.alias("ts")
    )
    a = mh.join(sets, "doc_id").select(
        F.col("doc_id").alias("doc_a"),
        F.col("ts").alias("ts_a"),
        F.col("sig").alias("sig_a"),
    )
    b = mh.join(sets, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("ts").alias("ts_b"),
        F.col("sig").alias("sig_b"),
    )
    # matching-position count over the two equal-length signature
    # arrays — the folded form of the old H-wide CASE WHEN sum (size
    # returns the same int the cast produced)
    n_match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    jacc = F.size(F.array_intersect("ts_a", "ts_b")) / F.size(
        F.array_union("ts_a", "ts_b")
    )
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(n_match.alias("n_match"), jacc.alias("jacc"))
    )
    return (
        scored.groupBy("n_match")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jacc"), 4).alias("avg_jaccard"),
            F.round(F.min("jacc"), 4).alias("min_jaccard"),
            F.round(F.max("jacc"), 4).alias("max_jaccard"),
        )
        .select(
            "n_match",
            F.round(F.col("n_match") / float(_MHC_H), 4).alias("est_jaccard"),
            "n_pairs",
            "avg_jaccard",
            "min_jaccard",
            "max_jaccard",
        )
    )


q_minhash_calibration.__doc__ = q_minhash_calibration.__doc__.replace(
    "{_MHC_H}", str(_MHC_H)
).replace("{_MHC_BANDS}", str(_MHC_BANDS)).replace(
    "{_MHC_SHINGLE}", str(_MHC_SHINGLE)
)
