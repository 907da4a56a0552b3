"""Skew-aware join: explicit key salting (the manual counterpart of AQE
skew-join splitting, SURVEY.md §4.2).

At 100 TB a single hot key (one power user, one boilerplate document
fingerprint) can funnel most of a shuffle into one reducer. AQE splits
skewed partitions when it can see them; salting is the explicit,
always-works variant: the big side's rows scatter across `n_salts`
sub-keys derived deterministically from the row itself, the small side
replicates once per salt, and the join key becomes (key, salt) — the
hot key's rows now land on `n_salts` reducers instead of one.

Cost model: small side × n_salts rows shuffled (bounded — use for
dimension-vs-skewed-fact), big side unchanged. Result set is exactly
the plain join's (asserted in tests/test_skew.py and by q_join_salted's
SQL oracle, which is the *unsalted* join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table

_SALT = "__salt"
_TOPK_SKEW_K = 5
_TOPK_SKEW_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[tuple[str, str]],
    n_salts: int = 8,
    how: str = "inner",
    salt_src: list[str] | None = None,
) -> DataFrame:
    """Join `big` ⋈ `small` on [(big_key, small_key), ...] with the big
    side salted `n_salts` ways.

    The salt is deterministic — pmod(xxhash64(salt_src), n) over the
    big side's own columns (default: its join keys plus all columns) —
    so the operator is replayable and testable; distribution quality
    only needs the hash to spread rows of the SAME key, so `salt_src`
    should include at least one column that varies within a key.

    Supported `how`: inner / left / left_semi / left_anti (the variants
    where every small-side row either matches or disappears). right and
    full would emit each unmatched small-side row once per salt replica
    (n_salts null-padded duplicates), breaking the plain-join contract —
    for those, salt the other way around or dedup after; we refuse
    loudly rather than return silently-wrong rows."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    norm = how.replace("_", "").lower()
    if norm not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — unmatched small-side "
            f"rows would duplicate once per salt; use one of {sorted(allowed)}"
        )
    salt_cols = salt_src if salt_src is not None else big.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    big_s = big.withColumn(_SALT, salt)
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = big_s[_SALT] == small_s[_SALT]
    for bk, sk in keys:
        cond = cond & (big_s[bk] == small_s[sk])
    return big_s.join(small_s, cond, how).drop(_SALT)


@register(
    "q_join_salted",
    category="join",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_nationkey,
           ROUND(o.o_totalprice, 2) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted orders ⋈ customer — the oracle is the PLAIN join: salting
    must be invisible in the result, only in the shuffle layout."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return salted_join(
        o, c, keys=[("o_custkey", "c_custkey")], n_salts=8, salt_src=["o_orderkey"]
    ).select("o_orderkey", "c_custkey", "c_nationkey", "o_totalprice")


@register(
    "q_topk_skewed",
    category="window",
    oracle=f"""
    SELECT o_orderstatus, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey) AS INT) AS rk
      FROM orders
    ) WHERE rk <= {_TOPK_SKEW_K}
    """,
)
def q_topk_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k under extreme key skew — q_topk_group's answer when
    a partition key has corpus-scale groups (o_orderstatus has THREE
    values, so a plain per-key window sorts a third of the table on one
    reducer). Two-level decomposition: rank within (key, salt) and keep
    each salt's local top-k, then re-rank the surviving ≤ salts×k rows
    per key. Exact by a pigeonhole argument: every global top-k row is
    in its own salt's top-k, so level 1 never discards a winner — the
    oracle is the PLAIN windowed top-k, like q_join_salted's is the
    plain join.

    Scale: level 1 plans a WindowGroupLimit over (key, salt) — each map
    task keeps k rows per (key, salt) before any shuffle, and the hot
    key's rows spread over `salts` reducers; level 2's partitions are
    domain-bounded (salts × k rows per key). No data-proportional
    window partition anywhere — the property the demoted exact twins
    violated."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    salt = F.pmod(F.xxhash64("o_orderkey"), F.lit(_TOPK_SKEW_SALTS))
    w_local = Window.partitionBy("o_orderstatus", _SALT).orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    w_global = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn(_SALT, salt)
        .withColumn("lrn", F.row_number().over(w_local))
        .filter(F.col("lrn") <= _TOPK_SKEW_K)
        .withColumn("rk", F.row_number().over(w_global))
        .filter(F.col("rk") <= _TOPK_SKEW_K)
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "rk")
    )
