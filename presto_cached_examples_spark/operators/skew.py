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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table

_SALT = "__salt"


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
