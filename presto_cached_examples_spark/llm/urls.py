"""URL/domain-aware curation operators — the CommonCrawl-style steps
content-similarity dedup doesn't cover.

Two first-class operators (VERDICT r4 "Next round" item 7):

- ``q_dedup_url``: URL canonicalization + exact dedup on the canonical
  form. Web corpora carry the same page under many spellings — http vs
  https, a ``www.`` prefix, trailing slashes, ``utm_*`` tracking
  params, query-string order, fragments. Canonicalize first and the
  scrape-dedup step collapses them all before any expensive text pass.
- ``q_domain_caps``: per-domain document caps — rank each domain's
  docs by a quality proxy and keep the top N, the standard guard
  against a single crawler-friendly domain dominating a training mix.

The documents fixture has no URL column, so each doc's URL is DERIVED
deterministically from ``doc_id``/``source`` (same construction stated
in both engines — the md5-derived-bits discipline of q_dedup_simhash):
the generator deliberately varies scheme, www-prefix, trailing slash,
param order, tracking params, and fragments across docs that share a
(site-shard, page-id) identity, so canonicalization has real work to
undo. The canonicalizer itself parses the URL string generically
(regexp host/path/query extraction) — it never peeks at the
construction arithmetic.

Reference provenance: C7 file-source path normalization
(/root/reference/src/fileio.cpp:8-44) — normalize the name space
before keying anything on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table

_DOMAIN_CAP = 10  # max docs admitted per registered domain

# Deterministic raw-URL synthesis, stated identically on both engines.
# Identity = (site shard, page id); everything else is presentation
# noise the canonicalizer must strip.
_GEN_SQL = """
      SELECT doc_id, n_chars,
        (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://' ||
        (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
        'site' || (doc_id % 4) || '.example.com' ||
        '/p/' || ((doc_id // 4) % 31) ||
        (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        (CASE WHEN doc_id % 2 = 0
              THEN '?utm_campaign=c' || (doc_id % 6) || '&v=' || ((doc_id // 4) % 31)
              ELSE '?v=' || ((doc_id // 4) % 31) || '&utm_campaign=c' || (doc_id % 6)
         END) ||
        (CASE WHEN doc_id % 7 = 0 THEN '#sec' || (doc_id % 3) ELSE '' END)
        AS raw_url
      FROM documents
"""


def _gen_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_GEN_SQL`` (pure integer/string map-side work)."""
    d = load_table(spark, sf_dir, "documents")
    s = lambda c: c.cast("string")  # noqa: E731
    # `div` = exact integer division, matching DuckDB's integer `//`;
    # the previous double-divide-then-truncate diverges for
    # doc_id >= 2^53 (double precision) and negative ids (ADVICE r5).
    page = F.expr("doc_id div 4") % 31
    raw = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), s(F.col("doc_id") % 4), F.lit(".example.com"),
        F.lit("/p/"), s(page),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?utm_campaign=c"), s(F.col("doc_id") % 6), F.lit("&v="), s(page)),
        ).otherwise(
            F.concat(F.lit("?v="), s(page), F.lit("&utm_campaign=c"), s(F.col("doc_id") % 6))
        ),
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit("#sec"), s(F.col("doc_id") % 3))
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", "n_chars", raw.alias("raw_url"))


def _canonical(url_col) -> "F.Column":
    """Generic URL canonicalization as built-in column expressions:
    force https, lowercase host, strip ``www.``, strip trailing slash,
    drop ``utm_*`` params, sort surviving params, drop fragment.
    Entirely JVM-side (regexp + array HOFs) — no UDF."""
    host0 = F.lower(F.regexp_extract(url_col, r"^[a-zA-Z]+://([^/?#]+)", 1))
    host = F.when(host0.like("www.%"), F.substring(host0, 5, 1 << 20)).otherwise(host0)
    path0 = F.regexp_extract(url_col, r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    path = F.when(
        (path0 != "/") & path0.like("%/"),
        F.substring(path0, 1, F.length(path0) - 1),
    ).otherwise(path0)
    qs = F.regexp_extract(url_col, r"\?([^#]*)", 1)
    params = F.array_join(
        F.array_sort(F.filter(F.split(qs, "&"), lambda p: ~p.like("utm_%"))), "&"
    )
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )


# DuckDB twin of _canonical, over a relation exposing raw_url.
_CANON_SQL = """
      SELECT doc_id, n_chars, raw_url,
        'https://' ||
        (CASE WHEN host0 LIKE 'www.%' THEN host0[5:] ELSE host0 END) ||
        (CASE WHEN path0 <> '/' AND path0 LIKE '%/'
              THEN path0[1:LEN(path0) - 1] ELSE path0 END) ||
        (CASE WHEN qs2 = '' THEN '' ELSE '?' || qs2 END) AS canonical_url
      FROM (
        SELECT *,
          array_to_string(
            list_sort(list_filter(string_split(qs, '&'), p -> p NOT LIKE 'utm_%')),
            '&') AS qs2
        FROM (
          SELECT doc_id, n_chars, raw_url,
                 LOWER(regexp_extract(raw_url, '^[a-zA-Z]+://([^/?#]+)', 1)) AS host0,
                 regexp_extract(raw_url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1) AS path0,
                 regexp_extract(raw_url, '\\?([^#]*)', 1) AS qs
          FROM gen
        )
      )
"""


@register(
    "q_dedup_url",
    category="llm-dedup",
    oracle=f"""
    WITH gen AS ({_GEN_SQL}),
    canon AS ({_CANON_SQL})
    SELECT canonical_url,
           COUNT(*) AS n_variants,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_distinct_raw,
           MIN(doc_id) AS keeper_doc
    FROM canon
    GROUP BY canonical_url
    """,
)
def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup: every raw URL is normalized
    (https, no www, no trailing slash, no utm_* params, sorted query
    string, no fragment) and docs collapse onto their canonical URL —
    one row per canonical page with the variant count, the distinct
    raw spellings observed, and the kept (min-id) doc.

    Scale: canonicalization is pure map-side JVM string work (regexp +
    array HOFs — no UDF, no shuffle); the only shuffle is the groupBy
    on the canonical URL, a high-cardinality uniform key (pages), which
    partial-aggregates map-side like any hash agg. This is the cheapest
    dedup tier — it runs BEFORE MinHash/SimHash so content similarity
    never pays for what string identity already catches."""
    g = _gen_urls(spark, sf_dir)
    return (
        g.withColumn("canonical_url", _canonical(F.col("raw_url")))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct("raw_url").cast("long").alias("n_distinct_raw"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )


@register(
    "q_domain_caps",
    category="llm-dedup",
    oracle=f"""
    WITH gen AS ({_GEN_SQL}),
    canon AS ({_CANON_SQL}),
    ranked AS (
      SELECT regexp_extract(canonical_url, '^https://([^/]+)', 1) AS domain,
             n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY regexp_extract(canonical_url, '^https://([^/]+)', 1)
               ORDER BY n_chars DESC, doc_id
             ) AS rn
      FROM canon
    )
    SELECT domain,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           MIN(CASE WHEN rn <= {_DOMAIN_CAP} THEN n_chars END) AS admit_threshold
    FROM ranked
    GROUP BY domain
    """,
)
def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps: docs rank within their registered
    domain by a quality proxy (n_chars desc, doc_id tiebreak) and only
    the top {cap} are admitted — the mix-balancing guard that stops one
    crawler-friendly domain from dominating a training corpus. Reports
    per domain: doc count, admitted count, admitted volume, and the
    admission threshold (the smallest n_chars that made the cut).

    Scale: the admitted side is a real `row_number <= cap` filter over
    a domain-partitioned window, which Spark pushes down as
    WindowGroupLimit — each map task keeps only its local top-cap per
    domain BEFORE the shuffle, so per-domain window state is O(cap),
    never O(docs-in-domain), and a mega-domain costs its scan, not its
    sort (plan-asserted in tests/test_plans.py). The total doc count
    comes from a separate plain hash aggregate (computing it on the
    ranked rows would force every row through the window and kill the
    pushdown); both per-domain relations are domain-cardinality-bounded
    and meet in a broadcast-sized join."""
    g = _gen_urls(spark, sf_dir).withColumn(
        "canonical_url", _canonical(F.col("raw_url"))
    )
    dom = F.regexp_extract("canonical_url", r"^https://([^/]+)", 1)
    docs = g.select(dom.alias("domain"), "n_chars", "doc_id")
    totals = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("domain").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    admitted = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
            F.min("n_chars").alias("admit_threshold"),
        )
    )
    return totals.join(F.broadcast(admitted), "domain").select(
        "domain", "n_docs", "n_kept", "kept_chars", "admit_threshold"
    )


q_domain_caps.__doc__ = q_domain_caps.__doc__.replace("{cap}", str(_DOMAIN_CAP))
