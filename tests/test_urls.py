"""Unit tests for the URL curation family (llm/urls.py).

The oracle-parity test already certifies q_dedup_url/q_domain_caps
end-to-end against DuckDB; these pin the GENERIC canonicalizer
behavior on URL shapes the synthetic generator never produces —
uppercase schemes/hosts, utm-only query strings, bare roots,
fragment-only tails — so the operator stays a real URL normalizer,
not a private inverse of the fixture construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_cached_examples_spark.llm.urls import _DOMAIN_CAP, _canonical


def canon_one(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(_canonical(F.col("u")).alias("c"))
        .collect()[0]["c"]
    )


@pytest.mark.parametrize(
    ("raw", "expect"),
    [
        # scheme forced to https, www stripped, trailing slash stripped
        ("http://www.Example.COM/a/b/", "https://example.com/a/b"),
        # HTTPS + uppercase scheme tolerated by the parser
        ("HTTPS://site.org/x", "https://site.org/x"),
        # utm params dropped; survivors sorted; '?' kept only if any survive
        (
            "https://h.com/p?z=1&utm_source=feed&a=2",
            "https://h.com/p?a=2&z=1",
        ),
        ("https://h.com/p?utm_a=1&utm_b=2", "https://h.com/p"),
        # fragment always dropped
        ("https://h.com/p?a=1#frag", "https://h.com/p?a=1"),
        ("https://h.com/p#only-frag", "https://h.com/p"),
        # root path: a lone '/' is NOT a trailing slash to strip
        ("http://h.com/", "https://h.com/"),
        # no path, no query
        ("https://www.h.com", "https://h.com"),
    ],
)
def test_canonicalizer_generic_shapes(spark, raw, expect):
    assert canon_one(spark, raw) == expect


def test_canonicalizer_is_idempotent(spark):
    """canon(canon(u)) == canon(u) — the defining property of a
    normal form; a canonicalizer that keeps moving is a dedup bug."""
    urls = [
        "http://www.A.com/x/?b=2&utm_x=9&a=1#f",
        "https://h.com/p/",
        "http://h.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(_canonical(F.col("u")).alias("c"))
    twice = once.select(_canonical(F.col("c")).alias("c2"), "c")
    for row in twice.collect():
        assert row["c2"] == row["c"]


def test_domain_caps_respects_cap(spark):
    """No domain ever admits more than _DOMAIN_CAP docs, and admitted
    counts/chars are consistent with the per-domain doc counts."""
    from presto_cached_examples_spark.registry import all_specs
    from tests.conftest import SF_TINY

    rows = all_specs()["q_domain_caps"].fn(spark, SF_TINY).collect()
    assert rows, "no domains produced"
    for r in rows:
        assert r["n_kept"] <= _DOMAIN_CAP
        assert r["n_kept"] <= r["n_docs"]
        assert r["kept_chars"] >= r["n_kept"] * 0  # non-negative volume
        assert r["admit_threshold"] is not None


def test_canonicalizer_matches_urllib_reference(spark):
    """Cross-check the Spark canonicalizer against an independent pure-
    Python reference built on urllib.parse over every raw URL the
    synthetic generator produces at sf0.001 — a third opinion besides
    the DuckDB oracle."""
    from urllib.parse import urlsplit

    from presto_cached_examples_spark.llm.urls import _gen_urls
    from tests.conftest import SF_TINY

    def py_canon(u: str) -> str:
        parts = urlsplit(u)
        host = parts.netloc.lower()
        host = host[4:] if host.startswith("www.") else host
        path = parts.path
        if path.endswith("/") and path != "/":
            path = path[:-1]
        params = sorted(p for p in parts.query.split("&") if p and not p.startswith("utm_"))
        return "https://" + host + path + ("?" + "&".join(params) if params else "")

    g = _gen_urls(spark, SF_TINY)
    from pyspark.sql import functions as F2
    from presto_cached_examples_spark.llm.urls import _canonical

    rows = g.select("raw_url", _canonical(F2.col("raw_url")).alias("c")).collect()
    assert rows
    for r in rows:
        assert r["c"] == py_canon(r["raw_url"]), (r["raw_url"], r["c"], py_canon(r["raw_url"]))
