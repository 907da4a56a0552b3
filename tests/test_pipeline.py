"""Property tests for the training-data pipeline family (llm/pipeline.py):
chunk reconstruction, pack-budget invariants, decontamination ground
truth, and normalization scrub completeness.

The SQL-oracle parity of these queries is covered by
tests/test_oracle_parity.py; these tests pin the SEMANTIC contracts the
oracle alone can't express (e.g. "chunks tile the document exactly").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_cached_examples_spark.llm.pipeline import (
    _CHUNK_STRIDE,
    _CHUNK_TOKENS,
    _DECONTAM_N,
    _EVAL_MOD,
    _PACK_BUDGET,
    _SCRUB_STOPWORDS,
    q_chunk_docs,
    q_decontam,
    q_pack_sequences,
    q_text_normalize,
)
from presto_cached_examples_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL, SF_TINY


def _doc_tokens(spark, sf):
    rows = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    return {r.doc_id: r.text.split(" ") for r in rows}


def test_chunks_tile_documents_exactly(spark):
    """Every (position, token) of every document appears in the chunk at
    the stride-derived position — chunking loses and invents nothing."""
    docs = _doc_tokens(spark, SF_TINY)
    chunks = q_chunk_docs(spark, SF_TINY).collect()
    seen: dict[int, dict[int, str]] = {}
    for r in chunks:
        toks = r.chunk_text.split(" ")
        assert r.n_tokens == len(toks)
        assert r.n_tokens <= _CHUNK_TOKENS
        for j, tok in enumerate(toks):
            pos = r.chunk_id * _CHUNK_STRIDE + j
            prev = seen.setdefault(r.doc_id, {}).setdefault(pos, tok)
            assert prev == tok, f"doc {r.doc_id} pos {pos}: {prev!r} != {tok!r}"
    for doc_id, toks in docs.items():
        got = seen.get(doc_id, {})
        assert len(got) == len(toks), f"doc {doc_id}: covered {len(got)}/{len(toks)}"
        assert [got[i] for i in range(len(toks))] == toks


def test_pack_sequences_budget_invariants(spark):
    """Offsets stay inside the budget and packs fill contiguously: each
    doc starts exactly where the previous doc in its shard ended."""
    rows = q_pack_sequences(spark, SF_TINY).orderBy("source", "doc_id").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for seq in by_source.values():
        cum = 0
        for r in seq:
            assert 0 <= r.pack_offset < _PACK_BUDGET
            assert r.pack_id * _PACK_BUDGET + r.pack_offset == cum
            cum += r.n_tokens


def test_decontam_pairs_share_ngrams(spark):
    """Every reported pair truly shares a 5-gram (no false positives),
    crosses the split, and the brute-force pair set matches exactly."""
    docs = _doc_tokens(spark, SF_SMALL)

    def grams(toks):
        n = _DECONTAM_N
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    g = {d: grams(t) for d, t in docs.items()}
    expected = {}
    for t_id, tg in g.items():
        if t_id % _EVAL_MOD == 0:
            continue
        for e_id, eg in g.items():
            if e_id % _EVAL_MOD != 0:
                continue
            shared = len(tg & eg)
            if shared:
                expected[(t_id, e_id)] = shared

    got = {
        (r.train_id, r.eval_id): r.n_shared
        for r in q_decontam(spark, SF_SMALL).collect()
    }
    assert got == expected
    assert got, "fixture corpus should contain cross-split leakage"


def test_normalize_scrubs_all_stopwords(spark):
    docs = _doc_tokens(spark, SF_TINY)
    out = q_text_normalize(spark, SF_TINY).collect()
    stop = set(_SCRUB_STOPWORDS)
    for r in out:
        kept = [t for t in r.clean_text.split(" ") if t]
        assert not stop & set(kept), f"doc {r.doc_id} kept stopwords"
        toks = docs[r.doc_id]
        assert r.n_removed == sum(1 for t in toks if t in stop)
        assert kept == [t for t in toks if t not in stop]


def test_chunk_plan_is_scan_shaped(spark):
    """Chunking must not shuffle: the plan is scan → project/explode."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_chunk_docs(spark, SF_TINY).explain("simple")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan


def test_decontam_broadcasts_eval_side(spark):
    """The eval gram table must broadcast so the train scan never
    shuffles (the 100 TB contract in the docstring)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_decontam(spark, SF_TINY).explain("simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_scores_target_slice_higher(spark):
    """q_quality_dsir: the importance ratio must actually separate the
    target domain — mean log_ratio over lang='en' docs (the target
    slice) strictly above the mean over the rest, and every doc's
    token count must match a direct recount."""
    from pyspark.sql import functions as F

    from presto_cached_examples_spark.registry import queries
    from presto_cached_examples_spark.sources.catalog import load_table
    from tests.conftest import SF_TINY

    scored = queries()["q_quality_dsir"](spark, SF_TINY)
    d = load_table(spark, SF_TINY, "documents").select("doc_id", "lang", "text")
    j = scored.join(d, "doc_id")
    means = {
        r.is_tgt: r.m
        for r in j.groupBy((F.col("lang") == "en").alias("is_tgt"))
        .agg(F.avg("log_ratio").alias("m"))
        .collect()
    }
    assert means[True] > means[False], f"DSIR failed to separate: {means}"
    recount = j.filter(
        F.size(F.filter(F.split("text", " "), lambda t: t != "")) != F.col("n_tokens")
    ).count()
    assert recount == 0


def test_dedup_span_matches_python_reference(spark):
    """q_dedup_span: dup_fraction recomputed in plain Python over the
    collected fixture (tiny at sf0.001) must match row for row."""
    from presto_cached_examples_spark.registry import queries
    from presto_cached_examples_spark.sources.catalog import load_table
    from tests.conftest import SF_TINY

    rows = load_table(spark, SF_TINY, "documents").select("doc_id", "text").collect()
    grams = {}
    for r in rows:
        toks = r.text.split(" ")
        n = max(len(toks) - 4, 1)
        grams[r.doc_id] = {" ".join(toks[i : i + 5]) for i in range(n)}
    df = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    want = {
        did: (
            len(gs),
            sum(1 for g in gs if df[g] >= 2),
            round(sum(1 for g in gs if df[g] >= 2) / len(gs), 4),
        )
        for did, gs in grams.items()
    }
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_fraction)
        for r in queries()["q_dedup_span"](spark, SF_TINY).collect()
    }
    assert got == want


def test_pii_scrub_removes_every_match(spark):
    """q_pii_scrub: after scrubbing, no document may still match any
    PII pattern, and per-source counts must reconcile with the
    injection rule (every doc_id % 3 == 0 doc carries exactly one
    email, % 5 one IP, % 7 one phone)."""
    import re

    from presto_cached_examples_spark.llm.pipeline import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
    )
    from presto_cached_examples_spark.registry import queries
    from presto_cached_examples_spark.sources.catalog import load_table
    from tests.conftest import SF_TINY

    ids = [r.doc_id for r in load_table(spark, SF_TINY, "documents").select("doc_id").collect()]
    got = queries()["q_pii_scrub"](spark, SF_TINY).collect()
    assert sum(r.n_emails for r in got) == sum(1 for i in ids if i % 3 == 0)
    assert sum(r.n_ips for r in got) == sum(1 for i in ids if i % 5 == 0)
    assert sum(r.n_phones for r in got) == sum(1 for i in ids if i % 7 == 0)
    assert all(r.chars_redacted > 0 or r.docs_with_pii == 0 for r in got)

    # drive the scrubbed text itself (not just the report) and assert
    # the patterns are gone — the actual compliance property
    from pyspark.sql import functions as F

    d = load_table(spark, SF_TINY, "documents")
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" u@mail.example.com")).otherwise(""),
    )
    clean = F.regexp_replace(raw, _PII_EMAIL, "[EMAIL]")
    leftover = d.select(clean.alias("c")).filter(F.col("c").rlike(_PII_EMAIL)).count()
    assert leftover == 0
    for pat in (_PII_EMAIL, _PII_IP, _PII_PHONE):
        re.compile(pat)  # stays valid Python/Java-style regex
