"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2.B registers here with a builder
function `(spark, sf_dir) -> DataFrame` and, when SQL-expressible, an
ANSI-SQL oracle string DuckDB can run over the same parquet views.
`__spark_entry__.py` exposes this registry to the driver.

Discipline (SURVEY.md §5.2 / FIXTURES.md): every computed column is
aliased identically on both sides; double-typed aggregates are wrapped
in ROUND(x, 2) on both sides so summation-order ULP drift can't break
the order-insensitive value hash.

Build-time-action contract (ADVICE r6 item 4): builder functions are
ALLOWED to run bounded, model-sized Spark jobs at plan-construction
time when the query depends on a learned or measured artifact — k-means
codebooks (llm/similarity._CODEBOOK_CACHE), range split points
(operators/distwindows.global_rank's approxQuantile), the standing-
corpus count that sizes the incremental-dedup Bloom filter, the
bucketed/evolved warehouse materializations. All such artifacts are
memoized per (session_token, sf_dir), so only the FIRST build per
session pays; every later build is pure plan assembly
(tests/test_round7_ops.py pins this with a job-group probe). Callers
that need strictly action-free construction should warm the session
once, or treat the first build as ingest.
"""

from __future__ import annotations

import importlib
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_ROUND_RE = re.compile(r"\bROUND\s*\(", re.IGNORECASE)


def _search_outside_literals(sql: str, pos: int) -> "re.Match[str] | None":
    """Find the next ``ROUND(`` that is NOT inside a ``'...'`` string
    literal or a ``--`` line comment. The paren-matching pass below
    already skips literals; without the same discipline HERE, an oracle
    containing ``ROUND(`` inside a quoted literal or comment would be
    rewritten into corrupted SQL (ADVICE r5 item 1)."""
    i = pos
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # string literal ('' escapes itself)
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            i += 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":  # line comment
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl + 1
        else:
            m = _ROUND_RE.match(sql, i)
            if m:
                return m
            i += 1
    return None


def _paren_balance(sql: str) -> int:
    """Net paren balance counting only parens outside string literals
    and line comments — the transform's loud-failure invariant."""
    bal = 0
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl
            continue
        elif c == "(":
            bal += 1
        elif c == ")":
            bal -= 1
        i += 1
    return bal


def neutralize_negative_zero(sql: str) -> str:
    """Rewrite every ``ROUND(...)`` in an oracle to ``(ROUND(...) + 0.0)``.

    DuckDB's ROUND is IEEE sign-preserving: a tiny negative double rounds
    to ``-0.0``, while Spark's ROUND goes through BigDecimal (no signed
    zero) and yields ``+0.0``. The driver's value hasher distinguishes the
    two, so any oracle whose rounded double can be tiny-and-negative
    (z-scores, PMI, log-ratios, slopes, lags, correlations) is one unlucky
    fixture row away from a hash mismatch — round 4 shipped exactly two
    (q_text_pmi, q_embed_outliers). ``x + 0.0`` is the IEEE-sanctioned
    normalization (``-0.0 + 0.0 == +0.0``; every other value, incl. NULL,
    is unchanged) and DOUBLE + 0.0 stays DOUBLE, so the transform is a
    semantic no-op everywhere except the one bit it exists to kill.

    Applied uniformly at registration so the local checker and the driver
    both see the neutralized SQL — a blanket discipline, not per-query
    spot patches.
    """
    out: list[str] = []
    pos = 0
    while True:
        m = _search_outside_literals(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        out.append(sql[pos : m.start()])
        # find the close paren matching ROUND's open paren
        depth = 0
        i = m.end() - 1  # index of the '('
        n = len(sql)
        while i < n:
            c = sql[i]
            if c == "'":  # skip string literals ('' escapes itself)
                i += 1
                while i < n:
                    if sql[i] == "'":
                        if i + 1 < n and sql[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        # recurse so nested ROUNDs inside the call get wrapped too;
        # split at the matched open paren (m.end()-1), not a fixed
        # "ROUND(" offset — the regex also matches "ROUND (" with space
        head = sql[m.start() : m.end()]  # "ROUND(" incl. any whitespace
        inner = head + neutralize_negative_zero(sql[m.end() : i]) + ")"
        out.append("(" + inner + " + 0.0)")
        pos = i + 1

# Modules that register queries on import.
_QUERY_MODULES = (
    "presto_cached_examples_spark.operators.scans",
    "presto_cached_examples_spark.operators.joins",
    "presto_cached_examples_spark.operators.aggregates",
    "presto_cached_examples_spark.operators.windows",
    "presto_cached_examples_spark.operators.setops",
    "presto_cached_examples_spark.operators.analytics",
    "presto_cached_examples_spark.operators.tpch_extra",
    "presto_cached_examples_spark.operators.distwindows",
    "presto_cached_examples_spark.operators.behavioral",
    "presto_cached_examples_spark.operators.graph",
    "presto_cached_examples_spark.llm.sampling",
    "presto_cached_examples_spark.operators.skew",
    "presto_cached_examples_spark.operators.scalars",
    "presto_cached_examples_spark.functions.udfs",
    "presto_cached_examples_spark.llm.text",
    "presto_cached_examples_spark.llm.dedup",
    "presto_cached_examples_spark.llm.similarity",
    "presto_cached_examples_spark.llm.multimodal",
    "presto_cached_examples_spark.llm.pipeline",
    "presto_cached_examples_spark.llm.urls",
    "presto_cached_examples_spark.streaming.windows",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    category: str
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False

# Verification rotation (round 16): the driver's correctness harness checks
# only the FIRST 50 queries in the order `queries()` yields them. Every
# registered query has a hard driver row (CORRECTNESS_r01-r15, zero reds
# since r4), so rotation is pure oldest-green-first refresh. This front =
# the 45 queries whose latest green driver row is round 11, plus the 5
# oldest round-12 greens, in registration order — after this round no
# query's last driver check is older than round 12 (VERDICT r15 item 6).
# Round-16 bonus: the front holds several r15-rewritten paths
# (q_text_fingerprint, q_text_langid, q_agg_percentiles_approx,
# q_ntile_spend, q_dedup_embed, q_drift_report), so the driver re-gates
# last round's rewrites with fresh rows.
# Everything outside the window is locally re-verified every round by
# tests/test_oracle_parity.py and tools/check_oracles.py, which hash raw
# float repr (driver-strength).
_VERIFY_FRONT: tuple[str, ...] = (
    # latest green driver row: round 11 (45) + oldest round-12 greens (5)
    "q_except",
    "q_agg_corr",
    "q_pivot",
    "q_unpivot",
    "q_window_firstlast",
    "q_string_regexp",
    "q_sessionize",
    "q_subquery_in",
    "q_subquery_corr",
    "q_agg_groupingid",
    "q_agg_argminmax",
    "q_date_series",
    "q_values_cte",
    "q_top_unshipped",
    "q_returned_revenue",
    "q_filtered_revenue",
    "q_promo_share",
    "q_agg_stringagg",
    "q_window_lead",
    "q_agg_decimal",
    "q_exists_agg",
    "q_null_ordering",
    "q_histogram",
    "q_cond_count",
    "q_agg_percentiles_approx",
    "q_window_dist_scalable",
    "q_sample_stratified",
    "q_join_salted",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_case_expr",
    "q_array_funcs",
    "q_subquery_scalar",
    "udf_pack_pen",
    "udaf_weighted_avg",
    "q_text_tokens",
    "q_text_langstats",
    "q_text_quality",
    "q_text_langid",
    "q_token_count",
    "q_text_fingerprint",
    "q_text_vocab",
    "q_sim_topk_kmeans",
    "q_dedup_embed",
    "q_snapshot_diff",
    "q_drift_report",
    "q_join_asof",
    "q_fuzzy_match",
    "q_ntile_spend",
)

DRIVER_WINDOW = 50  # how many leading queries the driver's harness checks

# Rotation queue for round 17: the remaining round-12 greens in
# registration order, then the 5 oldest round-13 greens (computed from
# CORRECTNESS_r01-r15; staleness histogram before this round:
# r11:45 r12:50 r13:50 r14:50 r15:50). All locally hash-verified every
# run regardless of driver-window position.
_VERIFY_NEXT: tuple[str, ...] = (
    # latest green driver row: round 12 (45) + oldest round-13 greens (5)
    "q_returns_wilson",
    "q_volume_shipping",
    "q_mkt_share",
    "q_cust_order_dist",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_big_orders",
    "q_disjunctive_revenue",
    "q_sole_return_supplier",
    "q_global_sales_opp",
    "q_min_cost_supplier",
    "q_important_stock",
    "q_shipmode_priority",
    "q_parts_supplier_count",
    "q_dominant_supplier",
    "q_window_range_scalable",
    "q_events_funnel",
    "q_retention_cohort",
    "q_events_rollup",
    "q_rfm_segments",
    "q_basket_rules",
    "q_sample_hash_topk",
    "q_json_funcs",
    "q_text_tfidf",
    "q_text_repetition",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_near",
    "q_sim_topk",
    "q_sim_topk_ivf",
    "q_ann_recall_sweep",
    "q_dedup_incremental_bloom",
    "q_dedup_span",
    "q_mm_meta",
    "q_mm_features",
    "q_mm_resize",
    "q_mm_frames",
    "q_chunk_docs",
    "q_pack_sequences",
    "q_decontam",
    "q_decontam_hashed",
    "q_text_normalize",
    "q_quality_dsir",
    "q_pii_scrub",
    "q_stream_tumbling",
    "q_scan_project",
    "q_filter_basic",
    "q_filter_like_null",
    "q_scan_pruned",
    "q_scan_evolved",
)


def register(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query builder to the engine surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        neutralized = None
        if oracle is not None:
            neutralized = neutralize_negative_zero(oracle)
            # Loud-failure guard (ADVICE r5 item 1): the transform only
            # adds balanced "( ... + 0.0)" wrappers, so the net paren
            # balance outside literals/comments must be unchanged. A
            # mis-parse (e.g. a pathological literal) corrupts SQL here,
            # at registration, not at oracle-run time.
            if _paren_balance(neutralized) != _paren_balance(oracle):
                raise ValueError(
                    f"neutralize_negative_zero corrupted oracle for {name!r}: "
                    "paren balance changed"
                )
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=neutralized,
            category=category,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip, don't fail
            # the whole surface.
            if mod.split(".")[-1] not in str(e):
                raise
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    """All registered queries, verification-rotation order.

    Names in ``_VERIFY_FRONT`` come first (in that order) so they fall
    inside the driver's first-``DRIVER_WINDOW`` correctness check; the
    rest follow in registration order.
    """
    _ensure_loaded()
    # ADVICE r14/r15 (low): a typo'd/stale rotation entry must fail
    # loudly, not silently shrink the driver's verification front while
    # the displaced query keeps its stale green row. Validate the staged
    # queue too (a stale _VERIFY_NEXT name would otherwise hide until
    # its promotion next round), and raise instead of assert so the
    # guard survives `python -O`.
    for label, cohort in (("_VERIFY_FRONT", _VERIFY_FRONT), ("_VERIFY_NEXT", _VERIFY_NEXT)):
        unknown = set(cohort) - set(_REGISTRY)
        if unknown:
            raise ValueError(f"{label} names not registered: {sorted(unknown)}")
    front = [n for n in _VERIFY_FRONT if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(front)]
    return {n: _REGISTRY[n] for n in (*front, *rest)}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
