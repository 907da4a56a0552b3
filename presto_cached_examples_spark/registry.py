"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2.B registers here with a builder
function `(spark, sf_dir) -> DataFrame` and, when SQL-expressible, an
ANSI-SQL oracle string DuckDB can run over the same parquet views.
`__spark_entry__.py` exposes this registry to the driver.

Discipline (SURVEY.md §5.2 / FIXTURES.md): every computed column is
aliased identically on both sides; double-typed aggregates are wrapped
in ROUND(x, 2) on both sides so summation-order ULP drift can't break
the order-insensitive value hash.
"""

from __future__ import annotations

import importlib
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_ROUND_RE = re.compile(r"\bROUND\s*\(", re.IGNORECASE)


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
        m = _ROUND_RE.search(sql, pos)
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

# Verification rotation (round 5): the driver's correctness harness checks
# only the FIRST 50 queries in the order `queries()` yields them. The
# driver has cumulatively confirmed 163 of the r4 surface (CORRECTNESS_r01
# -r04; the only two reds ever — q_text_pmi / q_embed_outliers — were the
# -0.0 ROUND divergence, fixed this round by `neutralize_negative_zero`).
# This round's front, in priority order:
# (a) the 24-query r4 overflow queue (_VERIFY_NEXT last round) — locally
#     hash-verified every run, never driver-run,
# (b) the 2 queries new in round 5 (URL/domain curation family),
# (c) the 2 r4 hash-fails, re-fronted to prove the -0.0 fix at the
#     driver's own hasher,
# (d) q_agg_percentiles — rewritten this round from the buffer-everything
#     exact `percentile` aggregate to the cent-bucket decomposition
#     (same oracle),
# (e) 21 of the 42 stalest r1 greens, oldest first: their last driver
#     rows predate both the r3 fixture regeneration and the r4
#     _TABLE_CACHE/spread() changes to the shared read path
#     (sources/catalog.py), so the code under their green rows has
#     shifted; q_agg_stats/q_agg_bitwise also still sit on pre-MICROS
#     events rows. 24+2+2+1+21 = 50 exactly.
# Still outside the window: the remaining 21 r1 greens + r2/r3 greens
# (queued in _VERIFY_NEXT for round 6), all locally re-verified every
# round by tests/test_oracle_parity.py and tools/check_oracles.py —
# which since round 5 hashes raw float repr (driver-strength).
_VERIFY_FRONT: tuple[str, ...] = (
    # (a) r4 overflow queue — first driver rows
    "q_path_trigrams",
    "q_pareto_half",
    "q_regression_zipf",
    "q_embed_sq8",
    "q_sample_weighted",
    "q_scan_csv",
    "q_scan_orc",
    "q_contamination_report",
    "q_mix_temperature",
    "q_stream_interval_left",
    "q_join_dpp",
    "q_cdc_scd2",
    "q_cohort_ltv",
    "q_dedup_containment",
    "q_layout_zorder",
    "q_ann_pipeline",
    "q_split_assign",
    "q_regression_elasticity",
    "q_dedup_cluster_resolve",
    "q_concurrency_peak",
    "q_bootstrap_ci",
    "q_funnel_windowed",
    "q_text_bigram_lm",
    "q_label_join",
    # (b) new in round 5
    "q_dedup_url",
    "q_domain_caps",
    # (c) the r4 -0.0 hash-fails, fixed (neutralize_negative_zero)
    "q_text_pmi",
    "q_embed_outliers",
    # (d) rewritten this round (cent-bucket exact percentiles)
    "q_agg_percentiles",
    # (e) stalest r1 greens, oldest first (shared read path changed
    # under their green rows; q_agg_stats/q_agg_bitwise also pre-MICROS)
    "q_scan_project",
    "q_filter_basic",
    "q_filter_like_null",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_multiway",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_agg_pricing",
    "q_agg_distinct",
    "q_agg_stats",
    "q_agg_bitwise",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_gsets",
    "q_agg_having",
    "q_agg_conditional",
    "q_window_rank",
)

DRIVER_WINDOW = 50  # how many leading queries the driver's harness checks

# Rotation queue for round 6: every query not in the r5 front whose
# driver row is stale (r1/r2 vintage) or whose oracle SQL was
# regenerated by a refactor, oldest evidence first. All are locally
# hash-verified every run (tests/test_oracle_parity.py +
# tools/check_oracles.py at driver strength).
_VERIFY_NEXT: tuple[str, ...] = (
    # remaining r1 greens (stale since the r3 fixture regen + r4 shared
    # read-path changes)
    "q_window_frame",
    "q_window_running",
    "q_topk_group",
    "q_sort_limit",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_agg_corr",
    "q_pivot",
    "q_unpivot",
    "q_window_firstlast",
    "q_string_regexp",
    "q_subquery_in",
    "q_subquery_corr",
    "q_agg_groupingid",
    "q_agg_argminmax",
    "q_date_series",
    "q_values_cte",
    "q_top_unshipped",
    "q_returned_revenue",
    "q_filtered_revenue",
    # oracle SQL regenerated by the r4 _lloyd_sql refactor (results
    # hash-equivalent, but the driver never saw the regenerated text)
    "q_sim_topk_kmeans",
    "q_dedup_embed",
    # r2 greens, oldest first
    "q_promo_share",
    "q_agg_stringagg",
    "q_window_lead",
    "q_agg_decimal",
    "q_exists_agg",
    "q_null_ordering",
    "q_histogram",
    "q_cond_count",
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
)


def register(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query builder to the engine surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=neutralize_negative_zero(oracle) if oracle is not None else None,
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
    front = [n for n in _VERIFY_FRONT if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(front)]
    return {n: _REGISTRY[n] for n in (*front, *rest)}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
