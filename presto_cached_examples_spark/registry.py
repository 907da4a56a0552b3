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
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

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
    "presto_cached_examples_spark.llm.sampling",
    "presto_cached_examples_spark.operators.skew",
    "presto_cached_examples_spark.operators.scalars",
    "presto_cached_examples_spark.functions.udfs",
    "presto_cached_examples_spark.llm.text",
    "presto_cached_examples_spark.llm.dedup",
    "presto_cached_examples_spark.llm.similarity",
    "presto_cached_examples_spark.llm.multimodal",
    "presto_cached_examples_spark.llm.pipeline",
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

# Verification rotation (round 3): the driver's correctness harness checks
# only the FIRST 50 queries in the order `queries()` yields them.  Rounds
# 1+2 greened 89 queries (CORRECTNESS_r01/r02.json); this round the front
# holds, in priority order: (a) the 13 queries that have never had a driver
# row, (b) the 10 formerly rows-only/err queries that gained SQL oracles or
# schema fixes this round, (c) queries whose code or input path changed
# since their last green row (multimodal/dedup module edits, the r2
# q_join_range restructure, and every events reader — the round-3 fixtures
# switched ts from TIMESTAMP(NANOS) to MICROS), (d) the 13 new round-3
# queries — which fill the window exactly (13+10+14+13 = 50).
# tests/test_oracle_parity.py enforces that every never-driver-verified
# query sits inside the current front window.
_VERIFY_FRONT: tuple[str, ...] = (
    # (a) never driver-checked: training-pipeline + TPC-H-style blocks
    "q_chunk_docs",
    "q_pack_sequences",
    "q_decontam",
    "q_text_normalize",
    "q_volume_shipping",
    "q_mkt_share",
    "q_cust_order_dist",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_big_orders",
    "q_disjunctive_revenue",
    "q_sole_return_supplier",
    "q_global_sales_opp",
    # (b) formerly rows-only/err — SQL oracles or driver-safe schemas now
    "q_dedup_near",
    "q_dedup_simhash",
    "q_dedup_embed",
    "q_sim_topk",
    "q_sim_topk_lsh",
    "q_sim_topk_ivf",
    "q_sim_topk_kmeans",
    "q_mm_features",
    "q_mm_resize",
    "q_mm_frames",
    # (c) code/input-path changed since last green row
    "q_mm_meta",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_join_range",
    "q_agg_approx",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup_late",
    "q_sessionize",
    "q_events_funnel",
    "q_retention_cohort",
    "q_json_funcs",
    "udtf_explode_props",
    # (d) queries newly added in round 3
    "q_decontam_hashed",
    "q_token_freq_cms",
    "q_text_tfidf",
    "q_events_rollup",
    "q_agg_percentiles_approx",
    "q_rolling_wau",
    "q_sample_hash_topk",
    "q_text_repetition",
    "q_stream_enrich",
    "q_fuzzy_match",
    "q_profile_stats",
    "q_join_asof_tol",
    "q_rolling_wau_approx",
)

DRIVER_WINDOW = 50  # how many leading queries the driver's harness checks

# Overflow queue for queries registered after the front window filled.
# Verified locally every round (tools/check_oracles.py +
# tests/test_oracle_parity.py); QUEUED to the head of round 4's front.
_VERIFY_NEXT: tuple[str, ...] = (
    "q_intersect_all",
    "q_except_all",
    "q_lateral_topk",
)


def register(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query builder to the engine surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category, doc=(fn.__doc__ or "").strip()
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
