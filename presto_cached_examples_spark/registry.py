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
    "presto_cached_examples_spark.operators.skew",
    "presto_cached_examples_spark.operators.scalars",
    "presto_cached_examples_spark.functions.udfs",
    "presto_cached_examples_spark.llm.text",
    "presto_cached_examples_spark.llm.dedup",
    "presto_cached_examples_spark.llm.similarity",
    "presto_cached_examples_spark.llm.multimodal",
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
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
