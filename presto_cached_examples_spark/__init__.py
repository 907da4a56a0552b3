"""presto_cached_examples_spark — a PySpark-native analytics engine.

A from-scratch engine whose query surface re-expresses, Spark-first, the
capabilities catalogued in /root/repo/SURVEY.md for the reference repo
`AndrewCapon/presto-cached-examples` (read-only at /root/reference), plus
the LLM-data-pipeline operator families (dedup, similarity search,
multimodal columns, text analysis) required by the north star.

Design commitments (SURVEY.md §1.2/§4.2):
- DataFrame/Spark SQL everywhere; Catalyst sees every plan. No RDDs.
- Built-in `pyspark.sql.functions` on the hot path; Arrow-batched pandas
  UDFs only where built-ins genuinely can't express the semantics.
- Explicit schemas at the engine core; inference only at ingest edges.
- Every operator designed for 100 TB: broadcast small dims, partial
  aggregation, pushdown-friendly filters, skew-aware joins.
"""

from presto_cached_examples_spark.session import get_session
from presto_cached_examples_spark.sources.catalog import TABLES, load_table, register_all

__all__ = ["get_session", "TABLES", "load_table", "register_all"]
__version__ = "0.1.0"
