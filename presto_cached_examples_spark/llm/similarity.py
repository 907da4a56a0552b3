"""Similarity search over the `embeddings` table (north-star family;
SURVEY.md §2.B q_sim_topk).

Two paths:
- brute-force cosine top-k — the exact baseline. O(probes × corpus),
  but fully JVM-side (higher-order array folds) and embarrassingly
  parallel: probes broadcast, corpus partitions stream.
- LSH-bucketed ANN — random-hyperplane sign bits form buckets; only
  same-bucket candidates are scored. The 100 TB path: bucket join
  replaces the cross join, cost O(probes × bucket_size).

Both rows-only: float accumulation order makes cross-engine hashes
unstable, and DuckDB 1.0 lacks list_dot_product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_cached_examples_spark.registry import register
from presto_cached_examples_spark.sources.catalog import load_table, spread

_N_PROBES = 10
_TOP_K = 5
_N_PLANES = 8


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    return e.select("vec_id", "label", "v", _norm(F.col("v")).alias("nrm"))


@register("q_sim_topk", category="llm-similarity", oracle=None)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 10 vectors.

    The probe side is tiny and broadcast; the corpus side streams one
    scan — at 100 TB this is the exact-rerank stage run on LSH/IVF
    candidates, not on the full corpus."""
    corpus = _corpus(spark, sf_dir)
    probes = corpus.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"), F.col("nrm").alias("pnrm")
    )
    cos = _dot(F.col("pv"), F.col("v")) / (F.col("pnrm") * F.col("nrm"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        F.broadcast(probes)
        .join(corpus, probes.probe_id != corpus.vec_id)
        .select("probe_id", "vec_id", F.round(cos, 4).alias("cosine"))
        .withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= _TOP_K)
        .select("probe_id", "vec_id", "cosine", "k")
    )


def _bucket(v_col):
    """Sign-bit LSH bucket: bit p = sign of <v, h_p> where hyperplane
    h_p's i-th component is ±1 derived from xxhash64(p, i). Deterministic,
    data-independent, and computable on both the index and query side
    without any trained state."""
    bucket = F.lit(0).cast("long")
    for p in range(_N_PLANES):
        comp = F.aggregate(
            F.zip_with(
                v_col,
                F.sequence(F.lit(0), F.size(v_col) - 1),
                lambda x, i: x
                * (F.xxhash64(F.lit(p), i).bitwiseAND(F.lit(1)).cast("double") * 2.0 - 1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = F.shiftleft(bucket, 1).bitwiseOR(F.when(comp > 0, 1).otherwise(0))
    return bucket


@register("q_sim_topk_lsh", category="llm-similarity", oracle=None)
def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: candidates share the probe's
    8-bit bucket; exact cosine reranks within the bucket.

    Scale: the corpus is bucketed once (a write-time projection at
    100 TB); queries shuffle only to their bucket — a 2^8-way partition
    prune instead of a full scan. Recall is tunable by planes/band
    count; the exact q_sim_topk is the rerank oracle."""
    corpus = _corpus(spark, sf_dir).withColumn("bucket", _bucket(F.col("v")))
    probes = corpus.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
        F.col("bucket").alias("pbucket"),
    )
    cos = _dot(F.col("pv"), F.col("v")) / (F.col("pnrm") * F.col("nrm"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        F.broadcast(probes)
        .join(corpus, (probes.pbucket == corpus.bucket) & (probes.probe_id != corpus.vec_id))
        .select("probe_id", "vec_id", F.round(cos, 4).alias("cosine"))
        .withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= _TOP_K)
        .select("probe_id", "vec_id", "cosine", "k")
    )


@register("q_sim_topk_ivf", category="llm-similarity", oracle=None)
def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: the coarse quantizer is the `label` column (at
    100 TB: k-means centroid ids materialized at ingest). Probes search
    only their own cell, then exact-rerank.

    The operator shape — partition the corpus by a coarse cell id,
    search within the probe's cell — is the scalable structure; the
    quantizer quality only affects recall, not the plan."""
    corpus = _corpus(spark, sf_dir)
    probes = corpus.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
        F.col("label").alias("plabel"),
    )
    cos = _dot(F.col("pv"), F.col("v")) / (F.col("pnrm") * F.col("nrm"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        F.broadcast(probes)
        .join(corpus, (probes.plabel == corpus.label) & (probes.probe_id != corpus.vec_id))
        .select("probe_id", "vec_id", F.round(cos, 4).alias("cosine"))
        .withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= _TOP_K)
        .select("probe_id", "vec_id", "cosine", "k")
    )
