"""Deterministic corpus sampling: Bernoulli by hash, exact-k uniform,
and stratified per-group k — the subsetting ops a training-data pipeline
runs constantly (held-out splits, eval slices, per-source caps).

The reference has no sampling surface. The portability trick is the same
as the dedup family's: the sampling key is ``md5`` of the row id, which is
identical hex in Spark and DuckDB — so "random" selection is bit-for-bit
reproducible across engines AND across runs/cluster sizes (a property
``rand(seed)`` does NOT have on Spark: its draw depends on partitioning).

Scale notes (100 TB):
- Bernoulli-by-hash is a pure filter — no shuffle, prunes at scan speed,
  and composes with predicate pushdown on other columns.
- Exact-k uniform is ORDER BY md5 LIMIT k → Spark's TakeOrdered: each
  partition keeps its local top-k, only k rows per partition reach the
  driver-side merge. No global sort materialization.
- Stratified per-group k is row_number over (source, md5): recent Spark
  inserts WindowGroupLimit, so each map task pre-prunes to k rows per
  group before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

#: hex-prefix threshold: md5 first byte < 0x0d → 13/256 ≈ 5.08% sample.
BERNOULLI_HEX_LT = "0d"
UNIFORM_K = 64
STRATA_K = 20


def _key(col: str = "doc_id"):
    return F.md5(F.col(col).cast("string"))


# --------------------------------------------------------------------------
# samp_hash_bernoulli — ~5% deterministic Bernoulli sample, summarized
# per source (count + mean length proves the sample is unbiased enough
# to check downstream).
# --------------------------------------------------------------------------
@query(
    "samp_hash_bernoulli",
    oracle=f"""
    SELECT source, count(*) AS n_sampled,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < '{BERNOULLI_HEX_LT}'
    GROUP BY source
    """,
)
def samp_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.substring(_key(), 1, 2) < BERNOULLI_HEX_LT)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# samp_uniform_k — exact-k uniform sample: the k smallest md5 keys.
# --------------------------------------------------------------------------
@query(
    "samp_uniform_k",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    ORDER BY md5(cast(doc_id AS VARCHAR))
    LIMIT {UNIFORM_K}
    """,
)
def samp_uniform_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.orderBy(_key()).limit(UNIFORM_K).select("doc_id", "source")


# --------------------------------------------------------------------------
# samp_stratified_k — per-source cap: k docs per source by md5 order
# (md5 collisions are impossible on distinct ids → total order → the
# frontier is deterministic).
# --------------------------------------------------------------------------
@query(
    "samp_stratified_k",
    oracle=f"""
    SELECT doc_id, source, rn
    FROM (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(cast(doc_id AS VARCHAR))) AS rn
          FROM documents)
    WHERE rn <= {STRATA_K}
    """,
)
def samp_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(_key())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATA_K)
        .select("doc_id", "source", "rn")
    )
