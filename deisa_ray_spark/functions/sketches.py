"""Count-Min sketch: mergeable frequency estimation over unbounded key
domains.

Spark ships HLL (distinct) and KLL-style percentile sketches but no
frequency sketch; this adds one with pure built-ins. The sketch is a
``d × w`` counter table built in ONE keyed aggregation over ``(seed,
bucket)`` — ``d`` deterministic hash rows (``xxhash64(key, seed)``),
``w`` buckets per row. Estimates are ``min`` over the ``d`` bucket
counters for a key's buckets: never below the true count (every
occurrence of a key lands in all d of its buckets — the classic CMS
one-sided guarantee), above it only by hash-collision mass (~N/w per
row, minimized over d rows).

Scale notes (100 TB):
- The counter table has at most ``d·w`` rows REGARDLESS of key
  cardinality or input size — the whole point vs an exact groupBy on a
  billion-key domain. Partial aggregation combines map-side, the single
  exchange carries ≤ d·w rows per map partition.
- Sketches merge by summing counter tables cell-wise (the same
  ``groupBy(seed, bucket).sum`` — usable as incremental-MV state, see
  mv.py's mergeable-state law).
- Probing k candidate keys broadcasts k·d probe rows against the
  counter table: no second fact scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

CMS_W = 1024  #: buckets per hash row
CMS_D = 3  #: independent hash rows


def _bucket(key: Column, seed: int, w: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(w))


def cms_build(df: DataFrame, key: str, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """One pass → the ``(seed, bucket, cnt)`` counter table (≤ d·w rows)."""
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seed"),
                    _bucket(F.col(key), s, w).alias("bucket"),
                )
                for s in range(d)
            ])
        ).alias("cell")
    )
    return rows.groupBy("cell.seed", "cell.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Union of counter tables → one sketch (cell-wise sum)."""
    return counters.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame, keys: DataFrame, key: str, w: int = CMS_W, d: int = CMS_D
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its d bucket
    counters. LEFT join + coalesce(0): an empty (seed, bucket) cell is a
    ZERO counter — an inner join would drop it, making a never-seen key
    either vanish from the output (all cells empty) or read an inflated
    min over only its collision-populated cells."""
    probes = keys.select(
        key,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seed"),
                    _bucket(F.col(key), s, w).alias("bucket"),
                )
                for s in range(d)
            ])
        ).alias("cell"),
    ).select(key, "cell.seed", "cell.bucket")
    return (
        F.broadcast(probes)
        .join(counters, ["seed", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


# --------------------------------------------------------------------------
# Declared query: heavy hitters on the event stream's user dimension.
# Exact top-10 (count desc, key asc — a total order both engines agree
# on) hash-matches the oracle; the sketch's guarantees are emitted as
# booleans (q27/q42 convention): over_ok pins the one-sided bound
# (estimate ≥ exact, deterministic for CMS), tight_ok pins collision
# mass ≤ 2·N/w (deterministic here — the hash family is fixed).
# --------------------------------------------------------------------------
@query(
    "cms_heavy_hitters",
    oracle="""
    SELECT user_id, count(*) AS n_exact, TRUE AS over_ok, TRUE AS tight_ok
    FROM events
    GROUP BY user_id
    ORDER BY n_exact DESC, user_id
    LIMIT 10
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(10)
    )
    # N from the SKETCH itself (sum of any one seed row's counters =
    # total occurrences), as a broadcast 1-row aggregate — deriving it
    # with ev.count() would fire a third full fact scan EAGERLY at
    # plan-construction time
    n_total = F.broadcast(
        sketch.filter(F.col("seed") == 0).agg(
            F.sum("cnt").cast("double").alias("n_total")
        )
    )
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    return (
        exact.join(est, "user_id")
        .crossJoin(n_total)
        .select(
            "user_id",
            "n_exact",
            (F.col("cms_count") >= F.col("n_exact")).alias("over_ok"),
            (
                (F.col("cms_count") - F.col("n_exact"))
                <= 2.0 * F.col("n_total") / CMS_W
            ).alias("tight_ok"),
        )
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
    )
