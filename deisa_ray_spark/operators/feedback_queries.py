"""Feedback-channel queue semantics (A11/A12) as declared batch queries.

The reference keeps, per key, a fixed-size deque of (timestep, value)
pairs with strictly-increasing timesteps (head_node.py:96-97,213-303,
default size 1024); reads are exact-t lookups or the full queue, with a
default on miss (bridge.py:525-584). Here the *retention and lookup*
semantics are pinned as SQL over a deterministic feedback table; the
write-path strict-increase enforcement lives in streaming/feedback.py
with behavioral tests.

Scale: the feedback table is tiny by contract (small Python objects,
bounded queue) — at cluster scale it is a broadcast-able keyed table;
tail-N per key is one window function over a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query

QUEUE_SIZE = 5

#: DuckDB twin of the generated feedback table: key 'k{i}' (i<3) has
#: entries at t = i, i+3, ..., i+57 with value = t*10 + i.
FEEDBACK_CTE = """
WITH fb AS (
  SELECT 'k' || CAST(ks.i AS VARCHAR) AS key,
         CAST(ts.t AS BIGINT) AS t,
         CAST(ts.t * 10 + ks.i AS BIGINT) AS value
  FROM range(0, 3) ks(i), range(0, 60) ts(t)
  WHERE ts.t >= ks.i AND ts.t <= ks.i + 57 AND (ts.t - ks.i) % 3 = 0
)
"""


def feedback_df(spark: SparkSession) -> DataFrame:
    """Deterministic feedback table (same contents as FEEDBACK_CTE)."""
    keys = spark.range(3).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"), F.col("id").alias("i")
    )
    return keys.select(
        "key",
        "i",
        F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(57), F.lit(3))).alias("t"),
    ).select("key", F.col("t").cast("bigint").alias("t"), (F.col("t") * 10 + F.col("i")).cast("bigint").alias("value"))


# --------------------------------------------------------------------------
# A11 — retention: the queue holds only the newest QUEUE_SIZE entries per
# key (deque eviction, head_node.py:89-90,242).
# --------------------------------------------------------------------------
@query(
    "fb_queue_tail",
    oracle=FEEDBACK_CTE
    + f"""
    SELECT key, t, value
    FROM (SELECT key, t, value,
                 row_number() OVER (PARTITION BY key ORDER BY t DESC) AS rn
          FROM fb)
    WHERE rn <= {QUEUE_SIZE}
    """,
)
def fb_queue_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    fb = feedback_df(spark)
    w = W.partitionBy("key").orderBy(F.desc("t"))
    return (
        fb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUEUE_SIZE)
        .select("key", "t", "value")
    )


# --------------------------------------------------------------------------
# A12 — exact-t lookup with default-on-miss (Bridge.get(key, timestep,
# default); hit/miss matrix of tests/test_feedback_loop.py:104-130).
# --------------------------------------------------------------------------
@query(
    "fb_lookup",
    oracle=FEEDBACK_CTE
    + """
    , probes AS (
      SELECT * FROM (VALUES ('k0', CAST(12 AS BIGINT)), ('k1', 13), ('k2', 20),
                            ('k0', 7), ('k9', 0)) AS p(key, probe_t)
    )
    SELECT p.key, p.probe_t,
           fb.t IS NOT NULL AS found,
           coalesce(fb.value, -1) AS value
    FROM probes p LEFT JOIN fb ON p.key = fb.key AND p.probe_t = fb.t
    """,
)
def fb_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    fb = feedback_df(spark)
    probes = spark.createDataFrame(
        [("k0", 12), ("k1", 13), ("k2", 20), ("k0", 7), ("k9", 0)], "key string, probe_t bigint"
    )
    return (
        probes.join(fb, (probes.key == fb.key) & (probes.probe_t == fb.t), "left")
        .select(
            probes.key.alias("key"),
            "probe_t",
            fb.t.isNotNull().alias("found"),
            F.coalesce(fb.value, F.lit(-1)).cast("bigint").alias("value"),
        )
    )
