"""AQE runtime re-planning on skewed joins: one hot key holding ~95% of
the rows must cause the sort-merge join's skewed partition to be SPLIT
at runtime (``skew=true`` in the executed plan) — the mechanism that
keeps one straggler task from serializing a 100 TB join. Complements the
manual two-stage salting operator (q14_salted_agg_events), which is the
pre-planned variant of the same defense."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(200_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 < 95, F.lit(0)).otherwise(F.col("id") % 100),
            )
            .withColumn("pad", F.md5(F.col("id").cast("string")))
        )
        right = spark.range(100).select(
            F.col("id").alias("k2"), F.md5(F.col("id").cast("string")).alias("rpad")
        )
        j = left.join(right, F.col("k") == F.col("k2"))
        # Execute THIS DataFrame's own QueryExecution: AQE finalizes the
        # adaptive plan only for the execution that actually ran (a
        # noop-write or .count() plans a separate QueryExecution and
        # leaves j's plan at isFinalPlan=false).
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
        # correctness unaffected by the split
        assert len(rows) == 200_000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
