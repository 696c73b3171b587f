"""Observed metrics (df.observe + Observation): free pipeline telemetry
evaluated inside the same job — row counts and sums collected with ZERO
extra passes over the data. The observability surface a production
100 TB pipeline needs (counters per stage without .count() re-runs)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_observation_matches_collected_result(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    obs = Observation("q01_input")
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
    )
    out = filtered.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    per_flag = {r.l_returnflag: r.n for r in out.collect()}
    # the observation saw every row of the same single pass
    assert obs.get["n_rows"] == sum(per_flag.values())
    exact = filtered.agg(F.sum("l_quantity")).collect()[0][0]
    assert obs.get["sum_qty"] == exact
