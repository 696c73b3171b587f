"""Bucketed-table co-located join: pre-shuffling both sides of a
recurring join into the same bucketing eliminates the per-query
Exchange — THE scale lever for a fact-dim join run thousands of times
at 100 TB (pay the shuffle once at write time, never again).

The reference has no table-layout concept at all (its data lives in an
object store keyed by chunk position); bucketing is part of what the
Spark engine adds on top.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from deisa_ray_spark.sources.registry import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for df, name, key in ((orders, "orders_b", "o_custkey"),
                              (customer, "customer_b", "c_custkey")):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (df.write.bucketBy(4, key).sortBy(key)
               .option("path", str(tmp_path / name)).saveAsTable(name))

        j = (
            spark.table("orders_b")
            .join(spark.table("customer_b"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(j)
        tree = plan.split("\n\n", 1)[0]
        assert "SortMergeJoin" in plan
        # the join itself reads bucketed scans directly — the only
        # Exchange in the whole plan is the post-join aggregation's
        assert tree.count("Exchange") == 1
        assert "SelectedBucketsCount" in plan

        # and the result is right: same as the plain parquet join
        expect = (
            orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
        )
        got = {(r.c_nationkey, r.n) for r in j.collect()}
        want = {(r.c_nationkey, r.n) for r in expect.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
