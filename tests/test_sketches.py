"""Count-Min sketch laws: merging per-batch sketches equals one-shot
construction (cell-exact — counters are integers), and estimates obey
the one-sided guarantee for EVERY key, not just heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from deisa_ray_spark.functions.sketches import cms_build, cms_estimate, cms_merge
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _cells(df):
    return {(r.seed, r.bucket): r.cnt for r in df.collect()}


def test_merged_batches_equal_one_shot(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id")
    whole = cms_build(ev, "user_id")
    halves = [
        cms_build(ev.filter(F.col("user_id") % 2 == i), "user_id") for i in range(2)
    ]
    merged = cms_merge(halves[0].unionByName(halves[1]))
    assert _cells(merged) == _cells(whole)


def test_estimate_never_undercounts_any_key(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id")
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    joined = exact.join(est, "user_id").collect()
    assert joined
    for r in joined:
        assert r.cms_count >= r.n, (r.user_id, r.cms_count, r.n)
