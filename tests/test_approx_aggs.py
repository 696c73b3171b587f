"""Approximate-aggregate accuracy: the sketches must track the exact
answers. The declared q27 emits its accuracy contract as booleans (the
oracle asserts them TRUE); this test re-derives the numeric contract
from the RAW sketch aggregates so a bug in q27's own checking logic
cannot vacuously pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from deisa_ray_spark.registry import load_all
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR

QUERIES = load_all()


def test_q27_contract_booleans_all_true(spark):
    rows = QUERIES["q27_approx_aggs"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.users_ok and r.p50_ok and r.p95_ok and r.p99_ok, r


def test_raw_sketches_track_exact_answers(spark):
    ev = load_table(spark, SF_DIR, "events")
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("pcts"),
        )
        .collect()
    }
    qs = [0.5, 0.95, 0.99]
    lo_qs = [max(q - 0.03, 0.0) for q in qs]
    hi_qs = [min(q + 0.03, 1.0) for q in qs]
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr(f"percentile(value, array({','.join(map(str, lo_qs))}))").alias("lo"),
            F.expr(f"percentile(value, array({','.join(map(str, hi_qs))}))").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        # HLL++ at rsd=2%: allow 5× headroom on tiny groups
        rel = abs(approx[k].approx_users - exact[k].users) / exact[k].users
        assert rel <= 0.10, (k, rel)
        for a, lo, hi in zip(approx[k].pcts, exact[k].lo, exact[k].hi):
            # rank-based contract: the sketch answer is a real data value
            # (no interpolation), so compare by quantile bracket ±0.03
            assert lo - 1e-9 <= a <= hi + 1e-9, (k, a, lo, hi)
