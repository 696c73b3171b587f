"""Approximate-aggregate accuracy: the sketches must track the exact
answers (the declared q27 has no cross-engine oracle — sketch internals
are implementation-defined — so the numeric contract lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deisa_ray_spark.registry import load_all
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR

QUERIES = load_all()


def test_approx_aggs_accuracy(spark):
    approx = {r.event_type: r for r in QUERIES["q27_approx_aggs"].fn(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
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
        pcts = (approx[k].value_p50, approx[k].value_p95, approx[k].value_p99)
        for a, lo, hi in zip(pcts, exact[k].lo, exact[k].hi):
            # rank-based contract: the sketch answer is a real data value
            # (no interpolation), so compare by quantile bracket ±0.03
            assert lo - 1e-9 <= a <= hi + 1e-9, (k, a, lo, hi)
