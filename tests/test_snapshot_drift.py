"""Invariants of the snapshot mixture-drift card and its repair action
(the oracle mirror pins engine equality; these pin the SEMANTICS)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deisa_ray_spark.functions.report import report_snapshot_drift
from deisa_ray_spark.functions.sampling import samp_mixture_rebalance
from tests.conftest import SF_DIR


def test_drift_shares_and_rollup(spark):
    rows = report_snapshot_drift(spark, SF_DIR).collect()
    per_bucket = [r for r in rows if r["bucket"] != "__tv_total"]
    rollup = {r["dim"]: r for r in rows if r["bucket"] == "__tv_total"}
    assert set(rollup) == {"source", "lang", "len_bucket"}
    for dim in rollup:
        b = [r for r in per_bucket if r["dim"] == dim]
        # truncating DIV loses < 1 millionth per bucket
        for col in ("share_v1_x1e6", "share_v2_x1e6"):
            s = sum(r[col] for r in b)
            assert 1_000_000 - len(b) <= s <= 1_000_000
        # every bucket's drift is |share diff|; the rollup sums them
        for r in b:
            assert r["drift_x1e6"] == abs(
                r["share_v1_x1e6"] - r["share_v2_x1e6"]
            )
        assert rollup[dim]["drift_x1e6"] == sum(r["drift_x1e6"] for r in b)
        # snapshot totals identical across dims
        assert rollup[dim]["n_v1"] == rollup["source"]["n_v1"]
        assert rollup[dim]["n_v2"] == rollup["source"]["n_v2"]


def test_rebalance_rates_and_gate_semantics(spark):
    """Deterministic semantics only: the md5-gate keeps a BINOMIAL
    sample per source, whose noise at toy per-source counts (~230 docs)
    exceeds the tiny v1/v2 mixture drift the synthetic snapshots induce
    — so 'achieved share strictly closer to target' is NOT asserted
    (statistically false at this SF); what IS deterministic: rate
    bounds, full-rate sources keep everything, expected-kept counts
    within binomial bounds, and the rate formula itself."""
    rows = samp_mixture_rebalance(spark, SF_DIR).collect()
    assert rows
    t1_shareable = sum(r["share_target_x1e6"] for r in rows)
    assert 1_000_000 - len(rows) <= t1_shareable <= 1_000_000
    for r in rows:
        assert 0 <= r["rate_x1e6"] <= 1_000_000
        assert 0 <= r["n_kept"] <= r["n_v2"]
        if r["rate_x1e6"] == 1_000_000:
            assert r["n_kept"] == r["n_v2"]
        # kept count within 5 binomial sigmas of rate * n_v2
        exp = r["n_v2"] * r["rate_x1e6"] / 1_000_000
        sigma = max(1.0, (exp * (1 - r["rate_x1e6"] / 1_000_000)) ** 0.5)
        assert abs(r["n_kept"] - exp) <= 5 * sigma
