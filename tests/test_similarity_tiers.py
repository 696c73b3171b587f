"""The tier-selection contract: the declared table's constants must
match the tier queries' compile-time constants (no drift), and the
selection rule must pick by corpus-size band."""

from __future__ import annotations

from deisa_ray_spark.functions.similarity import (
    BEAM_B,
    BEAM_R,
    SCALED_BEAM_B,
    SCALED_SERVE_K,
    SERVE_K,
    SIM_TIER_TABLE,
    select_tier,
)


def test_tier_table_matches_declared_constants():
    rows = {r[0]: r for r in SIM_TIER_TABLE}
    assert rows["default"][2:5] == (SERVE_K, BEAM_B, BEAM_R)
    assert rows["scaled"][2:5] == (SCALED_SERVE_K, SCALED_BEAM_B, BEAM_R)
    # bands are strictly increasing; every row carries a measured recall
    bands = [r[1] for r in SIM_TIER_TABLE]
    assert bands == sorted(bands) and len(set(bands)) == len(bands)
    assert all(0.0 < r[5] <= 1.0 and r[6] > 0 for r in SIM_TIER_TABLE)


def test_select_tier_bands():
    assert select_tier(500)[0] == "default"
    assert select_tier(4_000)[0] == "default"
    assert select_tier(4_001)[0] == "scaled"
    assert select_tier(30_000)[0] == "scaled"
    assert select_tier(64_000)[0] == "xl"
    # past the largest measured band: largest tier, caveat documented
    assert select_tier(10_000_000)[0] == "xl"


def test_tier_query_matches_oracle_shape(spark):
    from deisa_ray_spark.functions.similarity import sim_tier_table

    rows = sim_tier_table(spark, "unused").collect()
    assert len(rows) == len(SIM_TIER_TABLE)
    assert rows[0].asDict() == {
        "tier": "default", "n_max": 4_000, "serve_k": SERVE_K,
        "beam_b": BEAM_B, "beam_r": BEAM_R, "recall_at_10": 1.0,
        "measured_n": 2_000,
    }
