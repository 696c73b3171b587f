"""The tier-selection contract: the declared table's constants must
match the tier queries' compile-time constants (no drift), and the
selection rule must pick by corpus-size band."""

from __future__ import annotations

from deisa_ray_spark.functions.similarity import (
    BEAM_B,
    BEAM_R,
    CLONE_VIEWS,
    SCALED_BEAM_B,
    SCALED_SERVE_K,
    SERVE_K,
    SIM_TIER_TABLE,
    XL_BEAM_B,
    XL_SERVE_K,
    select_tier,
)


def test_tier_table_matches_declared_constants():
    rows = {r[0]: r for r in SIM_TIER_TABLE}
    assert rows["default"][2:7] == (SERVE_K, BEAM_B, BEAM_R, 0, 0)
    assert rows["scaled+merge"][2:7] == (
        SCALED_SERVE_K, SCALED_BEAM_B, BEAM_R, 1, 0,
    )
    assert rows["xl+clones+merge"][2:7] == (
        XL_SERVE_K, XL_BEAM_B, BEAM_R, 1, CLONE_VIEWS,
    )
    # bands are strictly increasing; every row carries a measured recall
    bands = [r[1] for r in SIM_TIER_TABLE]
    assert bands == sorted(bands) and len(set(bands)) == len(bands)
    assert all(0.0 < r[7] <= 1.0 and r[8] > 0 for r in SIM_TIER_TABLE)
    # band edge == measured point, strictly (the r11 rule): every row's
    # recall is measured AT its own edge, never extrapolated past it
    assert all(r[1] == r[8] for r in SIM_TIER_TABLE)


def test_select_tier_bands():
    assert select_tier(500)[0] == "default"
    assert select_tier(4_000)[0] == "default"
    assert select_tier(4_001)[0] == "scaled+merge"
    assert select_tier(30_000)[0] == "scaled+merge"
    assert select_tier(64_000)[0] == "xl+clones+merge"
    # past the largest measured band: largest tier, caveat documented
    assert select_tier(10_000_000)[0] == "xl+clones+merge"


def test_tier_query_matches_oracle_shape(spark):
    from deisa_ray_spark.functions.similarity import sim_tier_table

    rows = sim_tier_table(spark, "unused").collect()
    assert len(rows) == len(SIM_TIER_TABLE)
    assert rows[0].asDict() == {
        "tier": "default", "n_max": 4_000, "serve_k": SERVE_K,
        "beam_b": BEAM_B, "beam_r": BEAM_R, "merge": 0, "clone_views": 0,
        "recall_at_10": 0.940, "measured_n": 4_000,
    }


def test_merged_edges_improve_recall_structurally(spark):
    """The merge round's output is a valid symmetric edge set and the
    merged beam's recall is >= the plain beam's on the test corpus."""
    from pyspark.sql import functions as F

    from deisa_ray_spark.functions.similarity import (
        graph_beam_topk,
        merged_serve_edges,
        sim_bruteforce_topk,
    )
    from tests.conftest import SF_DIR

    edges = merged_serve_edges(spark, SF_DIR).localCheckpoint()
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert edges.exceptAll(rev).count() == 0  # symmetric
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0

    bf = {(r["qid"], r["neighbor_id"])
          for r in sim_bruteforce_topk(spark, SF_DIR).collect()}
    plain = {(r["qid"], r["neighbor_id"])
             for r in graph_beam_topk(spark, SF_DIR).collect()}
    merged = {(r["qid"], r["neighbor_id"])
              for r in graph_beam_topk(spark, SF_DIR, merge_round=True).collect()}
    assert len(merged & bf) >= len(plain & bf)
