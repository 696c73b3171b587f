"""Physical-plan shape tests: the properties that make these queries
survive a 100 TB scale-up. A green oracle check with a wrong plan (full
scan for a 2-column projection, shuffled star join, Python in the hot
path) is not done — these tests pin the plan, not the numbers."""

from __future__ import annotations

import contextlib
import io

import pytest

from deisa_ray_spark.registry import load_all
from tests.conftest import SF_DIR

QUERIES = load_all()


def plan_of(spark, name: str) -> str:
    """Formatted static plan (AQE off so codegen stages and the full
    PushedFilters list are visible — AQE only re-plans at runtime on top
    of this same static shape)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q01_pushdown_and_pruning(spark):
    """Filter reaches the parquet scan; only needed columns are read."""
    plan = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads the 7 needed columns, not all 16
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema
    # partial aggregation (map-side combine) before the exchange
    assert "HashAggregate" in plan and "Exchange" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange") or plan.count("HashAggregate") >= 2


def test_q06_range_pushdown(spark):
    plan = plan_of(spark, "q06_revenue_forecast")
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThanOrEqual(l_discount,0.07)" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q03_broadcasts_dimensions(spark):
    """Star join: nation/region broadcast — the fact table never shuffles
    for them."""
    plan = plan_of(spark, "q03_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") >= 2


def test_q07_window_group_limit(spark):
    """Top-k per group prunes to k rows per partition BEFORE the shuffle
    (WindowGroupLimit), so only k·P rows move."""
    plan = plan_of(spark, "q07_top3_parts_per_brand")
    assert "WindowGroupLimit" in plan


def test_whole_stage_codegen_everywhere(spark):
    """The relational core stays inside whole-stage codegen (no Python in
    the hot path). Formatted explain marks codegen stages with
    ``[codegen id : N]``."""
    for name in ("q01_pricing_summary", "q06_revenue_forecast", "q11_sessionize_events"):
        plan = plan_of(spark, name)
        assert "[codegen id :" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_text_ops_are_jvm_side(spark):
    """Text/dedup/similarity ops compile to JVM expressions — no Python
    UDF evaluation nodes anywhere in their plans."""
    for name in ("txt_token_stats", "dedup_minhash_lsh", "sim_bruteforce_topk",
                 "emb_scalar_quantize", "txt_tfidf"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_bruteforce_topk_broadcasts_queries(spark):
    """The query side is broadcast: corpus scan is single-pass, no
    corpus-wide shuffle before ranking."""
    plan = plan_of(spark, "sim_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_grid_explode_is_narrow(spark):
    """Chunk decode (mapInPandas) happens with no Exchange beneath it in
    the plan tree — decode parallelism is the input partitioning, chunk
    payloads never shuffle."""
    plan = plan_of(spark, "grid_ingest_checksum")
    tree = plan.split("\n\n")[0].splitlines()  # root-first physical tree
    decode_line = next(i for i, l in enumerate(tree) if "MapInPandas" in l)
    below_decode = "\n".join(tree[decode_line + 1 :])
    assert "Exchange" not in below_decode, "shuffle below the decode"


def test_streaming_control_plane_prunes_payload(spark, tmp_path):
    """The stateful control-plane operator reads chunk METADATA only: the
    binary ``data`` column is pruned from its streaming scan."""
    import numpy as np

    from deisa_ray_spark.streaming import InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    chunk_dir = str(tmp_path / "chunks")
    b = SparkBridge(0, metadata_for_grid(("temperature",), (2, 2), (2, 2), (0, 0)), chunk_dir)
    b.send("temperature", np.ones((2, 2)), 0)
    engine = InSituEngine(spark, chunk_dir)
    events = engine.events_stream()
    logical = events._jdf.queryExecution().analyzed().toString()
    # the analyzed plan projects the metadata columns, not `data`
    assert "data" not in logical.split("StreamingRelation")[0]
