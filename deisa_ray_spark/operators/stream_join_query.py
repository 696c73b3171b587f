"""Watermarked STREAM-STREAM interval join as a declared, oracle-checked
query — the last stateful-streaming family (after windowed/session aggs,
streaming dedup, and streaming CC) promoted from behavioral tests to the
driver's exact hash gate.

Shape: one ts-ordered staged event stream (the stage_ordered_shards
protocol from stream_cc_query), filtered into a click side and a view
side, both watermarked; each click joins the same user's views at most
GAP before it (view_ts <= click_ts <= view_ts + GAP).

Why the INNER join is exactly oracle-checkable: matched pairs emit in
whatever micro-batch completes them — no watermark finalization rule is
involved in EMISSION, only in state EVICTION. With ts-ordered shards a
view is evicted only when the watermark (max seen ts − delay) passes
view_ts + GAP, by which point every click that could match it has
already arrived (ordered input ⇒ no late data), so NO match is ever
missed and the appended result is exactly the batch interval join —
a closed-form SQL twin with no boundary rule at all.

The LEFT OUTER variant stays BEHAVIORAL (tests/test_streaming_windows.py)
rather than declared: unmatched-click (NULL view) emission is gated by
Spark's internal state-watermark sweep, and measured runs show a
straggler anomaly — at sf0.001 one unmatched click 3.4 h BELOW the
final watermark never emits under availableNow (at sf0.01 the emitted
set matches the strict click_ts < W − delay rule exactly) — i.e. the
eviction boundary is not a stable closed form across datasets, so an
exact oracle would encode a lie. Matched-pair emission (this query) has
no such boundary at all.

Scale notes (100 TB/day): join state is O(GAP × rate) per side — the
watermark evicts aggressively because the condition bounds event-time
distance both ways; the join itself shuffles on user_id (the equi part
of the predicate), never broadcast/nested-loop. Timestamps compare in
microseconds (both engines' native precision); outputs are id/epoch-us
integer columns — no float exposure.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.registry import query

N_SHARDS = 4
GAP = "1 hour"
WATERMARK = "30 minutes"

_EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

_PAIR_SQL = f"""
      SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
             epoch_us(c.ts) AS click_ts_us, epoch_us(v.ts) AS view_ts_us
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = c.user_id
       AND v.ts <= c.ts AND c.ts <= v.ts + INTERVAL {GAP}
"""


def _run_interval_join(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    from deisa_ray_spark.sources.registry import load_table

    work = tempfile.mkdtemp(prefix="stream_join_")
    try:
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        stage_ordered_shards(events, f"{work}/src", N_SHARDS, order_col="ts")
        stream = (
            spark.readStream.schema(_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{work}/src")
        )
        clicks = (
            stream.filter(F.col("event_type") == "click")
            .withWatermark("ts", WATERMARK)
            .select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
                F.col("user_id").alias("c_user"),
            )
        )
        views = (
            stream.filter(F.col("event_type") == "view")
            .withWatermark("ts", WATERMARK)
            .select(
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
                F.col("user_id").alias("v_user"),
            )
        )
        joined = clicks.join(
            views,
            F.expr(
                f"c_user = v_user AND view_ts <= click_ts "
                f"AND click_ts <= view_ts + INTERVAL {GAP}"
            ),
            how,
        ).select(
            "click_id",
            "view_id",
            F.col("c_user").alias("user_id"),
            F.unix_micros("click_ts").alias("click_ts_us"),
            F.unix_micros("view_ts").alias("view_ts_us"),
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.schema(
            "click_id bigint, view_id bigint, user_id bigint, "
            "click_ts_us bigint, view_ts_us bigint"
        ).parquet(f"{work}/out")
        # materialize executor-side before the temp output dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query("stream_interval_join", oracle=_PAIR_SQL)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner watermarked interval join click↔view: the appended result
    is exactly the batch interval join (see module docstring)."""
    return _run_interval_join(spark, sf_dir, "inner")
