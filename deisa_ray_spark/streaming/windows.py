"""Event-time windowed aggregations on Structured Streaming: tumbling,
sliding, and session windows with watermark-based late-data handling.

This is the Spark streaming surface the reference *lacks* (SURVEY §2.C
"Streaming-only": tumbling/sliding time windows and session windows are
absent — its only window is the count-based sliding list A7, and its
late-data policy is abort A6, implemented in engine.py). These operators
cover the standard stream-analytics shapes over event streams like the
``events`` table; the batch twin of the session window is
``q11_sessionize_events`` (gaps-and-islands).

Late-data contract here (unlike the in-situ layer): rows older than the
watermark are DROPPED, the standard streaming trade — documented
difference from the reference's abort semantics, both available.

Scale notes (100 TB/day streams): all three are partial-aggregated per
micro-batch with state keyed by (window, key) — state size is bounded by
watermark horizon × key cardinality, not stream length; the watermark
also bounds how long session state can grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Schema of streamed event rows (mirror of the events table).
EVENT_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def stream_events(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-type event counts in non-overlapping event-time windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping-window rolling average (each event lands in
    window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "avg_value", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based close) — the streaming twin of
    q11_sessionize_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
        )
    )


def run_to_memory(
    streamed: DataFrame,
    checkpoint_dir: str,
    table_name: str,
    output_mode: str = "append",
) -> None:
    """Drain all available input into an in-memory sink (test/debug
    harness; production sinks are parquet/foreachBatch)."""
    q = (
        streamed.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_events(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact deduplication: drop re-deliveries of the same
    event within the watermark horizon (``dropDuplicatesWithinWatermark``
    — state is bounded by the horizon, not stream length). The streaming
    face of the batch dedup family (functions/dedup.py); at-least-once
    sources + this = effectively-once ingestion."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: per-micro-batch broadcast hash join of the
    stream against a (small) batch dimension table — the standard
    streaming-enrichment shape. No state is kept: the static side is
    planned as a broadcast into every micro-batch, so at scale the only
    cost is shipping the dim once per executor, and the stream side
    never shuffles."""
    return events.join(F.broadcast(dim), "event_type", "inner").select(
        "event_id", "ts", "user_id", "event_type",
        F.round(F.col("value") * F.col("weight"), 6).alias("weighted_value"),
    )


def join_clicks_to_views(
    clicks: DataFrame, views: DataFrame, max_gap: str = "1 hour",
    watermark: str = "30 minutes", how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same
    user's views at most ``max_gap`` BEFORE it (view.ts ≤ click.ts ≤
    view.ts + gap). Both sides carry watermarks, so Spark bounds the
    join state: a buffered view can be evicted once the click-side
    watermark passes view.ts + gap — state is O(gap × rate), not
    O(stream). The batch twin is ``q13_asof_join_click_view``."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("user_id").alias("v_user"),
    )
    return c.join(
        v,
        F.expr(
            f"c_user = v_user AND view_ts <= click_ts "
            f"AND click_ts <= view_ts + INTERVAL {max_gap}"
        ),
        how,
    ).select("click_id", "view_id", F.col("c_user").alias("user_id"),
             "click_ts", "view_ts")
