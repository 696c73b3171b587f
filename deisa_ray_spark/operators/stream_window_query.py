"""Watermarked tumbling-window streaming aggregation as a declared,
ORACLE-CHECKED query — the Structured Streaming windowed-agg + late-data
shape (readStream → withWatermark → window() groupBy → append sink)
under the driver's exact hash gate, not just a behavioral test.

Why this is oracle-checkable: with availableNow over ts-ordered shards,
append mode emits exactly the windows FINALIZED by the final watermark
(max event time − delay; Spark runs a trailing no-data batch so the
last watermark update evicts). Both the hour-window assignment and the
finalization cutoff are deterministic functions of the stored
timestamps, so the emitted set has a closed-form SQL twin: hour-bucket
counts restricted to windows whose end ≤ max(ts) − delay.

Scale notes (100 TB/day): state is O(open windows × event types), not
O(events) — the watermark bounds it; counts are partial-agg'd map-side
per shard. Staging is the same distributed range write as
stream_cc_clusters (the corpus never touches the driver). All metrics
are integer counts — no float-summation-order exposure at all.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.registry import query

N_SHARDS = 4
WATERMARK = "1 hour"

_EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

_ORACLE = """
    WITH finalized AS (
      -- Spark's watermark is max event time TRUNCATED to ms minus the
      -- delay; epoch_ms truncates (epoch() returns a fractional DOUBLE
      -- and a double->BIGINT cast ROUNDS, which would admit a window one
      -- second early when max(ts) has >=500ms of sub-second part)
      SELECT epoch_ms(max(ts)) - 3600000 AS wm_ms
      FROM events
    )
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type,
           count(*) AS n_events,
           count(*) FILTER (WHERE value >= 0.5) AS n_hi
    FROM events, finalized
    GROUP BY 1, 2, wm_ms
    HAVING (window_start + 3600) * 1000 <= wm_ms
    """


@query("stream_window_counts", oracle=_ORACLE)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage events into ts-ordered shards, stream them through a
    watermarked 1-hour tumbling-window count, return the appended
    (finalized) windows."""
    from deisa_ray_spark.sources.registry import load_table

    work = tempfile.mkdtemp(prefix="stream_win_")
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
        agg = (
            stream.withWatermark("ts", WATERMARK)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.when(F.col("value") >= 0.5, 1).otherwise(0))
                .cast("bigint")
                .alias("n_hi"),
            )
            .select(
                F.col("window.start").cast("long").alias("window_start"),
                "event_type",
                "n_events",
                "n_hi",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.schema(
            "window_start bigint, event_type string, n_events bigint, n_hi bigint"
        ).parquet(f"{work}/out")
        # materialize executor-side before the temp output dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
