"""Watermarked SESSION-window streaming aggregation as a declared,
ORACLE-CHECKED query — the merging-window stateful shape
(``session_window`` groupBy under a watermark, append mode): unlike
tumbling windows, session state MERGES as events extend a session, so
this exercises the other half of Spark's windowed-state machinery.

Oracle closure: with availableNow over ts-ordered shards, append emits
exactly the sessions finalized by the final watermark. A session is the
classic gap-island: per user, a new island starts when the gap to the
previous event EXCEEDS GAP (an event exactly GAP after its predecessor
still merges — Spark's per-event window is the half-open
[ts, ts + GAP), and session_window merges windows that merely TOUCH,
verified live on 4.1.2); its window is [min ts, max ts + GAP). Both the
island assignment (integer microsecond comparisons) and the
finalization cutoff (session end ≤ max event time − delay, compared at
Spark's millisecond watermark granularity — epoch_ms truncates in both
engines) are deterministic functions of the stored timestamps, so the
emitted set has a closed-form SQL twin.

Scale notes (100 TB/day): state is O(open sessions) — the watermark
closes idle users' sessions; the session merge is keyed on user_id (one
equi-shuffle), and staging is the shared distributed range write.
All metrics are integer counts/microsecond bounds — no float exposure.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.operators.stream_window_query import _EVENT_SCHEMA, N_SHARDS

from deisa_ray_spark.registry import query

GAP_US = 30 * 60 * 1_000_000  #: 30-minute session gap
DELAY_MS = 30 * 60 * 1_000  #: 30-minute watermark delay

_ORACLE = f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    marked AS (
      SELECT user_id, tus,
             -- STRICTLY greater: Spark merges windows that touch, so an
             -- event exactly GAP after its predecessor extends the session
             CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                       > {GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
    ),
    sess AS (
      SELECT user_id, tus,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    agg AS (
      SELECT user_id, sid, min(tus) AS session_start_us,
             max(tus) + {GAP_US} AS session_end_us,
             count(*) AS n_events
      FROM sess GROUP BY user_id, sid
    ),
    wm AS (SELECT epoch_ms(max(ts)) - {DELAY_MS} AS wm_ms FROM events)
    SELECT user_id, session_start_us, session_end_us,
           CAST(n_events AS BIGINT) AS n_events
    FROM agg, wm
    -- Spark evicts on the EXACT microsecond session end vs the ms-
    -- granular watermark (wm_ms * 1000 us); flooring the session end to
    -- ms first would admit sessions ending up to 999 us past the
    -- watermark
    WHERE session_end_us <= wm_ms * 1000
    """


@query("stream_session_counts", oracle=_ORACLE)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage events into ts-ordered shards, stream them through a
    watermarked 30-minute session window per user, return the appended
    (finalized) sessions."""
    from deisa_ray_spark.sources.registry import load_table

    work = tempfile.mkdtemp(prefix="stream_sess_")
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
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .select(
                "user_id",
                F.unix_micros(F.col("session_window.start")).alias(
                    "session_start_us"
                ),
                F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
                "n_events",
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
            "user_id bigint, session_start_us bigint, "
            "session_end_us bigint, n_events bigint"
        ).parquet(f"{work}/out")
        # materialize executor-side before the temp output dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
