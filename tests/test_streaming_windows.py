"""Event-time windowed streaming: tumbling/sliding/session aggregations
with watermark late-data handling (the streaming surface the reference
lacks, SURVEY §2.C). Late rows are DROPPED here by design — the in-situ
layer's abort policy (A6) is tested separately in test_streaming.py."""

from __future__ import annotations

import os
import time
from datetime import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deisa_ray_spark.streaming import windows as sw

T0 = datetime(2026, 1, 1, 8, 0, 0)


def _write_batch(src_dir: str, seq: int, rows: list[tuple[str, int, str, float]]) -> None:
    """rows: (hh:mm, user_id, event_type, value)"""
    os.makedirs(src_dir, exist_ok=True)
    pdf = pd.DataFrame(
        {
            "event_id": range(seq * 100, seq * 100 + len(rows)),
            "ts": [datetime(2026, 1, 1, int(hm[:2]), int(hm[3:])) for hm, *_ in rows],
            "user_id": [u for _, u, _, _ in rows],
            "event_type": [e for _, _, e, _ in rows],
            "value": [v for _, _, _, v in rows],
        }
    )
    path = os.path.join(src_dir, f"batch-{seq:04d}.parquet")
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # pandas datetimes become TIMESTAMP(NANOS), which Spark's reader
    # rejects for a `timestamp` schema — write micros.
    ts_idx = table.schema.get_field_index("ts")
    table = table.set_column(ts_idx, "ts", table.column("ts").cast(pa.timestamp("us")))
    pq.write_table(table, path)
    mtime = time.time() + seq * 0.01
    os.utime(path, (mtime, mtime))


def test_tumbling_counts_with_late_drop(spark, tmp_path):
    src = str(tmp_path / "events")
    # batch 0: 08:00-09:59 → after it, watermark = 09:50 - 30m = 09:20
    _write_batch(src, 0, [("08:10", 1, "click", 1.0), ("08:40", 1, "click", 2.0),
                          ("09:10", 2, "view", 3.0), ("09:50", 2, "view", 4.0)])
    # batch 1: advance watermark to 11:00 → the 08:00/09:00 windows are
    # finalized (emitted + state evicted) at the end of this batch
    _write_batch(src, 1, [("11:30", 3, "click", 5.0)])
    # batch 2: a LATE row for the already-finalized 08:00 window → dropped
    # (a row arriving in the SAME batch that finalizes its window is still
    # merged — Spark's contract is "watermark = how late data may be")
    _write_batch(src, 2, [("08:20", 1, "click", 100.0)])
    # batch 3: flusher past 12:00 so a resurrected 08:00 window WOULD be
    # re-emitted if the late row had created state — assert it doesn't
    _write_batch(src, 3, [("13:00", 9, "flush", 0.0)])

    events = sw.stream_events(spark, src, max_files_per_trigger=1)
    agg = sw.tumbling_counts(events, window="1 hour", watermark="30 minutes")
    sw.run_to_memory(agg, str(tmp_path / "ckpt"), "tumbling", output_mode="append")

    rows = [r for r in spark.table("tumbling").collect() if r["event_type"] != "flush"]
    got = {(r["w_start"].hour, r["event_type"]): (r["n"], r["sum_value"]) for r in rows}
    # the late 08:20/value=100 row was dropped, window emitted exactly once
    assert got[(8, "click")] == (2, 3.0)
    assert len(rows) == len(got), "a finalized window was re-emitted"
    assert got[(9, "view")] == (2, 7.0)
    assert got[(11, "click")] == (1, 5.0)
    # the 13:00 flusher window is still open → absent in append mode


def test_sliding_windows_overlap(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_batch(src, 0, [("08:10", 1, "click", 2.0), ("08:40", 1, "click", 4.0),
                          ("12:00", 9, "flush", 0.0)])  # flusher advances watermark
    events = sw.stream_events(spark, src)
    agg = sw.sliding_avg(events, window="1 hour", slide="30 minutes", watermark="0 seconds")
    sw.run_to_memory(agg, str(tmp_path / "ckpt"), "sliding", output_mode="append")

    rows = {r["w_start"].strftime("%H:%M"): (r["avg_value"], r["n"])
            for r in spark.table("sliding").collect()}
    # 08:10 lands in [07:30,08:30) and [08:00,09:00); 08:40 in [08:00,09:00)
    # and [08:30,09:30)
    assert rows["07:30"] == (2.0, 1)
    assert rows["08:00"] == (3.0, 2)
    assert rows["08:30"] == (4.0, 1)


def test_session_windows_gap_close(spark, tmp_path):
    src = str(tmp_path / "events")
    # user 1: 08:00, 08:10 (same session), 09:30 (> 30 min gap → new one)
    # user 2: 08:05 alone
    _write_batch(src, 0, [("08:00", 1, "a", 0.0), ("08:10", 1, "a", 0.0),
                          ("09:30", 1, "a", 0.0), ("08:05", 2, "a", 0.0),
                          ("13:00", 9, "flush", 0.0)])
    events = sw.stream_events(spark, src)
    agg = sw.session_counts(events, gap="30 minutes", watermark="0 seconds")
    sw.run_to_memory(agg, str(tmp_path / "ckpt"), "sessions", output_mode="append")

    rows = sorted(
        (r["user_id"], r["s_start"].strftime("%H:%M"), r["s_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.table("sessions").collect()
        if r["user_id"] != 9
    )
    assert rows == [
        (1, "08:00", "08:40", 2),  # 08:00+08:10, closes 30 min after last
        (1, "09:30", "10:00", 1),
        (2, "08:05", "08:35", 1),
    ]


def test_session_window_exact_gap_merges(spark, tmp_path):
    """An event landing EXACTLY gap after its predecessor extends the
    session: the per-event window is half-open [ts, ts+gap) and Spark's
    session_window merges windows that merely touch. Pins the boundary
    the stream_session_counts oracle mirrors with a STRICT `>` island
    rule — a `>=` twin would split this pair and hash-mismatch."""
    src = str(tmp_path / "events")
    _write_batch(src, 0, [("08:00", 1, "a", 0.0), ("08:30", 1, "a", 0.0),
                          ("13:00", 9, "flush", 0.0)])
    events = sw.stream_events(spark, src)
    agg = sw.session_counts(events, gap="30 minutes", watermark="0 seconds")
    sw.run_to_memory(agg, str(tmp_path / "ckpt"), "sessions_exact", output_mode="append")

    rows = sorted(
        (r["user_id"], r["s_start"].strftime("%H:%M"), r["s_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.table("sessions_exact").collect()
        if r["user_id"] != 9
    )
    assert rows == [(1, "08:00", "09:00", 2)]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Re-delivered events (same event_id) inside the watermark horizon
    are dropped; distinct events all survive."""
    src = str(tmp_path / "events")
    _write_batch(src, 0, [("08:00", 1, "a", 1.0), ("08:10", 2, "a", 2.0)])
    # batch 1 re-delivers event 0 of batch 0 (same event_id=0) and adds
    # a new one
    import pandas as pdx

    pdf = pdx.DataFrame(
        {
            "event_id": [0, 300],  # 0 == first row of batch 0
            "ts": [datetime(2026, 1, 1, 8, 0), datetime(2026, 1, 1, 8, 20)],
            "user_id": [1, 3],
            "event_type": ["a", "a"],
            "value": [1.0, 3.0],
        }
    )
    path = os.path.join(src, "batch-0001.parquet")
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("ts"), "ts", t.column("ts").cast(pa.timestamp("us")))
    pq.write_table(t, path)
    mtime = time.time() + 10
    os.utime(path, (mtime, mtime))

    deduped = sw.dedup_events(sw.stream_events(spark, src, max_files_per_trigger=1))
    sw.run_to_memory(deduped, str(tmp_path / "ckpt"), "dedup_t")
    rows = sorted((r["event_id"], r["value"]) for r in spark.table("dedup_t").collect())
    assert rows == [(0, 1.0), (1, 2.0), (300, 3.0)]  # the re-delivery is gone


def test_stream_static_join_enrichment(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_batch(src, 0, [("08:10", 1, "click", 2.0), ("08:20", 2, "view", 3.0),
                          ("08:30", 3, "scroll", 5.0)])
    dim = spark.createDataFrame(
        [("click", 10.0), ("view", 0.5)], "event_type string, weight double"
    )
    events = sw.stream_events(spark, src)
    sw.run_to_memory(
        sw.enrich_stream_static(events, dim), str(tmp_path / "ckpt"), "enriched"
    )
    got = {
        (r.event_id, r.weighted_value)
        for r in spark.sql("select * from enriched").collect()
    }
    # 'scroll' has no dim row → dropped by the inner join
    assert got == {(0, 20.0), (1, 1.5)}


def test_stream_stream_interval_join(spark, tmp_path):
    views_dir, clicks_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    # user 1: view 08:00, clicks 08:30 (within 1h) and 09:30 (outside)
    # user 2: view 08:00, click 08:10 (within); user 3: click only → no pair
    _write_batch(views_dir, 0, [("08:00", 1, "view", 0.0), ("08:00", 2, "view", 0.0)])
    _write_batch(clicks_dir, 0, [("08:30", 1, "click", 0.0), ("09:30", 1, "click", 0.0),
                                 ("08:10", 2, "click", 0.0), ("08:40", 3, "click", 0.0)])
    joined = sw.join_clicks_to_views(
        sw.stream_events(spark, clicks_dir), sw.stream_events(spark, views_dir)
    )
    sw.run_to_memory(joined, str(tmp_path / "ckpt"), "paired")
    got = {
        (r.user_id, r.click_id, r.view_id)
        for r in spark.sql("select * from paired").collect()
    }
    assert got == {(1, 0, 0), (2, 2, 1)}


def test_stream_stream_left_outer_join_emits_after_eviction(spark, tmp_path):
    """Left-outer interval join: unmatched clicks surface with a NULL
    view only after the watermark proves no view can still arrive —
    state stays bounded and nulls are never premature."""
    views_dir, clicks_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    _write_batch(views_dir, 0, [("08:00", 1, "view", 0.0)])
    _write_batch(clicks_dir, 0, [("08:30", 1, "click", 0.0),  # pairs
                                 ("08:40", 3, "click", 0.0)])  # never pairs
    joined = sw.join_clicks_to_views(
        sw.stream_events(spark, clicks_dir),
        sw.stream_events(spark, views_dir),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("paired_lo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.user_id for r in spark.sql("select * from paired_lo").collect()}
        assert got == {1}  # the unmatched click must NOT emit yet
        # advance event time far past click_ts + gap on both streams
        _write_batch(views_dir, 1, [("12:00", 9, "view", 0.0)])
        _write_batch(clicks_dir, 1, [("12:00", 9, "click", 0.0)])
        q.processAllAvailable()
        _write_batch(views_dir, 2, [("12:30", 9, "view", 0.0)])
        _write_batch(clicks_dir, 2, [("12:30", 9, "click", 0.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from paired_lo").collect()
    unmatched = [r for r in rows if r.view_id is None]
    assert {r.user_id for r in unmatched} == {3}
    assert {(r.user_id, r.click_id, r.view_id) for r in rows if r.view_id is not None} >= {(1, 0, 0)}


def test_available_now_trigger_drains_backlog_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: the scheduled catch-up mode a production
    pipeline runs between streaming sessions — processes the whole
    backlog (in rate-limited micro-batches, honoring source options) and
    terminates on its own, with the same results as continuous
    processing."""
    src = str(tmp_path / "src")
    _write_batch(src, 0, [("08:05", 1, "view", 1.0), ("08:20", 2, "view", 1.0)])
    _write_batch(src, 1, [("08:35", 1, "view", 1.0), ("09:05", 3, "view", 1.0)])
    _write_batch(src, 2, [("09:40", 2, "view", 1.0), ("10:05", 1, "view", 1.0)])

    counts = sw.tumbling_counts(sw.stream_events(spark, src))
    q = (
        counts.writeStream.format("memory")
        .queryName("catchup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query must self-terminate"
    # append mode: only watermark-closed windows emit. Final watermark =
    # 10:05 − 30 min = 09:35, so exactly the 08:00-09:00 window closes;
    # later windows stay open — identical to continuous-mode semantics.
    got = {
        (r.w_start.strftime("%H:%M"), r.event_type, r.n)
        for r in spark.sql("select * from catchup").collect()
    }
    assert got == {("08:00", "view", 3)}


def test_tumbling_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart durability for the watermarked windowed agg: run
    the availableNow drain over the early shards, stop, land more shards,
    restart from the SAME checkpoint + output path. The checkpoint
    restores the watermark and window state, so the final appended set
    must equal one uninterrupted run — every finalized window emitted
    exactly once, none lost, none duplicated."""
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain() -> None:
        events = sw.stream_events(spark, src, max_files_per_trigger=1)
        agg = sw.tumbling_counts(events, window="1 hour", watermark="0 seconds")
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def read_out() -> dict:
        df = spark.read.schema(
            "w_start timestamp, w_end timestamp, event_type string, "
            "n bigint, sum_value double"
        ).parquet(out)
        rows = [r for r in df.collect() if r["event_type"] != "flush"]
        got = {}
        for r in rows:
            key = (r["w_start"].hour, r["event_type"])
            assert key not in got, f"window {key} emitted twice across restart"
            got[key] = (r["n"], r["sum_value"])
        return got

    # run 1: 08:xx and 09:xx events; the 10:00 row advances the watermark
    # to 10:00 at drain end, finalizing the 08:00 and 09:00 windows
    _write_batch(src, 0, [("08:10", 1, "click", 1.0), ("08:40", 1, "click", 2.0)])
    _write_batch(src, 1, [("09:10", 2, "view", 3.0), ("10:00", 8, "mark", 0.0)])
    drain()
    first = read_out()
    assert set(first) == {(8, "click"), (9, "view")}

    # run 2: later shards land after the "crash"; the restart must resume
    # from the checkpointed watermark (not re-emit 08/09) and finalize
    # 10:00 (the mark) and 11:xx once the 13:00 flusher advances time
    _write_batch(src, 2, [("11:30", 3, "click", 5.0)])
    _write_batch(src, 3, [("13:00", 9, "flush", 0.0)])
    drain()
    got = {k: v for k, v in read_out().items() if k[1] != "mark"}
    assert got == {
        (8, "click"): (2, 3.0),
        (9, "view"): (1, 3.0),
        (11, "click"): (1, 5.0),
    }
