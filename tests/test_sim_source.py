"""Custom Python DataSource (Spark 4 API) for simulation chunk ingest:
batch rows must be byte-identical to the file-drop fixture generator,
streaming must deliver exactly one timestep per micro-batch (the sim's
pace) and stop advancing at the horizon."""

from __future__ import annotations

from deisa_ray_spark.sources.chunks import make_chunk_df
from deisa_ray_spark.sources.sim_source import register


def test_batch_source_matches_fixture_generator(spark):
    register(spark)
    df = spark.read.format("sim_grid").option("timesteps", "10").load()
    # one input partition per bridge rank — generation is parallel
    assert df.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, make_chunk_df(spark).collect()))
    assert a == b


def test_stream_source_one_timestep_per_batch(spark, tmp_path):
    register(spark)
    st = spark.readStream.format("sim_grid").option("timesteps", "3").load()
    q = (
        st.writeStream.format("memory")
        .queryName("simsrc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT t, count(*) AS n FROM simsrc GROUP BY t ORDER BY t"
        ).collect()
    finally:
        q.stop()
    # 2 arrays × 4 ranks = 8 chunk rows per timestep; horizon respected
    assert [(r.t, r.n) for r in rows] == [(0, 8), (1, 8), (2, 8)]


def test_insitu_engine_over_sim_stream(spark, tmp_path):
    """Full in-situ stack with NO files: control plane consumes the
    sim_grid stream (sentinel emitted by rank 0 at the horizon), data
    plane re-reads the deterministic source pruned per (arr, t).
    Golden values identical to the file-drop e2e (assembled sum 40t)."""
    from deisa_ray_spark.sources.sim_source import batch_loader
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine

    register(spark)
    opts = {"timesteps": "5"}
    stream = (
        spark.readStream.format("sim_grid")
        .options(with_sentinel="true", **opts)
        .load()
    )
    sums: dict[int, float] = {}

    def cb(temperature, pressure):
        af = temperature[-1]
        a = af.to_numpy()
        assert a.shape == (4, 4)
        sums[af.t] = float(a.sum())

    engine = InSituEngine(
        spark,
        chunk_dir=str(tmp_path / "unused"),
        chunk_stream=stream,
        chunk_loader=batch_loader(spark, **opts),
    )
    engine.register_callback(
        cb, ArrayWindow("temperature"), ArrayWindow("pressure"), when="AND"
    )
    engine.run_live(str(tmp_path / "ckpt"))

    assert engine.done
    assert sums == {t: 40.0 * t for t in range(5)}


def test_feedback_sink_batch_write(spark, tmp_path):
    """Batch write through the deisa_feedback DataSource publishes into
    the same store SparkBridge.get reads, with strict-increase enforced
    at commit."""
    import json

    from deisa_ray_spark.sources.feedback_sink import register
    from deisa_ray_spark.streaming.feedback import read_feedback

    register(spark)
    fb = str(tmp_path / "fb")
    rows = [("alpha", t, json.dumps({"v": t * 10})) for t in range(3)]
    df = spark.createDataFrame(rows, "key string, t bigint, value string")
    df.coalesce(1).write.format("deisa_feedback").option("path", fb).mode(
        "append"
    ).save()
    assert read_feedback(fb, "alpha", 2) == {"v": 20}
    assert [t for t, _ in read_feedback(fb, "alpha")] == [0, 1, 2]
    # non-increasing replay must fail the write (A11 strict increase)
    import pytest as _pytest

    with _pytest.raises(Exception, match="strictly increasing"):
        df.coalesce(1).write.format("deisa_feedback").option("path", fb).mode(
            "append"
        ).save()


def test_feedback_sink_streaming_closes_fileless_loop(spark, tmp_path):
    """sim_grid stream -> per-rank chunk telemetry -> deisa_feedback
    stream sink -> SparkBridge-style read: the whole feedback loop runs
    inside Spark with no user-managed files."""
    import pyspark.sql.functions as F

    from deisa_ray_spark.sources.feedback_sink import register as reg_sink
    from deisa_ray_spark.sources.sim_source import register as reg_src
    from deisa_ray_spark.streaming.feedback import read_feedback

    reg_src(spark)
    reg_sink(spark)
    fb = str(tmp_path / "fb")
    st = (
        spark.readStream.format("sim_grid")
        .options(arrays="temperature", timesteps="4", global_shape="4x4",
                 chunk_shape="2x2")
        .load()
    )
    # per-rank telemetry: one feedback row per (rank, t) — strictly
    # increasing t within each key by construction
    telemetry = st.select(
        F.concat(F.col("arr"), F.lit("/rank"), F.col("bridge_id")).alias("key"),
        F.col("t"),
        F.to_json(F.struct(F.length("data").alias("n_bytes"))).alias("value"),
    )
    q = (
        telemetry.writeStream.format("deisa_feedback")
        .option("path", fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 4 ranks x 4 timesteps (t=1..4 — the stream advances one t per batch)
    hist = read_feedback(fb, "temperature/rank0")
    assert [t for t, _ in hist] == [0, 1, 2, 3]
    assert hist[-1][1]["n_bytes"] == 2 * 2 * 8  # one 2x2 int64 chunk
    assert read_feedback(fb, "temperature/rank3", 2)["n_bytes"] == 32


def test_feedback_batch_rejection_publishes_nothing(spark, tmp_path):
    """Regression: a mid-batch strict-increase violation used to leave
    the batch's earlier rows published ('a failed batch publishes
    nothing' was false), making the retried batch trip over its own
    partial publish. The whole batch is now validated first."""
    import json

    from deisa_ray_spark.sources.feedback_sink import register
    from deisa_ray_spark.streaming.feedback import FeedbackStore, read_feedback

    register(spark)
    fb = str(tmp_path / "fb")
    FeedbackStore(fb).set("k2", {"v": 0}, 6)  # pre-existing t=6
    rows = [
        ("k1", 5, json.dumps({"v": 1})),
        ("k2", 6, json.dumps({"v": 2})),  # violates strict increase
    ]
    df = spark.createDataFrame(rows, "key string, t bigint, value string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="nothing published"):
        df.coalesce(1).write.format("deisa_feedback").option("path", fb).mode(
            "append"
        ).save()
    # k1's row must NOT have been published by the failed batch
    assert read_feedback(fb, "k1", 5, default="MISS") == "MISS"


def test_feedback_stream_replayed_batch_is_noop(spark, tmp_path):
    """Regression: the stream writer's commit ignored batchId, so an
    at-least-once replay of a committed batch always tripped the
    strict-increase guard and crash-looped the query. Replays are now
    idempotent via per-batch commit markers."""
    import json

    from deisa_ray_spark.sources.feedback_sink import _FeedbackStreamWriter
    from deisa_ray_spark.sources.feedback_sink import _StagedRows
    from deisa_ray_spark.streaming.feedback import read_feedback

    fb = str(tmp_path / "fb")
    w = _FeedbackStreamWriter({"path": fb})
    msgs = [_StagedRows(rows=[("k", 1, json.dumps({"v": 7}))])]
    w.commit(msgs, batchId=42)
    w.commit(msgs, batchId=42)  # replay: must be a silent no-op
    assert read_feedback(fb, "k", 1) == {"v": 7}
    assert [t for t, _ in read_feedback(fb, "k")] == [1]


def test_duplicate_chunk_resend_does_not_fake_completeness(spark, tmp_path):
    """Regression: completeness counted ARRIVALS, so a crashed bridge
    re-sending its chunk (same position, new file) marked the timestep
    complete with a real position still missing — to_numpy then returned
    uninitialized np.empty garbage silently. Completeness is now
    distinct-position based."""
    import numpy as np

    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    chunk_dir = str(tmp_path / "chunks")
    md0 = metadata_for_grid(("temperature",), (2, 4), (2, 2), (0, 0))
    md1 = metadata_for_grid(("temperature",), (2, 4), (2, 2), (0, 1))
    b0 = SparkBridge(0, md0, chunk_dir)
    b1 = SparkBridge(1, md1, chunk_dir)
    # t=0: rank 0 sends TWICE (crash-resend), rank 1's chunk arrives late
    b0.send("temperature", 1 * np.ones((2, 2), dtype=np.int64), 0)
    b0._last_t = None  # simulate process restart (fresh ordering state)
    b0.send("temperature", 1 * np.ones((2, 2), dtype=np.int64), 0)

    seen = {}

    def cb(temperature):
        af = temperature[-1]
        seen[af.t] = af.to_numpy().copy()

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature"))
    # first drain: only duplicates of pos (0,0) present -> NOT complete
    engine.drain_available(str(tmp_path / "ckpt"), max_files_per_trigger=None)
    assert seen == {}
    # rank 1's chunk + t=1 to close the boundary
    b1.send("temperature", 2 * np.ones((2, 2), dtype=np.int64), 0)
    for b, v in ((b0, 3), (b1, 4)):
        b.send("temperature", v * np.ones((2, 2), dtype=np.int64), 1)
    b0.close(1)
    engine.run(checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=None)
    expect0 = np.hstack(
        [np.full((2, 2), 1, dtype=np.int64), np.full((2, 2), 2, dtype=np.int64)]
    )
    np.testing.assert_array_equal(seen[0], expect0)
