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
