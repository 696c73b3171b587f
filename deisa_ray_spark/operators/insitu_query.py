"""The full in-situ streaming workflow as a declared, oracle-checked
query: bridges → chunk drop dir → Structured Streaming control plane →
windowed callbacks → per-timestep results as a DataFrame.

This puts the ENTIRE streaming stack (A1-A10) under the driver's
hash-checked correctness gate, not just behavioral tests: 4 bridges send
``t*(r+1)*ones(2,2)`` for t=0..4 (the reference's golden-value
convention), a size-2-window callback records the assembled sum and the
windowed diff per timestep, and the result matches the closed form
``sum = 40t, diff = 40`` that the oracle computes independently.

The temp dirs live under the system tmpdir and are recreated per run —
the query is deterministic and self-contained.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from deisa_ray_spark.registry import query

N_TIMESTEPS = 5


@query(
    "insitu_workflow_e2e",
    oracle=f"""
    SELECT CAST(t.t AS BIGINT) AS t,
           CAST(40 * t.t AS DOUBLE) AS sum_v,
           round(40.0 * t.t / 16, 6) AS mean_v,
           CAST(CASE WHEN t.t = 0 THEN NULL ELSE 40 END AS DOUBLE) AS window_diff
    FROM range(0, {N_TIMESTEPS}) t(t)
    """,
)
def insitu_workflow_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: ingest → stateful assembly/trigger → sliding-window
    callback → results. Golden values per the reference's convention
    (rank r sends t*(r+1)*ones, tests/test_full_workflow.py:24-27)."""
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    work = tempfile.mkdtemp(prefix="insitu_q_")
    try:
        chunk_dir = f"{work}/chunks"
        bridges = [
            SparkBridge(
                r,
                metadata_for_grid(("temperature",), (4, 4), (2, 2), (r // 2, r % 2)),
                chunk_dir,
            )
            for r in range(4)
        ]
        for t in range(N_TIMESTEPS):
            for r, b in enumerate(bridges):
                b.send("temperature", t * (r + 1) * np.ones((2, 2), dtype=np.int64), t)
        bridges[0].close(N_TIMESTEPS - 1)

        results: list[tuple[int, float, float, float | None]] = []

        def cb(temperature):
            af = temperature[-1]
            a = af.to_numpy()
            diff = (
                float(a.sum() - temperature[0].to_numpy().sum())
                if len(temperature) == 2
                else None
            )
            results.append((af.t, float(a.sum()), float(a.mean()), diff))

        engine = InSituEngine(spark, chunk_dir)
        engine.register_callback(cb, ArrayWindow("temperature", size=2))
        engine.run(checkpoint_dir=f"{work}/ckpt", max_files_per_trigger=None)

        return spark.createDataFrame(
            results, "t bigint, sum_v double, mean_v double, window_diff double"
        ).selectExpr("t", "sum_v", "round(mean_v, 6) AS mean_v", "window_diff")
    finally:
        shutil.rmtree(work, ignore_errors=True)
