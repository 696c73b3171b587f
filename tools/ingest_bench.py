#!/usr/bin/env python
"""Ingest throughput bench — the direct mirror of the reference's only
quantitative baseline (BASELINE.md: tests/test_memory_release.py — 240
timesteps x 4 MiB chunk (1024x1024 int32) through an 80 MiB object
store with ZERO spill).

This engine's equivalents:
- payload transport = the chunk drop dir (disk-backed by design; the
  80 MiB in-memory-store constraint maps to "control-plane state stays
  O(1)", proven in tests/test_state_bounded.py);
- the run here measures end-to-end wall-clock: 240 x 4 MiB sends
  (bridge), control-plane assembly of 240 boundaries, and a callback
  per boundary computing the global sum of the assembled 1024x1024
  array (the reference callback's `.compute()` analogue).

Prints one JSON line; run: python tools/ingest_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITERATIONS = 240  # reference NB_ITERATIONS (tests/test_memory_release.py:17)
SHAPE = (1024, 1024)  # reference chunk: 4 MiB int32 (:88-92)


def main() -> None:
    from deisa_ray_spark.session import get_session
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    spark = get_session(app_name="ingest_bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    chunk_dir = os.path.join(work, "chunks")
    md = metadata_for_grid(("field",), SHAPE, SHAPE, (0, 0))
    bridge = SparkBridge(0, md, chunk_dir)

    t0 = time.monotonic()
    chunk = np.ones(SHAPE, dtype=np.int32)
    for t in range(N_ITERATIONS):
        bridge.send("field", chunk * t, t)
    bridge.close(N_ITERATIONS - 1)
    t_send = time.monotonic() - t0

    sums: list[float] = []

    def cb(field):
        af = field[-1]
        sums.append(float(af.to_numpy().sum()))

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("field"))
    t1 = time.monotonic()
    engine.run(checkpoint_dir=os.path.join(work, "ckpt"), max_files_per_trigger=None)
    t_analyze = time.monotonic() - t1

    n_cells = SHAPE[0] * SHAPE[1]
    ok = sums == [float(t * n_cells) for t in range(N_ITERATIONS)]
    mb = N_ITERATIONS * chunk.nbytes / 1e6
    print(
        json.dumps(
            {
                "metric": "insitu_ingest_throughput",
                "n_timesteps": N_ITERATIONS,
                "chunk_mib": round(chunk.nbytes / 2**20, 2),
                "send_sec": round(t_send, 2),
                "analyze_sec": round(t_analyze, 2),
                "end_to_end_mb_per_sec": round(mb / (t_send + t_analyze), 1),
                "golden_values_ok": ok,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
