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

Two configurations, one JSON line each:
- ``single``: the reference workload verbatim — 1 rank, 240 x 4 MiB;
- ``grid``: the multi-rank shape of the reference's MPI e2e
  (tests/test_mpi_workflow.py), scaled — a 4x4 rank grid, 16 MiB chunk
  per rank (2048x2048 int32), 256 MiB assembled per boundary. This row
  shows assembly cost per boundary staying proportional to bytes (flat
  per MB) as rank count grows 16x, not blowing up with the rank count.

Run: python tools/ingest_bench.py [single|grid|both]   (default both)
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

GRID = (4, 4)  # rank grid of the scaled MPI shape
GRID_CHUNK = (2048, 2048)  # 16 MiB int32 per rank per timestep
GRID_GLOBAL = (GRID[0] * GRID_CHUNK[0], GRID[1] * GRID_CHUNK[1])
N_ITER_GRID = 12


def run_single(spark) -> None:
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

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
        ),
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


def run_grid(spark) -> None:
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    work = tempfile.mkdtemp(prefix="ingest_bench_grid_")
    chunk_dir = os.path.join(work, "chunks")
    n_ranks = GRID[0] * GRID[1]
    bridges = []
    for r in range(n_ranks):
        pos = (r // GRID[1], r % GRID[1])
        md = metadata_for_grid(("field",), GRID_GLOBAL, GRID_CHUNK, pos)
        bridges.append(SparkBridge(r, md, chunk_dir))

    t0 = time.monotonic()
    for t in range(N_ITER_GRID):
        for r, b in enumerate(bridges):
            b.send("field", np.full(GRID_CHUNK, t * 100 + r, dtype=np.int32), t)
    bridges[0].close(N_ITER_GRID - 1)
    t_send = time.monotonic() - t0

    results: list[bool] = []

    def cb(field):
        arr = field[-1].to_numpy()
        t = int(arr[0, 0]) // 100  # rank 0's block carries t*100
        ok = arr.shape == GRID_GLOBAL
        for r in range(n_ranks):
            i, j = r // GRID[1], r % GRID[1]
            block = arr[
                i * GRID_CHUNK[0]:(i + 1) * GRID_CHUNK[0],
                j * GRID_CHUNK[1]:(j + 1) * GRID_CHUNK[1],
            ]
            ok = ok and bool((block == t * 100 + r).all())
        results.append(ok)

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("field"))
    t1 = time.monotonic()
    engine.run(checkpoint_dir=os.path.join(work, "ckpt"), max_files_per_trigger=None)
    t_analyze = time.monotonic() - t1

    chunk_bytes = GRID_CHUNK[0] * GRID_CHUNK[1] * 4
    mb = N_ITER_GRID * n_ranks * chunk_bytes / 1e6
    print(
        json.dumps(
            {
                "metric": "insitu_ingest_throughput_grid",
                "n_ranks": n_ranks,
                "n_timesteps": N_ITER_GRID,
                "chunk_mib": round(chunk_bytes / 2**20, 2),
                "boundary_mib": round(n_ranks * chunk_bytes / 2**20, 2),
                "send_sec": round(t_send, 2),
                "analyze_sec": round(t_analyze, 2),
                "analyze_sec_per_boundary": round(t_analyze / N_ITER_GRID, 3),
                "end_to_end_mb_per_sec": round(mb / (t_send + t_analyze), 1),
                "golden_blocks_ok": len(results) == N_ITER_GRID and all(results),
            }
        ),
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from deisa_ray_spark.session import get_session

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_session(app_name="ingest_bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("single", "both"):
        run_single(spark)
    if which in ("grid", "both"):
        run_grid(spark)


if __name__ == "__main__":
    main()
