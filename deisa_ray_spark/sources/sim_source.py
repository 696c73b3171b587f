"""Simulation chunk producer as a Spark Python DataSource (Spark 4 API):
``spark.read.format("sim_grid")`` / ``spark.readStream.format("sim_grid")``.

The reference's ingest is a PUSH from MPI ranks through Ray actors
(A1, bridge.py:343-407); the engine's production path mirrors it with the
file-drop SparkBridge (streaming/bridge.py). THIS source is the
no-files twin for development, benchmarks, and soak tests: the
simulation is *generated inside the source*, one input partition per
bridge rank, so chunk production runs executor-side and in parallel —
exactly how an embedded simulation source would look on a cluster
(each rank's partition is its send loop).

Golden-value convention shared with sources/chunks.py and the DuckDB
oracle GRID_CTE: rank ``r`` sends ``t * (r + 1) * ones(chunk_shape)``.

Batch: all timesteps at once, one partition per rank (parallel scan).
Streaming: one timestep per micro-batch (``latestOffset`` advances by
one — the simulation's pace), partitions(start, end) = one per rank,
rows generated executor-side; offsets make restarts exactly-once (the
offset IS the timestep, so a checkpoint restart regenerates
deterministically).

Options: ``arrays`` (csv, default "temperature,pressure"),
``timesteps`` (int, default 10), ``global_shape``/``chunk_shape``
("4x4"/"2x2"), ``dtype`` (numpy name, default int64).

Scale notes (100 TB): generation is embarrassingly parallel across
ranks; no shuffle, no driver materialization — the driver sees only
offsets and partition descriptors. Partitions emit ONE Arrow
RecordBatch each (the DataSource fast path) rather than pickled
per-row tuples. A real cluster source for an external simulation keeps
this exact shape and swaps the generator for a receive loop.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: DDL schema of the produced rows — mirrors model.CHUNK_SCHEMA.
SIM_SCHEMA = (
    "arr string, t bigint, bridge_id int, pos array<int>, "
    "chunk_shape array<int>, global_shape array<int>, dtype string, data binary"
)


def _parse_shape(s: str) -> tuple[int, ...]:
    return tuple(int(x) for x in s.lower().split("x"))


class _Opts:
    def __init__(self, options: dict) -> None:
        self.arrays: tuple[str, ...] = tuple(
            a for a in options.get("arrays", "temperature,pressure").split(",") if a
        )
        self.timesteps = int(options.get("timesteps", "10"))
        #: streaming only: rank 0 emits the end-of-stream sentinel with
        #: the final timestep's batch — the Bridge.close(last_t) analogue.
        self.with_sentinel = options.get("with_sentinel", "false").lower() == "true"
        self.gshape = _parse_shape(options.get("global_shape", "4x4"))
        self.cshape = _parse_shape(options.get("chunk_shape", "2x2"))
        self.dtype = options.get("dtype", "int64")
        if any(g % c for g, c in zip(self.gshape, self.cshape)):
            raise ValueError(
                f"global_shape {self.gshape} not divisible by chunk_shape {self.cshape}"
            )
        self.grid = tuple(g // c for g, c in zip(self.gshape, self.cshape))
        self.n_ranks = int(np.prod(self.grid))


class _RankPartition(InputPartition):
    def __init__(self, rank: int, t0: int, t1: int, sentinel: bool = False) -> None:
        self.rank = rank
        self.t0 = t0  # inclusive
        self.t1 = t1  # exclusive
        self.sentinel = sentinel  # emit close-sentinel after the rows


def _rank_rows(opts: _Opts, rank: int, t0: int, t1: int) -> list[tuple]:
    """Rank ``rank``'s sends for timesteps [t0, t1) — the send loop."""
    pos = list(map(int, np.unravel_index(rank, opts.grid)))
    np_dtype = np.dtype(opts.dtype)
    cshape = list(opts.cshape)
    gshape = list(opts.gshape)
    out = []
    for t in range(t0, t1):
        data = (t * (rank + 1)) * np.ones(opts.cshape, dtype=np_dtype)
        for arr in opts.arrays:
            out.append(
                (arr, t, rank, pos, cshape, gshape, np_dtype.name, data.tobytes())
            )
    return out


def _to_record_batch(rows: list[tuple]):
    """Pack rows into ONE Arrow RecordBatch — the Python DataSource fast
    path (Arrow batches cross the Python↔JVM boundary zero-copy-ish;
    per-row tuples are pickled one at a time)."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("arr", pa.string()),
            ("t", pa.int64()),
            ("bridge_id", pa.int32()),
            ("pos", pa.list_(pa.int32())),
            ("chunk_shape", pa.list_(pa.int32())),
            ("global_shape", pa.list_(pa.int32())),
            ("dtype", pa.string()),
            ("data", pa.binary()),
        ]
    )
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = [pa.array(c, type=f.type) for c, f in zip(cols, schema)]
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


class SimGridBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.opts = _Opts(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _RankPartition(r, 0, self.opts.timesteps)
            for r in range(self.opts.n_ranks)
        ]

    def read(self, partition: _RankPartition) -> Iterator:
        yield _to_record_batch(
            _rank_rows(self.opts, partition.rank, partition.t0, partition.t1)
        )


class SimGridStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.opts = _Opts(options)

    def initialOffset(self) -> dict:
        return {"t": 0}

    def latestOffset(self) -> dict:
        # One timestep per micro-batch until the configured horizon —
        # the simulation's pace; afterwards the offset stops advancing
        # (empty batches, stream idles like a finished sim).
        self._latest = getattr(self, "_latest", 0)
        if self._latest < self.opts.timesteps:
            self._latest += 1
        return {"t": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Restart resync: a fresh reader instance starts its offset
        # clock at 0, but Spark replans pending batches from the
        # CHECKPOINTED offsets — fast-forward the clock to the largest
        # offset seen so a restart never re-announces (and the engine
        # never re-ingests) timesteps the query already committed.
        self._latest = max(getattr(self, "_latest", 0), int(end["t"]))
        at_horizon = self.opts.with_sentinel and int(end["t"]) == self.opts.timesteps
        return [
            _RankPartition(r, int(start["t"]), int(end["t"]), sentinel=at_horizon and r == 0)
            for r in range(self.opts.n_ranks)
        ]

    def read(self, partition: _RankPartition) -> Iterator:
        rows = _rank_rows(self.opts, partition.rank, partition.t0, partition.t1)
        if partition.sentinel:
            # Bridge.close(last_t): 1x1 sentinel array from rank 0
            # (reference bridge.py:269-274).
            from deisa_ray_spark.model import SENTINEL_ARRAY

            last_t = self.opts.timesteps - 1
            rows.append(
                (
                    SENTINEL_ARRAY,
                    last_t,
                    0,
                    [0, 0],
                    [1, 1],
                    [1, 1],
                    "int64",
                    np.zeros((1, 1), dtype=np.int64).tobytes(),
                )
            )
        yield _to_record_batch(rows)

    def commit(self, end: dict) -> None:
        # same restart-resync as partitions(): committed offsets are a
        # floor for the clock
        self._latest = max(getattr(self, "_latest", 0), int(end["t"]))


class SimGridDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sim_grid"

    def schema(self) -> str:
        return SIM_SCHEMA

    def reader(self, schema) -> SimGridBatchReader:
        return SimGridBatchReader(self.options)

    def streamReader(self, schema) -> SimGridStreamReader:
        return SimGridStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('sim_grid')``."""
    spark.dataSource.register(SimGridDataSource)


def batch_loader(spark, **options: str):
    """Chunk loader for InSituEngine's data plane when the control plane
    consumes the sim_grid stream: callbacks' ``ArrayFrame.chunks()``
    re-reads the deterministic source (batch, partition-parallel) pruned
    to one (arr, t) — the no-files analogue of the pruned parquet scan."""
    from pyspark.sql import functions as F

    register(spark)

    def load(name: str, t: int):
        df = spark.read.format("sim_grid").options(**options).load()
        return df.filter((F.col("arr") == name) & (F.col("t") == t))

    return load
