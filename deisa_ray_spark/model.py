"""Chunk-table data model: the Spark equivalent of the reference's
chunk/metadata contract.

Reference model (SURVEY §1): a *chunk* is one rank's ``np.ndarray`` for one
named array at one timestep (bridge.py:343-360); a distributed array is
described by ``arrays_metadata`` = {global_shape, chunk_shape,
chunk_position} with a regular grid (validate.py:43-110).

Spark model: a chunk is a ROW of ``CHUNK_SCHEMA`` with the ndarray as
C-order bytes in a binary column. Assembled arrays are either
- long form: one row per cell ``(arr, t, x, y, value)`` — the shape most
  operators want (Catalyst-native filters/aggs/joins over coordinates), or
- dense tensors materialized per (arr, t) group via ``applyInPandas``
  (see operators/assembly.py) when a whole-array kernel (SVD/FFT) needs it.

Scale note: at 100 TB the chunk table is parquet partitioned by
``arr``/``t`` — partition pruning turns "assemble array X at timestep T"
into a scan of exactly the needed chunk files. Binary payloads stay opaque
until a kernel needs them (no explode at scale without coordinate/field
pruning first).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from deisa_ray_spark.errors import ContractError

#: Sentinel array name used by the reference to signal end-of-stream
#: (bridge.py:269-274: rank 0 declares a 1x1 sentinel array; close() sends
#: it at the final timestep; consumed at window_handler.py:326-327).
SENTINEL_ARRAY = "__deisa_last_iteration_array"

#: One row per chunk: mirrors the ``Bridge.send`` payload + per-array
#: metadata (FIXTURES.md F1).
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("arr", T.StringType(), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("bridge_id", T.IntegerType(), False),
        T.StructField("pos", T.ArrayType(T.IntegerType()), False),
        T.StructField("chunk_shape", T.ArrayType(T.IntegerType()), False),
        T.StructField("global_shape", T.ArrayType(T.IntegerType()), False),
        T.StructField("dtype", T.StringType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

#: Long-form cell schema (2-D arrays; the reference's own tests are 2-D).
GRID_SCHEMA = "arr string, t bigint, x int, y int, value double"

_REQUIRED_KEYS = frozenset({"global_shape", "chunk_shape", "chunk_position"})


def _as_int_tuple(name: str, key: str, value: object) -> tuple[int, ...]:
    """Normalize tuple/list/1-D ndarray of positive-able ints
    (reference validate.py:7-40)."""
    if isinstance(value, np.ndarray):
        if value.ndim != 1:
            raise ContractError(f"{name}.{key}: expected 1-D, got ndim={value.ndim}")
        value = value.tolist()
    if not isinstance(value, (tuple, list)):
        raise ContractError(f"{name}.{key}: expected tuple/list/1-D ndarray, got {type(value).__name__}")
    out = []
    for v in value:
        if isinstance(v, (bool, float)) or not isinstance(v, (int, np.integer)):
            raise ContractError(f"{name}.{key}: non-integer element {v!r}")
        out.append(int(v))
    return tuple(out)


def validate_arrays_metadata(arrays_metadata: Mapping[str, Mapping[str, object]]) -> dict[str, dict[str, tuple[int, ...]]]:
    """Validate per-array layout metadata; raise ``ContractError`` on any
    violation. Mirrors reference validate.py:113-167:

    - required keys exactly {global_shape, chunk_shape, chunk_position};
      missing or unknown keys are errors (validate.py:139-163),
    - shapes positive, same ndim (validate.py:80-88),
    - every global dim evenly divisible by the chunk dim (validate.py:90-91),
    - chunk_position within the grid ``global // chunk`` (validate.py:101-104).

    Returns normalized metadata with int tuples.
    """
    if not isinstance(arrays_metadata, Mapping) or not arrays_metadata:
        raise ContractError("arrays_metadata must be a non-empty mapping")
    norm: dict[str, dict[str, tuple[int, ...]]] = {}
    for name, md in arrays_metadata.items():
        if not isinstance(md, Mapping):
            raise ContractError(f"{name}: metadata must be a mapping")
        keys = set(md.keys())
        missing = _REQUIRED_KEYS - keys
        unknown = keys - _REQUIRED_KEYS
        if missing:
            raise ContractError(f"{name}: missing metadata keys {sorted(missing)}")
        if unknown:
            raise ContractError(f"{name}: unknown metadata keys {sorted(unknown)}")
        gshape = _as_int_tuple(name, "global_shape", md["global_shape"])
        cshape = _as_int_tuple(name, "chunk_shape", md["chunk_shape"])
        pos = _as_int_tuple(name, "chunk_position", md["chunk_position"])
        if len(gshape) != len(cshape) or len(gshape) != len(pos):
            raise ContractError(
                f"{name}: ndim mismatch global={len(gshape)} chunk={len(cshape)} pos={len(pos)}"
            )
        if any(d <= 0 for d in gshape) or any(d <= 0 for d in cshape):
            raise ContractError(f"{name}: shapes must be positive, got {gshape} / {cshape}")
        if any(g % c != 0 for g, c in zip(gshape, cshape)):
            raise ContractError(f"{name}: global_shape {gshape} not divisible by chunk_shape {cshape}")
        grid = tuple(g // c for g, c in zip(gshape, cshape))
        if any(p < 0 or p >= n for p, n in zip(pos, grid)):
            raise ContractError(f"{name}: chunk_position {pos} outside grid {grid}")
        norm[name] = {"global_shape": gshape, "chunk_shape": cshape, "chunk_position": pos}
    return norm


def check_declared(df: DataFrame, declared: Iterable[str]) -> DataFrame:
    """Contract check: fail the job if a chunk row names an undeclared
    array (reference scheduling_actor.py:281-287 raises ContractError).

    Implemented as a JVM-side expression (raise_error under a when), so it
    runs inside the scan stage with zero extra shuffle at any scale.
    """
    from pyspark.sql import functions as F

    declared = list(declared) + [SENTINEL_ARRAY]
    return df.withColumn(
        "arr",
        F.when(F.col("arr").isin(declared), F.col("arr")).otherwise(
            F.raise_error(F.concat(F.lit("ContractError: undeclared array "), F.col("arr")))
        ),
    )


def explode_chunks(chunks: DataFrame) -> DataFrame:
    """Decode 2-D binary chunks into long form ``(arr, t, x, y, value)``.

    This is the batch equivalent of the reference's assembly (A4,
    types.py:721-791): instead of materializing a dense global tensor, we
    emit cell rows with *global* coordinates (chunk offset + local index) —
    downstream coordinate ops then never need the dense form.

    Runs as ``mapInPandas`` (Arrow-batched, per-partition, no shuffle):
    each chunk row expands independently, so parallelism = input partition
    count and the operator streams at any scale.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            arrs, ts, xs, ys, vals = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                shape = tuple(row.chunk_shape)
                if len(shape) != 2:
                    raise ContractError(f"explode_chunks supports 2-D chunks, got shape {shape}")
                a = np.frombuffer(row.data, dtype=np.dtype(row.dtype)).reshape(shape)
                ox = int(row.pos[0]) * shape[0]
                oy = int(row.pos[1]) * shape[1]
                lx, ly = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
                n = a.size
                arrs.append(np.repeat(row.arr, n))
                ts.append(np.full(n, row.t, dtype=np.int64))
                xs.append((lx + ox).ravel().astype(np.int32))
                ys.append((ly + oy).ravel().astype(np.int32))
                vals.append(a.astype(np.float64).ravel())
            yield pd.DataFrame(
                {
                    "arr": np.concatenate(arrs),
                    "t": np.concatenate(ts),
                    "x": np.concatenate(xs),
                    "y": np.concatenate(ys),
                    "value": np.concatenate(vals),
                }
            )

    return chunks.mapInPandas(gen, schema=GRID_SCHEMA)


GRID_ND_SCHEMA = "arr string, t bigint, coord array<int>, value double"


def explode_chunks_nd(chunks: DataFrame) -> DataFrame:
    """N-dimensional decode: binary chunks → ``(arr, t, coord, value)``
    with ``coord`` the GLOBAL index vector (chunk offset + local index).

    The reference validates arbitrary ndim (validate.py:96-105 — pos
    length must equal the array's rank) and assembles N-d Dask arrays
    (types.py:721-791); the 2-D ``explode_chunks`` is the hot path for
    the fixture layouts, this is the general form. Axis-wise ops address
    dimensions with ``element_at(coord, k)`` — grouping on every
    dimension except k IS ``mean(axis=k-1)``, at any rank, and no dense
    tensor is ever materialized.

    Same execution shape as the 2-D path: ``mapInPandas``, Arrow-batched,
    zero shuffle — each chunk row expands independently.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            arrs, ts, coords, vals = [], [], [], []
            for row in pdf.itertuples(index=False):
                shape = tuple(row.chunk_shape)
                a = np.frombuffer(row.data, dtype=np.dtype(row.dtype)).reshape(shape)
                offs = np.array(
                    [int(p) * s for p, s in zip(row.pos, shape)], dtype=np.int32
                )
                idx = np.indices(shape, dtype=np.int32).reshape(len(shape), -1)
                n = a.size
                arrs.append(np.repeat(row.arr, n))
                ts.append(np.full(n, row.t, dtype=np.int64))
                coords.extend((idx + offs[:, None]).T.tolist())
                vals.append(a.astype(np.float64).ravel())
            yield pd.DataFrame(
                {
                    "arr": np.concatenate(arrs),
                    "t": np.concatenate(ts),
                    "coord": coords,
                    "value": np.concatenate(vals),
                }
            )

    return chunks.mapInPandas(gen, schema=GRID_ND_SCHEMA)
