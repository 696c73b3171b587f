"""Deterministic chunk-table generator: the test-side stand-in for the
reference's ``Bridge.send`` producer.

Golden-value convention copied from the reference's tests
(tests/test_sliding_window.py:66-68, tests/test_full_workflow.py:55-57):
rank ``r`` sends ``t * (r + 1) * ones(chunk_shape)`` at timestep ``t``.
With the FIXTURES.md F1 layout (global 4x4, chunks 2x2 → 2x2 grid, 4
bridges, bridge id = pos[0]*2 + pos[1]) every cell value has the closed
form ``t * ((x // 2) * 2 + (y // 2) + 1)``, which both the pytest oracle
and the DuckDB oracle (operators/grid_ops.GRID_CTE) reproduce
independently of this code.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from deisa_ray_spark.model import CHUNK_SCHEMA, SENTINEL_ARRAY, validate_arrays_metadata

DEFAULT_ARRAYS = ("temperature", "pressure")
DEFAULT_GLOBAL_SHAPE = (4, 4)
DEFAULT_CHUNK_SHAPE = (2, 2)
DEFAULT_TIMESTEPS = tuple(range(10))


def chunk_rows_pdf(
    arrays: Sequence[str] = DEFAULT_ARRAYS,
    global_shape: Sequence[int] = DEFAULT_GLOBAL_SHAPE,
    chunk_shape: Sequence[int] = DEFAULT_CHUNK_SHAPE,
    timesteps: Sequence[int] = DEFAULT_TIMESTEPS,
    dtype: str = "int64",
    with_sentinel: bool = False,
) -> pd.DataFrame:
    """Generate chunk rows per the F1 generator as a pandas DataFrame."""
    gshape = tuple(int(d) for d in global_shape)
    cshape = tuple(int(d) for d in chunk_shape)
    grid = tuple(g // c for g, c in zip(gshape, cshape))
    # Contract-check the layout we are about to emit.
    validate_arrays_metadata(
        {a: {"global_shape": gshape, "chunk_shape": cshape, "chunk_position": (0,) * len(gshape)} for a in arrays}
    )
    rows = []
    np_dtype = np.dtype(dtype)
    for t in timesteps:
        for arr in arrays:
            for pos in np.ndindex(grid):
                bridge_id = int(np.ravel_multi_index(pos, grid))
                data = (int(t) * (bridge_id + 1)) * np.ones(cshape, dtype=np_dtype)
                rows.append(
                    {
                        "arr": arr,
                        "t": int(t),
                        "bridge_id": bridge_id,
                        "pos": list(map(int, pos)),
                        "chunk_shape": list(cshape),
                        "global_shape": list(gshape),
                        "dtype": np_dtype.name,
                        "data": data.tobytes(),
                    }
                )
    if with_sentinel:
        last_t = max(timesteps) + 1 if len(timesteps) else 0
        rows.append(
            {
                "arr": SENTINEL_ARRAY,
                "t": int(last_t),
                "bridge_id": 0,
                "pos": [0, 0],
                "chunk_shape": [1, 1],
                "global_shape": [1, 1],
                "dtype": "int64",
                "data": np.zeros((1, 1), dtype=np.int64).tobytes(),
            }
        )
    return pd.DataFrame(rows)


def make_chunk_df(spark: SparkSession, n_partitions: int = 2, **kwargs) -> DataFrame:
    """Chunk table as a Spark DataFrame with ``CHUNK_SCHEMA``.

    Partition count is sized to the fixture (80 chunk rows), not the
    cluster default: downstream ``mapInPandas`` decode spawns one Python
    worker per partition, so letting this default to
    ``spark.default.parallelism`` (32 here) pays ~30 s of worker spin-up
    to decode rows that fit in one Arrow batch. At scale the same rule
    holds in reverse — partitions should track chunk-table size.
    """
    pdf = chunk_rows_pdf(**kwargs)
    return spark.createDataFrame(pdf, schema=CHUNK_SCHEMA).coalesce(n_partitions)
