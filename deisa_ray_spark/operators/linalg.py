"""Dense tensor kernels over assembled arrays: global assembly (A4), SVD
(B18), FFT (B19), dense matmul (B11 dense path).

These are the operators whose semantics genuinely need the dense tensor
(reference delegates them to ``da.linalg.svd`` / ``da.fft.fft``,
tests/test_analytics.py:87-100). The Spark shape:

1. ``assemble_dense``: groupBy (arr, t) → ``applyInPandas`` placing each
   decoded binary chunk at its grid offset (the A4 ``np.block`` equivalent,
   reference types.py:721-791). One shuffle keyed by (arr, t); each group
   is one bounded tensor — never a global collect.
2. kernel: NumPy on the per-group tensor inside the same pandas UDF,
   emitting long-form result rows.

Oracle-ability: the deterministic F1 generator makes even these kernels
SQL-checkable —
- FFT with N=4 has exact twiddle factors {0, ±1}, so the DuckDB twin
  computes the DFT as a join-aggregate over cos/sin terms;
- the generator matrix is ``t * kron([[1,2],[3,4]], ones(2,2))`` whose
  singular values have the closed form ``{2t·sqrt(15+sqrt(221)),
  2t·sqrt(15-sqrt(221)), 0, 0}`` (σ(kron(A,B)) = σ(A)⊗σ(B)).

Scale notes (100 TB): per-(arr,t) tensors are bounded by the declared
global_shape — the shuffle moves each tensor's chunks to one task, and
ntensors × nkernels parallelize across executors. For tensors too big for
one task, B11 falls back to the join-aggregate plan (grid_matmul_tn) and
B18 to MLlib RowMatrix.computeSVD — both already expressed on the
long form.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.operators.grid_ops import GRID_CTE
from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.chunks import make_chunk_df

#: Dense assembled-array schema: one row per (arr, t) with the full tensor.
DENSE_SCHEMA = "arr string, t bigint, shape array<int>, data binary"


def assemble_dense(chunks: DataFrame) -> DataFrame:
    """A4 global assembly: all chunks of (arr, t) → one dense C-order
    tensor row. Completeness-checked: raises if the chunk set does not
    tile the declared global_shape (reference types.py:675-719)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = pdf["arr"].iloc[0]
        t = pdf["t"].iloc[0]
        gshape = tuple(pdf["global_shape"].iloc[0])
        cshape = tuple(pdf["chunk_shape"].iloc[0])
        grid = tuple(g // c for g, c in zip(gshape, cshape))
        expected = int(np.prod(grid))
        # tile check on DISTINCT positions: a duplicated chunk plus a
        # missing one has the right row COUNT but leaves an np.empty
        # hole of uninitialized garbage — the set must equal the grid
        positions = {tuple(int(x) for x in p) for p in pdf["pos"]}
        want = {tuple(int(x) for x in p) for p in np.ndindex(grid)}
        if positions != want:
            missing = sorted(want - positions)
            extra = sorted(positions - want)
            raise ValueError(
                f"incomplete array ({arr}, t={t}): {len(pdf)} chunk rows; "
                f"missing positions {missing[:8]}, out-of-grid {extra[:8]}"
            )
        out = np.empty(gshape, dtype=np.float64)
        for row in pdf.itertuples(index=False):
            block = np.frombuffer(row.data, dtype=np.dtype(row.dtype)).reshape(cshape)
            sl = tuple(
                slice(p * c, (p + 1) * c) for p, c in zip(row.pos, cshape)
            )
            out[sl] = block
        return pd.DataFrame(
            [{"arr": arr, "t": int(t), "shape": list(gshape), "data": out.tobytes()}]
        )

    return chunks.groupBy("arr", "t").applyInPandas(build, schema=DENSE_SCHEMA)


def _dense_grid(spark: SparkSession) -> DataFrame:
    return assemble_dense(make_chunk_df(spark))


def _per_tensor(
    dense: DataFrame, kernel: Callable[[str, int, np.ndarray], pd.DataFrame], schema: str
) -> DataFrame:
    """Run a NumPy kernel on each assembled tensor row (Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                a = np.frombuffer(row.data, dtype=np.float64).reshape(tuple(row.shape))
                yield kernel(row.arr, int(row.t), a)

    return dense.mapInPandas(gen, schema=schema)


# --------------------------------------------------------------------------
# A4 dense path — assembled tensor equals the closed form cell-by-cell:
# re-emit the dense tensor as long-form rows and hash against the grid CTE.
# (The long-form explode path never materializes the tensor; this proves
# the dense np.block path agrees with it.)
# --------------------------------------------------------------------------
@query(
    "dense_assembly_cells",
    oracle=GRID_CTE + "SELECT arr, t, x, y, value FROM grid",
)
def dense_assembly_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    def cells(arr: str, t: int, a: np.ndarray) -> pd.DataFrame:
        x, y = np.meshgrid(np.arange(a.shape[0]), np.arange(a.shape[1]), indexing="ij")
        return pd.DataFrame(
            {
                "arr": np.repeat(arr, a.size),
                "t": np.full(a.size, t, dtype=np.int64),
                "x": x.ravel().astype(np.int32),
                "y": y.ravel().astype(np.int32),
                "value": a.ravel(),
            }
        )

    return _per_tensor(
        _dense_grid(spark), cells, "arr string, t bigint, x int, y int, value double"
    )


# --------------------------------------------------------------------------
# B18 — SVD singular values per assembled (arr, t) tensor.
# Oracle: closed form of the generator matrix (see module docstring).
# --------------------------------------------------------------------------
@query(
    "dense_svd_singular_values",
    oracle="""
    SELECT a.arr, CAST(ts.t AS BIGINT) AS t, CAST(k.k AS INT) AS k,
           round(CASE k.k
             WHEN 0 THEN ts.t * 2 * sqrt(15 + sqrt(221))
             WHEN 1 THEN ts.t * 2 * sqrt(15 - sqrt(221))
             ELSE 0.0 END, 6) AS sv
    FROM (SELECT unnest(['temperature', 'pressure']) AS arr) a,
         range(0, 10) ts(t), range(0, 4) k(k)
    """,
)
def dense_svd_singular_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Singular values via np.linalg.svd on the assembled tensor
    (reference: da.linalg.svd, tests/test_analytics.py:87-97)."""

    def svd(arr: str, t: int, a: np.ndarray) -> pd.DataFrame:
        sv = np.linalg.svd(a, compute_uv=False)
        return pd.DataFrame(
            {
                "arr": np.repeat(arr, len(sv)),
                "t": np.full(len(sv), t, dtype=np.int64),
                "k": np.arange(len(sv), dtype=np.int32),
                "sv": np.round(sv, 6) + 0.0,  # +0.0 normalizes -0.0
            }
        )

    return _per_tensor(_dense_grid(spark), svd, "arr string, t bigint, k int, sv double")


# --------------------------------------------------------------------------
# B19 — 1-D FFT along axis 1 (y) per assembled tensor row.
# Oracle: exact DFT as a join-aggregate (N=4 twiddles are 0/±1).
# --------------------------------------------------------------------------
@query(
    "dense_fft_axis1",
    oracle=GRID_CTE
    + """
    SELECT g.arr, g.t, g.x, CAST(k.k AS INT) AS k,
           round(sum(g.value * cos(2 * pi() * k.k * g.y / 4)), 6) + 0.0 AS re,
           round(-sum(g.value * sin(2 * pi() * k.k * g.y / 4)), 6) + 0.0 AS im
    FROM grid g, range(0, 4) k(k)
    WHERE g.arr = 'temperature'
    GROUP BY g.arr, g.t, g.x, k.k
    """,
)
def dense_fft_axis1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFT along the last axis via np.fft.fft on the assembled tensor
    (reference: da.fft.fft, tests/test_analytics.py:99-100)."""

    def fft(arr: str, t: int, a: np.ndarray) -> pd.DataFrame:
        if arr != "temperature":
            return pd.DataFrame({"arr": [], "t": [], "x": [], "k": [], "re": [], "im": []})
        spec = np.fft.fft(a, axis=1)
        nx, nk = spec.shape
        x, k = np.meshgrid(np.arange(nx), np.arange(nk), indexing="ij")
        return pd.DataFrame(
            {
                "arr": np.repeat(arr, spec.size),
                "t": np.full(spec.size, t, dtype=np.int64),
                "x": x.ravel().astype(np.int32),
                "k": k.ravel().astype(np.int32),
                "re": np.round(spec.real.ravel(), 6) + 0.0,
                "im": np.round(spec.imag.ravel(), 6) + 0.0,
            }
        )

    return _per_tensor(
        _dense_grid(spark), fft, "arr string, t bigint, x int, k int, re double, im double"
    )


# --------------------------------------------------------------------------
# B11 dense path — matmul (Aᵀ @ A) on the assembled tensor; same oracle as
# the join-aggregate plan (grid_matmul_tn), proving both paths agree.
# --------------------------------------------------------------------------
@query(
    "dense_matmul_tn",
    oracle=GRID_CTE
    + """
    SELECT a.t, a.y AS i, b.y AS j, round(sum(a.value * b.value), 2) AS mm
    FROM (SELECT * FROM grid WHERE arr = 'temperature') a
    JOIN (SELECT * FROM grid WHERE arr = 'temperature') b
      ON a.t = b.t AND a.x = b.x
    GROUP BY a.t, a.y, b.y
    """,
)
def dense_matmul_tn(spark: SparkSession, sf_dir: str) -> DataFrame:
    def matmul(arr: str, t: int, a: np.ndarray) -> pd.DataFrame:
        if arr != "temperature":
            return pd.DataFrame({"t": [], "i": [], "j": [], "mm": []})
        m = a.T @ a
        i, j = np.meshgrid(np.arange(m.shape[0]), np.arange(m.shape[1]), indexing="ij")
        return pd.DataFrame(
            {
                "t": np.full(m.size, t, dtype=np.int64),
                "i": i.ravel().astype(np.int32),
                "j": j.ravel().astype(np.int32),
                "mm": np.round(m.ravel(), 2),
            }
        )

    return _per_tensor(_dense_grid(spark), matmul, "t bigint, i int, j int, mm double")


# --------------------------------------------------------------------------
# Scale-path tensor kernels via MLlib distributed matrices: when a single
# (arr, t) tensor no longer fits one task, RowMatrix/BlockMatrix distribute
# the kernel itself (SURVEY B11/B18 "Spark primitive" column). These two
# queries pin the paths on the fixture tensor; same closed-form oracles as
# the dense versions, proving both paths agree.
# --------------------------------------------------------------------------
def rowmatrix_svd_values(cells: DataFrame, k: int, ncols: int) -> list[float]:
    """Distributed SVD of one long-form matrix via RowMatrix.computeSVD
    (the MLlib path; rows = x-index, columns = y-index).

    ``ncols`` comes from the caller's declared grid metadata (the array's
    global_shape is a contract, model.py), so there is no driver
    round-trip to discover the width. The row build is one DataFrame
    aggregation — ``collect_list(struct(y, value))`` partial-aggregates
    map-side and shuffles each matrix row once as a packed array — then a
    single narrow ``.rdd.map`` to MLlib's Vector type (the unavoidable
    DataFrame->mllib seam). Row order is irrelevant: singular values are
    invariant under row permutation and U is not computed, so no sort and
    no ``groupByKey`` of Python tuples anywhere."""
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import RowMatrix

    packed = cells.groupBy("x").agg(
        F.sort_array(F.collect_list(F.struct("y", "value"))).alias("yv")
    )

    def to_vector(r):
        # scatter by the y INDEX, not by list position: a sparse or
        # over-full row would otherwise shift values into the wrong
        # columns (or feed a short vector to RowMatrix) silently
        dense = [0.0] * ncols
        for y, v in r["yv"]:
            if not 0 <= int(y) < ncols:
                raise ValueError(
                    f"cell y={y} outside declared width {ncols}"
                )
            dense[int(y)] = float(v)
        return Vectors.dense(dense)

    rows = packed.select("yv").rdd.map(to_vector)
    svd = RowMatrix(rows, numCols=ncols).computeSVD(k, computeU=False)
    return list(svd.s.toArray())


@query(
    "mllib_svd_singular_values",
    oracle="""
    SELECT CAST(k.k AS INT) AS k,
           round(CASE k.k
             WHEN 0 THEN 3 * 2 * sqrt(15 + sqrt(221))
             WHEN 1 THEN 3 * 2 * sqrt(15 - sqrt(221))
             ELSE 0.0 END, 6) AS sv
    FROM range(0, 4) k(k)
    """,
)
def mllib_svd_singular_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 scale path: temperature@t=3 singular values via the MLlib
    RowMatrix (matches the dense np.linalg.svd path and the closed form)."""
    from deisa_ray_spark.model import explode_chunks
    from deisa_ray_spark.sources.chunks import DEFAULT_GLOBAL_SHAPE

    cells = explode_chunks(make_chunk_df(spark)).filter(
        "arr = 'temperature' AND t = 3"
    )
    # width from the DECLARED grid metadata, not a data scan
    sv = rowmatrix_svd_values(cells, k=4, ncols=DEFAULT_GLOBAL_SHAPE[1])
    sv = sv + [0.0] * (4 - len(sv))
    return spark.createDataFrame(
        [(i, float(round(abs(v), 6))) for i, v in enumerate(sv)], "k int, sv double"
    )


@query(
    "mllib_blockmatrix_matmul",
    oracle=GRID_CTE
    + """
    SELECT a.t, a.y AS i, b.y AS j, round(sum(a.value * b.value), 2) AS mm
    FROM (SELECT * FROM grid WHERE arr = 'temperature' AND t = 3) a
    JOIN (SELECT * FROM grid WHERE arr = 'temperature' AND t = 3) b
      ON a.t = b.t AND a.x = b.x
    GROUP BY a.t, a.y, b.y
    """,
)
def mllib_blockmatrix_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 scale path: Aᵀ@A for temperature@t=3 via BlockMatrix.multiply
    (block-partitioned distributed matmul; same oracle as the
    join-aggregate and dense paths)."""
    from pyspark.mllib.linalg.distributed import CoordinateMatrix, MatrixEntry

    from deisa_ray_spark.model import explode_chunks

    from deisa_ray_spark.sources.chunks import DEFAULT_GLOBAL_SHAPE

    cells = explode_chunks(make_chunk_df(spark)).filter(
        "arr = 'temperature' AND t = 3"
    )
    entries = cells.rdd.map(lambda r: MatrixEntry(r["x"], r["y"], r["value"]))
    a = CoordinateMatrix(entries).toBlockMatrix(rowsPerBlock=2, colsPerBlock=2)
    prod = a.transpose().multiply(a)  # distributed block multiply
    coords = spark.createDataFrame(
        prod.toCoordinateMatrix().entries.map(
            lambda e: (int(e.i), int(e.j), float(round(e.value, 2)))
        ),
        "i int, j int, mm double",
    )
    # toCoordinateMatrix DROPS zero entries; the oracle's (i,j) grid is
    # dense, so re-expand against the declared ncols x ncols grid with
    # mm=0.0 for absent coordinates — otherwise any zero inner product
    # (a different timestep, orthogonal columns) loses rows vs the oracle
    n = DEFAULT_GLOBAL_SHAPE[1]
    idx = spark.range(n).select(F.col("id").cast("int").alias("i"))
    grid = idx.crossJoin(
        spark.range(n).select(F.col("id").cast("int").alias("j"))
    )
    return grid.join(coords, ["i", "j"], "left").select(
        F.lit(3).cast("bigint").alias("t"),
        "i",
        "j",
        F.coalesce("mm", F.lit(0.0)).alias("mm"),
    )
