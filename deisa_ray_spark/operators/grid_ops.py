"""Grid (long-form array) operators — the reference's delegated Dask
compute surface (SURVEY §2.B, B1-B20) re-expressed as DataFrame plans.

Every query here runs the FULL ingest path on the Spark side: binary chunk
rows (sources/chunks.py, the ``Bridge.send`` payload shape) → Arrow-batched
decode to long-form cells (model.explode_chunks, the A4 assembly
equivalent) → Catalyst-native operators. The DuckDB oracle reproduces the
same cells from the closed-form generator ``value = t * ((x//2)*2 + (y//2)
+ 1)`` (reference golden-value convention,
tests/test_sliding_window.py:66-68), so a hash match verifies ingest +
assembly + the operator in one shot.

Scale notes (100 TB): long form is the scalable representation — chunk
binaries explode lazily per partition (no shuffle), coordinate predicates
prune before any wide op, and every aggregation below is partial-agg
friendly. Dense-tensor materialization is reserved for kernels that truly
need it (operators/linalg.py, operators/fft.py) and is bounded per (arr,t)
group, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.model import explode_chunks
from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.chunks import DEFAULT_GLOBAL_SHAPE, make_chunk_df

#: DuckDB twin of the F1/F2 generator (FIXTURES.md): closed-form cells.
GRID_CTE = """
WITH grid AS (
  SELECT a.arr, CAST(ts.t AS BIGINT) AS t, CAST(xs.x AS INT) AS x, CAST(ys.y AS INT) AS y,
         CAST(ts.t * ((xs.x // 2) * 2 + (ys.y // 2) + 1) AS DOUBLE) AS value
  FROM (SELECT unnest(['temperature', 'pressure']) AS arr) a,
       range(0, 10) ts(t), range(0, 4) xs(x), range(0, 4) ys(y)
)
"""


def grid(spark: SparkSession) -> DataFrame:
    """Long-form grid via the real chunk-ingest path."""
    return explode_chunks(make_chunk_df(spark))


#: ONE position-weighted checksum contract shared by every ingest /
#: round-trip path (file drop, JSONL, parquet sink, ORC sink, custom
#: DataSource). A single definition means a weighting change cannot be
#: applied to four of five paths and silently weaken the fifth.
CHECKSUM_ORACLE = GRID_CTE + """
    SELECT arr, count(*) AS n_cells, round(sum(value), 2) AS sum_value,
           round(sum(value * (x * 4 + y + 1)), 2) AS weighted_sum
    FROM grid GROUP BY arr
    """


def cell_checksum(g: DataFrame) -> DataFrame:
    """Position-weighted checksum over long-form cells: proves every
    cell landed at the right global coordinate (reference
    types.py:721-791 completeness protocol). Twin of CHECKSUM_ORACLE."""
    return g.groupBy("arr").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(
            F.sum(F.col("value") * (F.col("x") * 4 + F.col("y") + 1)), 2
        ).alias("weighted_sum"),
    )


_SCRATCH: dict[str, str] = {}


def _scratch(tag: str) -> str:
    """Per-process reusable scratch directory for queries that stage
    data to disk (round-trip checksums). One dir per tag per process —
    repeated bench/harness builds REUSE it instead of leaking a fresh
    mkdtemp per invocation — removed at interpreter exit."""
    import atexit
    import shutil
    import tempfile

    path = _SCRATCH.get(tag)
    if path is None:
        path = tempfile.mkdtemp(prefix=f"deisa_{tag}_")
        _SCRATCH[tag] = path
        atexit.register(shutil.rmtree, path, True)
    return path


# --------------------------------------------------------------------------
# A1/A4 — ingest + assembly checksum: decode of binary chunks equals the
# closed form, i.e. assembled array == concatenation of its chunks.
# --------------------------------------------------------------------------
@query("grid_ingest_checksum", oracle=CHECKSUM_ORACLE)
def grid_ingest_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 chunk ingest + A4 assembly (reference types.py:721-791)."""
    return cell_checksum(grid(spark))


# --------------------------------------------------------------------------
# B1-B4 — global reductions per timestep (mean/sum/min/max/stddev_pop).
# Reference: tests/test_analytics.py:36-42 (std is population, ddof=0).
# --------------------------------------------------------------------------
@query(
    "grid_global_aggs",
    oracle=GRID_CTE
    + """
    SELECT t, round(avg(value), 6) AS mean_v, round(sum(value), 2) AS sum_v,
           min(value) AS min_v, max(value) AS max_v,
           round(stddev_pop(value), 6) AS std_v
    FROM grid WHERE arr = 'temperature' GROUP BY t
    """,
)
def grid_global_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter(F.col("arr") == "temperature")
    return g.groupBy("t").agg(
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.sum("value"), 2).alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.round(F.stddev_pop("value"), 6).alias("std_v"),
    )


# --------------------------------------------------------------------------
# B5 + B17 — axis-wise mean and centering (broadcast-subtract of the
# axis-0 mean). Reference: tests/test_analytics.py:86.
# --------------------------------------------------------------------------
@query(
    "grid_axis_mean_centering",
    oracle=GRID_CTE
    + """
    SELECT t, x, y,
           round(avg(value) OVER (PARTITION BY t, y), 6) AS col_mean,
           round(value - avg(value) OVER (PARTITION BY t, y), 6) AS centered
    FROM grid WHERE arr = 'temperature'
    """,
)
def grid_axis_mean_centering(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter(F.col("arr") == "temperature")
    w = W.partitionBy("t", "y")
    return g.select(
        "t",
        "x",
        "y",
        F.round(F.avg("value").over(w), 6).alias("col_mean"),
        F.round(F.col("value") - F.avg("value").over(w), 6).alias("centered"),
    )


# --------------------------------------------------------------------------
# B6/B12/B13/B14 — scalar arithmetic, clip, where/mask, sqrt, astype.
# Reference: tests/test_analytics.py:44-48,71-78.
# --------------------------------------------------------------------------
@query(
    "grid_elementwise_scalar",
    oracle=GRID_CTE
    + """
    SELECT x, y, value,
           value * 2              AS doubled,
           round(value / 5, 6)    AS fifth,
           value + 1              AS plus1,
           least(greatest(value, 2.0), 6.0) AS clipped,
           CASE WHEN value > 5 THEN value ELSE 0 END AS masked,
           round(sqrt(value), 6)  AS root,
           CAST(trunc(value) AS INT) AS as_int
    FROM grid WHERE arr = 'temperature' AND t = 3
    """,
)
def grid_elementwise_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter((F.col("arr") == "temperature") & (F.col("t") == 3))
    v = F.col("value")
    return g.select(
        "x",
        "y",
        "value",
        (v * 2).alias("doubled"),
        F.round(v / 5, 6).alias("fifth"),
        (v + 1).alias("plus1"),
        F.least(F.greatest(v, F.lit(2.0)), F.lit(6.0)).alias("clipped"),
        F.when(v > 5, v).otherwise(F.lit(0.0)).alias("masked"),
        F.round(F.sqrt(v), 6).alias("root"),
        # astype-int semantics = TRUNCATION (numpy/Spark cast); the
        # oracle says CAST(trunc(..)) explicitly because DuckDB's bare
        # CAST(double AS INT) rounds-to-nearest — a real 1-off trap on
        # any non-integral value
        v.cast("int").alias("as_int"),
    )


# --------------------------------------------------------------------------
# B7 — elementwise array⊗array at the same timestep (coordinate-aligned
# join of two arrays). Reference: tests/test_analytics.py:50-54.
# Scale: equi-join on (t,x,y); both sides share the generator partitioning
# so AQE plans a co-partitioned sort-merge; per-(t,x,y) keys are unique →
# no skew.
# --------------------------------------------------------------------------
@query(
    "grid_elementwise_product",
    oracle=GRID_CTE
    + """
    SELECT a.t, a.x, a.y, a.value * b.value AS prod, a.value + b.value AS added
    FROM (SELECT * FROM grid WHERE arr = 'temperature') a
    JOIN (SELECT * FROM grid WHERE arr = 'pressure') b
      ON a.t = b.t AND a.x = b.x AND a.y = b.y
    """,
)
def grid_elementwise_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark)
    a = g.filter(F.col("arr") == "temperature").select("t", "x", "y", F.col("value").alias("va"))
    b = g.filter(F.col("arr") == "pressure").select("t", "x", "y", F.col("value").alias("vb"))
    return a.join(b, ["t", "x", "y"]).select(
        "t",
        "x",
        "y",
        (F.col("va") * F.col("vb")).alias("prod"),
        (F.col("va") + F.col("vb")).alias("added"),
    )


# --------------------------------------------------------------------------
# B8 — temporal diff across timesteps (window[1] - window[0]).
# Reference: tests/test_sliding_window.py:32-34.
# --------------------------------------------------------------------------
@query(
    "grid_temporal_diff",
    oracle=GRID_CTE
    + """
    SELECT t, x, y,
           value - lag(value) OVER (PARTITION BY arr, x, y ORDER BY t) AS diff
    FROM grid WHERE arr = 'temperature'
    """,
)
def grid_temporal_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter(F.col("arr") == "temperature")
    w = W.partitionBy("arr", "x", "y").orderBy("t")
    return g.select("t", "x", "y", (F.col("value") - F.lag("value").over(w)).alias("diff"))


# --------------------------------------------------------------------------
# B20 — windowed temporal stencils: 3-pt and 5-pt trailing averages over t
# (the docs' five_point_average / three_point_rate patterns).
# --------------------------------------------------------------------------
@query(
    "grid_temporal_stencils",
    oracle=GRID_CTE
    + """
    SELECT t, x, y,
           round(avg(value) OVER (PARTITION BY arr, x, y ORDER BY t
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3,
           round(avg(value) OVER (PARTITION BY arr, x, y ORDER BY t
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS avg5,
           count(*) OVER (PARTITION BY arr, x, y ORDER BY t
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_in_window
    FROM grid WHERE arr = 'temperature'
    """,
)
def grid_temporal_stencils(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter(F.col("arr") == "temperature")
    w = W.partitionBy("arr", "x", "y").orderBy("t")
    return g.select(
        "t",
        "x",
        "y",
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("avg3"),
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 6).alias("avg5"),
        F.count(F.lit(1)).over(w.rowsBetween(-4, 0)).alias("n_in_window"),
    )


# --------------------------------------------------------------------------
# B9 + B10 — slicing (region select) and transpose (coordinate relabel).
# Reference: tests/test_analytics.py:56-63.
# --------------------------------------------------------------------------
@query(
    "grid_slice_transpose",
    oracle=GRID_CTE
    + """
    SELECT t, y AS x, x AS y, value
    FROM grid WHERE arr = 'temperature' AND y < 1
    """,
)
def grid_slice_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark)
    return (
        g.filter((F.col("arr") == "temperature") & (F.col("y") < 1))
        .select("t", F.col("y").alias("x"), F.col("x").alias("y"), "value")
    )


# --------------------------------------------------------------------------
# B15 — concatenate along axis 0 (UNION ALL with coordinate offset).
# Reference: tests/test_analytics.py:80-84.
# --------------------------------------------------------------------------
@query(
    "grid_concat_axis0",
    oracle=GRID_CTE
    + """
    SELECT t, x, y, value FROM grid WHERE arr = 'temperature'
    UNION ALL
    SELECT t, CAST(x + 4 AS INT) AS x, y, value FROM grid WHERE arr = 'pressure'
    """,
)
def grid_concat_axis0(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark)
    top = g.filter(F.col("arr") == "temperature").select("t", "x", "y", "value")
    bottom = g.filter(F.col("arr") == "pressure").select(
        "t", (F.col("x") + 4).cast("int").alias("x"), "y", "value"
    )
    return top.unionAll(bottom)


# --------------------------------------------------------------------------
# B11 — matmul as join-aggregate: (A^T @ B)[i,j] = Σ_x A[x,i]·B[x,j] per t.
# Reference: tests/test_analytics.py:65-69 (transpose @ array).
# Scale: shuffle-on-contraction-index join + partial-agg; for dense blocks
# at scale prefer the BlockMatrix path in operators/linalg.py.
# --------------------------------------------------------------------------
@query(
    "grid_matmul_tn",
    oracle=GRID_CTE
    + """
    SELECT a.t, a.y AS i, b.y AS j, round(sum(a.value * b.value), 2) AS mm
    FROM (SELECT * FROM grid WHERE arr = 'temperature') a
    JOIN (SELECT * FROM grid WHERE arr = 'temperature') b
      ON a.t = b.t AND a.x = b.x
    GROUP BY a.t, a.y, b.y
    """,
)
def grid_matmul_tn(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter(F.col("arr") == "temperature")
    a = g.select("t", "x", F.col("y").alias("i"), F.col("value").alias("va"))
    b = g.select("t", "x", F.col("y").alias("j"), F.col("value").alias("vb"))
    return (
        a.join(b, ["t", "x"])
        .groupBy("t", "i", "j")
        .agg(F.round(F.sum(F.col("va") * F.col("vb")), 2).alias("mm"))
    )


# --------------------------------------------------------------------------
# A8 — AND/OR callback-gating counts as a declared batch query: the
# trigger-count matrix of the reference's test_when.py (alternating
# shares: AND fires 0 times, OR fires 4 times) computed relationally.
# Streaming twin: the dispatcher gate in streaming/engine.py
# (_should_call); behavioral contract in tests/test_streaming.py.
# --------------------------------------------------------------------------
@query(
    "grid_gating_counts",
    oracle="""
    WITH shares(arr, t) AS (
      VALUES ('temperature', 0), ('pressure', 1), ('temperature', 2),
             ('pressure', 3), ('temperature', 4)
    ),
    per_t AS (
      SELECT t,
             max(CASE WHEN arr = 'temperature' THEN 1 ELSE 0 END) AS has_temp,
             max(CASE WHEN arr = 'pressure' THEN 1 ELSE 0 END) AS has_pres
      FROM shares GROUP BY t
    ),
    gated AS (
      SELECT t, has_temp, has_pres,
             max(has_temp) OVER w AS seen_temp,
             max(has_pres) OVER w AS seen_pres
      FROM per_t
      WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(t AS BIGINT) AS t,
           has_temp = 1 AND has_pres = 1 AS and_fire,
           seen_temp = 1 AND seen_pres = 1
             AND (has_temp = 1 OR has_pres = 1) AS or_fire
    FROM gated
    """,
)
def grid_gating_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND = all requested arrays share at t; OR = all seen at least once
    and any shares at t (reference window_handler.py:432-453; count
    matrix tests/test_when.py:118-191)."""
    shares = spark.createDataFrame(
        [("temperature", 0), ("pressure", 1), ("temperature", 2),
         ("pressure", 3), ("temperature", 4)],
        "arr string, t bigint",
    )
    per_t = shares.groupBy("t").agg(
        F.max(F.when(F.col("arr") == "temperature", 1).otherwise(0)).alias("has_temp"),
        F.max(F.when(F.col("arr") == "pressure", 1).otherwise(0)).alias("has_pres"),
    )
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    gated = per_t.select(
        "t",
        "has_temp",
        "has_pres",
        F.max("has_temp").over(w).alias("seen_temp"),
        F.max("has_pres").over(w).alias("seen_pres"),
    )
    return gated.select(
        "t",
        ((F.col("has_temp") == 1) & (F.col("has_pres") == 1)).alias("and_fire"),
        (
            (F.col("seen_temp") == 1) & (F.col("seen_pres") == 1)
            & ((F.col("has_temp") == 1) | (F.col("has_pres") == 1))
        ).alias("or_fire"),
    )


# --------------------------------------------------------------------------
# A1 (second source format) — the same ingest checksum through the
# JSON-lines source: proves base64 payloads decode identically to parquet
# binary (sources/chunks_json.py). Same oracle as grid_ingest_checksum.
# --------------------------------------------------------------------------
@query("grid_ingest_json_checksum", oracle=CHECKSUM_ORACLE)
def grid_ingest_json_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from deisa_ray_spark.sources.chunks_json import read_chunks_jsonl, write_chunks_jsonl

    path = os.path.join(_scratch("jsonl"), "chunks.jsonl")
    if not os.path.exists(path):
        write_chunks_jsonl(path)
    return cell_checksum(explode_chunks(read_chunks_jsonl(spark, path).coalesce(2)))


# --------------------------------------------------------------------------
# A19-family (parquet, the first-class sink) — write → read round-trip:
# the chunk table goes through the partitioned sink and back, and the
# decoded cells still match the closed form. Partition pruning on the
# read side is asserted in tests/test_sinks.py.
# --------------------------------------------------------------------------
@query("sink_roundtrip_checksum", oracle=CHECKSUM_ORACLE)
def sink_roundtrip_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from deisa_ray_spark.model import CHUNK_SCHEMA
    from deisa_ray_spark.sinks import write_chunks_parquet

    path = os.path.join(_scratch("sink_rt"), "chunks")
    write_chunks_parquet(make_chunk_df(spark), path)  # mode=overwrite
    back = spark.read.schema(CHUNK_SCHEMA).parquet(path).coalesce(2)
    return cell_checksum(explode_chunks(back))


# --------------------------------------------------------------------------
# A19-adjacent — ORC as a second first-class columnar interchange format
# (Spark-native, no external package): the chunk table round-trips
# through a partitioned ORC sink and decodes to the same closed-form
# cells. Covers engines/consumers standardized on ORC; parquet remains
# the default. Same pruning properties (partitionBy(arr, t) directories
# + ORC predicate pushdown).
# --------------------------------------------------------------------------
@query("sink_roundtrip_orc_checksum", oracle=CHECKSUM_ORACLE)
def sink_roundtrip_orc_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from deisa_ray_spark.model import CHUNK_SCHEMA
    from deisa_ray_spark.sinks import write_chunks_orc

    path = os.path.join(_scratch("sink_rt_orc"), "chunks")
    write_chunks_orc(make_chunk_df(spark), path)
    back = spark.read.schema(CHUNK_SCHEMA).orc(path).coalesce(2)
    return cell_checksum(explode_chunks(back))


# --------------------------------------------------------------------------
# A1 (no-files twin) — the custom Python DataSource (Spark 4 API,
# sources/sim_source.py): the simulation generated INSIDE the source,
# one input partition per bridge rank, chunks produced executor-side.
# Same position-weighted checksum as grid_ingest_checksum, so the
# oracle proves the source emits byte-identical chunk rows to the
# file-drop ingest path.
# --------------------------------------------------------------------------
@query("grid_sim_source_checksum", oracle=CHECKSUM_ORACLE)
def grid_sim_source_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.sources.sim_source import register

    register(spark)
    chunks = spark.read.format("sim_grid").option("timesteps", "10").load()
    return cell_checksum(explode_chunks(chunks))


# --------------------------------------------------------------------------
# grid_spatial_stencil5 — the reference docs' own five_point_average
# (docs/source/analytics.rst "five_point_average": arr averaged with its
# four spatial neighbors; edges average what is in-bounds). Long-form
# Spark shape: each cell scatters itself to its 5 stencil targets
# (explode of a constant offsets array — narrow), then ONE keyed
# aggregation per target cell sums contributions. This is the
# halo-exchange-free formulation: at 100 TB no chunk needs its
# neighbors' blocks materialized — the shuffle on (arr, t, x, y) IS the
# halo exchange, handled by the engine.
# --------------------------------------------------------------------------
@query(
    "grid_spatial_stencil5",
    oracle=GRID_CTE
    + """
    SELECT g.arr, g.t, g.x, g.y,
           round(sum(n.value) / count(*), 6) AS five_pt
    FROM grid g
    JOIN grid n ON n.arr = g.arr AND n.t = g.t
       AND abs(n.x - g.x) + abs(n.y - g.y) <= 1
    GROUP BY g.arr, g.t, g.x, g.y
    """,
)
def grid_spatial_stencil5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = grid(spark)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]
        ]
    )
    scattered = (
        cells.select("arr", "t", "x", "y", "value", F.explode(offsets).alias("o"))
        .select(
            "arr",
            "t",
            (F.col("x") + F.col("o.dx")).alias("tx"),
            (F.col("y") + F.col("o.dy")).alias("ty"),
            "value",
        )
        # bounds from the DECLARED global shape (not literals: a
        # regenerated fixture at another resolution must not silently
        # clip interior cells at the old boundary)
        .filter(
            (F.col("tx") >= 0) & (F.col("tx") < DEFAULT_GLOBAL_SHAPE[0])
            & (F.col("ty") >= 0) & (F.col("ty") < DEFAULT_GLOBAL_SHAPE[1])
        )
    )
    return scattered.groupBy(
        "arr", "t", F.col("tx").alias("x"), F.col("ty").alias("y")
    ).agg(F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("five_pt"))


# --------------------------------------------------------------------------
# B-adjacent — fixed-bin value histogram per array: the standard in-situ
# distribution probe (da.histogram in the Dask surface the reference's
# callbacks draw on). Bucketing is a pure projection (floor(value/w)),
# so the whole histogram is ONE keyed partial-aggregate — at 100 TB the
# exchange carries ≤ n_arrays × n_buckets rows, nothing value-sized.
# --------------------------------------------------------------------------
@query(
    "grid_histogram",
    oracle=GRID_CTE
    + """
    SELECT arr, CAST(floor(value / 4) AS BIGINT) AS bucket,
           count(*) AS n, round(sum(value), 2) AS mass
    FROM grid GROUP BY arr, bucket
    """,
)
def grid_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark)
    return g.groupBy(
        "arr", F.floor(F.col("value") / 4).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("mass"),
    )


# --------------------------------------------------------------------------
# A2/A4/B5 in N dimensions — the reference validates arbitrary rank
# (validate.py:96-105) and assembles N-d arrays; this pins the engine's
# general path on a 3-D layout: global (4,4,2) in (2,2,1) chunks → a
# 2×2×2 chunk grid of 8 bridges, golden value t*(rank+1), rank =
# ravel_multi_index(pos). mean(axis=0) = group by every other
# coordinate; coordinates come from element_at over the coord vector,
# so the same plan serves ANY rank. Decode stays shuffle-free; the only
# exchange is the final keyed aggregate.
# --------------------------------------------------------------------------
@query(
    "grid_nd_axis_mean",
    oracle="""
    WITH gridnd AS (
      SELECT CAST(ts.t AS BIGINT) AS t, xs.x, ys.y, zs.z,
             CAST(ts.t * ((xs.x // 2) * 4 + (ys.y // 2) * 2 + zs.z + 1)
                  AS DOUBLE) AS value
      FROM range(0, 5) ts(t), range(0, 4) xs(x), range(0, 4) ys(y),
           range(0, 2) zs(z)
    )
    SELECT t, CAST(y AS INT) AS y, CAST(z AS INT) AS z,
           round(avg(value), 6) AS mean_v, count(*) AS n
    FROM gridnd GROUP BY t, y, z
    """,
)
def grid_nd_axis_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.model import explode_chunks_nd

    chunks = make_chunk_df(
        spark,
        arrays=("volume",),
        global_shape=(4, 4, 2),
        chunk_shape=(2, 2, 1),
        timesteps=tuple(range(5)),
    )
    g = explode_chunks_nd(chunks)
    return g.groupBy(
        "t",
        F.element_at("coord", 2).alias("y"),
        F.element_at("coord", 3).alias("z"),
    ).agg(
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# grid_block_pool — block-mean/max pooling (downsampling): 2×2 blocks of
# the field collapse to their mean and max, the standard resolution
# reduction before storing/visualizing/feeding a model. Long form makes
# it ONE keyed partial aggregation — the block id is a pure projection
# (x//2, y//2), so map-side combine reduces each block locally and the
# shuffle carries one row per (t, block). At a 10^5² grid the same plan
# shape holds: cells never move except combiner outputs.
# --------------------------------------------------------------------------
@query(
    "grid_block_pool",
    oracle=GRID_CTE
    + """
    SELECT t, CAST(x // 2 AS INT) AS bx, CAST(y // 2 AS INT) AS by,
           round(avg(value), 6) AS pool_mean,
           max(value) AS pool_max,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM grid WHERE arr = 'temperature'
    GROUP BY t, x // 2, y // 2
    """,
)
def grid_block_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter(F.col("arr") == "temperature")
    return (
        g.groupBy(
            "t",
            (F.col("x") / 2).cast("int").alias("bx"),
            (F.col("y") / 2).cast("int").alias("by"),
        )
        .agg(
            F.round(F.avg("value"), 6).alias("pool_mean"),
            F.max("value").alias("pool_max"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        )
    )


# --------------------------------------------------------------------------
# grid_roll_axis1 — circular shift (np.roll) along y: the halo-exchange
# primitive of periodic-boundary simulations. A pure projection on the
# coordinate ((y + shift) mod size) — zero shuffle; the "data movement"
# of a roll is just a coordinate relabeling in long form.
# --------------------------------------------------------------------------
@query(
    "grid_roll_axis1",
    oracle=GRID_CTE
    + """
    SELECT t, x, CAST((y + 1) % 4 AS INT) AS y_rolled, value
    FROM grid WHERE arr = 'temperature' AND t = 3
    """,
)
def grid_roll_axis1(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grid(spark).filter((F.col("arr") == "temperature") & (F.col("t") == 3))
    return g.select(
        "t", "x", ((F.col("y") + 1) % 4).cast("int").alias("y_rolled"), "value"
    )
