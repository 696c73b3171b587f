"""Staged-shard incremental serving-graph maintenance as a declared,
ORACLE-CHECKED query: the embeddings table staged as vec_id-ordered
shards, streamed through IncrementalServeGraph (streaming/servegraph),
and the maintained two-layer edge state fingerprinted per (layer,
src-bucket).

Exact-oracle-able with NO arrival-order caveat: incremental group
replacement equals the full rebuild for ANY append-only sharding (the
group-local-decisions argument in streaming/servegraph.py), so the
DuckDB twin is simply the BATCH serve-graph CTE chain
(functions.similarity._serve_edges_ctes/_upper_ctes — the same twin
sim_graph_beam_topk is checked against) with the same rollup on top.
The rollup keeps the declared result compact (edges are O(n·k) rows):
per layer and src % 8 bucket, the edge count, distinct sources, and a
sum-of-32-bit-md5 checksum over the (src, dst) pairs — any lost,
duplicated, or altered edge shifts a checksum cell.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.similarity import (
    _merged_edges_ctes,
    _serve_edges_ctes,
    _upper_ctes,
)
from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.registry import query

N_SHARDS = 2

_EDGE_HASH = (
    "CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || '_' "
    "|| CAST(dst AS VARCHAR)), 1, 8)) AS BIGINT)"
)

_ORACLE = f"""
    WITH {_serve_edges_ctes()},
    {_upper_ctes()},
    tagged AS (
      SELECT 'base' AS layer, src, dst FROM serve_edges
      UNION ALL
      SELECT 'upper' AS layer, src, dst FROM u_edges
    )
    SELECT layer, src % 8 AS bucket,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(DISTINCT src) AS BIGINT) AS n_src,
           CAST(sum({_EDGE_HASH}) AS BIGINT) AS checksum
    FROM tagged GROUP BY layer, src % 8
    """


def _fingerprint(proc) -> DataFrame:
    """Per-(layer, src%8-bucket) rollup of the maintained edge state:
    count + distinct sources + sum-of-32-bit-md5 checksum — any lost,
    duplicated, or altered edge shifts a cell. Materialized eagerly so
    the caller may delete the temp state dir."""
    tagged = (
        proc.base_edges()
        .select(F.lit("base").alias("layer"), "src", "dst")
        .unionByName(
            proc.upper_edges().select(
                F.lit("upper").alias("layer"), "src", "dst"
            )
        )
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_", F.col("src").cast("string"), F.col("dst").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    out = tagged.groupBy(
        "layer", (F.col("src") % 8).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.countDistinct("src").cast("bigint").alias("n_src"),
        F.sum(h).cast("bigint").alias("checksum"),
    )
    return out.localCheckpoint(eager=True)


@query("stream_serve_graph", oracle=_ORACLE)
def stream_serve_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage vector shards, maintain the serving graph incrementally,
    fingerprint the final two-layer edge state."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    work = tempfile.mkdtemp(prefix="stream_servegraph_")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        stage_ordered_shards(emb, f"{work}/src", N_SHARDS, order_col="vec_id")
        proc = IncrementalServeGraph(spark, f"{work}/state")
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        return _fingerprint(proc)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# stream_serve_graph_upsert — the UPSERT maintenance contract as a
# declared, ORACLE-CHECKED query (r10): batch 0 streams the full vector
# table, batch 1 RE-SENDS the first UPSERT_IDS vectors with a changed
# label (+1) and a negated embedding. The maintainer must REPLACE them
# (keep-latest members; the re-sent ids' old coarse groups rebuild
# without the stale rows), so the exact oracle is the BATCH serve-graph
# CTE chain evaluated over the keep-latest vector set — expressed as a
# single CASE projection over the embeddings table (negation is exact
# in IEEE, so both engines transform bit-identically), with the same
# per-(layer, bucket) fingerprint rollup on top.
# --------------------------------------------------------------------------
UPSERT_IDS = 8  #: vec_id < this are re-sent modified in batch 1

_UPSERT_SRC = f"""
    emb_up AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN vec_id < {UPSERT_IDS} THEN label + 1
                  ELSE label END AS label,
             CASE WHEN vec_id < {UPSERT_IDS}
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings
    )"""

_UPSERT_ORACLE = f"""
    WITH {_UPSERT_SRC},
    {_serve_edges_ctes(src="emb_up")},
    {_upper_ctes(src="emb_up")},
    tagged AS (
      SELECT 'base' AS layer, src, dst FROM serve_edges
      UNION ALL
      SELECT 'upper' AS layer, src, dst FROM u_edges
    )
    SELECT layer, src % 8 AS bucket,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(DISTINCT src) AS BIGINT) AS n_src,
           CAST(sum({_EDGE_HASH}) AS BIGINT) AS checksum
    FROM tagged GROUP BY layer, src % 8
    """


def _stage_batches(dfs, dest: str) -> None:
    """Write each frame as ONE parquet file under ``dest`` with strictly
    increasing mtimes, so FileStreamSource (oldest-mtime-first) delivers
    them as batches 0..n-1 in list order."""
    import os

    from deisa_ray_spark.operators.stream_cc_query import (
        pin_increasing_mtimes,
        write_single_parquet_file,
    )

    os.makedirs(dest, exist_ok=True)
    paths = []
    for i, df in enumerate(dfs):
        out = f"{dest}/b{i}.parquet"
        write_single_parquet_file(df, out)
        paths.append(out)
    pin_increasing_mtimes(paths)


@query("stream_serve_graph_upsert", oracle=_UPSERT_ORACLE)
def stream_serve_graph_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the full table then a modified re-send of the first
    UPSERT_IDS vectors; fingerprint the maintained state, which must
    equal the batch rebuild over the keep-latest vector set."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    work = tempfile.mkdtemp(prefix="stream_servegraph_up_")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        resent = (
            emb.filter(F.col("vec_id") < UPSERT_IDS)
            .withColumn("label", F.col("label") + 1)
            .withColumn(
                "embedding", F.transform(F.col("embedding"), lambda x: -x)
            )
        )
        _stage_batches([emb, resent], f"{work}/src")
        proc = IncrementalServeGraph(spark, f"{work}/state")
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        return _fingerprint(proc)
    finally:
        shutil.rmtree(work, ignore_errors=True)

# --------------------------------------------------------------------------
# stream_serve_graph_merged — the MAINTAINED cross-view NN-descent
# merged layer (r12): IncrementalServeGraph(merged=True) recomputes the
# merged top-k per batch for exactly the affected sources (members of
# touched groups ∪ nodes with an edge into them — servegraph module
# docstring) through the same merged_directed_from builder the batch
# artifact uses, so the maintained state must equal merged_serve_edges
# rebuilt over the vectors seen so far — exactly, for any append-only
# batching. The oracle is the batch m_edges CTE chain (the twin
# sim_graph_beam_topk_merged is checked against) with the fingerprint
# rollup on top. The source is the deterministic half-slice
# (vec_id % 2 = 0) so the declared query's two full-touch toy batches
# stay mirror-affordable; the equivalence is scale-free (the upsert and
# locality tests exercise the same contract at other shapes).
# --------------------------------------------------------------------------
_MERGED_SRC = """
    emb_half AS MATERIALIZED (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 2 = 0
    )"""

_MERGED_ORACLE = f"""
    WITH {_MERGED_SRC},
    {_serve_edges_ctes(src="emb_half")},
    {_merged_edges_ctes()}
    SELECT 'merged' AS layer, src % 8 AS bucket,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(DISTINCT src) AS BIGINT) AS n_src,
           CAST(sum({_EDGE_HASH}) AS BIGINT) AS checksum
    FROM m_edges GROUP BY layer, src % 8
    """


@query("stream_serve_graph_merged", oracle=_MERGED_ORACLE)
def stream_serve_graph_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the half-slice as ordered shards, maintain base + merged
    layers incrementally, fingerprint the maintained MERGED edge state."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    work = tempfile.mkdtemp(prefix="stream_servegraph_m_")
    try:
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 2 == 0
        )
        stage_ordered_shards(emb, f"{work}/src", N_SHARDS, order_col="vec_id")
        proc = IncrementalServeGraph(spark, f"{work}/state", merged=True)
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        out = (
            proc.merged_edges()
            .groupBy(F.lit("merged").alias("layer"), (F.col("src") % 8).alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_edges"),
                F.countDistinct("src").cast("bigint").alias("n_src"),
                F.sum(h).cast("bigint").alias("checksum"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
