"""The streaming gate→cluster composition as a declared, ORACLE-CHECKED
query: documents staged as doc_id-ordered shards, fed through
``IncrementalNearDup(verify=True, cluster=True)`` (MinHash-LSH owner
gate → exact-Jaccard verify → incremental connected components), final
``resolve()`` returned as the result.

Why this is oracle-checkable at all: the composition's batch-equivalence
contract (tests/test_streaming_neardup.py) says in-order shard arrival
yields exactly the batch result — owner = global min doc_id per band
bucket, clusters = CC over the verified owner-collision pairs. Every
stage of THAT is portable SQL: the md5 minhash/band construction (the
same CTEs as dedup_minhash_lsh's oracle) plus a recursive-CTE CC (the
same shape as dedup_cluster_cc's). So a STATEFUL STREAMING operator
lands under the driver's hash-checked gate, not just rows-only.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from deisa_ray_spark.functions.dedup import (
    JACCARD_THRESHOLD,
    lsh_oracle_cte_prefix,
)
from deisa_ray_spark.registry import query

N_SHARDS = 3


def write_single_parquet_file(df: DataFrame, out_path: str) -> None:
    """Write ``df`` as exactly ONE parquet file at ``out_path`` (the
    shard-staging primitive: coalesce(1) write to a scratch dir, move
    the part file out). Shared by every staged-stream query so the
    part-file glob and move dance has one definition."""
    tmp = out_path + "_w"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*"))[0]
    shutil.move(part, out_path)
    shutil.rmtree(tmp, ignore_errors=True)


def pin_increasing_mtimes(paths: list[str]) -> None:
    """Re-stamp ``paths`` with strictly increasing mtimes in list order
    (backwards from now, so every pinned mtime stays in the past), the
    ONE definition of the FileStreamSource delivery-order contract —
    oldest-mtime-first — every staged-stream query relies on."""
    base = time.time()
    for i, path in enumerate(paths):
        ts = base - (len(paths) - i)
        os.utime(path, (ts, ts))


def stage_ordered_shards(
    docs: DataFrame, dest: str, n_shards: int, order_col: str = "doc_id"
) -> list[str]:
    """Stage ``docs`` as ``n_shards`` doc_id-ordered parquet shard files
    via a single DISTRIBUTED write — the corpus never touches the driver.

    ``repartitionByRange(n, doc_id)`` range-partitions on the executors
    (sampled boundaries; partition i holds strictly smaller doc_ids than
    partition i+1), and the parquet writer emits one ``part-{i:05d}-*``
    file per partition, so lexicographic file order IS doc_id-range
    order. Batch-equivalence of the downstream processor holds for ANY
    contiguous in-order sharding, so the sampled (non-deterministic)
    boundaries are irrelevant to the oracle contract.

    Spark's FileStreamSource delivers oldest-mtime-first; a single write
    job can land all shard files inside one mtime granule, which on
    coarse-clock filesystems would let two shards tie and arrive out of
    order. Pin the contract explicitly: re-stamp each shard file with a
    strictly increasing mtime in range order — O(n_shards) driver-side
    METADATA calls, not data movement.

    Returns the shard file paths in delivery order.
    """
    docs.repartitionByRange(n_shards, order_col).write.parquet(dest)
    files = sorted(glob.glob(os.path.join(dest, "part-*")))
    pin_increasing_mtimes(files)
    return files


def _oracle() -> str:
    # MATERIALIZED throughout the funnel (the r10 graph-family lesson):
    # DuckDB inlines plain CTEs PER REFERENCE, and the recursive reach
    # references `edges` every iteration — un-materialized, the whole
    # band→candidate→exact-verify funnel re-ran per iteration and blew
    # the sf1 mirror's 90 s cap; materialized it runs once.
    return f"""
    WITH RECURSIVE {lsh_oracle_cte_prefix()},
    owners AS MATERIALIZED (
      SELECT band_id, band_key, min(doc_id) AS owner
      FROM bands GROUP BY band_id, band_key
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT b.doc_id, o.owner
      FROM bands b JOIN owners o USING (band_id, band_key)
      WHERE o.owner < b.doc_id
    ),
    verified AS MATERIALIZED (
      SELECT c.owner AS doc_a, c.doc_id AS doc_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.owner
      JOIN sh sb ON sb.doc_id = c.doc_id
      WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
            (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles)))
            >= {JACCARD_THRESHOLD}
    ),
    edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM verified
              UNION SELECT doc_b, doc_a FROM verified),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e2.dst, r.comp FROM reach r JOIN edges e2 ON e2.src = r.id
    )
    SELECT id AS node, CAST(min(comp) AS BIGINT) AS comp
    FROM reach GROUP BY id
    """


@query("stream_cc_clusters", oracle=_oracle())
def stream_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents into doc_id-ordered shards, stream them through
    the composed gate→cluster processor, return the resolved clusters."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.neardup import IncrementalNearDup

    work = tempfile.mkdtemp(prefix="stream_cc_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        # executor-side staging: one distributed range-partitioned write
        # (the corpus never funnels through the driver), mtime-pinned
        # shard delivery order
        stage_ordered_shards(docs, f"{work}/src", N_SHARDS)
        proc = IncrementalNearDup(
            spark,
            f"{work}/state",
            f"{work}/out",
            verify=True,
            cluster=True,
        )
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        # materialize EXECUTOR-side (localCheckpoint cuts the lineage to
        # block-manager storage) before the temp state dir disappears —
        # the driver never holds the rows; production runs would publish
        # the state dir durably instead of tempdir+checkpoint
        return proc.clusters().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
