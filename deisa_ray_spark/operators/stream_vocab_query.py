"""Streaming vocabulary growth as a declared, ORACLE-CHECKED query:
documents staged as DETERMINISTIC doc_id-bucket shards (the same
``doc_id·N DIV (max_id+1)`` projection the batch Heaps curve buckets
by — range-sampled shard boundaries would make the curve
non-deterministic), streamed through IncrementalVocab, the per-batch
growth stats returned.

Oracle: the SHARED bucket-parameterized ``vocab_growth_oracle`` at
N_SHARDS buckets, with ``bucket`` renamed to ``batch_id`` — for
in-order contiguous shards, "first seen in batch b" == "first bucket"
exactly, so the streamed curve hash-matches the batch SQL.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.text import vocab_growth_oracle
from deisa_ray_spark.registry import query

N_SHARDS = 3

_ORACLE = f"""
    SELECT bucket AS batch_id, n_new_types, n_types_cum,
           n_tokens_bucket AS n_tokens_batch, n_tokens_cum
    FROM ({vocab_growth_oracle(N_SHARDS)})
    """


def stage_bucket_shards(
    docs: DataFrame, dest: str, n_shards: int
) -> list[str]:
    """Stage ``docs`` as ``n_shards`` files whose membership is the
    DETERMINISTIC doc_id-bucket projection (doc_id·N DIV (max+1)) —
    byte-stable across runs, unlike repartitionByRange's sampled
    boundaries — with strictly increasing mtimes so FileStreamSource
    delivers bucket order.

    ONE distributed write for all shards (r13; guide §1/§6 — the old
    one-filter-and-write-per-shard loop re-scanned the corpus n_shards
    times and paid a job per shard): hash-repartition on the shard
    projection puts every shard in exactly one task, ``partitionBy``
    emits one file per shard value, and the driver moves the files into
    the flat ``shard-%05d.parquet`` layout the stream source reads (a
    metadata rename, no data movement)."""
    import glob
    import shutil

    from deisa_ray_spark.operators.stream_cc_query import pin_increasing_mtimes

    os.makedirs(dest, exist_ok=True)
    n = docs.agg((F.max("doc_id") + 1).alias("n")).first()["n"]
    tmp = f"{dest}_w"
    (
        docs.select(
            "doc_id",
            "text",
            (F.col("doc_id") * n_shards / F.lit(n)).cast("int").alias("shard"),
        )
        .repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tmp)
    )
    paths = []
    for i in range(n_shards):
        out = f"{dest}/shard-{i:05d}.parquet"
        parts = sorted(glob.glob(f"{tmp}/shard={i}/part-*"))
        if parts:
            # repartition(n, shard) put the whole shard in one task →
            # exactly one file; assert the invariant rather than merge
            assert len(parts) == 1, f"shard {i} split across files: {parts}"
            shutil.move(parts[0], out)
        else:
            # empty shard (sparse doc_ids): stage a schema-bearing
            # empty file so the stream still delivers the batch
            empty = docs.sparkSession.createDataFrame([], DOC_SCHEMA)
            empty.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/e{i}")
            shutil.move(sorted(glob.glob(f"{tmp}/e{i}/part-*"))[0], out)
        paths.append(out)
    shutil.rmtree(tmp, ignore_errors=True)
    pin_increasing_mtimes(paths)
    return paths


@query("stream_vocab_growth", oracle=_ORACLE)
def stream_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage deterministic doc_id-bucket shards, stream them through
    IncrementalVocab, return the per-batch Heaps curve."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.vocabstream import IncrementalVocab

    work = tempfile.mkdtemp(prefix="stream_vocab_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        stage_bucket_shards(docs, f"{work}/src", N_SHARDS)
        proc = IncrementalVocab(spark, f"{work}/state")
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        out = proc.growth()
        # materialize executor-side before the temp state dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
