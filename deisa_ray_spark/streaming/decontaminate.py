"""Incremental benchmark DECONTAMINATION over a document stream — the
one curation-funnel stage that had no incremental path (quality gating,
near-dup gating, and clustering already stream via curation.py /
neardup.py / cc_incremental.py). At 100 TB you decontaminate each new
crawl shard as it lands, not the whole corpus per release.

Shape: the benchmark's shingle set is built ONCE (``stage_bench_shingles``
— eval suites are fixed and bounded at production, so the side table is
small and effectively static) and stored as parquet; every micro-batch
then flags its documents by ONE broadcast semi-join of their exploded
shingles against that side table. No state is written per batch beyond
the flag output itself — the processor is stateless-by-construction, so
restarts are trivially safe (a retried batch re-emits identical flags;
the only non-idempotent artifact is the appended output, same caveat as
IncrementalNearDup).

Batch-equivalence contract: flags are IDENTICAL to the batch
``dedup_decontaminate`` rule (shared single source of truth — the same
``shingles_col`` 3-gram builder and the same doc_id % BENCH_MOD bench
slice), for ANY arrival order, because contamination of a document
depends only on the static benchmark set. Pinned, incl. kill-and-restart,
in tests/test_streaming_decontaminate.py; declared under the exact
oracle gate as ``stream_decontaminate`` (operators/stream_decon_query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.dedup import BENCH_MOD, shingles_col

#: Benchmark side-table schema: one row per distinct benchmark shingle.
BENCH_SCHEMA = "s string"


def stage_bench_shingles(docs: DataFrame, bench_dir: str) -> None:
    """Build the static benchmark shingle side table from the benchmark
    slice of ``docs`` (doc_id % BENCH_MOD == 0) — run once per eval-suite
    release, not per batch."""
    (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode(shingles_col()).alias("s"))
        .distinct()
        .write.mode("overwrite")
        .parquet(bench_dir)
    )


class IncrementalDecontaminate:
    """foreachBatch processor: flag each incoming document iff it shares
    ≥1 shingle with the stored benchmark set. Documents belonging to the
    benchmark slice itself are dropped (they are the eval suite, not
    training data) — mirroring the batch query's WHERE."""

    def __init__(self, spark: SparkSession, bench_dir: str, out_dir: str) -> None:
        self.spark = spark
        self.bench_dir = bench_dir
        self.out_dir = out_dir

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        bench = self.spark.read.schema(BENCH_SCHEMA).parquet(self.bench_dir)
        corpus = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
        cont = (
            corpus.select("doc_id", F.explode(shingles_col()).alias("s"))
            .join(F.broadcast(bench), "s", "left_semi")
            .select("doc_id")
            .distinct()
            .withColumn("_c", F.lit(1))
        )
        out = (
            corpus.select("doc_id", "source", "lang")
            .join(cont, "doc_id", "left")
            .select(
                "doc_id",
                "source",
                "lang",
                F.coalesce(F.col("_c") == 1, F.lit(False)).alias("is_contaminated"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        out.write.mode("append").parquet(self.out_dir)

    def run_available(
        self,
        src_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = 1,
    ) -> None:
        """One AvailableNow pass over a shard drop directory."""
        from deisa_ray_spark.streaming.curation import stream_documents

        docs = stream_documents(self.spark, src_dir, max_files_per_trigger)
        q = (
            docs.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def flags(self) -> DataFrame:
        return self.spark.read.parquet(self.out_dir)


def decontaminate_flags_batch(docs: DataFrame) -> DataFrame:
    """Batch twin: per-document contamination flags under the SAME rule
    (shared shingle builder + bench slice) — what the streaming flags
    must equal for any arrival order."""
    sh = docs.select("doc_id", F.explode(shingles_col()).alias("s"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = sh.filter(is_bench).select("s").distinct()
    cont = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    return (
        docs.filter(~is_bench)
        .select("doc_id", "source", "lang")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            F.coalesce(F.col("_c") == 1, F.lit(False)).alias("is_contaminated"),
        )
    )
