"""Incremental vocabulary tracking over a document stream — the
streaming twin of txt_vocab_growth's Heaps curve: at 100 TB you track
new token types per arriving crawl shard, never re-scanning history.

State: a persistent SEEN-TOKENS table (tok, batch_id of first sight),
append-only — its size is the vocabulary, which Heaps' law keeps
sublinear in corpus size (the same reason txt_tfidf's df table is
manageable). Each micro-batch:

1. ONE keyed partial agg over the batch → distinct types AND their
   counts together (tokenize once; the stats and new-type jobs both
   reuse the checkpointed per-type frame),
2. stats row (batch_id, n_new_types, n_tokens_batch) from a flagged
   left join against the (deduped) seen table — written while seen/
   is still the pre-batch state,
3. LEFT ANTI join against the seen table → the batch's NEW types
   (an equi-join on tok — deliberately not broadcast: vocabulary is
   unbounded at corpus scale, AQE may still broadcast small states),
   appended with this batch_id.

Batch-equivalence contract: for IN-ORDER contiguous shards (the
stream_cc arrival-order class), per-batch new-type counts equal the
batch Heaps curve with bucket == shard index, because "first seen in
batch b" == "first bucket" exactly. Pinned under the exact oracle gate
as ``stream_vocab_growth`` via the SHARED, bucket-parameterized
``vocab_growth_oracle`` — the batch query and the stream cannot drift.

Restart caveat (the IncrementalNearDup class): a batch retried after
its appends re-appends the same rows; reads therefore deduplicate by
min-batch_id per token (first sight wins — idempotent under replay)
and by batch_id for stats rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: staged document shard schema (narrow: the tokenizer's inputs only)
DOC_SCHEMA = "doc_id bigint, text string"


class IncrementalVocab:
    """foreachBatch processor: maintain the seen-tokens table and emit
    per-batch vocabulary-growth stats."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.seen_dir = f"{state_dir}/seen"
        self.stats_dir = f"{state_dir}/stats"
        self._has_seen = False

    def _seen(self) -> DataFrame:
        if not self._has_seen:
            import glob

            self._has_seen = bool(glob.glob(f"{self.seen_dir}/part-*"))
        if not self._has_seen:
            return self.spark.createDataFrame([], "tok string, batch_id bigint")
        return self.spark.read.schema("tok string, batch_id bigint").parquet(
            self.seen_dir
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        # ONE tokenize pass AND one seen-table pass per batch (r13;
        # guide §1/§2.4): the keyed partial agg yields the distinct
        # types and their counts, and the flagged left join against the
        # (deduped) seen table is folded into the SAME checkpointed
        # frame — the stats aggregate and the new-types filter both read
        # it, so seen/ (the unbounded-at-scale state table) is scanned
        # once per batch instead of twice (the former shape joined the
        # checkpointed counts against seen separately for stats and for
        # the anti-join). Still 3 jobs/batch with strictly less work.
        # Checkpointing CUTS the lineage from seen/ (which the next
        # statements both read and append to); the appended part file is
        # invisible to jobs planned before the write lands.
        # The flag side deduplicates: replayed batches re-append seen
        # rows, and a dup match in a plain left join would multiply cnt;
        # filtering the flag for new types equals the former anti-join
        # for the same reason (≤1 match per tok).
        seen_toks = self._seen().select("tok").distinct()
        joined = (
            docs.select(F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .join(seen_toks.withColumn("seen_flag", F.lit(1)), "tok", "left")
            .localCheckpoint(eager=True)
        )
        # stats FIRST, while seen/ is still the pre-batch state (the
        # new-types append below would otherwise be visible to this
        # job's scan and zero the count).
        stats = joined.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_tokens_batch"),
            F.count(F.when(F.col("seen_flag").isNull(), 1)).cast("bigint").alias(
                "n_new_types"
            ),
        ).select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "n_new_types",
            "n_tokens_batch",
        )
        stats.write.mode("append").parquet(self.stats_dir)
        new_types = joined.filter(F.col("seen_flag").isNull()).select(
            "tok", F.lit(batch_id).cast("bigint").alias("batch_id")
        )
        new_types.write.mode("append").parquet(self.seen_dir)
        self._has_seen = True
        # both writes have landed; the batch frame is never read again
        from deisa_ray_spark.functions.dedup import free_local_checkpoint

        free_local_checkpoint(joined)

    def run_available(
        self,
        src_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = 1,
    ) -> None:
        reader = self.spark.readStream.schema(DOC_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        docs = reader.parquet(src_dir)
        q = (
            docs.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def growth(self) -> DataFrame:
        """The Heaps curve from state: replay-safe (min batch_id per
        token; one stats row per batch_id) with running sums over the
        bounded per-batch frame."""
        from pyspark.sql import Window as W

        seen = (
            self._seen()
            .groupBy("tok")
            .agg(F.min("batch_id").alias("fb"))
            .groupBy(F.col("fb").alias("batch_id"))
            .agg(F.count(F.lit(1)).alias("n_new_types"))
        )
        stats = (
            self.spark.read.schema(
                "batch_id bigint, n_new_types bigint, n_tokens_batch bigint"
            )
            .parquet(self.stats_dir)
            .groupBy("batch_id")
            .agg(F.max("n_tokens_batch").alias("n_tokens_batch"))
            # an empty shard (sparse doc_ids) still produces a stats row;
            # the batch Heaps SQL has NO row for an empty bucket — omit
            # empty batches so the streamed curve matches on any corpus
            .filter(F.col("n_tokens_batch") > 0)
        )
        cum = W.orderBy("batch_id").rowsBetween(W.unboundedPreceding, 0)
        return (
            stats.join(seen, "batch_id", "left")
            .select(
                "batch_id",
                F.coalesce("n_new_types", F.lit(0)).alias("n_new_types"),
                "n_tokens_batch",
            )
            .select(
                "batch_id",
                "n_new_types",
                F.sum("n_new_types").over(cum).cast("bigint").alias("n_types_cum"),
                "n_tokens_batch",
                F.sum("n_tokens_batch").over(cum).cast("bigint").alias("n_tokens_cum"),
            )
        )
