"""Incremental Count-Min maintenance over an event stream — the
frequency-sketch twin of the streaming curation processors: at 100 TB
the traffic sketch is MAINTAINED per arriving shard, never rebuilt over
the full history.

Shape: every micro-batch builds its own ``d × w`` partial counter table
(one keyed partial agg over the batch — ``functions/sketches.cms_build``,
the single source of truth shared with the batch query) and appends it
tagged with ``batch_id``; the serving sketch is the cell-wise SUM of the
partials (``cms_merge``). No read-modify-write of prior state per batch:
the per-batch write is O(d·w) regardless of history length, and the
merge happens at READ time over ≤ d·w·n_batches bounded rows.

Batch-equivalence contract: CMS cells are integer counts under a fixed
hash family, and cell-wise sum is commutative/associative — the merged
streamed sketch equals the batch-built sketch BIT-FOR-BIT for ANY
sharding of the input (the mergeable-sketch law; same class as
stream_decontaminate's order-free contract). Pinned in
tests/test_streaming_sketch.py and declared under the exact oracle gate
as ``stream_cms_heavy_hitters``.

Restart caveat (same as IncrementalDecontaminate/IncrementalNearDup):
the only non-idempotent artifact is the appended partial table — a batch
retried AFTER its append but BEFORE its checkpoint commit would append
twice; ``merged()`` therefore deduplicates by keeping one partial per
(batch_id, seed, bucket), making the read path idempotent under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.sketches import cms_build

#: staged event shard schema — narrow on purpose (the sketch key only)
EVENT_SCHEMA = "event_id bigint, user_id bigint"


class IncrementalCMS:
    """foreachBatch processor: append one partial CMS counter table per
    micro-batch; serve the merged sketch at read time."""

    def __init__(self, spark: SparkSession, partials_dir: str) -> None:
        self.spark = spark
        self.partials_dir = partials_dir

    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        partial = cms_build(events, "user_id").withColumn(
            "batch_id", F.lit(batch_id)
        )
        partial.write.mode("append").parquet(self.partials_dir)

    def run_available(
        self,
        src_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = 1,
    ) -> None:
        """One AvailableNow pass over a shard drop directory."""
        reader = self.spark.readStream.schema(EVENT_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        events = reader.parquet(src_dir)
        q = (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def merged(self) -> DataFrame:
        """The serving sketch: retry-safe merge of the appended partials.
        A retried batch re-appends IDENTICAL cells (cms_build is
        deterministic), so max-per-(batch_id, cell) == the single
        intended value."""
        partials = self.spark.read.parquet(self.partials_dir)
        dedup = partials.groupBy("batch_id", "seed", "bucket").agg(
            F.max("cnt").alias("cnt")
        )
        return dedup.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))
