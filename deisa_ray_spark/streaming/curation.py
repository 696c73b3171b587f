"""Incremental corpus curation on Structured Streaming: the LLM
training-data pipeline (quality gates → exact dedup → corpus stats) as a
continuously-running job over a document stream.

Batch twins: the quality gates are ``functions.text.txt_gopher_rules``,
the dedup is ``functions.dedup.dedup_exact``, the stats are
``functions.text.txt_source_stats`` — the POINT of this module is that a
corpus arriving as a stream of shards (the way crawl dumps actually land)
is curated incrementally with identical semantics: the declared contract
is streaming-result == batch-result-on-the-same-files, pinned in
tests/test_streaming_curation.py.

Scale notes (100 TB/day ingest):
- The quality filter is stateless and narrow — it fuses into the scan of
  each micro-batch.
- ``dropDuplicates`` on the 32-hex fingerprint keeps O(distinct docs)
  state, which for exact dedup over an unbounded crawl is the honest
  cost (the batch job pays it as a shuffle instead). State lives in the
  state store (RocksDB in production — disk-backed, not heap);
  ``dedup_within`` bounds it by a watermark horizon when
  cross-shard-forever dedup is not required.
- The running per-source stats are a classic partial aggregation: state
  is O(#sources), each micro-batch merges its partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.text import gopher_features

#: Mirror of the documents table (and the JSONL corpus schema).
DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def stream_documents(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def quality_gate(docs: DataFrame) -> DataFrame:
    """Gopher-rule keep filter — stateless, and the SAME expression
    objects as the batch query txt_gopher_rules (shared
    ``gopher_features`` builder), so a doc passes here iff it passes
    there by construction, not by copy discipline."""
    feat = gopher_features()
    return docs.filter(feat["keep"]).withColumn(
        "n_words", feat["n_words"].cast("bigint")
    )


def curate_documents(docs: DataFrame) -> DataFrame:
    """Quality gate → content fingerprint → cross-batch exact dedup.

    ``dropDuplicates`` keeps the FIRST arrival of each fingerprint across
    the whole stream (unbounded state — see module scale notes)."""
    return (
        quality_gate(docs)
        .withColumn("fp", F.md5("text"))
        .dropDuplicates(["fp"])
        .select("doc_id", "source", "lang", "fp", "n_words")
    )


def curate_documents_within(docs: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Watermark-bounded variant: dedups on the fingerprint only within
    ``horizon`` of event time (requires an ``ingest_ts`` column), so
    state is bounded by horizon × arrival rate instead of corpus
    cardinality. ``dropDuplicatesWithinWatermark`` is the operator with
    exactly these semantics — plain ``dropDuplicates`` on (fp, ts) would
    only drop rows whose fingerprint AND timestamp both match."""
    return (
        quality_gate(docs)
        .withColumn("fp", F.md5("text"))
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "source", "lang", "fp", "n_words", "ingest_ts")
    )


def source_stats_stream(curated: DataFrame) -> DataFrame:
    """Running per-source corpus stats over the curated stream —
    partial-agg state keyed by source (O(#sources))."""
    return curated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        # countDistinct is not a streaming aggregate; the lang set per
        # source is small and bounded, so set-union state is the right
        # mergeable form (size read out at emit)
        F.size(F.collect_set("lang")).cast("bigint").alias("n_langs"),
    )


def curate_batch(docs: DataFrame) -> DataFrame:
    """Batch twin of :func:`curate_documents` on the same input: keep
    the minimum doc_id per fingerprint (equals first-arrival when shards
    land in doc_id order)."""
    gated = quality_gate(docs).withColumn("fp", F.md5("text"))
    firsts = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return gated.join(firsts, ["fp", "doc_id"], "left_semi").select(
        "doc_id", "source", "lang", "fp", "n_words"
    )


def trending_terms_stream(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    min_count: int = 2,
) -> DataFrame:
    """Windowed term counts over a document stream (requires
    ``ingest_ts``): the corpus-drift monitor — which terms surge in each
    event-time window as new crawl shards land. Tokenize → explode →
    windowed partial-agg; state is bounded by watermark horizon ×
    vocabulary-in-horizon, and the min_count floor keeps the emitted
    rows to the interesting tail. Consumers take per-window top-k
    downstream (rank-over-append-output is a batch concern — streaming
    emits the counts as windows close)."""
    toks = docs.select(
        "ingest_ts", F.explode(F.split("text", " ")).alias("term")
    )
    return (
        toks.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "term",
            "n",
        )
    )
