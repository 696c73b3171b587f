"""The streaming curation pipeline (quality gate → cross-shard exact
dedup) as a declared, ORACLE-CHECKED query: documents staged as
doc_id-ordered shards, fed shard-at-a-time through
``streaming/curation.curate_documents`` (Gopher gate → md5 fingerprint →
stateful ``dropDuplicates``), the kept set reported as a per-length-bucket
census.

Why this is hash-checkable despite streaming nondeterminism: within a
micro-batch ``dropDuplicates`` keeps an ARBITRARY representative row of
each fingerprint, so any output that names the surviving doc_id/source/
lang would be run-dependent. The declared output is therefore a function
of the FINGERPRINT SET alone — ``n_words`` is a function of the text and
hence of the fingerprint, so the (length-bucket → kept-doc count, total
words) census is identical for every admissible representative choice,
while still hash-verifying the two semantics that matter: the gate
(which fingerprints are eligible) and the cross-shard dedup (each
fingerprint counted once, however many shards re-carry it).

Scale: the gate is stateless and fuses into each micro-batch's scan;
dedup state is O(distinct fingerprints) in the state store (RocksDB in
production — see streaming/curation.py's module notes, including the
watermark-bounded variant when forever-dedup is not required); the
census is a partial agg over the curated output.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.text import (
    GOPHER_MAX_MEAN_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_LEN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_TTR,
    GOPHER_MIN_WORDS,
)
from deisa_ray_spark.operators.stream_cc_query import N_SHARDS, stage_ordered_shards
from deisa_ray_spark.registry import query

BUCKET_WORDS = 16  #: census bucket width (words)


def _oracle() -> str:
    return f"""
    WITH feat AS (
      SELECT md5(text) AS fp,
             len(string_split(text, ' ')) AS n_words,
             list_avg(list_transform(string_split(text, ' '), t -> len(t)))
               AS mean_word_len,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS ttr,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
      FROM documents
    ),
    kept AS (
      SELECT DISTINCT fp, n_words FROM feat
      WHERE (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
        AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_LEN}
                                AND {GOPHER_MAX_MEAN_LEN})
        AND (ttr >= {GOPHER_MIN_TTR})
        AND (n_stop >= {GOPHER_MIN_STOPWORDS})
    )
    SELECT CAST(n_words // {BUCKET_WORDS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM kept GROUP BY 1
    """


@query("stream_curation_stats", oracle=_oracle())
def stream_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents into doc_id-ordered shards, stream them through
    the gate→dedup curation pipeline (one shard per micro-batch), and
    return the kept-corpus census by length bucket."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.curation import curate_documents, stream_documents

    work = tempfile.mkdtemp(prefix="stream_cur_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        stage_ordered_shards(docs, f"{work}/src", N_SHARDS)
        curated = curate_documents(
            stream_documents(spark, f"{work}/src", max_files_per_trigger=1)
        )
        q = (
            curated.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Explicit schema: if the gate keeps zero documents no part files
        # exist, and schema inference on an empty dir would raise where
        # the oracle legitimately returns an empty census.
        kept = spark.read.schema(
            "doc_id bigint, source string, lang string, fp string, n_words bigint"
        ).parquet(f"{work}/out")
        census = kept.groupBy(
            F.expr(f"n_words div {BUCKET_WORDS}").alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        # materialize executor-side before the temp output dir disappears
        # (same discipline as stream_cc_clusters)
        return census.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
