"""Streaming benchmark decontamination as a declared, ORACLE-CHECKED
query: the benchmark shingle side table staged once, documents staged as
doc_id-ordered shards and streamed through IncrementalDecontaminate, the
appended per-document flags returned.

Oracle-checkable with NO arrival-order caveat at all: a document's
contamination depends only on the static benchmark set, so the streamed
flags equal the batch rule for any sharding — the strongest of the
streaming contracts (stream_cc needs in-order arrival, the window
queries need the final-watermark closed form; this needs nothing).
Shares dedup_decontaminate's single sources of truth (shingles_col /
BENCH_MOD), so the three decontamination surfaces — batch query, funnel
stage, stream — cannot drift apart.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from deisa_ray_spark.functions.dedup import BENCH_MOD, contamination_ctes
from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.registry import query

N_SHARDS = 3

_ORACLE = f"""
    WITH {contamination_ctes()}
    SELECT doc_id, source, lang,
           doc_id IN (SELECT doc_id FROM ccont) AS is_contaminated
    FROM documents
    WHERE doc_id % {BENCH_MOD} <> 0
    """


@query("stream_decontaminate", oracle=_ORACLE)
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the bench side table + doc shards, stream the corpus
    through the incremental decontaminator, return per-doc flags."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.decontaminate import (
        IncrementalDecontaminate,
        stage_bench_shingles,
    )

    work = tempfile.mkdtemp(prefix="stream_decon_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        stage_bench_shingles(docs, f"{work}/bench")
        stage_ordered_shards(docs, f"{work}/src", N_SHARDS)
        proc = IncrementalDecontaminate(spark, f"{work}/bench", f"{work}/out")
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        out = proc.flags().select("doc_id", "source", "lang", "is_contaminated")
        # materialize executor-side before the temp output dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
