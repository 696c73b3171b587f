"""Streaming curation contract: a corpus arriving as a stream of shards
is curated (quality gate → exact dedup → stats) with results identical
to the batch pipeline over the same files.
"""

from __future__ import annotations

import os

import pytest

from deisa_ray_spark.sources.registry import load_table
from deisa_ray_spark.streaming import curation

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def shard_dir(spark, tmp_path_factory):
    """Documents split into 3 shard files IN doc_id ORDER, with a
    cross-shard duplicate: shard 2 re-contains shard 0's texts under new
    doc_ids (re-crawled pages — the case exact dedup exists for)."""
    docs = load_table(spark, SF_DIR, "documents")
    base = tmp_path_factory.mktemp("doc_shards")
    n = docs.count()
    third = n // 3
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    shards = [pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :]]
    # shard 3: duplicates of shard 0's texts with fresh (larger) doc_ids
    dup = pdf.iloc[: third // 2].copy()
    dup["doc_id"] = dup["doc_id"] + 10_000_000
    shards.append(dup)
    src = str(base / "src")
    os.makedirs(src)
    for i, shard in enumerate(shards):
        spark.createDataFrame(shard).coalesce(1).write.parquet(f"{src}/shard={i}")
    return src


def _read_all_shards(spark, shard_dir):
    return spark.read.schema(curation.DOC_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(shard_dir)


def _run_available_now(df, name, checkpoint, output_mode):
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_curation_equals_batch(spark, tmp_path, shard_dir):
    """Incremental curation over shard files == batch curation over the
    union of the same files: same kept doc_ids, same fingerprints, and
    the cross-shard duplicates are dropped (first arrival kept)."""
    stream = curation.stream_documents(spark, shard_dir, max_files_per_trigger=1)
    curated = curation.curate_documents(stream)
    _run_available_now(curated, "curated_docs", str(tmp_path / "ckpt"), "append")
    got = {
        (r["doc_id"], r["fp"]) for r in spark.table("curated_docs").collect()
    }

    batch = curation.curate_batch(_read_all_shards(spark, shard_dir))
    want = {(r["doc_id"], r["fp"]) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
    # every duplicate-shard doc (doc_id >= 10M) lost to its original
    assert not any(d >= 10_000_000 for d, _ in got)


def test_streaming_source_stats_converge_to_batch(spark, tmp_path, shard_dir):
    """Running per-source stats (partial-agg state, complete mode) end
    at exactly the batch aggregate of the curated corpus."""
    stream = curation.stream_documents(spark, shard_dir, max_files_per_trigger=1)
    stats = curation.source_stats_stream(curation.curate_documents(stream))
    _run_available_now(stats, "curated_stats", str(tmp_path / "ckpt2"), "complete")
    got = {
        r["source"]: (r["n_docs"], r["total_words"], r["n_langs"])
        for r in spark.table("curated_stats").collect()
    }

    batch = curation.curate_batch(_read_all_shards(spark, shard_dir))
    want = {
        r["source"]: (r["n_docs"], r["total_words"], r["n_langs"])
        for r in curation.source_stats_stream(batch).collect()
    }
    assert got == want


def test_quality_gate_matches_declared_query(spark):
    """The streaming gate keeps exactly the docs txt_gopher_rules marks
    keep=true — one rule set, two execution modes."""
    from deisa_ray_spark.functions.text import txt_gopher_rules

    docs = load_table(spark, SF_DIR, "documents")
    gated = {r["doc_id"] for r in curation.quality_gate(docs).collect()}
    declared = {
        r["doc_id"] for r in txt_gopher_rules(spark, SF_DIR).collect() if r["keep"]
    }
    assert gated == declared
    assert 0 < len(gated) < docs.count()  # the gate separates, not rubber-stamps


def test_dedup_within_watermark_drops_near_duplicates(spark, tmp_path):
    """curate_documents_within dedups on the FINGERPRINT within the
    horizon: identical texts arriving minutes apart (different
    ingest_ts) collapse to the first arrival — the case plain
    dropDuplicates([fp, ts]) would wrongly keep."""
    import pandas as pd

    src = str(tmp_path / "src")
    text_ok = "the a " + " ".join(f"tok{i % 40}" for i in range(60))
    base = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [text_ok, text_ok, text_ok + " extra"],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [len(text_ok)] * 2 + [len(text_ok) + 6],
            "ingest_ts": pd.to_datetime(
                ["2026-01-01 10:00:00", "2026-01-01 10:05:00", "2026-01-01 10:06:00"]
            ),
        }
    )
    spark.createDataFrame(base).write.parquet(src)
    stream = spark.readStream.schema(
        curation.DOC_SCHEMA + ", ingest_ts timestamp"
    ).parquet(src)
    out = curation.curate_documents_within(stream, horizon="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("within_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("within_dedup").collect()
    kept = sorted(r["doc_id"] for r in rows)
    # exactly ONE of the identical pair {1, 2} survives (within a single
    # micro-batch the survivor is arbitrary — the contract is one row
    # per fingerprint within the horizon, not which one); the distinct
    # doc 3 always survives
    assert len(kept) == 2 and kept[1] == 3 and kept[0] in (1, 2), kept


def test_trending_terms_converge_to_batch(spark, tmp_path):
    """Windowed term counts over the stream equal the batch groupBy over
    the same data once all windows close (AvailableNow drains then the
    watermark finalizes every window)."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    rows = []
    for i in range(40):
        rows.append(
            {
                "doc_id": i,
                "text": f"alpha beta{' gamma' if i % 2 == 0 else ''} alpha",
                "lang": "en",
                "source": "s0",
                "n_chars": 20,
                "ingest_ts": pd.Timestamp("2026-01-01 10:00:00")
                + pd.Timedelta(minutes=3 * i),
            }
        )
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)
    stream = spark.readStream.schema(
        curation.DOC_SCHEMA + ", ingest_ts timestamp"
    ).parquet(src)
    out = curation.trending_terms_stream(stream, window="1 hour", min_count=2)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("trending")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["w_start"], r["term"]): r["n"] for r in spark.table("trending").collect()
    }

    batch = (
        spark.read.schema(curation.DOC_SCHEMA + ", ingest_ts timestamp")
        .parquet(src)
        .select("ingest_ts", F.explode(F.split("text", " ")).alias("term"))
        .groupBy(F.window("ingest_ts", "1 hour").alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    want = {(r["w"]["start"], r["term"]): r["n"] for r in batch.collect()}
    # append mode only emits CLOSED windows; the final (unclosed-by-
    # watermark) window may be withheld — every emitted row must match
    # the batch truth, and at least the first window must have emitted
    assert got, "no windows emitted"
    assert all(want.get(k) == v for k, v in got.items()), (got, want)
    first_window = min(k[0] for k in want)
    assert any(k[0] == first_window for k in got)
