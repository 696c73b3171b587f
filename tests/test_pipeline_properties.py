"""Structural invariants of the training-data pipeline ops, beyond the
oracle value checks: CC label validity on crafted graphs, passage-chunk
coverage laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from deisa_ray_spark.functions.dedup import cc_labels
from deisa_ray_spark.functions.text import CHUNK_S, CHUNK_W
from deisa_ray_spark.registry import load_all
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR

QUERIES = load_all()


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    rows = cc_labels(df).collect()
    comps: dict[int, set[int]] = {}
    for r in rows:
        comps.setdefault(r.comp, set()).add(r.id)
    return set(frozenset(c) for c in comps.values())


def test_cc_path_graph_single_component(spark):
    # path 1-2-3-4-5: transitive chain collapses to one cluster even
    # though 1 and 5 share no edge — the property pairwise dedup lacks
    assert _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        frozenset({1, 2, 3, 4, 5})
    }


def test_cc_two_components_and_cycle(spark):
    got = _components(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {frozenset({1, 2, 3}), frozenset({10, 11})}


def test_cc_labels_are_min_reachable_id(spark):
    df = spark.createDataFrame([(7, 3), (3, 9), (20, 21)], "doc_a bigint, doc_b bigint")
    labels = {r.id: r.comp for r in cc_labels(df).collect()}
    assert labels == {3: 3, 7: 3, 9: 3, 20: 20, 21: 20}


def test_passage_chunks_cover_and_tile(spark):
    """Chunk laws per doc: chunk ids are 0..k-1; every chunk has
    min(W, n - id*S) tokens (so chunks tile the doc with stride S and
    the last one reaches exactly the end); short docs get one chunk."""
    chunks = QUERIES["txt_passage_chunks"].fn(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    j = chunks.join(docs, "doc_id")
    bad_len = j.filter(
        F.col("n_chunk_tokens")
        != F.least(F.lit(CHUNK_W), F.col("n") - F.col("chunk_id") * CHUNK_S)
    )
    assert bad_len.count() == 0
    per_doc = j.groupBy("doc_id", "n").agg(
        F.count(F.lit(1)).alias("k"),
        F.min("chunk_id").alias("kmin"),
        F.max("chunk_id").alias("kmax"),
    )
    bad_ids = per_doc.filter(
        (F.col("kmin") != 0) | (F.col("kmax") != F.col("k") - 1)
    )
    assert bad_ids.count() == 0
    # every token position is inside the last chunk's span
    bad_cover = per_doc.filter(
        F.col("kmax") * CHUNK_S + CHUNK_W < F.col("n")
    )
    assert bad_cover.count() == 0
    one_chunk = per_doc.filter(F.col("n") <= CHUNK_W).filter(F.col("k") != 1)
    assert one_chunk.count() == 0
