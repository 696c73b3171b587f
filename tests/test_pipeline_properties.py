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


def test_pii_scrub_detects_planted_pii(spark):
    """The declared txt_pii_scrub query runs over a PII-free synthetic
    corpus (all-zero counts); this pins DETECTION itself on planted PII
    of each class, plus redaction correctness."""
    from deisa_ray_spark.functions.text import with_pii_counts

    rows = [
        (1, "contact me at alice.smith+work@example.co.uk for details"),
        (2, "call 555-867-5309 or 555.867.5309 today"),
        (3, "server at 192.168.1.100 and 10.0.0.1 responded"),
        (4, "no pii here at all"),
        (5, "mixed: bob@test.io from 172.16.0.3 dialed 123-456-7890"),
    ]
    df = with_pii_counts(spark.createDataFrame(rows, "doc_id int, text string"))
    got = {r.doc_id: r for r in df.collect()}
    assert (got[1].n_email, got[1].n_phone, got[1].n_ipv4) == (1, 0, 0)
    assert (got[2].n_email, got[2].n_phone, got[2].n_ipv4) == (0, 2, 0)
    assert (got[3].n_email, got[3].n_phone, got[3].n_ipv4) == (0, 0, 2)
    assert (got[4].n_email, got[4].n_phone, got[4].n_ipv4) == (0, 0, 0)
    assert (got[5].n_email, got[5].n_phone, got[5].n_ipv4) == (1, 1, 1)
    # redaction replaces every hit and nothing else
    assert got[5].redacted == "mixed: [PII] from [PII] dialed [PII]"
    assert got[4].redacted == got[4].text


def test_ngram_novelty_first_doc_wins(spark, duck):
    """Novelty is an ordering-dependent first-occurrence metric: the
    lowest doc_id containing a gram gets the credit. Verified on the real
    corpus: novelty in [0,1], doc 0 scores 1.0 (nothing precedes it),
    and totals are conserved (sum of novel grams == distinct grams in
    the corpus)."""
    df = QUERIES["txt_ngram_novelty"].fn(spark, SF_DIR).collect()
    by_doc = {r.doc_id: r for r in df}
    assert by_doc[0].novelty == 1.0
    assert all(0.0 <= r.novelty <= 1.0 for r in df)
    total_novel = sum(r.n_novel for r in df)
    distinct_grams = duck.execute(
        """
        SELECT count(DISTINCT g) FROM (
          SELECT unnest(list_distinct(list_transform(
            range(1, len(string_split(text,' ')) - 1),
            i -> string_split(text,' ')[i] || ' ' ||
                 string_split(text,' ')[i+1] || ' ' ||
                 string_split(text,' ')[i+2]))) AS g
          FROM documents)
        """
    ).fetchone()[0]
    assert total_novel == distinct_grams


def test_emb_whiten_is_standardizing(spark):
    """After whitening, each dimension has ~zero mean and ~unit variance:
    the per-vector z_sq_sum averages to the dimensionality and z_sum
    averages to ~0 across the corpus."""
    import numpy as np

    rows = QUERIES["emb_whiten"].fn(spark, SF_DIR).collect()
    d = 64
    z_sq = np.array([r.z_sq_sum for r in rows])
    z_sum = np.array([r.z_sum for r in rows])
    assert abs(z_sq.mean() - d) < 1e-6 * d + 1.0
    assert abs(z_sum.mean()) < 1e-6 * d + 0.5
