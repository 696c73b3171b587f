"""Incremental MinHash-LSH near-dup contract: shards arriving in
doc_id order produce per-document is_dup flags IDENTICAL to the batch
twin over the same files; state (the band-owners table) lives in
storage and survives engine restarts.
"""

from __future__ import annotations

import os

import pytest

from deisa_ray_spark.sources.registry import load_table
from deisa_ray_spark.streaming import curation
from deisa_ray_spark.streaming.neardup import (
    IncrementalNearDup,
    band_rows_for,
    neardup_flags_batch,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def nd_shard_dir(spark, tmp_path_factory):
    """Documents in 3 in-order shards + a 4th shard of PLANTED near-dups:
    copies of shard 0's first docs with one word changed and fresh
    (larger) doc_ids — the re-crawled-with-boilerplate-tweak case LSH
    dedup exists for."""
    docs = load_table(spark, SF_DIR, "documents")
    base = tmp_path_factory.mktemp("nd_shards")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    third = len(pdf) // 3
    shards = [pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :]]
    planted = pdf.iloc[: max(third // 2, 5)].copy()
    planted["doc_id"] = planted["doc_id"] + 10_000_000
    planted["text"] = planted["text"].map(
        lambda t: " ".join(t.split(" ")[:-1] + ["tweaked"])
    )
    shards.append(planted)
    src = str(base / "src")
    os.makedirs(src)
    for i, shard in enumerate(shards):
        spark.createDataFrame(shard).coalesce(1).write.parquet(f"{src}/shard={i}")
    return src, set(planted["doc_id"])


def _all_docs(spark, src):
    return spark.read.schema(curation.DOC_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src)


def test_streaming_flags_equal_batch_twin(spark, tmp_path, nd_shard_dir):
    src, _planted = nd_shard_dir
    nd = IncrementalNearDup(
        spark, state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "out")
    )
    nd.run_available(src, checkpoint_dir=str(tmp_path / "ckpt"))
    got = {r.doc_id: r.is_dup for r in nd.flags().collect()}
    want = {
        r.doc_id: r.is_dup
        for r in neardup_flags_batch(_all_docs(spark, src)).collect()
    }
    assert got == want
    # every document got exactly one flag row
    assert len(got) == _all_docs(spark, src).count()


def test_planted_near_dups_are_flagged(spark, tmp_path, nd_shard_dir):
    """One-word-changed copies must collide in >=1 of the 4 bands for
    the overwhelming majority of docs (deterministic given the fixed
    corpus; the operating point targets ~50% Jaccard)."""
    src, planted = nd_shard_dir
    flags = {
        r.doc_id: r.is_dup
        for r in neardup_flags_batch(_all_docs(spark, src)).collect()
    }
    caught = sum(1 for d in planted if flags[d])
    assert caught / len(planted) >= 0.8, f"only {caught}/{len(planted)} flagged"


def test_restart_resumes_owner_state(spark, tmp_path, nd_shard_dir):
    """Process shards 0-1, then a FRESH processor on the same
    state/checkpoint processes the rest: final flags equal the batch twin
    — the owners table carried the dedup state across the restart."""
    src_all, _ = nd_shard_dir
    # stage shards into a dir we control the arrival order of
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    state, ckpt, out = (
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    import shutil

    shard_dirs = sorted(
        d for d in os.listdir(src_all) if d.startswith("shard=")
    )
    for d in shard_dirs[:2]:
        shutil.copytree(os.path.join(src_all, d), os.path.join(staged, d))
    nd1 = IncrementalNearDup(spark, state_dir=state, out_dir=out)
    nd1.run_available(staged, checkpoint_dir=ckpt)
    n_first = nd1.flags().count()

    for d in shard_dirs[2:]:
        shutil.copytree(os.path.join(src_all, d), os.path.join(staged, d))
    nd2 = IncrementalNearDup(spark, state_dir=state, out_dir=out)  # "restart"
    nd2.run_available(staged, checkpoint_dir=ckpt)

    got = {r.doc_id: r.is_dup for r in nd2.flags().collect()}
    want = {
        r.doc_id: r.is_dup
        for r in neardup_flags_batch(_all_docs(spark, staged)).collect()
    }
    assert got == want
    assert len(got) > n_first  # the second pass really added shards


def test_owner_state_is_one_row_per_distinct_bucket(spark, tmp_path, nd_shard_dir):
    src, _ = nd_shard_dir
    nd = IncrementalNearDup(
        spark, state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "out")
    )
    nd.run_available(src, checkpoint_dir=str(tmp_path / "ckpt"))
    owners = spark.read.parquet(os.path.join(str(tmp_path / "state"), "band_owners"))
    distinct_buckets = (
        band_rows_for(_all_docs(spark, src))
        .select("band_id", "band_key")
        .distinct()
        .count()
    )
    assert owners.count() == distinct_buckets
    assert owners.select("band_id", "band_key").distinct().count() == owners.count()


def test_verified_mode_equals_batch_twin_and_catches_planted(
    spark, tmp_path, nd_shard_dir
):
    """verify=True: collisions are confirmed by exact Jaccard against
    the owner's stored shingles. Streaming still equals the batch twin,
    planted one-word edits (Jaccard >> threshold) remain caught, and
    verified flags are a subset of gate-only flags."""
    src, planted = nd_shard_dir
    nd = IncrementalNearDup(
        spark,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        verify=True,
    )
    nd.run_available(src, checkpoint_dir=str(tmp_path / "ckpt"))
    got = {r.doc_id: r.is_dup for r in nd.flags().collect()}
    all_docs = _all_docs(spark, src)
    want = {
        r.doc_id: r.is_dup
        for r in neardup_flags_batch(all_docs, verify=True).collect()
    }
    assert got == want
    caught = sum(1 for d in planted if got[d])
    assert caught / len(planted) >= 0.8
    gate = {
        r.doc_id: r.is_dup for r in neardup_flags_batch(all_docs).collect()
    }
    assert all(gate[d] for d, v in got.items() if v)  # verified ⊆ gate
    import os as _os

    sh_store = spark.read.parquet(
        _os.path.join(str(tmp_path / "state"), "owner_shingles")
    )
    # only bucket-owning docs are stored, at most once each
    assert sh_store.select("doc_id").distinct().count() == sh_store.count()
    assert sh_store.count() <= all_docs.count()


def test_streaming_clusters_equal_batch_twin(spark, tmp_path, nd_shard_dir):
    """Gate→cluster composition: shards in doc_id order through
    IncrementalNearDup(cluster=True) resolve to the SAME dedup clusters
    as the batch twin (CC over the owner-collision pair graph) — and
    every planted near-dup lands in a cluster with its original."""
    from deisa_ray_spark.streaming.neardup import neardup_clusters_batch

    src, planted = nd_shard_dir
    proc = IncrementalNearDup(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        verify=True,
        cluster=True,
    )
    proc.run_available(src, str(tmp_path / "ckpt"))
    got = {(r.node, r.comp) for r in proc.clusters().collect()}
    want = {
        (r.node, r.comp)
        for r in neardup_clusters_batch(_all_docs(spark, src), verify=True).collect()
    }
    assert got == want
    assert len(got) > 0
    # each planted doc clusters with a smaller (original) id
    by_node = dict(got)
    clustered_planted = [d for d in planted if d in by_node]
    assert clustered_planted, "planted dups never clustered — vacuous test"
    assert all(by_node[d] < 10_000_000 for d in clustered_planted)


def test_streaming_split_assignment_is_leakage_safe(spark, tmp_path, nd_shard_dir):
    """The streaming split: covers every streamed doc exactly once, and
    no verified near-dup pair straddles train/val."""
    from deisa_ray_spark.streaming.neardup import neardup_pairs_batch
    import pyspark.sql.functions as F

    src, _planted = nd_shard_dir
    proc = IncrementalNearDup(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        verify=True,
        cluster=True,
    )
    proc.run_available(src, str(tmp_path / "ckpt"))
    split = proc.split_assignment()
    n_docs = _all_docs(spark, src).select("doc_id").distinct().count()
    assert split.count() == n_docs
    pairs = neardup_pairs_batch(_all_docs(spark, src), verify=True)
    sa = split.select(F.col("doc_id").alias("owner"), F.col("split").alias("sa"))
    sb = split.select("doc_id", F.col("split").alias("sb"))
    straddled = (
        pairs.join(sa, "owner").join(sb, "doc_id")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddled == 0


def test_stage_ordered_shards_is_distributed_and_ordered(spark, tmp_path):
    """The stream_cc_clusters staging contract: (a) executor-side — the
    query module contains no driver-funnel call (toPandas/collect in the
    staging path); (b) shard files partition the corpus into contiguous
    doc_id ranges in lexicographic file order; (c) mtimes strictly
    increase in that order, so FileStreamSource's oldest-first delivery
    cannot tie even on coarse-clock filesystems."""
    import inspect

    from deisa_ray_spark.operators import stream_cc_query
    from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards

    src = inspect.getsource(stream_cc_query)
    assert "toPandas" not in src  # staging never funnels through the driver

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    dest = str(tmp_path / "shards")
    files = stage_ordered_shards(docs, dest, 4)
    assert len(files) >= 2
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    ranges = []
    total = 0
    for f in files:
        part = spark.read.parquet(f)
        n = part.count()
        total += n
        if n:
            row = part.agg({"doc_id": "min"}).collect()[0][0], part.agg(
                {"doc_id": "max"}
            ).collect()[0][0]
            ranges.append(row)
    assert total == docs.count()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b  # contiguous, non-overlapping, ascending
