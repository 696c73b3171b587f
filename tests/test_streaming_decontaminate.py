"""Incremental benchmark decontamination: streamed flags must equal the
batch twin (shared shingle builder + bench slice) for ANY shard arrival
order — contamination depends only on the static benchmark side table —
and survive a kill-and-restart with no duplicate or missing flags."""

from __future__ import annotations

import os
import shutil

import pytest

from deisa_ray_spark.sources.registry import load_table
from deisa_ray_spark.streaming.decontaminate import (
    IncrementalDecontaminate,
    decontaminate_flags_batch,
    stage_bench_shingles,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def decon_dirs(spark, tmp_path_factory):
    """Bench side table + 3 shards staged OUT of doc_id order (the
    order-independence contract makes shuffled arrival legal)."""
    docs = load_table(spark, SF_DIR, "documents")
    base = tmp_path_factory.mktemp("decon")
    bench = str(base / "bench")
    stage_bench_shingles(docs, bench)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    third = len(pdf) // 3
    # deliberately out-of-order shards: middle first, tail, then head
    shards = [pdf.iloc[third : 2 * third], pdf.iloc[2 * third :], pdf.iloc[:third]]
    src = str(base / "src")
    os.makedirs(src)
    for i, shard in enumerate(shards):
        spark.createDataFrame(shard).coalesce(1).write.parquet(f"{src}/shard={i}")
    return bench, src, docs


def _flags_map(df):
    return {r.doc_id: r.is_contaminated for r in df.collect()}


def test_streaming_flags_equal_batch_any_order(spark, tmp_path, decon_dirs):
    bench, src, docs = decon_dirs
    proc = IncrementalDecontaminate(spark, bench, str(tmp_path / "out"))
    proc.run_available(src, str(tmp_path / "ckpt"))
    got = _flags_map(proc.flags())
    want = _flags_map(decontaminate_flags_batch(docs))
    assert got == want
    assert any(got.values()), "contract is vacuous if nothing is contaminated"
    assert not all(got.values())


def test_restart_resumes_cleanly(spark, tmp_path, decon_dirs):
    """Process one shard, then a FRESH processor on the same checkpoint
    takes the rest: flags equal the batch twin with each doc flagged
    exactly once (the checkpoint prevents reprocessing shard 0)."""
    bench, src_all, docs = decon_dirs
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    shard_dirs = sorted(d for d in os.listdir(src_all) if d.startswith("shard="))
    shutil.copytree(os.path.join(src_all, shard_dirs[0]), os.path.join(staged, shard_dirs[0]))
    p1 = IncrementalDecontaminate(spark, bench, out)
    p1.run_available(staged, ckpt)
    n_first = p1.flags().count()

    for d in shard_dirs[1:]:
        shutil.copytree(os.path.join(src_all, d), os.path.join(staged, d))
    p2 = IncrementalDecontaminate(spark, bench, out)  # "restart"
    p2.run_available(staged, ckpt)

    rows = p2.flags().collect()
    assert len(rows) == len({r.doc_id for r in rows}), "a doc was flagged twice"
    got = {r.doc_id: r.is_contaminated for r in rows}
    want = _flags_map(decontaminate_flags_batch(docs))
    assert got == want
    assert len(got) > n_first


def test_bench_docs_never_reach_the_output(spark, tmp_path, decon_dirs):
    from deisa_ray_spark.functions.dedup import BENCH_MOD

    bench, src, _docs = decon_dirs
    proc = IncrementalDecontaminate(spark, bench, str(tmp_path / "out"))
    proc.run_available(src, str(tmp_path / "ckpt"))
    assert proc.flags().filter(f"doc_id % {BENCH_MOD} = 0").count() == 0
