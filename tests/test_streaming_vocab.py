"""IncrementalVocab: the final Heaps point is sharding-invariant (total
types and tokens do not depend on where shard boundaries fall), and
growth() is idempotent under a replayed batch's duplicate appends."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deisa_ray_spark.operators.stream_vocab_query import stage_bucket_shards
from deisa_ray_spark.sources.registry import load_table
from deisa_ray_spark.streaming.vocabstream import IncrementalVocab
from tests.conftest import SF_DIR


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="t_vocab_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, workdir: str, n_shards: int, tag: str):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    stage_bucket_shards(docs, f"{workdir}/src_{tag}", n_shards)
    proc = IncrementalVocab(spark, f"{workdir}/state_{tag}")
    proc.run_available(f"{workdir}/src_{tag}", f"{workdir}/ckpt_{tag}")
    return proc


def test_final_point_is_sharding_invariant(spark, workdir):
    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    want_types = toks.distinct().count()
    want_tokens = toks.count()
    for n, tag in ((1, "one"), (4, "four")):
        rows = _run(spark, workdir, n, tag).growth().orderBy("batch_id").collect()
        assert len(rows) == n
        assert rows[-1]["n_types_cum"] == want_types
        assert rows[-1]["n_tokens_cum"] == want_tokens


def test_growth_idempotent_under_replayed_batch(spark, workdir):
    proc = _run(spark, workdir, 3, "r")
    before = [tuple(r) for r in proc.growth().orderBy("batch_id").collect()]
    # simulate the replay: re-append batch 0's seen rows and stats row
    seen0 = spark.read.parquet(f"{workdir}/state_r/seen").filter(
        F.col("batch_id") == 0
    )
    assert seen0.count() > 0
    seen0.write.mode("append").parquet(f"{workdir}/state_r/seen")
    stats0 = spark.read.parquet(f"{workdir}/state_r/stats").filter(
        F.col("batch_id") == 0
    )
    stats0.write.mode("append").parquet(f"{workdir}/state_r/stats")
    after = [tuple(r) for r in proc.growth().orderBy("batch_id").collect()]
    assert after == before


def test_restart_resume_across_runs(spark, workdir):
    """Stop-and-resume: run the processor over the first shard only,
    then drop the remaining shards and run AGAIN with the same
    checkpoint and state — the final curve must equal the single-run
    curve (batch numbering continues, first-sight state carries)."""
    import shutil as _sh

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    from deisa_ray_spark.operators.stream_vocab_query import stage_bucket_shards

    staged = tempfile.mkdtemp(prefix="t_vocab_all_")
    try:
        paths = stage_bucket_shards(docs, f"{staged}/all", 3)
        src = f"{workdir}/src_rr"
        import os as _os

        _os.makedirs(src, exist_ok=True)
        proc = IncrementalVocab(spark, f"{workdir}/state_rr")
        # first run sees only shard 0
        _sh.copy2(paths[0], f"{src}/shard-00000.parquet")
        proc.run_available(src, f"{workdir}/ckpt_rr")
        assert proc.growth().count() == 1
        # "restart": new processor instance, same state + checkpoint,
        # remaining shards have landed meanwhile
        _sh.copy2(paths[1], f"{src}/shard-00001.parquet")
        _sh.copy2(paths[2], f"{src}/shard-00002.parquet")
        proc2 = IncrementalVocab(spark, f"{workdir}/state_rr")
        proc2.run_available(src, f"{workdir}/ckpt_rr")
        resumed = [tuple(r) for r in proc2.growth().orderBy("batch_id").collect()]
        single = _run(spark, workdir, 3, "oneshot")
        want = [tuple(r) for r in single.growth().orderBy("batch_id").collect()]
        assert resumed == want
    finally:
        _sh.rmtree(staged, ignore_errors=True)
