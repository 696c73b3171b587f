"""IncrementalCMS: the mergeable-sketch law (streamed == batch for any
sharding) and retry idempotence of the appended partials."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deisa_ray_spark.functions.sketches import cms_build
from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.sources.registry import load_table
from deisa_ray_spark.streaming.sketchstream import IncrementalCMS
from tests.conftest import SF_DIR


def _cells(df) -> dict:
    return {(r["seed"], r["bucket"]): r["cnt"] for r in df.collect()}


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="t_cms_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, workdir: str, n_shards: int, tag: str) -> dict:
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    stage_ordered_shards(ev, f"{workdir}/src_{tag}", n_shards, order_col="event_id")
    proc = IncrementalCMS(spark, f"{workdir}/partials_{tag}")
    proc.run_available(f"{workdir}/src_{tag}", f"{workdir}/ckpt_{tag}")
    return _cells(proc.merged())


def test_streamed_sketch_equals_batch_for_any_sharding(spark, workdir):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    batch = _cells(cms_build(ev, "user_id"))
    assert _run(spark, workdir, 1, "one") == batch
    assert _run(spark, workdir, 3, "three") == batch


def test_merged_is_idempotent_under_retried_append(spark, workdir):
    """A batch retried after its append re-appends identical cells;
    merged() must count them once."""
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    stage_ordered_shards(ev, f"{workdir}/src", 2, order_col="event_id")
    proc = IncrementalCMS(spark, f"{workdir}/partials")
    proc.run_available(f"{workdir}/src", f"{workdir}/ckpt")
    before = _cells(proc.merged())
    # simulate the retry: re-append batch 0's partial verbatim
    partials = spark.read.parquet(f"{workdir}/partials")
    dup = partials.filter(F.col("batch_id") == 0)
    assert dup.count() > 0
    dup.write.mode("append").parquet(f"{workdir}/partials")
    assert _cells(proc.merged()) == before


def test_restart_resume_across_runs(spark, workdir):
    """Stop-and-resume for the sketch maintainer: first run over one
    shard, then resume with the same checkpoint/partials after more
    shards land — the merged sketch must equal the batch sketch."""
    import os
    import shutil as _sh

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    staged = tempfile.mkdtemp(prefix="t_cms_all_")
    try:
        paths = stage_ordered_shards(ev, f"{staged}/all", 3, order_col="event_id")
        src = f"{workdir}/src_rr"
        os.makedirs(src, exist_ok=True)
        proc = IncrementalCMS(spark, f"{workdir}/partials_rr")
        _sh.copy2(paths[0], f"{src}/00000.parquet")
        proc.run_available(src, f"{workdir}/ckpt_rr")
        for i in (1, 2):
            _sh.copy2(paths[i], f"{src}/{i:05d}.parquet")
        proc2 = IncrementalCMS(spark, f"{workdir}/partials_rr")
        proc2.run_available(src, f"{workdir}/ckpt_rr")
        assert _cells(proc2.merged()) == _cells(cms_build(ev, "user_id"))
    finally:
        _sh.rmtree(staged, ignore_errors=True)
