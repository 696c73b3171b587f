"""Incremental materialized-view maintenance: batched refresh must equal
a one-shot build (mergeable-state law), touch only the partitions the
delta lands in, and keep distinct estimates inside the sketch's accuracy
contract."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from deisa_ray_spark.mv import (
    RollupSpec,
    init_rollup,
    partial_state,
    finalize,
    read_rollup,
    refresh_rollup,
)
from tests.conftest import SF_DIR

SPEC = RollupSpec(
    keys=["l_returnflag", "l_linestatus"],
    partition_by=["l_returnflag"],
    measures=["l_quantity", "l_extendedprice"],
    approx_distinct=["l_partkey"],
)


def _fact(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def _rollup_rows(df):
    rows = {}
    for r in df.collect():
        rows[(r.l_returnflag, r.l_linestatus)] = r
    return rows


def test_batched_refresh_equals_one_shot_build(spark, tmp_path):
    fact = _fact(spark)
    mv_dir = str(tmp_path / "mv")
    batches = [fact.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]

    init_rollup(spark, batches[0], mv_dir, SPEC)
    refresh_rollup(spark, batches[1], mv_dir, SPEC)
    refresh_rollup(spark, batches[2], mv_dir, SPEC)

    got = _rollup_rows(read_rollup(spark, mv_dir, SPEC))
    want = _rollup_rows(finalize(partial_state(fact, SPEC), SPEC))

    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        # counts and integer-valued bounds merge exactly
        assert g.n_rows == w.n_rows
        assert g.min_l_quantity == w.min_l_quantity
        assert g.max_l_quantity == w.max_l_quantity
        assert g.min_l_extendedprice == w.min_l_extendedprice
        assert g.max_l_extendedprice == w.max_l_extendedprice
        # double sums merge up to summation-order ulps
        assert g.sum_l_extendedprice == pytest.approx(
            w.sum_l_extendedprice, rel=1e-12
        )
        assert g.avg_l_quantity == pytest.approx(w.avg_l_quantity, rel=1e-12)


def test_refresh_touches_only_delta_partitions(spark, tmp_path):
    fact = _fact(spark)
    mv_dir = str(tmp_path / "mv")
    init_rollup(spark, fact.filter(F.col("l_orderkey") % 2 == 0), mv_dir, SPEC)

    untouched = {
        f: os.stat(f).st_ino
        for f in glob.glob(f"{mv_dir}/l_returnflag=A/*.parquet")
    }
    assert untouched

    delta = fact.filter(
        (F.col("l_orderkey") % 2 == 1) & (F.col("l_returnflag") == "N")
    )
    report = refresh_rollup(spark, delta, mv_dir, SPEC)
    assert report.n_partitions_rewritten == 1

    after = {
        f: os.stat(f).st_ino
        for f in glob.glob(f"{mv_dir}/l_returnflag=A/*.parquet")
    }
    assert after == untouched  # same files, same inodes — never rewritten


def test_distinct_estimate_within_sketch_contract(spark, tmp_path):
    fact = _fact(spark)
    mv_dir = str(tmp_path / "mv")
    batches = [fact.filter(F.col("l_orderkey") % 2 == i) for i in range(2)]
    init_rollup(spark, batches[0], mv_dir, SPEC)
    refresh_rollup(spark, batches[1], mv_dir, SPEC)

    exact = {
        (r.l_returnflag, r.l_linestatus): r.d
        for r in fact.groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    for k, r in _rollup_rows(read_rollup(spark, mv_dir, SPEC)).items():
        assert r.approx_distinct_l_partkey == pytest.approx(exact[k], rel=0.05)


def test_partition_by_must_be_subset_of_keys():
    with pytest.raises(ValueError):
        RollupSpec(keys=["a"], partition_by=["b"])


def test_streaming_rollup_matches_one_shot(spark, tmp_path):
    """foreachBatch-maintained MV over a file stream equals the one-shot
    build, and a replayed batch id is skipped (at-least-once safety)."""
    from deisa_ray_spark.mv import apply_batch, stream_rollup

    fact = _fact(spark)
    src = str(tmp_path / "src")
    for i in range(3):
        fact.filter(F.col("l_orderkey") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    mv_dir = str(tmp_path / "mv")
    stream = (
        spark.readStream.schema(fact.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_rollup(stream, mv_dir, SPEC, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _rollup_rows(read_rollup(spark, mv_dir, SPEC))
    want = _rollup_rows(finalize(partial_state(fact, SPEC), SPEC))
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k].n_rows == w.n_rows
        assert got[k].sum_l_quantity == pytest.approx(w.sum_l_quantity, rel=1e-12)

    # replaying an applied batch id must be a no-op
    some_batch = fact.limit(50)
    before = _rollup_rows(read_rollup(spark, mv_dir, SPEC))
    assert apply_batch(some_batch, 99, mv_dir, SPEC) is True
    assert apply_batch(some_batch, 99, mv_dir, SPEC) is False
    again = _rollup_rows(read_rollup(spark, mv_dir, SPEC))
    applied_once = {k: r.n_rows for k, r in again.items()}
    assert applied_once != {k: r.n_rows for k, r in before.items()}
    assert apply_batch(some_batch, 99, mv_dir, SPEC) is False
    assert {k: r.n_rows for k, r in _rollup_rows(read_rollup(spark, mv_dir, SPEC)).items()} == applied_once


def test_refresh_preserves_null_partition_state(spark, tmp_path):
    """Regression: the touched-partition predicate's `col == lit(None)`
    never matched, so null-keyed MV state was excluded from the merge
    while dynamic overwrite rewrote its partition — silently resetting
    accumulated aggregates to delta-only values."""
    spec = RollupSpec(
        keys=["part"], partition_by=["part"], measures=["v"], approx_distinct=[]
    )
    mv_dir = str(tmp_path / "mv")
    b1 = spark.createDataFrame([(None, 10.0), ("a", 1.0)], "part string, v double")
    init_rollup(spark, b1, mv_dir, spec)
    b2 = spark.createDataFrame([(None, 5.0)], "part string, v double")
    refresh_rollup(spark, b2, mv_dir, spec)
    rows = {r.part: r for r in read_rollup(spark, mv_dir, spec).collect()}
    assert rows[None].n_rows == 2  # both null-keyed facts accumulated
    assert rows[None].sum_v == 15.0
    assert rows["a"].sum_v == 1.0


def test_stream_rollup_survives_empty_first_batch(spark, tmp_path):
    """Regression: an empty batch 0 used to init an unreadable (footer-
    less) MV dir and wedge every retry in a schema-inference crash loop;
    empty batches are now applied as no-ops in either phase."""
    from deisa_ray_spark.mv import apply_batch

    spec = RollupSpec(
        keys=["part"], partition_by=["part"], measures=["v"], approx_distinct=[]
    )
    mv_dir = str(tmp_path / "mv")
    empty = spark.createDataFrame([], "part string, v double")
    assert apply_batch(empty, 0, mv_dir, spec) is True
    assert not os.path.exists(os.path.join(mv_dir, "_SUCCESS"))  # no init
    real = spark.createDataFrame([("a", 1.0)], "part string, v double")
    assert apply_batch(real, 1, mv_dir, spec) is True  # init works after
    rows = {r.part: r for r in read_rollup(spark, mv_dir, spec).collect()}
    assert rows["a"].n_rows == 1
