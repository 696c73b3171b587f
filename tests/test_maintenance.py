"""Small-file compaction: many-file ingest output → few large sorted
files, content-preserving, with disjoint per-file key ranges (the
min/max-pruning property range sorting buys)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from deisa_ray_spark.maintenance import _parquet_files, compact_parquet
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_compaction_preserves_content_and_sorts(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(40).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 40

    rep = compact_parquet(
        spark, src, dst, sort_by=["event_id"], target_file_bytes=64 * 1024
    )
    assert rep.n_files_before == 40
    assert rep.n_files_after < 40
    assert rep.n_rows == ev.count()

    back = spark.read.parquet(dst)
    a = back.agg({"event_id": "sum", "value": "sum"}).collect()[0]
    b = ev.agg({"event_id": "sum", "value": "sum"}).collect()[0]
    assert a[0] == b[0]  # integral: exact
    assert a[1] == pytest.approx(b[1], rel=1e-9)  # doubles: order-dependent

    # range sort ⇒ per-file event_id ranges are pairwise disjoint
    # (what gives min/max statistics pruning on the sort key)
    ranges = []
    for f in _parquet_files(dst):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    """Z-order clustering gives per-file min/max locality on BOTH keys;
    a single-key sort leaves the second key's per-file range ~ the whole
    domain (no skipping possible on it)."""
    import glob

    from deisa_ray_spark.maintenance import zorder_parquet
    from tests.conftest import SF_DIR

    src = f"{SF_DIR}/lineitem.parquet"
    flat = str(tmp_path / "flat")
    spark.read.parquet(src).write.parquet(flat)

    def mean_frac(path, col):
        import pyarrow.parquet as pq

        files = [f for f in glob.glob(f"{path}/*.parquet")]
        spans, lo_g, hi_g = [], None, None
        per_file = []
        for f in files:
            t = pq.read_table(f, columns=[col])[col].to_pylist()
            per_file.append((min(t), max(t)))
        lo_g = min(lo for lo, _ in per_file)
        hi_g = max(hi for _, hi in per_file)
        return sum((hi - lo) / (hi_g - lo_g) for lo, hi in per_file) / len(per_file)

    # baseline: single-key range sort on l_partkey
    naive = str(tmp_path / "naive")
    (
        spark.read.parquet(flat)
        .repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(naive)
    )
    zdir = str(tmp_path / "z")
    report = zorder_parquet(
        spark, flat, zdir, ["l_partkey", "l_suppkey"], n_files=8
    )
    assert report.n_rows == spark.read.parquet(src).count()
    assert report.n_files_after >= 8

    naive_second = mean_frac(naive, "l_suppkey")
    z_first = mean_frac(zdir, "l_partkey")
    z_second = mean_frac(zdir, "l_suppkey")
    # single-key sort cannot skip on the second key at all
    assert naive_second > 0.9
    # z-order keeps BOTH dimensions skippable
    assert z_first < 0.8 and z_second < 0.8, (z_first, z_second)
    assert z_second < naive_second


def test_upsert_rewrites_only_affected_partitions(spark, tmp_path):
    """MERGE-by-key into a hive-partitioned table: updated keys replaced,
    new keys inserted, and partitions outside the batch keep their exact
    files (same inodes) — cost scales with the batch, not the table."""
    import os

    from pyspark.sql import functions as F

    from deisa_ray_spark.maintenance import upsert_parquet
    from tests.conftest import SF_DIR
    from deisa_ray_spark.sources.registry import load_table

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    table = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(table)
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    target_day, other_day = days[0], days[-1]

    def inodes(day):
        d = f"{table}/day={day}"
        return {f: os.stat(os.path.join(d, f)).st_ino for f in os.listdir(d)
                if f.endswith(".parquet")}

    before_other = inodes(other_day)
    orig = spark.read.parquet(table)
    orig_count = orig.count()
    victim = orig.filter(F.col("day") == target_day).limit(2).localCheckpoint()
    changed = victim.withColumn("value", F.lit(-1.0))
    updates = changed.unionByName(
        changed.withColumn("event_id", F.col("event_id") + 10_000_000)
    )

    report = upsert_parquet(
        spark, table, updates, keys=["event_id"], partition_by=["day"]
    )
    assert report.n_partitions_rewritten == 1
    assert report.n_updated == 2 and report.n_inserted == 2

    after = spark.read.parquet(table)
    assert after.count() == orig_count + 2
    got = after.filter(F.col("day") == target_day).filter(F.col("value") == -1.0)
    assert got.count() == 4  # 2 replaced + 2 inserted rows carry value=-1
    # untouched partition: identical files, identical inodes
    assert inodes(other_day) == before_other


def test_upsert_preserves_null_partition_rows(spark, tmp_path):
    """Regression: `col == lit(None)` is NULL (never true), so existing
    rows in the null partition were excluded from the merge while
    dynamic overwrite still rewrote that partition — silently deleting
    them. eqNullSafe keeps them."""
    from deisa_ray_spark.maintenance import upsert_parquet

    table_dir = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 30.0)],
        "k int, part string, v double",
    )
    base.write.partitionBy("part").parquet(table_dir)
    updates = spark.createDataFrame([(2, None, 99.0)], "k int, part string, v double")
    upsert_parquet(spark, table_dir, updates, keys=["k"], partition_by=["part"])
    got = {
        r.k: r.v for r in spark.read.parquet(table_dir).collect()
    }
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}  # row k=1 survived the merge


def test_zorder_rejects_empty_and_too_many_bits(spark, tmp_path):
    from deisa_ray_spark.maintenance import zorder_parquet

    src = str(tmp_path / "src")
    spark.createDataFrame([], "a bigint, b bigint").write.parquet(src)
    with pytest.raises(ValueError, match="empty input or all-NULL"):
        zorder_parquet(spark, src, str(tmp_path / "d1"), cols=["a", "b"])
    src2 = str(tmp_path / "src2")
    spark.range(10).selectExpr("id AS a", "id AS b").write.parquet(src2)
    with pytest.raises(ValueError, match="64-bit"):
        zorder_parquet(spark, src2, str(tmp_path / "d2"),
                       cols=["a", "b"], bits=40)


def test_partition_table_files_per_partition_fans_out(spark, tmp_path):
    """Regression: repartition(n, *key) hashed on the key alone, so the
    knob could never produce more than one file per partition."""
    import glob

    from deisa_ray_spark.maintenance import partition_table

    src = str(tmp_path / "src")
    spark.range(10_000).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS part"
    ).write.parquet(src)
    dst = str(tmp_path / "dst")
    partition_table(spark, src, dst, ["part"], files_per_partition=4)
    for part in ("0", "1"):
        files = glob.glob(f"{dst}/part={part}/*.parquet")
        assert len(files) >= 2, f"partition {part}: {len(files)} file(s)"


def test_stage_split_tables_schema_preserving(spark, tmp_path, monkeypatch):
    """Bench split staging: >=8 files per table, schema (incl. events'
    TIMESTAMP(NANOS) physical type) preserved, rows identical, cached by
    fingerprint."""
    import glob
    import os

    import pyarrow.parquet as pq

    from deisa_ray_spark import paths
    from deisa_ray_spark.maintenance import stage_split_tables

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv(paths.ENV_VAR, str(tmp_path / "scratch"))
    out = stage_split_tables(sf_dir, tables=["lineitem", "events"])
    for name in ("lineitem", "events"):
        parts = glob.glob(os.path.join(out, f"{name}.parquet", "*.parquet"))
        src = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        assert len(parts) == min(8, src.num_rows)
        assert pq.read_schema(parts[0]).equals(src.schema)
        got = pq.ParquetDataset(os.path.join(out, f"{name}.parquet")).read()
        assert got.num_rows == src.num_rows
    # second call is a cache hit (same dir back, no rebuild marker churn)
    marker = os.path.getmtime(os.path.join(out, "_STAGED_OK"))
    assert stage_split_tables(sf_dir, tables=["lineitem", "events"]) == out
    assert os.path.getmtime(os.path.join(out, "_STAGED_OK")) == marker
    # the engine loader reads the staged layout under its schema contract
    from deisa_ray_spark.sources.registry import load_table

    n_src = pq.read_table(os.path.join(sf_dir, "lineitem.parquet")).num_rows
    assert load_table(spark, out, "lineitem").count() == n_src
