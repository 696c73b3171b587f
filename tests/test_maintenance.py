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
