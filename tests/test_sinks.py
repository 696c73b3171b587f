"""Sink tests: parquet round-trip (real), VDS link plan (pure), format
writers gated on their optional libraries (reference
tests/test_saving_dask_arrays.py round-trip strategy)."""

from __future__ import annotations

import numpy as np
import pytest

from deisa_ray_spark import sinks
from deisa_ray_spark.model import explode_chunks
from deisa_ray_spark.sources.chunks import make_chunk_df


def test_parquet_chunk_roundtrip(spark, tmp_path):
    path = str(tmp_path / "chunks_pq")
    chunks = make_chunk_df(spark, timesteps=(0, 1, 2))
    sinks.write_chunks_parquet(chunks, path)
    back = spark.read.parquet(path)
    assert back.count() == chunks.count()
    # partition pruning: one (arr, t) reads only its directory
    one = back.filter((back.arr == "temperature") & (back.t == 1))
    assert one.count() == 4
    # partition pruning visible in the physical plan
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "t=1" in plan
    # decoded cells equal the original decode
    orig = explode_chunks(chunks.filter((chunks.arr == "temperature") & (chunks.t == 1)))
    got = explode_chunks(one.select(*[f.name for f in chunks.schema.fields]))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, orig.collect()))


def test_vds_plan_pure():
    entries = sinks.plan_vds((4, 6), (2, 3), [(0, 0), (0, 1), (1, 0), (1, 1)], "out.h5")
    assert [e.offsets for e in entries] == [(0, 0), (0, 3), (2, 0), (2, 3)]
    assert all(e.chunk_shape == (2, 3) for e in entries)
    assert entries[1].chunk_file == ".out.h5.chunk-0-1.h5"
    # hyperslabs tile the global shape exactly
    cover = np.zeros((4, 6), dtype=int)
    for e in entries:
        sl = tuple(slice(o, o + c) for o, c in zip(e.offsets, e.chunk_shape))
        cover[sl] += 1
    assert (cover == 1).all()


def test_hdf5_roundtrip_or_gated(spark, tmp_path):
    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    fname = str(tmp_path / "vds.h5")
    try:
        import h5py  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="h5py"):
            sinks.to_hdf5(chunks, fname, "data")
        return
    sinks.to_hdf5(chunks, fname, "data")  # pragma: no cover (env w/ h5py)
    import h5py

    with h5py.File(fname) as f:
        a = f["data"][()]
    expected = np.array([[3, 3, 6, 6], [3, 3, 6, 6], [9, 9, 12, 12], [9, 9, 12, 12]])
    np.testing.assert_array_equal(a, expected)


def test_zarr_netcdf_gated(spark, tmp_path):
    chunks = make_chunk_df(spark, timesteps=(1,)).filter("arr = 'temperature'")
    for fn, kwargs, lib in (
        (sinks.to_zarr, {"url": str(tmp_path / "z.zarr")}, "zarr"),
        (sinks.to_netcdf, {"fname": str(tmp_path / "a.nc"), "name": "temp"}, "xarray"),
    ):
        try:
            __import__(lib)
        except ImportError:
            with pytest.raises(ImportError, match=lib):
                fn(chunks, **kwargs)


def test_sink_single_group_guard(spark, tmp_path):
    """Whole-array sinks refuse a chunk table spanning >1 (arr, t) group
    (silently merging groups into one layout = last-writer-wins
    corruption). The guard runs BEFORE the optional-library import gate
    and before any file is written, so it is testable everywhere."""
    multi = make_chunk_df(spark, timesteps=(0, 1))  # ≥2 (arr, t) groups
    for fn, kwargs in (
        (sinks.to_hdf5, {"fname": str(tmp_path / "g.h5"), "dataset": "d"}),
        (sinks.to_zarr, {"url": str(tmp_path / "g.zarr")}),
    ):
        with pytest.raises(ValueError, match="exactly one"):
            fn(multi, **kwargs)
    empty = make_chunk_df(spark, timesteps=(0,)).filter("t = 99")
    with pytest.raises(ValueError, match="no chunks"):
        sinks.to_zarr(empty, str(tmp_path / "e.zarr"))


def test_csv_interchange_roundtrip(spark, tmp_path):
    """CSV as an interchange format: write → schema'd read-back is
    lossless (Spark writes Java shortest-round-trip doubles). Parquet
    stays the first-class format; CSV covers external producers."""
    from deisa_ray_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_csv")
    ev.write.option("header", True).mode("overwrite").csv(path)
    back = spark.read.option("header", True).schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).csv(path)
    a = ev.agg({"event_id": "sum", "value": "sum"}).collect()[0]
    b = back.agg({"event_id": "sum", "value": "sum"}).collect()[0]
    assert back.count() == ev.count()
    assert a[0] == b[0] and a[1] == b[1]
