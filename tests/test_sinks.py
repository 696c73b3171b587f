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


EXPECTED_T3 = np.array(
    [[3, 3, 6, 6], [3, 3, 6, 6], [9, 9, 12, 12], [9, 9, 12, 12]], dtype=np.float64
)


def test_hdf5_vds_roundtrip(spark, tmp_path):
    """A19 e2e (reference tests/test_saving_dask_arrays.py:141-212):
    distributed chunk writes + VDS link → re-read → exact array. Runs
    with h5py when installed and through the pure-Python classic-format
    path otherwise — the written chunk files are real HDF5 either way."""
    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    fname = str(tmp_path / "vds.h5")
    sinks.to_hdf5(chunks, fname, "data")
    np.testing.assert_array_equal(sinks.read_vds(fname, "data"), EXPECTED_T3)


def test_hdf5_chunk_files_byte_level(spark, tmp_path):
    """Byte-level verification beyond the link plan (VERDICT r2 gap #1):
    every hidden chunk file parses as spec-conformant HDF5 classic
    (superblock v0 → B-tree → SNOD → contiguous dataset) and holds
    exactly its grid block's values."""
    import glob

    from deisa_ray_spark.formats import hdf5mini

    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    fname = str(tmp_path / "vds.h5")
    sinks.to_hdf5(chunks, fname, "data")
    chunk_files = sorted(glob.glob(str(tmp_path / ".vds.h5.*.chunk-*.h5")))
    assert len(chunk_files) == 4
    for cf in chunk_files:
        with open(cf, "rb") as f:
            assert f.read(8) == b"\x89HDF\r\n\x1a\n"  # HDF5 magic
        i, j = (int(x) for x in cf.rsplit("chunk-", 1)[1][:-3].split("-"))
        block = hdf5mini.read(cf)["data"]
        np.testing.assert_array_equal(block, EXPECTED_T3[2 * i : 2 * i + 2, 2 * j : 2 * j + 2])


def test_hdf5_vds_fillvalue_for_missing_chunk(spark, tmp_path):
    """Unmapped layout slots read as fillvalue −1 (reference
    types.py:466: VirtualLayout fillvalue=-1)."""
    chunks = make_chunk_df(spark, timesteps=(3,)).filter(
        "arr = 'temperature' AND NOT (pos[0] = 0 AND pos[1] = 0)"
    )
    fname = str(tmp_path / "vds_partial.h5")
    sinks.to_hdf5(chunks, fname, "data")
    got = sinks.read_vds(fname, "data")
    expected = EXPECTED_T3.copy()
    expected[0:2, 0:2] = sinks.HDF5_FILLVALUE
    np.testing.assert_array_equal(got, expected)


def test_hdf5_multi_dataset_one_file(spark, tmp_path, monkeypatch):
    """Dict form — reference to_hdf5(fname, {dataset: arr})
    (types.py:318-336): several arrays into ONE file, each its own
    virtual dataset. Also exercises '~' expansion (reference round-trip
    tests write to a home-relative path)."""
    monkeypatch.setenv("HOME", str(tmp_path))
    base = make_chunk_df(spark, timesteps=(2, 3))
    groups = {
        "temp3": base.filter("arr = 'temperature' AND t = 3"),
        "press2": base.filter("arr = 'pressure' AND t = 2"),
    }
    fname = "~/multi.h5"
    sinks.to_hdf5_multi(groups, fname)
    np.testing.assert_array_equal(sinks.read_vds(fname, "temp3"), EXPECTED_T3)
    press2 = sinks.read_vds(fname, "press2")
    assert press2.shape == EXPECTED_T3.shape
    # pressure chunks follow the same (r+1)*t pattern
    np.testing.assert_array_equal(press2, EXPECTED_T3 / 3 * 2)


def test_zarr_roundtrip(spark, tmp_path):
    """A20 e2e: executor-side chunk-aligned writes into a zarr v2 store
    → re-read → exact array. The store layout is the public v2 spec
    (.zarray + raw chunk keys) whether written by the zarr library or
    the pure-Python fallback."""
    import json

    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    url = str(tmp_path / "z.zarr")
    sinks.to_zarr(chunks, url)
    np.testing.assert_array_equal(sinks.read_zarr(url), EXPECTED_T3)
    # store layout is spec-conformant: .zarray metadata + one file per
    # chunk-grid key
    with open(tmp_path / "z.zarr" / ".zarray") as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [4, 4] and meta["chunks"] == [2, 2]
    for key in ("0.0", "0.1", "1.0", "1.1"):
        assert (tmp_path / "z.zarr" / key).exists()

    # component form nests the array under the store root
    sinks.to_zarr(chunks, url + "_c", component="temperature")
    np.testing.assert_array_equal(
        sinks.read_zarr(url + "_c", component="temperature"), EXPECTED_T3
    )


def test_netcdf_roundtrip(spark, tmp_path):
    """A21 e2e: assemble → NetCDF classic file → re-read → exact array.
    The file is CDF-2 per the public spec; xarray/netcdf-c read it
    unchanged."""
    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    fname = str(tmp_path / "a.nc")
    sinks.to_netcdf(chunks, fname, "temp", dims=("x", "y"))
    np.testing.assert_array_equal(sinks.read_netcdf(fname, "temp"), EXPECTED_T3)
    with open(fname, "rb") as f:
        assert f.read(3) == b"CDF"  # classic magic


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


def test_jsonl_documents_roundtrip(spark, tmp_path):
    """JSONL corpus interchange (the standard LLM-corpus format): write
    the documents table as JSONL, read it back through the
    explicit-schema loader, get identical rows — and corrupt lines drop
    instead of poisoning the batch."""
    from deisa_ray_spark.sources.registry import load_documents_jsonl, load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(path)

    back = load_documents_jsonl(spark, path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = docs.agg({"doc_id": "sum", "n_chars": "sum"}).collect()[0]
    b = back.agg({"doc_id": "sum", "n_chars": "sum"}).collect()[0]
    assert (a[0], a[1]) == (b[0], b[1])

    # corrupt line: dropped, not schema-poisoning
    with open(tmp_path / "docs_jsonl" / "zz_corrupt.json", "w") as f:
        f.write('{"this is not valid json\n{"also_missing": "doc_id"}\n')
    again = load_documents_jsonl(spark, path)
    assert again.count() == docs.count()


def test_netcdf3_char_variable_roundtrip(tmp_path):
    """NC_CHAR (S1) variables write and read back — the classic format's
    string representation."""
    from deisa_ray_spark.formats import netcdf3

    labels = np.array([[b"a", b"b"], [b"c", b"d"]], dtype="S1")
    p = str(tmp_path / "chars.nc")
    netcdf3.write(p, {"labels": (labels, ("row", "col"))})
    back, dims = netcdf3.read(p)["labels"]
    np.testing.assert_array_equal(back, labels)
    assert dims == ("row", "col")


def test_zarr_append_mode_two_timesteps_one_store(spark, tmp_path):
    """Reference to_zarr defaults to mode='a' (types.py:271-316): writing
    t=3 then t=4 as components of ONE store must leave both readable and
    the store a valid v2 hierarchy."""
    base = make_chunk_df(spark, timesteps=(3, 4)).filter("arr = 'temperature'")
    url = str(tmp_path / "run.zarr")
    sinks.to_zarr(base.filter("t = 3"), url, component="t3", mode="a")
    sinks.to_zarr(base.filter("t = 4"), url, component="t4", mode="a")
    np.testing.assert_array_equal(sinks.read_zarr(url, component="t3"), EXPECTED_T3)
    np.testing.assert_array_equal(
        sinks.read_zarr(url, component="t4"), EXPECTED_T3 / 3 * 4
    )
    import json

    with open(tmp_path / "run.zarr" / ".zgroup") as f:
        assert json.load(f)["zarr_format"] == 2


def test_zarr_append_same_array_overwrites_own_slots_only(spark, tmp_path):
    """Appending into an existing compatible array overwrites only the
    incoming chunks' grid slots."""
    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    url = str(tmp_path / "a.zarr")
    sinks.to_zarr(chunks, url, mode="w")
    # re-write only the bridge-0 chunk (pos [0,0]) with t=4's values
    redo = make_chunk_df(spark, timesteps=(4,)).filter(
        "arr = 'temperature' AND bridge_id = 0"
    )
    with pytest.raises(ValueError, match="incomplete"):
        # partial grids are an incomplete WRITE in 'w' mode...
        sinks.to_zarr(redo, url, mode="w")
    # ...and the FAILED 'w' write is non-destructive: staged keys are
    # discarded and the previous array is still fully readable
    np.testing.assert_array_equal(sinks.read_zarr(url), EXPECTED_T3)
    import os

    assert not any(".wtmp-" in f for f in os.listdir(url))
    # a partial append is fine in spirit via direct chunk writes; here
    # we append the full compatible grid and verify overwrite
    t4 = make_chunk_df(spark, timesteps=(4,)).filter("arr = 'temperature'")
    sinks.to_zarr(t4, url, mode="a")
    np.testing.assert_array_equal(sinks.read_zarr(url), EXPECTED_T3 / 3 * 4)


def test_zarr_append_incompatible_metadata_rejected(spark, tmp_path):
    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    url = str(tmp_path / "b.zarr")
    sinks.to_zarr(chunks, url, mode="w")
    bigger = make_chunk_df(
        spark, global_shape=(8, 8), chunk_shape=(4, 4), timesteps=(3,)
    ).filter("arr = 'temperature'")
    with pytest.raises(ValueError, match="incompatible"):
        sinks.to_zarr(bigger, url, mode="a")
    with pytest.raises(ValueError, match="mode"):
        sinks.to_zarr(chunks, url, mode="r")


def test_zarr_write_mode_clears_stale_chunks(spark, tmp_path):
    """'w' onto an existing store with a DIFFERENT grid must not leave
    old chunk keys that the new grid would misread."""
    url = str(tmp_path / "c.zarr")
    big = make_chunk_df(
        spark, global_shape=(8, 8), chunk_shape=(2, 2), timesteps=(3,)
    ).filter("arr = 'temperature'")
    sinks.to_zarr(big, url, mode="w")
    small = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    sinks.to_zarr(small, url, mode="w")
    import os

    keys = [f for f in os.listdir(url) if f[0].isdigit()]
    assert sorted(keys) == ["0.0", "0.1", "1.0", "1.1"]
    np.testing.assert_array_equal(sinks.read_zarr(url), EXPECTED_T3)


def test_hdf5_fallback_writes_real_named_file(spark, tmp_path):
    """ADVICE r3: without h5py the promised `fname` must still exist as
    a REAL assembled HDF5 file (not only hidden chunk files + manifest),
    parseable by the independent classic reader."""
    import os

    from deisa_ray_spark.formats import hdf5mini

    chunks = make_chunk_df(spark, timesteps=(3,)).filter("arr = 'temperature'")
    fname = str(tmp_path / "real.h5")
    sinks.to_hdf5(chunks, fname, "data")
    assert os.path.exists(fname)
    try:
        import h5py  # noqa: F401
    except ImportError:
        # fallback path: fname is a real classic-format file
        np.testing.assert_array_equal(hdf5mini.read(fname)["data"], EXPECTED_T3)
    np.testing.assert_array_equal(sinks.read_vds(fname, "data"), EXPECTED_T3)


def test_zarr_region_write_timestep_slabs(spark, tmp_path):
    """Reference to_zarr(region=...) pass-through: preallocate a
    (T, 4, 4) array, region-write each timestep's (1, 4, 4) slab into
    its slot — the append-timesteps-along-an-axis idiom. Every slab
    lands at the right offset and untouched slots read as fill."""
    from deisa_ray_spark.formats import zarr2

    url = str(tmp_path / "slabs.zarr")
    zarr2.create_array(url, (3, 4, 4), (1, 2, 2), np.dtype("int64"))
    base = make_chunk_df(
        spark, global_shape=(1, 4, 4), chunk_shape=(1, 2, 2), timesteps=(0, 1, 2)
    ).filter("arr = 'temperature'")
    for t in (0, 1, 2):
        sinks.to_zarr(
            base.filter(f"t = {t}"),
            url,
            mode="a",
            region=(slice(t, t + 1), slice(0, 4), slice(0, 4)),
        )
    out = sinks.read_zarr(url)
    assert out.shape == (3, 4, 4)
    # F1 generator: chunk at grid pos p (row-major id b) holds t*(b+1)
    for t in (0, 1, 2):
        expect = np.zeros((4, 4), dtype=np.int64)
        for b, (py, px) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            expect[py * 2 : py * 2 + 2, px * 2 : px * 2 + 2] = t * (b + 1)
        np.testing.assert_array_equal(out[t], expect)


def test_zarr_region_write_validation(spark, tmp_path):
    from deisa_ray_spark.formats import zarr2

    url = str(tmp_path / "v.zarr")
    # axis-1 extent 6 so a misaligned-but-in-bounds region exists
    zarr2.create_array(url, (3, 6, 4), (1, 2, 2), np.dtype("int64"))
    slab = make_chunk_df(
        spark, global_shape=(1, 4, 4), chunk_shape=(1, 2, 2), timesteps=(0,)
    ).filter("arr = 'temperature'")
    with pytest.raises(ValueError, match="chunk-aligned"):
        sinks.to_zarr(slab, url, mode="a",
                      region=(slice(0, 1), slice(1, 5), slice(0, 4)))
    with pytest.raises(ValueError, match="extents"):
        sinks.to_zarr(slab, url, mode="a",
                      region=(slice(0, 2), slice(0, 4), slice(0, 4)))
    with pytest.raises(ValueError, match="existing target"):
        sinks.to_zarr(slab, str(tmp_path / "absent.zarr"), mode="a",
                      region=(slice(0, 1), slice(0, 4), slice(0, 4)))


def test_arrayframe_sink_methods_inside_callback(spark, tmp_path):
    """The reference saves from inside analytics callbacks via methods on
    the array handle (DeisaArray.to_zarr/.to_hdf5, types.py:271-336);
    ArrayFrame carries the same verbs. Exercised through a real engine
    run: the callback saves each timestep into one zarr store and the
    final timestep to HDF5."""
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    chunk_dir = str(tmp_path / "chunks")
    for r in range(4):
        b = SparkBridge(
            r, metadata_for_grid(("temperature",), (4, 4), (2, 2), (r // 2, r % 2)),
            chunk_dir,
        )
        for t in range(3):
            b.send("temperature", t * (r + 1) * np.ones((2, 2), dtype=np.int64), t)
    SparkBridge(0, metadata_for_grid(("temperature",), (4, 4), (2, 2), (0, 0)),
                chunk_dir).close(2)

    store = str(tmp_path / "cb.zarr")
    h5 = str(tmp_path / "cb.h5")

    def cb(temperature):
        af = temperature[-1]
        af.to_zarr(store, component=f"t{af.t}")
        if af.t == 2:
            af.to_hdf5(h5, "data")

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature"))
    engine.run(checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=None)

    for t in range(3):
        got = sinks.read_zarr(store, component=f"t{t}")
        expect = np.zeros((4, 4), dtype=np.int64)
        for b_, (py, px) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            expect[py * 2 : py * 2 + 2, px * 2 : px * 2 + 2] = t * (b_ + 1)
        np.testing.assert_array_equal(got, expect)
    np.testing.assert_array_equal(sinks.read_vds(h5, "data"), EXPECTED_T3 / 3 * 2)


def test_zarr_region_out_of_bounds_rejected(spark, tmp_path):
    """A region outside the target's declared shape must be rejected:
    out-of-grid keys are invisible to every reader, so the write would
    'succeed' and the data silently vanish."""
    from deisa_ray_spark.formats import zarr2

    url = str(tmp_path / "oob.zarr")
    zarr2.create_array(url, (3, 4, 4), (1, 2, 2), np.dtype("int64"))
    slab = make_chunk_df(
        spark, global_shape=(1, 4, 4), chunk_shape=(1, 2, 2), timesteps=(0,)
    ).filter("arr = 'temperature'")
    with pytest.raises(ValueError, match="outside the target"):
        sinks.to_zarr(slab, url, mode="a",
                      region=(slice(3, 4), slice(0, 4), slice(0, 4)))
    with pytest.raises(ValueError, match="outside the target"):
        sinks.to_zarr(slab, url, mode="a",
                      region=(slice(-1, 0), slice(0, 4), slice(0, 4)))


def test_zarr_and_hdf5_sinks_are_rank_agnostic(spark, tmp_path):
    """A20/A19 beyond the 2-D fixtures: a 3-D chunk grid round-trips
    through both the zarr store (rank-agnostic keys, proven per-format
    by the property fuzzers) AND the HDF5 VDS path — the sinks map
    (pos, chunk_shape) vectors without any rank assumption."""
    from deisa_ray_spark.sources.chunks import make_chunk_df

    chunks = make_chunk_df(
        spark,
        arrays=("field3d",),
        global_shape=(4, 4, 2),
        chunk_shape=(2, 2, 2),
        timesteps=(3,),
    )
    # golden values: rank r (row-major over the 2x2x1 grid) holds
    # 3*(r+1) everywhere
    expected = np.zeros((4, 4, 2), dtype=np.int64)
    for r, pos in enumerate(np.ndindex(2, 2, 1)):
        sl = tuple(slice(p * c, (p + 1) * c) for p, c in zip(pos, (2, 2, 2)))
        expected[sl] = 3 * (r + 1)

    url = str(tmp_path / "z3.zarr")
    sinks.to_zarr(chunks, url)
    np.testing.assert_array_equal(sinks.read_zarr(url), expected)

    h5 = str(tmp_path / "f3.h5")
    sinks.to_hdf5(chunks, h5, "field3d")
    np.testing.assert_array_equal(sinks.read_vds(h5, "field3d"), expected)

    nc = str(tmp_path / "f3.nc")
    sinks.to_netcdf(chunks, nc, "field3d", dims=("x", "y", "z"))
    np.testing.assert_array_equal(
        sinks.read_netcdf(nc, "field3d"), expected.astype(np.float64)
    )


def test_docs_jsonl_shards_are_docid_ranges(spark, tmp_path):
    """The delivery sink's shard files are contiguous doc_id ranges in
    lexicographic file order (the epoch-shard contract) and round-trip
    losslessly."""
    import glob
    import json

    from deisa_ray_spark.sinks import write_docs_jsonl
    from deisa_ray_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "jsonl")
    write_docs_jsonl(docs, out, n_shards=4)
    files = sorted(glob.glob(f"{out}/part-*"))
    assert len(files) == 4
    prev_max = -1
    total = 0
    for f in files:
        ids = [json.loads(l)["doc_id"] for l in open(f) if l.strip()]
        total += len(ids)
        assert min(ids) > prev_max  # contiguous, strictly increasing ranges
        prev_max = max(ids)
    assert total == docs.count()
