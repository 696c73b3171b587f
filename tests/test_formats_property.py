"""Property-fuzz the from-spec format writers: random shapes/dtypes →
write with our writer → read with our INDEPENDENT spec-following reader
→ exact array equality. The writers' fixed-case byte-level tests pin
known layouts; this sweeps the shape/dtype space those cases sample
(the strongest in-sandbox substitute for real-library interop, which
pip cannot install here — see README formats/ note).

Each format is fuzzed within its documented scope:
- hdf5mini: fixed-point + IEEE floats, contiguous, root-group datasets
- netcdf3: classic CDF-1/2 numeric types (i1/i2/i4/f4/f8), shared dims
- zarr2: v2 store, raw C-order chunks, any-rank chunk grids
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deisa_ray_spark.formats import hdf5mini, netcdf3, zarr2

_SHAPES = st.lists(st.integers(1, 7), min_size=1, max_size=3).map(tuple)


def _array(shape: tuple[int, ...], dtype: np.dtype, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.floating):
        return rng.standard_normal(shape).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=shape, endpoint=True).astype(dtype)


@settings(max_examples=40, deadline=None)
@given(
    shape=_SHAPES,
    dtype=st.sampled_from(["int8", "int16", "int32", "int64", "float32", "float64"]),
    n_datasets=st.integers(1, 3),
    seed=st.integers(0, 2**31),
)
def test_hdf5mini_roundtrip_property(tmp_path_factory, shape, dtype, n_datasets, seed):
    tmp = tmp_path_factory.mktemp("h5")
    datasets = {
        f"ds{i}": _array(shape, np.dtype(dtype), seed + i) for i in range(n_datasets)
    }
    fname = str(tmp / "f.h5")
    hdf5mini.write(fname, datasets)
    back = hdf5mini.read(fname)
    assert sorted(back) == sorted(datasets)
    for name, arr in datasets.items():
        assert back[name].dtype == arr.dtype
        np.testing.assert_array_equal(back[name], arr)


@settings(max_examples=40, deadline=None)
@given(
    shape=_SHAPES,
    dtype=st.sampled_from(["int8", "int16", "int32", "float32", "float64"]),
    version=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31),
)
def test_netcdf3_roundtrip_property(tmp_path_factory, shape, dtype, version, seed):
    tmp = tmp_path_factory.mktemp("nc")
    arr = _array(shape, np.dtype(dtype), seed)
    dims = tuple(f"d{i}" for i in range(arr.ndim))
    # second variable SHARES the first dimension (spec: single dim list)
    arr2 = _array((shape[0],), np.dtype(dtype), seed + 1)
    fname = str(tmp / "f.nc")
    netcdf3.write(fname, {"v": (arr, dims), "w": (arr2, (dims[0],))}, version=version)
    back = netcdf3.read(fname)
    got, got_dims = back["v"]
    np.testing.assert_array_equal(got, arr)
    assert got_dims == dims
    got2, got2_dims = back["w"]
    np.testing.assert_array_equal(got2, arr2)
    assert got2_dims == (dims[0],)


@settings(max_examples=40, deadline=None)
@given(
    grid=st.lists(st.integers(1, 3), min_size=1, max_size=3).map(tuple),
    cshape=st.lists(st.integers(1, 4), min_size=1, max_size=3).map(tuple),
    dtype=st.sampled_from(["int32", "int64", "float32", "float64"]),
    drop_one=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_zarr2_roundtrip_property(tmp_path_factory, grid, cshape, dtype, drop_one, seed):
    if len(cshape) != len(grid):
        cshape = tuple((cshape * 3)[: len(grid)])
    tmp = tmp_path_factory.mktemp("z")
    path = str(tmp / "arr")
    gshape = tuple(g * c for g, c in zip(grid, cshape))
    full = _array(gshape, np.dtype(dtype), seed)
    zarr2.create_array(path, gshape, cshape, np.dtype(dtype), fill_value=0)
    positions = list(np.ndindex(*grid))
    skipped = positions[seed % len(positions)] if drop_one else None
    for pos in positions:
        if pos == skipped:
            continue  # absent key → fill_value per spec
        sl = tuple(slice(p * c, (p + 1) * c) for p, c in zip(pos, cshape))
        zarr2.write_chunk(path, pos, full[sl])
    expected = full.copy()
    if skipped is not None:
        sl = tuple(slice(p * c, (p + 1) * c) for p, c in zip(skipped, cshape))
        expected[sl] = 0
    back = zarr2.read_array(path)
    assert back.dtype == full.dtype
    np.testing.assert_array_equal(back, expected)


def test_real_libraries_pick_up_when_installed(tmp_path):
    """Dual-mode hook: when h5py/zarr exist (any environment with the
    libraries), the SAME fuzz artifacts must be readable by them. In
    this sandbox the imports fail and the test records a skip — the
    in-repo independent readers above remain the contract."""
    try:
        import h5py  # noqa: F401
    except ImportError:
        pytest.skip("h5py not installed in this environment (pip has no network)")
    arr = np.arange(12, dtype=np.int64).reshape(3, 4)
    fname = str(tmp_path / "x.h5")
    hdf5mini.write(fname, {"a": arr})
    with h5py.File(fname, "r") as f:  # pragma: no cover
        np.testing.assert_array_equal(f["a"][...], arr)
