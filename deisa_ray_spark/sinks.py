"""Science sinks: Parquet (first-class), HDF5 virtual-dataset, Zarr,
NetCDF-via-xarray (reference A19-A21, types.py:271-502).

The reference writes each chunk to a hidden per-chunk ``.h5`` file and
links them into one virtual dataset (``types.py:339-502``, fillvalue −1);
``to_zarr`` persists then delegates to ``dask.array.to_zarr``
(``types.py:271-316``); NetCDF goes through xarray (docs pattern, A21).

Spark shape: the chunk table IS the partitioned layout — each executor
writes its chunks independently (``foreachPartition``-style via
``mapInPandas`` returning write receipts), and only the tiny link/metadata
step runs on the driver. The VDS *link plan* (chunk file → hyperslab
mapping) is a pure function so the orchestration is testable without
h5py; the format writers are import-gated (h5py / zarr / xarray are
optional in this environment).

Scale notes (100 TB): per-chunk files parallelize writes across the
cluster with no shuffle (chunks are already partitioned); the driver-side
link step is O(#chunks) metadata only. Parquet partitioned by (arr, t)
remains the engine's native interchange — partition pruning gives
timestep-selective reads.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HDF5_FILLVALUE = -1  #: reference types.py:466 (VirtualLayout fillvalue=-1)


def write_chunks_parquet(chunks: DataFrame, path: str) -> None:
    """First-class sink: chunk table partitioned by (arr, t) — reads of
    one (array, timestep) later prune to exactly its files."""
    chunks.write.partitionBy("arr", "t").mode("overwrite").parquet(path)


def write_cells_parquet(cells: DataFrame, path: str) -> None:
    """Long-form cells partitioned by (arr, t)."""
    cells.write.partitionBy("arr", "t").mode("overwrite").parquet(path)


def _single_group_meta(chunks: DataFrame) -> tuple[str, int, tuple[int, ...], tuple[int, ...], str]:
    """Validate that the chunk table holds exactly one (arr, t) group and
    return its layout metadata. Every whole-array sink (HDF5 VDS, zarr
    store, NetCDF file) targets ONE assembled array; silently merging
    chunks of different arrays/timesteps into one layout would corrupt it
    (last-writer-wins per grid slot). Column-pruned metadata-only job —
    the binary payload column is never read."""
    groups = (
        chunks.groupBy("arr", "t")
        .agg(
            F.first("global_shape").alias("global_shape"),
            F.first("chunk_shape").alias("chunk_shape"),
            F.first("dtype").alias("dtype"),
        )
        .collect()
    )
    if not groups:
        raise ValueError("no chunks to write")
    if len(groups) != 1:
        keys = sorted((r["arr"], r["t"]) for r in groups)
        raise ValueError(
            f"sink expects exactly one (arr, t) group, got {len(groups)}: {keys}; "
            "filter the chunk table (e.g. chunks.filter((chunks.arr == name) & "
            "(chunks.t == ts))) or write one sink per group"
        )
    g = groups[0]
    return (
        g["arr"],
        int(g["t"]),
        tuple(int(x) for x in g["global_shape"]),
        tuple(int(x) for x in g["chunk_shape"]),
        g["dtype"],
    )


# -- HDF5 virtual dataset --------------------------------------------------


@dataclass(frozen=True)
class VdsEntry:
    """One chunk's slot in the virtual layout (reference types.py:430-470:
    VirtualSource per chunk file mapped at its grid offset)."""

    chunk_file: str
    offsets: tuple[int, ...]  # element offsets = pos * chunk_shape
    chunk_shape: tuple[int, ...]


def plan_vds(
    global_shape: tuple[int, ...],
    chunk_shape: tuple[int, ...],
    positions: list[tuple[int, ...]],
    basename: str,
) -> list[VdsEntry]:
    """Pure link plan: per-chunk hidden filenames + hyperslab offsets
    (reference naming: hidden per-chunk files next to the target,
    types.py:379-398). Deterministic and fully testable without h5py."""
    entries = []
    for pos in positions:
        fname = f".{basename}.chunk-" + "-".join(str(p) for p in pos) + ".h5"
        offsets = tuple(int(p) * int(c) for p, c in zip(pos, chunk_shape))
        entries.append(VdsEntry(fname, offsets, tuple(int(c) for c in chunk_shape)))
    return entries


def to_hdf5(chunks: DataFrame, fname: str, dataset: str) -> None:
    """A19: distributed per-chunk writes + driver-side VDS link.

    Each partition writes its chunks as hidden ``.h5`` files (parallel,
    no shuffle); the driver then creates ``fname`` with a virtual layout
    mapping every chunk file at its grid offset, fillvalue −1
    (reference types.py:339-502).

    The chunk table must hold exactly one (arr, t) group — validated up
    front (metadata-only job, before any file is written). Hidden chunk
    filenames are additionally scoped by ``arr``/``t`` so two sinks of
    different groups into the same directory can never clobber each
    other's chunk files.
    """
    arr_name, t, gshape_v, cshape_v, dtype_s = _single_group_meta(chunks)
    try:
        import h5py  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without h5py
        raise ImportError(
            "to_hdf5 requires h5py (not installed in this environment); "
            "the link plan is available via plan_vds()"
        ) from exc

    out_dir = os.path.dirname(os.path.abspath(os.path.expanduser(fname))) or "."
    base = os.path.basename(fname)
    scoped_base = f"{base}.{arr_name}-{t}"

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import h5py

        receipts = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                cshape = tuple(row.chunk_shape)
                a = np.frombuffer(row.data, dtype=np.dtype(row.dtype)).reshape(cshape)
                entry = plan_vds(
                    tuple(row.global_shape), cshape, [tuple(row.pos)], scoped_base
                )[0]
                cpath = os.path.join(out_dir, entry.chunk_file)
                with h5py.File(cpath, "w") as f:
                    f.create_dataset(dataset, data=a)
                receipts.append({"pos": list(row.pos), "chunk_file": entry.chunk_file})
        yield pd.DataFrame(receipts, columns=["pos", "chunk_file"])

    receipts = chunks.mapInPandas(
        write_partition, schema="pos array<int>, chunk_file string"
    ).collect()

    import h5py

    layout = h5py.VirtualLayout(shape=gshape_v, dtype=np.dtype(dtype_s))
    for r in receipts:
        offs = tuple(p * c for p, c in zip(r["pos"], cshape_v))
        src = h5py.VirtualSource(
            os.path.join(out_dir, r["chunk_file"]), dataset, shape=cshape_v
        )
        sl = tuple(slice(o, o + c) for o, c in zip(offs, cshape_v))
        layout[sl] = src
    with h5py.File(os.path.expanduser(fname), "w") as f:
        f.create_virtual_dataset(dataset, layout, fillvalue=HDF5_FILLVALUE)


# -- Zarr ------------------------------------------------------------------


def to_zarr(chunks: DataFrame, url: str, component: str | None = None) -> None:
    """A20: chunk-position-keyed zarr writes (reference types.py:271-316
    resolves the path, persists, then writes per chunk).

    Driver creates the store/dataset (tiny metadata: shape, chunks,
    dtype — taken from a metadata-only job that also validates the
    single-(arr, t)-group contract). Executors then write their chunks
    independently via ``mapInPandas``: every write is chunk-aligned
    (the zarr chunk grid IS the engine's chunk grid), so each executor
    touches disjoint storage keys and no coordination is needed. Binary
    payloads never reach the driver — at 100 TB the driver job is
    O(#groups) metadata, not O(bytes)."""
    arr_name, t, gshape, cshape, dtype_s = _single_group_meta(chunks)
    try:
        import zarr  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without zarr
        raise ImportError("to_zarr requires zarr (not installed in this environment)") from exc

    dtype = np.dtype(dtype_s)
    path = os.path.abspath(os.path.expanduser(url))
    if component:
        root = zarr.open(path, mode="a")
        root.require_dataset(component, shape=gshape, chunks=cshape, dtype=dtype)
    else:
        zarr.open(path, mode="a", shape=gshape, chunks=cshape, dtype=dtype)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zarr

        z = zarr.open(path, mode="r+")
        if component:
            z = z[component]
        receipts = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                a = np.frombuffer(row.data, dtype=dtype).reshape(cshape)
                sl = tuple(
                    slice(p * c, (p + 1) * c) for p, c in zip(row.pos, cshape)
                )
                z[sl] = a
                receipts.append({"pos": list(row.pos)})
        yield pd.DataFrame(receipts, columns=["pos"])

    n_written = chunks.mapInPandas(write_partition, schema="pos array<int>").count()
    expected = 1
    for g, c in zip(gshape, cshape):
        expected *= g // c
    if n_written != expected:
        raise ValueError(
            f"zarr write incomplete for ({arr_name}, {t}): "
            f"{n_written}/{expected} chunks written"
        )


# -- NetCDF via xarray -----------------------------------------------------


def to_netcdf(chunks: DataFrame, fname: str, name: str, dims: tuple[str, ...] = ("x", "y")) -> None:
    """A21: assemble (bounded) → xarray.DataArray → to_netcdf (reference
    docs/source/analytics.rst 'Saving Xarray to NetCDF')."""
    try:
        import xarray as xr
    except ImportError as exc:  # pragma: no cover - env without xarray
        raise ImportError("to_netcdf requires xarray (not installed in this environment)") from exc

    from deisa_ray_spark.operators.linalg import assemble_dense

    dense = assemble_dense(chunks).collect()
    if len(dense) != 1:
        raise ValueError(f"to_netcdf expects exactly one (arr, t) group, got {len(dense)}")
    row = dense[0]
    a = np.frombuffer(row["data"], dtype=np.float64).reshape(tuple(row["shape"]))
    xr.DataArray(a, dims=dims, name=name).to_netcdf(os.path.expanduser(fname))
