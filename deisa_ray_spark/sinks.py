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

HDF5_FILLVALUE = -1  #: reference types.py:466 (VirtualLayout fillvalue=-1)


def write_chunks_parquet(chunks: DataFrame, path: str) -> None:
    """First-class sink: chunk table partitioned by (arr, t) — reads of
    one (array, timestep) later prune to exactly its files."""
    chunks.write.partitionBy("arr", "t").mode("overwrite").parquet(path)


def write_cells_parquet(cells: DataFrame, path: str) -> None:
    """Long-form cells partitioned by (arr, t)."""
    cells.write.partitionBy("arr", "t").mode("overwrite").parquet(path)


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
    """
    try:
        import h5py  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without h5py
        raise ImportError(
            "to_hdf5 requires h5py (not installed in this environment); "
            "the link plan is available via plan_vds()"
        ) from exc

    out_dir = os.path.dirname(os.path.abspath(os.path.expanduser(fname))) or "."
    base = os.path.basename(fname)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import h5py

        receipts = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                cshape = tuple(row.chunk_shape)
                a = np.frombuffer(row.data, dtype=np.dtype(row.dtype)).reshape(cshape)
                entry = plan_vds(
                    tuple(row.global_shape), cshape, [tuple(row.pos)], base
                )[0]
                cpath = os.path.join(out_dir, entry.chunk_file)
                with h5py.File(cpath, "w") as f:
                    f.create_dataset(dataset, data=a)
                receipts.append(
                    {
                        "pos": list(row.pos),
                        "chunk_file": entry.chunk_file,
                        "global_shape": list(row.global_shape),
                        "chunk_shape": list(row.chunk_shape),
                        "dtype": row.dtype,
                    }
                )
        yield pd.DataFrame(
            receipts,
            columns=["pos", "chunk_file", "global_shape", "chunk_shape", "dtype"],
        )

    receipts = chunks.mapInPandas(
        write_partition,
        schema="pos array<int>, chunk_file string, global_shape array<int>, "
        "chunk_shape array<int>, dtype string",
    ).collect()
    if not receipts:
        raise ValueError("no chunks to write")

    import h5py

    gshape = tuple(receipts[0]["global_shape"])
    dtype = np.dtype(receipts[0]["dtype"])
    layout = h5py.VirtualLayout(shape=gshape, dtype=dtype)
    for r in receipts:
        cshape = tuple(r["chunk_shape"])
        offs = tuple(p * c for p, c in zip(r["pos"], cshape))
        src = h5py.VirtualSource(
            os.path.join(out_dir, r["chunk_file"]), dataset, shape=cshape
        )
        sl = tuple(slice(o, o + c) for o, c in zip(offs, cshape))
        layout[sl] = src
    with h5py.File(os.path.expanduser(fname), "w") as f:
        f.create_virtual_dataset(dataset, layout, fillvalue=HDF5_FILLVALUE)


# -- Zarr ------------------------------------------------------------------


def to_zarr(chunks: DataFrame, url: str, component: str | None = None) -> None:
    """A20: chunk-position-keyed zarr writes (reference types.py:271-316
    resolves the path, persists, then writes per chunk)."""
    try:
        import zarr
    except ImportError as exc:  # pragma: no cover - env without zarr
        raise ImportError("to_zarr requires zarr (not installed in this environment)") from exc

    rows = chunks.collect()  # driver orchestrates store creation
    if not rows:
        raise ValueError("no chunks to write")
    gshape = tuple(rows[0]["global_shape"])
    cshape = tuple(rows[0]["chunk_shape"])
    dtype = np.dtype(rows[0]["dtype"])
    path = os.path.abspath(os.path.expanduser(url))
    root = zarr.open(path, mode="a")
    z = (root.require_dataset(component, shape=gshape, chunks=cshape, dtype=dtype)
         if component else
         zarr.open(path, mode="a", shape=gshape, chunks=cshape, dtype=dtype))
    for r in rows:
        a = np.frombuffer(r["data"], dtype=dtype).reshape(cshape)
        sl = tuple(slice(p * c, (p + 1) * c) for p, c in zip(r["pos"], cshape))
        z[sl] = a


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
