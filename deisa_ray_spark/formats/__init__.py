"""Pure-Python fallback implementations of the public on-disk formats the
science sinks (A19-A21) target, used when the corresponding library
(h5py / zarr / xarray) is not installed.

These are not toy formats: each module writes the REAL public
specification (zarr v2 directory store, NetCDF classic CDF-1/2, HDF5
classic superblock-v0 files), so the installed libraries read the output
unchanged. Each module also ships an independent spec-following reader
used by the round-trip tests — the reader walks the byte layout from the
spec, it does not share encode tables with the writer.
"""

from deisa_ray_spark.formats import hdf5mini, netcdf3, zarr2  # noqa: F401
