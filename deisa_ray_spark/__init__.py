"""deisa_ray_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of deisa-project/deisa-ray.

The reference (/root/reference, deisa-ray v0.1.5) streams per-rank N-d array
chunks into a Ray cluster, assembles them per timestep into Dask arrays, and
feeds them to windowed analytics callbacks with a feedback channel back to
the simulation (reference: src/deisa/ray/bridge.py:138-197,
window_handler.py:75-81).

This engine re-expresses that capability Spark-first:

- **Data model**: chunks are rows of a chunk table (``model.CHUNK_SCHEMA``);
  assembled arrays are long-form DataFrames ``(arr, t, x, y, value)`` or
  dense tensors materialized per (array, t) group via ``applyInPandas``.
- **Batch compute** (reference's delegated Dask surface, SURVEY §2.B):
  ``operators/`` — aggregates, elementwise, temporal stencils, coordinate
  ops, linalg, FFT — all Catalyst-native DataFrame ops except the tensor
  kernels which use Arrow-batched pandas UDFs.
- **Streaming in-situ layer** (reference's native dataflow, SURVEY §2.A):
  ``streaming/`` — stateful assembly + timestep triggering + AND/OR gating
  + ordering enforcement + feedback, on Structured Streaming.
- **Scale extensions**: ``functions/`` — dedup (exact/MinHash-LSH/SimHash),
  similarity search, text analysis, multimodal column plumbing for
  training-data pipelines at 100 TB.
"""

__version__ = "0.1.0"

from deisa_ray_spark.errors import ContractError, OrderingError


def __getattr__(name: str):
    # Public entry points at package top level (reference
    # tests/test_public_api.py: `from deisa.ray import Bridge, Deisa`),
    # lazily so importing the package never drags in pyspark for callers
    # that only want the errors/model helpers.
    if name in ("SparkBridge", "InSituEngine", "ArrayWindow", "FeedbackStore"):
        import deisa_ray_spark.streaming as _s

        return getattr(_s, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "ArrayWindow",
    "ContractError",
    "FeedbackStore",
    "InSituEngine",
    "OrderingError",
    "SparkBridge",
    "__version__",
]
