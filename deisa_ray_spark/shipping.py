"""Ship this package to Spark Python workers.

Queries that use ``mapInPandas``/``applyInPandas`` close over functions in
this package; cloudpickle serializes those by module reference, so worker
processes must be able to ``import deisa_ray_spark``. When the driver
process runs from a different working directory (as the correctness
harness may), the package is not on the workers' path — ``addPyFile`` of a
zip of the package fixes that for any session, local or cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SHIPPED_SESSIONS: set[str] = set()
_ZIP_PATH: str | None = None


def _build_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    fd, path = tempfile.mkstemp(prefix="deisa_ray_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join("deisa_ray_spark", os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    _ZIP_PATH = path
    return path


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently add this package as a pyfile on ``spark``'s context.

    Keyed by applicationId, NOT id(sc): a recycled object id after a
    context stop/GC would silently skip addPyFile for the new context
    and every Python-worker task would fail with ModuleNotFoundError."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED_SESSIONS:
        return
    sc.addPyFile(_build_zip())
    _SHIPPED_SESSIONS.add(key)
