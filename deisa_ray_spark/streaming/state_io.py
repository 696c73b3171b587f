"""Shared storage-state helpers for streaming processors: read a
parquet state directory (or an empty typed frame before first write),
and a crash-atomic pointer-swap for wholesale-rewritten state tables.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

CURRENT_MARKER = "CURRENT"


def read_state_dir(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """State table at ``path`` — an empty frame of ``schema`` before the
    first write (a missing dir is a valid 'no state yet')."""
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(path) for f in fs
    ):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def read_versioned(spark: SparkSession, root: str, schema: str) -> DataFrame:
    """Read the version of a pointer-swapped table that ``CURRENT``
    names; empty typed frame when no version was ever published."""
    cur = os.path.join(root, CURRENT_MARKER)
    if os.path.exists(cur):
        with open(cur) as f:
            name = f.read().strip()
        vdir = os.path.join(root, name)
        if os.path.isdir(vdir):
            return read_state_dir(spark, vdir, schema)
    return spark.createDataFrame([], schema)


def publish_versioned(df: DataFrame, root: str) -> None:
    """Atomically replace a wholesale-rewritten state table.

    Write the new version to its own dir, then atomically REPLACE the
    small ``CURRENT`` pointer file (os.replace — no window where the
    table does not exist, unlike dir-rename juggling: a crash at ANY
    point leaves CURRENT naming a complete version, old or new).
    Superseded version dirs are garbage-collected best-effort."""
    os.makedirs(root, exist_ok=True)
    name = f"v-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(os.path.join(root, name))
    tmp = os.path.join(root, f".{CURRENT_MARKER}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(name)
    os.replace(tmp, os.path.join(root, CURRENT_MARKER))
    for d in os.listdir(root):
        if d.startswith("v-") and d != name:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
