"""JSON-lines chunk source: a second ingest format for the chunk table
(the reference has no file readers at all, SURVEY §2.C "Scans" — Spark
makes additional source formats nearly free).

Wire format: one JSON object per line with the binary payload base64-
encoded (JSON has no binary type). The reader is pure Catalyst —
``from_json`` schema projection + ``unbase64`` — so ingest stays inside
whole-stage codegen; at scale this is the shape of any text-transport
ingest (Kafka value parsing is the identical plan minus the file scan).
"""

from __future__ import annotations

import base64
import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deisa_ray_spark.sources.chunks import chunk_rows_pdf

#: JSON wire schema: CHUNK_SCHEMA with the payload as base64 text.
JSON_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("arr", T.StringType(), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("bridge_id", T.IntegerType(), False),
        T.StructField("pos", T.ArrayType(T.IntegerType()), False),
        T.StructField("chunk_shape", T.ArrayType(T.IntegerType()), False),
        T.StructField("global_shape", T.ArrayType(T.IntegerType()), False),
        T.StructField("dtype", T.StringType(), False),
        T.StructField("data_b64", T.StringType(), False),
    ]
)


def write_chunks_jsonl(path: str, **kwargs) -> str:
    """Write the deterministic chunk fixture as JSON-lines (the test-side
    producer; a real one is any process that can print JSON)."""
    pdf = chunk_rows_pdf(**kwargs)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for row in pdf.itertuples(index=False):
            f.write(
                json.dumps(
                    {
                        "arr": row.arr,
                        "t": int(row.t),
                        "bridge_id": int(row.bridge_id),
                        "pos": list(row.pos),
                        "chunk_shape": list(row.chunk_shape),
                        "global_shape": list(row.global_shape),
                        "dtype": row.dtype,
                        "data_b64": base64.b64encode(row.data).decode(),
                    }
                )
                + "\n"
            )
    return path


def read_chunks_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines → chunk table (CHUNK_SCHEMA): schema-projected read +
    JVM-side base64 decode. No Python in the path."""
    raw = spark.read.schema(JSON_WIRE_SCHEMA).json(path)
    return raw.select(
        "arr",
        "t",
        "bridge_id",
        "pos",
        "chunk_shape",
        "global_shape",
        "dtype",
        F.unbase64("data_b64").alias("data"),
    )
