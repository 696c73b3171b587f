"""Raw-binary ingestion (binaryFile source) content integrity, and the
decontamination op's partition invariant. The declared-oracle check pins
name+size (DuckDB 1.0 cannot md5 a BLOB); here Spark's md5 over the
binary content column is verified against hashlib on the same files."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from deisa_ray_spark.registry import load_all
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR

QUERIES = load_all()


def test_binary_content_md5_matches_hashlib(spark):
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(SF_DIR)
    )
    got = {
        r.file_name: (r.n_bytes, r.content_md5)
        for r in files.select(
            F.regexp_extract(F.col("path"), "[^/]+$", 0).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        ).collect()
    }
    expected = {}
    for name in os.listdir(SF_DIR):
        if name.endswith(".parquet"):
            with open(os.path.join(SF_DIR, name), "rb") as f:
                data = f.read()
            expected[name] = (len(data), hashlib.md5(data).hexdigest())
    assert got == expected
    assert len(got) == 10


def test_decontaminate_partitions_training_set(spark):
    """removed + kept == training docs; benchmark docs never counted."""
    res = QUERIES["dedup_decontaminate"].fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    n_train = docs.filter(F.col("doc_id") % 97 != 0).count()
    assert sum(r.n_removed + r.n_kept for r in res) == n_train
    assert all(r.n_removed >= 0 and r.n_kept >= 0 for r in res)
