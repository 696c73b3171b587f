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


def test_fuzzy_decontaminate_staged_band_table(spark, tmp_path, duck):
    """The opt-in staging_dir path writes the band table to parquet and
    joins against the files (guaranteed single signature pass, no cache
    race) — results identical to the oracle, band files actually on
    disk, and nothing newly persisted in memory by this path."""
    import os

    from deisa_ray_spark.functions.dedup import dedup_decontaminate_fuzzy
    from tests.conftest import assert_matches_oracle

    df = dedup_decontaminate_fuzzy(spark, SF_DIR, staging_dir=str(tmp_path))
    band_dir = os.path.join(str(tmp_path), "fuzzy_decon_bands")
    assert any(f.endswith(".parquet") for f in os.listdir(band_dir))
    assert_matches_oracle(df, duck, QUERIES["dedup_decontaminate_fuzzy"].oracle)


def test_persisted_frames_bounded_per_tag(spark):
    """Repeated builds keep at most ONE persisted frame per cache tag
    (the bench builds each query 3x per run; unbounded per-construction
    persists were the r3 leak), and they REUSE it, so the leak fix costs
    no rebuild. Since r5 the fuzzy query shares the lsh_bands tag (its
    band plan is identical to dedup_minhash_lsh's) — a private tag would
    double-persist the same plan."""
    from deisa_ray_spark.functions import dedup as D

    for _ in range(3):
        D.dedup_decontaminate_fuzzy(spark, SF_DIR)
        D.dedup_minhash_lsh(spark, SF_DIR)
    for tag in ("shingles", "lsh_bands"):
        assert sum(1 for k in D._PERSIST_CACHE if k[0] == tag) == 1
    assert not any(k[0] == "fuzzy_bands" for k in D._PERSIST_CACHE)


def test_fuzzy_decontaminate_cache_survives_dead_session_entry(spark, duck):
    """Evicting a cache entry from an already-stopped SparkSession must
    not raise (its JVM context is gone): regression for the
    cross-session eviction failure found by the determinism sweep."""
    from deisa_ray_spark.functions import dedup as D

    class DeadEntry:
        def unpersist(self):
            raise RuntimeError("SparkContext was shut down")

    D._PERSIST_CACHE.clear()
    D._PERSIST_CACHE[("lsh_bands", "dead-app-id", "somewhere")] = DeadEntry()
    df = D.dedup_decontaminate_fuzzy(spark, SF_DIR)
    assert ("lsh_bands", "dead-app-id", "somewhere") not in D._PERSIST_CACHE
    assert sum(1 for k in D._PERSIST_CACHE if k[0] == "lsh_bands") == 1
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(df, duck, QUERIES["dedup_decontaminate_fuzzy"].oracle)
