"""dedup_split_leakage_safe invariants: near-duplicate documents NEVER
straddle the train/val boundary, assignment is total and deterministic."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from deisa_ray_spark.functions.dedup import _jaccard_pairs, dedup_split_leakage_safe

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_no_near_dup_pair_straddles_the_split(spark):
    split = dedup_split_leakage_safe(spark, SF_DIR)
    pairs = _jaccard_pairs(spark, SF_DIR)
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    leaked = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert leaked == 0
    # clustered pairs exist at every SF (else this test is vacuous)
    assert pairs.count() > 0


def test_split_is_total_and_deterministic(spark):
    split = dedup_split_leakage_safe(spark, SF_DIR).toPandas()
    from deisa_ray_spark.sources.registry import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(split) == n_docs  # every doc assigned exactly once
    assert set(split["split"]) <= {"train", "val"}
    assert (split.groupby("cluster_id")["split"].nunique() == 1).all()
    # re-running yields the identical assignment (hash, not rand)
    again = dedup_split_leakage_safe(spark, SF_DIR).toPandas()
    a = split.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
