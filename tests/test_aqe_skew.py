"""AQE runtime re-planning on skewed joins: one hot key holding ~95% of
the rows must cause the sort-merge join's skewed partition to be SPLIT
at runtime (``skew=true`` in the executed plan) — the mechanism that
keeps one straggler task from serializing a 100 TB join. Complements the
manual two-stage salting operator (q14_salted_agg_events), which is the
pre-planned variant of the same defense."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(200_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 < 95, F.lit(0)).otherwise(F.col("id") % 100),
            )
            .withColumn("pad", F.md5(F.col("id").cast("string")))
        )
        right = spark.range(100).select(
            F.col("id").alias("k2"), F.md5(F.col("id").cast("string")).alias("rpad")
        )
        j = left.join(right, F.col("k") == F.col("k2"))
        # Execute THIS DataFrame's own QueryExecution: AQE finalizes the
        # adaptive plan only for the execution that actually ran (a
        # noop-write or .count() plans a separate QueryExecution and
        # leaves j's plan at isFinalPlan=false).
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
        # correctness unaffected by the split
        assert len(rows) == 200_000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _zipf_docs(spark, tmp_path):
    """Documents table where ~95% of token occurrences are one type."""
    rows = []
    for i in range(4000):
        words = ["the"] * 40 + [f"w{i % 211}", f"w{(i * 7) % 211}"]
        text = " ".join(words)
        rows.append((i, text, "en", f"src{i % 4}", len(text)))
    (
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .repartition(8)
        .write.parquet(str(tmp_path / "documents.parquet"))
    )
    return str(tmp_path)


def test_token_join_skew_is_structural_not_aqe_fixable(spark, tmp_path):
    """AQE's skew split CANNOT rescue the token-join shape: the LM side
    of toks ⋈ lm is an aggregation on the same key, so Catalyst
    co-partitions it with the join — the dim side has no shuffle query
    stage for OptimizeSkewedJoin to split (it requires both sides'
    shuffle stages), even with forceOptimizeSkewedJoin. This test pins
    that structural fact so nobody "simplifies" hot_split_join away on
    the theory that AQE would handle it."""
    from deisa_ray_spark.sources.registry import load_table

    sf_dir = _zipf_docs(spark, tmp_path)
    old = {k: spark.conf.get(k, None) for k in _CONF}
    conf = dict(_CONF)
    conf["spark.sql.adaptive.forceOptimizeSkewedJoin"] = "true"
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cr"))
        j = toks.join(lm, "tok")  # the plain (pre-mitigation) shape
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan
        # 95%-of-rows key, far over every threshold — yet no split:
        assert "skew=true" not in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")


def test_hot_split_join_mitigates_token_skew(spark, tmp_path):
    """The engineered mitigation (hot_split_join) on the real operator:
    with the head limited to 1 type, the hot token joins via
    BroadcastHashJoin (its occurrences never enter a tok shuffle), the
    211-type tail is near-uniform, and the result is IDENTICAL to the
    default-head run."""
    import deisa_ray_spark.functions.text as T

    sf_dir = _zipf_docs(spark, tmp_path)
    out_default = sorted(
        tuple(r) for r in T.txt_dsir_weights(spark, sf_dir).collect()
    )

    old_k = T.ZIPF_HOT_K
    T.ZIPF_HOT_K = 1  # head = just "the" — forces a real head/tail split
    try:
        no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        old = {k: spark.conf.get(k, None) for k in no_bcast}
        for k, v in no_bcast.items():
            spark.conf.set(k, v)
        try:
            out = T.txt_dsir_weights(spark, sf_dir)
            got = sorted(tuple(r) for r in out.collect())
            plan = out._jdf.queryExecution().executedPlan().toString()
            # hot branch is an explicit broadcast join even with the
            # auto-threshold off (the hint, not luck, carries it)
            assert "BroadcastHashJoin" in plan
            assert "Union" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    finally:
        T.ZIPF_HOT_K = old_k

    assert got == out_default  # the split never changes the answer

    # helper semantics standalone: head+tail partition the dim exactly
    fact = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [(f"k{i}", 100 - i) for i in range(7)], "k string, w int"
    )
    plain = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    split = sorted(
        tuple(r) for r in T.hot_split_join(fact, dim, "k", "w", n_hot=3).collect()
    )
    assert split == plain


def test_hot_split_join_cache_tag_schema_guard(spark, tmp_path):
    """A cache_tag is owned by one dim shape: a second caller reusing the
    tag with a structurally different dim must fail loudly instead of
    silently receiving the first caller's cached dimension table."""
    import pytest

    import deisa_ray_spark.functions.text as T

    fact = spark.range(10).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    dim_a = spark.createDataFrame([("0", 5), ("1", 3)], "k string, w int")
    dim_b = spark.createDataFrame([("0", 5.0, "x")], "k string, w double, extra string")
    T.hot_split_join(fact, dim_a, "k", "w", cache_tag="guard_test", sf_dir=str(tmp_path))
    # same tag + same schema: fine (the cached frame serves it)
    T.hot_split_join(fact, dim_a, "k", "w", cache_tag="guard_test", sf_dir=str(tmp_path))
    with pytest.raises(ValueError, match="guard_test"):
        T.hot_split_join(
            fact, dim_b, "k", "w", cache_tag="guard_test", sf_dir=str(tmp_path)
        )
