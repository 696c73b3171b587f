"""Physical-plan shape tests: the properties that make these queries
survive a 100 TB scale-up. A green oracle check with a wrong plan (full
scan for a 2-column projection, shuffled star join, Python in the hot
path) is not done — these tests pin the plan, not the numbers."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from deisa_ray_spark.registry import load_all
from tests.conftest import SF_DIR

QUERIES = load_all()


def plan_of(spark, name: str) -> str:
    """Formatted static plan (AQE off so codegen stages and the full
    PushedFilters list are visible — AQE only re-plans at runtime on top
    of this same static shape)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q01_pushdown_and_pruning(spark):
    """Filter reaches the parquet scan; only needed columns are read."""
    plan = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads the 7 needed columns, not all 16
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema
    # partial aggregation (map-side combine) before the exchange
    assert "HashAggregate" in plan and "Exchange" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange") or plan.count("HashAggregate") >= 2


def test_q06_range_pushdown(spark):
    plan = plan_of(spark, "q06_revenue_forecast")
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThanOrEqual(l_discount,0.07)" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q03_broadcasts_dimensions(spark):
    """Star join: nation/region broadcast — the fact table never shuffles
    for them."""
    plan = plan_of(spark, "q03_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") >= 2


def test_q07_window_group_limit(spark):
    """Top-k per group prunes to k rows per partition BEFORE the shuffle
    (WindowGroupLimit), so only k·P rows move."""
    plan = plan_of(spark, "q07_top3_parts_per_brand")
    assert "WindowGroupLimit" in plan


def test_whole_stage_codegen_everywhere(spark):
    """The relational core stays inside whole-stage codegen (no Python in
    the hot path). Formatted explain marks codegen stages with
    ``[codegen id : N]``."""
    for name in ("q01_pricing_summary", "q06_revenue_forecast", "q11_sessionize_events"):
        plan = plan_of(spark, name)
        assert "[codegen id :" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_text_ops_are_jvm_side(spark):
    """Text/dedup/similarity ops compile to JVM expressions — no Python
    UDF evaluation nodes anywhere in their plans."""
    for name in ("txt_token_stats", "dedup_minhash_lsh", "sim_bruteforce_topk",
                 "emb_scalar_quantize", "txt_tfidf"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_bruteforce_topk_broadcasts_queries(spark):
    """The query side is broadcast: corpus scan is single-pass, no
    corpus-wide shuffle before ranking."""
    plan = plan_of(spark, "sim_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_range_search_is_shuffle_free(spark):
    """ε-neighborhood search is a pure pipelined filter over one corpus
    pass: the only exchange is the query-side broadcast — no shuffle, no
    Window, no sort anywhere in the plan."""
    plan = plan_of(spark, "sim_range_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan
    # every Exchange in this plan must be the broadcast one
    assert plan.count("Exchange") == plan.count("BroadcastExchange")
    assert "Window" not in plan and "Sort" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_decontaminate_probe_is_broadcast(spark):
    """The Bloom probe is a single narrow pass: corpus shingles cross a
    broadcast ONE-ROW packed-bits array — the shingle stream reaches the
    cross join straight from its Generate with no Exchange in between
    (exchanges downstream of the probe carry one row per DOCUMENT, not
    per shingle)."""
    plan = plan_of(spark, "dedup_decontaminate_bloom")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the streamed side of the cross join — tree lines between the BNLJ
    # node and its input boundary (the session-cached shingle table's
    # InMemoryTableScan, whose embedded build plan is materialized once
    # per session, or the BroadcastExchange build-side sibling) — is
    # shuffle-free
    tree = plan.split("\n\n")[0].splitlines()
    bnlj = next(i for i, l in enumerate(tree) if "BroadcastNestedLoopJoin" in l)
    stop = next(
        i
        for i, l in enumerate(tree)
        if i > bnlj and ("InMemoryTableScan" in l or "BroadcastExchange" in l)
    )
    streamed = "\n".join(tree[bnlj + 1 : stop])
    assert "Generate" in streamed, "probe side lost its explode"
    assert "Exchange" not in streamed, "shuffle crept between scan and probe"


def test_grid_explode_is_narrow(spark):
    """Chunk decode (mapInPandas) happens with no Exchange beneath it in
    the plan tree — decode parallelism is the input partitioning, chunk
    payloads never shuffle."""
    plan = plan_of(spark, "grid_ingest_checksum")
    tree = plan.split("\n\n")[0].splitlines()  # root-first physical tree
    decode_line = next(i for i, l in enumerate(tree) if "MapInPandas" in l)
    below_decode = "\n".join(tree[decode_line + 1 :])
    assert "Exchange" not in below_decode, "shuffle below the decode"


def test_streaming_control_plane_prunes_payload(spark, tmp_path):
    """The stateful control-plane operator reads chunk METADATA only: the
    binary ``data`` column is pruned from its streaming scan."""
    import numpy as np

    from deisa_ray_spark.streaming import InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.bridge import metadata_for_grid

    chunk_dir = str(tmp_path / "chunks")
    b = SparkBridge(0, metadata_for_grid(("temperature",), (2, 2), (2, 2), (0, 0)), chunk_dir)
    b.send("temperature", np.ones((2, 2)), 0)
    engine = InSituEngine(spark, chunk_dir)
    events = engine.events_stream()
    logical = events._jdf.queryExecution().analyzed().toString()
    # the analyzed plan projects the metadata columns, not `data`
    assert "data" not in logical.split("StreamingRelation")[0]


def tree_of(plan: str) -> str:
    """Just the plan tree (formatted explain repeats every node in the
    detail section below, which would double substring counts)."""
    return plan.split("\n\n", 1)[0]


def test_q22_single_expand(spark):
    """GROUPING SETS compiles to ONE Expand + one agg pass — not a union
    of four sub-aggregations re-scanning the input."""
    tree = tree_of(plan_of(spark, "q22_grouping_sets"))
    assert tree.count("Expand") == 1
    assert tree.count("Scan parquet") == 1


def test_q23_decorrelates_to_semi_anti(spark):
    """EXISTS / NOT EXISTS become semi/anti hash joins, not per-row
    subquery evaluation."""
    plan = plan_of(spark, "q23_exists_anti_semi")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q24_decorrelates_scalar_subquery(spark):
    """The correlated per-part average becomes aggregate + join: the
    inner lineitem scan appears once, not per outer row."""
    plan = plan_of(spark, "q24_scalar_subquery")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    tree = tree_of(plan)
    assert tree.count("Scan parquet") <= 3  # lineitem ×2 (outer+agg), part ×1


def test_q25_generate_stays_jvm_side(spark):
    """LATERAL VIEW posexplode is a Generate node in codegen — the UDTF
    surface without a Python worker."""
    plan = plan_of(spark, "q25_lateral_posexplode")
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_sample_prunes_before_shuffle(spark):
    """Per-group k by row_number gets WindowGroupLimit: map tasks keep k
    rows per group before the exchange."""
    plan = plan_of(spark, "samp_stratified_k")
    assert "WindowGroupLimit" in plan


def test_bernoulli_sample_is_pure_filter(spark):
    """Hash-Bernoulli sampling adds no shuffle before the aggregation —
    one Exchange total (the group-by), none for the sampling itself."""
    tree = tree_of(plan_of(spark, "samp_hash_bernoulli"))
    assert tree.count("Exchange") == 1


def test_passage_chunks_shuffle_free(spark):
    """Chunking is a pure map: split → sequence → Generate → slice/md5,
    zero Exchanges — linear scale-out with input splits."""
    plan = plan_of(spark, "txt_passage_chunks")
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_rp_lsh_is_equi_join(spark):
    """Multi-probe LSH joins on the bucket code (hash join), never a
    nested-loop cross join over the corpus."""
    plan = plan_of(spark, "sim_rp_lsh_topk")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q30_decorrelates_min_subquery_no_nested_loop(spark):
    """The correlated MIN subquery becomes an aggregate + equi-join;
    dimension joins broadcast. A nested-loop / cartesian anywhere here
    would re-run the four-table inner tree per outer row."""
    plan = plan_of(spark, "q30_min_cost_supplier")
    tree = plan.split("\n\n", 1)[0]
    assert "BroadcastNestedLoopJoin" not in tree and "CartesianProduct" not in tree
    assert tree.count("BroadcastHashJoin") >= 4


def test_q31_threshold_is_independent_subquery(spark):
    """The global-threshold scalar subquery is planned once (separate
    subquery section); the main plan is one scan + partial/final agg +
    filter — no join, one exchange."""
    plan = plan_of(spark, "q31_value_concentration")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") == 1
    assert "Join" not in tree
    assert "Subquery" in plan  # threshold lives in the subquery section


def test_decontaminate_broadcasts_benchmark(spark):
    """Contamination marking is a broadcast left-semi join on the tiny
    benchmark shingle set — the training corpus is never shuffled for
    it (the only corpus exchange is the final per-source aggregate)."""
    plan = plan_of(spark, "dedup_decontaminate")
    tree = plan.split("\n\n", 1)[0]
    assert "BroadcastHashJoin LeftSemi" in tree
    assert "SortMergeJoin" not in tree


def test_q34_double_correlation_no_nested_loop(spark):
    """Q21 shape: EXISTS and NOT EXISTS on the same fact table with <>
    correlation become semi/anti hash joins on the equi-key (the
    inequality rides along as a join condition) — never a nested loop."""
    plan = plan_of(spark, "q34_sole_blame_supplier")
    tree = plan.split("\n\n", 1)[0]
    assert "LeftSemi" in tree and "LeftAnti" in tree
    assert "BroadcastNestedLoopJoin" not in tree and "CartesianProduct" not in tree


def test_curation_pipeline_two_shuffles_only(spark):
    """The full curation pass (quality → lang → dedup → sample → report)
    compiles to exactly TWO shuffles: the dedup aggregate and the final
    per-source aggregate. Everything else is fused narrow projection/
    filter; the dedup keep-set broadcasts back as a semi join."""
    plan = plan_of(spark, "txt_curation_pipeline")
    tree = plan.split("\n\n", 1)[0]
    n_shuffles = tree.count("Exchange (") - tree.count("BroadcastExchange (")
    assert n_shuffles == 2, tree
    assert "BroadcastHashJoin LeftSemi" in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_dynamic_partition_pruning(spark, tmp_path):
    """A join against a filtered dimension prunes hive partitions of the
    fact at runtime: the fact scan's PartitionFilters carries a
    dynamicpruningexpression fed from the dimension's broadcast — at
    100 TB the scan reads the matching date buckets, not the archive."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from deisa_ray_spark.maintenance import partition_table

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "flat"))
    report = partition_table(
        spark, str(tmp_path / "flat"), str(tmp_path / "fact"), ["ship_month"]
    )
    assert report.n_rows == li.count()
    dim = (
        li.select("ship_month")
        .distinct()
        .withColumn(
            "season",
            F.when(F.col("ship_month").startswith("1996"), "hot").otherwise("cold"),
        )
    )
    dim.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "dim"))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        fact = spark.read.parquet(str(tmp_path / "fact"))
        dimr = spark.read.parquet(str(tmp_path / "dim"))
        j = (
            fact.join(
                dimr.filter(F.col("season") == "hot"),
                fact.ship_month == dimr.ship_month,
            )
            .groupBy(fact.ship_month)
            .agg(F.sum("l_quantity").alias("qty"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "dynamicpruningexpression" in plan, plan
        # and the pruning is real: only the 12 hot months survive
        assert j.count() == 12
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bloom_runtime_filter_on_shuffle_join(spark):
    """When neither join side broadcasts, Spark injects a bloom filter
    built from the selective side into the large side's scan — rows that
    cannot match are dropped BEFORE the shuffle (runtime row-level
    pruning, the shuffle-join complement of DPP)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        j = (
            li.join(
                orders.filter(F.col("o_orderpriority") == "1-URGENT"),
                li.l_orderkey == orders.o_orderkey,
            )
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan, plan  # built on the filtered side
        assert "might_contain" in plan, plan  # probed on the fact side
    finally:
        for k, v in saved.items():
            # conf.get(k, None) returns None for never-set keys; restoring
            # those means UNSET (back to the built-in default), not skip —
            # otherwise -1 autoBroadcastJoinThreshold leaks into every
            # later broadcast-join plan test.
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_q36_broadcasts_both_nation_roles(spark):
    """Q7 shape: the nation dim appears in two roles (supplier/customer
    side) — both must broadcast; the only non-broadcast exchange inputs
    are the fact tables."""
    plan = plan_of(spark, "q36_volume_shipping")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") >= 2


def test_q37_disjunction_prunes_columns(spark):
    """Q19 shape: the OR-of-ANDs predicate must not defeat column
    pruning — the lineitem scan reads only the 4 referenced columns."""
    plan = plan_of(spark, "q37_disjunctive_parts")
    li_scans = [
        seg for seg in plan.split("ReadSchema:")[1:] if "l_quantity" in seg.splitlines()[0]
    ]
    assert li_scans, plan
    schema_line = li_scans[0].splitlines()[0]
    for col in ("l_extendedprice", "l_discount", "l_partkey", "l_quantity"):
        assert col in schema_line
    assert "l_shipdate" not in schema_line and "l_orderkey" not in schema_line
    # the part-side single-branch conjuncts (brand IN set) reach the scan
    assert "PushedFilters" in plan


def test_q44_pushes_both_date_filters(spark):
    """Q3 shape: the orders-side and lineitem-side date ranges each reach
    their own parquet scan (row-group min/max pruning on both fact
    paths), and the top-10 runs as TakeOrdered over aggregated rows."""
    plan = plan_of(spark, "q44_shipping_priority")
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "TakeOrderedAndProject" in plan


def test_q49_left_outer_with_in_join_predicate(spark):
    """Q13 shape: the priority exclusion lives INSIDE the left-outer join
    condition, so order-less customers survive; the filtered orders side
    broadcasts (never shuffles the customer scan)."""
    head = plan_of(spark, "q49_customer_distribution").split("\n\n", 1)[0]
    assert "BroadcastHashJoin LeftOuter" in head
    assert "SortMergeJoin" not in head


def test_q50_not_in_plans_as_hash_anti_join(spark):
    """Q16 shape: NOT IN over non-null keys must plan as a broadcast anti
    HASH join — the null-aware fallback is a nested-loop join that would
    be quadratic against a 100 TB fact table."""
    head = plan_of(spark, "q50_supplier_relationship").split("\n\n", 1)[0]
    assert "LeftAnti" in head
    assert "BroadcastNestedLoopJoin" not in head


def test_q51_having_aggregate_computed_once(spark):
    """Q18 shape (r13): the per-order quantity sums aggregate ONCE from
    a SINGLE lineitem scan and join straight to orders/customer — the
    textbook IN+HAVING form made Catalyst evaluate the subquery twice
    (semi joins on both inputs) and re-join raw lineitem a third time to
    re-sum quantities (3 fact scans). o_orderkey determines every other
    output column, so the single-aggregate form is row-identical."""
    plan = plan_of(spark, "q51_large_volume_customers")
    assert plan.count("lineitem.parquet") == 1  # one fact-table scan
    head = plan.split("\n\n", 1)[0]
    assert "LeftSemi" not in head  # no duplicated subquery evaluation
    # exactly one aggregation pair (partial + final) in the whole plan
    assert head.count("HashAggregate") == 2


def test_q55_single_events_scan_window_medians(spark):
    """MAD anomaly detection (r13): the per-type median and MAD compute
    as window aggregates over the tiny daily frame — ONE events scan in
    the whole plan (the former med/mad CTE joins re-executed the daily
    scan+agg subtree three times) and no broadcast builds of re-derived
    aggregates."""
    plan = plan_of(spark, "q55_event_anomaly_mad")
    assert plan.count("events.parquet") == 1
    assert "Window" in plan


def test_q33_single_events_scan_staged_hourly(spark):
    """Gap-fill LOCF (r13): spine bounds, the distinct-type list and the
    left join's probe side all read the per-run staged hourly frame
    (LogicalRDD leaves) — ONE events scan instead of three."""
    plan = plan_of(spark, "q33_gap_fill_locf")
    # the staged frame shows up as Scan ExistingRDD, not a parquet scan
    assert plan.count("events.parquet") == 0
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    # ... and building the staged frame itself scans events exactly once
    from deisa_ray_spark.functions import dedup as dd

    staged = dd._RUN_STAGED.get("hourly_spine_grid")
    assert staged is not None


def test_run_staged_frees_superseded_frame(spark):
    """run_staged is per-run staging, NOT a cross-run cache: a second
    staging under the same tag computes a fresh frame and frees the
    first one's blocks; drain_session_cache drops the last one."""
    from pyspark.sql import functions as F

    from deisa_ray_spark.functions import dedup as dd

    a = dd.run_staged("_t_rs", spark.range(5).select(F.col("id")))
    assert a.count() == 5
    b = dd.run_staged("_t_rs", spark.range(7).select(F.col("id")))
    assert b.count() == 7  # fresh computation, not the old frame
    assert dd._RUN_STAGED["_t_rs"] is b
    n_before = len(dd._RUN_STAGED)
    dd.drain_session_cache()
    assert len(dd._RUN_STAGED) == 0 and n_before >= 1


def test_cbo_reorders_join_by_stats(spark):
    """Cost-based join reorder: with catalog stats, a lineitem-first
    join chain is re-planned to join orders with the FILTERED customer
    side first and the fact table last — the stats-driven plan a 100 TB
    warehouse depends on. Without stats/CBO the syntax order (fact ×
    fact first) survives."""
    import contextlib
    import io

    from deisa_ray_spark.maintenance import analyze_star_schema

    stats = analyze_star_schema(
        spark, SF_DIR, ["lineitem", "orders", "customer"], prefix="cbo_"
    )
    assert stats["lineitem"].n_rows > stats["customer"].n_rows > 0

    q = """
    SELECT c_mktsegment, count(*) AS n
    FROM cbo_lineitem l JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
         JOIN cbo_customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 4900
    GROUP BY c_mktsegment
    """
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # expose join order
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)

    def head(cbo: bool) -> str:
        spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            spark.sql(q).explain("formatted")
        return buf.getvalue().split("\n\n", 1)[0]

    try:
        off, on = head(False), head(True)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
        for t in ("cbo_lineitem", "cbo_orders", "cbo_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # syntax order: lineitem scans before customer
    assert off.index("cbo_lineitem") < off.index("cbo_customer")
    # stats order: the fact table moves to the LAST join input
    assert on.index("cbo_lineitem") > on.index("cbo_customer")
    assert on.index("cbo_lineitem") > on.index("cbo_orders")


def test_pack_sequences_no_global_window(spark):
    """Sequence packing windows PER SOURCE shard — a global (empty
    partitionBy) running sum would serialize the whole corpus through
    one reducer. The plan must hash-partition on source, never
    SinglePartition, ahead of the window."""
    plan = plan_of(spark, "txt_pack_sequences")
    assert "Window" in plan
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_fuzzy_decontaminate_broadcasts_benchmark(spark):
    """Fuzzy decontamination: the benchmark side (band keys + shingle
    sets) broadcasts — the corpus is never self-joined and never
    shuffled for the candidate marking."""
    import re

    plan = plan_of(spark, "dedup_decontaminate_fuzzy")
    # count distinct numbered nodes — explain("formatted") prints every
    # node twice (tree + details), so substring counts don't discriminate
    broadcasts = re.findall(r"^\(\d+\) BroadcastExchange", plan, flags=re.M)
    assert len(broadcasts) >= 2, f"expected ≥2 broadcast nodes, got {len(broadcasts)}"
    assert "CartesianProduct" not in plan


def test_unigram_logprob_shuffle_budget(spark):
    """Unigram LM scoring: tokenize once, LM partial-agg, score join,
    per-doc agg — the plan stays within a small fixed exchange budget
    (no accidental resplit/re-explode of the corpus)."""
    import re

    plan = plan_of(spark, "txt_unigram_logprob")
    # count real shuffle nodes in the numbered details ("(8) Exchange"),
    # not substrings — Broadcast/ReusedExchange contain "Exchange" and
    # the formatted output prints every node twice
    shuffles = re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M)
    assert len(shuffles) <= 4, f"unigram plan grew to {len(shuffles)} shuffles: {shuffles}"
    # the corpus token stream joins the (broadcast) LM without shuffling
    assert re.search(r"^\(\d+\) BroadcastExchange", plan, flags=re.M)


def test_gopher_rules_zero_shuffle(spark):
    """The quality-rule query is a pure narrow projection: scan →
    project. Any Exchange means someone added an accidental wide op."""
    plan = plan_of(spark, "txt_gopher_rules")
    assert "Exchange" not in plan


def test_truncate_renorm_zero_shuffle(spark):
    """Matryoshka truncation is a narrow per-row projection."""
    plan = plan_of(spark, "emb_truncate_renorm")
    assert "Exchange" not in plan


def test_mrl_coarse_scan_reads_only_stored_prefix(spark):
    """The MRL coarse stage scans the narrow stored-prefix table: exactly
    one scan in the plan may read the wide `embedding` column per role —
    queries (N_QUERIES rows) and rerank lookup — while the corpus-sized
    coarse scan reads (vec_id, prefix) ONLY. If the coarse stage ever
    regresses to slicing the wide column at query time, a third
    embedding-reading scan appears and this fails."""
    plan = plan_of(spark, "sim_mrl_rerank_topk")
    details = plan.split("\n\n", 1)[1] if "\n\n" in plan else plan
    read_schemas = [
        line for line in details.splitlines() if "ReadSchema" in line
    ]
    prefix_scans = [l for l in read_schemas if "prefix" in l]
    assert prefix_scans, f"no stored-prefix scan found:\n{plan}"
    for l in prefix_scans:
        assert "embedding" not in l, f"coarse scan reads the wide column: {l}"
    # the wide column is read by at most the two cheap roles
    emb_scans = [l for l in read_schemas if "embedding" in l]
    assert 1 <= len(emb_scans) <= 2, read_schemas


def test_quality_classifier_pure_map_plan(spark):
    """Model-based quality scoring is a PURE MAP + one doc-key agg:
    zero joins, zero Python-eval nodes; exactly the two exchanges of a
    partial→final aggregate."""
    import re

    plan = plan_of(spark, "txt_quality_classifier")
    assert "Join" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
    shuffles = re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M)
    assert len(shuffles) <= 1, f"classifier grew to {len(shuffles)} shuffles"


def test_caption_filter_all_equi_broadcast(spark):
    """Cross-modal pair curation joins by KEY only: broadcast hash
    joins, never a nested-loop/cartesian pairwise stage."""
    plan = plan_of(spark, "mm_caption_filter")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_hybrid_rrf_no_doc_by_doc_product(spark):
    """BM25's lexical side must pair queries with candidates through the
    TERM equi-join (query terms broadcast into the token stream) — the
    only nested-loop allowed is the dense side's deliberate
    broadcast-queries × corpus baseline scan and the 1-row stats cross."""
    import re

    plan = plan_of(spark, "sim_hybrid_rrf_topk")
    assert "CartesianProduct" not in plan
    # lexical path: hash joins keyed on term exist (formatted mode
    # lists keys in the detail block, not on the node line)
    assert "BroadcastHashJoin" in plan
    assert re.search(r"Left keys \[1\]: \[term#", plan), "no term-keyed join"
    # fused ranks come from bounded top-k inputs: WindowGroupLimit
    # prunes each partition to k rows before the rank shuffles
    assert "WindowGroupLimit" in plan


def test_hot_split_join_plan_shape(spark):
    """The frequency-partitioned token join: the head joins via
    BroadcastHashJoin and the tail via a non-broadcast join, unioned —
    pinned on txt_tfidf so a regression to a single unsplit join (or a
    blanket broadcast of the unbounded dim) fails here."""
    plan = plan_of(spark, "txt_tfidf")
    assert "Union" in plan
    assert "BroadcastHashJoin" in plan


def test_ccnet_buckets_hot_split_and_jvm_side(spark):
    """Perplexity bucketing keeps the unigram family's scale shape: the
    corpus-sized token join stays frequency-partitioned (Union of head
    broadcast + tail shuffle) and the whole plan is JVM expressions —
    the only nested-loop is the 1-row LM-total cross."""
    plan = plan_of(spark, "txt_ccnet_buckets")
    assert "Union" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_logprob_hot_split_and_jvm_side(spark):
    """Bigram scoring: no window over a global token order (the zip-slice
    form), hot-split corpus join, zero Python-eval, zero nested-loop."""
    plan = plan_of(spark, "txt_bigram_logprob")
    assert "Union" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the global-window anti-shape would appear as a partition-less Window
    assert "Window" not in plan


def test_source_overlap_equi_join_only(spark):
    """Cross-source overlap: the pair stage keys on the SHINGLE (per-key
    fan-out bounded by |sources|) — never a source×source document
    product — and the census joins broadcast."""
    plan = plan_of(spark, "dedup_source_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" in plan


def test_lsh_recall_audit_equi_joins_only(spark):
    """The recall audit composes three equi-keyed stages (band bucket
    join, shared-shingle truth join, pair-key left join) — no pairwise
    product anywhere, and no Python in the plan."""
    plan = plan_of(spark, "dedup_lsh_recall_audit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_shuffle_no_global_sort(spark):
    """The epoch permutation must never serialize through one reducer:
    the big window hash-partitions on (epoch, shard_id) and no stage
    runs on SinglePartition; the only nested-loop is the bounded
    2-row epoch broadcast."""
    plan = plan_of(spark, "samp_epoch_shuffle")
    assert "hashpartitioning(epoch" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_keep_best_no_pairwise_no_python(spark):
    """Canonical selection: cluster table ⋈ quality is an equi-join,
    the argmax is one cluster-partitioned window — no doc×doc product,
    no Python-eval in the plan."""
    plan = plan_of(spark, "dedup_keep_best")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_pagerank_no_pairwise_no_python(spark):
    """PageRank output: checkpointed per-round results join the cluster
    map by equi-join; hub ranking is one component-partitioned window.
    The iteration itself runs at construction (eager checkpoints), so
    the visible plan must be flat — no round-chain lineage, no doc×doc
    product, no Python-eval."""
    plan = plan_of(spark, "dedup_pagerank")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_containment_equi_join_only(spark):
    """Containment pairs ride the shared shingle equi-join — never a
    pairwise document product."""
    plan = plan_of(spark, "dedup_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_knn_graph_blocked_not_cartesian(spark):
    """kNN graph (r13): each bounded bucket scores as ONE numpy gram
    matmul + top-k in the FlatMapGroupsInPandas tensor slot — the B²
    pair set never materializes as a join (the old bucket self-join +
    HOF dot + WindowGroupLimit paid three exchanges and interpreted
    per-pair lambdas); no corpus-quadratic product, no row-at-a-time
    Python. The artifact is session-cached, so the declared query's
    visible plan is the InMemoryTableScan over it — pin the kernel on
    the BUILDER's plan."""
    import contextlib
    import io

    from deisa_ray_spark.functions.similarity import _emb, knn_assigned, knn_graph_from_assigned

    plan = plan_of(spark, "sim_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan

    df = knn_graph_from_assigned(knn_assigned(_emb(spark, SF_DIR)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    build_plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" in build_plan
    assert "CartesianProduct" not in build_plan
    assert "BroadcastNestedLoopJoin" not in build_plan
    assert "BatchEvalPython" not in build_plan


def test_effective_mixture_no_pairwise_no_python(spark):
    """Effective-mixture report: fingerprint window + broadcast
    contamination anti-join + per-source aggs — no doc×doc product, no
    Python-eval; the weight normalization windows run over the tiny
    per-source frame."""
    plan = plan_of(spark, "txt_effective_mixture")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_semantic_decon_tensor_slot_no_join(spark):
    """Semantic decontamination (r12): the bench slice ships as a numpy
    broadcast variable and the corpus x bench max-cosine is ONE matmul
    per Arrow batch in the MapInPandas tensor slot — no join of any kind
    in the plan (the old bounded BroadcastNestedLoopJoin + per-pair HOF
    kernel was a measured 40x constant-factor burn at sf1); the
    per-label census stays a JVM hash agg."""
    plan = plan_of(spark, "dedup_decontaminate_semantic")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "HashAggregate" in plan


def test_embedding_cosine_block_tensor_slot(spark):
    """Embedding-cosine near-dup (r12): per-label blocks score as one
    gram matmul each in the FlatMapGroupsInPandas tensor slot — the n²
    work never materializes as a join; the only shuffles are the block
    cap census and the group-by-label exchange (no per-pair HOF lambda,
    no cartesian)."""
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan or "LeftSemi" in plan  # cap semi-join only
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_binary_hamming_slim_scan_no_python(spark):
    """Binary-quantized ANN: the Hamming candidate scan is the broadcast
    query set against PACKED CODES only (the embedding arrays must not
    ride the candidate shuffle — they join back for the bounded shortlist
    re-rank by equi-join), top-k is window group-limit, all JVM-side."""
    plan = plan_of(spark, "sim_binary_hamming_topk")
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the vectors join back via hash equi-joins, never a nested loop:
    # the only NLJ is the sanctioned bounded broadcast query-set cross
    # (formatted plans print each node twice: tree line + detail block)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert plan.count("BroadcastHashJoin") >= 2


def test_weighted_topk_take_ordered(spark):
    """Efraimidis-Spirakis top-K must be TakeOrderedAndProject (per-
    partition heaps + driver merge of K rows), never a global sort."""
    plan = plan_of(spark, "samp_weighted_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_pipeline_funnel_narrow_and_reused(spark):
    """The funnel's five stage aggregates read the narrow session-cached
    base (InMemoryTableScan), never re-scan raw text per stage, and the
    drop/contamination sets enter as broadcast anti-joins."""
    plan = plan_of(spark, "pipeline_funnel")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_graph_beam_serving_shape(spark):
    """Beam serving: candidate/visited frames are (qid, node) ids with
    ONE equi-join back to the cached vector store per scoring step; the
    dot against the bounded query matrix runs in the sanctioned
    ArrowEvalPython cosine slot (r13 — the third tensor slot, replacing
    the interpreted zip_with+aggregate fold that burned the warm serve).
    No row-at-a-time Python (BatchEvalPython), no unbounded cartesian
    (CartesianProduct = non-broadcast product). Most hops hide behind
    the per-hop localCheckpoint scan; the visible tail must still show
    the slot and nothing worse."""
    plan = plan_of(spark, "sim_graph_beam_topk")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_span_extents_narrow_stream_one_window_exchange(spark):
    """Extent chaining: the shared-gram dim joins into the narrow span
    stream (broadcast at this SF; an equi shuffle-join at scale — either
    way no cartesian), both gaps-and-islands windows share ONE doc_id
    exchange+sort, and nothing Python touches the path."""
    import contextlib
    import io

    from deisa_ray_spark.functions.dedup import build_span_extents

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = build_span_extents(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # lag + running sum are two Window nodes sharing ONE doc_id
    # exchange: no Exchange/Sort may sit between them. Robust to both
    # renderings (fresh plan, or the cache manager substituting the
    # session-cached relation whose explain embeds final+initial AQE
    # trees — slice to the final tree first).
    plan = plan.split("== Initial Plan ==")[0]
    lines = plan.splitlines()
    widx = [i for i, l in enumerate(lines) if "Window (" in l]
    assert len(widx) == 2, widx
    between = "\n".join(lines[min(widx) + 1 : max(widx)])
    assert "Exchange" not in between and "Sort" not in between


def test_pr_curve_narrow_explode_broadcast_weights(spark):
    """The threshold sweep explodes only a narrow int frame, the NB
    weight table stays broadcast, and the sweep collapses into a
    partial agg before its exchange — no Python, no cartesian blowup of
    anything wide."""
    plan = plan_of(spark, "txt_quality_pr_curve")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Generate" in plan  # the len(PR_THRESHOLDS)-way (17) explode
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_data_card_no_python_bounded_broadcasts(spark):
    """The card composes artifact aggregates: no Python anywhere, every
    1-row total rides a broadcast, no unbounded cartesian (the only
    cross joins are against broadcast 1-row totals)."""
    plan = plan_of(spark, "report_data_card")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row total composition
    assert "CartesianProduct" not in plan


def test_bm25_single_postings_scan_broadcast_probe(spark):
    """BM25: the query-term set broadcasts into the tokenizing scan (the
    inverted-index probe), document frequency is a window over the
    candidate postings — the corpus is tokenized ONCE (one (doc_id, term)
    partial-agg exchange), no cartesian, no Python, and the per-query
    top-K runs under WindowGroupLimit."""
    plan = plan_of(spark, "txt_bm25_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
    # exactly ONE candidate-postings aggregation exchange: a df-by-join
    # formulation would re-tokenize the corpus into a second one
    n_posting_exchanges = len(
        re.findall(r"Arguments: hashpartitioning\(doc_id#\d+L, term#\d+", plan)
    )
    assert n_posting_exchanges == 1, plan


def test_boilerplate_prefixes_no_explode_windowgrouplimit(spark):
    """Template detection: prefix is a pure projection (no Generate/
    explode node), one (source, prefix) aggregation, per-source top-K
    under WindowGroupLimit, nothing Python."""
    plan = plan_of(spark, "txt_boilerplate_prefixes")
    assert "Generate explode" not in plan
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def _scan_nodes(plan: str, kind: str = "Scan parquet") -> int:
    """Count physical scan NODES in a formatted plan (the tree line and
    the detail line both contain the substring — count detail headers)."""
    return len(re.findall(rf"^\(\d+\) {kind}", plan, re.M))


def test_bootstrap_single_scan(spark):
    """Poisson bootstrap: ONE documents scan — all replicate weights are
    projected columns into one partial agg, and the R output rows come
    from exploding a literal struct array over that 1-row aggregate (a
    per-replicate union would rescan the corpus per branch). No Python."""
    plan = plan_of(spark, "samp_bootstrap_replicates")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert _scan_nodes(plan) == 1, plan


def test_term_drift_reads_materialized_vocab_only(spark):
    """Token drift: the corpus tokenizes ONCE into the materialized
    per-token frame (both snapshot flags ride that single pass); the
    declared plan then reads ONLY the checkpointed vocab frame — zero
    parquet rescans, no cartesian, no Python."""
    plan = plan_of(spark, "report_term_drift")
    assert _scan_nodes(plan) == 0, plan
    assert "ExistingRDD" in plan  # the materialized per-token frame
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
