#!/usr/bin/env python
"""Benchmark harness: runs the headline declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over all benched queries. Each query is
forced to full materialization with a cheap count-style action (the driver
collects separately for correctness; here we only time the plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries: the scan/agg/join/window/sessionize relational core,
# the chunk-ingest grid path, and the training-data pipeline ops
# (dedup/similarity/text/multimodal).
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_top_customers_by_revenue",
    "q03_regional_revenue",
    "q04_priority_high_qty_orders",
    "q06_revenue_forecast",
    "q07_top3_parts_per_brand",
    "q10_rollup_lineitem",
    "q11_sessionize_events",
    "q13_asof_join_click_view",
    "q14_salted_agg_events",
    "q30_min_cost_supplier",
    "q33_gap_fill_locf",
    "q36_volume_shipping",
    "q40_priority_line_counts",
    "q45_local_supplier_volume",
    "q49_customer_distribution",
    "q51_large_volume_customers",
    "q53_retention_cohorts",
    "grid_ingest_checksum",
    "grid_matmul_tn",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_decontaminate",
    "dedup_decontaminate_fuzzy",
    # dedup_decontaminate_bloom is deliberately NOT benched: its oracle
    # twin computes only the exact semi-join side (the Bloom build +
    # probe + contract verification have no SQL equivalent), so a
    # wall-clock comparison would be structurally unfair in both
    # directions. It stays a fully oracle-checked declared query.
    "q54_fuzzy_name_linkage",
    "sim_bruteforce_topk",
    "txt_token_stats",
    "txt_tfidf",
    "txt_unigram_logprob",
    "txt_curate_batch",
    "txt_pii_scrub",
    "txt_ngram_novelty",
    "txt_length_buckets",
    "txt_dsir_weights",
    "dedup_semantic_buckets",
    "sim_range_search",
    "emb_scalar_quantize",
    "emb_whiten",
    "emb_cluster_stats",
    "mm_image_features",
    "mm_image_png_decode",
    "txt_bpe_encode",
    "mm_caption_filter",
    # round-7 headline additions (streaming window queries deliberately
    # NOT benched: their wall-clock is micro-batch scheduling + tempdir
    # staging, not query execution, so DuckDB comparison is unfair in
    # both directions — they stay fully oracle-checked)
    "dedup_keep_best",
    "txt_span_scrub",
    "sim_knn_graph",
    "samp_weighted_topk",
    "dedup_pagerank",
    "sim_binary_hamming_topk",
    # round-8 headline additions
    "sim_graph_beam_topk",
    "txt_wordpiece_encode",
    "txt_quality_infer",
    "txt_tokenizer_fertility_ab",
    "samp_mmr_topk",
    # round-9 headline additions: the served-ANN tier the user actually
    # runs (thermometer re-rank + IVF routing), the streaming
    # decontaminate gate (its wall-clock includes availableNow
    # micro-batch staging — kept in the panel anyway so the serving
    # tier is measured; the oracle twin is the same stateless semi-join,
    # so the comparison is fair in shape if generous to DuckDB), and
    # the round's new operators.
    "sim_thermo_hamming_topk",
    "sim_kmeans_ivf_topk",
    "stream_decontaminate",
    "txt_unigram_encode",
    "samp_mmr_stratified",
    "dedup_span_extents",
    "dedup_extent_length_hist",
    "txt_quality_pr_curve",
    # round-10 headline additions: the corpus-scaled graph-ANN serving
    # tier — the declared 10x contract (recall@10 0.94 measured at sf1
    # where the default tier drops to 0.64; benched because a user at
    # 10x corpus size runs THIS tier, not the default) — and the
    # snapshot mixture-drift card (one-scan stack + keyed partial agg).
    "sim_graph_beam_topk_scaled",
    "sim_graph_beam_topk_merged",
    "sim_graph_beam_topk_xl",
    "sim_tier_table",
    "report_snapshot_drift",
    "samp_mixture_rebalance",
    # round-10 session-2 additions: the standalone lexical ranker (single
    # postings scan), the max-min coreset selector, the embedding-space
    # prune list, streamed mergeable-sketch maintenance, the JSONL
    # delivery sink round-trip, and the Heaps vocab-growth curve.
    "txt_bm25_topk",
    "samp_kcenter_coreset",
    "emb_outlier_scores",
    "stream_cms_heavy_hitters",
    "sink_docs_jsonl_checksum",
    "txt_vocab_growth",
    "txt_boilerplate_prefixes",
    "report_term_drift",
    "emb_kmeans_exact",
    "dedup_tombstone_propagation",
    "stream_vocab_growth",
    "samp_bootstrap_replicates",
    "txt_lang_confusion",
    "sim_eval_mrr",
    "q55_event_anomaly_mad",
    "dedup_lsh_precision_audit",
    "sim_eval_mrr_served",
    "q56_event_transition_matrix",
    "dedup_minhash_estimate_audit",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # crude sf label from the directory name (".../sf0.1" -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    from deisa_ray_spark.registry import load_all
    from deisa_ray_spark.session import get_session

    # The testdata writes each table as ONE file/row group — capping
    # every scan at one task, a generator artifact no real table has.
    # Stage a schema-preserving ≥8-file split (per-process scratch,
    # rebuilt every invocation — no staged bytes survive across runs)
    # and bench against that, so scan parallelism is honest.
    # Oracles/correctness keep reading the original sf_dir.
    # Opt out with SPARK_GRAFT_BENCH_SPLIT=0.
    if os.environ.get("SPARK_GRAFT_BENCH_SPLIT", "1") != "0":
        from deisa_ray_spark.maintenance import stage_split_tables

        n_files = int(os.environ.get("SPARK_GRAFT_BENCH_SPLIT_FILES", "8"))
        staged = stage_split_tables(sf_dir, min_files=n_files)
        print(f"# bench tables staged split at {staged}", file=sys.stderr)
        sf_dir = staged

    specs = load_all()
    # Shuffle partitions = the ALLOCATED core count ($SPARK_GRAFT_CPUS,
    # the same value sizing local[N]) — matching cores measured ~9%
    # faster than 8 on the join-heavy queries at sf0.1; AQE still
    # coalesces the tiny stages. Derived, not hardcoded, and derived
    # from the allocation rather than os.cpu_count() so the driver's
    # lower-core-count scaling re-run gets a partitioning matched to
    # ITS cores, not this host's physical count. At cluster scale this
    # is 2-3× total cores instead — see session.get_session docstring.
    # Broadcast threshold covers every dimension table at this SF so
    # star joins never shuffle the big side.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_session(
        app_name="deisa_ray_spark_bench",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "64MB"},
    )

    # Untimed JVM/codegen warm-up: exercises whole-stage codegen, the
    # shuffle machinery, the vectorized parquet reader (on the 5-row
    # region table — no fact-table data is pre-cached), and one Python
    # worker, so the first timed query doesn't pay one-time JIT costs.
    # Extended r13 (guide §1.2 config/measurement hygiene): on a cold
    # JVM the C2 compiler burns ~45 s of CPU over the first minutes and
    # the first ~4 timed queries absorbed it (q01 measured 2.5-18 s vs
    # 0.3 s steady-state on the same host). The extra passes below are
    # SYNTHETIC (spark.range only — still no fact-table data touched)
    # and cover the plan shapes the panel opens with: broadcast hash
    # join + decimal aggregate + sort/limit, sort-merge join, window
    # functions (rank + lag), and one Arrow Python-worker roundtrip.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    warm = spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count()
    warm.write.format("noop").mode("overwrite").save()
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    region.groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    dim = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    fact = spark.range(2_000_000).select(
        (F.col("id") % 1_000).alias("k"),
        (F.col("id") % 97).cast("decimal(12,2)").alias("v"),
    )
    (
        fact.join(F.broadcast(dim), "k")
        .groupBy("g")
        .agg(F.sum("v").alias("sv"), F.avg("v").alias("av"))
        .orderBy(F.col("sv").desc())
        .limit(5)
        .write.format("noop").mode("overwrite").save()
    )
    (
        fact.join(dim.hint("merge"), "k")  # sort-merge join codegen
        .select("k", "g", "v")
        .write.format("noop").mode("overwrite").save()
    )
    wspec = _W.partitionBy("g").orderBy(F.col("v").desc())
    (
        fact.join(F.broadcast(dim), "k")
        .select(
            "g",
            "v",
            F.row_number().over(wspec).alias("rn"),
            F.lag("v").over(wspec).alias("pv"),
        )
        .where("rn <= 10")
        .write.format("noop").mode("overwrite").save()
    )
    (
        spark.range(10_000)
        .select(F.col("id"), (F.col("id") % 3).alias("m"))
        .mapInArrow(lambda it: it, "id long, m long")  # Python worker spin-up
        .write.format("noop").mode("overwrite").save()
    )

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    unknown = [n for n in BENCH_QUERIES if n not in specs]
    if unknown:
        # a typo'd/renamed entry must fail loudly, not silently shrink
        # the suite while the headline total still looks green
        raise KeyError(f"BENCH_QUERIES entries not in the registry: {unknown}")
    for name in BENCH_QUERIES:
        fn = specs[name].fn

        def run_once() -> float:
            t0 = time.perf_counter()
            # noop sink materializes every column (count() would let
            # Catalyst prune computed projections and under-report).
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # Steady-state protocol: min of 3 runs. The first run pays
        # one-time per-query costs that don't recur in production
        # (Catalyst analysis caches, codegen JIT compile of this plan,
        # Python worker reuse pools) and this host has noisy neighbors
        # (same query observed at 3.5 s and 61 s); the comparison point
        # (duckdb on the same host) is likewise measured warm.
        # A failing query records {"err": ...} and the bench keeps going —
        # one broken plan must never zero out the whole round's timings.
        try:
            # min-of-3: this host's noisy neighbors swing single runs
            # ±20-30%; three samples keep the recorded steady-state
            # number close to the true floor.
            dt = min(run_once(), run_once(), run_once())
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:500]
            print(f"# {name}: ERROR {msg.splitlines()[0][:200]}", file=sys.stderr)
            continue
        timings[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    out = {
        "metric": "declared_query_wall_clock",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # Self-archive the FULL panel next to this script: the driver's
    # BENCH_r{N}.json capture truncates to a 2000-char tail (r10 and
    # r11 each lost ~22 queries' timings), so per-query history lives
    # here and is committed as BENCH_FULL_r{N}.json at round close.
    try:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_latest.json"
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"# full panel archived at {path}", file=sys.stderr)
    except OSError as exc:  # read-only checkout must not fail the bench
        print(f"# archive skipped: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
