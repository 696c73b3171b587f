#!/usr/bin/env python
"""Correctness spot-mirror at the self-generated 10x point (sf1): run
every declared query AND its DuckDB oracle against
``$SPARK_GRAFT_SF1_DIR`` (default /tmp/spark_graft_sf1, from
tools/gen_sf1.py) and compare rows/schema/values with the driver's
convention (columns sorted by name, values stringified after a stable
row sort).

The sf1 point was perf-only until round 9 — this makes "correct at 10x"
measured data instead of an extrapolation from the three toy SFs.

DuckDB guardrails (the round-8 disk-fill lesson): spill directory
pinned under /tmp with a 30 GB cap, and every oracle runs under a
hard interrupt (ORACLE_CAP_S, default 90 s). Oracles that exceed the
cap are recorded as ``capped`` — the two known recursive-CTE chains
(the verified-pair graph family) spill > 40 GB uncapped and were each
measured > 90 s in the round-8 scaling study; a capped oracle is a
DuckDB-cost fact, not a correctness failure, and the Spark side still
runs (its timing is recorded).

Output: one JSON line to stdout + a human summary to stderr. PARITY.md
records the green count and the capped list.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
ORACLE_CAP_S = float(os.environ.get("SPARK_GRAFT_SF1_ORACLE_CAP", "90"))
#: SPOT-mirror scope: "bench" (default — the headline panel plus the
#: round-9 additions, the subset whose oracle cost was measured
#: tractable in the round-8 scaling study), "rest" (the complement —
#: every declared query NOT in the bench scope; the discovery sweep for
#: oracle-side pathologies), or "all" (every declared query — the full
#: audit; the heavy oracle tail can make this a multi-hour run).
SCOPE = os.environ.get("SPARK_GRAFT_SF1_SCOPE", "bench")
EXTRA_QUERIES = [
    # round-9 additions not (or only partially) on the bench panel
    "stream_serve_graph",
    "txt_unigram_train",
    "txt_unigram_vocab",
    "report_data_card",
    "samp_mmr_topk",
    # round-10: the open-vocabulary tokenizer holdout A/B (kept off the
    # bench panel — it triples tokenizer training per run — but its 10x
    # correctness point belongs in the mirror); the formerly-capped
    # graph-family pair re-enters via the bench panel automatically.
    "txt_tokenizer_fertility_holdout",
    "stream_serve_graph_upsert",
    # round-11: UNK-free byte-fallback WordPiece on the same holdout
    "txt_wp_byte_fallback_holdout",
    # round-13 (judge ask #3): the r12-touched/new queries that had no
    # sf1 artifact entry — the two reworked cosine kernels, the merged
    # maintainer equivalence oracle, and the baseline-JPEG decode
    "dedup_embedding_cosine",
    "dedup_decontaminate_semantic",
    "stream_serve_graph_merged",
    "mm_image_jpeg_decode",
]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _cmp_frames(spd, opd) -> str:
    spd = spd.reindex(sorted(spd.columns), axis=1)
    opd = opd.reindex(sorted(opd.columns), axis=1)
    if list(spd.columns) != list(opd.columns):
        return f"schema: {list(spd.columns)} vs {list(opd.columns)}"
    if spd.shape != opd.shape:
        return f"rows: {spd.shape} vs {opd.shape}"
    cols = sorted(spd.columns)
    spd = spd.sort_values(by=cols).reset_index(drop=True).astype(str)
    opd = opd.sort_values(by=cols).reset_index(drop=True).astype(str)
    if not spd.equals(opd):
        bad = [c for c in cols if not spd[c].equals(opd[c])]
        return f"values: {bad}"
    return ""


def main() -> None:
    import duckdb

    from deisa_ray_spark.registry import load_all
    from deisa_ray_spark.session import get_session

    spark = get_session(
        app_name="sf1_mirror", shuffle_partitions=max(8, os.cpu_count() or 8)
    )
    # Spark reads the same ≥8-file split staging bench.py applies at
    # every SF (r13): the generator's one-file/one-row-group layout caps
    # every scan at ONE task, which serializes the heavy per-row
    # expansion stages — the span family's "superlinear" sf1 cost in the
    # r11/r12 artifacts was exactly this (measured: the whole 2.4M-span
    # tokenize+md5 chain ran as a single task). The oracle keeps reading
    # the raw files, as everywhere else. Opt out: SPARK_GRAFT_BENCH_SPLIT=0.
    spark_sf1_dir = SF1_DIR
    if os.environ.get("SPARK_GRAFT_BENCH_SPLIT", "1") != "0":
        from deisa_ray_spark.maintenance import stage_split_tables

        spark_sf1_dir = stage_split_tables(SF1_DIR, min_files=8)
        print(f"# spark tables staged split at {spark_sf1_dir}", file=sys.stderr)
    specs = load_all()
    only = os.environ.get("SPARK_GRAFT_SF1_ONLY")
    if only:
        names = {n.strip() for n in only.split(",")}
        specs = {n: s for n, s in specs.items() if n in names}
    elif SCOPE in ("bench", "rest"):
        from bench import BENCH_QUERIES

        wanted = set(BENCH_QUERIES) | set(EXTRA_QUERIES)
        if SCOPE == "rest":
            specs = {n: s for n, s in specs.items() if n not in wanted}
        else:
            specs = {n: s for n, s in specs.items() if n in wanted}
    results: dict[str, dict] = {}
    counts = {"green": 0, "mismatch": 0, "capped": 0, "rows_only": 0, "error": 0}
    for name, spec in sorted(specs.items()):
        rec: dict = {}
        t0 = time.time()
        # Raw-FILE queries (read_blob oracles, e.g. mm_binary_ingest's
        # binaryFile listing) must see the SAME file set as their
        # retargeted oracle — the split staging rewrites table layout
        # (one file -> a directory of parts), so a file-listing query
        # over the staged dir would compare different inputs (found as
        # a 0-vs-10-row mismatch the first time the FULL mirror ran
        # with staging; every per-table reader is unaffected).
        spark_dir = SF1_DIR if (spec.oracle and "read_blob" in spec.oracle) else spark_sf1_dir
        try:
            spd = spec.fn(spark, spark_dir).toPandas()
            rec["spark_s"] = round(time.time() - t0, 2)
            rec["rows"] = int(spd.shape[0])
        except Exception as e:  # noqa: BLE001 — record and continue
            rec["status"] = "error"
            rec["detail"] = f"spark: {type(e).__name__}: {e}"[:300]
            counts["error"] += 1
            results[name] = rec
            print(f"{name}: SPARK ERROR {rec['detail']}", file=sys.stderr)
            continue
        # path-pinned oracle (mm_binary_ingest's read_blob bakes a dir
        # into static SQL): retarget it at the mirror's SF dir so both
        # engines list the same files. The baked dir comes from the
        # module's own constant (the one definition), and any pinned
        # path that survives the substitution is a loud failure — a
        # silent no-op would compare engines over different file sets.
        from deisa_ray_spark.functions.multimodal import BLOB_ORACLE_DIR

        oracle = (
            spec.oracle.replace(BLOB_ORACLE_DIR, SF1_DIR) if spec.oracle else None
        )
        if oracle and "read_blob" in oracle and SF1_DIR not in oracle:
            raise RuntimeError(
                f"{name}: path-pinned oracle not retargeted — baked dir "
                f"does not match BLOB_ORACLE_DIR ({BLOB_ORACLE_DIR})"
            )
        if oracle is None:
            rec["status"] = "rows_only"
            counts["rows_only"] += 1
            results[name] = rec
            print(f"{name}: rows-only ({rec['rows']} rows, "
                  f"{rec['spark_s']}s)", file=sys.stderr)
            continue
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        con.execute("SET max_temp_directory_size='30GB'")
        for t in TABLES:
            p = os.path.join(SF1_DIR, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        timer = threading.Timer(ORACLE_CAP_S, con.interrupt)
        timer.start()
        t1 = time.time()
        try:
            opd = con.execute(oracle).df()
            rec["oracle_s"] = round(time.time() - t1, 2)
        except duckdb.InterruptException:
            rec["status"] = "capped"
            rec["oracle_s"] = round(time.time() - t1, 2)
            counts["capped"] += 1
            results[name] = rec
            print(f"{name}: oracle CAPPED at {ORACLE_CAP_S}s "
                  f"(spark {rec['spark_s']}s ok)", file=sys.stderr)
            continue
        except Exception as e:  # noqa: BLE001
            # Some DuckDB versions surface con.interrupt() as a generic
            # duckdb.Error("INTERRUPT Error: ...") instead of
            # InterruptException — still a cap, not an oracle error. Only
            # reclassify when the cap timer actually FIRED (elapsed past
            # the cap): an unrelated error whose message merely mentions
            # "interrupted" must stay on the error channel.
            if (
                "INTERRUPT" in str(e).upper()
                and time.time() - t1 >= ORACLE_CAP_S
            ):
                rec["status"] = "capped"
                rec["oracle_s"] = round(time.time() - t1, 2)
                counts["capped"] += 1
                results[name] = rec
                print(f"{name}: oracle CAPPED at {ORACLE_CAP_S}s "
                      f"(spark {rec['spark_s']}s ok)", file=sys.stderr)
                continue
            rec["status"] = "error"
            rec["detail"] = f"oracle: {type(e).__name__}: {e}"[:300]
            counts["error"] += 1
            results[name] = rec
            print(f"{name}: ORACLE ERROR {rec['detail']}", file=sys.stderr)
            continue
        finally:
            timer.cancel()
            con.close()
        diff = _cmp_frames(spd, opd)
        if diff:
            rec["status"] = "mismatch"
            rec["detail"] = diff
            counts["mismatch"] += 1
        else:
            rec["status"] = "green"
            counts["green"] += 1
        results[name] = rec
        print(f"{name}: {rec['status']} ({rec['rows']} rows, spark "
              f"{rec['spark_s']}s, oracle {rec.get('oracle_s')}s)",
              file=sys.stderr)
    summary = {
        "sf_dir": SF1_DIR,
        "oracle_cap_s": ORACLE_CAP_S,
        "n_queries": len(results),
        **counts,
        "capped_list": [n for n, r in results.items() if r["status"] == "capped"],
        "mismatch_list": [n for n, r in results.items()
                          if r["status"] == "mismatch"],
        "error_list": [n for n, r in results.items() if r["status"] == "error"],
        "queries": results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
