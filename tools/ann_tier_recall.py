#!/usr/bin/env python
"""ANN tier-selection measurements: replicate the sf0.1 embeddings
key-shifted + deterministically jittered to N× (copy 0 is the original
corpus, so the vec_id < N_QUERIES query panel is unchanged), then
measure graph-beam recall@10 against brute force for each candidate
(SERVE_K, BEAM_B, BEAM_R) tier. These runs are the data behind the
declared ``sim_tier_table`` contract (functions/similarity.py): a user
picks the tier row whose corpus band covers their n.

Jitter: uniform ±0.06 per dimension (component σ is ~0.125), derived
from DuckDB's 64-bit ``hash(copy, vec_id, dim)`` (a REAL hash as of
r12 — the earlier linear-congruential expression gave structured,
correlated perturbations across dims/ids; every declared tier-table
recall row is re-measured under the hashed jitter) — copies land in
the same label cluster but at materially different directions, so the
replicated corpus densifies the space instead of stacking clones per
point (which would make beam search trivially easy and bias recall
upward).

Run: ``python tools/ann_tier_recall.py [factor ...]`` (default 32).
Tiers measured per factor: the declared default (16,32,R3), the
declared scaled tier (48,96,R3), and the next log2-growth point
(96,192,R3) — see the growth-law sweep at similarity.py:1674.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_ANN_SRC", "/root/testdata/sf0.1")
DST_BASE = "/tmp/spark_graft_ann"
JITTER = 0.12  #: uniform width (±0.06)

#: (name, serve_k, beam_b, beam_r, clone_views) — the declared tier
#: configs plus the next growth point; merge comes from
#: SPARK_GRAFT_ANN_MERGE=1 (clone views imply nothing about merge).
TIERS = [
    ("default", 16, 32, 3, 0),
    ("scaled", 48, 96, 3, 0),
    ("xl", 96, 192, 3, 0),
    ("xl+clones", 96, 192, 3, 6),
]


def build_dataset(factor: int) -> str:
    import duckdb

    dst = f"{DST_BASE}{factor}"
    os.makedirs(dst, exist_ok=True)
    out = f"{dst}/embeddings.parquet"
    if os.path.exists(out):
        return dst
    con = duckdb.connect()
    maxv = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    parts = [f"SELECT vec_id, label, embedding FROM read_parquet('{SRC}/embeddings.parquet')"]
    for i in range(1, factor):
        parts.append(f"""
        SELECT vec_id + {i * maxv} AS vec_id, label,
               list_transform(generate_series(1, len(embedding)), j ->
                 CAST(embedding[j]
                      + ((hash({i}, vec_id, j) % 4096)
                         / 4096.0 - 0.5) * {JITTER} AS FLOAT)) AS embedding
        FROM read_parquet('{SRC}/embeddings.parquet')""")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT parquet)"
    )
    con.close()
    return dst


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [32]
    from deisa_ray_spark.session import get_session

    spark = get_session(app_name="ann_tier_recall", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from deisa_ray_spark.functions import similarity as S

    for factor in factors:
        dst = build_dataset(factor)
        n = spark.read.parquet(f"{dst}/embeddings.parquet").count()
        bf = {
            (r["qid"], r["neighbor_id"])
            for r in S.sim_bruteforce_topk(spark, dst).collect()
        }
        merge = os.environ.get("SPARK_GRAFT_ANN_MERGE") == "1"
        only = os.environ.get("SPARK_GRAFT_ANN_TIERS")  # comma-sep names
        for tier, serve_k, beam_b, beam_r, clone_views in TIERS:
            if only and tier not in only.split(","):
                continue
            t0 = time.time()
            beam = {
                (r["qid"], r["neighbor_id"])
                for r in S.graph_beam_topk(
                    spark, dst, serve_k=serve_k, beam_b=beam_b,
                    beam_r=beam_r, merge_round=merge,
                    clone_views=clone_views,
                ).collect()
            }
            dt = time.time() - t0
            rec = len(beam & bf) / len(bf)
            print(
                f"factor={factor} n={n} tier={tier}{'+merge' if merge else ''} "
                f"(k={serve_k},B={beam_b},R={beam_r},CV={clone_views}): "
                f"recall@{S.TOP_K} = {rec:.3f} ({len(beam & bf)}/{len(bf)}), "
                f"wall {dt:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
