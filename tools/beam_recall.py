"""Measure sim_graph_beam_topk recall@10 vs sim_bruteforce_topk and the
entry-stage scoring budget (hierarchical upper layer vs the flat
one-entry-per-base-block scan it replaced). Run:

    python tools/beam_recall.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    # the engine session factory (NOT a bare builder: the scaled-tier
    # k=48 graph builds at sf1 OOM the 1g stock driver default)
    from deisa_ray_spark.session import get_session

    spark = get_session(app_name="beam_recall", shuffle_partitions=32)
    from deisa_ray_spark.functions import similarity as S

    import math

    # SPARK_GRAFT_BEAM_SCALED: "1" = corpus-derived multiplier sweep;
    # "tier" = the DECLARED sim_graph_beam_topk_scaled constants
    # (SCALED_SERVE_K, SCALED_BEAM_B) — the r10 contract measurement.
    scaled = os.environ.get("SPARK_GRAFT_BEAM_SCALED") == "1"
    tier = os.environ.get("SPARK_GRAFT_BEAM_SCALED") == "tier"
    for sf_dir in dirs:
        bf = {
            (r["qid"], r["neighbor_id"])
            for r in S.sim_bruteforce_topk(spark, sf_dir).collect()
        }
        if tier:
            serve_k, beam_b = S.SCALED_SERVE_K, S.SCALED_BEAM_B
            print(f"# declared scaled tier: serve_k={serve_k} beam_b={beam_b}")
        elif scaled:
            # corpus-scaled serving tier (the HNSW ef/M-grows-with-n
            # posture): out-links and beam width grow ~log2 of the
            # corpus-size multiple over the toy reference point.
            from deisa_ray_spark.sources.registry import load_table

            n = load_table(spark, sf_dir, "embeddings").count()
            mult = max(1, int(math.log2(max(n / 2000, 1))) + 1)
            serve_k, beam_b = S.SERVE_K * mult, S.BEAM_B * mult
            print(f"# scaled tier: n={n} mult={mult} "
                  f"serve_k={serve_k} beam_b={beam_b}")
        else:
            serve_k, beam_b = S.SERVE_K, S.BEAM_B
        t0 = time.time()
        beam = {
            (r["qid"], r["neighbor_id"])
            for r in S.graph_beam_topk(
                spark, sf_dir, serve_k=serve_k, beam_b=beam_b
            ).collect()
        }
        dt = time.time() - t0
        n_base_blocks = (
            S.knn_assigned_cached(spark, sf_dir).select("bucket").distinct().count()
        )
        n_upper_entries = (
            S.upper_assigned_cached(spark, sf_dir).select("bucket").distinct().count()
        )
        print(
            f"{sf_dir}: recall@{S.TOP_K} = {len(beam & bf) / len(bf):.3f} "
            f"({len(beam & bf)}/{len(bf)}), beam wall {dt:.2f}s (warm artifacts), "
            f"entry scores/query: flat={n_base_blocks} upper={n_upper_entries} "
            f"({n_base_blocks / max(n_upper_entries, 1):.1f}x fewer)"
        )


if __name__ == "__main__":
    main()
