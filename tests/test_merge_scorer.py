"""The r13 NN-descent merge scorer: the broadcast-matrix id-pair path
must be exactly the vector-join + pair-dot path it replaced — same
rows, same rounded cosines, same ranks — and the band cap must route
oversized stores to the fallback."""

import pyspark.sql.functions as F

from deisa_ray_spark.functions.dedup import norm_agg
from deisa_ray_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def _directed_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_merge_scorer_paths_identical(spark, monkeypatch):
    """Force the fallback (cap=0) and compare against the primary
    broadcast-matrix grouped-top-k path on the same inputs: identical
    edge sets. The float path matches by construction (same float64
    dot, one double division, round-half-away-6 before ranking, ties
    cosine DESC / candidate ASC); this pins it against the
    join + pair-dot + window shape."""
    import deisa_ray_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    live = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    vectors = live.select("vec_id", "e").withColumn("nrm", norm_agg(F.col("e")))
    und = sim.serve_edges_from(live)

    primary = sim.merged_directed_from(und, vectors)
    assert (
        sim._merge_topk_vs_store(spark, vectors, sim.SERVE_K) is not None
    )  # store < cap

    monkeypatch.setattr(sim, "MERGE_MATRIX_CAP", 0)
    fallback = sim.merged_directed_from(und, vectors)
    assert (
        sim._merge_topk_vs_store(spark, vectors, sim.SERVE_K) is None
    )  # cap routes away

    p, f = _directed_set(primary), _directed_set(fallback)
    assert p == f and len(p) > 0


def test_merge_scorer_drops_uncovered_ids_like_inner_join(spark):
    """Contract edge: pairs whose endpoint is missing from ``vectors``
    are DROPPED (the former inner joins' semantics), not scored and
    not an error."""
    import deisa_ray_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    live = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    vectors = live.select("vec_id", "e").withColumn("nrm", norm_agg(F.col("e")))
    und = sim.serve_edges_from(live)
    covered = vectors.filter(F.col("vec_id") % 7 != 0)

    got = sim.merged_directed_from(und, covered)
    ids = {r["vec_id"] for r in covered.select("vec_id").collect()}
    bad = [
        (r["src"], r["dst"])
        for r in got.collect()
        if r["src"] not in ids or r["dst"] not in ids
    ]
    assert bad == []
