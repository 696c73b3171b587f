"""sim_knn_graph adaptive refinement — the r7 weak-grade fix.

The old form silently EXCLUDED labels over the block cap from the graph;
these tests pin the new contract: every vector lands in a bounded block
and contributes ranked neighbors AT ANY BLOCK SIZE, via sign-bit
refinement for splittable hot labels and the md5 row-number salt for the
degenerate case (near-dup-rich labels whose members share sign patterns,
which no sign stage can split).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from deisa_ray_spark.functions.similarity import (
    _KNN_SALT_DEPTH,
    knn_assigned,
    knn_graph_from_assigned,
)

CAP = 10


def _emb_df(spark, vecs, label=7):
    return spark.createDataFrame(
        [(i, label, v) for i, v in enumerate(vecs)],
        "vec_id bigint, label int, e array<double>",
    )


def test_oversized_mixed_label_refines_and_keeps_everyone(spark):
    """A label 5x over the cap with mixed signs: sign-bit stages split
    it, every block lands under the cap, and EVERY vector still yields
    ranked neighbors (the old form dropped the whole label)."""
    rng = random.Random(42)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(5 * CAP)]
    assigned = knn_assigned(_emb_df(spark, vecs), cap=CAP)
    sizes = assigned.groupBy("bucket").count()
    assert sizes.filter(F.col("count") > CAP).count() == 0, "a block exceeds the cap"
    depths = {r["depth"] for r in assigned.select("depth").distinct().collect()}
    assert depths and all(d >= 1 for d in depths), "oversized label must refine"

    graph = knn_graph_from_assigned(assigned, k=3)
    got = {r["vec_id"] for r in graph.select("vec_id").distinct().collect()}
    # blocks could in principle contain singletons; with 50 random
    # vectors over 2-bit cells every block has >= 2 members, so every
    # vector must appear as a source node with rank-1..k rows
    assert got == set(range(5 * CAP)), "a vector was silently dropped from the graph"
    per = graph.groupBy("vec_id").count().select(F.min("count"), F.max("count")).first()
    assert per[0] >= 1 and per[1] <= 3


def test_identical_sign_label_salts_into_bounded_shards(spark):
    """The degenerate hot label: all members share every sign bit (the
    near-dup-rich case), so NO sign stage can split it — the md5
    row-number salt must cut exact <=cap shards and everyone still gets
    neighbors, tagged with the salt depth census value."""
    rng = random.Random(7)
    # strictly positive -> identical sign pattern at every stage
    n = 2 * CAP + CAP // 2
    vecs = [[rng.uniform(0.1, 1) for _ in range(16)] for _ in range(n)]
    assigned = knn_assigned(_emb_df(spark, vecs), cap=CAP)
    rows = assigned.select("bucket", "depth").collect()
    assert {r["depth"] for r in rows} == {_KNN_SALT_DEPTH}
    by_bucket: dict[str, int] = {}
    for r in rows:
        by_bucket[r["bucket"]] = by_bucket.get(r["bucket"], 0) + 1
    assert max(by_bucket.values()) <= CAP, "salt shard exceeds the cap"
    assert sum(by_bucket.values()) == n
    # shards are exact cap-size slices, remainder last
    assert sorted(by_bucket.values(), reverse=True) == [CAP, CAP, CAP // 2]

    graph = knn_graph_from_assigned(assigned, k=3)
    got = {r["vec_id"] for r in graph.select("vec_id").distinct().collect()}
    assert got == set(range(n)), "a salted vector was dropped from the graph"


def test_small_label_stays_at_depth_zero(spark):
    """Under-cap labels keep the whole-label block (depth 0) — the
    refinement must not fragment blocks that already fit."""
    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(CAP - 1)]
    assigned = knn_assigned(_emb_df(spark, vecs), cap=CAP)
    assert {r["depth"] for r in assigned.select("depth").distinct().collect()} == {0}
    assert assigned.select("bucket").distinct().count() == 1
