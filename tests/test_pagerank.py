"""Fuzz the integer fixed-point PageRank against a pure-Python twin —
the same discipline as the incremental-CC union-find fuzz: random
undirected pair graphs, exact (bit-identical) integer agreement, plus
the structural invariants (mass bound, hub monotonicity on stars).

Reference semantics (deisa-ray has no graph ops; this is a north-star
extension): classic damped PageRank, d=0.85, run entirely in integer
fixed-point so shuffle order cannot perturb the result — see
functions/dedup.py::pagerank_fixed_point.
"""

from __future__ import annotations

import random

from deisa_ray_spark.functions.dedup import (
    PAGERANK_ROUNDS,
    PAGERANK_SCALE,
    pagerank_fixed_point,
)


def _py_pagerank(pairs: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Pure-Python twin: identical integer arithmetic, no Spark."""
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    pr = {v: PAGERANK_SCALE // n for v in adj}
    for _ in range(rounds):
        inc = {v: 0 for v in adj}
        for v, nbrs in adj.items():
            c = pr[v] // len(nbrs)
            for u in nbrs:
                inc[u] += c
        pr = {
            v: (15 * PAGERANK_SCALE) // (100 * n) + (85 * inc[v]) // 100
            for v in adj
        }
    return pr


def _spark_pagerank(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    return {r["id"]: r["pr"] for r in pagerank_fixed_point(df).collect()}


def _random_pairs(rng: random.Random, n_nodes: int, n_edges: int) -> list[tuple[int, int]]:
    seen: set[tuple[int, int]] = set()
    while len(seen) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        seen.add((min(a, b), max(a, b)))
    return sorted(seen)


def test_matches_python_twin_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(4):
        pairs = _random_pairs(rng, n_nodes=12 + 4 * trial, n_edges=18 + 6 * trial)
        got = _spark_pagerank(spark, pairs)
        want = _py_pagerank(pairs, PAGERANK_ROUNDS)
        assert got == want, f"trial {trial}: integer PR diverged from the twin"


def test_mass_bounded_and_positive(spark):
    rng = random.Random(11)
    pairs = _random_pairs(rng, n_nodes=20, n_edges=35)
    pr = _spark_pagerank(spark, pairs)
    # every node keeps at least the teleport floor; integer division only
    # ever LOSES mass, so the total never exceeds the scale
    n = len({v for p in pairs for v in p})
    floor = (15 * PAGERANK_SCALE) // (100 * n)
    assert all(v >= floor for v in pr.values())
    assert sum(pr.values()) <= PAGERANK_SCALE


def test_star_hub_dominates(spark):
    # star graph: the hub must outrank every leaf (the per-cluster
    # hub_rank contract dedup_pagerank builds on)
    pairs = [(0, i) for i in range(1, 9)]
    pr = _spark_pagerank(spark, pairs)
    hub = pr[0]
    assert all(hub > v for k, v in pr.items() if k != 0)
