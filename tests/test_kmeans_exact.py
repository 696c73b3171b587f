"""emb_kmeans_exact: the fixed-point Lloyd trainer must equal a pure-
Python reference (same quantization, same floor-mean updates, same
argmin tie-break), and Lloyd's descent property must hold round over
round on the same quantized data."""

from __future__ import annotations

import math

import duckdb

from deisa_ray_spark.functions.similarity import KM_FP, KM_K, KM_ROUNDS, emb_kmeans_exact
from tests.conftest import SF_DIR


def _load_fp() -> dict[int, list[int]]:
    rows = duckdb.sql(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    return {
        int(i): [int(math.floor(x * KM_FP + 0.5)) for x in e] for i, e in rows
    }


def _lloyd(vecs: dict[int, list[int]], k: int, rounds: int):
    cent = {c: list(vecs[c]) for c in sorted(vecs)[:k]}
    assign: dict[int, tuple[int, int]] = {}
    history = []
    for _ in range(rounds):
        assign = {}
        for i, v in vecs.items():
            best = min(
                cent,
                key=lambda c: (
                    sum((a - b) ** 2 for a, b in zip(v, cent[c])),
                    c,
                ),
            )
            d = sum((a - b) ** 2 for a, b in zip(v, cent[best]))
            assign[i] = (best, d)
        history.append(sum(d for _, d in assign.values()))
        new_cent: dict[int, list[int]] = {}
        for c in cent:
            members = [vecs[i] for i, (a, _) in assign.items() if a == c]
            if members:
                n = len(members)
                new_cent[c] = [
                    int(math.floor(sum(col) / n)) for col in zip(*members)
                ]
        cent = new_cent
    return cent, assign, history


def test_kmeans_matches_python_reference(spark):
    vecs = _load_fp()
    cent, assign, _ = _lloyd(vecs, KM_K, KM_ROUNDS)
    want = {}
    for c in cent:
        members = [(i, d) for i, (a, d) in assign.items() if a == c]
        n = len(members)
        want[c] = (
            n,
            int(math.floor(sum(d for _, d in members) / n)),
            sum(cent[c]),
        )
    got = {
        r["cluster"]: (r["n_members"], r["inertia_mean"], r["c_fp_sum"])
        for r in emb_kmeans_exact(spark, SF_DIR).collect()
    }
    assert got == want


def test_kmeans_inertia_descends():
    """Lloyd on the quantized data: total inertia is non-increasing
    across the declared rounds (the descent property the trainer's
    round count relies on)."""
    vecs = _load_fp()
    _, _, history = _lloyd(vecs, KM_K, KM_ROUNDS)
    assert all(a >= b for a, b in zip(history, history[1:])), history
