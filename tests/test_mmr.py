"""Greedy MMR semantics: the Spark unrolled-round selection must equal a
pure-Python greedy reference (same rounded-cosine discipline, same
lambda blend, same id tie-break), including the running max-similarity
fold and anchor handling."""

from __future__ import annotations

import math
import random

from deisa_ray_spark.functions.sampling import MMR_K, MMR_LAMBDA, samp_mmr_topk
from tests.conftest import SF_DIR


def _cos6(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    # mirror the engine discipline: round half away from zero at 1e-6
    v = dot / (na * nb)
    return math.floor(v * 1e6 + 0.5) / 1e6 if v >= 0 else -math.floor(-v * 1e6 + 0.5) / 1e6


def _ref_mmr(vecs: dict[int, list[float]], k: int, lam: float):
    anchor = vecs[min(vecs)]
    mu = round(1 - lam, 6)
    rel = {i: _cos6(v, anchor) for i, v in vecs.items()}
    max_sim = {i: -1.0 for i in vecs}
    picks = []
    remaining = set(vecs)
    for r in range(1, k + 1):
        best = max(remaining, key=lambda i: (lam * rel[i] - mu * max_sim[i], -i))
        picks.append((r, best, rel[best], max_sim[best]))
        remaining.discard(best)
        for i in remaining:
            max_sim[i] = max(max_sim[i], _cos6(vecs[i], vecs[best]))
    return picks


def test_mmr_matches_python_reference_on_corpus(spark):
    got = [
        (r["rank"], r["vec_id"], r["rel"], r["max_sim"])
        for r in samp_mmr_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    import duckdb

    vecs = {
        int(i): [float(x) for x in e]
        for i, e in duckdb.sql(
            f"SELECT vec_id, embedding::DOUBLE[] FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    }
    want = _ref_mmr(vecs, MMR_K, MMR_LAMBDA)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-9 and abs(g[3] - w[3]) < 1e-9


def test_mmr_picks_are_diverse(spark):
    """The whole point: after the anchor, every pick's similarity to the
    already-selected set stays well under the corpus near-dup range."""
    rows = samp_mmr_topk(spark, SF_DIR).filter("rank > 1").collect()
    assert rows and all(r["max_sim"] < 0.6 for r in rows)


def _ref_strat_mmr(vecs, labels, kc, k, lam):
    """Pure-Python stratified MMR twin: lockstep per-label greedy rounds,
    then a global greedy merge over the candidates with a fresh fold."""
    anchor = vecs[min(vecs)]
    mu = round(1 - lam, 6)
    rel = {i: _cos6(v, anchor) for i, v in vecs.items()}
    max_sim = {i: -1.0 for i in vecs}
    remaining = set(vecs)
    cands = []
    for _ in range(kc):
        bylab = {}
        for i in remaining:
            key = (lam * rel[i] - mu * max_sim[i], -i)
            lab = labels[i]
            if lab not in bylab or key > bylab[lab][0]:
                bylab[lab] = (key, i)
        picks = {labels[p]: p for _, p in bylab.values()}
        cands.extend(sorted(picks.values()))
        for p in picks.values():
            remaining.discard(p)
        for i in remaining:
            if labels[i] in picks:
                max_sim[i] = max(max_sim[i], _cos6(vecs[i], vecs[picks[labels[i]]]))
    # global merge: greedy MMR over the candidate pool, max_sim reset
    msim = {i: -1.0 for i in cands}
    pool = set(cands)
    out = []
    for r in range(1, k + 1):
        best = max(pool, key=lambda i: (lam * rel[i] - mu * msim[i], -i))
        out.append((r, best, rel[best], msim[best],
                    round(lam * rel[best] - mu * msim[best], 6)))
        pool.discard(best)
        for i in pool:
            msim[i] = max(msim[i], _cos6(vecs[i], vecs[best]))
    return out


def test_mmr_stratified_matches_python_reference(spark):
    from deisa_ray_spark.functions.sampling import MMR_KC, samp_mmr_stratified

    got = [
        (r["rank"], r["vec_id"], r["rel"], r["max_sim"], r["score"])
        for r in samp_mmr_stratified(spark, SF_DIR).orderBy("rank").collect()
    ]
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding::DOUBLE[] FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(i): [float(x) for x in e] for i, _l, e in rows}
    labels = {int(i): int(l) for i, l, _e in rows}
    want = _ref_strat_mmr(vecs, labels, MMR_KC, MMR_K, MMR_LAMBDA)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-9 and abs(g[3] - w[3]) < 1e-9


def test_mmr_stratified_objective_near_global_greedy(spark):
    """Stratification is an approximation of global greedy — measure the
    deviation instead of assuming it: the summed λ-blend objective of
    the stratified picks must stay within 10% of global greedy's on the
    test SF (measured value recorded in PARITY.md)."""
    from deisa_ray_spark.functions.sampling import samp_mmr_stratified

    glob = sum(r["score"] for r in samp_mmr_topk(spark, SF_DIR).collect())
    strat = sum(r["score"] for r in samp_mmr_stratified(spark, SF_DIR).collect())
    assert strat >= 0.9 * glob, (strat, glob)


# ---------------------------------------------------------------------------
# k-center (farthest-point traversal) — the max-min sibling of MMR
# ---------------------------------------------------------------------------


def _ref_kcenter(vecs: dict[int, list[float]], k: int):
    max_sim = {i: -1.0 for i in vecs}
    picks = []
    remaining = set(vecs)
    for r in range(1, k + 1):
        best = min(remaining, key=lambda i: (max_sim[i], i))
        picks.append((r, best, max_sim[best]))
        remaining.discard(best)
        for i in remaining:
            max_sim[i] = max(max_sim[i], _cos6(vecs[i], vecs[best]))
    return picks


def test_kcenter_matches_python_reference_on_corpus(spark):
    from deisa_ray_spark.functions.sampling import KCENTER_K, samp_kcenter_coreset

    got = [
        (r["rank"], r["vec_id"], r["cov_sim"])
        for r in samp_kcenter_coreset(spark, SF_DIR).orderBy("rank").collect()
    ]
    import duckdb

    vecs = {
        int(i): [float(x) for x in e]
        for i, e in duckdb.sql(
            f"SELECT vec_id, embedding::DOUBLE[] FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    }
    want = _ref_kcenter(vecs, KCENTER_K)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-9


def test_kcenter_coverage_radius_monotone(spark):
    """cov_sim is non-decreasing over ranks (each pick is the CURRENT
    farthest point, so the uncovered radius can only shrink), and the
    first pick is the lowest vec_id with the -1.0 init sentinel."""
    from deisa_ray_spark.functions.sampling import samp_kcenter_coreset

    rows = samp_kcenter_coreset(spark, SF_DIR).orderBy("rank").collect()
    assert rows[0]["cov_sim"] == -1.0
    import duckdb

    min_id = duckdb.sql(
        f"SELECT min(vec_id) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchone()[0]
    assert rows[0]["vec_id"] == min_id
    sims = [r["cov_sim"] for r in rows[1:]]
    assert all(a <= b for a, b in zip(sims, sims[1:]))
