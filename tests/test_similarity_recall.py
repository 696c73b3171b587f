"""ANN recall vs the exact brute-force baseline — the standard quality
measure. The declared queries now emit this contract as oracle-checked
booleans; these tests re-derive the numbers from the raw neighbor sets
so a bug in the contract wrapper cannot vacuously pass."""

from __future__ import annotations

from deisa_ray_spark.functions.similarity import (
    kmeans_ivf_neighbors,
    pq_adc_neighbors,
)
from deisa_ray_spark.registry import load_all
from tests.conftest import SF_DIR

QUERIES = load_all()


def _topk_sets(df, key="qid", val="neighbor_id"):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r[key], set()).add(r[val])
    return out


def test_kmeans_ivf_recall_vs_bruteforce(spark):
    from deisa_ray_spark.functions.similarity import IVF_PROBES

    exact = _topk_sets(QUERIES["sim_bruteforce_topk"].fn(spark, SF_DIR))
    ivf_df = kmeans_ivf_neighbors(spark, SF_DIR)
    approx = _topk_sets(ivf_df)
    assert set(approx) == set(exact)  # every query answered
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    # embeddings are near-uniform (max cosine ~0.47) — the hardest case
    # for IVF; multi-probe (IVF_PROBES of 8 cells) measured 0.74-0.92
    # across SFs, so 0.6 holds with margin
    assert mean_recall >= 0.6, f"mean recall {mean_recall:.3f}"
    # and the scan was actually restricted: each query's results come
    # from at most IVF_PROBES distinct cells
    import pyspark.sql.functions as F

    per_q = (
        ivf_df.groupBy("qid")
        .agg(F.countDistinct("cell").alias("n_cells"))
        .agg(F.max("n_cells"))
        .collect()[0][0]
    )
    assert per_q <= IVF_PROBES

    # probe-1 reproduces the classic single-cell IVF (the km.transform
    # assignment): still answers every query and beats random
    one = _topk_sets(kmeans_ivf_neighbors(spark, SF_DIR, n_probes=1))
    assert set(one) == set(exact)
    r1 = sum(len(exact[q] & one[q]) / len(exact[q]) for q in exact) / len(exact)
    assert r1 >= 0.1, f"probe-1 recall {r1:.3f}"


def test_ivf_pq_recall_vs_bruteforce(spark):
    from deisa_ray_spark.functions.similarity import TOP_K, ivf_pq_neighbors

    exact = _topk_sets(QUERIES["sim_bruteforce_topk"].fn(spark, SF_DIR))
    approx = _topk_sets(ivf_pq_neighbors(spark, SF_DIR))
    assert set(approx) == set(exact)  # every query answered
    assert all(len(v) == TOP_K for v in approx.values())
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    # the composed path can at best retrieve what BOTH stages keep;
    # measured 0.60-0.86 across SFs — 0.5 holds with margin
    assert mean_recall >= 0.5, f"mean recall {mean_recall:.3f}"


def test_ivf_pq_probe_all_equals_plain_pq(spark):
    """Consistency invariant of the composition: probing EVERY coarse
    cell makes the IVF restriction a no-op, so the composed path must
    reproduce plain PQ/ADC exactly (same shortlist, same re-ranked
    rows) — pins the candidate-restricted ADC branch against the
    unrestricted one."""
    from deisa_ray_spark.functions.similarity import (
        IVF_CELLS,
        ivf_pq_neighbors,
        pq_adc_neighbors,
    )

    full = sorted(
        tuple(r) for r in ivf_pq_neighbors(spark, SF_DIR, n_probes=IVF_CELLS).collect()
    )
    plain = sorted(tuple(r) for r in pq_adc_neighbors(spark, SF_DIR).collect())
    assert full == plain


def test_rp_lsh_recall_vs_bruteforce(spark):
    exact = _topk_sets(QUERIES["sim_bruteforce_topk"].fn(spark, SF_DIR))
    approx = _topk_sets(QUERIES["sim_rp_lsh_topk"].fn(spark, SF_DIR))
    # single-probe 8-bit LSH: every query must still find candidates in
    # its own bucket (its own sign pattern is never empty — it contains
    # at least vectors sharing the pattern) and beat random recall
    assert set(approx) == set(exact)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.1, f"mean recall {mean_recall:.3f}"


def test_pq_adc_recall_vs_bruteforce(spark):
    exact = _topk_sets(QUERIES["sim_bruteforce_topk"].fn(spark, SF_DIR))
    approx_df = pq_adc_neighbors(spark, SF_DIR)
    approx = _topk_sets(approx_df)
    assert set(approx) == set(exact)  # every query answered
    # every query returns exactly TOP_K re-ranked survivors
    from deisa_ray_spark.functions.similarity import TOP_K

    assert all(len(v) == TOP_K for v in approx.values())
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    # ADC shortlist (PQ_SHORTLIST of the corpus) + exact re-rank on
    # near-uniform vectors: measured 0.76-0.86 across SFs at depth 100
    assert mean_recall >= 0.6, f"mean recall {mean_recall:.3f}"


def test_graph_beam_recall_vs_bruteforce(spark):
    """Graph-ANN serving: hierarchical md5-sample entry layer, block +
    geometric-view union edges at SERVE_K=16, undirected, upper beam
    B=16 x R=1 then base beam B=32 x R=3. Measured 1.000 recall@10 at
    all of sf0.001/0.01/0.1 (r9; r8's flat-entry k=5 config was
    0.98/1.00/0.90) — floor left conservative for testdata
    regeneration."""
    exact = _topk_sets(QUERIES["sim_bruteforce_topk"].fn(spark, SF_DIR))
    approx = _topk_sets(QUERIES["sim_graph_beam_topk"].fn(spark, SF_DIR))
    assert set(approx) == set(exact)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.75, f"mean recall {mean_recall:.3f}"


def test_thermo_hamming_recall_vs_bruteforce(spark):
    """3-bit thermometer codes at the same shortlist budget as the 1-bit
    sign codes: measured 0.98/1.00/0.90 at sf0.001/0.01/0.1 (1-bit was
    0.82 at sf0.1) — conservative floor for testdata regeneration."""
    exact = _topk_sets(QUERIES["sim_bruteforce_topk"].fn(spark, SF_DIR))
    approx = _topk_sets(QUERIES["sim_thermo_hamming_topk"].fn(spark, SF_DIR))
    assert set(approx) == set(exact)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.8, f"mean recall {mean_recall:.3f}"


def test_graph_beam_knobs_default_equals_declared(spark):
    """The parameterized serving engine with compile-time defaults IS
    the declared query; a non-default tier still returns a valid
    full-coverage top-k frame (the corpus-scaled serving path)."""
    from deisa_ray_spark.functions.similarity import (
        N_QUERIES,
        TOP_K,
        graph_beam_topk,
        sim_graph_beam_topk,
    )

    declared = {(r["qid"], r["rank"], r["neighbor_id"])
                for r in sim_graph_beam_topk(spark, SF_DIR).collect()}
    default = {(r["qid"], r["rank"], r["neighbor_id"])
               for r in graph_beam_topk(spark, SF_DIR).collect()}
    assert declared == default
    tier = graph_beam_topk(spark, SF_DIR, serve_k=24, beam_b=48).collect()
    assert len({r["qid"] for r in tier}) == min(
        N_QUERIES, len({r["qid"] for r in tier})
    )
    per_q = {}
    for r in tier:
        per_q.setdefault(r["qid"], set()).add(r["rank"])
    assert all(ranks == set(range(1, TOP_K + 1)) for ranks in per_q.values())
