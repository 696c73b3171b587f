"""samp_bootstrap_replicates: Poisson(1) weights must (a) be
deterministic across runs, (b) produce replicate totals within the
bootstrap's statistical envelope of the true totals, and (c) actually
vary across replicates (distinct hash streams)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from deisa_ray_spark.functions.sampling import samp_bootstrap_replicates
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_bootstrap_replicates_envelope_and_determinism(spark):
    rows1 = {r["replicate"]: (r["n_docs_eff"], r["n_tokens_eff"])
             for r in samp_bootstrap_replicates(spark, SF_DIR).collect()}
    rows2 = {r["replicate"]: (r["n_docs_eff"], r["n_tokens_eff"])
             for r in samp_bootstrap_replicates(spark, SF_DIR).collect()}
    assert rows1 == rows2  # deterministic
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    # Poisson(1) sum over n docs: mean n, std sqrt(n); 6-sigma envelope
    for d_eff, _t in rows1.values():
        assert abs(d_eff - n) <= 6 * math.sqrt(n) + 1, (d_eff, n)
    # replicates use distinct hash streams — they should not all agree
    assert len({v[0] for v in rows1.values()}) > 1
    nt = F.size(F.split("text", " "))
    tok_true, tok_sq = docs.select(
        F.sum(nt), F.sum(nt * nt)
    ).first()
    # var(Σ w_i·x_i) = Σ x_i² for Poisson(1) weights; 6-sigma envelope
    for _d, t_eff in rows1.values():
        assert abs(t_eff - tok_true) <= 6 * math.sqrt(tok_sq), (t_eff, tok_true)
