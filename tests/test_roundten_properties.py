"""Randomized structural checks for the round-10 operators, beyond the
fixed-corpus oracle gate: each example stages a tiny random document
corpus as parquet and compares the declared Spark query against an
independent pure-Python brute force — so the semantics hold on corpora
the generator never shipped (sparse ids, skewed prefixes, tiny buckets).
"""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deisa_ray_spark.functions.sampling import BOOT_CDF_X1E6, BOOT_R
from deisa_ray_spark.functions.text import (
    BP_PREFIX_TOKENS,
    BP_TOP_K,
    VOCAB_GROWTH_BUCKETS,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
    min_size=3,
    max_size=25,
)


def _stage(tokens_per_doc, tmp, sparse: bool = False) -> str:
    rows = []
    for i, toks in enumerate(tokens_per_doc):
        doc_id = i * 3 if sparse else i  # sparse ids exercise empty buckets
        text = " ".join(toks)
        rows.append(
            (doc_id, text, "en", f"src{i % 3}", len(text))
        )
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=docs_strategy, sparse=st.booleans())
@_settings
def test_vocab_growth_matches_bruteforce(spark, docs, sparse):
    from deisa_ray_spark.functions.text import txt_vocab_growth

    with tempfile.TemporaryDirectory(prefix="prop_vg_") as tmp:
        _stage(docs, tmp, sparse)
        got = {
            r["bucket"]: (r["n_new_types"], r["n_types_cum"],
                          r["n_tokens_bucket"], r["n_tokens_cum"])
            for r in txt_vocab_growth(spark, tmp).collect()
        }
    # brute force on the same bucket rule
    max_id = (len(docs) - 1) * (3 if sparse else 1)
    n = max_id + 1
    per_bucket_tokens: Counter = Counter()
    first_seen: dict[str, int] = {}
    for i, toks in enumerate(docs):
        doc_id = i * 3 if sparse else i
        b = doc_id * VOCAB_GROWTH_BUCKETS // n
        per_bucket_tokens[b] += len(toks)
        for t in toks:
            first_seen[t] = min(first_seen.get(t, b), b)
    new_types = Counter(first_seen.values())
    want = {}
    types_cum = tokens_cum = 0
    for b in sorted(per_bucket_tokens):
        types_cum += new_types.get(b, 0)
        tokens_cum += per_bucket_tokens[b]
        want[b] = (new_types.get(b, 0), types_cum,
                   per_bucket_tokens[b], tokens_cum)
    assert got == want


@given(docs=docs_strategy)
@_settings
def test_boilerplate_prefixes_matches_bruteforce(spark, docs):
    from deisa_ray_spark.functions.text import txt_boilerplate_prefixes

    with tempfile.TemporaryDirectory(prefix="prop_bp_") as tmp:
        _stage(docs, tmp)
        got = {
            (r["source"], r["rank"]): (r["prefix"], r["n_docs"], r["share_x1e6"])
            for r in txt_boilerplate_prefixes(spark, tmp).collect()
        }
    by_source: dict[str, Counter] = {}
    totals: Counter = Counter()
    for i, toks in enumerate(docs):
        src = f"src{i % 3}"
        prefix = " ".join(toks[:BP_PREFIX_TOKENS])
        by_source.setdefault(src, Counter())[prefix] += 1
        totals[src] += 1
    want = {}
    for src, cnt in by_source.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (prefix, n) in enumerate(ranked[:BP_TOP_K], start=1):
            want[(src, rank)] = (prefix, n, n * 1_000_000 // totals[src])
    assert got == want


@given(docs=docs_strategy)
@_settings
def test_bootstrap_weights_match_bruteforce(spark, docs):
    """End-to-end check of the md5 uniform + literal Poisson CDF gate:
    the Spark totals equal a pure-Python recomputation of every weight,
    on corpora with arbitrary token counts."""
    import hashlib

    from deisa_ray_spark.functions.sampling import samp_bootstrap_replicates

    with tempfile.TemporaryDirectory(prefix="prop_bs_") as tmp:
        _stage(docs, tmp)
        got = {
            r["replicate"]: (r["n_docs_eff"], r["n_tokens_eff"])
            for r in samp_bootstrap_replicates(spark, tmp).collect()
        }

    def weight(doc_id: int, r: int) -> int:
        h = hashlib.md5(f"{doc_id}|{r}".encode()).hexdigest()[:8]
        u = int(h, 16) * 1_000_000 // 4294967296
        for k, t in enumerate(BOOT_CDF_X1E6):
            if u < t:
                return k
        return 8

    want = {}
    for r in range(1, BOOT_R + 1):
        d_eff = t_eff = 0
        for i, toks in enumerate(docs):
            w = weight(i, r)
            d_eff += w
            t_eff += w * len(toks)
        want[r] = (d_eff, t_eff)
    assert got == want
