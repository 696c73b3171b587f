"""Maximal duplicated-substring extents: the Spark gaps-and-islands
chaining must equal a pure-Python reference built from raw text, and the
extents must satisfy the maximality/disjointness invariants ExactSubstr
semantics promise (Lee et al. 2022 §4)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from deisa_ray_spark.functions.dedup import SPAN_K, dedup_span_extents
from tests.conftest import SF_DIR


def _ref_extents(texts: dict[int, str]):
    grams = defaultdict(set)  # md5 -> {doc_id}
    pos_hashes = {}  # doc_id -> [(pos, h)]
    for d, t in texts.items():
        w = t.split(" ")
        ph = []
        for i in range(len(w) - SPAN_K + 1):
            h = hashlib.md5(" ".join(w[i : i + SPAN_K]).encode()).hexdigest()
            ph.append((i + 1, h))
            grams[h].add(d)
        pos_hashes[d] = ph
    shared = {h for h, ds in grams.items() if len(ds) >= 2}
    out = []
    for d, ph in pos_hashes.items():
        hits = [(p, h) for p, h in ph if h in shared]
        run = []
        for p, h in hits:
            if run and p - run[-1][0] > SPAN_K:
                out.append((d, run))
                run = []
            run.append((p, h))
        if run:
            out.append((d, run))
    rows = []
    for d, run in out:
        start = run[0][0]
        end = run[-1][0] + SPAN_K - 1
        ndocs = [len(grams[h]) for _, h in run]
        rows.append((d, start, end, end - start + 1, len(run), min(ndocs), max(ndocs)))
    return sorted(rows)


def test_span_extents_match_python_reference(spark):
    texts = {
        int(d): t
        for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    got = sorted(
        (
            r["doc_id"],
            r["start_word"],
            r["end_word"],
            r["n_words"],
            r["n_grams"],
            r["min_docs_sharing"],
            r["max_docs_sharing"],
        )
        for r in dedup_span_extents(spark, SF_DIR).collect()
    )
    assert got == _ref_extents(texts)


def test_span_extents_invariants(spark):
    """Per doc: extents are disjoint, in gram-gap > SPAN_K separation
    (maximality — two closer extents would have chained), and every
    extent is at least one full gram long."""
    by_doc = defaultdict(list)
    for r in dedup_span_extents(spark, SF_DIR).collect():
        assert r["n_words"] >= SPAN_K
        assert r["end_word"] == r["start_word"] + r["n_words"] - 1
        assert r["min_docs_sharing"] >= 2
        assert r["min_docs_sharing"] <= r["max_docs_sharing"]
        by_doc[r["doc_id"]].append((r["start_word"], r["end_word"]))
    assert by_doc, "corpus should contain shared spans"
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 < s2, "extents overlap — chaining failed"
            # maximality: the next extent's first gram starts more than
            # SPAN_K words after this extent's last gram start
            assert s2 - (e1 - SPAN_K + 1) > SPAN_K


# ---------------------------------------------------------------------------
# Property fuzz of the SQL twin (no Spark in the loop — the mirrors pin
# Spark == twin; this pins twin == the pure-Python reference on
# adversarial corpora: gram hits at exactly the SPAN_K chaining
# boundary, whole-doc duplicates, sub-SPAN_K docs, singleton grams).
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.sampled_from(["a", "b", "c", "d"])
_TEXT = st.lists(_WORD, min_size=0, max_size=26).map(" ".join)


@given(st.lists(_TEXT, min_size=2, max_size=8))
@settings(max_examples=60, deadline=None)
def test_extents_oracle_matches_python_on_random_corpora(texts):
    import duckdb
    import pandas as pd

    from deisa_ray_spark.functions.dedup import _extents_sql

    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", docs)
    got = sorted(
        tuple(r)
        for r in con.execute(
            "WITH " + _extents_sql() + """
            SELECT doc_id, start_word, end_word, n_words, n_grams,
                   min_docs_sharing, max_docs_sharing FROM xextents"""
        ).fetchall()
    )
    want = _ref_extents({int(d): t for d, t in zip(docs.doc_id, docs.text)})
    assert got == [tuple(w) for w in want]
