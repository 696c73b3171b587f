"""Property-based tests for the JVM text-expression builders
(``shingles_col``, ``_span_hashes``, ``_tokens``) against independent
pure-Python references.

These expressions are built from slice+zip_with windows (see
shingles_col's docstring for why), which makes the length arithmetic
(``size - k + 1`` floored at 0) the risky part: off-by-ones only show at
edge lengths (empty string, single word, exactly k words). Hypothesis
drives those edges; every declared dedup/text query sits on top of
these three expressions.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deisa_ray_spark.functions.dedup import SHINGLE_K, shingles_col
from deisa_ray_spark.functions.text import _tokens


# words from a tiny alphabet maximize duplicate shingles (exercising
# array_distinct) while staying printable
_word = st.text(alphabet="abc", min_size=1, max_size=3)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _py_shingles(text: str, k: int = SHINGLE_K) -> list[str]:
    toks = text.split(" ")  # Spark split semantics: "" -> [""]
    grams = [" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))]
    seen, out = set(), []
    for g in grams:  # array_distinct keeps first occurrence order
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _py_span_hashes(text: str, k: int) -> list[str]:
    toks = text.split(" ")
    return [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(max(len(toks) - k + 1, 0))
    ]


@pytest.fixture(scope="module")
def one_col(spark):
    def run(text: str, col):
        df = spark.createDataFrame([(text,)], "text string").select(col.alias("v"))
        return df.collect()[0]["v"]

    return run


@given(_text)
@settings(max_examples=30, deadline=None)
def test_shingles_col_matches_python_reference(one_col, text):
    assert one_col(text, shingles_col()) == _py_shingles(text)


@given(_text)
@settings(max_examples=30, deadline=None)
def test_span_hashes_match_python_reference(one_col, text):
    from deisa_ray_spark.functions.dedup import SPAN_K, _span_hashes

    assert one_col(text, _span_hashes()) == _py_span_hashes(text, SPAN_K)


@given(_text)
@settings(max_examples=30, deadline=None)
def test_tokens_matches_python_split(one_col, text):
    assert one_col(text, _tokens()) == text.split(" ")


def test_edge_lengths_exact(one_col):
    """The exact boundary cases, spelled out (k = SHINGLE_K = 3)."""
    assert one_col("", shingles_col()) == []  # 1 token, < k
    assert one_col("a b", shingles_col()) == []  # k-1 tokens
    assert one_col("a b c", shingles_col()) == ["a b c"]  # exactly k
    assert one_col("a b c d", shingles_col()) == ["a b c", "b c d"]
    # duplicates collapse, first-occurrence order kept
    assert one_col("x x x x x", shingles_col()) == ["x x x"]
