"""Shared quality-score definitions — a LEAF module (imports only
pyspark) so both ``functions.text`` (txt_quality_score) and
``functions.dedup`` (dedup_keep_best's argmax) can use the ONE
definition without a module-level import cycle: text.py module-level
imports dedup (span helpers), so dedup must never module-level import
text — it imports from here instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and")


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    """# tokens that are one of ``words`` (JVM-side filter on the array)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def quality_col() -> Column:
    """The UNROUNDED composite quality score over ``text`` — the ONE
    Spark-side definition, consumed by txt_quality_score and by
    dedup_keep_best's per-cluster argmax (which compares the ROUNDED
    value: rounding-to-6 is what both engines reproduce bit-identically,
    so it is the safe cross-engine selection key). Mirrors
    QUALITY_SQL_CTE below — keep the two in lockstep (same
    sub-expression order and PARENTHESIZATION; float ops are not
    associative, and SQL's left-associative `0.3 * d / n` is a
    different float than `0.3 * (d / n)`)."""
    toks = _tokens()
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    stop_ratio = _count_in(toks, STOPWORDS) / n_tokens
    length_score = F.when((n_tokens >= 20) & (n_tokens <= 100), F.lit(1.0)).otherwise(
        n_tokens / F.lit(100.0)
    )
    return 0.4 * length_score + 0.3 * F.least(stop_ratio * 10, F.lit(1.0)) + 0.3 * ttr


#: the quality expression as a DuckDB CTE ``q(doc_id, quality)`` — the SQL
#: twin of :func:`quality_col`, composed into oracles that select by
#: quality (dedup_keep_best). Sub-expression order AND parenthesization
#: match quality_col exactly (see its docstring).
QUALITY_SQL_CTE = """q AS (
      SELECT doc_id,
             round(0.4 * (CASE WHEN len(toks) BETWEEN 20 AND 100 THEN 1.0
                               ELSE len(toks) / 100.0 END)
                 + 0.3 * least(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and'))) / len(toks) * 10, 1.0)
                 + 0.3 * (len(list_distinct(toks)) / len(toks)), 6) AS quality
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )"""
