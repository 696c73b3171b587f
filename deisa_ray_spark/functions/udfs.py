"""User-defined-function surface: Arrow-vectorized scalar pandas UDF
(SQL-registered) and a grouped-map pandas UDAF.

The reference's entire query surface IS user-defined Python (callbacks
over Dask arrays — SURVEY §2.C "UDF surface"); here that capability is
pinned the Spark way:

- scalar: ``@pandas_udf`` — Arrow batch transfer, ~10-100× over
  row-at-a-time Python UDFs; registered with ``spark.udf.register`` so it
  is callable from SQL text, not just the DataFrame API.
- aggregate: ``applyInPandas`` grouped-map — the escape hatch for
  aggregations Catalyst can't express (the declared example, median, HAS
  a SQL twin so the Arrow path itself is oracle-checked end-to-end).

Scale notes (100 TB): both paths move data JVM→Arrow→Python per batch;
they are deliberately the ONLY Python-eval operators in the engine's
batch surface (tests/test_plans.py pins zero Python nodes elsewhere).
applyInPandas shuffles on the group key and requires each group to fit
in one worker's memory — fine for per-key aggregation states, wrong for
mega-groups (those get salted first, q14 pattern).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table


def make_sigmoid():
    """Arrow-vectorized logistic; numpy exp matches DuckDB's to well
    under the 6-dp round used by the oracle. Built lazily: decorating at
    import time requires an active SparkSession."""

    @pandas_udf("double")
    def sigmoid(x: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-x))

    return sigmoid


# --------------------------------------------------------------------------
# udf_sql_registered_sigmoid — the scalar pandas UDF called FROM SQL.
# --------------------------------------------------------------------------
@query(
    "udf_sql_registered_sigmoid",
    oracle="""
    SELECT event_type,
           round(avg(1.0 / (1.0 + exp(-value / 100.0))), 6) AS mean_sigmoid,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udf_sql_registered_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udf.register("sigmoid", make_sigmoid())
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               round(avg(sigmoid(value / 100.0)), 6) AS mean_sigmoid,
               count(*) AS n
        FROM events
        GROUP BY event_type
        """
    )


# --------------------------------------------------------------------------
# udaf_grouped_median — grouped-map pandas UDAF: per-group median via
# applyInPandas. l_quantity is integral, so the even-count interpolated
# median is exact in both numpy and DuckDB (x.0 or x.5 — no fp noise).
# --------------------------------------------------------------------------
@query(
    "udaf_grouped_median",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           median(l_quantity) AS median_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )

    def median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "median_qty": [pdf["l_quantity"].median()],
                "n": [len(pdf)],
            }
        )

    return li.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        median_fn,
        "l_returnflag string, l_linestatus string, median_qty double, n bigint",
    )


def make_word_runs():
    """Python UDTF (Spark 4): collapse consecutive repeated words into
    (word, start_pos, run_len) rows — sequential logic that is natural
    imperatively and takes a two-window gaps-and-islands rewrite in SQL
    (which is exactly what the DuckDB oracle does). Built lazily like
    the pandas UDF: decorating at import time requires a session."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, start_pos int, run_len int")
    class WordRuns:
        def eval(self, text: str):
            words = text.split(" ")
            i = 0
            while i < len(words):
                j = i
                while j < len(words) and words[j] == words[i]:
                    j += 1
                if j - i >= 2:
                    yield (words[i], i, j - i)
                i = j

    return WordRuns


# --------------------------------------------------------------------------
# udtf_word_runs — the UDTF surface completing the triad (scalar pandas
# UDF / grouped pandas UDAF / Python UDTF): SQL-registered, invoked via
# LATERAL so each document fans out to its repeat-runs. The oracle is
# the declarative twin — lag() island marking + running-sum run ids —
# proving the imperative and declarative forms agree row-for-row.
# Scale notes: the UDTF is Arrow-batched per partition and stateless
# across rows, so it pipelines inside the scan stage — no shuffle until
# a downstream aggregation; each doc's work is O(words).
# --------------------------------------------------------------------------
@query(
    "udtf_word_runs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(string_split(text,' '),1) - 1 AS pos,
             unnest(string_split(text,' ')) AS w
      FROM documents),
    marked AS (
      SELECT doc_id, pos, w,
             CASE WHEN lag(w) OVER (PARTITION BY doc_id ORDER BY pos) = w
                  THEN 0 ELSE 1 END AS brk
      FROM toks),
    runs AS (SELECT doc_id, w, pos,
                    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
             FROM marked)
    SELECT doc_id, min(w) AS word, cast(min(pos) AS INT) AS start_pos,
           cast(count(*) AS INT) AS run_len
    FROM runs GROUP BY doc_id, run_id HAVING count(*) >= 2
    """,
)
def udtf_word_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("word_runs", make_word_runs())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, r.word, r.start_pos, r.run_len "
        "FROM documents d, LATERAL word_runs(d.text) r"
    )
