"""The data card: ONE declared query (``report_data_card``) emitting the
corpus report a large-scale curation run publishes — composition stats,
source/language mixture, duplication (exact + substring-extent), quality
gates (silver rule, Gopher rules, the trained classifier), and benchmark
contamination — as a tall-skinny integer-exact table.

This is a CAPSTONE composition, not new math: every section reuses the
single-source-of-truth builders of its owning module (``_span_extents``,
``txt_quality_infer``'s scoring, ``gopher_features``,
``contaminated_ids``) and their session-cached artifacts, so the card is
cheap after any of those queries ran — and structurally cannot drift
from the queries it summarizes.

Schema: ``(section, metric, v_int, v_x1e6)``. All values are integers:
counts in ``v_int``, shares/rates as millionths via truncating integer
division (Spark ``DIV`` == DuckDB ``//`` — both truncate toward zero),
``-1`` where a cell does not apply. No doubles anywhere → bit-exact
across engines at every scale.

Scale shape: each section is a tiny aggregate over an artifact that is
itself scale-shaped (extents: windowed narrow stream; quality: broadcast
NB weights; gopher: pure narrow scan; contamination: broadcast bench
semi-join); the sections union into one plan with one action. The
mixture sections broadcast the 1-row total — never a corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

_CARD_COLS = ("section", "metric", "v_int", "v_x1e6")


def _row(section: str, metric, v_int, v_x1e6=None):
    """Project a 1-row-per-group frame into card shape."""
    return [
        F.lit(section).alias("section"),
        (F.lit(metric) if isinstance(metric, str) else metric).alias("metric"),
        v_int.cast("bigint").alias("v_int"),
        (F.lit(-1) if v_x1e6 is None else v_x1e6).cast("bigint").alias("v_x1e6"),
    ]


def _card_oracle() -> str:
    from deisa_ray_spark.functions.dedup import BENCH_MOD, _extents_sql
    from deisa_ray_spark.functions.dedup import contamination_ctes
    from deisa_ray_spark.functions.quality_model import _nb_ctes, nb_scoring_ctes
    from deisa_ray_spark.functions.text import gopher_gate_ctes

    return f"""
    WITH {_extents_sql()},
    {_nb_ctes()},
    {nb_scoring_ctes()},
    {gopher_gate_ctes()},
    {contamination_ctes()},
    corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
                 AS n_exact_dup_docs
      FROM documents
    )
    SELECT 'corpus' AS section, 'n_docs' AS metric, n_docs AS v_int,
           CAST(-1 AS BIGINT) AS v_x1e6 FROM corpus
    UNION ALL SELECT 'corpus', 'n_tokens', n_tokens, -1 FROM corpus
    UNION ALL SELECT 'corpus', 'n_chars', n_chars, -1 FROM corpus
    UNION ALL SELECT 'corpus', 'n_sources', n_sources, -1 FROM corpus
    UNION ALL SELECT 'corpus', 'n_langs', n_langs, -1 FROM corpus
    UNION ALL
    SELECT 'mixture_source', source, CAST(count(*) AS BIGINT),
           count(*) * 1000000 // (SELECT n_docs FROM corpus)
    FROM documents GROUP BY source
    UNION ALL
    SELECT 'mixture_lang', lang, CAST(count(*) AS BIGINT),
           count(*) * 1000000 // (SELECT n_docs FROM corpus)
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'dedup', 'n_exact_dup_docs', n_exact_dup_docs,
           n_exact_dup_docs * 1000000 // n_docs FROM corpus
    UNION ALL
    SELECT 'dedup', 'n_dup_extents', CAST(count(*) AS BIGINT), -1
    FROM xextents
    UNION ALL
    SELECT 'dedup', 'dup_words',
           CAST(coalesce(sum(n_words), 0) AS BIGINT),
           CAST(coalesce(sum(n_words), 0) AS BIGINT) * 1000000
             // (SELECT n_tokens FROM corpus)
    FROM xextents
    UNION ALL
    SELECT 'dedup', 'docs_with_dup_extent',
           CAST(count(DISTINCT doc_id) AS BIGINT),
           count(DISTINCT doc_id) * 1000000 // (SELECT n_docs FROM corpus)
    FROM xextents
    UNION ALL
    SELECT 'quality', 'silver_kept',
           CAST(count(*) FILTER (y = 1) AS BIGINT),
           count(*) FILTER (y = 1) * 1000000 // count(*)
    FROM qsc
    UNION ALL
    SELECT 'quality', 'model_kept',
           CAST(count(*) FILTER (logit_fp >= 0) AS BIGINT),
           count(*) FILTER (logit_fp >= 0) * 1000000 // count(*)
    FROM qsc
    UNION ALL
    SELECT 'quality', 'gopher_kept',
           CAST(count(*) FILTER (yh = 1) AS BIGINT),
           count(*) FILTER (yh = 1) * 1000000 // count(*)
    FROM ghold
    UNION ALL
    SELECT 'quality', 'model_gopher_agree',
           CAST(count(*) AS BIGINT),
           count(*) FILTER ((logit_fp >= 0) = (yh = 1)) * 1000000 // count(*)
    FROM qsc JOIN ghold USING (doc_id)
    UNION ALL
    SELECT 'contamination', 'n_contaminated',
           CAST((SELECT count(*) FROM ccont) AS BIGINT),
           (SELECT count(*) FROM ccont) * 1000000
             // (SELECT count(*) FROM documents WHERE doc_id % {BENCH_MOD} <> 0)
    """


@query("report_data_card", oracle=_card_oracle())
def report_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tall-skinny integer-exact corpus data card composed from the
    engine's own curation artifacts."""
    from deisa_ray_spark.functions.dedup import (
        BENCH_MOD,
        _session_cached,
        _span_extents,
        contaminated_ids,
    )
    from deisa_ray_spark.functions.quality_model import txt_quality_infer
    from deisa_ray_spark.functions.text import gopher_features

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.col("text"), " "))
    # the 1-row corpus aggregate feeds 7 union branches + 2 broadcast
    # joins — session-cache it so ONE scan serves them all (a per-branch
    # re-aggregation would be N full corpus scans at 100 TB)
    corpus = _session_cached(
        spark,
        "card_corpus",
        sf_dir,
        lambda: docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_toks).alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
            (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias(
                "n_exact_dup_docs"
            ),
        ),
    )
    tot = F.broadcast(corpus.select("n_docs", "n_tokens"))

    def share(n, d):  # truncating millionths, -1-free (denoms are > 0)
        return F.expr(f"{n} * 1000000 DIV {d}")

    frames = []
    for m in ("n_docs", "n_tokens", "n_chars", "n_sources", "n_langs"):
        frames.append(corpus.select(*_row("corpus", m, F.col(m))))
    for sec, col in (("mixture_source", "source"), ("mixture_lang", "lang")):
        mix = docs.groupBy(col).agg(F.count(F.lit(1)).alias("n")).join(
            tot, F.lit(True)
        )
        frames.append(mix.select(*_row(sec, F.col(col), F.col("n"),
                                       share("n", "n_docs"))))
    frames.append(
        corpus.select(
            *_row("dedup", "n_exact_dup_docs", F.col("n_exact_dup_docs"),
                  share("n_exact_dup_docs", "n_docs"))
        )
    )
    ext = _session_cached(
        spark,
        "card_extents",
        sf_dir,
        lambda: _span_extents(spark, sf_dir).agg(
            F.count(F.lit(1)).alias("n_ext"),
            F.coalesce(F.sum("n_words"), F.lit(0)).alias("dup_words"),
            F.countDistinct("doc_id").alias("n_ext_docs"),
        ),
    ).join(tot, F.lit(True))
    frames.append(ext.select(*_row("dedup", "n_dup_extents", F.col("n_ext"))))
    frames.append(
        ext.select(*_row("dedup", "dup_words", F.col("dup_words"),
                         share("dup_words", "n_tokens")))
    )
    frames.append(
        ext.select(*_row("dedup", "docs_with_dup_extent", F.col("n_ext_docs"),
                         share("n_ext_docs", "n_docs")))
    )
    scored = txt_quality_infer(spark, sf_dir).select("doc_id", "y_rule", "kept")
    hold = docs.select(
        "doc_id", gopher_features()["keep"].cast("int").alias("yh")
    )
    q = _session_cached(
        spark,
        "card_quality",
        sf_dir,
        lambda: scored.join(hold, "doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y_rule").alias("silver_kept"),
            F.sum("kept").alias("model_kept"),
            F.sum("yh").alias("gopher_kept"),
            F.sum((F.col("kept") == F.col("yh")).cast("int")).alias("mg_agree"),
        ),
    )
    for m, num in (
        ("silver_kept", "silver_kept"),
        ("model_kept", "model_kept"),
        ("gopher_kept", "gopher_kept"),
    ):
        frames.append(q.select(*_row("quality", m, F.col(num), share(num, "n"))))
    frames.append(
        q.select(*_row("quality", "model_gopher_agree", F.col("n"),
                       share("mg_agree", "n")))
    )
    cont = contaminated_ids(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_cont")
    ).join(
        F.broadcast(
            docs.filter(F.col("doc_id") % BENCH_MOD != 0).agg(
                F.count(F.lit(1)).alias("n_nonbench")
            )
        ),
        F.lit(True),
    )
    frames.append(
        cont.select(*_row("contamination", "n_contaminated", F.col("n_cont"),
                          share("n_cont", "n_nonbench")))
    )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
