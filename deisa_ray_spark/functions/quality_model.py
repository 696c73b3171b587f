"""TRAINED quality classifier — the model-based half of the quality
stack: where ``txt_quality_classifier`` (text.py) is pure-map inference
with formula weights, this family TRAINS real weights from the corpus
and serves them as a broadcast artifact.

Model (all public-knowledge components): multinomial Naive Bayes over
hashed bag-of-words features PLUS two engineered doc-level features
(length bucket, type-token-ratio bucket — the fastText-style trick of
mixing count features with metadata features), with Laplace smoothing;
silver labels come from a deterministic rule gate (the distillation
setup CCNet/LLaMA-style pipelines actually use: train a cheap linear
model to mimic the expensive/rule gate, then run the model at scale).

Determinism discipline (the dedup_pagerank playbook):

- The label rule is INTEGER-exact: ``n_tokens >= 40 AND 10*distinct >=
  4*n_tokens`` (no float ratio compare).
- Per-feature weights are the ONLY float step — one ln() of a ratio of
  exact integers per feature, immediately scaled 1e6 and rounded to
  BIGINT fixed point.
- Per-document scoring is pure integer arithmetic: mean token weight is
  integer division of the (possibly negative) weight sum — Spark's
  ``DIV`` and DuckDB's ``//`` BOTH truncate toward zero on integers
  (verified: -7//2 = -3 in DuckDB), so the same operator is exact on
  both sides — plus the two doc feature weights and the prior, so the
  keep frontier (logit_fp >= 0) is bit-identical across engines and
  partitionings.

Measured agreement with the silver rule: 1.000 at sf0.001/0.01/0.1 and
at the self-generated sf1 (classes non-degenerate everywhere: pos-frac
0.32/0.32/0.32/0.67); floor pinned at 0.95 in
tests/test_quality_model.py.

Scale shape: training is two corpus passes (token explode -> per-doc
stats; token+doc features -> per-feature counts, both map-side partial
aggs) and a feature-space-bounded weight table (<= QCM_V rows), which
BROADCASTS into the inference join — inference never shuffles anything
wider than (doc_id, fid). Weights are a session-cached model artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

QCM_DIM = 4096  #: hashed token-feature space
QCM_LEN_BASE = QCM_DIM  #: length-bucket fids: QCM_DIM + min(n//10, 20)
QCM_TTR_BASE = QCM_DIM + 32  #: ttr-bucket fids: base + min((10*d)//n, 10)
QCM_V = QCM_DIM + 64  #: Laplace smoothing total (feature-space size)
QCM_SCALE = 1_000_000  #: fixed-point scale for ln-ratio weights
QCM_MIN_TOKENS = 40  #: silver rule: n_tokens >= 40 ...
QCM_TTR_X10 = 4  #: ... AND 10*distinct_tokens >= 4*n_tokens (ttr >= 0.4)


def _nb_ctes() -> str:
    """Shared oracle CTE chain: labels -> features -> counts -> fixed
    point weight table ``wtab(fid, c_pos, c_neg, w_fp)`` + ``btab``."""
    return f"""
    qtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
    qstats AS (SELECT doc_id, count(*) AS n, count(DISTINCT tok) AS d
               FROM qtoks GROUP BY doc_id),
    qlab AS (SELECT doc_id, n, d,
                    CASE WHEN n >= {QCM_MIN_TOKENS}
                          AND 10 * d >= {QCM_TTR_X10} * n
                         THEN 1 ELSE 0 END AS y
             FROM qstats),
    qtokfeats AS (
      SELECT t.doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {QCM_DIM} AS fid,
             y
      FROM qtoks t JOIN qlab USING (doc_id)
    ),
    qdocfeats AS (
      SELECT doc_id, {QCM_LEN_BASE} + least(n // 10, 20) AS fid, y FROM qlab
      UNION ALL
      SELECT doc_id, {QCM_TTR_BASE} + least((10 * d) // n, 10) AS fid, y
      FROM qlab
    ),
    qfeats AS (SELECT * FROM qtokfeats UNION ALL SELECT * FROM qdocfeats),
    qcnt AS (SELECT fid,
                    count(*) FILTER (y = 1) AS c_pos,
                    count(*) FILTER (y = 0) AS c_neg
             FROM qfeats GROUP BY fid),
    qtot AS (SELECT sum(c_pos) AS tp, sum(c_neg) AS tn FROM qcnt),
    wtab AS (
      SELECT fid, CAST(c_pos AS BIGINT) AS c_pos, CAST(c_neg AS BIGINT) AS c_neg,
             CAST(round(ln((c_pos + 1.0) * (tn + {QCM_V})
                           / ((c_neg + 1.0) * (tp + {QCM_V}))) * {QCM_SCALE})
                  AS BIGINT) AS w_fp
      FROM qcnt, qtot
    ),
    btab AS (
      SELECT CAST(round(ln((count(*) FILTER (y = 1) + 1.0)
                           / (count(*) FILTER (y = 0) + 1.0)) * {QCM_SCALE})
                  AS BIGINT) AS b_fp
      FROM qlab
    )"""


def nb_scoring_ctes() -> str:
    """Scoring-chain CTE fragment on top of :func:`_nb_ctes`:
    ``qsc(doc_id, y, logit_fp)`` — the mean-token-weight + doc-feature +
    prior logit, shared by txt_quality_infer, txt_quality_pr_curve, and
    report_data_card so the scoring formula exists in exactly one SQL
    string."""
    return """tsc AS (SELECT f.doc_id, sum(w_fp) AS s, count(*) AS nf
            FROM qtokfeats f JOIN wtab USING (fid) GROUP BY f.doc_id),
    dsc AS (SELECT f.doc_id, sum(w_fp) AS s2
            FROM qdocfeats f JOIN wtab USING (fid) GROUP BY f.doc_id),
    qsc AS (SELECT l.doc_id, l.y,
                   CAST(b_fp + s2 + (s // nf) AS BIGINT) AS logit_fp
            FROM qlab l JOIN tsc USING (doc_id) JOIN dsc USING (doc_id), btab)"""


def _fid(tok: Column) -> Column:
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % QCM_DIM


def _labels(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("d"),
    ).withColumn(
        "y",
        (
            (F.col("n") >= QCM_MIN_TOKENS)
            & (10 * F.col("d") >= QCM_TTR_X10 * F.col("n"))
        ).cast("int"),
    )


def _features(lab: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """(token features, doc features) as ``(doc_id, fid, y)`` frames."""
    tokf = lab.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"), "y"
    ).select("doc_id", _fid(F.col("tok")).alias("fid"), "y")
    docf = lab.select(
        "doc_id",
        (F.lit(QCM_LEN_BASE) + F.least(F.expr("n DIV 10"), F.lit(20)).cast("bigint")).alias("fid"),
        "y",
    ).unionByName(
        lab.select(
            "doc_id",
            (
                F.lit(QCM_TTR_BASE)
                + F.least(F.expr("(10 * d) DIV n"), F.lit(10)).cast("bigint")
            ).alias("fid"),
            "y",
        )
    )
    return tokf, docf


def nb_weights(lab: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Train: (weight table ``(fid, c_pos, c_neg, w_fp)``, 1-row bias)."""
    tokf, docf = _features(lab)
    feats = tokf.unionByName(docf)
    cnt = feats.groupBy("fid").agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("bigint").alias("c_pos"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).cast("bigint").alias("c_neg"),
    )
    tot = cnt.agg(F.sum("c_pos").alias("tp"), F.sum("c_neg").alias("tn"))
    w = cnt.join(F.broadcast(tot), F.lit(True)).select(
        "fid",
        "c_pos",
        "c_neg",
        F.round(
            F.log(
                (F.col("c_pos") + 1.0)
                * (F.col("tn") + QCM_V)
                / ((F.col("c_neg") + 1.0) * (F.col("tp") + QCM_V))
            )
            * QCM_SCALE
        )
        .cast("bigint")
        .alias("w_fp"),
    )
    b = lab.agg(
        F.round(
            F.log(
                (F.sum(F.when(F.col("y") == 1, 1).otherwise(0)) + 1.0)
                / (F.sum(F.when(F.col("y") == 0, 1).otherwise(0)) + 1.0)
            )
            * QCM_SCALE
        )
        .cast("bigint")
        .alias("b_fp")
    )
    return w, b


#: session-keyed trained-model cache (the _BPE_CACHE discipline) —
#: BOTH artifacts come out of ONE build so the bias never pays a second
#: corpus scan; eviction only drops the reference, persisted blocks are
#: reclaimed once unpersisted below.
_QCM_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _lab_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeled corpus frame, session-cached (the ``_shingle_sets``
    pipeline-staging discipline): train, infer and the PR sweep each
    reference it from several plan branches, and an un-materialized
    ``_labels`` subtree is re-executed once per reference — the infer
    before-plan scanned documents 5x (token features, two doc-feature
    union branches, the final projection). One corpus scan serves the
    whole family; drained with every other session-cached frame."""
    from deisa_ray_spark.functions.dedup import _session_cached

    return _session_cached(
        spark,
        "qcm_lab",
        sf_dir,
        lambda: _labels(load_table(spark, sf_dir, "documents")),
    )


def _trained(spark: SparkSession, sf_dir: str) -> "tuple[DataFrame, DataFrame]":
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _QCM_CACHE.get(key)
    if hit is None:
        for k in [k for k in _QCM_CACHE if k != key]:
            old_w, old_b = _QCM_CACHE.pop(k)
            for f in (old_w, old_b):
                try:
                    f.unpersist()
                except Exception:
                    pass  # entry from an already-stopped SparkSession
        lab = _lab_cached(spark, sf_dir)
        w, b = nb_weights(lab)
        w, b = w.persist(), b.persist()
        w.count(), b.count()  # one shared eager pass over the labels
        _QCM_CACHE[key] = (w, b)
        hit = _QCM_CACHE[key]
    return hit


@query(
    "txt_quality_train",
    oracle=f"""
    WITH {_nb_ctes()}
    SELECT fid, c_pos, c_neg, w_fp FROM wtab
    """,
)
def txt_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained weight-table ARTIFACT (per-feature class counts +
    fixed-point log-likelihood-ratio weight) — what a serving pipeline
    exports; feature-space-bounded, so it broadcasts at any corpus
    size."""
    w, _b = _trained(spark, sf_dir)
    return w


@query(
    "txt_quality_infer",
    oracle=f"""
    WITH {_nb_ctes()},
    {nb_scoring_ctes()}
    SELECT doc_id, d.source,
           CAST(y AS INT) AS y_rule,
           logit_fp,
           CAST(logit_fp >= 0 AS INT) AS kept,
           CAST((logit_fp >= 0) = (y = 1) AS INT) AS agree
    FROM qsc JOIN documents d USING (doc_id)
    """,
)
def txt_quality_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the trained classifier over the corpus: mean token weight
    (integer division, truncating identically in both engines — see
    module docstring) + doc-feature weights + prior, integer keep
    frontier, per-doc agreement with the silver rule (the distillation
    quality contract)."""
    lab = _lab_cached(spark, sf_dir)
    w, b = _trained(spark, sf_dir)
    tokf, docf = _features(lab)
    tsc = (
        tokf.join(F.broadcast(w.select("fid", "w_fp")), "fid")
        .groupBy("doc_id")
        .agg(F.sum("w_fp").alias("s"), F.count(F.lit(1)).alias("nf"))
    )
    dsc = (
        docf.join(F.broadcast(w.select("fid", "w_fp")), "fid")
        .groupBy("doc_id")
        .agg(F.sum("w_fp").alias("s2"))
    )
    logit = F.expr("b_fp + s2 + (s DIV nf)").cast("bigint")
    return (
        lab.select("doc_id", "source", "y")
        .join(tsc, "doc_id")
        .join(dsc, "doc_id")
        .join(F.broadcast(b), F.lit(True))
        .select(
            "doc_id",
            "source",
            F.col("y").cast("int").alias("y_rule"),
            logit.alias("logit_fp"),
            (logit >= 0).cast("int").alias("kept"),
            ((logit >= 0) == (F.col("y") == 1)).cast("int").alias("agree"),
        )
    )


# --------------------------------------------------------------------------
# txt_quality_pr_curve — the HONEST half of the classifier's evaluation.
# "Agreement 1.000 with the silver rule" (txt_quality_infer) is circular
# — the model was distilled FROM that rule. This query emits, per
# threshold over the fixed-point logit:
#   (a) the integer-exact confusion matrix + fixed-point P/R/F1 vs the
#       SILVER rule (the training labels — the PR curve proper), and
#   (b) the same matrix vs a HOLDOUT rule the model never saw:
#       the Gopher-style gate (txt_gopher_rules — word-count bounds,
#       mean-word-length bounds, TTR floor, stopword floor), measuring
#       whether the learned frontier generalizes beyond its labels.
#
# Determinism: every cell is an integer count; P/R/F1 are integer
# fixed-point (x1e6, truncating DIV — identical in Spark DIV and DuckDB
# //); an undefined ratio (empty denominator at an extreme threshold)
# is the -1 sentinel on BOTH engines, never NULL (NULL would also break
# the bigint dtype on the pandas path). The threshold grid is a
# compile-time constant spanning PAST the observed logit range
# (bimodal, extremes near ±1.3e7 across SFs), so the recall-1 and
# recall-0 anchors of the curve exist vs BOTH rules even if a
# regenerated corpus shifts the modes — see PARITY.md.
#
# Scale shape: the scored frame is (doc_id, 3 ints); the 17-way
# threshold explode multiplies only that narrow frame and collapses
# immediately into a 17-key partial agg (map-side combined) — no wide
# data rides the explode, no extra corpus scan (infer's plan is reused,
# the Gopher gate is a narrow projection joined on doc_id).
# --------------------------------------------------------------------------
PR_THRESHOLDS = list(range(-16_000_000, 16_000_001, 2_000_000))  #: 17 cuts


def _pr_panel_sql(suffix: str, ycol: str) -> str:
    d = f"tp{suffix} + fp{suffix}"
    r = f"tp{suffix} + fn{suffix}"
    f1d = f"2 * tp{suffix} + fp{suffix} + fn{suffix}"
    return f"""
           CAST(count(*) FILTER (pred = 1 AND {ycol} = 1) AS BIGINT) AS tp{suffix},
           CAST(count(*) FILTER (pred = 1 AND {ycol} = 0) AS BIGINT) AS fp{suffix},
           CAST(count(*) FILTER (pred = 0 AND {ycol} = 1) AS BIGINT) AS fn{suffix},
           CAST(count(*) FILTER (pred = 0 AND {ycol} = 0) AS BIGINT) AS tn{suffix}"""


def _pr_ratio_sql(suffix: str) -> str:
    return f"""
           CASE WHEN tp{suffix} + fp{suffix} = 0 THEN -1
                ELSE tp{suffix} * 1000000 // (tp{suffix} + fp{suffix}) END
               AS precision{suffix}_x1e6,
           CASE WHEN tp{suffix} + fn{suffix} = 0 THEN -1
                ELSE tp{suffix} * 1000000 // (tp{suffix} + fn{suffix}) END
               AS recall{suffix}_x1e6,
           CASE WHEN 2 * tp{suffix} + fp{suffix} + fn{suffix} = 0 THEN -1
                ELSE 2 * tp{suffix} * 1000000
                     // (2 * tp{suffix} + fp{suffix} + fn{suffix}) END
               AS f1{suffix}_x1e6"""


def _pr_oracle() -> str:
    from deisa_ray_spark.functions.text import gopher_gate_ctes

    grid = ", ".join(str(t) for t in PR_THRESHOLDS)
    return f"""
    WITH {_nb_ctes()},
    {nb_scoring_ctes()},
    {gopher_gate_ctes()},
    grid AS (SELECT unnest([{grid}]) AS thr_fp),
    swept AS (
      SELECT CAST(g.thr_fp AS BIGINT) AS thr_fp,
             CAST(sc.logit_fp >= g.thr_fp AS INT) AS pred,
             sc.y, h.yh
      FROM qsc sc JOIN ghold h USING (doc_id) CROSS JOIN grid g
    ),
    cells AS (
      SELECT thr_fp, {_pr_panel_sql('', 'y')}, {_pr_panel_sql('_h', 'yh')}
      FROM swept GROUP BY thr_fp
    )
    SELECT thr_fp, tp, fp, fn, tn, {_pr_ratio_sql('')},
           tp_h, fp_h, fn_h, tn_h, {_pr_ratio_sql('_h')}
    FROM cells
    """


@query("txt_quality_pr_curve", oracle=_pr_oracle())
def txt_quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep of the trained classifier vs the silver rule AND
    the Gopher holdout rule — integer confusion cells, fixed-point
    P/R/F1 (-1 sentinel for undefined ratios)."""
    from deisa_ray_spark.functions.text import gopher_features

    scored = txt_quality_infer(spark, sf_dir).select("doc_id", "y_rule", "logit_fp")
    # the Gopher gate only reads text — project it off the session-cached
    # labeled frame instead of paying one more corpus scan
    hold = _lab_cached(spark, sf_dir).select(
        "doc_id", gopher_features()["keep"].cast("int").alias("yh")
    )
    swept = (
        scored.join(hold, "doc_id")
        .select(
            "y_rule",
            "yh",
            "logit_fp",
            F.explode(
                F.array(*[F.lit(t).cast("bigint") for t in PR_THRESHOLDS])
            ).alias("thr_fp"),
        )
        .withColumn("pred", (F.col("logit_fp") >= F.col("thr_fp")).cast("int"))
    )

    def cells(suffix: str, ycol: str) -> list:
        p, y = F.col("pred"), F.col(ycol)
        return [
            F.sum((p * y)).cast("bigint").alias(f"tp{suffix}"),
            F.sum(p * (1 - y)).cast("bigint").alias(f"fp{suffix}"),
            F.sum((1 - p) * y).cast("bigint").alias(f"fn{suffix}"),
            F.sum((1 - p) * (1 - y)).cast("bigint").alias(f"tn{suffix}"),
        ]

    def ratios(suffix: str) -> list:
        tp, fp = F.col(f"tp{suffix}"), F.col(f"fp{suffix}")
        fn = F.col(f"fn{suffix}")
        return [
            F.when(tp + fp == 0, F.lit(-1).cast("bigint"))
            .otherwise(F.expr(f"tp{suffix} * 1000000 DIV (tp{suffix} + fp{suffix})"))
            .alias(f"precision{suffix}_x1e6"),
            F.when(tp + fn == 0, F.lit(-1).cast("bigint"))
            .otherwise(F.expr(f"tp{suffix} * 1000000 DIV (tp{suffix} + fn{suffix})"))
            .alias(f"recall{suffix}_x1e6"),
            F.when(2 * tp + fp + fn == 0, F.lit(-1).cast("bigint"))
            .otherwise(
                F.expr(
                    f"2 * tp{suffix} * 1000000"
                    f" DIV (2 * tp{suffix} + fp{suffix} + fn{suffix})"
                )
            )
            .alias(f"f1{suffix}_x1e6"),
        ]

    agg = swept.groupBy("thr_fp").agg(*(cells("", "y_rule") + cells("_h", "yh")))
    return agg.select(
        "thr_fp",
        "tp",
        "fp",
        "fn",
        "tn",
        *ratios(""),
        "tp_h",
        "fp_h",
        "fn_h",
        "tn_h",
        *ratios("_h"),
    )
