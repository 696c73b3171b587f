"""Deterministic corpus sampling: Bernoulli by hash, exact-k uniform,
and stratified per-group k — the subsetting ops a training-data pipeline
runs constantly (held-out splits, eval slices, per-source caps).

The reference has no sampling surface. The portability trick is the same
as the dedup family's: the sampling key is ``md5`` of the row id, which is
identical hex in Spark and DuckDB — so "random" selection is bit-for-bit
reproducible across engines AND across runs/cluster sizes (a property
``rand(seed)`` does NOT have on Spark: its draw depends on partitioning).

Scale notes (100 TB):
- Bernoulli-by-hash is a pure filter — no shuffle, prunes at scan speed,
  and composes with predicate pushdown on other columns.
- Exact-k uniform is ORDER BY md5 LIMIT k → Spark's TakeOrdered: each
  partition keeps its local top-k, only k rows per partition reach the
  driver-side merge. No global sort materialization.
- Stratified per-group k is row_number over (source, md5): recent Spark
  inserts WindowGroupLimit, so each map task pre-prunes to k rows per
  group before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

#: hex-prefix threshold: md5 first byte < 0x0d → 13/256 ≈ 5.08% sample.
BERNOULLI_HEX_LT = "0d"
UNIFORM_K = 64
STRATA_K = 20


def _key(col: str = "doc_id"):
    return F.md5(F.col(col).cast("string"))


# --------------------------------------------------------------------------
# samp_hash_bernoulli — ~5% deterministic Bernoulli sample, summarized
# per source (count + mean length proves the sample is unbiased enough
# to check downstream).
# --------------------------------------------------------------------------
@query(
    "samp_hash_bernoulli",
    oracle=f"""
    SELECT source, count(*) AS n_sampled,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 2) < '{BERNOULLI_HEX_LT}'
    GROUP BY source
    """,
)
def samp_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.substring(_key(), 1, 2) < BERNOULLI_HEX_LT)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# samp_uniform_k — exact-k uniform sample: the k smallest md5 keys.
# --------------------------------------------------------------------------
@query(
    "samp_uniform_k",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    ORDER BY md5(cast(doc_id AS VARCHAR))
    LIMIT {UNIFORM_K}
    """,
)
def samp_uniform_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.orderBy(_key()).limit(UNIFORM_K).select("doc_id", "source")


# --------------------------------------------------------------------------
# samp_stratified_k — per-source cap: k docs per source by md5 order
# (md5 collisions are impossible on distinct ids → total order → the
# frontier is deterministic).
# --------------------------------------------------------------------------
@query(
    "samp_stratified_k",
    oracle=f"""
    SELECT doc_id, source, rn
    FROM (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(cast(doc_id AS VARCHAR))) AS rn
          FROM documents)
    WHERE rn <= {STRATA_K}
    """,
)
def samp_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(_key())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATA_K)
        .select("doc_id", "source", "rn")
    )


# --------------------------------------------------------------------------
# samp_lang_temperature — temperature re-balancing across languages (the
# multilingual-corpus mixing step: sample language l with probability
# ∝ n_l^α, α = 0.5). Implemented as a single-pass deterministic
# Bernoulli gate: per-language keep rate √(min_n / n_l) (the smallest
# language is kept whole, large languages downsample toward balance), doc
# gate = md5-derived uniform fraction — so the "random" subset is
# bit-identical across engines, runs, and cluster sizes. Scale shape:
# the rates table is O(languages) and broadcast; the gate is a pure
# filter — no corpus shuffle before the final per-language rollup.
# --------------------------------------------------------------------------
@query(
    "samp_lang_temperature",
    oracle="""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    rates AS (SELECT lang, sqrt((SELECT min(n) FROM counts) * 1.0 / n)
                  AS keep_rate
              FROM counts),
    gated AS (
      SELECT d.lang, r.keep_rate,
             ('0x' || substr(md5(cast(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
                 / 4294967296.0 AS frac
      FROM documents d JOIN rates r ON d.lang = r.lang)
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (WHERE frac < keep_rate) AS n_kept,
           round(min(keep_rate), 6) AS keep_rate
    FROM gated
    GROUP BY lang
    """,
)
def samp_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    rates = counts.withColumn(
        "keep_rate",
        F.sqrt(F.min("n").over(W.partitionBy()) * F.lit(1.0) / F.col("n")),
    ).select("lang", "keep_rate")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    gated = docs.join(F.broadcast(rates), "lang").withColumn("frac", frac)
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("frac") < F.col("keep_rate"), 1)).alias("n_kept"),
        F.round(F.min("keep_rate"), 6).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
# samp_source_mixture — uniform-mixture downsampling: every source is
# capped to the smallest source's size via a deterministic md5 gate, the
# way corpus mixtures are rebalanced before training. Rates are a tiny
# broadcast table; the gate is a narrow filter — the corpus is scanned
# once, never shuffled.
# --------------------------------------------------------------------------
@query(
    "samp_source_mixture",
    oracle="""
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    rates AS (SELECT source, n,
                     (SELECT min(n) FROM counts) * 1.0 / n AS keep_rate
              FROM counts),
    gated AS (
      SELECT d.source, r.keep_rate,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS frac
      FROM documents d JOIN rates r USING (source)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE frac < keep_rate) AS BIGINT) AS n_kept,
           round(min(keep_rate), 6) AS keep_rate
    FROM gated GROUP BY source
    """,
)
def samp_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    rates = counts.withColumn(
        "keep_rate", F.min("n").over(W.partitionBy()) * F.lit(1.0) / F.col("n")
    ).select("source", "keep_rate")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    gated = docs.join(F.broadcast(rates), "source").withColumn("frac", frac)
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count(F.when(F.col("frac") < F.col("keep_rate"), 1))
        .cast("bigint")
        .alias("n_kept"),
        F.round(F.min("keep_rate"), 6).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
# samp_epoch_shuffle — deterministic per-epoch global shuffle order: the
# training-delivery primitive ("give every worker a different, stable
# permutation of the corpus each epoch"). The permutation key is
# md5(epoch || '|' || doc_id), so the order is reproducible across runs
# and cluster sizes and differs per epoch.
#
# Scale shape: NO global sort / global window. The key's first hex char
# assigns one of 16 balanced shards; rank within (epoch, shard) is a
# hash-partitioned window; global position = broadcast per-shard offset
# + within-shard rank — the explicit form of what a distributed sort's
# range partitioner does, with the offsets surfaced so delivery can
# stream shard-by-shard. At 100 TB raise the shard fan-out to
# O(executors) by keying on more hex chars; every stage stays
# one-pass.
# --------------------------------------------------------------------------
EPOCHS = 2
SHUFFLE_SHARDS = 16


@query(
    "samp_epoch_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(cast(e.epoch AS VARCHAR) || '|'
                 || cast(d.doc_id AS VARCHAR)) AS k
      FROM documents d
      CROSS JOIN (SELECT unnest(range({EPOCHS})) AS epoch) e
    ),
    sharded AS (
      SELECT epoch, doc_id, k,
             instr('0123456789abcdef', substr(k, 1, 1)) - 1 AS shard_id
      FROM keyed
    ),
    within AS (
      SELECT epoch, doc_id, shard_id,
             row_number() OVER (PARTITION BY epoch, shard_id
                                ORDER BY k, doc_id) AS r
      FROM sharded
    ),
    counts AS (SELECT epoch, shard_id, count(*) AS c
               FROM sharded GROUP BY epoch, shard_id),
    offsets AS (
      SELECT epoch, shard_id,
             sum(c) OVER (PARTITION BY epoch ORDER BY shard_id
                          ROWS UNBOUNDED PRECEDING) - c AS off
      FROM counts
    )
    SELECT CAST(w.epoch AS INT) AS epoch, w.doc_id,
           CAST(w.shard_id AS BIGINT) AS shard_id,
           CAST(o.off + w.r AS BIGINT) AS pos
    FROM within w JOIN offsets o USING (epoch, shard_id)
    """,
)
def samp_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ep = spark.range(EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(ep)).withColumn(
        "k",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"), F.lit("|"), F.col("doc_id").cast("string")
            )
        ),
    )
    sharded = keyed.withColumn(
        "shard_id", F.conv(F.substring("k", 1, 1), 16, 10).cast("bigint")
    )
    within = sharded.withColumn(
        "r",
        F.row_number().over(
            W.partitionBy("epoch", "shard_id").orderBy("k", "doc_id")
        ),
    )
    counts = sharded.groupBy("epoch", "shard_id").agg(F.count(F.lit(1)).alias("c"))
    offsets = counts.withColumn(
        "off",
        F.sum("c").over(
            W.partitionBy("epoch").orderBy("shard_id").rowsBetween(W.unboundedPreceding, 0)
        )
        - F.col("c"),
    ).select("epoch", "shard_id", "off")
    return within.join(F.broadcast(offsets), ["epoch", "shard_id"]).select(
        "epoch",
        "doc_id",
        "shard_id",
        (F.col("off") + F.col("r")).cast("bigint").alias("pos"),
    )


# --------------------------------------------------------------------------
# samp_weighted_topk — weighted sampling WITHOUT replacement
# (Efraimidis–Spirakis A-Res): each row draws a deterministic uniform
# u ∈ (0,1] from md5(doc_id) and scores key = ln(u)/w; the top-K keys
# ARE a weight-proportional sample without replacement (ordering by
# ln(u)/w ≡ ordering by u^(1/w)). The primitive behind weighted corpus
# subsampling — pick K docs proportional to length/quality/DSIR weight
# in ONE pass, no per-stratum bookkeeping.
#
# Scale notes (100 TB): key derivation is a pure map; top-K is Spark's
# TakeOrderedAndProject (per-partition heap + driver merge of K×parts
# rows) — no global sort, no shuffle of the corpus. Ranking compares the
# ROUNDED key (both engines reproduce round-to-6 bit-identically),
# doc_id tie-break.
# --------------------------------------------------------------------------
ES_TOP_K = 100


@query(
    "samp_weighted_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             round(ln((('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       + 1) / 4294967296.0) / n_chars, 6) + 0 AS es_key
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {ES_TOP_K}
    """,
)
def samp_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (v + F.lit(1)) / F.lit(4294967296.0)
    es_key = F.round(F.log(u) / F.col("n_chars"), 6)
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            es_key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(ES_TOP_K)
    )


# --------------------------------------------------------------------------
# samp_mmr_topk — DIVERSITY-AWARE subset selection over the embedding
# store: greedy Maximal Marginal Relevance (Carbonell & Goldstein 1998;
# the facility-location-style greedy every diverse-subset curation
# pipeline runs). Round r selects argmax of
#   score = λ·rel(x) − (1−λ)·max_sim(x, selected)
# where rel is cosine to a fixed anchor (the lowest-id vector — a
# deterministic stand-in for a query/centroid) and max_sim is the
# running max cosine to anything already selected — so each new pick is
# relevant AND far from the current subset.
#
# Exactly SQL-expressible because greedy MMR has the BPE/PageRank round
# structure: K unrolled rounds, each one argmax (rounded-cosine scores,
# vec_id tie-break) + a 1-row broadcast of the new pick + a running
# GREATEST fold of max_sim — the state between rounds is one narrow
# (vec_id, rel, max_sim) frame, localCheckpoint-ed per round.
# Determinism: rel and every pairwise cosine are rounded to 6 before
# any comparison; λ-blending is two IEEE multiplies on identical
# doubles; ties break by vec_id.
#
# Scale shape: each round is ONE corpus-narrow map (cosine against the
# broadcast pick) + one TakeOrdered(1) — O(K·n) total, no pairwise
# stage; the vectors ride a session-cached store and never shuffle.
# --------------------------------------------------------------------------
MMR_K = 8  #: subset size (unrolled rounds)
MMR_LAMBDA = 0.7  #: relevance weight; 1-λ penalizes similarity to picks
MMR_KC = 3  #: per-bucket picks in the stratified variant


def _mmr_cos_sql(a: str, b: str) -> str:
    # trailing "+ 0" canonicalizes IEEE -0.0 to +0.0 (Spark round already
    # does; DuckDB round keeps the sign — the samp_weighted_topk sf1
    # lesson). Comparisons are unaffected (-0.0 == 0.0).
    return f"round(list_cosine_similarity({a}, {b}), 6) + 0"


def _mmr_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (vec_id, label, e, nrm) store shared by the MMR
    family — vectors and norms materialize once per session."""
    from deisa_ray_spark.functions.dedup import _session_cached, norm_agg

    return _session_cached(
        spark,
        "mmr_store",
        sf_dir,
        lambda: load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("e"),
        )
        .withColumn("nrm", norm_agg(F.col("e"))),
        eager=True,
    )


def _mmr_oracle() -> str:
    parts = [f"""
    mbase AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    anchor AS MATERIALIZED (
      SELECT e AS ae FROM mbase ORDER BY vec_id LIMIT 1
    ),
    st0 AS MATERIALIZED (
      SELECT vec_id, e,
             {_mmr_cos_sql('e', '(SELECT ae FROM anchor)')} AS rel,
             CAST(-1.0 AS DOUBLE) AS max_sim
      FROM mbase
    )"""]
    sels = []
    for r in range(1, MMR_K + 1):
        parts.append(f"""
    sel{r} AS MATERIALIZED (
      SELECT vec_id, e, rel, max_sim,
             {MMR_LAMBDA} * rel - {round(1 - MMR_LAMBDA, 6)} * max_sim AS score
      FROM st{r - 1}
      ORDER BY {MMR_LAMBDA} * rel - {round(1 - MMR_LAMBDA, 6)} * max_sim DESC,
               vec_id
      LIMIT 1
    ),
    st{r} AS MATERIALIZED (
      SELECT s.vec_id, s.e, s.rel,
             greatest(s.max_sim,
                      {_mmr_cos_sql('s.e', '(SELECT e FROM sel' + str(r) + ')')})
                 AS max_sim
      FROM st{r - 1} s
      WHERE s.vec_id <> (SELECT vec_id FROM sel{r})
    )""")
        sels.append(
            f"SELECT {r} AS rank, vec_id, rel, max_sim, round(score, 6) + 0 AS score "
            f"FROM sel{r}"
        )
    return "WITH " + ",".join(parts) + "\n    " + " UNION ALL ".join(sels)


@query("samp_mmr_topk", oracle=_mmr_oracle())
def samp_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR: K rounds of argmax(λ·rel − (1−λ)·max_sim) with the
    running max-similarity fold — the diverse-prototype subset."""
    from deisa_ray_spark.functions.dedup import (
        dot_agg,
        free_local_checkpoint,
    )

    store = _mmr_store(spark, sf_dir)
    anchor = store.orderBy("vec_id").limit(1).select(
        F.col("e").alias("ae"), F.col("nrm").alias("an")
    )

    def cos(e_col, n_col, oe, on) -> "F.Column":
        return F.round(dot_agg(e_col, oe) / (n_col * on), 6)

    state = (
        store.join(F.broadcast(anchor), F.lit(True))
        .select(
            "vec_id",
            "e",
            "nrm",
            cos(F.col("e"), F.col("nrm"), F.col("ae"), F.col("an")).alias("rel"),
            F.lit(-1.0).alias("max_sim"),
        )
        .localCheckpoint(eager=True)
    )
    lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 6)
    out = None
    for r in range(1, MMR_K + 1):
        score = lam * F.col("rel") - mu * F.col("max_sim")
        sel = (
            state.withColumn("score", F.round(score, 6))
            .orderBy((lam * F.col("rel") - mu * F.col("max_sim")).desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(r).alias("rank"), "vec_id", "e", "nrm", "rel", "max_sim", "score"
            )
            .localCheckpoint(eager=True)  # 1 row — the round's pick
        )
        row = sel.select("rank", "vec_id", "rel", "max_sim", "score")
        out = row if out is None else out.unionAll(row)
        pick = sel.select(
            F.col("vec_id").alias("p_id"), F.col("e").alias("pe"), F.col("nrm").alias("pn")
        )
        nxt = (
            state.join(F.broadcast(pick), F.lit(True))
            .filter(F.col("vec_id") != F.col("p_id"))
            .select(
                "vec_id",
                "e",
                "nrm",
                "rel",
                F.greatest(
                    F.col("max_sim"),
                    cos(F.col("e"), F.col("nrm"), F.col("pe"), F.col("pn")),
                ).alias("max_sim"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(state)
        state = nxt
    return out


# --------------------------------------------------------------------------
# samp_mmr_stratified — diversity selection the way it actually runs at
# 100 TB: per-bucket greedy MMR in PARALLEL (all buckets advance in
# lockstep — each of the MMR_KC rounds is one per-label window argmax +
# one broadcast of the n_buckets picks), then ONE global greedy-MMR
# merge over the <= n_buckets * MMR_KC candidates with a fresh
# diversity fold. Global greedy MMR (samp_mmr_topk) needs K sequential
# full-corpus barriers — O(total_picks) rounds; the stratified variant
# needs MMR_KC + MMR_K rounds regardless of how many buckets exist, and
# every stage-A round is embarrassingly parallel across buckets.
#
# Plan shape: the per-label argmax is one row_number window ordered by
# the λ-blend — Spark inserts WindowGroupLimit, so each map task
# pre-prunes to 1 row per label before the rank exchange and the
# vectors ride a bounded shuffle (<= n_partitions * n_buckets rows).
# The pick set (n_buckets rows) broadcasts back for the max_sim fold.
# The merge stage runs on a 1-partition frame of candidates only.
#
# Deviation vs global greedy is measured (not bounded analytically —
# greedy MMR has no stratification-invariance): tests/test_mmr.py pins
# the final-objective ratio on the test SFs; see PARITY.md.
# --------------------------------------------------------------------------
def _mmr_strat_oracle() -> str:
    lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 6)
    parts = [f"""
    smbase AS MATERIALIZED (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sanchor AS MATERIALIZED (
      SELECT e AS ae FROM smbase ORDER BY vec_id LIMIT 1
    ),
    ast0 AS MATERIALIZED (
      SELECT vec_id, label, e,
             {_mmr_cos_sql('e', '(SELECT ae FROM sanchor)')} AS rel,
             CAST(-1.0 AS DOUBLE) AS max_sim
      FROM smbase
    )"""]
    for r in range(1, MMR_KC + 1):
        parts.append(f"""
    asel{r} AS MATERIALIZED (
      SELECT label, vec_id, e, rel
      FROM (SELECT *, row_number() OVER (
              PARTITION BY label
              ORDER BY {lam} * rel - {mu} * max_sim DESC, vec_id) AS rn
            FROM ast{r - 1}) WHERE rn = 1
    ),
    ast{r} AS MATERIALIZED (
      SELECT s.vec_id, s.label, s.e, s.rel,
             greatest(s.max_sim, {_mmr_cos_sql('s.e', 'p.e')}) AS max_sim
      FROM ast{r - 1} s JOIN asel{r} p ON s.label = p.label
      WHERE s.vec_id <> p.vec_id
    )""")
    cand_union = " UNION ALL ".join(
        f"SELECT vec_id, label, e, rel FROM asel{r}" for r in range(1, MMR_KC + 1)
    )
    parts.append(f"""
    scand AS MATERIALIZED ({cand_union}),
    mst0 AS MATERIALIZED (
      SELECT vec_id, label, e, rel, CAST(-1.0 AS DOUBLE) AS max_sim FROM scand
    )""")
    sels = []
    for r in range(1, MMR_K + 1):
        parts.append(f"""
    msel{r} AS MATERIALIZED (
      SELECT vec_id, label, e, rel, max_sim,
             {lam} * rel - {mu} * max_sim AS score
      FROM mst{r - 1}
      ORDER BY {lam} * rel - {mu} * max_sim DESC, vec_id
      LIMIT 1
    ),
    mst{r} AS MATERIALIZED (
      SELECT s.vec_id, s.label, s.e, s.rel,
             greatest(s.max_sim,
                      {_mmr_cos_sql('s.e', '(SELECT e FROM msel' + str(r) + ')')})
                 AS max_sim
      FROM mst{r - 1} s
      WHERE s.vec_id <> (SELECT vec_id FROM msel{r})
    )""")
        sels.append(
            f"SELECT {r} AS rank, vec_id, label, rel, max_sim, "
            f"round(score, 6) + 0 AS score FROM msel{r}"
        )
    return "WITH " + ",".join(parts) + "\n    " + " UNION ALL ".join(sels)


@query("samp_mmr_stratified", oracle=_mmr_strat_oracle())
def samp_mmr_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed MMR: lockstep per-label greedy rounds (window argmax +
    broadcast fold), then a global greedy merge over the candidates."""
    from deisa_ray_spark.functions.dedup import (
        dot_agg,
        free_local_checkpoint,
    )

    store = _mmr_store(spark, sf_dir)
    anchor = store.orderBy("vec_id").limit(1).select(
        F.col("e").alias("ae"), F.col("nrm").alias("an")
    )

    def cos(e_col, n_col, oe, on):
        return F.round(dot_agg(e_col, oe) / (n_col * on), 6)

    lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 6)
    score_expr = lam * F.col("rel") - mu * F.col("max_sim")
    state = (
        store.join(F.broadcast(anchor), F.lit(True))
        .select(
            "vec_id",
            "label",
            "e",
            "nrm",
            cos(F.col("e"), F.col("nrm"), F.col("ae"), F.col("an")).alias("rel"),
            F.lit(-1.0).alias("max_sim"),
        )
        .localCheckpoint(eager=True)
    )
    sels = []
    for r in range(1, MMR_KC + 1):
        w = W.partitionBy("label").orderBy(score_expr.desc(), "vec_id")
        sel = (
            state.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn", "max_sim")
            .localCheckpoint(eager=True)  # n_buckets rows
        )
        sels.append(sel)
        if r == MMR_KC:
            free_local_checkpoint(state)
            break
        picks = sel.select(
            F.col("label").alias("p_label"),
            F.col("vec_id").alias("p_id"),
            F.col("e").alias("pe"),
            F.col("nrm").alias("pn"),
        )
        nxt = (
            state.join(F.broadcast(picks), state["label"] == picks["p_label"])
            .filter(F.col("vec_id") != F.col("p_id"))
            .select(
                "vec_id",
                "label",
                "e",
                "nrm",
                "rel",
                F.greatest(
                    F.col("max_sim"),
                    cos(F.col("e"), F.col("nrm"), F.col("pe"), F.col("pn")),
                ).alias("max_sim"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(state)
        state = nxt
    merged = sels[0]
    for s in sels[1:]:
        merged = merged.unionAll(s)
    state = (
        merged.select(
            "vec_id", "label", "e", "nrm", "rel", F.lit(-1.0).alias("max_sim")
        )
        .coalesce(1)
        .localCheckpoint(eager=True)  # <= n_buckets * MMR_KC rows
    )
    free_local_checkpoint(merged)
    out = None
    for r in range(1, MMR_K + 1):
        sel = (
            state.withColumn("score", F.round(score_expr, 6))
            .orderBy(score_expr.desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(r).alias("rank"),
                "vec_id",
                "label",
                "e",
                "nrm",
                "rel",
                "max_sim",
                "score",
            )
            .localCheckpoint(eager=True)  # 1 row — the round's pick
        )
        row = sel.select("rank", "vec_id", "label", "rel", "max_sim", "score")
        out = row if out is None else out.unionAll(row)
        if r == MMR_K:
            free_local_checkpoint(state)
            break
        pick = sel.select(
            F.col("vec_id").alias("p_id"),
            F.col("e").alias("pe"),
            F.col("nrm").alias("pn"),
        )
        nxt = (
            state.join(F.broadcast(pick), F.lit(True))
            .filter(F.col("vec_id") != F.col("p_id"))
            .select(
                "vec_id",
                "label",
                "e",
                "nrm",
                "rel",
                F.greatest(
                    F.col("max_sim"),
                    cos(F.col("e"), F.col("nrm"), F.col("pe"), F.col("pn")),
                ).alias("max_sim"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(state)
        state = nxt
    return out


# --------------------------------------------------------------------------
# samp_mixture_rebalance — the REPAIR action for snapshot mixture drift
# (report_snapshot_drift detects it; this fixes it): downsample the
# current snapshot (v2) per source so its mixture matches the previous
# snapshot's (v1), via the engine's deterministic md5 gate. Snapshots
# are the shared text.SNAP_V1_MOD/SNAP_V2_MOD definitions.
#
# Fully INTEGER thresholds (stronger than the float keep_rate gates
# above): per source, target share s1 = n1*1e6 DIV t1 and current share
# s2 = n2*1e6 DIV t2 are millionths; keep rate = min(1e6, s1*1e6 DIV
# s2) — max intermediate 1e12, overflow-free at ANY corpus size (the
# naive n1*t2*1e6 form overflows int64 at ~1e10 docs). The gate
# compares u_x1e6 = md5-prefix * 1e6 DIV 2^32 < rate — pure integer,
# bit-identical across engines/runs/cluster sizes.
#
# Scale shape: one corpus scan for the per-source counts (keyed partial
# agg), rates broadcast (O(sources) rows), one filtered scan for the
# gate + per-source rollup. No corpus shuffle.
# --------------------------------------------------------------------------
def _rebalance_oracle() -> str:
    from deisa_ray_spark.functions.text import SNAP_V1_MOD, SNAP_V2_MOD

    return f"""
    WITH snap AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {SNAP_V1_MOD} <> 0 THEN 1 ELSE 0 END AS v1,
             CASE WHEN doc_id % {SNAP_V2_MOD} <> 0 THEN 1 ELSE 0 END AS v2
      FROM documents
    ),
    cnt AS (SELECT source, CAST(sum(v1) AS BIGINT) AS n1,
                   CAST(sum(v2) AS BIGINT) AS n2
            FROM snap GROUP BY source),
    tot AS (SELECT CAST(sum(n1) AS BIGINT) AS t1,
                   CAST(sum(n2) AS BIGINT) AS t2 FROM cnt),
    thr AS (
      SELECT source, n1, n2,
             CAST(n1 * 1000000 // (SELECT t1 FROM tot) AS BIGINT) AS s1,
             CAST(n2 * 1000000 // (SELECT t2 FROM tot) AS BIGINT) AS s2
      FROM cnt
    ),
    rates AS (
      SELECT source, n1, n2, s1,
             CAST(CASE WHEN s2 = 0 THEN 0
                  ELSE least(1000000, s1 * 1000000 // s2) END AS BIGINT)
               AS rate_x1e6
      FROM thr
    ),
    gated AS (
      SELECT s.source, r.n2, r.s1, r.rate_x1e6,
             CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) * 1000000 // 4294967296 AS u_x1e6
      FROM snap s JOIN rates r USING (source) WHERE s.v2 = 1
    ),
    kept AS (
      SELECT source, rate_x1e6, s1,
             CAST(count(*) AS BIGINT) AS n_v2,
             CAST(count(*) FILTER (u_x1e6 < rate_x1e6) AS BIGINT) AS n_kept
      FROM gated GROUP BY source, rate_x1e6, s1
    ),
    tk AS (SELECT CAST(sum(n_kept) AS BIGINT) AS total_kept FROM kept)
    SELECT source, n_v2, rate_x1e6, n_kept,
           s1 AS share_target_x1e6,
           CAST(n_kept * 1000000 // (SELECT total_kept FROM tk) AS BIGINT)
             AS share_after_x1e6
    FROM kept
    """


@query("samp_mixture_rebalance", oracle=_rebalance_oracle())
def samp_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.functions.text import SNAP_V1_MOD, SNAP_V2_MOD

    docs = load_table(spark, sf_dir, "documents")
    snap = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % SNAP_V1_MOD != 0).cast("int").alias("v1"),
        (F.col("doc_id") % SNAP_V2_MOD != 0).cast("int").alias("v2"),
    )
    cnt = snap.groupBy("source").agg(
        F.sum("v1").cast("bigint").alias("n1"),
        F.sum("v2").cast("bigint").alias("n2"),
    )
    tot = F.broadcast(
        cnt.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    )
    rates = (
        cnt.join(tot, F.lit(True))
        .select(
            "source",
            "n1",
            "n2",
            F.expr("n1 * 1000000 DIV t1").cast("bigint").alias("s1"),
            F.expr("n2 * 1000000 DIV t2").cast("bigint").alias("s2"),
        )
        .select(
            "source",
            "n1",
            "n2",
            "s1",
            F.when(F.col("s2") == 0, F.lit(0))
            .otherwise(F.least(F.lit(1000000), F.expr("s1 * 1000000 DIV s2")))
            .cast("bigint")
            .alias("rate_x1e6"),
        )
    )
    gated = (
        snap.filter(F.col("v2") == 1)
        .join(F.broadcast(rates), "source")
        .withColumn(
            "u_x1e6",
            F.expr(
                "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) * 1000000 DIV 4294967296"
            ),
        )
    )
    kept = gated.groupBy("source", "rate_x1e6", "s1").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v2"),
        F.count(F.when(F.col("u_x1e6") < F.col("rate_x1e6"), 1))
        .cast("bigint")
        .alias("n_kept"),
    )
    tk = F.broadcast(kept.agg(F.sum("n_kept").alias("total_kept")))
    return kept.join(tk, F.lit(True)).select(
        "source",
        "n_v2",
        "rate_x1e6",
        "n_kept",
        F.col("s1").alias("share_target_x1e6"),
        F.expr("n_kept * 1000000 DIV total_kept").cast("bigint")
        .alias("share_after_x1e6"),
    )


# --------------------------------------------------------------------------
# samp_kcenter_coreset — greedy k-center (farthest-point traversal,
# Gonzalez 1985): the max-min diversity selector. Where MMR blends
# relevance with diversity, k-center is the pure coverage objective —
# every round picks the vector FARTHEST from the selected set (argmin of
# the running max cosine-to-selected), the greedy 2-approximation of the
# k-center clustering / coreset-seeding objective that data-pruning
# pipelines use to seed diverse training subsets.
#
# Same unrolled-round machinery as samp_mmr_topk: state is ONE narrow
# (vec_id, max_sim) frame, each of the K rounds is one TakeOrdered(1)
# argmin + one map against the broadcast 1-row pick + a GREATEST fold,
# localCheckpoint-ed and freed per round — O(K·n) total, no pairwise
# stage. First pick is the lowest vec_id (all-tied state, vec_id
# tie-break). cov_sim emitted per pick is the coverage similarity at
# selection time (rank 1 carries the -1.0 init sentinel): the k-th value
# is the similarity radius the selected set achieves over the corpus.
# Determinism: every cosine rounded to 6 before comparison, ties by
# vec_id (the MMR discipline).
# --------------------------------------------------------------------------
KCENTER_K = 8  #: coreset size (unrolled rounds)


def _kcenter_oracle() -> str:
    parts = [f"""
    kbase AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    kst0 AS MATERIALIZED (
      SELECT vec_id, e, CAST(-1.0 AS DOUBLE) AS max_sim FROM kbase
    )"""]
    sels = []
    for r in range(1, KCENTER_K + 1):
        parts.append(f"""
    ksel{r} AS MATERIALIZED (
      SELECT vec_id, e, max_sim FROM kst{r - 1}
      ORDER BY max_sim, vec_id
      LIMIT 1
    ),
    kst{r} AS MATERIALIZED (
      SELECT s.vec_id, s.e,
             greatest(s.max_sim,
                      {_mmr_cos_sql('s.e', '(SELECT e FROM ksel' + str(r) + ')')})
                 AS max_sim
      FROM kst{r - 1} s
      WHERE s.vec_id <> (SELECT vec_id FROM ksel{r})
    )""")
        sels.append(
            f"SELECT {r} AS rank, vec_id, max_sim + 0 AS cov_sim FROM ksel{r}"
        )
    return "WITH " + ",".join(parts) + "\n    " + " UNION ALL ".join(sels)


@query("samp_kcenter_coreset", oracle=_kcenter_oracle())
def samp_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy farthest-point traversal: K rounds of argmin(max cosine to
    the selected set) — the max-min-diverse coreset."""
    from deisa_ray_spark.functions.dedup import dot_agg, free_local_checkpoint

    store = _mmr_store(spark, sf_dir)

    def cos(e_col, n_col, oe, on) -> "F.Column":
        return F.round(dot_agg(e_col, oe) / (n_col * on), 6)

    state = store.select(
        "vec_id", "e", "nrm", F.lit(-1.0).alias("max_sim")
    ).localCheckpoint(eager=True)
    out = None
    for r in range(1, KCENTER_K + 1):
        sel = (
            state.orderBy("max_sim", "vec_id")
            .limit(1)
            .select(F.lit(r).alias("rank"), "vec_id", "e", "nrm", "max_sim")
            .localCheckpoint(eager=True)  # 1 row — the round's pick
        )
        row = sel.select("rank", "vec_id", (F.col("max_sim") + 0).alias("cov_sim"))
        out = row if out is None else out.unionAll(row)
        if r == KCENTER_K:
            # the state after the LAST pick is never read — skip the
            # O(n) scoring pass + checkpoint (the samp_mmr_stratified
            # final-round discipline) and release the live state
            free_local_checkpoint(state)
            break
        pick = sel.select(
            F.col("vec_id").alias("p_id"), F.col("e").alias("pe"),
            F.col("nrm").alias("pn"),
        )
        nxt = (
            state.join(F.broadcast(pick), F.lit(True))
            .filter(F.col("vec_id") != F.col("p_id"))
            .select(
                "vec_id",
                "e",
                "nrm",
                F.greatest(
                    F.col("max_sim"),
                    cos(F.col("e"), F.col("nrm"), F.col("pe"), F.col("pn")),
                ).alias("max_sim"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(state)
        state = nxt
    return out


# --------------------------------------------------------------------------
# samp_bootstrap_replicates — Poisson bootstrap for corpus metrics: R
# deterministic replicates where each document's weight is a Poisson(1)
# draw (the streaming-friendly bootstrap — per-row weights need no
# global resample pass), giving the spread that turns any corpus stat
# into a confidence statement ("docs kept = 61.2k ± 300", the error bar
# a data card should carry). Exact in integers: the uniform is the
# md5(doc_id|replicate) 32-bit prefix scaled to millionths (the
# samp_hash_bernoulli gate), the Poisson inverse-CDF is a CASE chain on
# LITERAL millionth thresholds of the Poisson(1) CDF (e^-1-derived
# constants below, truncated; the tail past k=7 — probability < 1.1e-5
# — caps at 8, identically in both engines).
#
# Scale shape: ONE corpus scan, zero explode — all R replicate weights
# are projected as columns and aggregated in the same partial agg; the
# output is R rows regardless of corpus size.
# --------------------------------------------------------------------------
BOOT_R = 8  #: bootstrap replicates
#: cumulative Poisson(1) CDF in millionths: P(X <= k) for k = 0..7
BOOT_CDF_X1E6 = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989)


def _boot_u_sql(r: int) -> str:
    return (
        f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|{r}'), 1, 8))::UBIGINT"
        f" * 1000000 // 4294967296)"
    )


def _boot_w_sql(r: int) -> str:
    u = _boot_u_sql(r)
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(BOOT_CDF_X1E6)
    )
    return f"(CASE {cases} ELSE 8 END)"


def _bootstrap_oracle() -> str:
    reps = " UNION ALL ".join(
        f"""
    SELECT {r} AS replicate,
           CAST(sum({_boot_w_sql(r)}) AS BIGINT) AS n_docs_eff,
           CAST(sum({_boot_w_sql(r)} * len(string_split(text, ' '))) AS BIGINT)
             AS n_tokens_eff
    FROM documents"""
        for r in range(1, BOOT_R + 1)
    )
    return reps


@query("samp_bootstrap_replicates", oracle=_bootstrap_oracle())
def samp_bootstrap_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R Poisson(1)-weighted replicates of (doc count, token count) —
    one scan, weights as projected columns, R output rows."""
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))

    def w(r: int) -> "F.Column":
        u = F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING) || '|%d'), 1, 8),"
            " 16, 10) AS BIGINT) * 1000000 DIV 4294967296" % r
        )
        expr = F.lit(8)
        for k, t in reversed(list(enumerate(BOOT_CDF_X1E6))):
            expr = F.when(u < t, F.lit(k)).otherwise(expr)
        return expr

    aggs = []
    for r in range(1, BOOT_R + 1):
        aggs.append(F.sum(w(r)).cast("bigint").alias(f"d{r}"))
        aggs.append(F.sum(w(r) * n_toks).cast("bigint").alias(f"t{r}"))
    one = docs.agg(*aggs)
    # reshape the ONE aggregate row to R rows by exploding a literal
    # struct array — a per-replicate unionAll would re-evaluate the
    # aggregate per branch (R separate corpus scans; plan-pinned to 1)
    reps = F.array(*[
        F.struct(
            F.lit(r).alias("replicate"),
            F.col(f"d{r}").alias("n_docs_eff"),
            F.col(f"t{r}").alias("n_tokens_eff"),
        )
        for r in range(1, BOOT_R + 1)
    ])
    return one.select(F.explode(reps).alias("x")).select(
        "x.replicate", "x.n_docs_eff", "x.n_tokens_eff"
    )
