"""End-to-end corpus-curation FUNNEL — the composed pipeline a
pretraining data build actually runs, as ONE declared query with an
exact oracle: raw → quality gate → exact dedup → fuzzy dedup (verified
near-dup clusters, keep-one) → benchmark decontamination, reporting the
per-stage yield (docs + tokens surviving each stage).

Every stage reuses a single source of truth for its semantics — the
quality gate is a two-rule filter on the shared FUNNEL_MIN_TOKENS /
FUNNEL_MIN_TTR constants below (a deliberately simpler gate than
txt_quality_score's full rule set: the funnel's point is stage
COMPOSITION, and the two named constants keep the Spark path and the
oracle from drifting), exact dedup is md5 keep-min, fuzzy dedup is the
shared verified_pairs_ctes()/cc_pairs graph + cc_labels clustering, and
decontamination is the shared contaminated_ids() benchmark slice — so
the funnel cannot drift from the per-stage operators it composes
(reference parity: the per-op counterparts cite the reference's own
test queries; this file is the composition layer).

Scale notes (100 TB): the corpus-wide frames (base, s1..s4) are narrow
(doc_id + 3 ints) projections — the text column is dropped before any
shuffle; shingle work rides the session-cached shingle table exactly as
the standalone dedup ops do; the cluster-drop and contamination sets
are tiny (pair-graph members / contaminated ids) and broadcast into
anti-joins. The five stage aggregates are partial-agg'd counts over the
shared persisted base — one narrow pass each, no corpus re-scan of the
raw parquet. No pairwise stage beyond the LSH-bounded pair extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table
from deisa_ray_spark.functions.dedup import (
    BENCH_MOD,
    _session_cached,
    cc_labels,
    cc_pairs,
    contaminated_ids,
    verified_pairs_ctes,
)

#: Quality-stage gate constants — the ONE definition both the Spark
#: path and the oracle interpolate (see module docstring).
FUNNEL_MIN_TOKENS = 10
FUNNEL_MIN_TTR = 0.2

_FUNNEL_ORACLE = f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks, md5(text) AS fp
            FROM documents),
    base AS (SELECT doc_id, len(toks) AS n_tokens,
                    len(list_distinct(toks)) / len(toks) AS ttr, fp
             FROM tok),
    s1 AS (SELECT * FROM base
           WHERE n_tokens >= {FUNNEL_MIN_TOKENS} AND ttr >= {FUNNEL_MIN_TTR}),
    k2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY fp),
    s2 AS (SELECT b.* FROM s1 b JOIN k2 USING (doc_id)),
    {verified_pairs_ctes()},
    p2 AS (SELECT * FROM p
           WHERE doc_a IN (SELECT doc_id FROM s2)
             AND doc_b IN (SELECT doc_id FROM s2)),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM p2
              UNION SELECT doc_b, doc_a FROM p2),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e2.dst, r.comp FROM reach r JOIN edges e2 ON e2.src = r.id
    ),
    comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
    s3 AS (SELECT * FROM s2
           WHERE doc_id NOT IN (SELECT id FROM comps WHERE id <> comp)),
    bench AS (SELECT DISTINCT s FROM e WHERE doc_id % {BENCH_MOD} = 0),
    cont AS (SELECT DISTINCT doc_id FROM e
             WHERE doc_id % {BENCH_MOD} <> 0 AND s IN (SELECT s FROM bench)),
    s4 AS (SELECT * FROM s3
           WHERE doc_id % {BENCH_MOD} <> 0
             AND doc_id NOT IN (SELECT doc_id FROM cont)),
    funnel AS (
      SELECT 0 AS stage_ord, 'raw' AS stage,
             count(*) AS n_docs, sum(n_tokens) AS n_tokens FROM base
      UNION ALL SELECT 1, 'quality', count(*), sum(n_tokens) FROM s1
      UNION ALL SELECT 2, 'exact_dedup', count(*), sum(n_tokens) FROM s2
      UNION ALL SELECT 3, 'fuzzy_dedup', count(*), sum(n_tokens) FROM s3
      UNION ALL SELECT 4, 'decontaminated', count(*), sum(n_tokens) FROM s4
    )
    SELECT CAST(stage_ord AS INT) AS stage_ord, stage,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM funnel
    """


@query("pipeline_funnel", oracle=_FUNNEL_ORACLE)
def pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = F.split("text", " ")
        return docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
            F.md5("text").alias("fp"),
        )

    base = _session_cached(spark, "funnel_base", sf_dir, build, eager=True)
    s1 = base.filter(
        (F.col("n_tokens") >= FUNNEL_MIN_TOKENS) & (F.col("ttr") >= FUNNEL_MIN_TTR)
    )
    k2 = s1.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    s2 = s1.join(k2.select("doc_id"), "doc_id", "left_semi")

    # fuzzy stage: verified pair graph restricted to exact-dedup
    # survivors, clustered, keep the min-id member of each cluster
    s2_ids = s2.select("doc_id")
    pairs = (
        cc_pairs(spark, sf_dir)
        .join(s2_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(s2_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    )
    comps = cc_labels(pairs)
    drop3 = comps.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    s3 = s2.join(drop3, "doc_id", "left_anti")

    # decontamination: drop the benchmark slice itself, then every
    # survivor sharing a shingle with it — the shared contaminated_ids
    # definition (same single source of truth as dedup_decontaminate)
    s4 = s3.filter(F.col("doc_id") % BENCH_MOD != 0).join(
        contaminated_ids(spark, sf_dir), "doc_id", "left_anti"
    )

    stages = [
        (0, "raw", base),
        (1, "quality", s1),
        (2, "exact_dedup", s2),
        (3, "fuzzy_dedup", s3),
        (4, "decontaminated", s4),
    ]
    rows = [
        df.agg(
            F.lit(ord_).cast("int").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        for ord_, name, df in stages
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --------------------------------------------------------------------------
# sink_docs_jsonl_checksum — the DELIVERY end of the funnel: the document
# table exported as doc_id-range JSONL shards (sinks.write_docs_jsonl,
# the format training jobs consume) and read back under an explicit
# schema; the declared output is a corpus checksum over the ROUND-TRIPPED
# rows, oracled against the same checksum computed directly on the
# source parquet — i.e. the export is pinned LOSSLESS (JSON string
# escaping, bigint fidelity, shard completeness) rather than assumed.
#
# Checksum design: content hash = md5 of (text|lang|source) truncated to
# 32 bits, weighted by (doc_id % 1000 + 1) — weights make silent row
# SWAPS visible, the 1000-cap keeps the sum far from bigint overflow at
# any SF (2^32 · 10^3 · n_docs ≪ 2^63 up to ~10^6 docs per checksum
# group; beyond that the checksum would shard by range, same plan).
# Scale: export is one range-shuffle + distributed write; the checksum
# is one partial-agg scan of the shards.
# --------------------------------------------------------------------------
@query(
    "sink_docs_jsonl_checksum",
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(sum(CAST(('0x' || substr(md5(concat_ws('|', text, lang, source)), 1, 8))
                    AS BIGINT) * (doc_id % 1000 + 1)) AS BIGINT) AS content_sum
    FROM documents
    """,
)
def sink_docs_jsonl_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from deisa_ray_spark.operators.grid_ops import _scratch
    from deisa_ray_spark.sinks import write_docs_jsonl

    from deisa_ray_spark.sources.registry import load_documents_jsonl

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_scratch("docs_jsonl"), os.path.basename(sf_dir))
    write_docs_jsonl(docs, path)
    # read back through the declared JSONL-ingest path (single schema
    # source + corrupt-line discipline), not a hand-inlined read; both
    # engines hash concat_ws so a NULL lang/source is SKIPPED, not
    # NULL-poisoned ('a'||NULL is NULL in SQL, which would silently drop
    # the row from the oracle's sum while Spark kept it)
    back = load_documents_jsonl(spark, path)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("text"), F.col("lang"), F.col("source"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_n_chars"),
        F.sum(h * (F.col("doc_id") % 1000 + 1)).alias("content_sum"),
    )
