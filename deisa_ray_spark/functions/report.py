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
    from deisa_ray_spark.functions.bpe import BPE_MERGES, bpe_oracle_cte_prefix
    from deisa_ray_spark.functions.dedup import (
        BENCH_MOD,
        JACCARD_THRESHOLD,
        TOMB_MOD,
        _extents_sql,
        contamination_ctes,
        lsh_audit_ctes,
    )
    from deisa_ray_spark.functions.text import BP_PREFIX_TOKENS
    from deisa_ray_spark.functions.quality_model import _nb_ctes, nb_scoring_ctes
    from deisa_ray_spark.functions.similarity import _geo_code_sql
    from deisa_ray_spark.functions.text import gopher_gate_ctes
    from deisa_ray_spark.functions.unigram import uni_oracle_encode_ctes
    from deisa_ray_spark.functions.wordpiece import wp_oracle_encode_ctes

    thresh_bucket = int(JACCARD_THRESHOLD * 10)
    return f"""
    WITH {_extents_sql()},
    {_nb_ctes()},
    {nb_scoring_ctes()},
    {gopher_gate_ctes()},
    {contamination_ctes()},
    {lsh_audit_ctes()},
    {bpe_oracle_cte_prefix()},
    {wp_oracle_encode_ctes()},
    {uni_oracle_encode_ctes()},
    tokw AS (SELECT CAST(sum(cnt) AS BIGINT) AS occ FROM r0),
    tokb AS (
      SELECT CAST(sum(cnt * len(string_split(substring(s, 2, length(s)-2),
                                             chr(1)||chr(1)))) AS BIGINT)
               AS pieces
      FROM r{BPE_MERGES}
    ),
    tokwp AS (
      SELECT CAST(sum(w0.cnt * e2.n_pieces) AS BIGINT) AS pieces,
             CAST(sum(w0.cnt * e2.unk) AS BIGINT) AS unk
      FROM wp_enc e2 JOIN w0 USING (w)
    ),
    toku AS (
      -- uwords_all, NOT the length-capped uwords: uni_enc's unk=1 rows
      -- are exactly the over-length words, which uwords would drop —
      -- the Spark twin joins the full word-freq frame (_uni_trained's
      -- wf), so a capped join would diverge on the first 13+-char word
      SELECT CAST(sum(uw.cnt * u.n_pieces) AS BIGINT) AS pieces,
             CAST(sum(uw.cnt * u.unk) AS BIGINT) AS unk,
             CAST(sum(uw.cnt) AS BIGINT) AS occ
      FROM uni_enc u JOIN uwords_all uw USING (w)
    ),
    embt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
             CAST(count(DISTINCT {_geo_code_sql(0)}) AS BIGINT) AS n_geo_cells
      FROM embeddings
    ),
    embl AS (
      SELECT CAST(max(n) AS BIGINT) AS largest
      FROM (SELECT count(*) AS n FROM embeddings GROUP BY label)
    ),
    corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
                 AS n_exact_dup_docs
      FROM documents
    ),
    vocabv AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_types
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    tplv AS (
      SELECT CAST(max(n) AS BIGINT) AS top_prefix FROM (
        SELECT count(*) AS n FROM (
          SELECT array_to_string((string_split(text, ' '))[1:{BP_PREFIX_TOKENS}],
                                 ' ') AS p
          FROM documents
        ) GROUP BY p
      )
    ),
    tombv AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tomb,
             CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT)
               AS tomb_tokens
      FROM documents WHERE doc_id % {TOMB_MOD} = 0
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
    UNION ALL SELECT 'embedding', 'n_vectors', n_vectors, -1 FROM embt
    UNION ALL SELECT 'embedding', 'n_labels', n_labels, -1 FROM embt
    UNION ALL SELECT 'embedding', 'n_geo_cells', n_geo_cells, -1 FROM embt
    UNION ALL
    SELECT 'embedding', 'largest_label_members', largest,
           CAST(largest * 1000000 // (SELECT n_vectors FROM embt) AS BIGINT)
    FROM embl
    UNION ALL
    SELECT 'retrieval', 'lsh_pairs_above_thresh',
           CAST(count(*) AS BIGINT),
           CAST(CASE WHEN count(*) = 0 THEN -1
                ELSE sum(CASE WHEN caught THEN 1 ELSE 0 END) * 1000000
                     // count(*) END AS BIGINT)
    FROM marked WHERE bucket >= {thresh_bucket}
    UNION ALL SELECT 'tokenizer', 'word_occurrences', occ, -1 FROM tokw
    UNION ALL
    SELECT 'tokenizer', 'bpe_pieces', pieces,
           CAST(pieces * 1000000 // (SELECT occ FROM tokw) AS BIGINT)
    FROM tokb
    UNION ALL
    SELECT 'tokenizer', 'wp_pieces', pieces,
           CAST(pieces * 1000000 // (SELECT occ FROM tokw) AS BIGINT)
    FROM tokwp
    UNION ALL
    SELECT 'tokenizer', 'wp_unk_occurrences', unk,
           CAST(unk * 1000000 // (SELECT occ FROM tokw) AS BIGINT)
    FROM tokwp
    UNION ALL
    SELECT 'tokenizer', 'uni_pieces', pieces,
           CAST(pieces * 1000000 // occ AS BIGINT)
    FROM toku
    UNION ALL
    SELECT 'tokenizer', 'uni_unk_occurrences', unk,
           CAST(unk * 1000000 // occ AS BIGINT)
    FROM toku
    UNION ALL
    SELECT 'vocabulary', 'n_token_types', n_types,
           n_types * 1000000 // (SELECT n_tokens FROM corpus)
    FROM vocabv
    UNION ALL
    SELECT 'templates', 'top_prefix_docs', top_prefix,
           top_prefix * 1000000 // (SELECT n_docs FROM corpus)
    FROM tplv
    UNION ALL
    SELECT 'deletions', 'tombstone_docs', n_tomb,
           n_tomb * 1000000 // (SELECT n_docs FROM corpus)
    FROM tombv
    UNION ALL
    SELECT 'deletions', 'tombstone_tokens', tomb_tokens,
           tomb_tokens * 1000000 // (SELECT n_tokens FROM corpus)
    FROM tombv
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

    # v2 sections (r10): embedding-space health, LSH retrieval audit,
    # tokenizer fertility — each composed from its owning module's
    # single-source builders and session-cached to one 1-row frame.
    from deisa_ray_spark.functions.dedup import (
        JACCARD_THRESHOLD,
        lsh_audit_marked,
    )
    from deisa_ray_spark.functions.similarity import _emb, _geo_code

    def build_embed() -> DataFrame:
        embf = _emb(spark, sf_dir)
        base = embf.agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
            F.countDistinct(_geo_code(F.col("e"), 0)).alias("n_geo_cells"),
        )
        big = (
            embf.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("largest"))
        )
        return base.join(F.broadcast(big), F.lit(True))

    embt = _session_cached(spark, "card_embedding", sf_dir, build_embed)
    for m in ("n_vectors", "n_labels", "n_geo_cells"):
        frames.append(embt.select(*_row("embedding", m, F.col(m))))
    frames.append(
        embt.select(*_row("embedding", "largest_label_members",
                          F.col("largest"), share("largest", "n_vectors")))
    )
    ret = _session_cached(
        spark,
        "card_lsh",
        sf_dir,
        lambda: lsh_audit_marked(spark, sf_dir)
        .filter(F.col("bucket") >= int(JACCARD_THRESHOLD * 10))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("caught").cast("int")).alias("n_caught"),
        ),
    )
    frames.append(
        ret.select(*_row(
            "retrieval", "lsh_pairs_above_thresh", F.col("n_pairs"),
            F.when(F.col("n_pairs") == 0, F.lit(-1))
            .otherwise(F.expr("n_caught * 1000000 DIV n_pairs")),
        ))
    )

    def build_tok() -> DataFrame:
        from deisa_ray_spark.functions.bpe import _bpe_trained
        from deisa_ray_spark.functions.bpe import _syms as _bpe_syms
        from deisa_ray_spark.functions.unigram import _uni_trained
        from deisa_ray_spark.functions.wordpiece import _wp_trained

        _bm, bvocab = _bpe_trained(spark, sf_dir)
        bp = bvocab.agg(
            F.sum("cnt").alias("occ"),
            F.sum(F.col("cnt") * F.size(_bpe_syms())).alias("bpe_pieces"),
        )
        _wm, wstate, wpe = _wp_trained(spark, sf_dir)
        wp = wpe.join(wstate.select("w", "cnt"), "w").agg(
            F.sum(F.col("cnt") * F.col("n_pieces")).alias("wp_pieces"),
            F.sum(F.col("cnt") * F.col("unk")).alias("wp_unk"),
        )
        _um, uni_wf, uni_enc, _ml = _uni_trained(spark, sf_dir)
        un = uni_enc.join(uni_wf.select("w", "cnt"), "w").agg(
            F.sum(F.col("cnt") * F.col("n_pieces")).alias("uni_pieces"),
            F.sum(F.col("cnt") * F.col("unk")).alias("uni_unk"),
            F.sum("cnt").alias("uni_occ"),
        )
        return bp.join(F.broadcast(wp), F.lit(True)).join(
            F.broadcast(un), F.lit(True)
        )

    tok = _session_cached(spark, "card_tokenizer", sf_dir, build_tok)
    frames.append(tok.select(*_row("tokenizer", "word_occurrences",
                                   F.col("occ"))))
    frames.append(tok.select(*_row("tokenizer", "bpe_pieces",
                                   F.col("bpe_pieces"),
                                   share("bpe_pieces", "occ"))))
    frames.append(tok.select(*_row("tokenizer", "wp_pieces",
                                   F.col("wp_pieces"),
                                   share("wp_pieces", "occ"))))
    frames.append(tok.select(*_row("tokenizer", "wp_unk_occurrences",
                                   F.col("wp_unk"), share("wp_unk", "occ"))))
    frames.append(tok.select(*_row("tokenizer", "uni_pieces",
                                   F.col("uni_pieces"),
                                   share("uni_pieces", "uni_occ"))))
    frames.append(tok.select(*_row("tokenizer", "uni_unk_occurrences",
                                   F.col("uni_unk"),
                                   share("uni_unk", "uni_occ"))))

    # v3 sections (r10, cont.): vocabulary size, template (boilerplate)
    # concentration, and the pending-deletion footprint — single-scan
    # integer aggregates over the shared corpus totals, each constant
    # (BP_PREFIX_TOKENS, TOMB_MOD) imported from its owning module.
    # Canonical-change counts stay in dedup_tombstone_propagation: its
    # oracle needs the recursive CC chain, which the card oracle
    # deliberately avoids (the card must stay cap-safe at sf1).
    from deisa_ray_spark.functions.dedup import TOMB_MOD
    from deisa_ray_spark.functions.text import BP_PREFIX_TOKENS

    vocab = _session_cached(
        spark,
        "card_vocab",
        sf_dir,
        lambda: docs.select(F.explode(F.split("text", " ")).alias("tok")).agg(
            F.countDistinct("tok").alias("n_types")
        ),
    ).join(tot, F.lit(True))
    frames.append(
        vocab.select(*_row("vocabulary", "n_token_types", F.col("n_types"),
                           share("n_types", "n_tokens")))
    )
    tpl = _session_cached(
        spark,
        "card_templates",
        sf_dir,
        lambda: docs.select(
            F.array_join(
                F.slice(F.split("text", " "), 1, BP_PREFIX_TOKENS), " "
            ).alias("p")
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("top_prefix")),
    ).join(tot, F.lit(True))
    frames.append(
        tpl.select(*_row("templates", "top_prefix_docs", F.col("top_prefix"),
                         share("top_prefix", "n_docs")))
    )
    tomb = _session_cached(
        spark,
        "card_tombstones",
        sf_dir,
        lambda: docs.filter(F.col("doc_id") % TOMB_MOD == 0).agg(
            F.count(F.lit(1)).alias("n_tomb"),
            F.coalesce(F.sum(n_toks), F.lit(0)).alias("tomb_tokens"),
        ),
    ).join(tot, F.lit(True))
    frames.append(
        tomb.select(*_row("deletions", "tombstone_docs", F.col("n_tomb"),
                          share("n_tomb", "n_docs")))
    )
    frames.append(
        tomb.select(*_row("deletions", "tombstone_tokens",
                          F.col("tomb_tokens"), share("tomb_tokens", "n_tokens")))
    )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


# --------------------------------------------------------------------------
# report_snapshot_drift — DISTRIBUTION drift between two corpus
# snapshots: the check a pipeline runs before swapping a training
# corpus (did the source/language/length mixture move?). Complements
# txt_snapshot_delta, which diffs doc-level MEMBERSHIP (added/removed/
# changed); this diffs the MIXTURE: per dimension (source, lang,
# power-of-two token-length bucket), each bucket's share of snapshot v1
# vs v2 in millionths, and the absolute share drift — plus one rollup
# row per dimension whose drift cell is the summed absolute drift (2x
# the total-variation distance, integer-exact).
#
# Snapshots reuse txt_snapshot_delta's deterministic definitions
# (text.SNAP_V1_MOD / SNAP_V2_MOD — single source); the "edited" docs
# of the delta query are irrelevant here (mixture dims don't read the
# fingerprint). All cells are counts or truncating-DIV millionths —
# bit-exact both engines, no doubles.
#
# Scale shape: ONE corpus scan — the three dimensions unpivot via
# stack() into a narrow (dim, bucket, v1, v2) stream before the
# (dim, bucket)-keyed partial agg; totals ride a broadcast 1-row frame;
# the per-dim rollup aggregates the tiny bucketed frame again.
# --------------------------------------------------------------------------
def _drift_oracle() -> str:
    from deisa_ray_spark.functions.text import SNAP_V1_MOD, SNAP_V2_MOD

    return f"""
    WITH snap AS (
      SELECT source, lang,
             CASE WHEN n >= 1024 THEN '1024' WHEN n >= 512 THEN '512'
                  WHEN n >= 256 THEN '256'  WHEN n >= 128 THEN '128'
                  WHEN n >= 64  THEN '64'   ELSE '32' END AS len_bucket,
             CASE WHEN doc_id % {SNAP_V1_MOD} <> 0 THEN 1 ELSE 0 END AS v1,
             CASE WHEN doc_id % {SNAP_V2_MOD} <> 0 THEN 1 ELSE 0 END AS v2
      FROM (SELECT doc_id, source, lang,
                   len(string_split(text, ' ')) AS n FROM documents)
    ),
    tot AS (SELECT CAST(sum(v1) AS BIGINT) AS t1,
                   CAST(sum(v2) AS BIGINT) AS t2 FROM snap),
    melted AS (
      SELECT 'source' AS dim, source AS bucket, v1, v2 FROM snap
      UNION ALL SELECT 'lang', lang, v1, v2 FROM snap
      UNION ALL SELECT 'len_bucket', len_bucket, v1, v2 FROM snap
    ),
    bucketed AS (
      SELECT dim, bucket,
             CAST(sum(v1) AS BIGINT) AS n_v1,
             CAST(sum(v2) AS BIGINT) AS n_v2,
             CAST(sum(v1) * 1000000 // (SELECT t1 FROM tot) AS BIGINT)
               AS share_v1_x1e6,
             CAST(sum(v2) * 1000000 // (SELECT t2 FROM tot) AS BIGINT)
               AS share_v2_x1e6
      FROM melted GROUP BY dim, bucket
    )
    SELECT dim, bucket, n_v1, n_v2, share_v1_x1e6, share_v2_x1e6,
           CAST(abs(share_v1_x1e6 - share_v2_x1e6) AS BIGINT) AS drift_x1e6
    FROM bucketed
    UNION ALL
    SELECT dim, '__tv_total', CAST(sum(n_v1) AS BIGINT),
           CAST(sum(n_v2) AS BIGINT),
           CAST(1000000 AS BIGINT), CAST(1000000 AS BIGINT),
           CAST(sum(abs(share_v1_x1e6 - share_v2_x1e6)) AS BIGINT)
    FROM bucketed GROUP BY dim
    """


@query("report_snapshot_drift", oracle=_drift_oracle())
def report_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.functions.text import SNAP_V1_MOD, SNAP_V2_MOD

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    len_bucket = (
        F.when(n >= 1024, "1024").when(n >= 512, "512").when(n >= 256, "256")
        .when(n >= 128, "128").when(n >= 64, "64").otherwise("32")
    )
    snap = docs.select(
        "source",
        "lang",
        len_bucket.alias("len_bucket"),
        (F.col("doc_id") % SNAP_V1_MOD != 0).cast("int").alias("v1"),
        (F.col("doc_id") % SNAP_V2_MOD != 0).cast("int").alias("v2"),
    )
    melted = snap.select(
        F.expr(
            "stack(3, 'source', source, 'lang', lang, "
            "'len_bucket', len_bucket) AS (dim, bucket)"
        ),
        "v1",
        "v2",
    )
    tot = F.broadcast(
        snap.agg(F.sum("v1").alias("t1"), F.sum("v2").alias("t2"))
    )
    bucketed = (
        melted.groupBy("dim", "bucket")
        .agg(
            F.sum("v1").cast("bigint").alias("n_v1"),
            F.sum("v2").cast("bigint").alias("n_v2"),
        )
        .join(tot, F.lit(True))
        .select(
            "dim",
            "bucket",
            "n_v1",
            "n_v2",
            F.expr("n_v1 * 1000000 DIV t1").cast("bigint")
            .alias("share_v1_x1e6"),
            F.expr("n_v2 * 1000000 DIV t2").cast("bigint")
            .alias("share_v2_x1e6"),
        )
    )
    per_bucket = bucketed.withColumn(
        "drift_x1e6",
        F.abs(F.col("share_v1_x1e6") - F.col("share_v2_x1e6")).cast("bigint"),
    )
    rollup = bucketed.groupBy("dim").agg(
        F.sum("n_v1").cast("bigint").alias("n_v1"),
        F.sum("n_v2").cast("bigint").alias("n_v2"),
        F.lit(1000000).cast("bigint").alias("share_v1_x1e6"),
        F.lit(1000000).cast("bigint").alias("share_v2_x1e6"),
        F.sum(F.abs(F.col("share_v1_x1e6") - F.col("share_v2_x1e6")))
        .cast("bigint")
        .alias("drift_x1e6"),
    ).select(
        "dim", F.lit("__tv_total").alias("bucket"), "n_v1", "n_v2",
        "share_v1_x1e6", "share_v2_x1e6", "drift_x1e6",
    )
    return per_bucket.unionByName(rollup)


# --------------------------------------------------------------------------
# report_term_drift — TOKEN-level drift between the deterministic corpus
# snapshots (shared text.SNAP_V1_MOD/SNAP_V2_MOD — single source with
# txt_snapshot_delta/report_snapshot_drift): the TERM_DRIFT_K tokens
# whose corpus frequency share moved most between v1 and v2, in integer
# millionths. report_snapshot_drift says whether the (source, lang,
# length) MIXTURE moved; this says which VOCABULARY moved — the
# topical-drift alarm (a crawler suddenly over-sampling one domain shows
# up here before it shows up in source shares).
#
# Scale shape: one tokenizing scan with both membership flags as 0/1
# ints (no second pass per snapshot), one (token)-key partial agg,
# 1-row broadcast totals, global top-K via TakeOrdered. Integer
# discipline: shares are n·1e6 DIV total (n ≤ total keeps the product
# under int64 up to ~9e12 occurrences of a single token — Zipf keeps
# the head far below that at any real corpus); drift is an integer, so
# ranking is exact with token tie-break.
# --------------------------------------------------------------------------
TERM_DRIFT_K = 20


def _term_drift_oracle() -> str:
    from deisa_ray_spark.functions.text import SNAP_V1_MOD, SNAP_V2_MOD

    return f"""
    WITH toks AS (
      SELECT CASE WHEN doc_id % {SNAP_V1_MOD} <> 0 THEN 1 ELSE 0 END AS v1,
             CASE WHEN doc_id % {SNAP_V2_MOD} <> 0 THEN 1 ELSE 0 END AS v2,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    per AS (
      SELECT tok, CAST(sum(v1) AS BIGINT) AS n_v1, CAST(sum(v2) AS BIGINT) AS n_v2
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(n_v1) AS BIGINT) AS t1, CAST(sum(n_v2) AS BIGINT) AS t2
      FROM per
    )
    SELECT tok, n_v1, n_v2,
           n_v1 * 1000000 // t1 AS share_v1_x1e6,
           n_v2 * 1000000 // t2 AS share_v2_x1e6,
           abs(n_v1 * 1000000 // t1 - n_v2 * 1000000 // t2) AS drift_x1e6
    FROM per CROSS JOIN tot
    ORDER BY drift_x1e6 DESC, tok
    LIMIT {TERM_DRIFT_K}
    """


@query("report_term_drift", oracle=_term_drift_oracle())
def report_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.functions.text import SNAP_V1_MOD, SNAP_V2_MOD

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % SNAP_V1_MOD != 0).cast("int").alias("v1"),
        (F.col("doc_id") % SNAP_V2_MOD != 0).cast("int").alias("v2"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    # materialize the vocab-sized per-token frame ONCE: it feeds both
    # the output and the totals aggregate, and an unmaterialized reuse
    # would re-tokenize the corpus per consumer (plan-pinned to 1 scan)
    per = toks.groupBy("tok").agg(
        F.sum("v1").cast("bigint").alias("n_v1"),
        F.sum("v2").cast("bigint").alias("n_v2"),
    ).localCheckpoint(eager=True)
    tot = F.broadcast(
        per.agg(
            F.sum("n_v1").cast("bigint").alias("t1"),
            F.sum("n_v2").cast("bigint").alias("t2"),
        )
    )
    s1 = F.expr("n_v1 * 1000000 DIV t1")
    s2 = F.expr("n_v2 * 1000000 DIV t2")
    return (
        per.join(tot)
        .select(
            "tok",
            "n_v1",
            "n_v2",
            s1.alias("share_v1_x1e6"),
            s2.alias("share_v2_x1e6"),
            F.abs(s1 - s2).alias("drift_x1e6"),
        )
        .orderBy(F.desc("drift_x1e6"), F.asc("tok"))
        .limit(TERM_DRIFT_K)
    )
