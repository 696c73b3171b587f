"""Unigram-LM tokenizer family (SentencePiece-style) — the third
production subword tokenizer next to BPE (``functions/bpe.py``) and
WordPiece (``functions/wordpiece.py``): ``txt_unigram_train`` (the
pruned piece model), ``txt_unigram_encode`` (Viterbi segmentation,
per-document piece stats + corpus-likelihood), and
``txt_unigram_vocab`` (final-model piece usage census).

Semantics (public: Kudo 2018 "Subword Regularization"; the SentencePiece
unigram trainer). The full algorithm is soft-EM over all segmentations +
loss-ranked pruning; we implement the standard deterministic
simplification — HARD-EM (Viterbi counts) with usage-ranked pruning:

- SEED: candidate vocab = every substring of length <= UNI_MAX_PIECE of
  the distinct-word table, occurrence-weighted by word frequency;
  single-character pieces are all kept (the base alphabet — never
  pruned, so every word stays segmentable), multi-character candidates
  keep the top UNI_SEED by (count DESC, piece ASC).
- ROUND (x UNI_ROUNDS): Viterbi-segment every distinct word under the
  current piece log-probabilities (forward DP with backpointers +
  unrolled backtrack), count piece USAGE (word-frequency-weighted
  occurrences in the chosen segmentations) — the hard-EM E-step; prune
  the bottom third of multi-character pieces by (usage DESC, piece
  ASC); re-estimate log-probs from Laplace-smoothed usage — the M-step.
- ENCODE: Viterbi forward DP under the final model; words longer than
  UNI_MAX_WORD collapse to one UNK (the WordPiece convention), with
  score_fp 0 and unk 1.

Cross-engine determinism (the quality_model/wordpiece discipline):

- Piece log-probs are the ONLY float step — one ln() of a ratio of
  exact integers per piece, immediately scaled UNI_SCALE=1e6 and
  rounded to BIGINT fixed point (identical expression shape in Spark
  ``F.log`` and DuckDB ``ln``).
- The DP is pure integer arithmetic over those fixed-point weights;
  ties break by (score DESC, n_pieces ASC, backpointer ASC) — a total
  order because the backpointer uniquely identifies the candidate
  piece — so forward, backtrack, usage counts, pruning, and the final
  segmentation are bit-identical across engines and partitionings, and
  the K rounds UNROLL into plain SQL (MATERIALIZED CTEs — the BPE
  lesson): every query carries a full exact oracle.

Scale: everything trains on the DISTINCT-WORD table (sublinear in
corpus — Heaps' law). Forward DP state is |words| x UNI_MAX_WORD rows;
each unrolled position is one equi-join to the piece table + one
per-word window; backtrack walks <= UNI_MAX_WORD steps over the same
state frame. The corpus is touched once per query, by the doc-word ⋈
encode-table join (frequency-partitioned via ``hot_split_join`` — the
BPE/WP/DSIR Zipf posture). Trained frames are session-cached model
artifacts (``_UNI_CACHE``).

Reference parity: the reference has no tokenizer; this completes the
BPE + WordPiece + Unigram production tokenizer set (SURVEY.md §6
additions), and ``txt_tokenizer_fertility_ab`` (wordpiece.py) becomes a
three-way report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from deisa_ray_spark.functions.bpe import _word_freq
from deisa_ray_spark.functions.dedup import free_local_checkpoint
from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

UNI_MAX_WORD = 12  #: Viterbi unroll bound; longer words -> whole-word UNK
UNI_MAX_PIECE = 5  #: max candidate piece length
UNI_SEED = 200  #: multi-char candidates kept at seeding (top by count)
UNI_ROUNDS = 2  #: hard-EM (Viterbi-count) + prune rounds
UNI_KEEP_NUM, UNI_KEEP_DEN = 2, 3  #: keep top 2/3 of multi-char pieces/round
UNI_SCALE = 10**6  #: fixed-point scale for piece ln-prob weights


# --------------------------------------------------------------------------
# oracle CTE chain
# --------------------------------------------------------------------------
def _fwd_ctes(tag: str, vocab: str, words: str) -> str:
    """Unrolled forward-Viterbi CTEs ``{tag}0..{tag}{UNI_MAX_WORD}`` over
    ``words(w, cnt)`` (len <= UNI_MAX_WORD) against ``vocab(piece,
    w_fp)``, plus the combined state ``{tag}s(w, j, best_fp, np, bp)``."""
    parts = [f"""
    {tag}0 AS MATERIALIZED (
      SELECT w, CAST(0 AS BIGINT) AS best_fp, 0 AS np, 0 AS bp
      FROM {words}
    )"""]
    for j in range(1, UNI_MAX_WORD + 1):
        prev = " UNION ALL ".join(
            f"SELECT w, {i} AS j, best_fp, np FROM {tag}{i}"
            for i in range(max(0, j - UNI_MAX_PIECE), j)
        )
        parts.append(f"""
    {tag}{j} AS MATERIALIZED (
      SELECT w, best_fp, np, bp FROM (
        SELECT s.w, s.best_fp + v.w_fp AS best_fp, s.np + 1 AS np,
               s.j AS bp,
               row_number() OVER (
                 PARTITION BY s.w
                 ORDER BY s.best_fp + v.w_fp DESC, s.np + 1 ASC, s.j ASC
               ) AS rn
        FROM ({prev}) s
        JOIN {vocab} v ON v.piece = substring(s.w, s.j + 1, {j} - s.j)
        WHERE length(s.w) >= {j}
      ) WHERE rn = 1
    )""")
    states = " UNION ALL ".join(
        f"SELECT w, {j} AS j, best_fp, np, bp FROM {tag}{j}"
        for j in range(UNI_MAX_WORD + 1)
    )
    parts.append(f"""
    {tag}s AS MATERIALIZED ({states})""")
    return ",".join(parts)


def _bt_ctes(tag: str, states: str, words: str) -> str:
    """Unrolled backtrack CTEs over ``states`` starting at cur=len(w):
    emits ``{tag}occ(w, piece)`` — one row per piece occurrence in each
    word's chosen segmentation."""
    parts = [f"""
    {tag}0 AS (SELECT w, length(w) AS cur FROM {words})"""]
    for t in range(1, UNI_MAX_WORD + 1):
        parts.append(f"""
    {tag}{t} AS MATERIALIZED (
      SELECT b.w, substring(b.w, s.bp + 1, b.cur - s.bp) AS piece,
             s.bp AS cur
      FROM {tag}{t - 1} b JOIN {states} s ON s.w = b.w AND s.j = b.cur
      WHERE b.cur > 0
    )""")
    occ = " UNION ALL ".join(
        f"SELECT w, piece FROM {tag}{t}" for t in range(1, UNI_MAX_WORD + 1)
    )
    parts.append(f"""
    {tag}occ AS MATERIALIZED ({occ})""")
    return ",".join(parts)


def uni_oracle_model_ctes(extra_where: str = "") -> str:
    """Seeding + UNI_ROUNDS hard-EM rounds, ending in ``uni_model(piece,
    usage, w_fp, is_single)``. ``uwords(w, cnt)`` is the DP word table
    (len <= UNI_MAX_WORD); ``uwords_all`` includes over-length words.
    ``extra_where`` filters the TRAINING word table ``uwords`` only
    (the holdout A/B trains on a lexicon slice); ``uwords_all`` always
    stays the full corpus lexicon. Default keeps the chain
    byte-identical."""
    parts = [f"""
    uwords_all AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w
    ),
    uwords AS MATERIALIZED (
      SELECT w, cnt FROM uwords_all
      WHERE length(w) <= {UNI_MAX_WORD}{extra_where}
    ),
    usubs AS MATERIALIZED (
      SELECT substring(w, i, L) AS piece, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM uwords,
           unnest(range(1, length(w) + 1)) AS ti(i),
           unnest(range(1, {UNI_MAX_PIECE} + 1)) AS tl(L)
      WHERE i + L - 1 <= length(w)
      GROUP BY 1
    ),
    ucand AS MATERIALIZED (
      SELECT piece, pcnt AS usage, (length(piece) = 1) AS is_single
      FROM (
        SELECT piece, pcnt,
               CASE WHEN length(piece) = 1 THEN 0
                    ELSE row_number() OVER (
                      PARTITION BY (length(piece) = 1)
                      ORDER BY pcnt DESC, piece ASC) END AS rk
        FROM usubs
      ) WHERE rk <= {UNI_SEED}
    ),
    utot0 AS (SELECT CAST(sum(usage) AS BIGINT) AS tot,
                     CAST(count(*) AS BIGINT) AS n FROM ucand),
    uv0 AS MATERIALIZED (
      SELECT piece, usage, is_single,
             CAST(round(ln((usage + 1) * 1.0 / (tot + n)) * {UNI_SCALE})
                  AS BIGINT) AS w_fp
      FROM ucand CROSS JOIN utot0
    )"""]
    for r in range(1, UNI_ROUNDS + 1):
        parts.append(_fwd_ctes(f"uf{r}_", f"uv{r - 1}", "uwords"))
        parts.append(_bt_ctes(f"ub{r}_", f"uf{r}_s", "uwords"))
        parts.append(f"""
    uu{r} AS MATERIALIZED (
      SELECT o.piece, CAST(sum(uw.cnt) AS BIGINT) AS usage
      FROM ub{r}_occ o JOIN uwords uw USING (w) GROUP BY o.piece
    ),
    uk{r} AS MATERIALIZED (
      SELECT v.piece, COALESCE(u.usage, 0) AS usage, v.is_single
      FROM uv{r - 1} v LEFT JOIN uu{r} u USING (piece)
    ),
    uvr{r} AS MATERIALIZED (
      SELECT piece, usage, is_single FROM (
        SELECT piece, usage, is_single,
               CASE WHEN is_single THEN 0
                    ELSE row_number() OVER (
                      PARTITION BY is_single
                      ORDER BY usage DESC, piece ASC) END AS rk,
               CAST(sum(CASE WHEN is_single THEN 0 ELSE 1 END)
                    OVER () AS BIGINT) AS nm
        FROM uk{r}
      ) WHERE is_single OR rk <= (nm * {UNI_KEEP_NUM}) // {UNI_KEEP_DEN}
    ),
    utot{r} AS (SELECT CAST(sum(usage) AS BIGINT) AS tot,
                       CAST(count(*) AS BIGINT) AS n FROM uvr{r}),
    uv{r} AS MATERIALIZED (
      SELECT piece, usage, is_single,
             CAST(round(ln((usage + 1) * 1.0 / (tot + n)) * {UNI_SCALE})
                  AS BIGINT) AS w_fp
      FROM uvr{r} CROSS JOIN utot{r}
    )""")
    parts.append(f"""
    uni_model AS MATERIALIZED (
      SELECT piece, usage, w_fp, CAST(is_single AS INT) AS is_single
      FROM uv{UNI_ROUNDS}
    )""")
    return ",".join(parts)


def uni_oracle_encode_ctes() -> str:
    """Model chain + final forward DP, ending in ``uni_enc(w, n_pieces,
    unk, score_fp)`` over ALL distinct words (over-length -> UNK)."""
    return (
        uni_oracle_model_ctes()
        + ","
        + _fwd_ctes("ue_", "uni_model", "uwords")
        + f""",
    uni_enc AS MATERIALIZED (
      SELECT s.w, CAST(s.np AS BIGINT) AS n_pieces, 0 AS unk,
             s.best_fp AS score_fp
      FROM ue_s s WHERE s.j = length(s.w) AND s.j > 0
      UNION ALL
      SELECT w, CAST(1 AS BIGINT) AS n_pieces, 1 AS unk,
             CAST(0 AS BIGINT) AS score_fp
      FROM uwords_all WHERE length(w) > {UNI_MAX_WORD}
    )"""
    )


# --------------------------------------------------------------------------
# Spark implementation
# --------------------------------------------------------------------------
def uni_viterbi_forward(
    words: DataFrame, vocab: DataFrame, rounds: int = UNI_MAX_WORD
) -> DataFrame:
    """Forward Viterbi DP over ``words(w)`` (len <= UNI_MAX_WORD)
    against ``vocab(piece, w_fp)``: returns the combined state ``(w, j,
    best_fp, np, bp)`` for every reachable position j=0..len(w).
    Single-character pieces are always in the vocab, so every position
    is reachable. ``rounds`` may be the corpus max word length — every
    round past it is an empty frame, so a data-bounded unroll is
    result-identical to the full UNI_MAX_WORD unroll (the static SQL
    twin keeps all rounds; empty CTEs are free there, empty Spark jobs
    are not)."""
    state = words.select(
        "w",
        F.lit(0).alias("j"),
        F.lit(0).cast("bigint").alias("best_fp"),
        F.lit(0).alias("np"),
        F.lit(0).alias("bp"),
    ).localCheckpoint()
    frames = [state]
    for j in range(1, rounds + 1):
        prev = frames[max(0, j - UNI_MAX_PIECE)]
        for i in range(max(0, j - UNI_MAX_PIECE) + 1, j):
            prev = prev.unionByName(frames[i])
        w_rank = W.partitionBy("w").orderBy(
            F.col("cand_fp").desc(), F.col("cand_np").asc(), F.col("j").asc()
        )
        nxt = (
            prev.filter(F.length("w") >= j)
            .withColumn("piece", F.expr(f"substring(w, j + 1, {j} - j)"))
            .join(vocab, "piece")
            .select(
                "w",
                "j",
                (F.col("best_fp") + F.col("w_fp")).alias("cand_fp"),
                (F.col("np") + 1).alias("cand_np"),
            )
            .withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") == 1)
            .select(
                "w",
                F.lit(j).alias("j"),
                F.col("cand_fp").alias("best_fp"),
                F.col("cand_np").alias("np"),
                F.col("j").alias("bp"),
            )
            .localCheckpoint()
        )
        frames.append(nxt)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    final = out.localCheckpoint()  # eager — copies into fresh blocks
    for f in frames:  # the per-round states are now dead weight
        free_local_checkpoint(f)
    return final


def uni_backtrack(
    states: DataFrame, words: DataFrame, rounds: int = UNI_MAX_WORD
) -> DataFrame:
    """Walk the backpointers from cur=len(w): one output row per piece
    OCCURRENCE in each word's chosen segmentation: ``(w, piece)``."""
    cur0 = words.select("w", F.length("w").alias("cur")).localCheckpoint()
    cur = cur0
    occs = None
    steps = []
    st = states.select(F.col("w").alias("sw"), "j", "bp")
    for _ in range(rounds):
        alive = cur.filter(F.col("cur") > 0)
        step = (
            alive.join(st, (st.sw == alive.w) & (st.j == alive.cur))
            .select(
                "w",
                F.expr("substring(w, bp + 1, cur - bp)").alias("piece"),
                F.col("bp").alias("cur2"),
            )
            .localCheckpoint()
        )
        # NO per-step free mid-walk: ``cur`` is a lazy select over the
        # previous step's checkpoint and ``occs`` references every
        # step's (w, piece) slice — freeing here drops blocks the final
        # materialization still reads (measured:
        # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Instead the WHOLE walk is
        # checkpointed once below and the step frames freed after.
        steps.append(step)
        occ = step.select("w", "piece")
        occs = occ if occs is None else occs.unionByName(occ)
        cur = step.select("w", F.col("cur2").alias("cur"))
    out = occs.localCheckpoint()  # eager — the walk frames are now dead
    free_local_checkpoint(cur0)
    for f in steps:
        free_local_checkpoint(f)
    return out


def _ln_weights(pieces: DataFrame) -> DataFrame:
    """Laplace-smoothed fixed-point ln-prob weights from integer usage
    counts — the single float step (the quality_model discipline)."""
    tot = pieces.agg(
        F.sum("usage").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return pieces.join(F.broadcast(tot), F.lit(True), "left").select(
        "piece",
        "usage",
        "is_single",
        F.round(F.log((F.col("usage") + 1) * 1.0 / (F.col("tot") + F.col("n"))) * UNI_SCALE)
        .cast("bigint")
        .alias("w_fp"),
    )


def uni_train_from_words(wf: DataFrame):
    """Seed + UNI_ROUNDS hard-EM rounds over the ``(w, cnt)`` table.
    Returns ``(model, dp_words, maxlen)``: the final piece model
    ``(piece, usage, w_fp, is_single)``, the length-capped word table,
    and the measured max word length (the data-bounded unroll count —
    a 1-row agg, bounded-by-design driver read)."""
    dp_words = wf.filter(F.length("w") <= UNI_MAX_WORD).localCheckpoint()
    maxlen = dp_words.agg(F.max(F.length("w"))).collect()[0][0] or 0
    subs = (
        dp_words.select(
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
            "w",
        )
        .select(
            "cnt", "i", "w",
            F.explode(F.sequence(F.lit(1), F.lit(UNI_MAX_PIECE))).alias("L"),
        )
        .filter(F.col("i") + F.col("L") - 1 <= F.length("w"))
        .select(F.expr("substring(w, i, L)").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("usage"))
    )
    w_seed = W.partitionBy(F.length("piece") == 1).orderBy(
        F.col("usage").desc(), F.col("piece").asc()
    )
    cand = (
        subs.withColumn("is_single", F.length("piece") == 1)
        .withColumn(
            "rk",
            F.when(F.col("is_single"), 0).otherwise(F.row_number().over(w_seed)),
        )
        .filter(F.col("rk") <= UNI_SEED)
        .select("piece", "usage", "is_single")
    )
    vocab = _ln_weights(cand).localCheckpoint()
    for _ in range(UNI_ROUNDS):
        states = uni_viterbi_forward(
            dp_words.select("w"), vocab.select("piece", "w_fp"), maxlen
        )
        occs = uni_backtrack(states, dp_words.select("w"), maxlen)
        usage = (
            occs.join(dp_words.select("w", "cnt"), "w")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("usage"))
        )
        free_local_checkpoint(states)
        kept = (
            vocab.select("piece", "is_single")
            .join(usage, "piece", "left")
            .select("piece", F.coalesce("usage", F.lit(0)).cast("bigint").alias("usage"), "is_single")
        )
        w_prune = W.partitionBy("is_single").orderBy(
            F.col("usage").desc(), F.col("piece").asc()
        )
        nm = F.sum(F.when(F.col("is_single"), 0).otherwise(1)).over(
            W.partitionBy(F.lit(1))
        )
        pruned = (
            kept.withColumn(
                "rk", F.when(F.col("is_single"), 0).otherwise(F.row_number().over(w_prune))
            )
            .withColumn("nm", nm.cast("bigint"))
            .filter(
                F.col("is_single")
                | (F.col("rk") <= F.expr(f"(nm * {UNI_KEEP_NUM}) DIV {UNI_KEEP_DEN}"))
            )
            .select("piece", "usage", "is_single")
        )
        nxt = _ln_weights(pruned).localCheckpoint()
        free_local_checkpoint(vocab)
        free_local_checkpoint(occs)
        vocab = nxt
    return vocab, dp_words, maxlen


def uni_encode_words(
    wf: DataFrame, model: DataFrame, rounds: int = UNI_MAX_WORD
) -> DataFrame:
    """Viterbi encode of ALL distinct words under the final model:
    ``(w, n_pieces, unk, score_fp)``; over-length words -> one UNK."""
    dp_words = wf.filter(F.length("w") <= UNI_MAX_WORD)
    states = uni_viterbi_forward(
        dp_words.select("w"), model.select("piece", "w_fp"), rounds
    )
    enc = states.filter((F.col("j") == F.length("w")) & (F.col("j") > 0)).select(
        "w",
        F.col("np").cast("bigint").alias("n_pieces"),
        F.lit(0).alias("unk"),
        F.col("best_fp").alias("score_fp"),
    )
    unk = wf.filter(F.length("w") > UNI_MAX_WORD).select(
        "w",
        F.lit(1).cast("bigint").alias("n_pieces"),
        F.lit(1).alias("unk"),
        F.lit(0).cast("bigint").alias("score_fp"),
    )
    out = enc.unionByName(unk).localCheckpoint()  # eager
    free_local_checkpoint(states)
    return out


#: session-keyed trained-tokenizer cache — (model, dp_words, enc); the
#: _BPE_CACHE/_WP_CACHE discipline (eviction drops the reference only).
_UNI_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame, int]] = {}


def _uni_trained(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _UNI_CACHE.get(key)
    if hit is None:
        for k in [k for k in _UNI_CACHE if k != key]:
            _UNI_CACHE.pop(k)
        docs = load_table(spark, sf_dir, "documents")
        wf = _word_freq(docs).localCheckpoint()
        model, dp_words, maxlen = uni_train_from_words(wf)
        enc = uni_encode_words(wf, model, maxlen)
        _UNI_CACHE[key] = (model, wf, enc, maxlen)
        hit = _UNI_CACHE[key]
    return hit


@query(
    "txt_unigram_train",
    oracle=f"""
    WITH {uni_oracle_model_ctes()}
    SELECT piece, usage, w_fp, is_single FROM uni_model
    """,
)
def txt_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the unigram-LM piece model: substring seeding + hard-EM
    Viterbi-count rounds with usage-ranked pruning; weights are
    fixed-point ln-probs."""
    model, _wf, _enc, _ml = _uni_trained(spark, sf_dir)
    return model.select(
        "piece", "usage", "w_fp", F.col("is_single").cast("int").alias("is_single")
    )


@query(
    "txt_unigram_encode",
    oracle=f"""
    WITH {uni_oracle_encode_ctes()},
    dw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
           CAST(sum(unk) AS BIGINT) AS n_unk_occurrences,
           round(sum(n_pieces) * 1.0 / count(*), 6) AS pieces_per_word,
           CAST(sum(score_fp) AS BIGINT) AS sum_score_fp
    FROM dw JOIN uni_enc USING (w)
    GROUP BY doc_id
    """,
)
def txt_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi unigram encoding: per-document piece counts, UNK census,
    and the summed fixed-point segmentation log-prob (the per-doc
    corpus-likelihood contribution a perplexity report aggregates). The
    corpus is touched once by the doc-word join (hot-split posture)."""
    from deisa_ray_spark.functions.text import hot_split_join

    docs = load_table(spark, sf_dir, "documents")
    _model, wf, enc, _ml = _uni_trained(spark, sf_dir)
    dw = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    enc_w = enc.join(wf.select("w", "cnt"), "w")
    return (
        hot_split_join(dw, enc_w, "w", hot_by="cnt", cache_tag="uni_enc", sf_dir=sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.sum("unk").cast("bigint").alias("n_unk_occurrences"),
            F.round(F.sum("n_pieces") / F.count(F.lit(1)), 6).alias("pieces_per_word"),
            F.sum("score_fp").cast("bigint").alias("sum_score_fp"),
        )
    )


@query(
    "txt_unigram_vocab",
    oracle=f"""
    WITH {uni_oracle_encode_ctes()},
    {_bt_ctes("uvb_", "ue_s", "uwords")},
    vocc AS (
      SELECT o.piece, CAST(sum(uw.cnt) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT o.w) AS BIGINT) AS n_words_containing
      FROM uvb_occ o JOIN uwords uw USING (w) GROUP BY o.piece
    )
    SELECT m.piece, CAST(length(m.piece) AS INT) AS piece_len, m.is_single,
           m.w_fp,
           COALESCE(v.n_occurrences, 0) AS n_occurrences,
           COALESCE(v.n_words_containing, 0) AS n_words_containing
    FROM uni_model m LEFT JOIN vocc v USING (piece)
    """,
)
def txt_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final piece vocabulary with its usage census under the FINAL
    model's segmentations (train's ``usage`` column is the last
    pre-prune E-step; this is the artifact a serving tokenizer loads,
    with occurrence counts a data card reports)."""
    from deisa_ray_spark.functions.dedup import _session_cached

    model, wf, _enc, maxlen = _uni_trained(spark, sf_dir)

    def build_census() -> DataFrame:
        dp_words = wf.filter(F.length("w") <= UNI_MAX_WORD)
        states = uni_viterbi_forward(
            dp_words.select("w"), model.select("piece", "w_fp"), maxlen
        )
        occs = uni_backtrack(states, dp_words.select("w"), maxlen)
        vocc = (
            occs.join(dp_words.select("w", "cnt"), "w")
            .groupBy("piece")
            .agg(
                F.sum("cnt").cast("bigint").alias("n_occurrences"),
                F.countDistinct("w").cast("bigint").alias("n_words_containing"),
            )
            .localCheckpoint()  # eager, piece-table-sized
        )
        free_local_checkpoint(states)
        free_local_checkpoint(occs)
        return vocc

    # session-cached: every invocation (driver + oracle mirrors) was
    # re-running the full forward DP + backtrack census
    vocc = _session_cached(spark, "uni_vocc", sf_dir, build_census)
    return model.join(vocc, "piece", "left").select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        F.col("is_single").cast("int").alias("is_single"),
        "w_fp",
        F.coalesce("n_occurrences", F.lit(0)).cast("bigint").alias("n_occurrences"),
        F.coalesce("n_words_containing", F.lit(0)).cast("bigint").alias("n_words_containing"),
    )
