"""WordPiece tokenizer family — the second subword tokenizer next to
BPE (``functions/bpe.py``): ``txt_wordpiece_train`` (likelihood-scored
merge table), ``txt_wordpiece_encode`` (canonical greedy
longest-match-first encoding, per-document piece stats incl. UNK), and
``txt_wordpiece_vocab`` (the induced piece vocabulary artifact).

Semantics (public: Schuster & Nakajima 2012; the BERT tokenizer; the
HuggingFace ``tokenizers`` WordPiece trainer):

- TRAINING is BPE-shaped — merge one adjacent symbol pair per round,
  simultaneously in every word — but the selection criterion is the
  LIKELIHOOD score ``count(pair) / (count(lhs) * count(rhs))`` instead
  of the raw pair count: merge the pair whose fusion most increases the
  corpus unigram likelihood. Symbols use the ``##`` continuation
  convention (word-initial pieces plain, non-initial pieces
  ``##``-prefixed; merging strips the right side's ``##``).
- ENCODING is NOT merge replay: it is greedy longest-match-first over
  the final piece vocabulary — repeatedly take the longest vocab piece
  that prefixes the remaining suffix; if at any point no piece matches
  (or the word exceeds ``WP_MAX_WORD_LEN``), the WHOLE word becomes one
  UNK token (the HF ``max_input_chars_per_word`` / ``unk_token``
  behavior). Training words can still hit UNK: a base character that
  was merged away in every occurrence is absent from the final piece
  set — we deliberately do NOT back-fill the alphabet (HF does), so the
  UNK path is exercised and reported honestly.

Cross-engine determinism: the likelihood score is a ratio — computed in
INTEGER FIXED POINT, ``(pair_count * 10^9) DIV (cnt_lhs * cnt_rhs)``
(the dedup_pagerank discipline): integer floor-division is bit-identical
in Spark and DuckDB, ties broken lexicographically by (lhs, rhs).
BIGINT-safe while pair_count < 9.2e9; beyond that the same expression
runs in DECIMAL(38,0)/HUGEINT. The merge rounds and the longest-match
rounds are both deterministic, so K merge rounds + L_MAX match rounds
UNROLL into plain SQL (MATERIALIZED CTEs — the BPE lesson) and every
query carries a full exact oracle.

Scale: training runs on the DISTINCT-WORD table (sublinear in corpus —
Heaps' law); per merge round one symbol-count agg + one pair agg + a
1-row broadcast argmax. Encoding state is also distinct-word-sized; each
longest-match round explodes ≤ len(rem) PREFIXES and equi-joins them to
the piece vocab (never a theta/contains join — the prefix explode keeps
it an equi-shuffle at any vocab size), consuming ≥1 character per round
so ``WP_MAX_WORD_LEN`` rounds suffice. The corpus itself is touched
once, by the final doc-word ⋈ encode-table join (frequency-partitioned
via ``hot_split_join`` like the BPE/DSIR joins). Trained frames are
session-cached model artifacts (``_WP_CACHE``).

Reference parity: the reference has no tokenizer; this extends the
LLM-pipeline surface (SURVEY.md §6 additions) next to functions/bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.bpe import _word_freq
from deisa_ray_spark.functions.dedup import free_local_checkpoint
from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

WP_MERGES = 8  #: unrolled likelihood-merge rounds
WP_SCORE_SCALE = 10**9  #: fixed-point scale for the likelihood ratio
WP_MAX_WORD_LEN = 12  #: longest-match unroll bound; longer words -> UNK
_SEP = "\x01"  #: symbol sentinel (cannot occur in [a-z#]+ symbols)


# --------------------------------------------------------------------------
# shared oracle CTE chain — training
# --------------------------------------------------------------------------
def wp_oracle_train_ctes(k: int = WP_MERGES, extra_where: str = "") -> str:
    """CTEs ``w0..w{k}`` (word-state per round) and ``wbest1..wbest{k}``
    (the round's likelihood-argmax pair). ``extra_where`` is appended
    to the word-frequency filter (the holdout A/B trains on a lexicon
    slice); the default keeps the chain byte-identical."""
    rounds = []
    for i in range(1, k + 1):
        rounds.append(f"""
    wsym{i} AS MATERIALIZED (
      SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, unnest(string_split(substring(s, 2, length(s)-2),
                                            chr(1)||chr(1))) AS sym
            FROM w{i-1})
      GROUP BY sym
    ),
    wp{i} AS MATERIALIZED (
      SELECT l[j] AS pa, l[j+1] AS pb, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM (SELECT cnt, string_split(substring(s, 2, length(s)-2),
                                     chr(1)||chr(1)) AS l FROM w{i-1}) t,
           unnest(range(1, len(l))) AS u(j)
      GROUP BY 1, 2
    ),
    wbest{i} AS MATERIALIZED (
      SELECT pa, pb, pcnt,
             (pcnt * {WP_SCORE_SCALE}) // (sa.c * sb.c) AS score_fp,
             pa || CASE WHEN pb LIKE '##%' THEN substring(pb, 3)
                        ELSE pb END AS merged
      FROM wp{i} JOIN wsym{i} sa ON sa.sym = wp{i}.pa
                 JOIN wsym{i} sb ON sb.sym = wp{i}.pb
      ORDER BY score_fp DESC, pa, pb LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT w, cnt,
             CASE WHEN EXISTS (SELECT 1 FROM wbest{i})
                  THEN replace(s,
                       (SELECT chr(1)||pa||chr(1)||chr(1)||pb||chr(1)
                        FROM wbest{i}),
                       (SELECT chr(1)||merged||chr(1) FROM wbest{i}))
                  ELSE s END AS s
      FROM w{i-1}
    )""")
    return (
        """w0 AS MATERIALIZED (
      SELECT w, cnt,
             chr(1) || substring(w, 1, 1) || chr(1) ||
             regexp_replace(substring(w, 2), '(.)',
                            chr(1)||'##'||'\\1'||chr(1), 'g') AS s
      FROM (SELECT w, count(*) AS cnt
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                  FROM documents)
            WHERE regexp_matches(w, '^[a-z]+$')"""
        + extra_where
        + """ GROUP BY w)
    ),"""
        + ",".join(rounds)
    )


def wp_oracle_encode_ctes(
    k: int = WP_MERGES,
    lmax: int = WP_MAX_WORD_LEN,
    extra_where: str = "",
    words_cte: str = "(SELECT DISTINCT w FROM w0)",
) -> str:
    """Training chain + ``wpieces`` (final vocab) + longest-match rounds
    ``e0..e{lmax}`` ending in ``wp_enc(w, n_pieces, unk)``.
    ``extra_where`` filters the TRAIN word-frequency; ``words_cte`` is
    the word set to ENCODE (default: the training words) — the holdout
    A/B trains on a lexicon slice and encodes everything (longest-match
    handles unseen words natively: no match -> UNK)."""
    rounds = []
    for i in range(1, lmax + 1):
        rounds.append(f"""
    cand{i} AS (
      SELECT x.w, p.piece
      FROM (SELECT w, rem, substring(rem, 1, j) AS pref
            FROM e{i-1}, unnest(range(1, length(rem) + 1)) AS t(j)
            WHERE rem <> '' AND unk = 0) x
      JOIN wpieces p ON p.piece = x.pref
    ),
    m{i} AS MATERIALIZED (
      SELECT w, arg_max(piece, length(piece)) AS hit
      FROM cand{i} GROUP BY w
    ),
    e{i} AS MATERIALIZED (
      SELECT e.w,
             CASE WHEN e.rem = '' OR e.unk = 1 THEN ''
                  WHEN m.hit IS NULL THEN ''
                  WHEN length(e.rem) = length(m.hit) THEN ''
                  ELSE '##' || substring(e.rem, length(m.hit) + 1) END AS rem,
             CASE WHEN e.rem = '' OR e.unk = 1 THEN e.n_pieces
                  WHEN m.hit IS NULL THEN 1
                  ELSE e.n_pieces + 1 END AS n_pieces,
             CASE WHEN e.rem = '' THEN e.unk
                  WHEN m.hit IS NULL THEN 1
                  ELSE e.unk END AS unk
      FROM e{i-1} e LEFT JOIN m{i} m USING (w)
    )""")
    return (
        wp_oracle_train_ctes(k, extra_where)
        + f""",
    wpieces AS MATERIALIZED (
      SELECT DISTINCT unnest(string_split(substring(s, 2, length(s)-2),
                                          chr(1)||chr(1))) AS piece
      FROM w{k}
    ),
    e0 AS MATERIALIZED (
      SELECT w,
             CASE WHEN length(w) > {lmax} THEN '' ELSE w END AS rem,
             CASE WHEN length(w) > {lmax} THEN 1 ELSE 0 END AS n_pieces,
             CASE WHEN length(w) > {lmax} THEN 1 ELSE 0 END AS unk
      FROM {words_cte}
    ),"""
        + ",".join(rounds)
        + f""",
    wp_enc AS MATERIALIZED (
      SELECT w, CAST(n_pieces AS BIGINT) AS n_pieces, unk FROM e{lmax}
    )"""
    )


# --------------------------------------------------------------------------
# Spark implementation
# --------------------------------------------------------------------------
def _syms(s_col: str = "s"):
    return F.split(F.expr(f"substring({s_col}, 2, length({s_col})-2)"), _SEP + _SEP)


def wp_train_from_words(wf: DataFrame, k: int = WP_MERGES):
    """K likelihood-scored merge rounds over a ``(w, cnt)`` frame.
    Returns ``(merges, vocab_state)``: the merge table ``(round, lhs,
    rhs, merged, pair_count, score_fp)`` and the final ``(w, cnt, s)``
    word-state frame."""
    s0 = F.concat(
        F.lit(_SEP),
        F.expr("substring(w, 1, 1)"),
        F.lit(_SEP),
        F.regexp_replace(F.expr("substring(w, 2)"), "(.)", _SEP + "##$1" + _SEP),
    )
    cur = wf.select("w", "cnt", s0.alias("s")).localCheckpoint()
    # One action per round (same shape as bpe_train_from_words): the
    # 1-row likelihood argmax is collected — identical plan, identical
    # score_fp-desc/pa/pb tie order — and the round's literal replace
    # uses driver-side constants; state checkpoints every few rounds
    # (the between-checkpoint lineage is a linear replace chain).
    merge_rows: list[tuple] = []
    dirty = 0
    for rnd in range(1, k + 1):
        syms = _syms()
        sym_counts = (
            cur.select("cnt", F.explode(syms).alias("sym"))
            .groupBy("sym")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        sz = F.size(syms)
        pairs = (
            cur.select(
                "cnt",
                F.slice(syms, 1, sz - 1).alias("la"),
                F.slice(syms, 2, sz - 1).alias("lb"),
            )
            .select("cnt", F.explode(F.arrays_zip("la", "lb")).alias("p"))
            .select("cnt", F.col("p.la").alias("pa"), F.col("p.lb").alias("pb"))
            .groupBy("pa", "pb")
            .agg(F.sum("cnt").cast("bigint").alias("pcnt"))
        )
        # likelihood argmax in integer fixed point — floor division is
        # bit-identical across engines (no float ratio ever compared)
        scored = (
            pairs.join(sym_counts.select(F.col("sym").alias("pa"), F.col("c").alias("ca")), "pa")
            .join(sym_counts.select(F.col("sym").alias("pb"), F.col("c").alias("cb")), "pb")
            .withColumn("score_fp", F.expr(f"(pcnt * {WP_SCORE_SCALE}) DIV (ca * cb)"))
        )
        best = (
            scored.orderBy(F.col("score_fp").desc(), "pa", "pb")
            .limit(1)
            .collect()  # 1 bounded row — the round's model update
        )
        if not best:
            continue  # pairs exhausted: state unchanged, no merge row
        pa, pb = best[0]["pa"], best[0]["pb"]
        merged = pa + (pb[2:] if pb.startswith("##") else pb)
        merge_rows.append((rnd, pa, pb, merged, best[0]["pcnt"], best[0]["score_fp"]))
        cur = cur.select(
            "w",
            "cnt",
            F.replace(
                F.col("s"),
                F.lit(_SEP + pa + _SEP + _SEP + pb + _SEP),
                F.lit(_SEP + merged + _SEP),
            ).alias("s"),
        )
        dirty += 1
        if dirty >= 4 or rnd == k:
            nxt = cur.localCheckpoint()
            free_local_checkpoint(cur)  # superseded chain — never read again
            cur, dirty = nxt, 0
    merges = wf.sparkSession.createDataFrame(
        merge_rows,
        "round INT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count BIGINT, score_fp BIGINT",
    )
    return merges, cur


def wp_encode_words(
    vocab_state: DataFrame,
    lmax: int = WP_MAX_WORD_LEN,
    words: "DataFrame | None" = None,
) -> DataFrame:
    """Greedy longest-match-first encode of the distinct words against
    the final piece vocabulary: ``(w, n_pieces, unk)``. Each round
    explodes the remaining suffix's prefixes and EQUI-joins them to the
    piece set (theta-free), consumes >= 1 character, and words that ever
    fail to match collapse to one UNK token. ``words`` overrides the
    word set to encode (default: the training words) — the holdout A/B
    encodes unseen words, which UNK out when no piece matches."""
    pieces = (
        vocab_state.select(F.explode(_syms()).alias("piece")).distinct().localCheckpoint()
    )
    over = F.length("w") > lmax
    state = (
        (vocab_state.select("w") if words is None else words.select("w"))
        .distinct()
        .select(
            "w",
            F.when(over, F.lit("")).otherwise(F.col("w")).alias("rem"),
            F.when(over, 1).otherwise(0).cast("bigint").alias("n_pieces"),
            F.when(over, 1).otherwise(0).alias("unk"),
        )
        .localCheckpoint()
    )
    for _ in range(lmax):
        cand = (
            state.filter((F.col("rem") != "") & (F.col("unk") == 0))
            .select(
                "w", "rem",
                F.explode(F.sequence(F.lit(1), F.length("rem"))).alias("j"),
            )
            .select("w", F.expr("substring(rem, 1, j)").alias("piece"))
            .join(pieces, "piece")
        )
        hits = cand.groupBy("w").agg(F.max_by("piece", F.length("piece")).alias("hit"))
        nxt = (
            state.join(hits, "w", "left")
            .select(
                "w",
                F.when((F.col("rem") == "") | (F.col("unk") == 1), F.lit(""))
                .when(F.col("hit").isNull(), F.lit(""))
                .when(F.length("rem") == F.length("hit"), F.lit(""))
                .otherwise(F.concat(F.lit("##"), F.expr("substring(rem, length(hit) + 1)")))
                .alias("rem"),
                F.when((F.col("rem") == "") | (F.col("unk") == 1), F.col("n_pieces"))
                .when(F.col("hit").isNull(), F.lit(1))
                .otherwise(F.col("n_pieces") + 1)
                .cast("bigint")
                .alias("n_pieces"),
                F.when(F.col("rem") == "", F.col("unk"))
                .when(F.col("hit").isNull(), F.lit(1))
                .otherwise(F.col("unk"))
                .alias("unk"),
            )
            .localCheckpoint()
        )
        free_local_checkpoint(state)
        state = nxt
    return state.select("w", "n_pieces", "unk")


#: session-keyed trained-tokenizer cache — (merges, vocab_state, enc);
#: the _BPE_CACHE discipline (eviction drops the reference only; the
#: ContextCleaner reclaims checkpoint blocks after GC).
_WP_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]] = {}


def _wp_trained(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _WP_CACHE.get(key)
    if hit is None:
        for k in [k for k in _WP_CACHE if k != key]:
            _WP_CACHE.pop(k)
        docs = load_table(spark, sf_dir, "documents")
        merges, vocab_state = wp_train_from_words(_word_freq(docs))
        enc = wp_encode_words(vocab_state)
        _WP_CACHE[key] = (merges, vocab_state, enc)
        hit = _WP_CACHE[key]
    return hit


@query(
    "txt_wordpiece_train",
    oracle=f"""
    WITH {wp_oracle_train_ctes()}
    SELECT * FROM ("""
    + " UNION ALL ".join(
        f"SELECT {i} AS round, pa AS lhs, pb AS rhs, merged,"
        f" pcnt AS pair_count, CAST(score_fp AS BIGINT) AS score_fp FROM wbest{i}"
        for i in range(1, WP_MERGES + 1)
    )
    + ")",
)
def txt_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the WordPiece merge table: K rounds of likelihood-argmax
    pair merging (fixed-point score) over the word-frequency table."""
    merges, _state, _enc = _wp_trained(spark, sf_dir)
    return merges


@query(
    "txt_wordpiece_encode",
    oracle=f"""
    WITH {wp_oracle_encode_ctes()},
    dw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
           CAST(sum(unk) AS BIGINT) AS n_unk_occurrences,
           round(sum(n_pieces) * 1.0 / count(*), 6) AS pieces_per_word
    FROM dw JOIN wp_enc USING (w)
    GROUP BY doc_id
    """,
)
def txt_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match WordPiece encoding: per-document piece
    counts + UNK census. The encode table is word-level and cached; the
    corpus is touched once by the doc-word join (hot-split, Zipf
    posture — same as the BPE/DSIR token joins)."""
    from deisa_ray_spark.functions.text import hot_split_join

    docs = load_table(spark, sf_dir, "documents")
    _merges, _state, enc = _wp_trained(spark, sf_dir)
    dw = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    # hot_by n_pieces is meaningless — weight the head by corpus word
    # frequency instead, which the encode table doesn't carry; join the
    # trained state's cnt back on (word-level, cheap)
    enc_w = enc.join(_state.select("w", "cnt"), "w")
    return (
        hot_split_join(dw, enc_w, "w", hot_by="cnt", cache_tag="wp_enc", sf_dir=sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.sum("unk").cast("bigint").alias("n_unk_occurrences"),
            F.round(F.sum("n_pieces") / F.count(F.lit(1)), 6).alias("pieces_per_word"),
        )
    )


@query(
    "txt_wordpiece_vocab",
    oracle=f"""
    WITH {wp_oracle_train_ctes()},
    syms AS (
      SELECT w, cnt,
             unnest(string_split(substring(s, 2, length(s)-2),
                                 chr(1)||chr(1))) AS piece
      FROM w{WP_MERGES}
    )
    SELECT piece,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words_containing,
           CAST(CASE WHEN piece LIKE '##%' THEN 1 ELSE 0 END AS INT)
               AS is_continuation
    FROM syms GROUP BY piece
    """,
)
def txt_wordpiece_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The induced WordPiece vocabulary artifact with the continuation
    flag — the vocab file a serving tokenizer loads."""
    _merges, state, _enc = _wp_trained(spark, sf_dir)
    return (
        state.select("w", "cnt", F.explode(_syms()).alias("piece"))
        .groupBy("piece")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
            F.countDistinct("w").cast("bigint").alias("n_words_containing"),
            F.max(F.when(F.col("piece").startswith("##"), 1).otherwise(0))
            .cast("int")
            .alias("is_continuation"),
        )
    )


# --------------------------------------------------------------------------
# txt_tokenizer_fertility_ab — the tokenizer A/B/C report: BPE vs
# WordPiece vs Unigram-LM fertility per language in ONE table
# (tokens-per-word under each trained tokenizer, WP/Unigram UNK
# exposure, and the piece/token ratios). This is the comparison a
# pipeline runs before committing to a tokenizer: a vocab that
# over-segments an under-represented language shows up as a fertility
# gap here. All three tokenizers come from their session-cached trained
# artifacts; the corpus is touched once by the doc-word explode; each
# encode table rides the same hot-split join posture (and session tag)
# as its own encode query.
# --------------------------------------------------------------------------
def _ab_oracle() -> str:
    from deisa_ray_spark.functions.bpe import BPE_MERGES, bpe_oracle_cte_prefix
    from deisa_ray_spark.functions.unigram import uni_oracle_encode_ctes

    return f"""
    WITH {bpe_oracle_cte_prefix()},
    {wp_oracle_encode_ctes()},
    {uni_oracle_encode_ctes()},
    benc AS (
      SELECT w, len(string_split(substring(s, 2, length(s)-2),
                                 chr(1)||chr(1))) AS n_tok
      FROM r{BPE_MERGES}
    ),
    dw AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
           FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS bpe_tokens,
           round(sum(n_tok) * 1.0 / count(*), 6) AS bpe_fertility,
           CAST(sum(wp_enc.n_pieces) AS BIGINT) AS wp_pieces,
           round(sum(wp_enc.n_pieces) * 1.0 / count(*), 6) AS wp_fertility,
           CAST(sum(wp_enc.unk) AS BIGINT) AS wp_unk_occurrences,
           round(sum(wp_enc.n_pieces) * 1.0 / sum(n_tok), 6) AS wp_over_bpe,
           CAST(sum(u.n_pieces) AS BIGINT) AS uni_pieces,
           round(sum(u.n_pieces) * 1.0 / count(*), 6) AS uni_fertility,
           CAST(sum(u.unk) AS BIGINT) AS uni_unk_occurrences,
           round(sum(u.n_pieces) * 1.0 / sum(n_tok), 6) AS uni_over_bpe
    FROM dw JOIN benc USING (w) JOIN wp_enc USING (w)
            JOIN uni_enc u USING (w)
    GROUP BY lang
    """


@query("txt_tokenizer_fertility_ab", oracle=_ab_oracle())
def txt_tokenizer_fertility_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.functions.bpe import _bpe_trained
    from deisa_ray_spark.functions.bpe import _syms as _bpe_syms
    from deisa_ray_spark.functions.text import hot_split_join
    from deisa_ray_spark.functions.unigram import _uni_trained

    docs = load_table(spark, sf_dir, "documents")
    _bm, bpe_vocab = _bpe_trained(spark, sf_dir)
    benc = bpe_vocab.select("w", "cnt", F.size(_bpe_syms()).alias("n_tok"))
    _wm, wp_state, wp_enc = _wp_trained(spark, sf_dir)
    wenc = wp_enc.join(wp_state.select("w", "cnt"), "w")
    _um, uni_wf, uni_enc, _ml = _uni_trained(spark, sf_dir)
    uenc = uni_enc.select(
        "w",
        F.col("n_pieces").alias("uni_n_pieces"),
        F.col("unk").alias("uni_unk"),
    ).join(uni_wf.select("w", "cnt"), "w")
    dw = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    both = hot_split_join(
        dw, benc, "w", hot_by="cnt", cache_tag="bpe_enc", sf_dir=sf_dir
    ).select("doc_id", "lang", "w", "n_tok")  # drop cnt before the 2nd dim
    both = hot_split_join(
        both, wenc, "w", hot_by="cnt", cache_tag="wp_enc", sf_dir=sf_dir
    ).select("doc_id", "lang", "w", "n_tok", "n_pieces", "unk")
    # distinct tag: this dim renames the encode columns (uni_*), so it
    # must not share txt_unigram_encode's 'uni_enc' cache slot
    both = hot_split_join(
        both, uenc, "w", hot_by="cnt", cache_tag="uni_enc_ab", sf_dir=sf_dir
    )
    return both.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_tok").cast("bigint").alias("bpe_tokens"),
        F.round(F.sum("n_tok") / F.count(F.lit(1)), 6).alias("bpe_fertility"),
        F.sum("n_pieces").cast("bigint").alias("wp_pieces"),
        F.round(F.sum("n_pieces") / F.count(F.lit(1)), 6).alias("wp_fertility"),
        F.sum("unk").cast("bigint").alias("wp_unk_occurrences"),
        F.round(F.sum("n_pieces") / F.sum("n_tok"), 6).alias("wp_over_bpe"),
        F.sum("uni_n_pieces").cast("bigint").alias("uni_pieces"),
        F.round(F.sum("uni_n_pieces") / F.count(F.lit(1)), 6).alias("uni_fertility"),
        F.sum("uni_unk").cast("bigint").alias("uni_unk_occurrences"),
        F.round(F.sum("uni_n_pieces") / F.sum("n_tok"), 6).alias("uni_over_bpe"),
    )


# --------------------------------------------------------------------------
# txt_tokenizer_fertility_holdout — OPEN-VOCABULARY tokenizer A/B: the
# in-lexicon A/B above is honest about what it measures (the unigram
# 1.58 pieces/word headline is lexicon memorization on the synthetic
# fixed vocab), so this query measures what it can NOT: generalization
# to words the tokenizers never saw. A DOC-level split yields zero
# unseen words here (every lexicon word appears in both slices even on
# the Heaps-grown sf1 corpus — measured), so the holdout is a LEXICON
# slice: words whose md5 first hex < HOLDOUT_HEX_LT (~1/4) are withheld
# from ALL THREE trainers; everything is then encoded and reported per
# slice (held=0 in-lexicon vs held=1 unseen).
#
# Encoding unseen words exercises each family's real open-vocab path:
# BPE applies the trained merge table to raw characters (no UNK by
# construction), WordPiece longest-matches against the trained pieces
# and UNKs on any gap, Unigram Viterbi-decodes over the trained piece
# weights and UNKs only when a character was never seen in training
# (unreachable DP) or the word is over-length. The gap between held=0
# and held=1 fertility IS the memorization measurement.
#
# Scale shape: everything runs on the (tiny, lexicon-sized) word-freq
# table; the corpus is touched exactly once by the word-freq explode.
# The trained artifacts are session-cached like the in-lexicon A/B's.
# --------------------------------------------------------------------------
HOLDOUT_HEX_LT = "4"  #: md5(w) first hex < this → held out (~4/16 of lexicon)
_TRAIN_WHERE = f" AND substr(md5(w), 1, 1) >= '{HOLDOUT_HEX_LT}'"


def _holdout_oracle() -> str:
    from deisa_ray_spark.functions.bpe import (
        bpe_oracle_apply_ctes,
        bpe_oracle_cte_prefix,
    )
    from deisa_ray_spark.functions.unigram import (
        UNI_MAX_WORD,
        _fwd_ctes,
        uni_oracle_model_ctes,
    )

    return f"""
    WITH hw AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt,
             CAST(CASE WHEN substr(md5(w), 1, 1) < '{HOLDOUT_HEX_LT}'
                       THEN 1 ELSE 0 END AS INT) AS held
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w
    ),
    {bpe_oracle_cte_prefix(extra_where=_TRAIN_WHERE)},
    {bpe_oracle_apply_ctes("(SELECT w FROM hw)")},
    {wp_oracle_encode_ctes(extra_where=_TRAIN_WHERE,
                           words_cte="(SELECT w FROM hw)")},
    {uni_oracle_model_ctes(extra_where=_TRAIN_WHERE)},
    uhw AS MATERIALIZED (
      SELECT w, cnt FROM hw WHERE length(w) <= {UNI_MAX_WORD}
    ),
    {_fwd_ctes("uh_", "uni_model", "uhw")},
    uh_enc AS MATERIALIZED (
      SELECT s.w, CAST(s.np AS BIGINT) AS n_pieces
      FROM uh_s s WHERE s.j = length(s.w) AND s.j > 0
    )
    SELECT held,
           CAST(count(*) AS BIGINT) AS n_words_distinct,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           round(sum(cnt * n_tok) * 1.0 / sum(cnt), 6) AS bpe_fertility,
           round(sum(cnt * wp_np) * 1.0 / sum(cnt), 6) AS wp_fertility,
           CAST(sum(cnt * wp_unk) AS BIGINT) AS wp_unk_occurrences,
           round(sum(cnt * coalesce(u.n_pieces, 1)) * 1.0 / sum(cnt), 6)
             AS uni_fertility,
           CAST(sum(cnt * (CASE WHEN u.n_pieces IS NULL THEN 1 ELSE 0 END))
                AS BIGINT) AS uni_unk_occurrences
    FROM hw
    LEFT JOIN baenc USING (w)
    LEFT JOIN (SELECT w, n_pieces AS wp_np, unk AS wp_unk FROM wp_enc)
      USING (w)
    LEFT JOIN uh_enc u ON u.w = hw.w
    GROUP BY held
    """


#: session-keyed holdout artifacts shared by the fertility A/B and the
#: byte-fallback report: the held-flagged word-freq frame and the
#: WordPiece state trained on the md5-threshold train slice (both
#: queries train the IDENTICAL model — training it twice was ~1/3 of
#: the pair's wall clock). Drained with the other model caches.
_HOLDOUT_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def _holdout_arts(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _HOLDOUT_CACHE.get(key)
    if hit is None:
        for k in [k for k in _HOLDOUT_CACHE if k != key]:
            _HOLDOUT_CACHE.pop(k)
        from deisa_ray_spark.functions.bpe import _word_freq

        docs = load_table(spark, sf_dir, "documents")
        wf = (
            _word_freq(docs)
            .withColumn(
                "held",
                (F.substring(F.md5("w"), 1, 1) < HOLDOUT_HEX_LT).cast("int"),
            )
            .localCheckpoint()  # read by 3 trainers + the final joins
        )
        hit = {"wf": wf}
        _HOLDOUT_CACHE[key] = hit
    return hit


def _holdout_wp_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train-slice WordPiece state, trained once per session."""
    arts = _holdout_arts(spark, sf_dir)
    if "wp_state" not in arts:
        train_wf = arts["wf"].filter(F.col("held") == 0).select("w", "cnt")
        _wm, wstate = wp_train_from_words(train_wf)
        arts["wp_state"] = wstate
    return arts["wp_state"]


def _tok_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached per-word frame ``(w, cnt, held, n_tok, wp_np,
    wp_unk, uni_np, uni_unk)``: all three tokenizers trained on the
    md5-threshold train slice of the lexicon, every word encoded."""
    from deisa_ray_spark.functions.bpe import (
        bpe_apply_merges,
        bpe_train_from_words,
    )
    from deisa_ray_spark.functions.dedup import _session_cached
    from deisa_ray_spark.functions.unigram import (
        uni_encode_words,
        uni_train_from_words,
    )

    def build() -> DataFrame:
        wf = _holdout_arts(spark, sf_dir)["wf"]
        train_wf = wf.filter(F.col("held") == 0).select("w", "cnt")

        # The three tokenizer families are INDEPENDENT sequential job
        # chains over the (tiny, lexicon-sized) word table — each round
        # is scheduling latency, not compute, so the chains overlap
        # nearly perfectly (guide §2.6: submit independent jobs from a
        # small thread pool). Each thread materializes its family's
        # encode frame eagerly; the final join reads checkpoints only.
        def _bpe() -> DataFrame:
            merges, _vocab = bpe_train_from_words(train_wf)
            return bpe_apply_merges(wf.select("w"), merges).localCheckpoint()

        def _wp() -> DataFrame:
            wstate = _holdout_wp_state(spark, sf_dir)
            return (
                wp_encode_words(wstate, words=wf.select("w"))
                .select(
                    "w",
                    F.col("n_pieces").alias("wp_np"),
                    F.col("unk").alias("wp_unk"),
                )
                .localCheckpoint()
            )

        def _uni() -> DataFrame:
            model, _dpw, _ml = uni_train_from_words(train_wf)
            return (
                uni_encode_words(wf.select("w", "cnt"), model)
                .select(
                    "w",
                    F.col("n_pieces").alias("uni_np"),
                    F.col("unk").alias("uni_unk"),
                )
                .localCheckpoint()
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            fb, fw, fu = pool.submit(_bpe), pool.submit(_wp), pool.submit(_uni)
            benc, wenc, uenc = fb.result(), fw.result(), fu.result()
        return (
            wf.join(benc, "w", "left")
            .join(wenc, "w", "left")
            .join(uenc, "w", "left")
        )

    return _session_cached(spark, "tok_holdout", sf_dir, build, eager=True)


#: the holdout word-frequency CTE shared verbatim by the fertility A/B
#: and the byte-fallback report (one source of truth for the lexicon
#: slice definition)
_HW_CTE = f"""hw AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt,
             CAST(CASE WHEN substr(md5(w), 1, 1) < '{HOLDOUT_HEX_LT}'
                       THEN 1 ELSE 0 END AS INT) AS held
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w
    )"""


@query("txt_tokenizer_fertility_holdout", oracle=_holdout_oracle())
def txt_tokenizer_fertility_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tok_holdout(spark, sf_dir)
    return t.groupBy("held").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words_distinct"),
        F.sum("cnt").cast("bigint").alias("n_occurrences"),
        F.round(F.sum(F.col("cnt") * F.col("n_tok")) / F.sum("cnt"), 6).alias(
            "bpe_fertility"
        ),
        F.round(F.sum(F.col("cnt") * F.col("wp_np")) / F.sum("cnt"), 6).alias(
            "wp_fertility"
        ),
        F.sum(F.col("cnt") * F.col("wp_unk")).cast("bigint").alias(
            "wp_unk_occurrences"
        ),
        F.round(
            F.sum(F.col("cnt") * F.coalesce(F.col("uni_np"), F.lit(1)))
            / F.sum("cnt"),
            6,
        ).alias("uni_fertility"),
        F.sum(F.col("cnt") * F.coalesce(F.col("uni_unk"), F.lit(1)))
        .cast("bigint")
        .alias("uni_unk_occurrences"),
    )


# --------------------------------------------------------------------------
# Byte-fallback WordPiece — the UNK-free open-vocabulary posture. The
# holdout A/B above measured plain WordPiece losing 38% of held-out
# occurrences to UNK (sf1); production tokenizers do not ship that:
# SentencePiece's byte_fallback / the GPT-2 byte alphabet guarantee
# every string encodes. This implements the GAP-LEVEL fallback: greedy
# longest-match runs as before, but where no vocab piece matches the
# remaining suffix, ONE character is emitted as a byte token and
# matching resumes — the word never collapses to UNK, and only the
# un-coverable characters pay the byte price (whole-word byte
# decomposition would pay length(w) for one bad character).
#
# Two declared policies make the encoder total:
# - a gap emits exactly one byte token and consumes one character
#   (lexicon words are ^[a-z]+$, so one character IS one UTF-8 byte;
#   for non-ASCII input the same skip arm would emit octet_length(char)
#   byte tokens — noted, not needed on this corpus);
# - words over the WP_MAX_WORD_LEN match-unroll bound ship as raw bytes
#   outright (n_pieces = n_bytes = length(w)) instead of UNK.
#
# Structural UNK-freedom is REPORTED, not asserted: each round consumes
# >= 1 character (match or byte skip), so after WP_MAX_WORD_LEN rounds
# every word's remainder is empty — `unfinished_occurrences` computes
# that from the final state and must be 0 in every slice.
#
# Scale shape: identical to wp_encode_words — distinct-word-sized state,
# prefix-explode equi-joins (never a contains join), corpus touched once
# by the word-frequency explode.
# --------------------------------------------------------------------------
def wp_oracle_encode_fallback_ctes(
    k: int = WP_MERGES,
    lmax: int = WP_MAX_WORD_LEN,
    extra_where: str = "",
    words_cte: str = "(SELECT DISTINCT w FROM w0)",
) -> str:
    """Training chain + byte-fallback longest-match rounds ``eb0..eb{lmax}``
    ending in ``wpb_enc(w, n_pieces, n_bytes, unfinished)``."""
    rounds = []
    for i in range(1, lmax + 1):
        rounds.append(f"""
    candb{i} AS (
      SELECT x.w, p.piece
      FROM (SELECT w, rem, substring(rem, 1, j) AS pref
            FROM eb{i-1}, unnest(range(1, length(rem) + 1)) AS t(j)
            WHERE rem <> '') x
      JOIN wpieces p ON p.piece = x.pref
    ),
    mb{i} AS MATERIALIZED (
      SELECT w, arg_max(piece, length(piece)) AS hit
      FROM candb{i} GROUP BY w
    ),
    eb{i} AS MATERIALIZED (
      SELECT e.w,
             CASE WHEN e.rem = '' THEN ''
                  WHEN m.hit IS NULL THEN
                       CASE WHEN e.rem LIKE '##%'
                            THEN CASE WHEN length(e.rem) = 3 THEN ''
                                      ELSE '##' || substring(e.rem, 4) END
                            ELSE CASE WHEN length(e.rem) = 1 THEN ''
                                      ELSE '##' || substring(e.rem, 2) END
                       END
                  WHEN length(e.rem) = length(m.hit) THEN ''
                  ELSE '##' || substring(e.rem, length(m.hit) + 1) END AS rem,
             CASE WHEN e.rem = '' THEN e.n_pieces
                  ELSE e.n_pieces + 1 END AS n_pieces,
             CASE WHEN e.rem <> '' AND m.hit IS NULL THEN e.n_bytes + 1
                  ELSE e.n_bytes END AS n_bytes
      FROM eb{i-1} e LEFT JOIN mb{i} m USING (w)
    )""")
    return (
        wp_oracle_train_ctes(k, extra_where)
        + f""",
    wpieces AS MATERIALIZED (
      SELECT DISTINCT unnest(string_split(substring(s, 2, length(s)-2),
                                          chr(1)||chr(1))) AS piece
      FROM w{k}
    ),
    eb0 AS MATERIALIZED (
      SELECT w,
             CASE WHEN length(w) > {lmax} THEN '' ELSE w END AS rem,
             CASE WHEN length(w) > {lmax} THEN length(w) ELSE 0 END AS n_pieces,
             CASE WHEN length(w) > {lmax} THEN length(w) ELSE 0 END AS n_bytes
      FROM {words_cte}
    ),"""
        + ",".join(rounds)
        + f""",
    wpb_enc AS MATERIALIZED (
      SELECT w, CAST(n_pieces AS BIGINT) AS n_pieces,
             CAST(n_bytes AS BIGINT) AS n_bytes,
             CASE WHEN rem <> '' THEN 1 ELSE 0 END AS unfinished
      FROM eb{lmax}
    )"""
    )


def wp_encode_words_bytefallback(
    vocab_state: DataFrame,
    lmax: int = WP_MAX_WORD_LEN,
    words: "DataFrame | None" = None,
) -> DataFrame:
    """Greedy longest-match with gap-level byte fallback:
    ``(w, n_pieces, n_bytes, unfinished)``. Where no piece matches,
    one character ships as a byte token and matching resumes — no UNK
    arm exists. Over-length words ship as raw bytes outright."""
    pieces = (
        vocab_state.select(F.explode(_syms()).alias("piece")).distinct().localCheckpoint()
    )
    over = F.length("w") > lmax
    state = (
        (vocab_state.select("w") if words is None else words.select("w"))
        .distinct()
        .select(
            "w",
            F.when(over, F.lit("")).otherwise(F.col("w")).alias("rem"),
            F.when(over, F.length("w")).otherwise(F.lit(0))
            .cast("bigint").alias("n_pieces"),
            F.when(over, F.length("w")).otherwise(F.lit(0))
            .cast("bigint").alias("n_bytes"),
        )
        .localCheckpoint()
    )
    skip = F.when(
        F.col("rem").startswith("##"),
        F.when(F.length("rem") == 3, F.lit("")).otherwise(
            F.concat(F.lit("##"), F.expr("substring(rem, 4)"))
        ),
    ).otherwise(
        F.when(F.length("rem") == 1, F.lit("")).otherwise(
            F.concat(F.lit("##"), F.expr("substring(rem, 2)"))
        )
    )
    for _ in range(lmax):
        cand = (
            state.filter(F.col("rem") != "")
            .select(
                "w", "rem",
                F.explode(F.sequence(F.lit(1), F.length("rem"))).alias("j"),
            )
            .select("w", F.expr("substring(rem, 1, j)").alias("piece"))
            .join(pieces, "piece")
        )
        hits = cand.groupBy("w").agg(F.max_by("piece", F.length("piece")).alias("hit"))
        nxt = (
            state.join(hits, "w", "left")
            .select(
                "w",
                F.when(F.col("rem") == "", F.lit(""))
                .when(F.col("hit").isNull(), skip)
                .when(F.length("rem") == F.length("hit"), F.lit(""))
                .otherwise(F.concat(F.lit("##"), F.expr("substring(rem, length(hit) + 1)")))
                .alias("rem"),
                F.when(F.col("rem") == "", F.col("n_pieces"))
                .otherwise(F.col("n_pieces") + 1)
                .cast("bigint")
                .alias("n_pieces"),
                F.when((F.col("rem") != "") & F.col("hit").isNull(), F.col("n_bytes") + 1)
                .otherwise(F.col("n_bytes"))
                .cast("bigint")
                .alias("n_bytes"),
            )
            .localCheckpoint()
        )
        free_local_checkpoint(state)
        state = nxt
    return state.select(
        "w", "n_pieces", "n_bytes",
        (F.col("rem") != "").cast("int").alias("unfinished"),
    )


_BYTE_FALLBACK_ORACLE = f"""
    WITH {_HW_CTE},
    {wp_oracle_encode_fallback_ctes(extra_where=_TRAIN_WHERE,
                                    words_cte="(SELECT w FROM hw)")}
    SELECT held,
           CAST(count(*) AS BIGINT) AS n_words_distinct,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           round(sum(cnt * n_pieces) * 1.0 / sum(cnt), 6) AS wpb_fertility,
           CAST(sum(cnt * n_bytes) AS BIGINT) AS byte_occurrences,
           CAST(sum(cnt * unfinished) AS BIGINT) AS unfinished_occurrences
    FROM hw JOIN wpb_enc USING (w)
    GROUP BY held
    """


def _tok_holdout_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached per-word frame ``(w, cnt, held, n_pieces, n_bytes,
    unfinished)``: WordPiece trained on the md5-threshold train slice,
    every lexicon word byte-fallback-encoded."""
    from deisa_ray_spark.functions.dedup import _session_cached

    def build() -> DataFrame:
        # Shares the held-flagged word table AND the trained train-slice
        # WordPiece state with the fertility holdout (the two queries
        # train the identical model; whichever runs first trains it).
        wf = _holdout_arts(spark, sf_dir)["wf"]
        wstate = _holdout_wp_state(spark, sf_dir)
        enc = wp_encode_words_bytefallback(wstate, words=wf.select("w"))
        return wf.join(enc, "w")

    return _session_cached(spark, "tok_holdout_bytes", sf_dir, build, eager=True)


@query("txt_wp_byte_fallback_holdout", oracle=_BYTE_FALLBACK_ORACLE)
def txt_wp_byte_fallback_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-fallback WordPiece on the lexicon holdout: per held slice,
    fertility, how many occurrences paid the byte price, and the
    computed proof that every word finished encoding (no UNK arm
    exists; ``unfinished_occurrences`` must be 0)."""
    t = _tok_holdout_bytes(spark, sf_dir)
    return t.groupBy("held").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words_distinct"),
        F.sum("cnt").cast("bigint").alias("n_occurrences"),
        F.round(F.sum(F.col("cnt") * F.col("n_pieces")) / F.sum("cnt"), 6).alias(
            "wpb_fertility"
        ),
        F.sum(F.col("cnt") * F.col("n_bytes")).cast("bigint").alias(
            "byte_occurrences"
        ),
        F.sum(F.col("cnt") * F.col("unfinished")).cast("bigint").alias(
            "unfinished_occurrences"
        ),
    )
