"""Byte-pair-encoding tokenizer family: ``txt_bpe_train`` (learn the
top-K merge table from corpus pair frequencies), ``txt_bpe_encode``
(apply the merge table, per-document subword token stats), and
``txt_bpe_vocab`` (the induced subword vocabulary artifact). Subword
tokenization is THE pre-training text primitive; these make it a
first-class, oracle-checked operator rather than the whitespace
approximation the rest of the txt_* family uses.

Semantics: Sennrich-style BPE over word frequencies (public "Neural
Machine Translation of Rare Words with Subword Units", 2016). Words are
whitespace tokens restricted to ``^[a-z]+$`` of ``lower(text)`` (keeps
the symbol alphabet clean so the \\x01 symbol separator can never occur
inside a symbol); each word starts as its character sequence plus the
``</w>`` end-of-word marker; each round merges the globally
most-frequent adjacent symbol pair (count-weighted, ties broken by
lexicographically smallest pair) simultaneously in every word, greedy
left-to-right within a word.

Oracle-expressibility: the merge rounds are deterministic, so K
UNROLLED rounds are plain SQL. A word's symbol sequence is encoded as a
single string with every symbol wrapped in \\x01 sentinels
(``\\x01s1\\x01\\x01s2\\x01…``); one merge round is then a LITERAL
``replace(s, ␁a␁␁b␁, ␁ab␁)`` — non-overlapping left-to-right literal
replace has exactly BPE's greedy within-word semantics (a created
symbol is strictly longer than its left part, so it can never re-match
as the left element in the same pass), and the wrapping sentinels make
a match align to whole symbols only. Both engines implement literal
replace identically, so the oracle is exact. The DuckDB CTE chain is
MATERIALIZED: each round references the previous one three times, and
inlining would make the plan exponential in K.

Scale: the corpus is touched exactly twice — one token-count pass
(map-side partial agg) and one final encode join — while all K merge
rounds run on the DISTINCT-WORD table (vocabulary grows sublinearly
with corpus size; Heaps' law). Per round: one pair-explode + keyed agg
over the vocab, one TakeOrdered(1) for the argmax, one broadcast of the
1-row winner. Each round's vocab frame is localCheckpoint-ed (lineage
otherwise triples per round — the cc_labels plan-doubling lesson) and
the superseded round's blocks are freed. The encode join
(corpus tokens ⋈ vocab) is frequency-partitioned (``hot_split_join``:
Zipf head broadcast, near-uniform tail shuffled) — the same skew
posture as the TF-IDF/DSIR token joins, because AQE's skew split
cannot fire on agg-co-partitioned dim sides. The trained (merges,
vocab) frames are cached per (session, sf_dir): a merge table is a
model artifact a pipeline trains once and reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.dedup import free_local_checkpoint
from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

BPE_MERGES = 8  #: unrolled merge rounds (bounded: K ≪ distinct pairs)
_SEP = "\x01"  #: symbol sentinel — impossible inside ^[a-z]+$ symbols
_EOW = "</w>"  #: end-of-word marker symbol (Sennrich convention)
#: \A..\z, not ^..$: Java's $ (Spark rlike) matches before a trailing
#: newline while RE2 (DuckDB) and re.fullmatch do not — a token
#: "word\n" would otherwise enter the Spark-side vocab but not the
#: oracle's. \A/\z mean end-of-TEXT in Java too, pinning the engines
#: to identical acceptance.
WORD_RE = r"\A[a-z]+\z"


# --------------------------------------------------------------------------
# shared oracle CTE chain
# --------------------------------------------------------------------------
def bpe_oracle_cte_prefix(k: int = BPE_MERGES, extra_where: str = "") -> str:
    """CTEs ``r0..r{k}`` (vocab with encoded symbol string per round)
    and ``best1..best{k}`` (the round's winning pair). Caller wraps in
    ``WITH {prefix} SELECT …``. ``extra_where`` is appended to the
    word-frequency filter (the holdout A/B trains on a lexicon slice);
    the default keeps the chain byte-identical to the pre-r10 form."""
    rounds = []
    for i in range(1, k + 1):
        rounds.append(f"""
    p{i} AS MATERIALIZED (
      SELECT l[j] AS pa, l[j+1] AS pb, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM (SELECT cnt, string_split(substring(s, 2, length(s)-2),
                                     chr(1)||chr(1)) AS l FROM r{i-1}) t,
           unnest(range(1, len(l))) AS u(j)
      GROUP BY 1, 2
    ),
    best{i} AS MATERIALIZED (
      SELECT pa, pb, pcnt FROM p{i} ORDER BY pcnt DESC, pa, pb LIMIT 1
    ),
    r{i} AS MATERIALIZED (
      -- CASE, not bare replace: an exhausted-pairs round has an empty
      -- best{i}, whose scalar subqueries are NULL — the vocab must
      -- pass through unchanged, not go NULL
      SELECT w, cnt,
             CASE WHEN EXISTS (SELECT 1 FROM best{i})
                  THEN replace(s,
                       (SELECT chr(1)||pa||chr(1)||chr(1)||pb||chr(1)
                        FROM best{i}),
                       (SELECT chr(1)||pa||pb||chr(1) FROM best{i}))
                  ELSE s END AS s
      FROM r{i-1}
    )""")
    return (
        """r0 AS MATERIALIZED (
      SELECT w, cnt,
             regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'g')
               || chr(1)||'</w>'||chr(1) AS s
      FROM (SELECT w, count(*) AS cnt
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                  FROM documents)
            WHERE regexp_matches(w, '^[a-z]+$')"""
        + extra_where
        + """ GROUP BY w)
    ),"""
        + ",".join(rounds)
    )


def bpe_oracle_apply_ctes(words_cte: str, k: int = BPE_MERGES,
                          tag: str = "ba") -> str:
    """CTEs ``{tag}0..{tag}{k}`` applying an ALREADY-TRAINED merge chain
    (``best1..best{k}`` from :func:`bpe_oracle_cte_prefix`, which must
    precede this fragment in the WITH) to an arbitrary word set
    ``words_cte`` — the open-vocabulary encode: unseen words start as
    characters and receive exactly the merges they contain. Ends in
    ``{tag}enc(w, n_tok)``."""
    parts = [f"""
    {tag}0 AS MATERIALIZED (
      SELECT w,
             regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'g')
               || chr(1)||'</w>'||chr(1) AS s
      FROM {words_cte}
    )"""]
    for i in range(1, k + 1):
        parts.append(f"""
    {tag}{i} AS MATERIALIZED (
      SELECT w,
             CASE WHEN EXISTS (SELECT 1 FROM best{i})
                  THEN replace(s,
                       (SELECT chr(1)||pa||chr(1)||chr(1)||pb||chr(1)
                        FROM best{i}),
                       (SELECT chr(1)||pa||pb||chr(1) FROM best{i}))
                  ELSE s END AS s
      FROM {tag}{i-1}
    )""")
    parts.append(f"""
    {tag}enc AS MATERIALIZED (
      SELECT w, CAST(len(string_split(substring(s, 2, length(s)-2),
                                      chr(1)||chr(1))) AS BIGINT) AS n_tok
      FROM {tag}{k}
    )""")
    return ",".join(parts)


# --------------------------------------------------------------------------
# Spark implementation
# --------------------------------------------------------------------------
def _syms(s_col: str = "s"):
    """Symbol array from the sentinel-wrapped string."""
    return F.split(
        F.expr(f"substring({s_col}, 2, length({s_col})-2)"), _SEP + _SEP
    )


def bpe_train_from_words(wf: DataFrame, k: int = BPE_MERGES):
    """Run K merge rounds over a ``(w, cnt)`` word-frequency frame.
    Returns ``(merges, vocab)``: the K-row merge table
    ``(round, lhs, rhs, merged, pair_count)`` and the final vocab frame
    ``(w, cnt, s)`` with each word's encoded symbol string."""
    s0 = F.concat(
        F.regexp_replace("w", "(.)", _SEP + "$1" + _SEP),
        F.lit(_SEP + _EOW + _SEP),
    )
    cur = wf.select("w", "cnt", s0.alias("s")).localCheckpoint()
    # One Spark action per round: the 1-row argmax is COLLECTED (same
    # plan, same count-desc/pa/pb tie order) and the round's literal
    # replace is applied with driver-side constants — the former 1-row
    # localCheckpoint + broadcast left-join-on-TRUE paid a second
    # action plus a join per round for a single row. An exhausted
    # round collects [] and passes the state through unchanged
    # (mirrors the oracle's CASE WHEN EXISTS). The word state is
    # checkpointed every few rounds (not every round): between
    # checkpoints the lineage is a chain of literal replaces — linear,
    # not the tripling that forced per-round cuts in the join shape.
    merge_rows: list[tuple] = []
    dirty = 0
    for rnd in range(1, k + 1):
        syms = _syms()
        sz = F.size(syms)
        pairs = (
            cur.select(
                "cnt",
                F.slice(syms, 1, sz - 1).alias("la"),
                F.slice(syms, 2, sz - 1).alias("lb"),
            )
            .select("cnt", F.explode(F.arrays_zip("la", "lb")).alias("p"))
            .select(
                "cnt", F.col("p.la").alias("pa"), F.col("p.lb").alias("pb")
            )
        )
        best = (
            pairs.groupBy("pa", "pb")
            .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "pa", "pb")
            .limit(1)
            .collect()  # 1 bounded row — the round's model update
        )
        if not best:
            continue  # pairs exhausted: state unchanged, no merge row
        pa, pb, pcnt = best[0]["pa"], best[0]["pb"], best[0]["pair_count"]
        merge_rows.append((rnd, pa, pb, pa + pb, pcnt))
        cur = cur.select(
            "w",
            "cnt",
            F.replace(
                F.col("s"),
                F.lit(_SEP + pa + _SEP + _SEP + pb + _SEP),
                F.lit(_SEP + pa + pb + _SEP),
            ).alias("s"),
        )
        dirty += 1
        if dirty >= 4 or rnd == k:
            nxt = cur.localCheckpoint()
            free_local_checkpoint(cur)  # superseded chain — never read again
            cur, dirty = nxt, 0
    spark = wf.sparkSession
    merges = spark.createDataFrame(
        merge_rows,
        "round INT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT",
    )
    return merges, cur


def bpe_apply_merges(words: DataFrame, merges: DataFrame) -> DataFrame:
    """Apply a TRAINED merge table to an arbitrary ``words(w)`` frame —
    the open-vocabulary encode twin of :func:`bpe_oracle_apply_ctes`:
    unseen words start as characters and receive exactly the merges
    they contain. Returns ``(w, n_tok)``.

    The merge table is a bounded K-row model artifact (K = BPE_MERGES),
    so collecting it driver-side is the sanctioned model-read; the
    merges become LITERAL replace expressions in ONE projection — a
    single whole-stage-codegen map over the word set, no per-round
    joins or checkpoints."""
    rows = sorted(merges.collect(), key=lambda r: r["round"])
    s = F.concat(
        F.regexp_replace("w", "(.)", _SEP + "$1" + _SEP),
        F.lit(_SEP + _EOW + _SEP),
    )
    for r in rows:
        s = F.replace(
            s,
            F.lit(_SEP + r["lhs"] + _SEP + _SEP + r["rhs"] + _SEP),
            F.lit(_SEP + r["lhs"] + r["rhs"] + _SEP),
        )
    return words.select("w", s.alias("s")).select(
        "w", F.size(_syms()).cast("bigint").alias("n_tok")
    )


def _word_freq(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w").rlike(WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


#: session-keyed trained-tokenizer cache (the dedup _session_cached
#: discipline): a merge table is a MODEL artifact — a real pipeline
#: trains it once and reuses it everywhere, so repeated constructions
#: (train + encode declared queries, the bench's 3 builds per query)
#: reuse one set of checkpointed frames instead of re-running the K
#: training rounds. Eviction only DROPS the cache's reference — earlier
#: callers may still hold the returned frames, and (unlike unpersist on
#: a lineage-recomputable persist) free_local_checkpoint would destroy
#: them irrecoverably; the ContextCleaner reclaims the checkpoint
#: blocks once the last reference is garbage-collected.
_BPE_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _bpe_trained(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _BPE_CACHE.get(key)
    if hit is None:
        for k in [k for k in _BPE_CACHE if k != key]:
            _BPE_CACHE.pop(k)
        docs = load_table(spark, sf_dir, "documents")
        hit = bpe_train_from_words(_word_freq(docs))
        _BPE_CACHE[key] = hit
    return hit


@query(
    "txt_bpe_train",
    oracle=f"""
    WITH {bpe_oracle_cte_prefix()}
    SELECT * FROM ("""
    + " UNION ALL ".join(
        f"SELECT {i} AS round, pa AS lhs, pb AS rhs, pa||pb AS merged,"
        f" pcnt AS pair_count FROM best{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    + ")",
)
def txt_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the BPE merge table: K rounds of count-weighted
    most-frequent-adjacent-pair merging over the word-frequency table."""
    merges, _vocab = _bpe_trained(spark, sf_dir)  # cache owns both frames
    return merges


@query(
    "txt_bpe_encode",
    oracle=f"""
    WITH {bpe_oracle_cte_prefix()},
    enc AS (
      SELECT w, len(string_split(substring(s, 2, length(s)-2),
                                 chr(1)||chr(1))) AS n_tok
      FROM r{BPE_MERGES}
    ),
    dw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
           round(sum(n_tok) * 1.0 / count(*), 6) AS tokens_per_word
    FROM dw JOIN enc USING (w)
    GROUP BY doc_id
    """,
)
def txt_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table: per-document BPE token counts.
    The vocab already carries each word's final symbol string, so
    encoding is one broadcast join corpus-tokens ⋈ vocab — the corpus
    is never re-scanned per merge round."""
    from deisa_ray_spark.functions.text import hot_split_join

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = _bpe_trained(spark, sf_dir)  # cache owns both frames
    # frequency-partitioned join, not a blanket broadcast: the vocab is
    # unbounded at corpus scale — the Zipf head (which carries most
    # token occurrences) broadcasts, the near-uniform tail shuffles
    enc = vocab.select("w", "cnt", F.size(_syms()).alias("n_tok"))
    dw = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    return (
        hot_split_join(dw, enc, "w", hot_by="cnt", cache_tag="bpe_enc", sf_dir=sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
            F.round(F.sum("n_tok") / F.count(F.lit(1)), 6).alias(
                "tokens_per_word"
            ),
        )
    )


@query(
    "txt_bpe_vocab",
    oracle=f"""
    WITH {bpe_oracle_cte_prefix()},
    syms AS (
      SELECT w, cnt,
             unnest(string_split(substring(s, 2, length(s)-2),
                                 chr(1)||chr(1))) AS token
      FROM r{BPE_MERGES}
    )
    SELECT token,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words_containing
    FROM syms GROUP BY token
    """,
)
def txt_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The subword vocabulary the trained tokenizer induces: every
    symbol surviving the K merges, with corpus occurrence counts and
    word coverage — the exported artifact (vocab file) a training
    pipeline consumes, and the input to tokenizer-budget decisions
    (pairs with txt_vocab_coverage's Zipf ladder).

    Scale: runs entirely on the cached trained vocab frame (word-level,
    sublinear in corpus); one explode + one keyed partial agg."""
    _merges, vocab = _bpe_trained(spark, sf_dir)
    return (
        vocab.select("w", "cnt", F.explode(_syms()).alias("token"))
        .groupBy("token")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
            F.countDistinct("w").cast("bigint").alias("n_words_containing"),
        )
    )


@query(
    "txt_bpe_fertility",
    oracle=f"""
    WITH {bpe_oracle_cte_prefix()},
    enc AS (
      SELECT w, len(string_split(substring(s, 2, length(s)-2),
                                 chr(1)||chr(1))) AS n_tok
      FROM r{BPE_MERGES}
    ),
    dw AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
           FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
           round(sum(n_tok) * 1.0 / count(*), 6) AS fertility
    FROM dw JOIN enc USING (w)
    GROUP BY lang
    """,
)
def txt_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per word) BY LANGUAGE — the
    standard multilingual tokenizer-fairness report: a vocab trained on
    a skewed mix over-segments under-represented languages, and this is
    the table that shows it. Same cached trained vocab + hot-split
    encode join as txt_bpe_encode, aggregated on the lang key."""
    from deisa_ray_spark.functions.text import hot_split_join

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = _bpe_trained(spark, sf_dir)
    enc = vocab.select("w", "cnt", F.size(_syms()).alias("n_tok"))
    dw = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    return (
        hot_split_join(dw, enc, "w", hot_by="cnt", cache_tag="bpe_enc", sf_dir=sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
            F.round(F.sum("n_tok") / F.count(F.lit(1)), 6).alias("fertility"),
        )
    )
