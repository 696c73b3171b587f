"""Deduplication operators over ``documents`` / ``embeddings``: exact,
word-n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

North-star extension (SURVEY §7 Phase 5) — the reference has no dedup of
any kind; these are the operators a 100 TB training-data pipeline needs.

Portability contract with the DuckDB oracle: every hash is ``md5`` hex
(identical across engines), and minhash uses *lexicographic min over md5
strings* as the permutation min — so the full MinHash/LSH pipeline is
bit-for-bit reproducible in ANSI SQL and hash-checked end-to-end, not just
rows-only.

Scale notes (100 TB):
- exact dedup: one shuffle on a 32-hex fingerprint (uniform — no skew).
- minhash: signatures are narrow per-row array expressions (no explode);
  only the 4 band keys per doc are exploded → candidate join shuffles
  ~4 rows/doc on uniform md5 band keys. Verification joins only the
  candidate pairs back to shingle sets — the classic LSH cost shape:
  O(n) + O(candidates), never O(n²).
- n-gram jaccard as declared here IS the O(shared-shingle) pairwise path —
  correct as a ground-truth oracle; at scale use dedup_minhash_lsh and
  reserve this for candidate verification.
- simhash: per-row 16-bit signature via one explode over tokens + 16
  partial-agg sums; bucket join on the signature is an equi-shuffle.
- embedding cosine: label-blocked (IVF-style candidate restriction) so the
  join is per-label; at scale replace the label with a learned coarse
  quantizer cell id — the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

N_MINHASH = 12  #: permutations
N_BANDS = 4  #: LSH bands (rows per band = N_MINHASH // N_BANDS = 3)
JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.35
SHINGLE_K = 3  #: words per shingle

#: DuckDB expression for the distinct word-3-gram shingle list.
_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1), "
    "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] "
    "|| ' ' || string_split(text,' ')[i+2]))"
)


def shingles_col(text_col: str = "text") -> Column:
    """Distinct word-3-gram shingles as a JVM array expression.

    Shape matters: the obvious ``transform(sequence(...), i ->
    concat(element_at(toks, i), ...))`` re-evaluates ``toks`` (the whole
    split) inside the lambda for every shingle position — O(tokens²) per
    document (measured 2.5 s vs 0.27 s over sf0.1 documents). The
    slice+zip_with form below evaluates the split a CONSTANT number of
    times per row: k offset slices zipped pairwise, each argument
    evaluated once."""
    toks = F.split(F.col(text_col), " ")
    ln = F.greatest(F.size(toks) - (SHINGLE_K - 1), F.lit(0))
    gram = F.slice(toks, 1, ln)
    for k in range(1, SHINGLE_K):
        gram = F.zip_with(
            gram,
            F.slice(toks, 1 + k, ln),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(gram)


def minhash_signature_df(exploded: DataFrame) -> DataFrame:
    """Signature matrix from exploded shingle rows ``(doc_id, s)`` →
    ``(doc_id, mh0..mh{N-1})`` in ONE partial-agg pass — the canonical
    scale shape (see dedup_minhash_lsh's inline note on why the
    array-expression form loses). Shared by the batch LSH query, fuzzy
    decontamination, and the streaming near-dup gate so the three
    cannot drift."""
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )


def lsh_band_rows(sig: DataFrame) -> DataFrame:
    """Band rows ``(doc_id, band_id, band_key)`` from a signature frame:
    N_BANDS keys of N_MINHASH // N_BANDS hashes each. Shared for the
    same anti-drift reason as :func:`minhash_signature_df`."""
    rows = N_MINHASH // N_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )


def minhash_signature(shingles: Column, n: int = N_MINHASH) -> list[Column]:
    """MinHash permutation i ≔ lexicographic min of ``md5(i || '|' || s)``
    over the shingle set — portable to any engine with md5.

    NOTE: array-expression form, useful for single-signature needs. For
    the full signature matrix use the explode+groupBy-min shape in
    ``dedup_minhash_lsh`` — Catalyst's projection collapse inlines the
    shingle pipeline into each of the n columns here (n× recompute)."""
    return [
        F.array_min(F.transform(shingles, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s))))
        for i in range(n)
    ]


# --------------------------------------------------------------------------
# dedup_exact — hash-groupBy on the md5 of normalized text; canonical doc =
# min(doc_id) in each group. One uniform-key shuffle at any scale.
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
    ),
    canon AS (
      SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM fp GROUP BY fingerprint
    )
    SELECT f.doc_id, f.fingerprint, c.canonical_id, c.group_size,
           f.doc_id <> c.canonical_id AS is_dup
    FROM fp f JOIN canon c USING (fingerprint)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
    w = W.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


#: Session-keyed persisted-DataFrame cache: (tag, applicationId,
#: sf_dir) -> persisted frame. Repeated query constructions (the bench
#: builds each query 3x per run) reuse ONE persisted plan per tag
#: instead of each leaving a new cached entry behind (the r3
#: unbounded-leak finding, fixed here for EVERY persist site — shingle
#: sets, LSH bands, fuzzy-decon bands — not just one). Publishing a new
#: key for a tag evicts the tag's other entries; eviction tolerates
#: entries whose SparkSession has been stopped.
_PERSIST_CACHE: dict[tuple[str, str, str], DataFrame] = {}
#: keys whose persisted frame has been eagerly materialized. Tracked
#: separately so a later eager=True caller hitting a lazily-persisted
#: entry (tags are SHARED across queries — lsh_bands feeds both the LSH
#: and fuzzy-decon queries, in either construction order) still gets
#: its guaranteed single materialization pass instead of re-exposing
#: the cold-cache double-compute race the eager flag exists to prevent.
_EAGER_DONE: set[tuple[str, str, str]] = set()


def _session_cached(
    spark: SparkSession,
    tag: str,
    sf_dir: str,
    build,
    eager: bool = False,
) -> DataFrame:
    key = (tag, spark.sparkContext.applicationId, str(sf_dir))
    df = _PERSIST_CACHE.get(key)
    if df is None:
        for k in [k for k in _PERSIST_CACHE if k[0] == tag and k != key]:
            old = _PERSIST_CACHE.pop(k)
            _EAGER_DONE.discard(k)
            try:
                old.unpersist()
            except Exception:
                pass  # entry from an already-stopped SparkSession
        df = build().persist()
        _PERSIST_CACHE[key] = df
    if eager and key not in _EAGER_DONE:
        df.count()
        _EAGER_DONE.add(key)
    return df


#: per-run staged frames: tag -> the LAST invocation's checkpointed
#: frame. Unlike ``_PERSIST_CACHE`` this is NOT a result cache — every
#: call rebuilds from source; the registry only bounds the leak to one
#: frame per tag (the previous run's blocks are freed when the tag is
#: staged again, and ``drain_session_cache`` drops the rest).
_RUN_STAGED: dict[str, DataFrame] = {}


def run_staged(tag: str, df: DataFrame) -> DataFrame:
    """Eagerly ``localCheckpoint`` ``df`` for THIS run, freeing the
    previous run's frame under the same tag. Use for TINY per-query
    intermediates referenced from several plan branches, where Catalyst
    would otherwise re-execute the whole subtree once per reference
    (guide §2.4 — remove duplicated scans). The caller gets a
    ``LogicalRDD`` scan; the source is re-read on every invocation (no
    cross-run result reuse); at most one superseded frame per tag stays
    resident. The frame must own all its checkpointed blocks (see
    :func:`free_local_checkpoint`)."""
    old = _RUN_STAGED.pop(tag, None)
    if old is not None:
        free_local_checkpoint(old)
    new = df.localCheckpoint(eager=True)
    _RUN_STAGED[tag] = new
    return new


def drain_session_cache() -> int:
    """Unpersist and forget EVERY session-cached frame (all tags, all
    sessions) AND the session model caches (BPE/WordPiece/unigram/
    quality/IVF — vocab-sized localCheckpointed frames whose blocks the
    block manager pins until explicitly unpersisted). Long-lived
    processes that sweep many queries — the full pytest suite runs the
    230-query oracle mirror first and then ~40 more Spark modules in
    the same 4 GB driver — must call this between phases, or the
    accumulated artifacts starve a later hash build (the r12 full-suite
    broadcast OOM; the residual r13 BytesToBytesMap failure). Returns
    the number of entries dropped; tolerates stopped sessions."""
    n = 0
    for k in list(_PERSIST_CACHE):
        old = _PERSIST_CACHE.pop(k)
        _EAGER_DONE.discard(k)
        try:
            old.unpersist()
        except Exception:
            pass  # stopped session
        n += 1
    for k in list(_RUN_STAGED):
        free_local_checkpoint(_RUN_STAGED.pop(k))
        n += 1

    def _free(obj) -> int:
        if hasattr(obj, "unpersist"):
            free_local_checkpoint(obj)  # checkpointed models: free blocks
            try:
                obj.unpersist()
            except Exception:
                pass
            return 1
        if isinstance(obj, tuple):
            return sum(_free(x) for x in obj)
        if isinstance(obj, dict):
            return sum(_free(x) for x in obj.values())
        return 0

    from deisa_ray_spark.functions import bpe, quality_model, unigram, wordpiece
    from deisa_ray_spark.functions import similarity as _sim

    for cache in (
        bpe._BPE_CACHE,
        wordpiece._WP_CACHE,
        wordpiece._HOLDOUT_CACHE,
        unigram._UNI_CACHE,
        quality_model._QCM_CACHE,
        _sim._IVF_CACHE,
    ):
        for k in list(cache):
            n += _free(cache.pop(k))
    _sim._QMAT_CACHE.clear()
    return n


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle table, persisted: both dedup queries reference it from
    multiple join branches (signatures + verify sides), and without
    materialization Catalyst re-evaluates the split→shingle→distinct
    pipeline once per branch (measured 5× recompute = 28 s vs 6 s on 500
    docs). At corpus scale the same move is writing the shingle table
    out once before LSH — standard pipeline staging."""
    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        # One file at test SFs → one input partition; without a
        # repartition the whole shingle/signature pipeline runs on a
        # single core (measured 27 s single-task vs ~4 s spread).
        # Shuffle on doc_id so downstream per-doc aggs co-partition.
        n_parts = max(8, spark.sparkContext.defaultParallelism // 2)
        return (
            docs.repartition(n_parts, "doc_id")
            .select("doc_id", shingles_col().alias("shingles"))
            .withColumn("n_shingles", F.size("shingles"))
        )

    # eager=True: materialize NOW — a lazy persist races its own
    # branches. The session cache means repeated constructions (the
    # bench builds each query 3x per run) REUSE one materialized frame
    # instead of leaking a fresh persisted copy each time.
    return _session_cached(spark, "shingles", sf_dir, build, eager=True)


def shared_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs sharing ≥1 shingle, with exact intersection
    counts: ``(doc_a, doc_b, n_common, na, nb)``, doc_a < doc_b. The ONE
    definition of the exact pairwise ground truth — consumed by
    dedup_ngram_jaccard, the CC edge list (_jaccard_pairs), and the LSH
    recall audit, so their pair semantics cannot drift."""
    sh = _shingle_sets(spark, sf_dir)
    e = sh.select("doc_id", "n_shingles", F.explode("shingles").alias("s"))
    a = e.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"), "s")
    b = e.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"), "s")
    return (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )


def _jaccard_of_pair() -> Column:
    return F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))


# --------------------------------------------------------------------------
# dedup_ngram_jaccard — exact pairwise Jaccard over word-3-gram shingle
# sets, candidate pairs = docs sharing ≥1 shingle. This is the ground-truth
# near-dup operator; the scale path is dedup_minhash_lsh below.
# --------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents),
    e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common,
             any_value(a.n) AS na, any_value(b.n) AS nb
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
    FROM pairs
    WHERE n_common * 1.0 / (na + nb - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shared_shingle_pairs(spark, sf_dir)
    jac = _jaccard_of_pair()
    return pairs.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# dedup_minhash_lsh — MinHash signatures (12 perms) → 4 LSH bands → bucket
# join for candidates → exact-Jaccard verification of candidates only.
# O(n) signature pass + O(candidates) verify; no quadratic stage.
# --------------------------------------------------------------------------
def lsh_oracle_cte_prefix() -> str:
    """The shingle→minhash→band CTE chain (``sh``, ``mh``, ``sig``,
    ``bands``) shared by every LSH-shaped oracle (dedup_minhash_lsh,
    stream_cc_clusters) — ONE definition of the md5 signature/banding
    scheme in SQL, mirroring the shared minhash_signature_df/
    lsh_band_rows builders Spark-side, so the oracles cannot drift."""
    mh = ", ".join(
        f"list_min(list_transform(shingles, s -> md5('{i}|' || s))) AS mh{i}"
        for i in range(N_MINHASH)
    )
    rows = N_MINHASH // N_BANDS
    bands = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(N_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_key FROM sig" for b in range(N_BANDS)
    )
    return f"""sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents),
    mh AS (SELECT doc_id, shingles, {mh} FROM sh),
    sig AS (SELECT *, {bands} FROM mh),
    bands AS ({band_rows})"""


def _lsh_oracle() -> str:
    return f"""
    WITH {lsh_oracle_cte_prefix()},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
             (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard,
           jaccard >= {JACCARD_THRESHOLD} AS is_dup
    FROM verified
    """


@query("dedup_minhash_lsh", oracle=_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_sets(spark, sf_dir)
    # Signatures via explode + 12 min-aggregations in ONE partial-agg pass.
    # (The array-expression form `array_min(transform(shingles, md5(i|s)))`
    # is semantically identical but Catalyst's projection collapse inlines
    # the shingle expression into all 12 columns, recomputing the
    # split+shingle+distinct pipeline 12× per row — measured 60 s vs 4 s
    # on 500 docs. The explode shape is also the standard scale form:
    # map-side combine bounds the shuffle at one row per (doc, i).)
    # The candidate SELF-join would otherwise recompute the full
    # signature pipeline (12 md5 per shingle instance) once per side —
    # the dominant cost. bands is 4 rows/doc of 32-hex keys: tiny.
    # Session-cached (eager) for the same reuse/no-leak reasons as
    # _shingle_sets.
    bands = _session_cached(
        spark,
        "lsh_bands",
        sf_dir,
        lambda: lsh_band_rows(
            minhash_signature_df(
                sh.select("doc_id", F.explode("shingles").alias("s"))
            )
        ),
        eager=True,
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = sh.select("doc_id", "shingles", "n_shingles")
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"), F.col("n_shingles").alias("na")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"), F.col("n_shingles").alias("nb")), "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sa", "sb")))
        .withColumn("jaccard", F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        F.round("jaccard", 6).alias("jaccard"),
        (F.col("jaccard") >= JACCARD_THRESHOLD).alias("is_dup"),
    )


# --------------------------------------------------------------------------
# dedup_simhash — 16-bit weighted SimHash per doc (bit votes from token
# md5s weighted by term frequency); docs sharing a signature are dup
# candidates (bucket join on the signature at scale).
# --------------------------------------------------------------------------
N_SIMHASH_BITS = 16


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (instr('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1) "
        f"& {1 << (j % 4)} > 0 THEN cnt ELSE -cnt END) AS v{j}"
        for j in range(N_SIMHASH_BITS)
    )
    sh = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_SIMHASH_BITS))
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, md5(tok) AS h, count(*) AS cnt FROM tok GROUP BY doc_id, md5(tok)
    ),
    votes AS (SELECT doc_id, {votes} FROM tf GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sh} AS BIGINT) AS simhash FROM votes)
    SELECT doc_id, simhash,
           count(*) OVER (PARTITION BY simhash) AS bucket_size
    FROM sig
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tok.groupBy("doc_id", F.md5("tok").alias("h")).agg(F.count(F.lit(1)).alias("cnt"))

    # bit j of the md5: hex digit j//4 (1-based substr), bit j%4 within it.
    def bit(j: int) -> Column:
        digit = F.expr(f"instr('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1")
        return digit.bitwiseAND(F.lit(1 << (j % 4)))

    votes = tf.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(j) > 0, F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"v{j}")
            for j in range(N_SIMHASH_BITS)
        ]
    )
    simhash = sum(
        [F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(N_SIMHASH_BITS)],
        F.lit(0),
    ).cast("bigint")
    sig = votes.select("doc_id", simhash.alias("simhash"))
    return sig.select(
        "doc_id", "simhash", F.count(F.lit(1)).over(W.partitionBy("simhash")).alias("bucket_size")
    )


# --------------------------------------------------------------------------
# dedup_embedding_cosine — near-dup pairs by embedding cosine within a
# coarse block (label = IVF-cell stand-in). Dot/norm computed JVM-side via
# zip_with + aggregate in index order (bit-compatible with the oracle).
# --------------------------------------------------------------------------
def dot_agg(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, JVM-side, left-assoc."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_agg(a: Column) -> Column:
    """L2 norm of an array<double> column, same FP sequence as dot_agg(a, a)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side.

    For a pairwise (n² rows) hot path DON'T use this at all: route the
    block through the numpy gram-matrix kernel (see
    :func:`dedup_embedding_cosine`) — one ``V @ V.T`` per block in the
    Arrow slot beats n² interpreted lambda chains by ~20x (measured at
    sf1). If the HOF form is unavoidable, at least precompute
    :func:`norm_agg` once per VECTOR before the self-join. (Unrolling the
    lambdas into element_at expression trees was measured SLOWER here, and
    widening each join side to one column per component blows up the
    shuffled row size — don't.)"""
    return dot_agg(a, b) / (norm_agg(a) * norm_agg(b))


# Bounded-block contract: all-pairs comparison is only legal inside a
# block of at most MAX_COSINE_BLOCK rows. Labels whose block exceeds the
# cap are EXCLUDED here (at scale they are routed through the LSH/IVF
# candidate path — sim_rp_lsh_topk / sim_ivf_topk — instead of being
# compared quadratically). This keeps every stage of the declared plan
# sub-quadratic at unbounded label cardinality: per-block work is
# ≤ B² with B fixed, i.e. O(n) blocks × O(1) work.
MAX_COSINE_BLOCK = 10_000

#: gram-matrix row-chunk inside the pairwise numpy kernel — bounds peak
#: extra memory per task at chunk x MAX_COSINE_BLOCK x 8 B (~160 MB).
_COSINE_CHUNK = 2_048


def _np_round_half_away(x, ndigits: int):
    """numpy round-half-away-from-zero (the Spark ``F.round`` / DuckDB
    ``round`` tie rule; ``np.round`` is banker's). Ties at the 6th decimal
    never arise from irrational cosines, but the discipline costs nothing."""
    import numpy as np

    scale = 10.0**ndigits
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH sized AS (
      SELECT label FROM embeddings
      GROUP BY label HAVING count(*) <= {MAX_COSINE_BLOCK}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) + 0
             AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    JOIN sized ON a.label = sized.label
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          >= {COSINE_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-bounded all-pairs cosine via one numpy gram matrix per block.

    The pairwise scoring runs in the Arrow ``applyInPandas`` tensor slot
    (the :mod:`deisa_ray_spark.operators.linalg` precedent): each ≤
    ``MAX_COSINE_BLOCK`` label block becomes ONE ``V @ V.T`` matmul per
    executor task instead of B² interpreted ``zip_with``/``aggregate``
    lambda chains — measured ~20x on the sf1 mirror with values identical
    after the shared round-to-6 discipline (both engines compute the same
    doubles to ~1e-15; the threshold sits far from any attained value at
    every SF). Memory stays bounded: the gram matrix is evaluated in
    row chunks of ``_COSINE_CHUNK`` against the block, so peak extra
    memory is chunk x B x 8 bytes (~160 MB at the 10k cap), not B².
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    # Cap enforcement: one cheap count-shuffle over (label), then a
    # left-semi against the surviving labels. Oversized blocks never
    # reach the pairwise kernel.
    sized = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= MAX_COSINE_BLOCK)
        .select("label")
    )
    emb = emb.join(sized, "label", "left_semi")

    threshold = COSINE_THRESHOLD
    chunk = _COSINE_CHUNK

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        v = np.stack(pdf["e"].to_numpy()).astype(np.float64, copy=False)
        nrm = np.sqrt((v * v).sum(axis=1))
        if not nrm.all():
            # A zero-norm vector has no cosine: the numpy kernel would
            # emit NaN rows that `>= threshold` silently DROPS while the
            # HOF/DuckDB forms rank NaN greater-than-everything — a
            # silent cross-engine divergence. Fail loudly instead
            # (cosine dedup over zero vectors is a data bug upstream).
            bad = ids[nrm == 0.0]
            raise ValueError(
                f"zero-norm embedding(s) in cosine block: vec_id {bad[:5].tolist()}"
            )
        label = pdf["label"].iloc[0]
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            g = v[lo:hi] @ v.T  # (hi-lo, n)
            g /= nrm[lo:hi, None] * nrm[None, :]
            # strict upper triangle relative to the SORTED id order ==
            # the oracle's vec_a < vec_b (ids are distinct)
            ii, jj = np.nonzero(g >= threshold)
            keep = (jj > ii + lo)
            ii, jj = ii[keep], jj[keep]
            out_a.append(ids[ii + lo])
            out_b.append(ids[jj])
            out_c.append(_np_round_half_away(g[ii, jj], 6))
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                "vec_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "label": np.full(sum(len(x) for x in out_a), label, dtype=np.int32),
                "cosine": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
            }
        )

    return emb.groupBy("label").applyInPandas(
        block_pairs, schema="vec_a bigint, vec_b bigint, label int, cosine double"
    )


# --------------------------------------------------------------------------
# dedup_semantic_buckets — the SemDeDup shape (Abbas et al. 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication"): partition the embedding space into coarse cells, then
# mark within-cell near-duplicates by cosine, keeping the lowest id.
# The paper clusters with k-means; the declared query derives the cell
# DETERMINISTICALLY from the vector itself (sign bits of the leading
# dimensions — a random-hyperplane LSH with axis-aligned planes), which
# keeps an exact SQL oracle while exercising the same plan: derive cell →
# equi-shuffle on cell → bounded within-cell pairs. Unlike
# dedup_embedding_cosine (which blocks on a *given* label), this needs no
# labels — the buckets come from the data.
#
# ADAPTIVE REFINEMENT (r5): a fixed 2^8-cell split degenerates at corpus
# scale — with ≥10⁹ vectors every cell exceeds MAX_COSINE_BLOCK and the
# cap would silently exclude ALL of them, so the query would inspect
# nothing. Instead, any cell over the cap extends its key with 8 more
# sign bits (8 → 16 → 24) until every cell is bounded; a vector's
# effective bucket is the SHORTEST prefix whose cell fits under the cap.
# Cells still oversized at SEM_BITS_STAGES[-1] are emitted with
# ``skipped = 1`` (``n_dups = 0``, everything kept) — truncation is
# telemetry, never silent. The refinement is consistent: a longer prefix
# determines its shorter prefixes, so all vectors sharing a depth-d cell
# made identical routing decisions at depths < d.
#
# Scale shape: per-depth cell counts are computed ONLY over the subset
# still oversized at the previous depth, so each count frame is bounded
# by 256 × (number of oversized parent cells) rows — explicitly
# broadcast back. No full-corpus shuffle before the (bounded) within-cell
# pair join; the corpus is scanned once, projected narrow.
# --------------------------------------------------------------------------
SEM_BITS_STAGES = (8, 16, 24)


def _sem_bucket(e: Column, n_bits: int) -> Column:
    """Sign-bit string of the first ``n_bits`` dims (JVM-side).

    Built from a SLICE, not per-index element_at: slice TRUNCATES at the
    array length exactly like the oracle's ``[1:n]``, whereas
    element_at past the end yields NULL → ``otherwise('0')`` padding —
    a silent Spark/oracle bucket divergence the moment a regenerated
    testdata drops the embedding dim below SEM_BITS_STAGES[-1]."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(e, 1, n_bits),
            lambda v: F.when(v >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )


def semantic_bucket_assign(
    cells: DataFrame, cap: int = MAX_COSINE_BLOCK, stages: tuple = SEM_BITS_STAGES
) -> DataFrame:
    """Assign each vector its adaptively-refined bucket.

    ``cells`` must carry ``vec_id``, ``e`` (array<double>) and one
    sign-bit prefix column per stage named ``_b1.._b{len(stages)}``
    (longer prefixes refine shorter ones — ``_b1`` is a prefix of
    ``_b2`` is a prefix of ``_b3``). Returns ``(vec_id, e, bucket,
    depth, skipped)`` where ``bucket`` is the shortest prefix whose cell
    count is ≤ ``cap``, ``depth`` its 1-based stage index, and
    ``skipped = 1`` marks vectors whose deepest cell still exceeds the
    cap (excluded from pairwise inspection, never silently dropped).

    Scan shape: ONE partial-aggregated pass over the corpus builds the
    deepest-cell count table (≤ min(n, 2^bits) rows); every shallower
    depth's count is a prefix window-SUM computed on that small stats
    frame, never by re-scanning the corpus. The per-cell decision
    (bucket, depth, skipped) joins back on the deepest key — AQE turns
    it into a broadcast join whenever the decision table is small (it
    is, until distinct deep cells approach 2^24)."""
    k = len(stages)
    deepest = f"_b{k}"
    stats = cells.groupBy(deepest).agg(F.count(F.lit(1)).alias("_cnt"))
    for d, n_bits in enumerate(stages[:-1]):
        stats = stats.withColumn(
            f"_n{d + 1}",
            F.sum("_cnt").over(W.partitionBy(F.substring(deepest, 1, n_bits))),
        )
    depth = None
    for d in range(1, k):
        cond = F.col(f"_n{d}") <= cap
        depth = F.when(cond, d) if depth is None else depth.when(cond, d)
    depth = (depth.otherwise(k) if depth is not None else F.lit(k)).alias("depth")
    bucket = None
    for d, n_bits in enumerate(stages[:-1]):
        cond = F.col(f"_n{d + 1}") <= cap
        br = F.substring(deepest, 1, n_bits)
        bucket = F.when(cond, br) if bucket is None else bucket.when(cond, br)
    bucket = (
        bucket.otherwise(F.col(deepest)) if bucket is not None else F.col(deepest)
    ).alias("bucket")
    # skipped ⇔ still over the cap at the deepest stage AND no shallower
    # stage fit (the deepest count is _cnt itself).
    over = F.col("_cnt") > cap
    if k > 1:
        over = over & (F.col(f"_n{k - 1}") > cap)
    skipped = F.when(over, 1).otherwise(0).alias("skipped")
    decisions = stats.select(deepest, bucket, depth, skipped)
    return cells.join(decisions, deepest).select(
        "vec_id", "e", "bucket", "depth", "skipped"
    )


def sem_bits_sql(n: int, col: str = "embedding") -> str:
    """DuckDB twin of ``_sem_bucket``: sign-bit string of the first ``n``
    dims (slice-truncating, like the Spark side). Shared by the SemDeDup
    oracle here and the kNN-graph refinement oracle in similarity.py."""
    return (
        f"array_to_string(list_transform(({col}::DOUBLE[])[1:{n}], "
        "v -> CASE WHEN v >= 0 THEN '1' ELSE '0' END), '')"
    )


def _sem_oracle_sql(cap: int = MAX_COSINE_BLOCK, stages: tuple = SEM_BITS_STAGES) -> str:
    """DuckDB twin of the adaptive assignment + within-cell dup count."""

    bits = sem_bits_sql

    base_cols = ", ".join(f"{bits(n)} AS _b{d + 1}" for d, n in enumerate(stages))
    parts = [
        f"WITH r0 AS (SELECT vec_id, embedding::DOUBLE[] AS e, {base_cols} "
        "FROM embeddings)"
    ]
    fits = []
    for d in range(1, len(stages) + 1):
        parts.append(
            f"c{d} AS (SELECT _b{d}, count(*) AS _n FROM r{d - 1} GROUP BY _b{d})"
        )
        parts.append(
            f"fit{d} AS (SELECT vec_id, e, _b{d} AS bucket, {d} AS depth, "
            f"0 AS skipped FROM r{d - 1} JOIN c{d} USING (_b{d}) WHERE _n <= {cap})"
        )
        parts.append(
            f"r{d} AS (SELECT r{d - 1}.* FROM r{d - 1} JOIN c{d} USING (_b{d}) "
            f"WHERE _n > {cap})"
        )
        fits.append(f"SELECT * FROM fit{d}")
    last = len(stages)
    fits.append(
        f"SELECT vec_id, e, _b{last} AS bucket, {last} AS depth, 1 AS skipped "
        f"FROM r{last}"
    )
    parts.append("assigned AS (" + " UNION ALL ".join(fits) + ")")
    parts.append(
        f"""dups AS (
      SELECT DISTINCT b.bucket, b.vec_id
      FROM assigned a JOIN assigned b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE a.skipped = 0
        AND list_cosine_similarity(a.e, b.e) >= {COSINE_THRESHOLD}
    )"""
    )
    return (
        ",\n    ".join(parts)
        + """
    SELECT c.bucket,
           CAST(any_value(c.depth) AS INT) AS depth,
           CAST(any_value(c.skipped) AS INT) AS skipped,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(d.vec_id) AS BIGINT) AS n_dups,
           CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
    FROM assigned c
    LEFT JOIN dups d ON d.bucket = c.bucket AND d.vec_id = c.vec_id
    GROUP BY c.bucket
    """
    )


def _semantic_bucket_report(assigned: DataFrame) -> DataFrame:
    """Within-cell pairs → per-cell report over an assignment frame
    (``vec_id, e, bucket, depth, skipped``). The assignment is
    referenced from three branches (both pair sides + the final
    count) — callers should hand in a persisted/staged frame, the same
    write-the-assignment-once discipline a 100 TB pipeline uses."""
    inspect = assigned.filter(F.col("skipped") == 0)
    a = inspect.select("bucket", F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    b = inspect.select("bucket", F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    dups = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_sim(F.col("ea"), F.col("eb")) >= COSINE_THRESHOLD)
        .select("bucket", F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assigned.join(dups, ["bucket", "vec_id"], "left")
        .groupBy("bucket")
        .agg(
            F.first("depth").cast("int").alias("depth"),
            F.first("skipped").cast("int").alias("skipped"),
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.when(F.col("is_dup") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dups"),
            F.sum(F.when(F.col("is_dup").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@query("dedup_semantic_buckets", oracle=_sem_oracle_sql())
def dedup_semantic_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        cells = emb.select(
            "vec_id",
            "e",
            *[
                _sem_bucket(F.col("e"), n).alias(f"_b{d + 1}")
                for d, n in enumerate(SEM_BITS_STAGES)
            ],
        )
        return semantic_bucket_assign(cells, MAX_COSINE_BLOCK, SEM_BITS_STAGES)

    return _semantic_bucket_report(
        _session_cached(spark, "sem_assign", sf_dir, build)
    )


# --------------------------------------------------------------------------
# dedup_cluster_cc — connected components over the near-dup pair graph:
# group pairwise matches into dedup CLUSTERS (a chain a~b, b~c collapses
# to one cluster even when a~c is below threshold — the semantics every
# keep-one-per-group dedup actually needs).
#
# Spark path: iterative min-label propagation — each round every node
# takes min(own label, neighbors' labels); converges in graph-diameter
# rounds (near-dup components are near-cliques → 2-3 rounds). Each round
# is one equi-shuffle on node id, the same Pregel shape GraphFrames
# uses; at 100 TB the edge list is the (tiny) LSH-candidate output, not
# the corpus, so rounds are cheap and the corpus is never re-scanned.
# Oracle: DuckDB recursive CTE computing min reachable id per node.
# --------------------------------------------------------------------------
MAX_CC_ITERS = 25


def free_local_checkpoint(df: DataFrame) -> None:
    """Release a ``localCheckpoint(eager=True)`` frame's cached blocks.

    The blocks belong to the checkpointed RDDs inside the frame's
    ``LogicalRDD`` LEAVES — NOT to any plan reachable via ``toRdd``
    (the checkpoint call maps a copy). Walking the leaves (rather than
    assuming the root) also frees compositions of checkpointed frames,
    e.g. a unionAll of per-round checkpoints. The frame is UNUSABLE
    afterwards (lineage was truncated; the data is gone) — only call on
    frames that will never be referenced again, and EVERY LogicalRDD
    leaf in the plan must be exclusively owned by the caller: a frame
    composed with a SHARED checkpointed/cached input (e.g. a
    ``_session_cached`` frame joined in before checkpointing) would have
    that shared input's blocks destroyed for all its other consumers.
    Current callers pass pure per-round checkpoints. Best-effort:
    failures (e.g. a stopped session) are swallowed."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass


def cc_labels(pairs: DataFrame) -> DataFrame:
    """Connected components of an undirected pair graph by min-label
    propagation: (id, comp) with comp = min node id reachable from id.

    ``pairs`` must have columns (doc_a, doc_b). Converges in
    graph-diameter rounds, each one equi-shuffle on node id (the Pregel
    shape GraphFrames uses). Returns a ``localCheckpoint``ed frame, so
    the loop's persisted intermediates are already released."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.persist()
    edges.count()  # materialize: referenced every round from two branches

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    # localCheckpoint, NOT persist: each round's frame references the
    # previous one twice (labels ∪ msgs(labels)), so an un-truncated
    # logical plan DOUBLES per round — exponential in graph diameter,
    # OOMing the driver on plan manipulation long before data size
    # matters. Checkpointing materializes AND cuts lineage: the plan
    # stays O(1) across rounds. Superseded rounds' checkpoint blocks
    # are freed explicitly (free_local_checkpoint) — they are otherwise
    # held until JVM GC, accumulating one cached RDD per round.
    labels = labels.localCheckpoint(eager=True)

    for _ in range(MAX_CC_ITERS):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "comp"
        )
        new_labels = (
            labels.unionAll(msgs).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=True)
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "id")
            .filter(F.col("o.comp") != F.col("n.comp"))
            .count()
        )
        free_local_checkpoint(labels)  # superseded — never referenced again
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"CC did not converge in {MAX_CC_ITERS} rounds")

    edges.unpersist()
    return labels


def verified_pairs_ctes(suffix: str = "", doc_filter: str = "") -> str:
    """The verified-pair extraction CTE chain (``sh``, ``e``, ``p``) —
    the ONE SQL definition of "near-dup pair above the Jaccard
    threshold", mirroring :func:`_jaccard_pairs` Spark-side. Every
    oracle that consumes the pair graph (clustering, splits, audits,
    triangles, the funnel) composes THIS fragment so the pair semantics
    cannot drift between oracles.

    ``suffix``/``doc_filter`` parameterize a SECOND chain in the same
    WITH (tombstone propagation needs before/after graphs); defaults
    render the original text unchanged.

    MATERIALIZED on ``e``/``p`` (+ ``edges``/``nodes``/``comps``
    downstream, r10): DuckDB inlines plain CTEs PER REFERENCE — the
    PageRank oracle's unrolled round chain referenced ``edges`` every
    round and re-ran this whole shingle self-join (~30 s at sf1) each
    time, blowing the sf1 mirror's 90 s cap; materialized, the full
    keep_best/pagerank oracles run ~18 s at sf1 (the BPE
    inlining-is-exponential lesson applied to the graph family)."""
    x = suffix
    flt = f" {doc_filter}" if doc_filter else ""
    return f"""sh{x} AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents{flt}),
    e{x} AS MATERIALIZED (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh{x}),
    p{x} AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common,
             any_value(a.n) AS na, any_value(b.n) AS nb
      FROM e{x} a JOIN e{x} b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) * 1.0 / (any_value(a.n) + any_value(b.n) - count(*))
             >= {JACCARD_THRESHOLD}
    )"""


def cc_oracle_ctes(suffix: str = "", doc_filter: str = "") -> str:
    """The verified-pair → recursive-CC CTE chain (``sh``, ``e``, ``p``,
    ``edges``, ``nodes``, ``reach``, ``comps``) shared by every
    clustering-shaped oracle (dedup_cluster_cc, dedup_split_leakage_safe,
    dedup_split_audit) — ONE SQL definition of the pair extraction and
    component computation, mirroring the shared _jaccard_pairs/cc_labels
    builders Spark-side, so the oracles cannot drift. ``suffix``/
    ``doc_filter`` render a renamed second chain (before/after graphs);
    defaults render the original text unchanged."""
    x = suffix
    return f"""{verified_pairs_ctes(suffix, doc_filter)},
    edges{x} AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM p{x}
              UNION SELECT doc_b, doc_a FROM p{x}),
    nodes{x} AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges{x}),
    reach{x}(id, comp) AS (
      SELECT id, id FROM nodes{x}
      UNION
      SELECT e2.dst, r.comp FROM reach{x} r JOIN edges{x} e2 ON e2.src = r.id
    ),
    comps{x} AS MATERIALIZED (SELECT id, min(comp) AS comp FROM reach{x} GROUP BY id)"""


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs ``(doc_a, doc_b)`` by shingle Jaccard ≥
    threshold — the shared edge list for clustering (dedup_cluster_cc)
    and leakage-safe splitting (dedup_split_leakage_safe)."""
    return (
        shared_shingle_pairs(spark, sf_dir)
        .filter(_jaccard_of_pair() >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )


def cc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached materialization of :func:`_jaccard_pairs`: the
    verified edge list feeds eight queries (clustering, splits, audit,
    keep-best, triangles, pagerank, the funnel), each referencing it
    from multiple join branches — one persisted copy per (session,
    sf_dir) instead of
    re-running the shingle self-join per query and per bench build. At
    corpus scale this is writing the verified-pair table out once —
    standard pipeline staging."""
    return _session_cached(
        spark, "cc_pairs", sf_dir, lambda: _jaccard_pairs(spark, sf_dir), eager=True
    )


def cc_comps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached ``(id, comp)`` cluster map over :func:`cc_pairs`.
    :func:`cc_labels` is eager (its propagation loop runs jobs at
    construction), so without the cache every consumer pays the full CC
    loop again."""
    return _session_cached(
        spark, "cc_comps", sf_dir, lambda: cc_labels(cc_pairs(spark, sf_dir)), eager=True
    )


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE {cc_oracle_ctes()}
    SELECT comp AS cluster_id, count(*) AS n_docs FROM comps GROUP BY comp
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cc_comps(spark, sf_dir).groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------------------------------
# dedup_split_leakage_safe — leakage-safe train/val split assignment:
# hash-split by near-dup CLUSTER, not by document, so two near-duplicate
# documents can never land on opposite sides of the split (the classic
# eval-integrity failure: val "generalization" measured against training
# near-copies). Singleton documents are their own cluster. The split key
# is md5 of the cluster id — deterministic across engines, runs, and
# cluster sizes, so re-running the pipeline never migrates a document.
#
# Scale shape: the edge list is the verified near-dup pair output, CC
# over it is diameter-bounded min-label propagation (see cc_labels); the
# corpus-sized work is one left equi-join of docs against the cluster
# map + a hash filter. The join is deliberately NOT forced broadcast:
# on web-scale corpora 30-50% of documents sit in near-dup clusters, so
# the map can be corpus-order — AQE broadcasts when it is actually
# small and sort-merges when it is not.
# --------------------------------------------------------------------------
VAL_HEX_LT = "29"  #: md5 first byte < 0x29 → 41/256 ≈ 16% validation


@query(
    "dedup_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {cc_oracle_ctes()}
    SELECT d.doc_id,
           CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS cluster_id,
           CAST(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS is_clustered,
           CASE WHEN substr(md5(cast(coalesce(c.comp, d.doc_id) AS VARCHAR)),
                            1, 2) < '{VAL_HEX_LT}'
                THEN 'val' ELSE 'train' END AS split
    FROM documents d LEFT JOIN comps c ON c.id = d.doc_id
    """,
)
def dedup_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comps = cc_comps(spark, sf_dir).select(F.col("id").alias("doc_id"), "comp")
    cluster = F.coalesce(F.col("comp"), F.col("doc_id"))
    return docs.join(comps, "doc_id", "left").select(
        "doc_id",
        cluster.cast("bigint").alias("cluster_id"),
        F.when(F.col("comp").isNotNull(), 1).otherwise(0).cast("int").alias(
            "is_clustered"
        ),
        F.when(
            F.substring(F.md5(cluster.cast("string")), 1, 2) < VAL_HEX_LT, "val"
        )
        .otherwise("train")
        .alias("split"),
    )


#: benchmark-slice modulus shared by every decontamination-shaped op
#: (dedup_decontaminate/_fuzzy/_bloom and pipeline_funnel's stage 4) —
#: ONE definition so the composed funnel cannot drift from the operators
BENCH_MOD = 97

# --------------------------------------------------------------------------
# dedup_decontaminate — benchmark decontamination: drop training docs
# sharing ANY word-3-gram shingle with a benchmark set (here: the
# deterministic doc_id % 97 == 0 slice stands in for the held-out
# benchmark). The standard pre-training hygiene op (remove test-set
# leakage before training).
#
# Scale notes (100 TB): the benchmark side is tiny (eval suites are
# KB-MB, the corpus is TB) — its distinct shingles BROADCAST, so marking
# contamination is a broadcast left-semi join: one narrow pass over the
# corpus, zero corpus shuffle. The per-source aggregate is the only
# exchange.
# --------------------------------------------------------------------------
def contaminated_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-benchmark ``doc_id``s sharing ≥1 shingle with the benchmark
    slice (``doc_id % BENCH_MOD == 0``) — the ONE definition of
    exact-overlap contamination, consumed by both dedup_decontaminate
    and pipeline_funnel's decontamination stage so the two cannot
    drift. Benchmark shingles broadcast (the bench slice is a fixed,
    corpus-independent fraction of a bounded eval set at production)."""
    e = _shingle_sets(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench_sh = e.filter(is_bench).select("s").distinct()
    return (
        e.filter(~is_bench)
        .join(F.broadcast(bench_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )


def contamination_ctes() -> str:
    """CTE fragment ``csh/cbench/ccont`` — the exact-overlap benchmark
    contamination rule as SQL, twin of :func:`contaminated_ids`; the
    single fragment behind dedup_decontaminate, stream_decontaminate,
    and report_data_card."""
    return f"""csh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM documents),
    cbench AS (SELECT DISTINCT s FROM csh WHERE doc_id % {BENCH_MOD} = 0),
    ccont AS (SELECT DISTINCT doc_id FROM csh
              WHERE doc_id % {BENCH_MOD} <> 0
                AND s IN (SELECT s FROM cbench))"""


@query(
    "dedup_decontaminate",
    oracle=f"""
    WITH {contamination_ctes()}
    SELECT source,
           count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM ccont))
               AS n_removed,
           count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM ccont))
               AS n_kept
    FROM documents
    WHERE doc_id % {BENCH_MOD} <> 0
    GROUP BY source
    """,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    cont = contaminated_ids(spark, sf_dir).withColumn("is_cont", F.lit(1))
    return (
        docs.filter(~is_bench)
        .join(cont, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("is_cont") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("is_cont").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# dedup_decontaminate_fuzzy — NEAR-duplicate benchmark decontamination:
# where dedup_decontaminate drops docs sharing any exact 3-gram with the
# benchmark, this catches PARAPHRASED leakage via MinHash-LSH — corpus
# docs landing in any benchmark band bucket are candidates, candidates
# are verified by exact Jaccard ≥ threshold. (Benchmark slice here:
# doc_id % 7 == 0, chosen so the synthetic corpus's near-dup pairs cross
# the slice at every SF — a vacuous always-zero contract checks nothing.)
#
# Scale notes (100 TB): the benchmark's band keys are eval-suite-sized →
# BROADCAST; candidate marking is one narrow pass over corpus band keys
# (4 rows/doc); only candidates pay the exact-Jaccard verify, joined
# against the (tiny, broadcast) benchmark shingle sets. Zero corpus
# self-join, zero corpus shuffle beyond the signature partial-agg.
# --------------------------------------------------------------------------
FUZZY_BENCH_MOD = 7


def _fuzzy_decon_oracle() -> str:
    mh = ", ".join(
        f"list_min(list_transform(shingles, s -> md5('{i}|' || s))) AS mh{i}"
        for i in range(N_MINHASH)
    )
    rows = N_MINHASH // N_BANDS
    bands = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(N_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents),
    mh AS (SELECT doc_id, shingles, {mh} FROM sh),
    sig AS (SELECT *, {bands} FROM mh),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT c.doc_id AS corpus_id, b.doc_id AS bench_id
      FROM bands c JOIN bands b
        ON c.band_id = b.band_id AND c.band_key = b.band_key
      WHERE c.doc_id % {FUZZY_BENCH_MOD} <> 0 AND b.doc_id % {FUZZY_BENCH_MOD} = 0
    ),
    cont AS (
      SELECT DISTINCT c.corpus_id AS doc_id
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.corpus_id
      JOIN sh sb ON sb.doc_id = c.bench_id
      WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
            (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles)))
            >= {JACCARD_THRESHOLD}
    )
    SELECT source,
           CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM cont))
                AS BIGINT) AS n_removed,
           CAST(count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM cont))
                AS BIGINT) AS n_kept
    FROM documents
    WHERE doc_id % {FUZZY_BENCH_MOD} <> 0
    GROUP BY source
    """


@query("dedup_decontaminate_fuzzy", oracle=_fuzzy_decon_oracle())
def dedup_decontaminate_fuzzy(
    spark: SparkSession, sf_dir: str, staging_dir: str | None = None
) -> DataFrame:
    """``staging_dir`` (opt-in) stages the band table to parquet and joins
    against the files — the guaranteed-single-signature-pass 100 TB shape
    (no cache race possible, band table survives for reuse/audit). Default
    ``None`` keeps the lazy in-memory persist (free construction for
    plan-analysis callers)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_sets(spark, sf_dir)

    def build_bands() -> DataFrame:
        return lsh_band_rows(
            minhash_signature_df(
                sh.select("doc_id", F.explode("shingles").alias("s"))
            )
        )

    if staging_dir is not None:
        import os as _os

        path = _os.path.join(staging_dir, "fuzzy_decon_bands")
        build_bands().write.mode("overwrite").parquet(path)
        bands = spark.read.parquet(path)
    else:
        # LAZY persist (eager=False): constructing this DataFrame stays
        # free, which plan-analysis callers (bench smoke, gen_plans) and
        # the bench's per-run rebuilds depend on. Accepted trade vs an
        # eager count(): on FIRST execution the bucket join's two sides
        # may race the empty cache and compute the signature pass twice;
        # every later stage and action reads the cache. For the
        # guaranteed single pass, pass ``staging_dir`` (above).
        # Tag "lsh_bands", NOT a private tag: dedup_minhash_lsh builds
        # the IDENTICAL band plan — two tags would persist the same plan
        # twice (a CacheManager "already cached" warning and a wasted
        # entry); one tag means whichever query runs first feeds both.
        bands = _session_cached(spark, "lsh_bands", sf_dir, build_bands)
    is_bench = F.col("doc_id") % FUZZY_BENCH_MOD == 0
    bench_bands = bands.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "band_id", "band_key"
    )
    cand = (
        bands.filter(~is_bench)
        .join(F.broadcast(bench_bands), ["band_id", "band_key"])
        .select(F.col("doc_id").alias("corpus_id"), "bench_id")
        .distinct()
    )
    sets = sh.select("doc_id", "shingles", "n_shingles")
    sa = sets.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sb = sets.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common / (F.col("na") + F.col("nb") - n_common)
    cont = (
        cand.join(sa, "corpus_id")
        .join(F.broadcast(sb), "bench_id")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    return (
        docs.filter(~is_bench)
        .join(cont, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("is_cont") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("is_cont").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# dedup_shared_spans — cross-document VERBATIM span detection: rolling
# word-8-gram fingerprints, reported where the same span occurs in more
# than one document. The span-level third axis of dedup (whole-doc
# similarity = minhash; within-doc repetition = txt_rep_dup3gram):
# verbatim boilerplate/quotation spans shared across documents are what
# span-level training-data dedup removes (public: Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better").
#
# Scale shape: one explode to span fingerprints (narrow), one
# partial-agg shuffle on the 32-hex span hash (uniform), a HAVING on
# the aggregated row — never a pairwise join; output is one row per
# duplicated span, not per occurrence pair.
# --------------------------------------------------------------------------
SPAN_K = 8  #: words per span


def _span_hashes(text_col: str = "text") -> Column:
    """Rolling k-word span md5s as a JVM array expression (same
    constant-evaluation shape as shingles_col — see its docstring)."""
    toks = F.split(F.col(text_col), " ")
    ln = F.greatest(F.size(toks) - (SPAN_K - 1), F.lit(0))
    gram = F.slice(toks, 1, ln)
    for k in range(1, SPAN_K):
        gram = F.zip_with(
            gram,
            F.slice(toks, 1 + k, ln),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.transform(gram, F.md5)


@query(
    "dedup_shared_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    spans AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - {SPAN_K - 2}),
                    i -> md5(array_to_string(w[i:i+{SPAN_K - 1}], ' ')))) AS h
      FROM toks
    )
    SELECT h AS span_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM spans
    GROUP BY h
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select("doc_id", F.explode(_span_hashes()).alias("span_hash"))
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------------------
# dedup_span_extents — MAXIMAL duplicated-substring extents (public:
# Lee et al. 2022 §4, ExactSubstr): chain overlapping/adjacent shared
# 8-gram hits within each document into maximal extents — the unit a
# production span scrub actually removes, and the duplication-LENGTH
# distribution the data card reports (dedup_shared_spans only reports
# per-gram hashes). Two k-gram hits at word offsets p < q belong to the
# same extent iff q - p <= SPAN_K (their word ranges overlap or touch,
# so the union [p, q+K-1] is one contiguous duplicated substring).
#
# Chaining is gaps-and-islands over scalar offsets — ONE lag + ONE
# running-sum window per document, no iterative rounds: extents are
# intervals on a line, so a single ordered pass closes them (contrast
# the graph/CC family, which needs doubling rounds because merges are
# transitive across arbitrary keys).
#
# Scale shape: explode to (doc_id, pos, h) — narrow; one partial-agg
# shuffle on the uniform 32-hex gram hash to find shared grams; one
# hash-join back on the same key; one window shuffle on doc_id (bounded
# per-doc state: hit offsets only, vectors/text never ride). Output is
# one row per extent. min_docs_sharing is the honest per-extent
# guarantee (every gram in the extent occurs in >= that many docs);
# individual grams may be shared with DIFFERENT partner docs, which is
# exactly ExactSubstr's semantics, not whole-extent verbatim sharing.
# --------------------------------------------------------------------------
def _extents_sql() -> str:
    """Shared CTE chain: tokenized docs -> positioned gram hashes ->
    shared grams -> gaps-and-islands extents."""
    return f"""
    xtoks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    xspans AS MATERIALIZED (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             md5(array_to_string(w[u.i:u.i + {SPAN_K - 1}], ' ')) AS h
      FROM xtoks, unnest(range(1, len(w) - {SPAN_K - 2})) u(i)
    ),
    xshared AS MATERIALIZED (
      SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM xspans GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    xhits AS MATERIALIZED (
      SELECT s.doc_id, s.pos, d.n_docs
      FROM xspans s JOIN xshared d USING (h)
    ),
    xisl AS MATERIALIZED (
      SELECT doc_id, pos, n_docs,
             CAST(sum(CASE WHEN prev IS NULL OR pos - prev > {SPAN_K}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS run_id
      FROM (SELECT *, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM xhits)
    ),
    xextents AS MATERIALIZED (
      SELECT doc_id, run_id,
             min(pos) AS start_word,
             max(pos) + {SPAN_K - 1} AS end_word,
             max(pos) + {SPAN_K} - min(pos) AS n_words,
             CAST(count(*) AS BIGINT) AS n_grams,
             min(n_docs) AS min_docs_sharing,
             max(n_docs) AS max_docs_sharing
      FROM xisl GROUP BY doc_id, run_id
    )"""


def build_span_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncached extent construction — the plan tests pin this directly
    (the session-cached frame's explain shows the AQE-materialized cache
    tree, not the logical build)."""
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select(
        "doc_id", F.posexplode(_span_hashes()).alias("pos0", "h")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "h")
    shared = (
        spans.groupBy("h")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    hits = spans.join(shared, "h").select("doc_id", "pos", "n_docs")
    wo = W.partitionBy("doc_id").orderBy("pos")
    isl = (
        hits.withColumn("prev", F.lag("pos").over(wo))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > SPAN_K),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("brk").over(wo))
    )
    return isl.groupBy("doc_id", "run_id").agg(
        F.min("pos").alias("start_word"),
        (F.max("pos") + (SPAN_K - 1)).alias("end_word"),
        (F.max("pos") + SPAN_K - F.min("pos")).alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.min("n_docs").alias("min_docs_sharing"),
        F.max("n_docs").alias("max_docs_sharing"),
    )


def _span_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached extents — shared by the extent query, the
    length-distribution rollup, and the data card."""
    return _session_cached(
        spark, "span_extents", sf_dir,
        lambda: build_span_extents(spark, sf_dir),
    )


@query(
    "dedup_span_extents",
    oracle="WITH "
    + _extents_sql()
    + """
    SELECT doc_id, run_id, start_word, end_word, n_words, n_grams,
           min_docs_sharing, max_docs_sharing
    FROM xextents
    """,
)
def dedup_span_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_extents(spark, sf_dir)


# --------------------------------------------------------------------------
# dedup_extent_length_hist — the data-card rollup over the extents:
# duplicated-substring length distribution in power-of-two-ish word
# buckets (8..15, 16..31, 32..63, 64+), plus how much of the corpus
# each bucket covers. Integer bucket arithmetic (DIV) — identical both
# engines; one k-key agg over the extent frame.
# --------------------------------------------------------------------------
@query(
    "dedup_extent_length_hist",
    oracle="WITH "
    + _extents_sql()
    + """
    SELECT CASE WHEN n_words >= 64 THEN 64
                WHEN n_words >= 32 THEN 32
                WHEN n_words >= 16 THEN 16
                ELSE 8 END AS bucket_start_words,
           CAST(count(*) AS BIGINT) AS n_extents,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_dup_words,
           CAST(max(n_words) AS BIGINT) AS longest_extent_words
    FROM xextents
    GROUP BY 1
    """,
)
def dedup_extent_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ext = _span_extents(spark, sf_dir)
    bucket = (
        F.when(F.col("n_words") >= 64, 64)
        .when(F.col("n_words") >= 32, 32)
        .when(F.col("n_words") >= 16, 16)
        .otherwise(8)
    )
    return ext.groupBy(bucket.alias("bucket_start_words")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_extents"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_dup_words"),
        F.max("n_words").cast("bigint").alias("longest_extent_words"),
    )


# --------------------------------------------------------------------------
# dedup_decontaminate_bloom — benchmark decontamination through a Bloom
# filter instead of a broadcast semi-join: the shape for when the
# benchmark shingle set outgrows a broadcast JOIN table but its BIT-SET
# still fits anywhere (a 10^7-shingle eval suite is ~100 MB as a hash
# table, 2.5 MB as a 20-bits-per-item Bloom). The filter is built
# Spark-first with no private APIs: k=BLOOM_K xxhash64 variants set bits
# in an m=BLOOM_M-bit space packed into m/64 longs
# (groupBy(word).agg(bit_or(mask))), assembled into ONE dense
# array<long> row and broadcast; the probe is a single narrow pass over
# corpus shingles — an unrolled k-way AND of bit tests against the broadcast
# array, no explode, no join per hash. The corpus SHINGLE stream is
# never shuffled; the exchanges downstream of the probe carry one row
# per DOCUMENT (the per-doc flag aggregate, map-side combined from
# shingles to docs before its exchange, and the doc-level join back to
# sources) — |docs| rows, not |shingles|.
#
# Contract (the sketch convention of q27/q42/kmeans-IVF): a Bloom filter
# has NO false negatives — every exactly-contaminated doc must be
# flagged (`bloom_no_false_negatives`) — and at this sizing
# (m = 2^20, k = 5, n ≈ |bench shingles| ≪ m/20) the per-doc
# false-positive probability is < 1e-6, so flagged-but-clean docs stay
# under the 1 % + 1 slack of `bloom_fp_ok` (measured: 0 at every test
# SF). The hash-matched columns are the EXACT per-source removal counts
# (same semantics as dedup_decontaminate); the oracle asserts the two
# Bloom contract booleans TRUE.
# --------------------------------------------------------------------------
BLOOM_M = 1 << 20  #: bits in the filter (2^20 → 16384 packed longs, 128 KiB)
BLOOM_K = 5  #: hash functions
_BLOOM_WORDS = BLOOM_M // 64


def _bloom_bit_positions(s_col):
    """k deterministic bit positions per shingle: xxhash64 seed-variants
    via an extra literal column, mod m."""
    return [
        F.pmod(F.xxhash64(s_col, F.lit(i)), F.lit(BLOOM_M)) for i in range(BLOOM_K)
    ]


def _pow2_masks():
    """array<long> of the 64 single-bit masks — DataFrame shift amounts
    must be Python ints, so dynamic 1<<b is a literal-array lookup
    (bit 63 is the sign bit: its mask is the negative two's-complement
    value)."""
    return F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )


@query(
    "dedup_decontaminate_bloom",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM documents),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    cont AS (SELECT DISTINCT doc_id FROM sh
             WHERE doc_id % {BENCH_MOD} <> 0 AND s IN (SELECT s FROM bench))
    SELECT source,
           count(*) AS n_docs,
           count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM cont))
               AS n_removed,
           TRUE AS bloom_no_false_negatives,
           TRUE AS bloom_fp_ok
    FROM documents
    WHERE doc_id % {BENCH_MOD} <> 0
    GROUP BY source
    """,
)
def dedup_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # The shingle stream is referenced from three branches (Bloom build,
    # probe, exact twin) — read it from the session-persisted shingle
    # table (_shingle_sets) so the split→shingle pipeline runs once,
    # not once per branch (the dedup_minhash_lsh convention).
    sh = _shingle_sets(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench_sh = sh.filter(is_bench).select("s").distinct()

    # -- build: bench shingles → k bit positions → packed longs → one row
    pos = bench_sh.select(
        F.explode(F.array(*_bloom_bit_positions(F.col("s")))).alias("pos")
    )
    words = pos.select(
        F.shiftright("pos", 6).cast("int").alias("word"),
        F.element_at(_pow2_masks(), F.pmod("pos", 64).cast("int") + F.lit(1)).alias(
            "mask"
        ),
    ).groupBy("word").agg(F.bit_or("mask").alias("bits"))
    # Finalize the filter on the driver: the collect is bounded at
    # m/64 = 16384 rows BY THE FILTER SIZE, whatever the corpus or
    # benchmark cardinality — this is "collect the sketch", the same
    # bounded driver hop every mergeable-sketch finalize makes. (The
    # all-DataFrame alternative — map_from_entries + a transform over
    # sequence(0, m/64) — is O(words × set-entries): Catalyst map
    # lookup is a linear scan, measured ~10 s at sf0.1 vs ~0.1 s for
    # this form.) The dense array ships back as ONE data row, so the
    # probe's element_at is an O(1) array index.
    packed = [0] * _BLOOM_WORDS
    for r in words.collect():
        packed[r["word"]] = r["bits"]
    # The 64 single-bit masks ride along as DATA in the same broadcast
    # row: referencing the _pow2_masks() EXPRESSION inside the probe
    # lambda would rebuild the 64-literal CreateArray per bit test
    # (5 × 64 constructions per shingle — the emb_scalar_quantize
    # lesson; measured ~10 s vs ~1 s over sf0.1 shingles). As a column
    # value it is built once and element_at is an O(1) index.
    bit_masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    dense = spark.createDataFrame(
        [(packed, bit_masks)], "bloom array<bigint>, masks array<bigint>"
    )

    # -- probe: one narrow pass over corpus shingles; all-k-bits-set
    # test. k is a compile-time constant, so the test UNROLLS to a plain
    # AND of k bit checks — ordinary expressions inside whole-stage
    # codegen. (The elegant `forall(positions, bit_set)` form evaluates
    # its lambda in the interpreted HOF path: measured 9.7 s vs 1.3 s
    # over sf0.1's shingles for the identical arithmetic.)
    def _bit_set(p):
        word = F.element_at("bloom", F.shiftright(p, 6).cast("int") + F.lit(1))
        mask = F.element_at("masks", F.pmod(p, 64).cast("int") + F.lit(1))
        return word.bitwiseAND(mask) != 0

    hit = F.lit(True)
    for p in _bloom_bit_positions(F.col("s")):
        hit = hit & _bit_set(p)
    probe = (
        sh.filter(~is_bench)
        .crossJoin(F.broadcast(dense))
        .select("doc_id", hit.alias("hit"))
    )
    bloom_doc = probe.groupBy("doc_id").agg(F.max("hit").alias("is_bloom"))

    # -- exact twin (the hash-matched counts + the contract's ground truth)
    exact_doc = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_exact", F.lit(True))
    )

    per_doc = (
        docs.filter(~is_bench)
        .select("doc_id", "source")
        .join(bloom_doc, "doc_id", "left")
        .join(exact_doc, "doc_id", "left")
        .select(
            "source",
            F.coalesce("is_bloom", F.lit(False)).alias("is_bloom"),
            F.coalesce("is_exact", F.lit(False)).alias("is_exact"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("is_exact").cast("int")).cast("long").alias("n_removed"),
        F.min(F.col("is_bloom") | ~F.col("is_exact")).alias(
            "bloom_no_false_negatives"
        ),
        (
            F.sum((F.col("is_bloom") & ~F.col("is_exact")).cast("int"))
            <= F.sum((~F.col("is_exact")).cast("int")) * 0.01 + 1
        ).alias("bloom_fp_ok"),
    )


# --------------------------------------------------------------------------
# dedup_split_audit — the eval-integrity audit as DATA, not just a test:
# count verified near-dup pairs by the (split_a, split_b) combination of
# their endpoints under the leakage-safe assignment. The cross-split
# rows (train,val) MUST be zero by construction — emitting the matrix
# makes that provable to an auditor from the pipeline's own output (and
# immediately flags any future regression in the assignment rule).
#
# Scale shape: the pair list is the (small) verified near-dup output;
# two joins against the assignment on doc id + one tiny agg. Splits are
# ordered (least, greatest) so the pair (train,val) cannot hide as
# (val,train).
# --------------------------------------------------------------------------
@query(
    "dedup_split_audit",
    oracle=f"""
    WITH RECURSIVE {cc_oracle_ctes()},
    assign AS (
      SELECT d.doc_id,
             CASE WHEN substr(md5(cast(coalesce(c.comp, d.doc_id) AS VARCHAR)),
                              1, 2) < '{VAL_HEX_LT}'
                  THEN 'val' ELSE 'train' END AS split
      FROM documents d LEFT JOIN comps c ON c.id = d.doc_id
    )
    SELECT least(sa.split, sb.split) AS split_a,
           greatest(sa.split, sb.split) AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p
    JOIN assign sa ON sa.doc_id = p.doc_a
    JOIN assign sb ON sb.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def dedup_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE materialization of the heavy pair extraction (the session
    # cache) feeds BOTH the cluster computation and the pair-level audit
    # join — the shingle self-join is the dominant cost and must not run
    # per branch.
    pairs = cc_pairs(spark, sf_dir)
    comps = cc_comps(spark, sf_dir).select(F.col("id").alias("doc_id"), "comp")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cluster = F.coalesce(F.col("comp"), F.col("doc_id"))
    split = docs.join(comps, "doc_id", "left").select(
        "doc_id",
        F.when(
            F.substring(F.md5(cluster.cast("string")), 1, 2) < VAL_HEX_LT, "val"
        )
        .otherwise("train")
        .alias("split"),
    )
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# dedup_cluster_stats — the dedup-audit table operators actually read
# before shipping a corpus: near-dup cluster-size distribution
# (singletons included as size-1 clusters), with per-size doc counts
# and corpus fractions. Answers "how much of the corpus is duplicated,
# and is there a mega-cluster?" — the mega-cluster check is the classic
# pre-dedup sanity gate (boilerplate pages collapse millions of docs
# into one component and keep-one-per-cluster would delete them all).
#
# Scale shape: CC runs on the (tiny) verified-pair edge list; the
# corpus-sized work is one left equi-join against the cluster map +
# two keyed partial aggs. Output is bounded by the number of DISTINCT
# cluster sizes (≤ a few hundred at any corpus size).
# --------------------------------------------------------------------------
@query(
    "dedup_cluster_stats",
    oracle=f"""
    WITH RECURSIVE {cc_oracle_ctes()},
    assigned AS (
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comps c ON c.id = d.doc_id
    ),
    sizes AS (SELECT cluster, count(*) AS sz FROM assigned GROUP BY cluster)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           round(sum(sz) * 1.0 / (SELECT count(*) FROM documents), 6)
             AS pct_of_corpus
    FROM sizes GROUP BY sz
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # corpus size as a lazy 1-row aggregate crossed in (the oracle's
    # scalar subquery), not an eager driver-side count() at plan-build
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    comps = cc_comps(spark, sf_dir).select(F.col("id").alias("doc_id"), "comp")
    assigned = docs.join(comps, "doc_id", "left").select(
        F.coalesce("comp", "doc_id").alias("cluster")
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").cast("bigint").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
        )
        .crossJoin(total)
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("pct_of_corpus"),
        )
    )


# --------------------------------------------------------------------------
# dedup_source_overlap — cross-source contamination audit: for every pair
# of sources, how much of their distinct word-3-gram shingle vocabulary is
# shared (Jaccard + containment). This is the table a data-mixing run
# reads BEFORE combining corpora — a high-containment pair means one
# source is largely a re-crawl of the other and its mixture weight is
# double-counting.
#
# Scale shape: shingle explode → ONE distinct-agg shuffle on
# (source, shingle); the self-join keys on the shingle and each shingle
# appears at most |sources| times after the distinct, so the join fan-out
# is bounded by |sources|² per key — never O(docs²). Output is
# |sources|² rows. The distinct projection is materialized once
# (localCheckpoint) because both the per-source census and the pair join
# consume it; at 100 TB the same move is writing it to a staging table,
# exactly as _shingle_sets stages the per-doc shingle lists.
# --------------------------------------------------------------------------
@query(
    "dedup_source_overlap",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents),
    e AS (
      SELECT DISTINCT source, s FROM (
        SELECT d.source, unnest(sh.shingles) AS s
        FROM sh JOIN documents d USING (doc_id))
    ),
    n AS (SELECT source, count(*) AS n_sh FROM e GROUP BY source),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM e a JOIN e b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           CAST(na.n_sh AS BIGINT) AS n_a, CAST(nb.n_sh AS BIGINT) AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 6)
             AS jaccard,
           round(n_common * 1.0 / least(na.n_sh, nb.n_sh), 6)
             AS containment
    FROM common
    JOIN n na ON na.source = common.source_a
    JOIN n nb ON nb.source = common.source_b
    """,
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_sets(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = (
        sh.join(docs, "doc_id")
        .select("source", F.explode("shingles").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    n = e.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    common = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    na = n.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
    nb = n.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6).alias("jaccard"),
            F.round(F.col("n_common") / F.least("n_a", "n_b"), 6).alias("containment"),
        )
    )


# --------------------------------------------------------------------------
# dedup_lsh_recall_audit — LSH tuning audit: bucket every shared-shingle
# pair by its exact Jaccard decile and report what fraction of each decile
# the banded MinHash candidate generation catches. This is the table that
# justifies (or re-tunes) the N_MINHASH/N_BANDS choice before a full-corpus
# run: recall should be ~1 above the threshold decile and fall off below
# it (the LSH S-curve, measured rather than assumed).
#
# Decile assignment is INTEGER-EXACT: (10 * n_common) div (na + nb -
# n_common) over integer counts, so no float boundary can diverge between
# engines. The exact pairwise stage is the audit's ground truth — like
# dedup_ngram_jaccard it is O(shared-shingle pairs) and meant for a
# sampled audit slice at 100 TB, while the candidate side reuses the
# banded O(n) pipeline (shared session-cached signature/band tables, so
# the audit adds one left join over the pair set, not a recompute).
# --------------------------------------------------------------------------
def lsh_audit_ctes() -> str:
    """The banded-LSH recall-audit chain ending in ``marked(bucket,
    caught)`` — one row per true shared-shingle pair with its
    integer-exact Jaccard decile and whether the banded candidate
    generation caught it. Shared by dedup_lsh_recall_audit and the data
    card's retrieval section (single source, the card discipline)."""
    return f"""{lsh_oracle_cte_prefix()},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common,
             any_value(a.n) AS na, any_value(b.n) AS nb
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    marked AS (
      SELECT (10 * t.n_common) // (t.na + t.nb - t.n_common) AS bucket,
             c.doc_a IS NOT NULL AS caught
      FROM truth t
      LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )"""


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded candidate-pair set ``(doc_a, doc_b)``, doc_a < doc_b —
    the ONE Spark definition of "pair the bands propose" (session-cached
    band tables, self-join on (band_id, band_key), distinct), shared by
    the recall and precision audits so they grade the SAME candidate
    set."""
    sh = _shingle_sets(spark, sf_dir)
    bands = _session_cached(
        spark,
        "lsh_bands",
        sf_dir,
        lambda: lsh_band_rows(
            minhash_signature_df(
                sh.select("doc_id", F.explode("shingles").alias("s"))
            )
        ),
        eager=True,
    )
    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_audit_marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`lsh_audit_ctes`'s ``marked``: ``(bucket,
    caught)`` per true pair, session-cached band tables reused."""
    cand = lsh_candidate_pairs(spark, sf_dir).withColumn("caught", F.lit(True))
    truth = shared_shingle_pairs(spark, sf_dir)
    return truth.join(cand, ["doc_a", "doc_b"], "left").select(
        F.expr("10 * n_common div (na + nb - n_common)").alias("bucket"),
        F.coalesce("caught", F.lit(False)).alias("caught"),
    )


@query(
    "dedup_lsh_recall_audit",
    oracle=f"""
    WITH {lsh_audit_ctes()}
    SELECT CAST(bucket AS BIGINT) AS bucket,
           round(bucket / 10.0, 1) AS jaccard_lo,
           CAST(count(*) AS BIGINT) AS n_true_pairs,
           CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
           round(sum(CASE WHEN caught THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS recall
    FROM marked GROUP BY bucket
    """,
)
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    marked = lsh_audit_marked(spark, sf_dir)
    return marked.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.round(F.first("bucket") / 10.0, 1).alias("jaccard_lo"),
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"),
        F.sum(F.when(F.col("caught"), 1).otherwise(0)).cast("bigint").alias("n_caught"),
        F.round(
            F.sum(F.when(F.col("caught"), 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("recall"),
    )


# --------------------------------------------------------------------------
# dedup_keep_best — canonical-document selection: for each near-dup
# cluster keep the HIGHEST-QUALITY member, not the arbitrary min-id one.
# This is the policy real pipelines want from fuzzy dedup (RefinedWeb /
# FineWeb keep the best-scoring capture of a page); min-id is only a
# stand-in when no quality signal exists. Composes the shared verified
# pair graph (_jaccard_pairs) + cc_labels clustering with the shared
# composite quality score (functions/text.quality_col).
#
# Determinism: the argmax compares the ROUNDED quality (round-to-6 is
# what both engines reproduce bit-identically — comparing the raw float
# could rank-flip on a last-ulp difference), ties broken by min doc_id.
#
# Scale notes (100 TB): the cluster table is the (tiny) verified-pair
# component output, not the corpus; quality is computed corpus-side
# map-only and joined on doc_id (equi-join, broadcast-able cluster
# side); the per-cluster argmax is one window over cluster-partitioned
# rows. No pairwise stage beyond the LSH-bounded pair extraction.
# --------------------------------------------------------------------------
from deisa_ray_spark.functions.quality import QUALITY_SQL_CTE  # noqa: E402  (leaf module — text.py imports dedup module-level, so dedup must not import text)


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {cc_oracle_ctes()},
    {QUALITY_SQL_CTE},
    ranked AS (
      SELECT c.comp, c.id, q.quality,
             row_number() OVER (PARTITION BY c.comp
                                ORDER BY q.quality DESC, c.id) AS rn,
             count(*) OVER (PARTITION BY c.comp) AS n_members
      FROM comps c JOIN q ON q.doc_id = c.id
    )
    SELECT CAST(comp AS BIGINT) AS cluster,
           CAST(id AS BIGINT) AS keep_doc,
           quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.functions.quality import quality_col

    comps = cc_comps(spark, sf_dir)  # (id, comp) — clustered docs only
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        F.col("doc_id"), F.round(quality_col(), 6).alias("quality")
    )
    scored = comps.join(q, comps.id == q.doc_id).select("comp", "id", "quality")
    w = W.partitionBy("comp").orderBy(F.desc("quality"), F.asc("id"))
    wc = W.partitionBy("comp")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("comp").cast("bigint").alias("cluster"),
            F.col("id").cast("bigint").alias("keep_doc"),
            "quality",
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )


# --------------------------------------------------------------------------
# dedup_containment — partial-duplication detection by set CONTAINMENT:
# C(A,B) = |A∩B| / min(|A|,|B|) over word-3-gram shingle sets. Jaccard
# misses asymmetric overlap (a short doc quoted verbatim inside a long
# one scores |A|/|B| ≈ 0 Jaccard but 1.0 containment) — containment is
# the standard companion metric (Broder's resemblance vs containment)
# and the signal quote/boilerplate removal needs. `jaccard_missed`
# flags the pairs the Jaccard operator would NOT have caught.
#
# Determinism: containment and jaccard are single IEEE divisions of the
# same integers in both engines (bit-identical), so thresholding and
# rounding agree.
#
# Scale notes (100 TB): ground truth via the shared shingle equi-join
# (shared_shingle_pairs — one shuffle on shingle, partial-agg'd); the
# scale path is LSH over the MIN-side: bucket on minhashes of each
# doc's shingle sample exactly as dedup_minhash_lsh does, then verify
# only candidates — containment verification reuses the same
# (n_common, na, nb) counts, so the banded pipeline carries over
# unchanged. Never all-pairs.
# --------------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.8


@query(
    "dedup_containment",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents),
    e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common,
             any_value(a.n) AS na, any_value(b.n) AS nb
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(n_common / least(na, nb), 6) AS containment,
           round(n_common / (na + nb - n_common), 6) AS jaccard,
           n_common / (na + nb - n_common) < {JACCARD_THRESHOLD} AS jaccard_missed
    FROM p
    WHERE n_common / least(na, nb) >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shared_shingle_pairs(spark, sf_dir)
    containment = F.col("n_common") / F.least("na", "nb")
    return pairs.filter(containment >= CONTAINMENT_THRESHOLD).select(
        "doc_a",
        "doc_b",
        F.col("n_common").cast("bigint").alias("n_common"),
        F.round(containment, 6).alias("containment"),
        F.round(_jaccard_of_pair(), 6).alias("jaccard"),
        (_jaccard_of_pair() < JACCARD_THRESHOLD).alias("jaccard_missed"),
    )


# --------------------------------------------------------------------------
# dedup_graph_triangles — structure audit of the verified near-dup graph:
# per-node degree, triangle count, and local clustering coefficient.
# Near-dup components are expected to be near-CLIQUES (every capture of a
# page resembles every other); a high-degree node with few triangles is
# the classic signature of a TEMPLATE hub (boilerplate gluing unrelated
# docs together) — exactly the pathology that makes naive fuzzy dedup
# delete whole sites. This is the diagnostic pipelines run before
# trusting cluster-level keep-one deletion.
#
# Spark path: the standard sorted-edge triangle join — edges are oriented
# doc_a < doc_b, so each triangle (a<b<c) is counted exactly once by
# joining (a,b)⋈(b,c)⋈(a,c). All equi-joins on node ids; the edge list
# is the (tiny) verified-pair output, never the corpus. All metrics are
# integers (coefficient = integer ratio, one deterministic division).
# --------------------------------------------------------------------------
@query(
    "dedup_graph_triangles",
    oracle=f"""
    WITH {verified_pairs_ctes()},
    tri AS (
      SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
      FROM p ab
      JOIN p bc ON bc.doc_a = ab.doc_b
      JOIN p ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
    ),
    tn AS (
      SELECT node, count(*) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT doc_a AS node FROM p UNION ALL SELECT doc_b FROM p
      ) GROUP BY node
    )
    SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
           round(CASE WHEN d.degree >= 2
                      THEN 2.0 * coalesce(tn.n_triangles, 0)
                           / (d.degree * (d.degree - 1))
                      ELSE 0.0 END, 6) AS clustering_coef
    FROM deg d LEFT JOIN tn USING (node)
    """,
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = cc_pairs(spark, sf_dir)
    ab = p.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    bc = p.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    ac = p.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    tn = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        p.select(F.col("doc_a").alias("node"))
        .unionAll(p.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    d = F.col("degree")
    return deg.join(tn, "node", "left").select(
        "node",
        d.cast("bigint").alias("degree"),
        t.cast("bigint").alias("n_triangles"),
        F.round(
            F.when(d >= 2, 2.0 * t / (d * (d - 1))).otherwise(F.lit(0.0)), 6
        ).alias("clustering_coef"),
    )


# --------------------------------------------------------------------------
# dedup_pagerank — PageRank centrality over the verified near-dup graph,
# with per-cluster hub ranking. The most-central member of a near-dup
# component is the best canonical-capture candidate when no quality
# signal exists (it resembles the most other captures), and a component
# whose PageRank mass concentrates in one low-triangle hub is the
# template-page pathology dedup_graph_triangles flags — PageRank gives
# the same audit a principled score.
#
# Determinism: the classic float formulation is NOT cross-engine
# reproducible — each round sums neighbor contributions in whatever
# order the shuffle delivers, and float addition does not commute in
# the last ulp, compounding over rounds. This implementation runs the
# whole iteration in INTEGER fixed-point (scale 10^12): contributions
# are `pr div deg`, the damping update is `(15*SCALE) div (100*N) +
# (85*sum) div 100` — integer sums are order-independent and integer
# division is exact in both engines, so a fixed K=10 rounds yields
# BIT-IDENTICAL ranks everywhere (same trick as the md5-keyed samplers:
# move the nondeterminism out of the arithmetic, not under a round()).
#
# Scale shape: the graph is the (tiny) verified-pair output, never the
# corpus. Each round is one equi-join (pr ⋈ edges) + one keyed partial
# agg — the Pregel shape, diameter-independent fixed cost, K jobs total.
# Per-round localCheckpoint keeps the plan O(1) (the cc_labels lesson);
# the 1-row node-count frame rides a broadcast cross (sanctioned 1-row
# totals pattern). Oracle: K unrolled MATERIALIZED CTEs (inlining a
# round chain re-evaluates it exponentially — the BPE lesson).
# --------------------------------------------------------------------------
PAGERANK_SCALE = 10**12
PAGERANK_ROUNDS = 10


def _pagerank_oracle() -> str:
    rounds = []
    for i in range(1, PAGERANK_ROUNDS + 1):
        rounds.append(f"""pr{i} AS MATERIALIZED (
      SELECT d.id, (15 * {PAGERANK_SCALE}) // (100 * (SELECT n FROM nt))
             + (85 * coalesce(i{i}.s, 0)) // 100 AS pr
      FROM deg d LEFT JOIN (
        SELECT e2.dst AS id, sum(p.pr // d2.deg) AS s
        FROM pr{i - 1} p JOIN deg d2 ON d2.id = p.id
        JOIN edges e2 ON e2.src = p.id
        GROUP BY e2.dst) i{i} ON i{i}.id = d.id
    )""")
    chain = ",\n    ".join(rounds)
    return f"""
    WITH RECURSIVE {cc_oracle_ctes()},
    deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
    nt AS (SELECT count(*) AS n FROM nodes),
    pr0 AS MATERIALIZED (
      SELECT id, {PAGERANK_SCALE} // (SELECT n FROM nt) AS pr FROM nodes
    ),
    {chain}
    SELECT p.id AS node,
           CAST(c.comp AS BIGINT) AS comp,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(p.pr AS BIGINT) AS pr_fixed,
           round(CAST(p.pr AS DOUBLE) / {PAGERANK_SCALE}, 6) AS pagerank,
           CAST(row_number() OVER (PARTITION BY c.comp
                                   ORDER BY p.pr DESC, p.id) AS INT) AS hub_rank
    FROM pr{PAGERANK_ROUNDS} p
    JOIN deg d ON d.id = p.id
    JOIN comps c ON c.id = p.id
    """


def pagerank_fixed_point(pairs: DataFrame, rounds: int = PAGERANK_ROUNDS) -> DataFrame:
    """Run the integer fixed-point PageRank iteration over an undirected
    ``(doc_a, doc_b)`` pair frame; returns ``(id, deg, pr)``. Pure
    function of the edge list — fuzzed against a pure-Python twin in
    tests/test_pagerank.py."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ntot = deg.agg(F.count(F.lit(1)).alias("n"))
    # (id, deg, n) — the static per-node frame every round reads; one
    # materialization, lineage-truncated so round plans stay flat
    static = deg.join(F.broadcast(ntot), F.lit(True)).localCheckpoint(eager=True)

    pr = static.select(
        "id", F.expr(f"{PAGERANK_SCALE} div n").alias("pr")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        contrib = pr.join(static, "id").select(
            "id", F.expr("pr div deg").alias("c")
        )
        inc = (
            contrib.join(edges, contrib.id == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("s"))
        )
        nxt = (
            static.join(inc, "id", "left")
            .select(
                "id",
                (
                    F.expr(f"(15 * {PAGERANK_SCALE}) div (100 * n)")
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(pr)  # superseded round — never read again
        pr = nxt
    return pr.join(static, "id").select("id", "deg", "pr")


def _pagerank_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached ``(id, deg, pr)`` fixed-point PageRank scores over
    the verified near-dup graph. The scores are a MODEL artifact (a
    pipeline computes them once and reads them everywhere — the BPE
    merge-table discipline), so repeated constructions (the bench's 3
    builds per query) reuse one materialized frame instead of re-running
    the K eager iteration rounds.

    Eviction note (the _BPE_CACHE caveat applies): the cached frame
    embeds the final-round and static localCheckpoint RDDs; eviction by
    a new (session, sf_dir) key only unpersists the OUTER cache and
    drops the reference — earlier callers may still hold the frame, so
    the checkpoint blocks are deliberately left for the ContextCleaner
    to reclaim once the last reference is garbage-collected (an eager
    free here would destroy them irrecoverably under a live reader)."""
    return _session_cached(
        spark,
        "pagerank",
        sf_dir,
        lambda: pagerank_fixed_point(cc_pairs(spark, sf_dir)),
        eager=True,
    )


@query("dedup_pagerank", oracle=_pagerank_oracle())
def dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = cc_comps(spark, sf_dir)
    w = W.partitionBy("comp").orderBy(F.desc("pr"), F.asc("id"))
    return (
        _pagerank_scores(spark, sf_dir)
        .join(comps, "id")
        .withColumn("hub_rank", F.row_number().over(w))
        .select(
            F.col("id").alias("node"),
            F.col("comp").cast("bigint").alias("comp"),
            F.col("deg").cast("bigint").alias("degree"),
            F.col("pr").cast("bigint").alias("pr_fixed"),
            F.round(F.col("pr").cast("double") / PAGERANK_SCALE, 6).alias("pagerank"),
            F.col("hub_rank").cast("int").alias("hub_rank"),
        )
    )


# --------------------------------------------------------------------------
# dedup_decontaminate_semantic — EMBEDDING-space benchmark
# decontamination, completing the decontamination family: exact
# (shingle semi-join), fuzzy (MinHash-LSH), bloom (bit-set probe) catch
# lexical leakage; this catches REWRITTEN/translated leakage by cosine
# against the benchmark's embeddings (the "semantic decontamination"
# step modern pre-training pipelines run after the lexical passes).
# A corpus vector is contaminated when its max cosine against ANY
# benchmark vector reaches the threshold.
#
# Determinism: each pair cosine is rounded to 6 BEFORE the per-vector
# max and the threshold compare, so both engines take max/compare over
# identical doubles.
#
# Threshold note: the synthetic embeddings are near-orthogonal (max
# observed benchmark cosine ≈ 0.50 at sf0.1), so the exhibit threshold
# sits in the observed tail to exercise both outcomes at every SF; a
# production pipeline sets ~0.9+ against a real encoder.
#
# Scale shape: the benchmark slice is a BOUNDED eval set (vec_id %
# BENCH_MOD — ~1% here, fixed-size in production) broadcast once; the
# corpus side is one map-side scan × |bench| partial-agg'd max, then a
# per-label count agg. No corpus×corpus stage, nothing driver-side.
# --------------------------------------------------------------------------
SEM_DECON_THRESHOLD = 0.35


@query(
    "dedup_decontaminate_semantic",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT v FROM e WHERE vec_id % {BENCH_MOD} = 0),
    m AS (
      SELECT e.vec_id, e.label,
             max(round(list_cosine_similarity(e.v, b.v), 6) + 0) AS max_cos
      FROM e JOIN b ON TRUE
      WHERE e.vec_id % {BENCH_MOD} <> 0
      GROUP BY e.vec_id, e.label
    )
    SELECT label,
           CAST(count(*) FILTER (WHERE max_cos >= {SEM_DECON_THRESHOLD})
                AS BIGINT) AS n_removed,
           CAST(count(*) FILTER (WHERE max_cos < {SEM_DECON_THRESHOLD})
                AS BIGINT) AS n_kept,
           max(max_cos) AS top_bench_cosine
    FROM m GROUP BY label
    """,
)
def dedup_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus x bench max-cosine via ONE numpy matmul per Arrow batch.

    The bench slice is a bounded eval set (fixed-size in production — a
    few k vectors), so it ships to executors as a broadcast numpy matrix,
    row-normalized once; each corpus Arrow batch then scores against it
    with a single ``V_hat @ B_hat.T`` and takes the per-row max of the
    rounded pair cosines (round-to-6 BEFORE max, the oracle's order).
    Replaces the interpreted ``zip_with``+``aggregate`` lambda per element
    per pair — measured 24 s -> sub-second at sf1, values identical after
    the rounding discipline. The driver-side collect of the bench slice is
    the same bounded-eval-set read the broadcast join did; it is NOT a
    corpus collect.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    is_bench = F.col("vec_id") % BENCH_MOD == 0
    bench_rows = emb.filter(is_bench).select("v").collect()
    if not bench_rows:
        # Empty bench slice (a corpus whose vec_ids contain no multiple
        # of BENCH_MOD): the oracle's m CTE joins against an empty b, so
        # its per-label aggregate has ZERO rows — degrade identically
        # instead of letting np.stack([]) raise (r12 ADVICE).
        return spark.createDataFrame(
            [], "label int, n_removed bigint, n_kept bigint, top_bench_cosine double"
        )
    b = np.stack([np.asarray(r["v"], dtype=np.float64) for r in bench_rows])
    b_nrm = np.sqrt((b * b).sum(axis=1))
    if not b_nrm.all():
        # same loud-error contract as the block kernel: NaN cosines
        # from a zero-norm bench vector would silently diverge from
        # the oracle's NaN-is-greatest comparison semantics
        raise ValueError("zero-norm embedding(s) in the bench slice")
    b_hat = b / b_nrm[:, None]
    b_bc = spark.sparkContext.broadcast(b_hat)
    threshold = SEM_DECON_THRESHOLD

    def score(batches):
        bh = b_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            v_nrm = np.sqrt((v * v).sum(axis=1))
            if not v_nrm.all():
                raise ValueError("zero-norm embedding(s) in the corpus slice")
            v_hat = v / v_nrm[:, None]
            cos = _np_round_half_away(v_hat @ bh.T, 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "max_cos": cos.max(axis=1),
                }
            )

    m = emb.filter(~is_bench).mapInPandas(
        score, schema="vec_id bigint, label int, max_cos double"
    )
    contaminated = F.col("max_cos") >= threshold
    return m.groupBy("label").agg(
        F.sum(F.when(contaminated, 1).otherwise(0)).cast("bigint").alias("n_removed"),
        F.sum(F.when(~contaminated, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.max("max_cos").alias("top_bench_cosine"),
    )


# --------------------------------------------------------------------------
# dedup_tombstone_propagation — deletion propagated through DERIVED
# dedup state (the right-to-be-forgotten contract for a curation
# pipeline): given a deterministic tombstone set (doc_id % TOMB_MOD ==
# 0, the stand-in for deletion requests), recompute the near-dup
# cluster map over the POST-DELETE graph and report every surviving
# document whose canonical changed. Deleting a doc does more than drop
# its row: a cluster whose canonical died elects a new minimum, and a
# component bridged ONLY by a deleted doc splits — both effects fall
# out of re-running CC on the filtered pair graph, never patched by
# hand. Surviving docs that drop out of the graph entirely become their
# own canonical (coalesce to self — the singleton rule shared with
# dedup_split_leakage_safe).
#
# Scale shape: the before-map rides the session-cached cc_comps; the
# after-map is one CC run over the FILTERED verified-pair list (edge
# filtering is a pure predicate on the cached pairs — no new shingle
# self-join); the diff is one equi-join on doc id. Oracle: the shared
# CC chain rendered twice via its suffix/filter parameterization —
# before and after graphs composed in one WITH RECURSIVE, zero fragment
# duplication.
# --------------------------------------------------------------------------
TOMB_MOD = 7  #: deterministic tombstone slice (doc_id % TOMB_MOD == 0)


@query(
    "dedup_tombstone_propagation",
    oracle=f"""
    WITH RECURSIVE {cc_oracle_ctes()},
    {cc_oracle_ctes("_t", f"WHERE doc_id % {TOMB_MOD} <> 0")}
    SELECT b.id AS doc_id,
           CAST(b.comp AS BIGINT) AS canon_before,
           CAST(coalesce(a.comp, b.id) AS BIGINT) AS canon_after
    FROM comps b LEFT JOIN comps_t a ON a.id = b.id
    WHERE b.id % {TOMB_MOD} <> 0
      AND b.comp <> coalesce(a.comp, b.id)
    """,
)
def dedup_tombstone_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = cc_pairs(spark, sf_dir)
    before = cc_comps(spark, sf_dir)
    alive = (F.col("doc_a") % TOMB_MOD != 0) & (F.col("doc_b") % TOMB_MOD != 0)
    after = cc_labels(pairs.filter(alive))
    return (
        before.alias("b")
        .filter(F.col("id") % TOMB_MOD != 0)
        .join(after.alias("a"), "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.col("b.comp").cast("bigint").alias("canon_before"),
            F.coalesce(F.col("a.comp"), F.col("id")).cast("bigint").alias("canon_after"),
        )
        .filter(F.col("canon_before") != F.col("canon_after"))
    )


# --------------------------------------------------------------------------
# dedup_lsh_precision_audit — the PRECISION half of the LSH tuning pair
# (dedup_lsh_recall_audit measures what the bands MISS; this measures
# what they WASTE): every banded candidate pair bucketed by its exact
# Jaccard decile, with bucket -1 for pure hash collisions (no shared
# shingle at all). The verify stage's cost is proportional to the
# below-threshold candidate mass, so this table is the other input to
# the N_MINHASH/N_BANDS decision — together the two audits bracket the
# LSH S-curve from both sides. Shares in integer millionths of the
# candidate total.
#
# Scale shape: reuses the session-cached signature/band tables and the
# shared-shingle truth pairs; the audit itself is one left join over
# the candidate set + an ≤12-row decile agg.
# --------------------------------------------------------------------------
@query(
    "dedup_lsh_precision_audit",
    oracle=f"""
    WITH {lsh_audit_ctes()},
    pmarked AS (
      SELECT coalesce((10 * t.n_common) // (t.na + t.nb - t.n_common), -1)
               AS bucket
      FROM cand c
      LEFT JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT)
             AS share_x1e6
    FROM pmarked GROUP BY bucket
    """,
)
def dedup_lsh_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = lsh_candidate_pairs(spark, sf_dir)
    truth = shared_shingle_pairs(spark, sf_dir)
    pmarked = cand.join(truth, ["doc_a", "doc_b"], "left").select(
        F.coalesce(
            F.expr("10 * n_common div (na + nb - n_common)"), F.lit(-1)
        ).alias("bucket")
    )
    agg = pmarked.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return agg.select(
        "bucket",
        "n_candidates",
        F.expr(
            "CAST(n_candidates * 1000000 DIV sum(n_candidates) OVER () AS BIGINT)"
        ).alias("share_x1e6"),
    )


# --------------------------------------------------------------------------
# dedup_minhash_estimate_audit — the SIGNATURE-level member of the LSH
# audit trio (recall audit grades the BANDS, precision audit grades the
# candidate mass, this grades the ESTIMATOR): for every true
# shared-shingle pair, the Jaccard decile the 12-permutation MinHash
# signature ESTIMATES (matching components · 10 // N_MINHASH) against
# the exact decile — as a confusion table. The off-diagonal mass is the
# estimator variance the banding thresholds must absorb; measured,
# not assumed (the 1/sqrt(12) theory bound made concrete).
#
# Integer-exact throughout: component matches and intersection counts
# are integers, both deciles are truncating integer divisions. Scale
# shape: reuses the session-cached signature table and the shared truth
# pairs, and — unlike the other two audits, whose joins stay narrow —
# ACTS on a deterministic pair slice (doc_a % EST_AUDIT_MOD == 0): the
# estimator join drags 2×N_MINHASH md5 strings per pair, so the sampled
# slice is what keeps it an audit rather than a second pairwise stage
# (measured: the full-pair oracle blows the 90 s sf1 cap; the slice
# runs in seconds on both engines). The estimator-variance measurement
# is statistical — a 1/8 deterministic slice estimates it equally well.
# --------------------------------------------------------------------------
EST_AUDIT_MOD = 8  #: audit the pairs with doc_a % EST_AUDIT_MOD == 0


def _mh_match_sum_sql(a: str, b: str) -> str:
    return " + ".join(
        f"CASE WHEN {a}.mh{i} = {b}.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_MINHASH)
    )


@query(
    "dedup_minhash_estimate_audit",
    oracle=f"""
    WITH {lsh_audit_ctes()},
    est AS (
      SELECT (10 * t.n_common) // (t.na + t.nb - t.n_common) AS exact_bucket,
             (10 * ({_mh_match_sum_sql('a', 'b')})) // {N_MINHASH} AS est_bucket
      FROM truth t
      JOIN mh a ON a.doc_id = t.doc_a
      JOIN mh b ON b.doc_id = t.doc_b
      WHERE t.doc_a % {EST_AUDIT_MOD} = 0
    )
    SELECT CAST(exact_bucket AS BIGINT) AS exact_bucket,
           CAST(est_bucket AS BIGINT) AS est_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM est GROUP BY exact_bucket, est_bucket
    """,
)
def dedup_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_sets(spark, sf_dir)
    sig = _session_cached(
        spark,
        "lsh_sig",
        sf_dir,
        lambda: minhash_signature_df(
            sh.select("doc_id", F.explode("shingles").alias("s"))
        ),
        eager=True,
    )
    truth = shared_shingle_pairs(spark, sf_dir)
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = (
        truth.filter(F.col("doc_a") % EST_AUDIT_MOD == 0)
        .join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.expr("10 * n_common div (na + nb - n_common)").alias("exact_bucket"),
            ((10 * matches) / N_MINHASH).cast("int").alias("est_bucket"),
        )
    )
    return est.groupBy(
        F.col("exact_bucket").cast("bigint").alias("exact_bucket"),
        F.col("est_bucket").cast("bigint").alias("est_bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
