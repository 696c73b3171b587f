"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k baseline + IVF (coarse-quantizer) bucketed variant.

North-star extension (SURVEY §7 Phase 5). Cosine is computed JVM-side
(``zip_with`` + ``aggregate`` fold in index order — bit-compatible with the
DuckDB oracle's ``list_cosine_similarity``); ranking uses the cosine
rounded to 6 dp with vec_id tie-break so both engines rank identically.

Scale notes (100 TB):
- brute force: the query side is broadcast (queries << corpus always), so
  the scan is a single narrow pass over the corpus — no shuffle until the
  per-query top-k, which is a WindowGroupLimit (only k rows per partition
  per query survive to the shuffle).
- IVF: centroid assignment restricts each query to one coarse cell —
  here cells are the ``label`` column; in a real pipeline the cell id
  comes from k-means (Spark MLlib) but the query plan — broadcast
  centroids, prune to cell, top-k within — is exactly this one.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas-UDF type hints
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from deisa_ray_spark.functions.dedup import MAX_COSINE_BLOCK, cosine_sim
from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table

N_QUERIES = 5  #: vectors with vec_id < N_QUERIES are the query set
TOP_K = 10
IVF_PROBES = 4  #: coarse cells probed per query (multi-probe IVF)
IVF_CELLS = 8  #: k for the learned (k-means) coarse quantizer


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )


# --------------------------------------------------------------------------
# sim_bruteforce_topk — exact cosine top-k: broadcast queries × corpus
# scan → windowed rank → k rows per query.
# --------------------------------------------------------------------------
@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.qid, c.vec_id AS neighbor_id, c.label,
             round(list_cosine_similarity(q.qe, c.embedding::DOUBLE[]), 6) + 0 AS cosine
      FROM q JOIN embeddings c ON c.vec_id <> q.qid
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT qid, neighbor_id, label, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "label", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# sim_ivf_topk — IVF-style: per-cell centroid (cell = label), assign each
# query to its IVF_PROBES nearest centroids (multi-probe), search only
# those cells. Scan cost drops from |corpus| to P·|cell| per query;
# P/n_cells is the recall-vs-scan dial (verified in
# tests/test_similarity.py). Exact oracle: the probe set is
# deterministic (rounded cosine, label tiebreak), so DuckDB reproduces
# the full multi-probe result bit-for-bit.
# --------------------------------------------------------------------------
@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH dims AS (
      SELECT label, generate_subscripts(embedding, 1) AS dim,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label, array_agg(c ORDER BY dim) AS cvec
      FROM (SELECT label, dim, avg(v) AS c FROM dims GROUP BY label, dim)
      GROUP BY label
    ),
    q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    assign AS (
      SELECT qid, qe, label AS cell
      FROM (
        SELECT q.qid, q.qe, cent.label,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(q.qe, cent.cvec), 6) + 0 DESC,
                          cent.label) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= {IVF_PROBES}
    ),
    scored AS (
      SELECT a.qid, a.cell, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.qe, c.embedding::DOUBLE[]), 6) + 0 AS cosine
      FROM assign a JOIN embeddings c ON c.label = a.cell AND c.vec_id <> a.qid
    )
    SELECT qid, cell, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # per-cell centroid: posexplode → per-dim avg → re-assemble in dim order
    dims = emb.select("label", F.posexplode("e").alias("dim", "v"))
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    rn_w = W.partitionBy("qid").orderBy(
        F.desc(F.round(cosine_sim(F.col("qe"), F.col("cvec")), 6)), F.asc("label")
    )
    assign = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") <= IVF_PROBES)
        .select("qid", "qe", F.col("label").alias("cell"))
    )
    scored = (
        F.broadcast(assign)
        .join(emb, (emb.label == F.col("cell")) & (emb.vec_id != F.col("qid")))
        .select(
            "qid",
            "cell",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cell", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# emb_scalar_quantize — int8 scalar quantization of embeddings (the
# storage-compression pass before ANN indexing at scale). Quantizer:
# scale = 127 / max|v|; q_i = floor(v_i * scale + 0.5) — floor(x+0.5) is
# used instead of round() on BOTH sides because numpy/Python round
# half-to-even while SQL rounds half-away (a real 1-ulp trap).
# Output: per-vector scale + position-weighted checksum of the codes,
# verifying every code at every position. Narrow per-row op, no shuffle.
# --------------------------------------------------------------------------
@query(
    "emb_scalar_quantize",
    oracle="""
    WITH prep AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS e,
             list_max(list_transform(embedding::DOUBLE[], v -> abs(v))) AS amax
      FROM embeddings
    )
    SELECT vec_id,
           round(127.0 / amax, 6) AS scale,
           CAST(list_sum(list_transform(range(1, len(e) + 1),
                i -> floor(e[i] * (127.0 / amax) + 0.5) * i)) AS BIGINT)
             AS code_checksum
    FROM prep
    """,
)
def emb_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # posexplode + two-level aggregate: amax and the code-sum are both
    # partial-agg friendly. (The pure array-expression form — aggregate
    # over zip_with with `scale` referencing array_max(e) — is collapsed
    # by Catalyst into ONE projection, so array_max re-evaluates per
    # element: O(d²) per row, measured 71 s vs ~2 s on 5000×64 vectors.)
    emb = _emb(spark, sf_dir)
    dims = emb.select("vec_id", F.posexplode("e").alias("dim", "v"))
    amax = dims.groupBy("vec_id").agg(F.max(F.abs("v")).alias("amax"))
    scale = F.lit(127.0) / F.col("amax")
    return (
        dims.join(amax, "vec_id")
        .groupBy("vec_id")
        .agg(
            F.round(F.first(scale), 6).alias("scale"),
            F.sum(F.floor(F.col("v") * scale + F.lit(0.5)) * (F.col("dim") + 1))
            .cast("bigint")
            .alias("code_checksum"),
        )
    )


# --------------------------------------------------------------------------
# kmeans_ivf_neighbors — real IVF: MLlib k-means learns the coarse
# quantizer (k=8 cells, fixed seed); each query probes its IVF_PROBES
# nearest cells (multi-probe — the standard recall lever: probe-1 on
# near-uniform vectors measured ~0.36 recall@10, probe-4 ≥0.7). The
# declared twin `sim_kmeans_ivf_topk` wraps this in a recall contract
# (the raw neighbor set depends on the fitted centroids, which no SQL
# oracle can reproduce).
# Scale: the fitted centroids are a broadcast table (k rows — model
# size, not data size); cell assignment of the corpus is one narrow
# pass; per-query search scans ~|corpus|·P/k rows — P/k is the
# recall-vs-scan dial, identical to FAISS nprobe.
# --------------------------------------------------------------------------
#: session-keyed trained-quantizer cache (the _BPE_CACHE discipline): a
#: fitted coarse quantizer is a MODEL artifact a pipeline trains once —
#: without the cache each construction of sim_kmeans_ivf_topk /
#: sim_ivf_pq_topk (3× per bench query, plus recall tests) re-runs the
#: eager 20-iteration k-means fit. Eviction only drops the reference;
#: the frames stay usable to earlier callers.
_IVF_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _ivf_cells(spark: SparkSession, sf_dir: str):
    """Fit (or fetch the session-cached) coarse quantizer; returns
    (assigned, cent): the corpus with its cell assignment, and the
    fitted centroids as a tiny broadcast-able frame (k rows — model
    state, not data size)."""
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _IVF_CACHE.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _IVF_CACHE if k != key]:
        _IVF_CACHE.pop(k)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _emb(spark, sf_dir)
    vecs = emb.withColumn("features", array_to_vector("e"))
    km = KMeans(k=IVF_CELLS, seed=42, maxIter=20).fit(vecs)
    assigned = km.transform(vecs).select(
        "vec_id", "e", F.col("prediction").alias("cell")
    )
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        "pcell int, cvec array<double>",
    )
    _IVF_CACHE[key] = (assigned, cent)
    return assigned, cent


def _ivf_probes(assigned: DataFrame, cent: DataFrame, n_probes: int) -> DataFrame:
    """Per-query probe set ``(qid, qe, pcell)``: the n_probes nearest
    cells by the same metric k-means assigns with (squared L2), so
    probe-1 reproduces km.transform's assignment exactly."""
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    wp = W.partitionBy("qid").orderBy(
        F.asc(_sq_dist(F.col("qe"), F.col("cvec"))), F.asc("pcell")
    )
    return (
        q.crossJoin(F.broadcast(cent))
        .withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= n_probes)
        .select("qid", "qe", "pcell")
    )


def kmeans_ivf_neighbors(
    spark: SparkSession, sf_dir: str, n_probes: int = IVF_PROBES
) -> DataFrame:
    assigned, cent = _ivf_cells(spark, sf_dir)
    probes = _ivf_probes(assigned, cent, n_probes)
    # a neighbor lives in exactly one cell, so the probe equi-join
    # yields each (qid, neighbor) at most once — no dedup stage needed
    scored = (
        F.broadcast(probes)
        .join(assigned, (assigned.cell == probes.pcell) & (assigned.vec_id != probes.qid))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cell", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# sim_rp_lsh_topk — random-hyperplane (sign) LSH with multi-probe:
# bucket = the 4-bit sign pattern of the first 4 dimensions (a
# deterministic stand-in for 4 random hyperplanes — same plan shape,
# oracle-reproducible); each query probes its own bucket plus the 4
# buckets at Hamming distance 1 (one flipped hyperplane), then exact
# cosine top-k within the candidates.
#
# This is the LSH-bucketed ANN path next to the IVF one (sim_ivf_topk):
# scale shape is one equi-shuffle on the bucket code instead of a full
# cross join — each corpus vector lands in exactly one bucket, each
# query fans out to (bits+1) probe codes, so candidates ~ n·(bits+1)/2^bits
# per query with NO duplicate candidates. Production knobs: more bits →
# smaller buckets (needs more probes), B independent tables → recall at
# B× cost. Recall vs brute force is pinned in test_similarity_recall.py.
# --------------------------------------------------------------------------
RP_BITS = 4
_PROBE_MASKS = [0] + [1 << i for i in range(RP_BITS)]  #: Hamming ≤ 1


def _rp_bucket(e: Column) -> Column:
    """Sign code of the first RP_BITS dims (JVM-side int)."""
    code = F.lit(0)
    for i in range(RP_BITS):
        code = code + (F.element_at(e, i + 1) > 0).cast("int") * (1 << i)
    return code


def _rp_bucket_sql(col: str) -> str:
    return " + ".join(
        f"(CASE WHEN {col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(RP_BITS)
    )


@query(
    "sim_rp_lsh_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      {_rp_bucket_sql('embedding')} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS qid, e AS qe,
                 unnest([{", ".join(f"xor(bucket, {m})" for m in _PROBE_MASKS)}])
                     AS probe
          FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.qid, c.vec_id AS neighbor_id, c.bucket,
             round(list_cosine_similarity(q.qe, c.e), 6) + 0 AS cosine
      FROM q JOIN e c ON c.bucket = q.probe
      WHERE c.vec_id <> q.qid
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT qid, neighbor_id, bucket, cosine, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def sim_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn("bucket", _rp_bucket(F.col("e")))
    probes = F.array(*[F.col("bucket").bitwiseXOR(m) for m in _PROBE_MASKS])
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            F.explode(probes).alias("probe"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(emb, q.probe == emb.bucket)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "bucket", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# sim_pq_topk — product quantization (PQ) ANN: the memory-bound scale
# path. Vectors are unit-normalized, split into PQ_M subvectors; a
# PQ_K-entry codebook per subspace is trained driver-side on a BOUNDED
# sample (deterministic Lloyd iterations — at 100 TB you train the
# codebook on a sample regardless of corpus size), then:
#   1. encode: each corpus vector → PQ_M small codes (a broadcast-join
#      argmin per subspace, `min_by` JVM-side) — the corpus is never
#      collected; the stored index is PQ_M ints/vector (64 B → 8 B here,
#      ~16× at production dims).
#   2. ADC scan: per-query distance table (qid, m, code → partial d²),
#      Q×M×K rows, broadcast; approximate distance is a join-aggregate
#      over the CODES ONLY — the full vectors are not touched.
#   3. re-rank: exact cosine on the PQ_SHORTLIST ADC survivors.
# The declared twin `sim_pq_topk` wraps this in a recall contract
# (iterative codebook training — no SQL oracle can reproduce the
# codes). Scale shape: one narrow encode pass,
# then all scoring reads |corpus|×M code rows (bytes, not vectors) with
# broadcast joins only — no shuffle until the per-query top-k
# WindowGroupLimit.
# --------------------------------------------------------------------------
PQ_M = 8  #: subspaces
PQ_K = 32  #: codes per subspace
PQ_SHORTLIST = 100  #: ADC-survivor re-rank FLOOR (re-rank depth is
#: PQ's recall dial: 50 measured 0.60 recall@10 at sf0.1, 100 measures
#: 0.76). A FIXED 100 under-covers as the corpus grows — measured 0.54
#: at sf1 (20k vectors), under the 0.6 contract floor — so the
#: effective depth scales: max(PQ_SHORTLIST, 2% of corpus), which
#: measures 0.70 at sf1 (shortlist 400; 200 measured exactly 0.60 — no
#: margin). A constant-FRACTION re-rank keeps the same asymptotic as
#: plain PQ itself (ADC already scans every code row); the bounded-scan
#: serving shape at 100 TB is the IVF+PQ composition, where the IVF
#: candidate set caps the re-rank regardless.
PQ_SHORTLIST_PCT = 2  #: corpus percentage for the scaled re-rank depth
PQ_TRAIN_N = 2000  #: bounded driver-side training sample


def _pq_train(sample: "list[list[float]]", sub_dim: int) -> "list[list[list[float]]]":
    """Deterministic Lloyd k-means per subspace (numpy, fixed init: first
    PQ_K distinct training subvectors). Returns [m][code][sub_dim]."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    books = []
    for m in range(PQ_M):
        sub = x[:, m * sub_dim : (m + 1) * sub_dim]
        cent = sub[np.sort(np.unique(sub.round(9), axis=0, return_index=True)[1])[:PQ_K]]
        for _ in range(10):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for k in range(len(cent)):
                mask = assign == k
                if mask.any():
                    cent[k] = sub[mask].mean(0)
        books.append(cent.tolist())
    return books


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 between two equal-length arrays, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_adc_neighbors(
    spark: SparkSession, sf_dir: str, cand: DataFrame | None = None
) -> DataFrame:
    """PQ/ADC search. With ``cand`` (a ``(qid, vec_id)`` candidate
    frame), ADC scoring is RESTRICTED to those pairs — the IVF+PQ
    composition's hook (sim_ivf_pq_topk): the coarse quantizer bounds
    the scan, PQ bounds the bytes per scanned row."""
    emb = _emb(spark, sf_dir)
    n_dim = len(emb.select("e").first()["e"])
    sub_dim = n_dim // PQ_M

    # unit-normalize via the explode shape (a transform(e, v -> v/norm)
    # projection would inline the norm aggregate into every element —
    # the O(d²) projection-collapse trap).
    dims = emb.select("vec_id", F.posexplode("e").alias("dim", "v"))
    norms = dims.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    sub = (
        dims.join(norms, "vec_id")
        .withColumn("m", (F.col("dim") / sub_dim).cast("int"))
        .groupBy("vec_id", "m")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", (F.col("v") / F.col("nrm")).alias("nv")))),
                lambda s: s["nv"],
            ).alias("sv")
        )
    )

    # bounded-sample codebook, broadcast back as a tiny DataFrame
    train = [r["e"] for r in emb.select("e").limit(PQ_TRAIN_N).collect()]
    books = _pq_train(train, sub_dim)
    cb = spark.createDataFrame(
        [(m, k, books[m][k]) for m in range(PQ_M) for k in range(len(books[m]))],
        "m int, code int, cvec array<double>",
    )

    # 1. encode: per-(vector, subspace) argmin over the broadcast codebook
    codes = (
        sub.join(F.broadcast(cb), "m")
        .groupBy("vec_id", "m")
        .agg(F.min_by("code", F.struct(_sq_dist(F.col("sv"), F.col("cvec")), F.col("code"))).alias("code"))
    )

    # 2. ADC: per-query distance table (broadcast) x corpus codes
    qsub = sub.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    dtable = qsub.join(F.broadcast(cb), "m").select(
        "qid", "m", "code", _sq_dist(F.col("qsv"), F.col("cvec")).alias("pd")
    )
    if cand is not None:
        # IVF-restricted: pair candidates with their codes first, so
        # ADC only ever touches |cand|·M code rows (never corpus × Q)
        adc = (
            cand.join(codes, "vec_id")
            .join(F.broadcast(dtable), ["qid", "m", "code"])
            .filter(F.col("vec_id") != F.col("qid"))
            .groupBy("qid", "vec_id")
            .agg(F.sum("pd").alias("adist"))
        )
    else:
        adc = (
            codes.join(F.broadcast(dtable), ["m", "code"])
            .filter(F.col("vec_id") != F.col("qid"))
            .groupBy("qid", "vec_id")
            .agg(F.sum("pd").alias("adist"))
        )
    # corpus-scaled re-rank depth (PQ_SHORTLIST note): n from parquet
    # row-group metadata, one cheap job
    sl = max(PQ_SHORTLIST, emb.count() * PQ_SHORTLIST_PCT // 100)
    wa = W.partitionBy("qid").orderBy(F.asc("adist"), F.asc("vec_id"))
    shortlist = (
        adc.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= sl)
        .select("qid", "vec_id", "adist")
    )

    # 3. exact re-rank of the shortlist
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    scored = (
        F.broadcast(shortlist)
        .join(emb, "vec_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Recall contracts for the ANN paths whose raw neighbor sets no SQL
# oracle can reproduce (learned quantizers). The declared query runs the
# ANN search AND the exact brute-force baseline, joins them, and emits
# the quality contract as one hash-checkable row (the q42/q27
# convention): every query answered, k results each, mean recall@k over
# a pinned floor. The floors match tests/test_similarity_recall.py
# (near-uniform embeddings are ANN's hardest case; with IVF_PROBES=4
# multi-probe and PQ_SHORTLIST=100, measured means across
# sf0.001/0.01/0.1 are 0.92/0.86/0.74 IVF and 0.82/0.86/0.76 PQ — the
# 0.6 floors hold with ≥1.2× margin at every SF).
# --------------------------------------------------------------------------
_RECALL_ORACLE = f"""
    SELECT count(*) AS n_queries, TRUE AS all_answered,
           TRUE AS k_each, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < {N_QUERIES}
"""


def _recall_contract(spark: SparkSession, sf_dir: str, approx: DataFrame,
                     floor: float) -> DataFrame:
    exact = sim_bruteforce_topk(spark, sf_dir).select("qid", "neighbor_id")
    appr = approx.select("qid", "neighbor_id")
    hits = (
        exact.join(appr, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_q = (
        exact.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
        .join(appr.groupBy("qid").agg(F.count(F.lit(1)).alias("n_appr")),
              "qid", "left")
        .join(hits, "qid", "left")
        .na.fill({"n_appr": 0, "n_hit": 0})
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.sum((F.col("n_appr") > 0).cast("int")) == F.count(F.lit(1)))
        .alias("all_answered"),
        (F.min("n_appr") >= TOP_K).alias("k_each"),
        (F.avg(F.col("n_hit") / F.col("n_exact")) >= floor).alias("recall_ok"),
    )


@query("sim_kmeans_ivf_topk", oracle=_RECALL_ORACLE)
def sim_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_contract(
        spark, sf_dir, kmeans_ivf_neighbors(spark, sf_dir), floor=0.6
    )


@query("sim_pq_topk", oracle=_RECALL_ORACLE)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_contract(
        spark, sf_dir, pq_adc_neighbors(spark, sf_dir), floor=0.6
    )


def ivf_pq_neighbors(
    spark: SparkSession, sf_dir: str, n_probes: int = IVF_PROBES
) -> DataFrame:
    """IVF+PQ composed — the FAISS-IVFPQ architecture and the actual
    100 TB ANN serving shape: the learned coarse quantizer bounds WHICH
    rows are scanned (~|corpus|·P/k), PQ codes bound the BYTES per
    scanned row (M bytes vs d floats), ADC scores the candidates from a
    broadcast distance table, and the exact re-rank touches only the
    bounded shortlist."""
    assigned, cent = _ivf_cells(spark, sf_dir)
    probes = _ivf_probes(assigned, cent, n_probes)
    cand = (
        F.broadcast(probes.select("qid", "pcell"))
        .join(assigned, assigned.cell == F.col("pcell"))
        .select("qid", "vec_id")
    )
    return pq_adc_neighbors(spark, sf_dir, cand=cand)


@query("sim_ivf_pq_topk", oracle=_RECALL_ORACLE)
def sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_contract(
        spark, sf_dir, ivf_pq_neighbors(spark, sf_dir), floor=0.5
    )


# --------------------------------------------------------------------------
# emb_truncate_renorm — Matryoshka-style dimensionality reduction: keep
# the first K dimensions and L2-renormalize (MRL embeddings are trained
# so prefixes are usable embeddings; public Kusupati et al. 2022). The
# standard storage/compute trade in embedding pipelines: K/d of the
# bytes, one narrow projection, zero shuffle.
# --------------------------------------------------------------------------
MRL_KEEP_DIMS = 8


@query(
    "emb_truncate_renorm",
    oracle=f"""
    WITH cut AS (
      SELECT vec_id, label, (embedding::DOUBLE[])[1:{MRL_KEEP_DIMS}] AS p
      FROM embeddings
    ),
    normed AS (
      SELECT vec_id, label, p,
             sqrt(list_sum(list_transform(p, v -> v * v))) AS nrm
      FROM cut
    )
    SELECT vec_id, label,
           CAST(len(p) AS INT) AS kept_dims,
           round(nrm, 6) AS prefix_norm,
           round(p[1] / nrm, 6) AS u0,
           round(list_sum(list_transform(p, v -> v / nrm)), 6) AS u_sum
    FROM normed
    """,
)
def emb_truncate_renorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    p = F.slice("e", 1, MRL_KEEP_DIMS)
    nrm = F.sqrt(F.aggregate(p, F.lit(0.0), lambda acc, v: acc + v * v))
    return emb.select(
        "vec_id",
        "label",
        F.size(p).alias("kept_dims"),
        F.round(nrm, 6).alias("prefix_norm"),
        F.round(F.element_at(p, 1) / nrm, 6).alias("u0"),
        F.round(
            F.aggregate(p, F.lit(0.0), lambda acc, v: acc + v) / nrm, 6
        ).alias("u_sum"),
    )


# --------------------------------------------------------------------------
# emb_dim_stats — per-dimension statistics of the embedding matrix
# (mean, population std, min/max): the diagnostics behind whitening /
# normalization decisions and collapsed-dimension detection in embedding
# QA. posexplode + one partial-agg shuffle keyed by dimension — d keys,
# uniform, independent of corpus size.
# --------------------------------------------------------------------------
@query(
    "emb_dim_stats",
    oracle="""
    WITH dims AS (
      SELECT u.i - 1 AS dim, (embedding::DOUBLE[])[u.i] AS v
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) u(i)
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(v), 6) AS mean_v,
           round(stddev_pop(v), 6) AS std_v,
           round(min(v), 6) AS min_v,
           round(max(v), 6) AS max_v
    FROM dims GROUP BY dim
    """,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = emb.select(F.posexplode("e").alias("dim", "v"))
    return dims.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.stddev_pop("v"), 6).alias("std_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


# --------------------------------------------------------------------------
# sim_mrl_rerank_topk — the production Matryoshka retrieval pattern:
# shortlist candidates by cosine on the cheap MRL_KEEP_DIMS-dim PREFIX
# (K/d of the arithmetic AND K/d of the bytes scanned: the prefix is a
# real stored column in a narrow companion table, materialized once at
# "ingest" — mrl_prefix_table below — so the coarse scan never touches
# the full embedding column; plan-pinned in test_plans.py), then re-rank
# only the shortlist with the full-dimension cosine. Fully deterministic,
# so unlike the learned IVF/PQ paths it gets an EXACT SQL oracle — both
# stages are WindowGroupLimit top-N shapes (no global sort, per-query
# partitions).
# --------------------------------------------------------------------------
MRL_SHORTLIST = 20


def mrl_prefix_table(
    spark: SparkSession, sf_dir: str, scratch_root: str | None = None
) -> DataFrame:
    """The stored-prefix companion table ``(vec_id, prefix)``.

    At 100 TB this column is written at ingest time next to the full
    embedding (the whole point of MRL training is that the prefix is a
    usable embedding, so you persist it once and scan K/d of the bytes on
    every coarse pass). The testdata has no such column, so materialize
    it once per (sf_dir, K, DATA VERSION) into a parquet cache under the
    engine's scratch root (``paths.scratch_root`` — the
    ``$SPARK_GRAFT_SCRATCH_DIR`` policy; point it at shared storage on a
    real cluster) and scan THAT — a genuinely narrow scan, not a slice
    over the wide column.

    Staging is PER-PROCESS (``paths.run_scratch_root``): every
    invocation rebuilds the prefix table from the source parquet — the
    point of the staged table is the narrow-scan PLAN SHAPE, not
    amortizing the (one slice-projection write) build across runs. The
    cache key still includes a fingerprint of the source parquet's file
    sizes+mtimes: the testdata can regenerate in place MID-SESSION, and
    a path-only key would silently serve stale prefixes against fresh
    embeddings (wrong shortlists, no loud failure). The build reads the
    source with a FRESH scan (bypassing the registry's pinned-listing
    table cache) so the bytes written always match the fingerprint.
    Publication/eviction go through the shared
    ``paths.publish_fingerprinted_dir`` protocol (also the bench
    split-staging cache's)."""
    import hashlib
    import os

    from deisa_ray_spark import paths

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    src_key = hashlib.md5(f"{src}|{MRL_KEEP_DIMS}".encode()).hexdigest()[:12]
    fp_key = paths.fingerprint_paths([("embeddings", src)])

    def build(tmp: str) -> None:
        # fresh scan, NOT load_table: the registry cache pins its file
        # listing at first load, so after an in-place regeneration it
        # would serve the OLD snapshot while the fingerprint above
        # reflects the NEW files — poisoning the persistent cache
        fresh = spark.read.parquet(src).select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("e"),
        )
        out = os.path.join(tmp, "data")
        (
            fresh.select("vec_id", F.slice("e", 1, MRL_KEEP_DIMS).alias("prefix"))
            .write.mode("overwrite")
            .parquet(out)
        )
        with open(os.path.join(tmp, "_STAGED_OK"), "w") as f:
            f.write(fp_key)

    root_dir = os.path.join(paths.run_scratch_root(scratch_root), "mrl_prefix")
    path = paths.publish_fingerprinted_dir(root_dir, src_key, fp_key, build)
    return spark.read.parquet(os.path.join(path, "data"))


@query(
    "sim_mrl_rerank_topk",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             (embedding::DOUBLE[])[1:{MRL_KEEP_DIMS}] AS p
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, e AS qe, p AS qp FROM base
          WHERE vec_id < {N_QUERIES}),
    coarse AS (
      SELECT q.qid, q.qe, b.vec_id AS neighbor_id, b.e,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY round(list_cosine_similarity(q.qp, b.p), 6) + 0 DESC,
                        b.vec_id ASC) AS crank
      FROM q JOIN base b ON b.vec_id <> q.qid
    ),
    rerank AS (
      SELECT qid, neighbor_id,
             round(list_cosine_similarity(qe, e), 6) + 0 AS cosine,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY round(list_cosine_similarity(qe, e), 6) + 0 DESC,
                        neighbor_id ASC) AS rank
      FROM coarse WHERE crank <= {MRL_SHORTLIST}
    )
    SELECT qid, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM rerank WHERE rank <= {TOP_K}
    """,
)
def sim_mrl_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Coarse stage scans ONLY the narrow stored-prefix table (K/d bytes);
    # the full embedding column is touched twice, both times cheaply: once
    # for the N_QUERIES broadcast side, once in the rerank lookup join,
    # where AQE broadcasts the tiny shortlist so the corpus never shuffles.
    prefixes = mrl_prefix_table(spark, sf_dir)
    q = _emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.slice("e", 1, MRL_KEEP_DIMS).alias("qp"),
    )
    coarse_w = W.partitionBy("qid").orderBy(
        F.desc(F.round(cosine_sim(F.col("qp"), F.col("prefix")), 6)),
        F.asc("vec_id"),
    )
    shortlist = (
        F.broadcast(q)
        .join(prefixes, prefixes.vec_id != F.col("qid"))
        .withColumn("crank", F.row_number().over(coarse_w))
        .filter(F.col("crank") <= MRL_SHORTLIST)
        .select("qid", "qe", F.col("vec_id").alias("neighbor_id"))
    )
    neighbors = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne")
    )
    rank_w = W.partitionBy("qid").orderBy(
        F.desc(F.round(cosine_sim(F.col("qe"), F.col("ne")), 6)),
        F.asc("neighbor_id"),
    )
    return (
        shortlist.join(neighbors, "neighbor_id")
        .withColumn("cosine", F.round(cosine_sim(F.col("qe"), F.col("ne")), 6))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# emb_whiten — per-dimension standardization (z = (v - mean_d) / std_d):
# the normalization step before whitening/PCA and the collapsed-dimension
# fix in embedding QA (companion to emb_dim_stats, which is the
# diagnostic half). Two-phase plan with NO per-row shuffle: phase 1 is
# the d-key stats agg (d keys total, scale-free); phase 2 broadcasts the
# d-row stats as ONE packed array row and applies zip_with per vector —
# the corpus is touched map-side only. Sums are rounded to 4 decimals:
# 64-term float sums are associativity-sensitive at the 6th decimal
# across engines.
# --------------------------------------------------------------------------
@query(
    "emb_whiten",
    oracle="""
    WITH vals AS (
      SELECT vec_id, label, u.i - 1 AS dim, (embedding::DOUBLE[])[u.i] AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
    ),
    stats AS (
      SELECT dim, avg(v) AS mu, stddev_pop(v) AS sd FROM vals GROUP BY dim
    )
    SELECT vec_id, label,
           round(max(CASE WHEN vals.dim = 0 THEN (v - mu) / sd END), 6) AS z0,
           round(sum((v - mu) / sd), 4) AS z_sum,
           round(sum((v - mu) * (v - mu) / (sd * sd)), 4) AS z_sq_sum
    FROM vals JOIN stats ON vals.dim = stats.dim
    GROUP BY vec_id, label
    """,
)
def emb_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    stats = (
        emb.select(F.posexplode("e").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd"))
    )
    # pack the d stats rows into ONE broadcastable array row, dim-ordered
    packed = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mu", "sd"))).alias("s")
    )
    z = F.zip_with("e", "s", lambda v, st: (v - st.mu) / st.sd)
    return (
        emb.join(F.broadcast(packed))
        .withColumn("z", z)
        .select(
            "vec_id",
            "label",
            F.round(F.element_at("z", 1), 6).alias("z0"),
            F.round(
                F.aggregate("z", F.lit(0.0), lambda acc, v: acc + v), 4
            ).alias("z_sum"),
            F.round(
                F.aggregate("z", F.lit(0.0), lambda acc, v: acc + v * v), 4
            ).alias("z_sq_sum"),
        )
    )


# --------------------------------------------------------------------------
# emb_cluster_stats — cluster-cohesion QA: for each label (= cluster
# assignment), the centroid-relative cosine statistics of its members.
# The diagnostic behind "is this clustering usable for SemDeDup /
# IVF routing?" — low mean cohesion or a long min-tail marks clusters
# that should be split before bucketed dedup trusts them.
#
# Scale shape: centroids via one (label, dim)-key partial agg (k*d keys,
# corpus reduced map-side), packed per label and broadcast back; the
# member pass is then map-side only + one final k-key agg. The corpus is
# never joined to itself.
# --------------------------------------------------------------------------
@query(
    "emb_cluster_stats",
    oracle="""
    WITH vals AS (
      SELECT vec_id, label, u.i - 1 AS dim, (embedding::DOUBLE[])[u.i] AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
    ),
    cent AS (
      SELECT label, array_agg(c ORDER BY dim) AS cvec
      FROM (SELECT label, dim, avg(v) AS c FROM vals GROUP BY label, dim)
      GROUP BY label
    ),
    scored AS (
      SELECT e.label,
             list_cosine_similarity(e.embedding::DOUBLE[], cent.cvec) AS cos
      FROM embeddings e JOIN cent ON e.label = cent.label
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_members,
           round(avg(cos), 4) AS mean_cohesion,
           round(min(cos), 4) AS min_cohesion,
           round(stddev_pop(cos), 4) AS std_cohesion
    FROM scored GROUP BY label
    """,
)
def emb_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cent = (
        emb.select("label", F.posexplode("e").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label", cosine_sim(F.col("e"), F.col("cvec")).alias("cos")
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(F.avg("cos"), 4).alias("mean_cohesion"),
        F.round(F.min("cos"), 4).alias("min_cohesion"),
        F.round(F.stddev_pop("cos"), 4).alias("std_cohesion"),
    )


# --------------------------------------------------------------------------
# sim_range_search — ε-neighborhood (threshold) search: every corpus
# vector with cosine ≥ SIM_RANGE_TAU of each query. The dedup-mining /
# near-duplicate-candidate primitive (reference capability: the
# similarity surface over embeddings; this is its range form, distinct
# from top-k ranking).
# Scale (100 TB): strictly CHEAPER than top-k — broadcast queries, one
# narrow corpus pass, and the predicate is a pure pipelined filter: no
# window, no shuffle at all; output size is bounded by the threshold,
# not by |corpus|. The same plan at cluster scale is a broadcast
# nested-loop over the scan with zero exchanges.
# --------------------------------------------------------------------------
SIM_RANGE_TAU = 0.2


@query(
    "sim_range_search",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.qid, c.vec_id AS neighbor_id, c.label,
             round(list_cosine_similarity(q.qe, c.embedding::DOUBLE[]), 6) + 0 AS cosine
      FROM q JOIN embeddings c ON c.vec_id <> q.qid
    )
    SELECT qid, neighbor_id, label, cosine
    FROM scored WHERE cosine >= {SIM_RANGE_TAU}
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    return (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= SIM_RANGE_TAU)
    )


# --------------------------------------------------------------------------
# emb_quantize_error — distortion audit of the int8 scalar quantizer
# (the QA metric reported alongside any quantized index build: how much
# cosine/recall headroom the compression costs). Reconstruction
# err_i = v_i − code_i/scale with the exact emb_scalar_quantize codes
# (floor(x+0.5), so both engines agree bit-for-bit on the codes).
# Per-vector MSE is rounded to 9 dp — values are ~1e-5 with summation
# noise ~1e-18, so both engines round identically.
# Scale: same shape as emb_scalar_quantize — posexplode + two
# partial-agg-friendly groupBys keyed by vec_id, no wide shuffle.
# --------------------------------------------------------------------------
@query(
    "emb_quantize_error",
    oracle="""
    WITH prep AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS e,
             127.0 / list_max(list_transform(embedding::DOUBLE[], v -> abs(v)))
               AS scale
      FROM embeddings
    )
    SELECT vec_id,
           round(list_sum(list_transform(e,
                 v -> pow(v - floor(v * scale + 0.5) / scale, 2))) / len(e), 9)
             AS mse
    FROM prep
    """,
)
def emb_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = emb.select("vec_id", F.posexplode("e").alias("dim", "v"))
    amax = dims.groupBy("vec_id").agg(F.max(F.abs("v")).alias("amax"))
    scale = F.lit(127.0) / F.col("amax")
    err = F.col("v") - F.floor(F.col("v") * scale + F.lit(0.5)) / scale
    return (
        dims.join(amax, "vec_id")
        .groupBy("vec_id")
        .agg(F.round(F.avg(err * err), 9).alias("mse"))
    )


# --------------------------------------------------------------------------
# sim_hybrid_rrf_topk — hybrid retrieval: BM25 lexical search + dense
# cosine search fused with reciprocal-rank fusion (the standard RAG
# serving shape; RRF per Cormack et al. 2009). Query set = the first
# N_QUERIES documents (their token sets), corpus = every document;
# the dense side runs over the stored embeddings (id-aligned subset —
# a realistic partially-covered dense index).
#
# Scale shape: the query term set is tiny → broadcast into the corpus
# token stream (one equi-join + one (qid, doc) partial agg — BM25
# never materializes a doc×doc product); df/dl are single partial-agg
# shuffles; the dense side is the brute-force baseline (broadcast
# queries × corpus scan; the IVF/PQ paths are the scale variants);
# fusion full-outer-joins two TOP-K tables (bounded: Q×k rows each).
# Every ranking key is ROUNDED with doc_id tiebreaks, so both engines
# produce identical lists at every stage.
# --------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


@query(
    "sim_hybrid_rrf_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    qterms AS (SELECT DISTINCT doc_id AS qid, term FROM toks
               WHERE doc_id < {N_QUERIES}),
    bm25 AS (
      SELECT q.qid, t.doc_id,
             round(sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * t.tf * ({BM25_K1} + 1.0)
                       / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * dl.dl / s.avgdl))), 6) AS bm25
      FROM qterms q
      JOIN tf t USING (term)
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.doc_id <> q.qid
      GROUP BY q.qid, t.doc_id
    ),
    lex AS (
      SELECT qid, doc_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM bm25 QUALIFY lex_rank <= {TOP_K}
    ),
    dense AS (
      SELECT qid, doc_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, doc_id) AS dense_rank
      FROM (
        SELECT q.vec_id AS qid, c.vec_id AS doc_id,
               round(list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]), 6) + 0
                 AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) QUALIFY dense_rank <= {TOP_K}
    ),
    fused AS (
      SELECT coalesce(l.qid, d.qid) AS qid,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             CAST(l.lex_rank AS INT) AS lex_rank,
             CAST(d.dense_rank AS INT) AS dense_rank,
             round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0)
                   + coalesce(1.0 / ({RRF_K} + d.dense_rank), 0), 6)
               AS rrf_score
      FROM lex l FULL OUTER JOIN dense d
        ON l.qid = d.qid AND l.doc_id = d.doc_id
    )
    SELECT qid, doc_id, lex_rank, dense_rank, rrf_score,
           CAST(fused_rank AS INT) AS fused_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_score DESC, doc_id) AS fused_rank
          FROM fused)
    WHERE fused_rank <= {TOP_K}
    """,
)
def sim_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25 + dense-cosine retrieval with reciprocal-rank
    fusion: per query, the top-k union of both modalities ranked by
    summed reciprocal ranks."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        toks.filter(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("qid"), "term")
        .distinct()
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (
        F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    bm25 = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )
    w_lex = W.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        bm25.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= TOP_K)
        .select("qid", "doc_id", F.col("lex_rank").cast("int").alias("lex_rank"))
    )
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    w_dense = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("doc_id"))
    dense = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
        .withColumn("dense_rank", F.row_number().over(w_dense))
        .filter(F.col("dense_rank") <= TOP_K)
        .select("qid", "doc_id", F.col("dense_rank").cast("int").alias("dense_rank"))
    )
    fused = (
        lex.join(dense, ["qid", "doc_id"], "full_outer")
        .select(
            "qid",
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    w_f = W.partitionBy("qid").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= TOP_K)
        .select(
            "qid",
            "doc_id",
            "lex_rank",
            "dense_rank",
            "rrf_score",
            F.col("fused_rank").cast("int").alias("fused_rank"),
        )
    )


# --------------------------------------------------------------------------
# emb_mrl_recall_curve — Matryoshka serving-dimension analytics: for a
# ladder of prefix dimensions, recall@k of prefix-cosine retrieval vs
# the full-dimension exact top-k. The curve a serving-dim budget
# decision reads (the MRL counterpart of txt_vocab_coverage's Zipf
# ladder), and the measured justification for sim_mrl_rerank_topk's
# coarse-to-fine split.
#
# Scale shape: each rung is the brute-force baseline restricted to the
# first d components (broadcast queries × one corpus scan reading d/64
# of the vector bytes when the prefix table is stored — see
# mrl_prefix_table); the rung outputs are TOP-K tables (Q×k rows), so
# the recall join is bounded. Ladder unions are independent branches.
# Determinism: rounded cosines + vec_id tiebreaks at every rung.
# --------------------------------------------------------------------------
MRL_LADDER = (4, 8, 16, 32, 64)


def _mrl_rung_oracle(d: int) -> str:
    return f"""
      SELECT {d} AS prefix_dim, qid, neighbor_id FROM (
        SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round(list_cosine_similarity(
                   (q.embedding::DOUBLE[])[1:{d}],
                   (c.embedding::DOUBLE[])[1:{d}]), 6) + 0 DESC,
                 c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rank <= {TOP_K}"""


@query(
    "emb_mrl_recall_curve",
    oracle=f"""
    WITH rungs AS ({" UNION ALL ".join(_mrl_rung_oracle(d) for d in MRL_LADDER)}),
    exact AS (SELECT qid, neighbor_id FROM rungs WHERE prefix_dim = {MRL_LADDER[-1]})
    SELECT prefix_dim,
           CAST(count(DISTINCT r.qid) AS BIGINT) AS n_queries,
           round(sum(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / ({N_QUERIES} * {TOP_K}), 6) AS recall_at_k
    FROM rungs r LEFT JOIN exact e
      ON e.qid = r.qid AND e.neighbor_id = r.neighbor_id
    GROUP BY prefix_dim
    """,
)
def emb_mrl_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of prefix-dim cosine retrieval vs the full-dim exact
    top-k, for each rung of the Matryoshka ladder."""
    emb = _emb(spark, sf_dir)
    rungs = None
    for d in MRL_LADDER:
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.slice("e", 1, d).alias("qe")
        )
        w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        rung = (
            F.broadcast(q)
            .crossJoin(emb)
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                F.col("vec_id").alias("neighbor_id"),
                F.round(
                    cosine_sim(F.col("qe"), F.slice("e", 1, d)), 6
                ).alias("cosine"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select(F.lit(d).alias("prefix_dim"), "qid", "neighbor_id")
        )
        rungs = rung if rungs is None else rungs.unionAll(rung)
    # rename BOTH exact columns: rungs and exact share lineage (a
    # self-join), so an un-renamed qid would resolve ambiguously and
    # the post-join qid could be exact's (NULL on misses)
    exact = rungs.filter(F.col("prefix_dim") == MRL_LADDER[-1]).select(
        F.col("qid").alias("e_qid"), F.col("neighbor_id").alias("hit_id")
    )
    return (
        rungs.join(
            exact,
            (F.col("qid") == F.col("e_qid"))
            & (F.col("neighbor_id") == F.col("hit_id")),
            "left",
        )
        .groupBy("prefix_dim")
        .agg(
            F.countDistinct("qid").cast("bigint").alias("n_queries"),
            F.round(
                F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
                / F.lit(float(N_QUERIES * TOP_K)),
                6,
            ).alias("recall_at_k"),
        )
    )


# --------------------------------------------------------------------------
# sim_knn_graph — k-nearest-neighbor GRAPH construction over the corpus
# embeddings: every vector's top-K neighbors by cosine within a BOUNDED
# block. Blocks start as labels; any label over the cap is adaptively
# refined with sign-bit subcells (_KNN_BITS = 2 → 4 → 8 → 16 leading-dim
# signs, the same axis-aligned-hyperplane split dedup_semantic_buckets
# uses), and a cell STILL oversized at the deepest stage — possible
# exactly in near-dup-rich labels, whose members share sign patterns —
# is sharded by a deterministic md5 row-number salt into ⌈n/cap⌉ bounded
# shards. Every vector therefore lands in a block of ≤ cap peers and
# contributes its ranked neighbors to the graph AT ANY BLOCK SIZE —
# nothing is silently dropped (the r7 weak finding; the old form
# excluded oversized labels entirely). ``depth`` (0 = label fit,
# 1..len(_KNN_BITS) = which sign-bit stage fit, _KNN_SALT_DEPTH = salted
# shard) is emitted per row as the refinement census.
#
# Scale shape: per-block work stays ≤ cap² with cap fixed, so the build
# is O(n·cap), never corpus-quadratic; the stats/decision frames are
# cell-level (≤ distinct cells rows, broadcast back by AQE); the salt
# window runs on a narrow (vec_id, deepest-key) projection — vectors
# join back on vec_id after the bucket decision, so the window's sort
# exchange never carries embeddings. The graph is the input artifact for SemDeDup-style
# pruning, graph-based clustering, diversity sampling, and the
# sim_graph_beam_topk serving query below (session-cached under
# 'knn_graph'). The cap is deliberately small so the test SFs exercise
# every refinement stage; production would raise it toward
# MAX_COSINE_BLOCK, which only DEEPENS blocks, never widens the plan.
#
# Ranking discipline: order by ROUNDED cosine (round-to-6 is what both
# engines reproduce bit-identically), neighbor_id tie-break.
# --------------------------------------------------------------------------
KNN_K = 5
KNN_BLOCK_CAP = 100  #: max vectors per kNN block (see scale note above)
#: sign-bit refinement stages within a hot label — GEOMETRIC (each stage
#: quarters the cells) so a just-over-cap label splits into near-cap
#: blocks instead of shattering straight to 2^8 near-singleton cells
#: (measured: an 8-bit first stage left sf0.1's 218-vector labels with
#: ~1.5k graph rows vs ~10k with the 2-bit first stage — neighbor
#: quality, not correctness).
_KNN_BITS = (2, 4, 8, 16)
_KNN_SALT_DEPTH = len(_KNN_BITS) + 1  #: census value for md5-salted shards


def _knn_graph_ctes(
    cap: int = KNN_BLOCK_CAP,
    key_sql: str = "CAST(label AS VARCHAR)",
    prefix: str = "",
    where_sql: str = "",
    k: int = KNN_K,
    src: str = "embeddings",
) -> str:
    """DuckDB CTE chain ending in ``{prefix}knn_graph(vec_id, label,
    depth, rank, neighbor_id, cosine)`` — the oracle twin of
    ``knn_graph_from_assigned(knn_assigned(...))``. ``key_sql`` is the
    coarse block key expression (the label for the block artifact, a
    sign-view code for the serving graph's geometric views); ``prefix``
    namespaces the chain so several instances coexist in one WITH.
    MATERIALIZED throughout: the inner CTEs are each referenced more
    than once downstream and DuckDB inlines plain CTEs exponentially."""
    from deisa_ray_spark.functions.dedup import sem_bits_sql

    p = prefix
    deep = len(_KNN_BITS)
    deepest_bits = _KNN_BITS[-1]
    dk = f"k{deep}"
    # strip lengths off the deepest key, shallowest stage first:
    # coarse key = strip bits+sep, stage i = strip (deepest_bits - bits_i)
    strips = [deepest_bits + 1] + [deepest_bits - b for b in _KNN_BITS]
    win_sums = ",\n             ".join(
        f"sum(n{deep}) OVER (PARTITION BY substr({dk}, 1, length({dk}) - {s})) AS n{d}"
        for d, s in enumerate(strips[:-1])
    )
    bucket_cases = "\n                  ".join(
        f"WHEN n{d} <= {cap} THEN "
        + (f"substr({dk}, 1, length({dk}) - {s})" if s else dk)
        for d, s in enumerate(strips)
    )
    depth_cases = " ".join(f"WHEN n{d} <= {cap} THEN {d}" for d in range(deep + 1))
    return f"""
    {p}r AS MATERIALIZED (
      SELECT vec_id, label, embedding::DOUBLE[] AS e,
             {key_sql} || '|' || {sem_bits_sql(deepest_bits)} AS {dk}
      FROM {src} {where_sql}
    ),
    {p}st AS MATERIALIZED (
      SELECT {dk}, count(*) AS n{deep} FROM {p}r GROUP BY {dk}),
    {p}st2 AS MATERIALIZED (
      SELECT {dk}, n{deep},
             {win_sums}
      FROM {p}st
    ),
    {p}dec AS MATERIALIZED (
      SELECT {dk},
             CASE {bucket_cases}
                  ELSE NULL END AS bucket0,
             CASE {depth_cases} ELSE {_KNN_SALT_DEPTH} END AS depth
      FROM {p}st2
    ),
    {p}assigned AS MATERIALIZED (
      SELECT r.vec_id, r.label, r.e, d.depth,
             COALESCE(d.bucket0,
                      r.{dk} || '#' ||
                      CAST((row_number() OVER (
                              PARTITION BY r.{dk}
                              ORDER BY md5(r.{dk} || '_' ||
                                           CAST(r.vec_id AS VARCHAR)), r.vec_id
                            ) - 1) // {cap} AS VARCHAR)) AS bucket
      FROM {p}r r JOIN {p}dec d USING ({dk})
    ),
    {p}knn_pairs AS (
      SELECT a.vec_id, a.label, a.depth, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.e, b.e), 6) + 0 AS cosine
      FROM {p}assigned a JOIN {p}assigned b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    {p}knn_graph AS MATERIALIZED (
      SELECT vec_id, label, CAST(depth AS INT) AS depth,
             CAST(rank AS INT) AS rank, neighbor_id, cosine
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cosine DESC, neighbor_id) AS rank
            FROM {p}knn_pairs)
      WHERE rank <= {k}
    )"""


def knn_assigned(
    emb: DataFrame, cap: int = KNN_BLOCK_CAP, key: "Column | None" = None
) -> DataFrame:
    """Adaptively-refined bounded-block assignment for the kNN graph:
    ``(vec_id, label, e, nrm, bucket, depth)`` where every bucket holds
    ≤ ``cap`` vectors (salt-depth shards are ≤ cap BY CONSTRUCTION — the
    md5 row-number salt cuts exact cap-sized slices, unlike a mod-hash
    shard whose sizes are only bounded in expectation).

    ``emb`` must carry (vec_id, label, e); ``key`` is the coarse block
    key expression (default: the label — the block-artifact view; the
    serving graph passes a sign-view code instead). Stats shape: ONE
    partial-agg pass builds deepest-cell counts; shallower-depth counts
    are prefix window-SUMs on that cell-level frame (the
    semantic_bucket_assign discipline, dedup.py:571) — coarse and
    sign-prefix keys all strip off the deepest key with FIXED suffix
    lengths, so no per-key width bookkeeping. Norms ride along once per
    vector for the pair stage."""
    from deisa_ray_spark.functions.dedup import _sem_bucket, norm_agg

    if key is None:
        key = F.col("label").cast("string")

    deep = len(_KNN_BITS)
    deepest_bits = _KNN_BITS[-1]
    dk = f"k{deep}"
    strips = [deepest_bits + 1] + [deepest_bits - b for b in _KNN_BITS]

    def prefix(s: int) -> "F.Column":
        return F.expr(f"substring({dk}, 1, length({dk}) - {s})") if s else F.col(dk)

    cells = emb.select(
        "vec_id",
        "label",
        "e",
        F.concat(key, F.lit("|"), _sem_bucket(F.col("e"), deepest_bits)).alias(dk),
    )
    stats = cells.groupBy(dk).agg(F.count(F.lit(1)).alias(f"n{deep}"))
    for d, s in enumerate(strips[:-1]):
        stats = stats.withColumn(f"n{d}", F.sum(f"n{deep}").over(W.partitionBy(prefix(s))))
    bucket0 = F.when(F.col("n0") <= cap, prefix(strips[0]))
    depth = F.when(F.col("n0") <= cap, 0)
    for d, s in enumerate(strips[1:], start=1):
        bucket0 = bucket0.when(F.col(f"n{d}") <= cap, prefix(s))
        depth = depth.when(F.col(f"n{d}") <= cap, d)
    dec = stats.select(
        dk,
        bucket0.otherwise(F.lit(None).cast("string")).alias("bucket0"),
        depth.otherwise(_KNN_SALT_DEPTH).alias("depth"),
    )
    # Salt window on a NARROW (vec_id, deepest-key) projection: the
    # row_number sort exchange must never carry the embedding column —
    # vectors join back on vec_id after the bucket decision.
    #
    # Salt order is keyed on (deepest key, vec_id), NOT vec_id alone: a
    # view-independent salt splits an over-cap group IDENTICALLY in
    # every view (same md5 order), so near-clones stranded in different
    # shards stay strandmates in ALL views and the union graph cannot
    # bridge them — the root of the 64k xl-tier plateau (SIM_TIER_TABLE
    # note). Keying the salt on the view-specific deepest key
    # decorrelates the shard split across views.
    decided = (
        cells.select("vec_id", dk)
        .join(dec, dk)
        .select(
            "vec_id",
            "depth",
            F.coalesce(
                F.col("bucket0"),
                F.concat(
                    F.col(dk),
                    F.lit("#"),
                    F.expr(f"CAST((row_number() OVER (PARTITION BY {dk} "
                           f"ORDER BY md5({dk} || '_' || CAST(vec_id AS STRING)), "
                           f"vec_id) - 1) "
                           f"DIV {cap} AS STRING)"),
                ),
            ).alias("bucket"),
        )
    )
    return cells.select("vec_id", "label", "e").join(decided, "vec_id").select(
        "vec_id",
        "label",
        "e",
        norm_agg(F.col("e")).alias("nrm"),
        "bucket",
        "depth",
    )


def knn_graph_from_assigned(assigned: DataFrame, k: int = KNN_K) -> DataFrame:
    """Bounded-block kNN edges over an assignment frame
    (``vec_id, label, e, nrm, bucket, depth``) — the pair+rank stage
    shared by the session-cached artifact and the refinement tests.

    Each ≤ ``KNN_BLOCK_CAP`` bucket scores as ONE numpy gram matmul +
    top-k in the ``applyInPandas`` tensor slot (r13; the
    ``dedup_embedding_cosine`` kernel discipline — guide §4: a pairwise
    hot path must not run B² interpreted ``zip_with``/``aggregate``
    lambda chains). vs the previous bucket self-join + HOF dot + window
    rank: one exchange (group-by-bucket) instead of three (join both
    sides + window), no B²-row join materialization, and ~20× less
    per-pair CPU. Values are identical: same round-to-6 before ranking,
    same (cosine DESC, neighbor_id ASC) tie rule via a stable argsort
    over the id-sorted block — every tier build and the declared
    sim_knn_graph hash-match their unchanged oracles."""
    import numpy as np
    import pandas as pd

    from deisa_ray_spark.functions.dedup import _np_round_half_away

    types = {f.name: f.dataType.simpleString() for f in assigned.schema.fields}
    out_schema = (
        f"vec_id {types['vec_id']}, label {types['label']}, "
        f"depth {types['depth']}, rank int, "
        f"neighbor_id {types['vec_id']}, cosine double"
    )
    empty = {
        "vec_id": [], "label": [], "depth": [], "rank": [],
        "neighbor_id": [], "cosine": [],
    }

    def block_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(empty)
        # id-sorted block: stable argsort then breaks cosine ties in
        # ascending neighbor_id order — the engine/oracle rank rule
        pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        v = np.stack(pdf["e"].to_numpy()).astype(np.float64, copy=False)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        if not nrm.all():
            # parity with the cosine kernels: a zero-norm vector has no
            # cosine — fail loudly instead of silently ranking NaNs
            bad = ids[nrm == 0.0]
            raise ValueError(
                f"zero-norm embedding(s) in kNN block: vec_id {bad[:5].tolist()}"
            )
        g = v @ v.T
        g /= nrm[:, None] * nrm[None, :]
        g = _np_round_half_away(g, 6)  # round BEFORE ranking (oracle rule)
        np.fill_diagonal(g, -np.inf)  # never self; kk < n keeps it out
        kk = min(k, n - 1)
        order = np.argsort(-g, axis=1, kind="stable")[:, :kk]
        return pd.DataFrame(
            {
                "vec_id": np.repeat(ids, kk),
                "label": np.repeat(pdf["label"].to_numpy(), kk),
                "depth": np.repeat(pdf["depth"].to_numpy(), kk),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), n),
                "neighbor_id": ids[order].ravel(),
                "cosine": np.take_along_axis(g, order, axis=1).ravel(),
            }
        )

    return assigned.select("vec_id", "label", "e", "nrm", "bucket", "depth").groupBy(
        "bucket"
    ).applyInPandas(block_topk, schema=out_schema)


def knn_assigned_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached bounded-block assignment — the shared vector store
    (id, e, nrm) + block key consumed by the graph build AND by
    sim_graph_beam_topk (entry points + re-scoring joins)."""
    from deisa_ray_spark.functions.dedup import _session_cached

    return _session_cached(
        spark, "knn_assign", sf_dir, lambda: knn_assigned(_emb(spark, sf_dir)), eager=True
    )


def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-cached kNN-graph ARTIFACT: ``(vec_id, label, depth,
    rank, neighbor_id, cosine)`` — consumed by the declared query and by
    sim_graph_beam_topk's serving search."""
    from deisa_ray_spark.functions.dedup import _session_cached

    def build() -> DataFrame:
        return knn_graph_from_assigned(knn_assigned_cached(spark, sf_dir))

    return _session_cached(spark, "knn_graph", sf_dir, build, eager=True)


@query(
    "sim_knn_graph",
    oracle=f"""
    WITH {_knn_graph_ctes()}
    SELECT vec_id, label, depth, rank, neighbor_id, cosine FROM knn_graph
    """,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_graph(spark, sf_dir)


# --------------------------------------------------------------------------
# sim_graph_beam_topk — graph-based ANN SERVING over the kNN-graph
# artifact: the HNSW/NSG-family search shape. The SERVING edge set is
# the union of (a) the sim_knn_graph block artifact's edges and (b)
# GEO_VIEWS geometric sign-view kNN edge sets — each view keys the same
# adaptive bounded-block machinery on a 6-bit sign code over a DIFFERENT
# dim range, so the union graph has both within-cluster links and
# cross-space geometric links (label blocks alone cap recall hard here:
# only ~14% of true top-10 neighbors share the query's label) — then
# symmetrized (undirected, the HNSW convention). Entry selection is
# HIERARCHICAL (r9): a deterministic md5-threshold 1/16 sample of the
# corpus carries its own bounded-block kNN graph (the HNSW upper layer);
# queries score one node per UPPER bucket (n_blocks/16 of the old flat
# one-per-base-block scan), beam UPPER_R hops over the upper graph, and
# the base-layer beam is seeded from everything the upper search
# visited. Then BEAM_R rounds of expansion walk the base edges,
# re-scoring only newly-reached nodes, keeping a BEAM_B-wide frontier by
# exact cosine; the answer is the top-K of everything visited.
# Deterministic end to end — fixed entry set, fixed rounds,
# rounded-cosine + node-id tie-breaks — so the whole search is exactly
# SQL-expressible (unrolled hops, the PageRank/BPE round pattern) and
# carries a FULL exact oracle, not just a recall contract.
#
# Measured recall@10 vs sim_bruteforce_topk (the dial): B=8/R=3 on
# block-only directed edges 0.16 at sf0.1; +geo views undirected
# B=16/R=3 → 0.66; B=32/R=4 flat entries k=5 → 0.90 sf0.1 (r8 shipped).
# r9's hierarchical entries alone dropped that to 0.82 (seeds no longer
# touch every cell); the fix was edge RICHNESS, not more hops: serving
# graphs at SERVE_K=16 (HNSW's M regime) reach 1.000 at sf0.1 with
# upper(R=1,B=16) + base(R=3,B=32) — one FEWER total hop than r8's flat
# config, 4.0× fewer entry scores per query, and recall 1.000 at all
# three SFs (tools/beam_recall.py; warm 4.1 s vs flat 3.65 s at sf0.1 —
# the toy-SF cost is fixed job count; the entry-scan term the hierarchy
# removes is the one that grows with corpus size).
#
# MEASURED LIMIT at the 10x point (tools/beam_recall.py on the
# generated sf1, 20k vectors): recall@10 = 0.64 with this config — the
# fixed (SERVE_K, BEAM_B, BEAM_R) budget under-covers as the corpus
# grows, the expected HNSW-family trade (their answer: ef/M grow with
# n). A self-cell multi-probe seed (every co-member of the query's own
# bucket under all four views) was implemented, exact-oracled green,
# and MEASURED WORSE: 0.50 at sf1 — high-cosine same-cell seeds crowd
# the BEAM_B frontier and kill exploration diversity, and same-cell
# nodes were already reachable via their own kNN edges. So the binding
# constraint at 10x is edge richness / hop budget, not local coverage;
# the scale path is corpus-sized (SERVE_K, B) growth — a serving-time
# knob in a real store, exposed here via graph_beam_topk(serve_k,
# beam_b, beam_r, ...) while the DECLARED query keeps the compile-time
# defaults (the unrolled SQL twin needs literal widths). Measured tier
# sweep at sf1 (tools/beam_recall.py SPARK_GRAFT_BEAM_SCALED=1 /
# graph_beam_topk directly): (16,32,R3) 0.64 -> (32,64,R3) 0.78 ->
# (32,64,R4) 0.80 -> (32,96,R4) 0.82 -> (48,96,R3) 0.90 — out-link
# budget dominates (HNSW's M-grows-with-n), hops add little once edges
# are rich. Per-query work stays bounded (same structure, larger
# constants); the build stays O(n·cap). The defaults are NOT raised:
# that would triple every toy-SF bench cost for data the toy SFs don't
# need. Instead the (48, 96, R3) point is DECLARED as its own
# oracle-pinned query, sim_graph_beam_topk_scaled (r10) — see the
# SCALED_SERVE_K note below.
#
# Scale shape: graph + views + assignment are session-cached artifacts
# (build is O(n·cap) per view — bounded blocks, never corpus-quadratic);
# serving touches ONLY (qid, node) frames of ≤ entries + R·B·degree rows
# per query plus equi-joins back to the vector store for scoring — no
# corpus scan after the artifacts exist. That is the point of graph
# serving at 100 TB: the corpus-sized work happened once at build time.
# --------------------------------------------------------------------------
BEAM_R = 3  #: base-layer expansion hops
BEAM_B = 32  #: base-layer beam width (frontier kept per query per hop)
#: edges kept per node in the SERVING graphs (block view + geo views +
#: upper layer). The k=5 block ARTIFACT (sim_knn_graph) is unchanged —
#: but retrieving top-10 by walking a graph whose nodes only keep 5
#: out-links starves the frontier (HNSW keeps M=16-48 for the same
#: reason): measured recall@10 at sf0.1 with hierarchical entries is
#: 0.82 at k=5, 0.90 at k=10, 1.000 at k=16 — and k=16 holds 1.000 with
#: a hop REMOVED from each layer (upper R=1, base R=3).
SERVE_K = 16
GEO_VIEWS = 3  #: geometric sign-view edge sets in the serving graph
GEO_BITS = 6  #: sign bits per view code; view v covers dims [6v+1, 6v+6]
#: HNSW-style upper entry layer: a deterministic md5-threshold sample of
#: the corpus (1/16 — vec_ids whose md5 hex starts with UPPER_HEX) gets
#: its OWN bounded-block kNN graph; queries beam over that small layer
#: first and the base-layer beam is seeded from its survivors. This
#: replaces the flat one-entry-per-block scan (O(n_blocks) scored per
#: query — at 10^10 vectors / cap 10k that was 10^6 entry scores) with
#: O(n_blocks/16) upper entries + a fixed UPPER_R×UPPER_B×degree
#: expansion. No RNG anywhere: the sample is an md5 threshold, so the
#: whole two-layer search stays exactly SQL-expressible.
UPPER_HEX = "0"  #: sample = md5(vec_id) first hex digit == this (1/16)
UPPER_R = 1  #: upper-layer expansion hops
UPPER_B = 16  #: upper-layer beam width


def _geo_code(e: Column, view: int) -> Column:
    """View ``view``'s sign code (JVM-side int → string key).

    PRECONDITION: ``size(e) >= GEO_VIEWS * GEO_BITS`` — on a shorter
    vector element_at-past-end yields NULL here while the SQL twin's
    ``embedding[i]`` treats the missing dim as a 0-bit (the trap
    dedup.py's sem-bucket notes document), so regenerated testdata with
    a narrower embedding raises at scan time instead of silently
    diverging. Sign convention is ``>= 0`` to match the sem-bucket
    family (_sem_bucket / sem_bits_sql)."""
    code = F.lit(0)
    for i in range(GEO_BITS):
        code = code + (F.element_at(e, view * GEO_BITS + i + 1) >= 0).cast("int") * (1 << i)
    return F.when(F.size(e) >= GEO_VIEWS * GEO_BITS, code.cast("string")).otherwise(
        F.raise_error(
            F.lit(f"geo sign views require >= {GEO_VIEWS * GEO_BITS}-dim vectors")
        )
    )


def _geo_code_sql(view: int, col: str = "embedding") -> str:
    return "CAST(" + " + ".join(
        f"(CASE WHEN {col}[{view * GEO_BITS + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(GEO_BITS)
    ) + " AS VARCHAR)"


# --------------------------------------------------------------------------
# CLONE VIEWS (r12) — the construction fix for the near-clone-island
# failure class the honest-jitter re-measurement exposed (SIM_TIER_TABLE
# note): flat sign views whose bit-width is CORPUS-SIZED so cells stay
# under KNN_BLOCK_CAP *without* adaptive refinement or id-salting — the
# two mechanisms that scatter near-identical vectors (each extra sign
# bit flips with ~0.1 probability under a ±0.06 perturbation, and the
# salt is random by design). A 10-bit view co-cells a near-clone pair
# with p ≈ 0.9^10 ≈ 0.35; six views over DISJOINT dims give
# 1 - 0.65^6 ≈ 0.93 per pair, and the clone FAMILY (internally linked
# by the same mechanism) plus one NN-descent merge round raises the
# per-query reach to measured 1.000 at the 64k point where every
# width/hop/sample knob plateaued at 0.68 (the r12 miss audit: all 16
# missed neighbors were the query's own replicas, stranded in
# unreachable islands). Declared via sim_graph_beam_topk_xl.
# --------------------------------------------------------------------------
CLONE_VIEWS = 6  #: flat sign views in the xl tier (disjoint dims)
CLONE_BITS = 10  #: bits per clone view; cells ~ n / 2^bits — sized so
#: cells stay under KNN_BLOCK_CAP through the declared xl band (≤ 100k);
#: a larger band re-sizes this (and re-measures) like any tier constant.


def _clone_code(e: Column, view: int, bits: int = CLONE_BITS) -> Column:
    """Clone view ``view``'s flat sign code over dims
    [view*bits+1 .. view*bits+bits] (disjoint across views)."""
    need = (view + 1) * bits  # this view's deepest dim
    code = F.lit(0)
    for i in range(bits):
        code = code + (F.element_at(e, view * bits + i + 1) >= 0).cast("int") * (1 << i)
    return F.when(F.size(e) >= need, code.cast("string")).otherwise(
        F.raise_error(F.lit(f"clone sign views require >= {need}-dim vectors"))
    )


def _clone_code_sql(view: int, bits: int = CLONE_BITS, col: str = "embedding") -> str:
    return "CAST(" + " + ".join(
        f"(CASE WHEN {col}[{view * bits + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    ) + " AS VARCHAR)"


# --------------------------------------------------------------------------
# Serving-graph edge caching (r13). A graph-ANN SERVING layer must not
# rebuild its index inside every query: the kNN/merge construction is
# an INDEX BUILD — paid once per (corpus, tier constants) — while a
# query is entry scoring plus a bounded beam walk over STORED edges.
# Within one process every tier's edge set is therefore built ONCE and
# held persisted (``_session_cached``), shared across the whole family
# (base/scaled/merged/xl/mrr reuse each other's assignments and edges).
# Deliberately NOT a cross-run disk artifact: a fingerprint-keyed cache
# surviving the process would amortize work the bench is supposed to
# measure (every bench/oracle invocation must compute from the parquet
# inputs) and would poison cross-core-count comparisons. In production
# the maintained state layout (streaming/servegraph.py) is the durable
# store; these declared queries state the build+serve semantics
# end-to-end, and their DuckDB twins build from scratch the same way.
# --------------------------------------------------------------------------


def _graph_artifact_cached(spark: SparkSession, tag: str, sf_dir: str, build) -> DataFrame:
    """Session-cached, eagerly-materialized edge frame. ``tag`` must
    encode every tier constant the edges depend on (k, sample width,
    clone views) so distinct tiers never collide.

    The built frame is ``localCheckpoint``-ed, not merely persisted:
    the serving walk references the edge set in EVERY hop job, and a
    plain persist leaves the full build DAG (17 unioned view builds +
    the NN-descent merge for the xl tier) in the logical plan — each
    hop's action then re-analyzes that whole tree before hitting the
    cache barrier (measured 1.8 s → 7.4 s warm on the merged tier when
    the r13 rework briefly dropped lineage truncation). Checkpointing
    collapses the cached plan to a LogicalRDD scan, which is what the
    cross-process artifact read used to provide — without any state
    surviving the process."""
    from deisa_ray_spark.functions.dedup import _session_cached

    def build_truncated() -> DataFrame:
        return build().localCheckpoint(eager=True)

    return _session_cached(spark, tag, sf_dir, build_truncated, eager=True)


def clone_edges(
    spark: SparkSession,
    sf_dir: str,
    serve_k: int = SERVE_K,
    n_views: int = CLONE_VIEWS,
    bits: int = CLONE_BITS,
) -> DataFrame:
    """Session-cached undirected clone-view edge set — the same bounded
    -block kNN machinery as the geo views, keyed on the flat
    corpus-sized sign codes."""
    from deisa_ray_spark.functions.dedup import _session_cached

    def build() -> DataFrame:
        emb = _emb(spark, sf_dir)
        directed = None
        for v in range(n_views):
            assigned = _session_cached(
                spark,
                f"clone_assign_v{v}b{bits}",
                sf_dir,
                (lambda vv: lambda: knn_assigned(
                    emb, key=_clone_code(F.col("e"), vv, bits)
                ))(v),
                eager=True,
            )
            g = knn_graph_from_assigned(assigned, k=serve_k).select(
                F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
            )
            directed = g if directed is None else directed.unionByName(g)
        return directed.unionByName(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    return _graph_artifact_cached(
        spark, f"clone_edges_k{serve_k}_v{n_views}b{bits}", sf_dir, build
    )


def serve_edges(
    spark: SparkSession, sf_dir: str, serve_k: int = SERVE_K
) -> DataFrame:
    """Session-cached undirected serving edge set ``(src, dst)``: the
    block-artifact kNN edges ∪ per-view geometric kNN edges, symmetrized
    and deduped. Each view reuses knn_assigned/knn_graph_from_assigned
    with the view code as the coarse key — same bounded-block guarantees
    at any corpus size. ``serve_k`` is the per-node out-link budget —
    the production knob that must GROW with corpus size (HNSW's M; see
    the 10x measurement note above); the declared query uses the
    compile-time default so its unrolled SQL twin stays literal."""
    from deisa_ray_spark.functions.dedup import _session_cached

    def build() -> DataFrame:
        # Assignments are k-INDEPENDENT (bucket refinement never looks
        # at the out-link budget), so every tier shares the cached
        # block + per-view assignments and re-runs only pair+rank —
        # the default and scaled tiers coexisting in one session (the
        # bench) pay the assignment exchanges once, not per tier.
        emb = _emb(spark, sf_dir)
        geo_assigned = [
            _session_cached(
                spark,
                f"geo_assign_v{v}",
                sf_dir,
                (lambda vv: lambda: knn_assigned(
                    emb, key=_geo_code(F.col("e"), vv)
                ))(v),
                eager=True,
            )
            for v in range(GEO_VIEWS)
        ]
        return serve_edges_from(
            emb,
            serve_k=serve_k,
            block_assigned=knn_assigned_cached(spark, sf_dir),
            geo_assigned=geo_assigned,
        )

    tag = "serve_edges" if serve_k == SERVE_K else f"serve_edges_k{serve_k}"
    return _graph_artifact_cached(spark, tag, sf_dir, build)


def serve_edges_from(
    emb: DataFrame,
    serve_k: int = SERVE_K,
    block_assigned: "DataFrame | None" = None,
    geo_assigned: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Build the undirected serving edge set from an arbitrary vector
    frame ``(vec_id, label, e)`` — the single-source builder behind
    :func:`serve_edges`, also used by the incremental serve-graph
    upsert tests to state the full-rebuild equivalence over a
    keep-latest member set. ``block_assigned`` / ``geo_assigned``
    supply pre-computed (k-independent) assignments — the session
    caches; default assigns fresh. serve_k out-links per node per view
    (richer than the k=5 block artifact — see the SERVE_K note)."""
    directed = knn_graph_from_assigned(
        block_assigned if block_assigned is not None else knn_assigned(emb),
        k=serve_k,
    ).select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
    for v in range(GEO_VIEWS):
        assigned = (
            geo_assigned[v]
            if geo_assigned is not None
            else knn_assigned(emb, key=_geo_code(F.col("e"), v))
        )
        view_graph = knn_graph_from_assigned(assigned, k=serve_k)
        directed = directed.unionByName(
            view_graph.select(
                F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
            )
        )
    return directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _upper_sample(idcol: Column) -> Column:
    """Deterministic 1/16 corpus sample for the upper entry layer."""
    return F.substring(F.md5(idcol.cast("string")), 1, 1) == UPPER_HEX


_UPPER_WHERE = f"WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '{UPPER_HEX}'"


def upper_assigned_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached bounded-block assignment of the md5-sampled UPPER
    layer — entry points come from its buckets, its kNN graph is the
    upper serving graph."""
    from deisa_ray_spark.functions.dedup import _session_cached

    return _session_cached(
        spark,
        "upper_assign",
        sf_dir,
        lambda: knn_assigned(_emb(spark, sf_dir).filter(_upper_sample(F.col("vec_id")))),
        eager=True,
    )


def upper_edges(
    spark: SparkSession, sf_dir: str, serve_k: int = SERVE_K
) -> DataFrame:
    """Session-cached undirected upper-layer edge set ``(src, dst)`` —
    the same bounded-block kNN machinery over the 1/16 sample,
    symmetrized like the base serving graph."""
    from deisa_ray_spark.functions.dedup import _session_cached

    def build() -> DataFrame:
        return upper_edges_from(
            None, serve_k=serve_k,
            assigned=upper_assigned_cached(spark, sf_dir),
        )

    tag = "upper_edges" if serve_k == SERVE_K else f"upper_edges_k{serve_k}"
    return _graph_artifact_cached(spark, tag, sf_dir, build)


def upper_edges_from(
    emb_sampled: "DataFrame | None",
    serve_k: int = SERVE_K,
    assigned: "DataFrame | None" = None,
) -> DataFrame:
    """Upper-layer edges from an (already md5-sampled) vector frame —
    the single-source builder behind :func:`upper_edges`; the upsert
    tests pass the keep-latest sampled member set."""
    directed = knn_graph_from_assigned(
        assigned if assigned is not None else knn_assigned(emb_sampled),
        k=serve_k,
    ).select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
    return directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _upper_ctes(serve_k: int = SERVE_K, src: str = "embeddings") -> str:
    """Oracle twin of the upper layer: a prefixed bounded-block chain
    over the md5-sampled rows, symmetrized edges, per-bucket entries."""
    return _knn_graph_ctes(
        prefix="u_", where_sql=_UPPER_WHERE, k=serve_k, src=src
    ) + """,
    u_directed AS (SELECT vec_id AS src, neighbor_id AS dst FROM u_knn_graph),
    u_edges AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM u_directed
        UNION ALL SELECT dst AS src, src AS dst FROM u_directed
      )
    ),
    u_entries AS MATERIALIZED (
      SELECT bucket, min(vec_id) AS node FROM u_assigned GROUP BY bucket
    )"""


def _serve_edges_ctes(
    serve_k: int = SERVE_K, src: str = "embeddings", clone_views: int = 0
) -> str:
    """Oracle twin of serve_edges: the block chain + one prefixed chain
    per geometric view (+ one per flat clone view when the tier uses
    them), unioned directed edges, symmetrized+deduped."""
    chains = [_knn_graph_ctes(k=serve_k, src=src)]
    edge_selects = ["SELECT vec_id AS src, neighbor_id AS dst FROM knn_graph"]
    for v in range(GEO_VIEWS):
        chains.append(
            _knn_graph_ctes(
                key_sql=_geo_code_sql(v), prefix=f"g{v}_", k=serve_k, src=src
            )
        )
        edge_selects.append(
            f"SELECT vec_id AS src, neighbor_id AS dst FROM g{v}_knn_graph"
        )
    for v in range(clone_views):
        chains.append(
            _knn_graph_ctes(
                key_sql=_clone_code_sql(v), prefix=f"c{v}_", k=serve_k, src=src
            )
        )
        edge_selects.append(
            f"SELECT vec_id AS src, neighbor_id AS dst FROM c{v}_knn_graph"
        )
    directed = " UNION ALL ".join(edge_selects)
    return ",".join(chains) + f""",
    directed AS MATERIALIZED ({directed}),
    serve_edges AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM directed
        UNION ALL SELECT dst AS src, src AS dst FROM directed
      )
    )"""


def _beam_round_sql(pfx: str, r: int, vprev: str, edges: str, width: int) -> str:
    """One unrolled beam hop (either layer): top-``width`` frontier of
    ``vprev`` → expand over ``edges`` → score fresh nodes → merged
    visited set ``{pfx}v{r}``."""
    return f"""
    {pfx}b{r - 1} AS MATERIALIZED (
      SELECT qid, node FROM (
        SELECT qid, node, row_number() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, node) AS rn FROM {vprev}
      ) WHERE rn <= {width}
    ),
    {pfx}c{r} AS MATERIALIZED (
      SELECT DISTINCT b.qid, g.dst AS node
      FROM {pfx}b{r - 1} b JOIN {edges} g ON g.src = b.node
      WHERE g.dst <> b.qid
    ),
    {pfx}v{r} AS MATERIALIZED (
      SELECT qid, node, max(cosine) AS cosine FROM (
        SELECT * FROM {vprev}
        UNION ALL
        SELECT c.qid, c.node,
               round(list_cosine_similarity(q.qe, re.e), 6) + 0 AS cosine
        FROM {pfx}c{r} c JOIN bq q USING (qid) JOIN r re ON re.vec_id = c.node
      ) GROUP BY qid, node
    )"""


def _beam_oracle_sql(
    serve_k: int = SERVE_K,
    beam_b: int = BEAM_B,
    beam_r: int = BEAM_R,
    upper_b: int = UPPER_B,
    upper_r: int = UPPER_R,
) -> str:
    rounds = [
        _beam_round_sql("u", r, f"uv{r - 1}", "u_edges", upper_b)
        for r in range(1, upper_r + 1)
    ] + [
        _beam_round_sql("", r, f"uv{upper_r}" if r == 1 else f"v{r - 1}",
                        "serve_edges", beam_b)
        for r in range(1, beam_r + 1)
    ]
    return f"""
    WITH {_serve_edges_ctes(serve_k)},
    {_upper_ctes(serve_k)},
    bq AS MATERIALIZED (
      SELECT vec_id AS qid, e AS qe FROM r WHERE vec_id < {N_QUERIES}
    ),
    uv0 AS MATERIALIZED (
      SELECT q.qid, en.node,
             round(list_cosine_similarity(q.qe, re.e), 6) + 0 AS cosine
      FROM bq q CROSS JOIN u_entries en JOIN r re ON re.vec_id = en.node
      WHERE en.node <> q.qid
    ),{",".join(rounds)}
    SELECT qid, CAST(rank AS INT) AS rank, node AS neighbor_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, node) AS rank FROM v{BEAM_R})
    WHERE rank <= {TOP_K}
    """


MERGE_SAMPLE_S = 8  #: NN-descent sample width (neighbors whose lists merge)


def _merged_edges_ctes(serve_k: int = SERVE_K, sample_s: int = MERGE_SAMPLE_S) -> str:
    """Oracle twin of merged_serve_edges: deterministic S-sample of each
    node's union-graph out-edges (md5 order), 2-hop candidates + the
    original edges, exact re-score, per-node top-``serve_k``,
    symmetrized. Composes after ``_serve_edges_ctes`` (needs
    ``serve_edges`` and the unprefixed vector rows ``r``)."""
    return f"""
    m_hop1 AS MATERIALIZED (
      SELECT src, dst AS mid FROM (
        SELECT src, dst, row_number() OVER (PARTITION BY src
                 ORDER BY md5(CAST(src AS VARCHAR) || '_' ||
                              CAST(dst AS VARCHAR)), dst) AS rn
        FROM serve_edges
      ) WHERE rn <= {sample_s}
    ),
    m_cand AS MATERIALIZED (
      SELECT DISTINCT src, cand FROM (
        SELECT h.src, e.dst AS cand
        FROM m_hop1 h JOIN serve_edges e ON e.src = h.mid
        UNION ALL
        SELECT src, dst AS cand FROM serve_edges
      ) WHERE src <> cand
    ),
    m_scored AS MATERIALIZED (
      SELECT c.src, c.cand,
             round(list_cosine_similarity(a.e, b.e), 6) + 0 AS cosine
      FROM m_cand c JOIN r a ON a.vec_id = c.src JOIN r b ON b.vec_id = c.cand
    ),
    m_directed AS MATERIALIZED (
      SELECT src, cand AS dst FROM (
        SELECT src, cand, row_number() OVER (PARTITION BY src
                 ORDER BY cosine DESC, cand) AS rk
        FROM m_scored
      ) WHERE rk <= {serve_k}
    ),
    m_edges AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM m_directed
        UNION ALL SELECT dst AS src, src AS dst FROM m_directed
      )
    )"""


def _beam_merged_oracle_sql(
    serve_k: int = SERVE_K,
    beam_b: int = BEAM_B,
    beam_r: int = BEAM_R,
    upper_b: int = UPPER_B,
    upper_r: int = UPPER_R,
    sample_s: int = MERGE_SAMPLE_S,
    clone_views: int = 0,
) -> str:
    """The beam oracle over NN-descent-MERGED base edges (m_edges),
    optionally with the flat clone views unioned into the pre-merge
    graph (the xl tier)."""
    rounds = [
        _beam_round_sql("u", r, f"uv{r - 1}", "u_edges", upper_b)
        for r in range(1, upper_r + 1)
    ] + [
        _beam_round_sql("", r, f"uv{upper_r}" if r == 1 else f"v{r - 1}",
                        "m_edges", beam_b)
        for r in range(1, beam_r + 1)
    ]
    return f"""
    WITH {_serve_edges_ctes(serve_k, clone_views=clone_views)},
    {_merged_edges_ctes(serve_k, sample_s)},
    {_upper_ctes(serve_k)},
    bq AS MATERIALIZED (
      SELECT vec_id AS qid, e AS qe FROM r WHERE vec_id < {N_QUERIES}
    ),
    uv0 AS MATERIALIZED (
      SELECT q.qid, en.node,
             round(list_cosine_similarity(q.qe, re.e), 6) + 0 AS cosine
      FROM bq q CROSS JOIN u_entries en JOIN r re ON re.vec_id = en.node
      WHERE en.node <> q.qid
    ),{",".join(rounds)}
    SELECT qid, CAST(rank AS INT) AS rank, node AS neighbor_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, node) AS rank FROM v{beam_r})
    WHERE rank <= {TOP_K}
    """


#: Corpus-SCALED serving tier (the declared 10x contract). The default
#: (SERVE_K=16, B=32, R=3) config is right-sized for the toy SFs but
#: measured recall@10 = 0.64 on the generated sf1 (20k vectors) — the
#: HNSW ef/M-grows-with-n trade. The r9 sf1 sweep (module note above)
#: found out-link budget dominates: (48, 96, R3) recovers >= 0.90 with
#: the SAME hop structure, so the scaled tier is literal wider
#: constants, not a different algorithm — and therefore carries the
#: same fully-unrolled exact SQL twin, just with wider widths. Declared
#: as its own query (sim_graph_beam_topk_scaled) rather than raised
#: defaults: the toy-SF panel doesn't need 3x the edge budget, and a
#: user picks the tier by corpus size the way they'd pick HNSW M/ef.
SCALED_SERVE_K = 48
SCALED_BEAM_B = 96


def _beam_expand(
    v: DataFrame,
    edges: DataFrame,
    rounds: int,
    width: int,
    score,
    checkpoint: bool = True,
) -> DataFrame:
    """Run ``rounds`` beam hops over ``edges`` starting from visited set
    ``v`` (qid, node, cosine): top-``width`` frontier → expand → score
    only freshly-reached nodes → merged visited set. Shared by the upper
    entry layer and the base layer — identical semantics, different
    (edges, rounds, width). ``checkpoint=False`` skips the per-hop
    localCheckpoint — measured WORSE for the upper layer (9.3 s vs
    5.6 s warm at sf0.1): each hop references ``v`` twice, so an
    un-checkpointed layer re-executes the whole prior plan at every
    reference and the doubling dwarfs the saved eager jobs. Kept as a
    knob; both layers ship checkpointed."""
    from deisa_ray_spark.functions.dedup import free_local_checkpoint

    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("node"))
    for _ in range(rounds):
        beam = (
            v.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= width)
            .select("qid", "node")
        )
        cand = (
            beam.join(edges, beam.node == edges.src)
            .select("qid", F.col("dst").alias("node"))
            .filter(F.col("node") != F.col("qid"))
            .distinct()
        )
        # Score only FRESHLY-reached nodes (r13): the visited set is
        # unique per (qid, node) by induction — uv0 is a distinct
        # queries × entries cross, and every later round unions a
        # disjoint (anti-joined), distinct fresh set — so visited ∪
        # fresh needs NO re-aggregation. The previous union +
        # groupBy(max) shape re-scored every visited node each hop and
        # paid one extra full-visited-set exchange per hop; scores are
        # deterministic, so the surviving values are identical.
        # localCheckpoint: v is referenced three times next round
        # (beam + anti-join + union), so an untruncated plan would
        # re-execute the whole prior chain per reference; the
        # superseded hop's checkpoint blocks are freed explicitly (they
        # are otherwise held until driver GC, × 3 bench builds per
        # query).
        fresh = cand.join(v.select("qid", "node"), ["qid", "node"], "left_anti")
        nxt = v.unionByName(score(fresh))
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
            # hop 0's v is a lazy plan over the persisted store (no
            # LogicalRDD leaves) — free_local_checkpoint no-ops there.
            free_local_checkpoint(v)
        v = nxt
    return v


#: per-session cache of the collected query matrix (appId, sf_dir) →
#: (Q[nq×d], QN[nq], vec_id→row index). N_QUERIES rows by contract — a
#: bounded driver collect, same class as the block-entry seeds.
_QMAT_CACHE: dict = {}


def _query_matrix(spark: SparkSession, sf_dir: str, store: DataFrame) -> tuple:
    key = (spark.sparkContext.applicationId, str(sf_dir))
    got = _QMAT_CACHE.get(key)
    if got is None:
        import numpy as np

        rows = (
            store.filter(F.col("vec_id") < N_QUERIES)
            .select("vec_id", "e", "nrm")
            .collect()
        )
        rows.sort(key=lambda r: r["vec_id"])
        Q = np.array([list(r["e"]) for r in rows], dtype=np.float64)
        QN = np.array([r["nrm"] for r in rows], dtype=np.float64)
        qidx = {int(r["vec_id"]): i for i, r in enumerate(rows)}
        got = (Q, QN, qidx)
        _QMAT_CACHE[key] = got
    return got


def _cosine_vs_queries(Q, QN, qidx):
    """Arrow-vectorized exact-cosine slot for beam scoring: candidate
    batches arrive as (qid, candidate vector, candidate norm); the
    bounded query matrix (N_QUERIES × d — always the small side, shipped
    in the task closure like a broadcast dimension) turns each batch
    into one row-indexed matmul. Replaces the per-row
    ``zip_with``+``aggregate`` fold whose interpreted lambda chain was
    the measured warm-serve burn (r12 VERDICT: the tier family cost
    46 s of the 101 s sf0.1 panel — the same 20-40× HOF lesson as the
    r12 cosine kernels). ``_np_round_half_away(…, 6)`` matches
    Spark/DuckDB ROUND ties, and both engines round before ranking, so
    values hash-match the unchanged SQL twins."""
    import numpy as np

    from deisa_ray_spark.functions.dedup import _np_round_half_away

    @F.pandas_udf("double")
    def cos(qid: pd.Series, ne: pd.Series, nn: pd.Series) -> pd.Series:
        if not len(qid):
            return pd.Series(np.array([], dtype=np.float64))
        ii = np.array([qidx[int(v)] for v in qid], dtype=np.int64)
        E = np.stack(ne.to_numpy())
        d = np.einsum("ij,ij->i", E, Q[ii])
        return pd.Series(_np_round_half_away(d / (QN[ii] * nn.to_numpy()), 6))

    return cos


@F.pandas_udf(DoubleType())  # DataType instance: no session needed at import
def _pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow pair-dot slot: one vectorized row-wise einsum per Arrow
    batch of (vector, vector) pairs — the FALLBACK merge scorer for
    vector stores past :data:`MERGE_MATRIX_CAP` (the primary path
    ships only id pairs — see :func:`_merge_topk_vs_store`). Replaces
    the per-pair interpreted ``zip_with`` + ``aggregate`` fold (guide
    §4 — the r12 20× HOF lesson); callers keep norms precomputed per
    vector and the round-to-6 JVM-side, so ranked values are unchanged
    against the oracle twins."""
    import numpy as np

    if not len(a):
        return pd.Series(np.array([], dtype=np.float64))
    return pd.Series(
        np.einsum("ij,ij->i", np.stack(a.to_numpy()), np.stack(b.to_numpy()))
    )


#: vector-store rows above which the merge scorer falls back from the
#: broadcast-matrix id-pair path to the join+pair-dot path. The
#: declared tiers are BANDED — xl's measured ceiling is 64k vectors
#: (SCALING.md; past-band corpora take the recipe, not this code
#: path) — so 2x that band bounds the broadcast at ~64 MB
#: (131072 x 64 float64), far under the executor broadcast budget.
MERGE_MATRIX_CAP = 131072


def _merge_topk_vs_store(spark: SparkSession, vectors: DataFrame, serve_k: int):
    """Grouped broadcast-matrix top-k scorer for the NN-descent merge,
    or ``None`` when ``vectors`` exceeds :data:`MERGE_MATRIX_CAP`.

    The merge's candidate stream is n·S·k ID PAIRS; joining both
    vectors onto every pair shipped ~1 KB per candidate through the
    join shuffle and again through Arrow (measured at the sf1 10x
    point: 44.2M candidate pairs for the xl tier — tens of GB moved to
    score 16-byte id pairs; the 161→270 s xl regression this replaced).
    Instead the band-bounded vector store is collected ONCE (bounded by
    construction: ``limit(cap+1)``), broadcast, and each src's
    candidate GROUP scores as one matrix-vector product with the
    top-``serve_k`` taken INSIDE the kernel — the knn block kernel's
    discipline (round-to-6 BEFORE ranking, cosine DESC / candidate ASC
    ties via a stable argsort over the id-sorted group), so the
    selected edge set is identical to the former
    score-all-pairs-then-window shape while emitting n·k rows instead
    of n·S·k scored rows (no 44M-row window exchange, and the Arrow
    stream returns k ids per group instead of a double per pair).
    Zero-norm vectors raise loudly, same as every other r13 kernel."""
    import numpy as np

    rows = (
        vectors.select("vec_id", "e", "nrm").limit(MERGE_MATRIX_CAP + 1).collect()
    )
    if len(rows) > MERGE_MATRIX_CAP:
        return None
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    E = (
        np.array([list(r["e"]) for r in rows], dtype=np.float64)
        if rows
        else np.zeros((0, 1), dtype=np.float64)
    )
    N = np.array([r["nrm"] for r in rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((ids, E, N))

    from deisa_ray_spark.functions.dedup import _np_round_half_away

    def score_topk(cands: DataFrame) -> DataFrame:
        types = {f.name: f.dataType.simpleString() for f in cands.schema.fields}
        out_schema = f"src {types['src']}, dst {types['cand']}"

        def group_topk(pdf: pd.DataFrame) -> pd.DataFrame:
            ids_, E_, N_ = bc.value
            s = int(pdf["src"].iloc[0])
            c = np.sort(pdf["cand"].to_numpy(np.int64))
            isrc = int(np.searchsorted(ids_, s))
            ib = np.searchsorted(ids_, c)
            # the caller semi-joins both sides onto the store's ids, so
            # a miss here is a code bug, not a data condition
            if (
                isrc >= len(ids_)
                or ids_[isrc] != s
                or ib.max(initial=-1) >= len(ids_)
                or not (np.take(ids_, ib, mode="clip") == c).all()
            ):
                raise ValueError("merge pair id missing from the vector store")
            nn = N_[ib] * N_[isrc]
            if not nn.all():
                raise ValueError(
                    f"zero-norm embedding in merge group of src {s}"
                )
            cos = _np_round_half_away(E_[ib] @ E_[isrc] / nn, 6)
            kk = min(serve_k, len(c))
            order = np.argsort(-cos, kind="stable")[:kk]
            return pd.DataFrame({"src": np.full(kk, s), "dst": c[order]})

        return cands.groupBy("src").applyInPandas(group_topk, schema=out_schema)

    return score_topk


def graph_beam_topk(
    spark: SparkSession,
    sf_dir: str,
    serve_k: int = SERVE_K,
    beam_b: int = BEAM_B,
    beam_r: int = BEAM_R,
    upper_b: int = UPPER_B,
    upper_r: int = UPPER_R,
    merge_round: bool = False,
    merge_sample_s: int = MERGE_SAMPLE_S,
    clone_views: int = 0,
) -> DataFrame:
    """The serving search with the production knobs exposed: per-node
    out-link budget, beam widths, hop counts. The declared query runs
    the compile-time defaults (its unrolled SQL twin needs literals);
    tools/beam_recall.py measures corpus-scaled tiers through this
    entry (the 10x answer — see the module note above).
    ``merge_round`` swaps in the cross-view NN-descent-merged base
    edges (merged_serve_edges — the sim_graph_beam_topk_merged tier)."""
    edges = serve_edges(spark, sf_dir, serve_k)
    if merge_round:
        # session-cached + persisted inside merged_serve_edges — no
        # per-call localCheckpoint to leak (r12, ADVICE fix)
        edges = merged_serve_edges(
            spark, sf_dir, serve_k, sample_s=merge_sample_s, clone_views=clone_views
        )
    elif clone_views:
        edges = edges.unionByName(
            clone_edges(spark, sf_dir, serve_k, n_views=clone_views)
        ).distinct()
    uedges = upper_edges(spark, sf_dir, serve_k)
    store = knn_assigned_cached(spark, sf_dir)  # (vec_id, e, nrm, bucket, ...)
    q = store.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    # Entry points: one node per UPPER-layer bucket (n_blocks/16 of the
    # base count) instead of one per base block — the hierarchical fix
    # for the flat O(n_blocks) per-query entry scan.
    entries = (
        upper_assigned_cached(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.min("vec_id").alias("node"))
        .select("node")
    )
    re_ = store.select(
        F.col("vec_id").alias("node"), F.col("e").alias("ne"), F.col("nrm").alias("nn")
    )
    cos_udf = _cosine_vs_queries(*_query_matrix(spark, sf_dir, store))

    def score(cand: DataFrame) -> DataFrame:
        """Exact rounded cosine for (qid, node) candidate rows — the
        only place vectors are touched; everything else is id-frames.
        One equi-join attaches the candidate vector (broadcast of the
        store at toy SFs, shuffle hash join at scale); the dot against
        the bounded query matrix runs in the Arrow slot."""
        return cand.join(re_, "node").select(
            "qid",
            "node",
            cos_udf(F.col("qid"), F.col("ne"), F.col("nn")).alias("cosine"),
        )

    # Entry scoring is TIER-INDEPENDENT (entries come from the upper
    # assignment, scores are exact cosines) — session-cached so the
    # default and scaled tiers share one materialization per session.
    from deisa_ray_spark.functions.dedup import _session_cached

    uv = _session_cached(
        spark,
        "beam_uv0",
        sf_dir,
        lambda: score(
            q.select("qid")
            .crossJoin(F.broadcast(entries))
            .filter(F.col("node") != F.col("qid"))
        ),
        eager=True,
    )
    # Upper beam over the sampled layer, then the base beam seeded from
    # EVERYTHING the upper search visited (their exact cosines carry
    # over — the base hop-1 frontier selection prunes to BEAM_B anyway).
    uv = _beam_expand(uv, uedges, upper_r, upper_b, score)
    v = _beam_expand(uv, edges, beam_r, beam_b, score)
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("node"))
    return (
        v.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "rank", F.col("node").alias("neighbor_id"), "cosine")
    )


def merged_serve_edges(
    spark: SparkSession,
    sf_dir: str,
    serve_k: int = SERVE_K,
    sample_s: int = MERGE_SAMPLE_S,
    clone_views: int = 0,
) -> DataFrame:
    """One CROSS-VIEW NN-descent merge round over the union serving
    graph — the construction-side fix for the xl-tier plateau
    (SIM_TIER_TABLE note): per-view edges are bucket-closed, so a
    2-hop walk within ONE view can never bridge the salt-shard islands
    that strand a query's near-clones — but the UNION graph's 2-hop
    pairs cross views (a→b in a geo view, b→c in the label view), and
    scoring those neighbor-of-neighbor candidates exactly then
    re-top-k'ing repairs exactly the missed-clone class the 64k audit
    found. Cost: n·S·k candidate scorings (sampled NN-descent, S=8) —
    one bounded round, no all-pairs stage.

    DECLARED via ``sim_graph_beam_topk_merged`` (exact SQL twin in
    ``_merged_edges_ctes``); measured 0.90/0.98 recall@10 at 64k for the
    scaled/xl constants vs 0.72/0.84 unmerged
    (tools/ann_tier_recall.py, SPARK_GRAFT_ANN_MERGE=1). Session-cached
    (the bench builds each query 3x; one materialization per session —
    also why no caller-managed localCheckpoint exists anymore). The
    streaming maintainer keeps this layer INCREMENTALLY too (r12):
    ``IncrementalServeGraph(..., merged=True)`` recomputes exactly the
    affected sources per batch through the same
    :func:`merged_directed_from` builder — one source of truth, no
    drift (equivalence declared via ``stream_serve_graph_merged``).
    """
    from deisa_ray_spark.functions.dedup import _session_cached

    def build() -> DataFrame:
        edges = serve_edges(spark, sf_dir, serve_k)  # undirected (src, dst)
        if clone_views:
            edges = edges.unionByName(
                clone_edges(spark, sf_dir, serve_k, n_views=clone_views)
            ).distinct()
        store = knn_assigned_cached(spark, sf_dir)
        directed = merged_directed_from(
            edges,
            store.select("vec_id", "e", "nrm"),
            serve_k=serve_k,
            sample_s=sample_s,
        )
        return directed.unionByName(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    tag = (
        "merged_serve_edges"
        if (serve_k, sample_s, clone_views) == (SERVE_K, MERGE_SAMPLE_S, 0)
        else f"merged_serve_edges_k{serve_k}_s{sample_s}_c{clone_views}"
    )
    return _graph_artifact_cached(spark, tag, sf_dir, build)


def merged_directed_from(
    und_edges: DataFrame,
    vectors: DataFrame,
    serve_k: int = SERVE_K,
    sample_s: int = MERGE_SAMPLE_S,
    srcs: "DataFrame | None" = None,
) -> DataFrame:
    """DIRECTED per-source merged top-``serve_k`` — the single-source
    NN-descent-merge builder behind :func:`merged_serve_edges` (batch)
    and the streaming maintainer's per-batch recompute (which passes
    ``srcs`` = the affected sources). ``und_edges`` (src, dst) must
    contain EVERY undirected edge of each source in ``srcs`` and of
    each of their sampled mids (extra edges of other nodes are
    harmless); ``vectors`` (vec_id, e, nrm) must cover every id that
    appears (pairs touching an uncovered id are dropped, as the
    original inner joins did). With ``srcs=None`` computes all sources.
    Candidate scoring (the merge's dominant n·S·k term) ships ONLY the
    id pair per candidate and takes each source's top-``serve_k``
    INSIDE the broadcast-store kernel (:func:`_merge_topk_vs_store` —
    guide §2.2: at sf1 the xl tier generates 44.2M candidate pairs;
    joining 2x64 doubles onto each moved tens of GB to compute
    16-byte-keyed dots, and windowing the scored pairs shuffled all
    44.2M rows again), falling back to the vector-join +
    :func:`_pair_dot` + window shape past the band cap."""
    base = und_edges if srcs is None else und_edges.join(srcs, "src", "semi")
    # deterministic S-sample of each node's out-edges (md5 order — no
    # cosine needed for candidate GENERATION, only for the final rank)
    ws = W.partitionBy("src").orderBy(
        F.md5(F.concat_ws("_", F.col("src"), F.col("dst"))), F.col("dst")
    )
    hop1 = (
        base.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= sample_s)
        .select("src", F.col("dst").alias("mid"))
    )
    hop2 = (
        hop1.join(
            und_edges.select(F.col("src").alias("mid"), F.col("dst").alias("cand")),
            "mid",
        )
        .select("src", "cand")
        .filter(F.col("src") != F.col("cand"))
    )
    cands = hop2.unionByName(
        base.select("src", F.col("dst").alias("cand"))
    ).distinct()
    scorer = _merge_topk_vs_store(und_edges.sparkSession, vectors, serve_k)
    if scorer is not None:
        # primary path: pairs stay two longs wide; the two id semi-joins
        # reproduce the former inner joins' drop-uncovered-id semantics
        # (vec_id is unique in the store, so semi == inner here); the
        # kernel ranks round-to-6 cosines and emits each src's top-k
        # directly, so no scored-pair window shuffle exists in the plan
        vid = vectors.select("vec_id")
        return scorer(
            cands.join(vid.withColumnRenamed("vec_id", "src"), "src", "semi")
            .join(vid.withColumnRenamed("vec_id", "cand"), "cand", "semi")
        )
    va = vectors.select(
        F.col("vec_id").alias("src"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    vb = vectors.select(
        F.col("vec_id").alias("cand"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = cands.join(va, "src").join(vb, "cand").select(
        "src",
        "cand",
        F.round(
            _pair_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), F.asc("cand"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= serve_k)
        .select("src", F.col("cand").alias("dst"))
    )


@query("sim_graph_beam_topk", oracle=_beam_oracle_sql())
def sim_graph_beam_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph_beam_topk(spark, sf_dir)


@query(
    "sim_graph_beam_topk_scaled",
    oracle=_beam_oracle_sql(serve_k=SCALED_SERVE_K, beam_b=SCALED_BEAM_B),
)
def sim_graph_beam_topk_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scaled serving tier as a DECLARED, oracle-pinned
    contract: same two-layer beam search, literal (SERVE_K=48, B=96,
    R=3) constants — measured recall@10 >= 0.90 at the 10x (sf1) point
    where the default tier drops to 0.64 (tools/beam_recall.py;
    SCALED_* note above). Serving work per query stays bounded — the
    same structure with larger constants; the artifact build stays
    O(n·cap) per view."""
    return graph_beam_topk(
        spark, sf_dir, serve_k=SCALED_SERVE_K, beam_b=SCALED_BEAM_B
    )


@query(
    "sim_graph_beam_topk_merged",
    oracle=_beam_merged_oracle_sql(
        serve_k=SCALED_SERVE_K, beam_b=SCALED_BEAM_B
    ),
)
def sim_graph_beam_topk_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scaled serving tier over NN-DESCENT-MERGED base edges: one
    cross-view neighbor-of-neighbor merge round (sampled, S=8) repairs
    the refinement-cell islands no beam width can reach. Measured
    0.960 recall@10 at the honest (Gaussian) 20k point
    (tools/beam_recall.py on the generated sf1). Build cost adds one
    bounded n·S·k scoring round; serving work per query is unchanged.
    At clone-dense 64k (hashed-jitter replication) this tier measures
    0.68 — the near-clone-island class the XL tier's clone views fix
    (sim_graph_beam_topk_xl below)."""
    return graph_beam_topk(
        spark, sf_dir,
        serve_k=SCALED_SERVE_K, beam_b=SCALED_BEAM_B, merge_round=True,
    )


XL_SERVE_K = 96
XL_BEAM_B = 192


@query(
    "sim_graph_beam_topk_xl",
    oracle=_beam_merged_oracle_sql(
        serve_k=XL_SERVE_K, beam_b=XL_BEAM_B, clone_views=CLONE_VIEWS
    ),
)
def sim_graph_beam_topk_xl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XL serving tier (r12): merge round PLUS the corpus-sized
    flat CLONE VIEWS (see the CLONE_VIEWS note) — the construction fix
    for the near-clone-island failure class that the honest-jitter
    re-measurement exposed. The r11 xl numbers (0.98 at 64k) were
    inflated by a structured (LCG) replication jitter — ADVICE r11
    flagged it; under a real hash the same constants measure 0.68 and
    NO width/hop/sample knob moves them (every missed neighbor is a
    stranded replica of the query — the r12 miss audit). Six 10-bit
    flat sign views link near-clones directly (cells under the block
    cap without refinement or salting), and the merge round propagates
    the islands: measured recall@10 = 1.000 at the hashed-jitter 64k
    point. Exact unrolled SQL twin (clone-view chains included)."""
    return graph_beam_topk(
        spark, sf_dir,
        serve_k=XL_SERVE_K, beam_b=XL_BEAM_B,
        merge_round=True, clone_views=CLONE_VIEWS,
    )


# --------------------------------------------------------------------------
# sim_tier_table — the corpus-size -> serving-tier selection rule AS
# DATA: declared tiers, each row carrying the (SERVE_K, BEAM_B, BEAM_R,
# merge, clone_views) constants AND the recall@10 MEASURED at that
# row's own scale point (tools/beam_recall.py at sf0.1 and the Gaussian
# generated sf1; tools/ann_tier_recall.py at the hashed-jitter
# replicated 64k/200k points). A user picks the row whose n_max covers
# their corpus, the way they'd pick HNSW M/ef from a sizing table.
#
# The measured story behind the rows (r12 revision — every replicated
# point RE-MEASURED under a real hash jitter after ADVICE r11 flagged
# the LCG replication jitter as structured; the r11 64k rows were
# inflated by it, 0.90/0.98 -> honest 0.68):
#   1. width alone PLATEAUS: at honest 64k, (96,192,R3/R4), (128,256,
#      R3/R4) and sample widths S=8/16 ALL measure exactly 0.680 —
#      k, B, R, S are immaterial, a connectivity limit, not budget.
#   2. the r12 miss audit: every missed neighbor is the query's OWN
#      near-clone replica — clone families form internally-linked
#      islands no edge chain reaches, because adaptive refinement
#      (sign bits flip with ~0.1 probability under a small
#      perturbation) and id-salting both scatter near-identical
#      vectors across cells.
#   3. the fix is construction, not search: corpus-sized flat CLONE
#      VIEWS (CLONE_VIEWS note above) link clones directly, and the
#      cross-view NN-descent merge round propagates the islands —
#      0.68 -> measured 1.000 at the same 64k point.
# The 20k scaled+merge row is measured on the GAUSSIAN generated sf1
# (no replication, no jitter bias) and stands. Rows past the last
# measured point are a recipe, not a promise.
# --------------------------------------------------------------------------
SIM_TIER_TABLE = [
    # (tier, n_max, serve_k, beam_b, beam_r, merge, clone_views,
    #  recall_at_10, measured_n) — recall is measured AT THE BAND EDGE
    # under the hashed-jitter replication (the hardest declared
    # condition: clone-dense). Interior points measure higher: default
    # is 1.000 on the un-replicated 2k corpus; scaled+merge is 0.960 on
    # the Gaussian 20k sf1.
    ("default", 4_000, SERVE_K, BEAM_B, BEAM_R, 0, 0, 0.940, 4_000),
    ("scaled+merge", 30_000, SCALED_SERVE_K, SCALED_BEAM_B, BEAM_R, 1, 0,
     1.000, 30_000),
    ("xl+clones+merge", 64_000, XL_SERVE_K, XL_BEAM_B, BEAM_R, 1,
     CLONE_VIEWS, 1.000, 64_000),
]
# Band edges == measured points for ALL rows (the r11 rule, strict).
# 64k is the largest point this sandbox sustains: the 100k/200k sweeps
# died spilling the merge round's bounded-but-large n·S·deg candidate
# shuffle (~45 GB at 100k) to the single local disk — a one-disk limit,
# not a plan defect (the shuffle distributes on a cluster). Corpora past
# 64k take the xl row as a recipe with that caveat; growing the band is
# a measurement task (bigger scratch disk), not new engineering.


def select_tier(n: int) -> tuple:
    """The tier-selection rule: smallest declared tier whose ``n_max``
    covers the corpus; corpora past the largest band get the largest
    tier (with its measured-recall caveat — see the module note)."""
    for row in SIM_TIER_TABLE:
        if n <= row[1]:
            return row
    return SIM_TIER_TABLE[-1]


_TIER_ORACLE = " UNION ALL ".join(
    f"SELECT '{t}' AS tier, CAST({nmax} AS BIGINT) AS n_max, "
    f"CAST({k} AS INT) AS serve_k, CAST({b} AS INT) AS beam_b, "
    f"CAST({r} AS INT) AS beam_r, CAST({mg} AS INT) AS merge, "
    f"CAST({cv} AS INT) AS clone_views, "
    f"CAST({rec} AS DOUBLE) AS recall_at_10, "
    f"CAST({mn} AS BIGINT) AS measured_n"
    for t, nmax, k, b, r, mg, cv, rec, mn in SIM_TIER_TABLE
)


@query("sim_tier_table", oracle=_TIER_ORACLE)
def sim_tier_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving-tier contract as a queryable table (literal rows —
    the oracle IS the contract; drift between the constants here and the
    tier queries above is pinned by tests/test_similarity_tiers.py)."""
    return spark.createDataFrame(
        SIM_TIER_TABLE,
        "tier string, n_max bigint, serve_k int, beam_b int, beam_r int, "
        "merge int, clone_views int, recall_at_10 double, measured_n bigint",
    )


# --------------------------------------------------------------------------
# sim_binary_hamming_topk — binary-quantized ANN: each vector is packed
# into ONE bit per dimension (sign test), candidates are shortlisted by
# Hamming distance over the packed codes, and only the shortlist is
# re-ranked with exact cosine. This is the memory-floor scale path
# (64 B/vector → 8 B/vector here; 32× at production dims) modern vector
# stores ship alongside PQ — and unlike IVF/PQ it needs NO training, so
# the whole pipeline is exactly SQL-expressible and this query carries a
# full exact oracle (not just a recall contract).
#
# Layout: bits are packed into two NON-NEGATIVE 32-bit halves (lo =
# dims 1-32, hi = dims 33-64) instead of one 64-bit word — the 64th bit
# would land on the bigint sign bit, whose literal (1<<63) overflows and
# whose negative-value arithmetic differs subtly across engines; two
# positive halves sidestep the whole class. hamming = bit_count(lo⊕lo')
# + bit_count(hi⊕hi') — pure integer ops, bit-identical everywhere.
#
# Scale shape: the Hamming scan shuffles ONLY (qid, neighbor_id, 2×int)
# rows — the vectors never ride the candidate shuffle; full embeddings
# are joined back (equi-join on vec_id) for the bounded per-query
# shortlist re-rank alone. Queries are a broadcast set, ranking is the
# WindowGroupLimit top-k.
# --------------------------------------------------------------------------
BQ_DIM = 64  #: embedding width the bit-packing unrolls over (synthetic table)
BQ_SHORTLIST = 200  #: Hamming survivors re-ranked exactly per query —
#: the recall dial (64 packed bits rank coarsely, so the re-rank budget
#: does the precision work): 50 measured 0.38 recall@10 vs brute force
#: at sf0.1, 100 → 0.60, 200 → 0.82, 400 → 0.92. Still a bounded
#: per-query shortlist at any corpus size.


def _bq_halves(e: Column, thresh: float = 0.0) -> "tuple[Column, Column]":
    """Pack the ``> thresh`` bits of a BQ_DIM-wide vector into two bigint
    halves (thresh=0 → sign bits; ±t → the thermometer planes below).

    PRECONDITION: ``size(e) == BQ_DIM``. On a shorter array element_at
    returns NULL, the ``> thresh`` test silently falls to the 0 branch,
    and the packed code would be wrong with no error — so the lo half is
    guarded: any row whose vector is not exactly BQ_DIM wide raises at
    scan time instead of producing a silent wrong code (pinned by
    tests/test_binary_quant.py::test_bq_halves_rejects_short_vector)."""
    lo = sum(
        [
            F.when(F.element_at(e, j + 1) > thresh, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(32)
        ],
        F.lit(0),
    ).cast("bigint")
    lo = F.when(F.size(e) == BQ_DIM, lo).otherwise(
        F.raise_error(F.lit(f"binary quantization requires exactly {BQ_DIM}-dim vectors"))
    )
    hi = sum(
        [
            F.when(F.element_at(e, j + 1) > thresh, F.lit(1 << (j - 32))).otherwise(F.lit(0))
            for j in range(32, BQ_DIM)
        ],
        F.lit(0),
    ).cast("bigint")
    return lo, hi


def _bq_halves_sql(thresh: float = 0.0) -> "tuple[str, str]":
    lo = " + ".join(
        f"CASE WHEN embedding[{j + 1}] > {thresh} THEN {1 << j} ELSE 0 END"
        for j in range(32)
    )
    hi = " + ".join(
        f"CASE WHEN embedding[{j + 1}] > {thresh} THEN {1 << (j - 32)} ELSE 0 END"
        for j in range(32, BQ_DIM)
    )
    return lo, hi


_BQ_LO_SQL, _BQ_HI_SQL = _bq_halves_sql()


@query(
    "sim_binary_hamming_topk",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             CAST({_BQ_LO_SQL} AS BIGINT) AS lo,
             CAST({_BQ_HI_SQL} AS BIGINT) AS hi
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, e AS qe, lo AS qlo, hi AS qhi
          FROM s WHERE vec_id < {N_QUERIES}),
    h AS (
      -- per-term CAST: DuckDB's bit_count returns a 1-BYTE int and the
      -- bare sum overflows at 129 (two 64-bit planes max out at 128)
      SELECT q.qid, s.vec_id AS neighbor_id,
             CAST(CAST(bit_count(xor(q.qlo, s.lo)) AS INT)
                  + CAST(bit_count(xor(q.qhi, s.hi)) AS INT) AS INT) AS hamming
      FROM q JOIN s ON s.vec_id <> q.qid
    ),
    short AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY hamming, neighbor_id) AS hrk
      FROM h
    ),
    rr AS (
      SELECT t.qid, t.neighbor_id, t.hamming,
             round(list_cosine_similarity(q.qe, s.e), 6) + 0 AS cosine
      FROM short t JOIN q ON q.qid = t.qid JOIN s ON s.vec_id = t.neighbor_id
      WHERE t.hrk <= {BQ_SHORTLIST}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM rr
    )
    SELECT qid, neighbor_id, hamming, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def sim_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    lo, hi = _bq_halves(F.col("e"))
    sigs = emb.select("vec_id", lo.alias("lo"), hi.alias("hi"))
    q_sig = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    hamming = (
        F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
        + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
    ).cast("int")
    h = (
        F.broadcast(q_sig)
        .crossJoin(sigs)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), hamming.alias("hamming"))
    )
    wh = W.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    short = h.withColumn("hrk", F.row_number().over(wh)).filter(
        F.col("hrk") <= BQ_SHORTLIST
    )
    qe = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    rr = (
        short.join(emb.select(F.col("vec_id").alias("neighbor_id"), "e"), "neighbor_id")
        .join(F.broadcast(qe), "qid")
        .select(
            "qid",
            "neighbor_id",
            "hamming",
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "hamming", "cosine", F.col("rank").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------
# sim_thermo_hamming_topk — THERMOMETER-coded 3-bit-per-dim quantized
# ANN: each dimension is coded by three monotone threshold bits
# (x > -t, x > 0, x > +t), so the Hamming distance between two codes is
# EXACTLY the L1 distance of the 4-level quantized values (each
# threshold a value crosses flips exactly one bit) — the standard
# multi-bit upgrade of sign-bit binary quantization, still training-free
# (t is a fixed design constant, not learned), so the whole pipeline
# keeps a FULL exact oracle. 24 B/vector vs 8 B for 1-bit; candidates
# still shuffle only (qid, id, 6×int).
#
# Recall@10 vs brute force at shortlist 200 (the dial, measured):
# 1-bit sign 0.82 at sf0.1; thermometer t=0.03 → 0.84, t=0.05 → 0.90
# (shipped), t=0.08 → 0.88; across SFs at t=0.05: 0.98 / 1.00 / 0.90.
# t sits near half the mean |component| (0.10) — the classic 4-level
# quantizer spacing; it is a CODE constant like COSINE_THRESHOLD, fixed
# at design time, so no training pass exists to leak into the oracle.
# --------------------------------------------------------------------------
BQ2_T = 0.05  #: thermometer threshold (see dial above)

_BQ2_SQL = {
    name: _bq_halves_sql(t)
    for name, t in (("a", BQ2_T), ("z", 0.0), ("b", -BQ2_T))
}
_BQ2_CODE_SQL = ",\n             ".join(
    f"CAST({sql} AS BIGINT) AS {name}{half}"
    for name, sqls in _BQ2_SQL.items()
    for half, sql in zip(("lo", "hi"), sqls)
)
_BQ2_HAM_SQL = " + ".join(
    f"CAST(bit_count(xor(q.q{name}{half}, s.{name}{half})) AS INT)"
    for name in ("a", "z", "b")
    for half in ("lo", "hi")
)


@query(
    "sim_thermo_hamming_topk",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_BQ2_CODE_SQL}
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, e AS qe,
                 alo AS qalo, ahi AS qahi, zlo AS qzlo, zhi AS qzhi,
                 blo AS qblo, bhi AS qbhi
          FROM s WHERE vec_id < {N_QUERIES}),
    h AS (
      SELECT q.qid, s.vec_id AS neighbor_id,
             CAST({_BQ2_HAM_SQL} AS INT) AS hamming
      FROM q JOIN s ON s.vec_id <> q.qid
    ),
    short AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY hamming, neighbor_id) AS hrk
      FROM h
    ),
    rr AS (
      SELECT t.qid, t.neighbor_id, t.hamming,
             round(list_cosine_similarity(q.qe, s.e), 6) + 0 AS cosine
      FROM short t JOIN q ON q.qid = t.qid JOIN s ON s.vec_id = t.neighbor_id
      WHERE t.hrk <= {BQ_SHORTLIST}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM rr
    )
    SELECT qid, neighbor_id, hamming, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def sim_thermo_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cols = []
    for name, t in (("a", BQ2_T), ("z", 0.0), ("b", -BQ2_T)):
        lo, hi = _bq_halves(F.col("e"), t)
        cols += [lo.alias(f"{name}lo"), hi.alias(f"{name}hi")]
    sigs = emb.select("vec_id", *cols)
    plane_cols = [f"{n}{h}" for n in ("a", "z", "b") for h in ("lo", "hi")]
    q_sig = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        *[F.col(c).alias(f"q{c}") for c in plane_cols],
    )
    hamming = sum(
        [
            F.bit_count(F.col(f"q{c}").bitwiseXOR(F.col(c))).cast("int")
            for c in plane_cols
        ],
        F.lit(0),
    ).cast("int")
    h = (
        F.broadcast(q_sig)
        .crossJoin(sigs)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), hamming.alias("hamming"))
    )
    wh = W.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    short = h.withColumn("hrk", F.row_number().over(wh)).filter(
        F.col("hrk") <= BQ_SHORTLIST
    )
    qe = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    rr = (
        short.join(emb.select(F.col("vec_id").alias("neighbor_id"), "e"), "neighbor_id")
        .join(F.broadcast(qe), "qid")
        .select(
            "qid",
            "neighbor_id",
            "hamming",
            F.round(cosine_sim(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "hamming", "cosine", F.col("rank").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------
# emb_outlier_scores — the ACTION half of emb_cluster_stats' diagnostic:
# the corpus vectors least cosine-similar to their OWN cluster centroid,
# i.e. the mislabeled/noise candidates an embedding-space QA pass prunes
# (or re-clusters) before bucketed semantic dedup trusts the labels.
# cluster_stats says WHICH clusters have a long min-tail; this lists the
# vectors that form it.
#
# Scale shape (same as cluster_stats): centroids via one (label, dim)
# partial agg (k·d keys), packed per label and broadcast back; scoring
# is map-side only; the global bottom-K is one TakeOrdered — no window,
# no wide shuffle. Determinism: cosine rounded to 6, doubly tie-broken
# by vec_id.
# --------------------------------------------------------------------------
OUTLIER_K = 20  #: prune-candidate list size


@query(
    "emb_outlier_scores",
    oracle=f"""
    WITH vals AS (
      SELECT vec_id, label, u.i - 1 AS dim, (embedding::DOUBLE[])[u.i] AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
    ),
    cent AS (
      SELECT label, array_agg(c ORDER BY dim) AS cvec
      FROM (SELECT label, dim, avg(v) AS c FROM vals GROUP BY label, dim)
      GROUP BY label
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], cent.cvec), 6) + 0
             AS cos_centroid
    FROM embeddings e JOIN cent USING (label)
    ORDER BY cos_centroid, e.vec_id
    LIMIT {OUTLIER_K}
    """,
)
def emb_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cent = (
        emb.select("label", F.posexplode("e").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
    )
    return (
        emb.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.round(cosine_sim(F.col("e"), F.col("cvec")), 6).alias("cos_centroid"),
        )
        .orderBy(F.asc("cos_centroid"), F.asc("vec_id"))
        .limit(OUTLIER_K)
    )


# --------------------------------------------------------------------------
# emb_kmeans_exact — Lloyd k-means as a DECLARED, exactly-oracled
# trainer, in integer fixed point end to end: coordinates quantized once
# (floor(v·1e6 + 0.5) — the emb_scalar_quantize half-up discipline, so
# both engines agree bit-for-bit), squared-L2 distances are exact
# bigints, centroid updates are floor-means of integer sums, assignment
# argmin tie-breaks by cluster id. The PageRank/BPE/Unigram round
# structure applied to clustering: KM_ROUNDS unrolled Lloyd rounds, each
# one narrow (vec_id, cluster, dist) agg + one argmin window + one
# (cluster, dim) re-estimation agg, localCheckpoint-ed per round. The
# MLlib path (sim_kmeans_ivf_topk) remains the scale trainer under a
# recall contract; THIS is the exact-semantics twin a correctness gate
# can hash.
#
# Scale shape: per round the exploded (vec, dim) stream joins the
# BROADCAST K·d centroid table and partial-aggs to (vec, cluster) — the
# canonical distributed-Lloyd shuffle, O(n·d·K) compute, no pairwise
# vec×vec stage; re-estimation is one (cluster, dim) keyed agg (K·d
# keys). Seeds = the K lowest vec_ids (deterministic).
# Overflow bounds: |v_fp| ≤ ~2e6 ⇒ per-pair d2 ≤ 64·(4e6)² ≈ 1e15;
# per-cluster inertia sums stay inside int64 up to ~1e4 members per
# cluster per checksum group at this dimensionality — the declared
# output therefore emits the floor-MEAN inertia (bigint→double→floor is
# the identical IEEE path in both engines), not the raw sum.
# --------------------------------------------------------------------------
KM_K = 8  #: clusters (seeded from the K lowest vec_ids)
KM_ROUNDS = 3  #: unrolled Lloyd rounds
KM_FP = 1_000_000  #: fixed-point coordinate scale


def _kmeans_oracle() -> str:
    parts = [f"""
    kmvals AS MATERIALIZED (
      SELECT vec_id, u.i - 1 AS dim,
             CAST(floor((embedding::DOUBLE[])[u.i] * {KM_FP} + 0.5) AS BIGINT)
               AS v_fp
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
    ),
    kmc0 AS MATERIALIZED (
      SELECT vec_id AS cluster, dim, v_fp AS c_fp FROM kmvals
      WHERE vec_id < {KM_K}
    )"""]
    for r in range(1, KM_ROUNDS + 1):
        parts.append(f"""
    kmd{r} AS MATERIALIZED (
      SELECT v.vec_id, c.cluster,
             sum((v.v_fp - c.c_fp) * (v.v_fp - c.c_fp)) AS dist
      FROM kmvals v JOIN kmc{r - 1} c USING (dim)
      GROUP BY v.vec_id, c.cluster
    ),
    kma{r} AS MATERIALIZED (
      SELECT vec_id, cluster, CAST(dist AS BIGINT) AS dist FROM (
        SELECT vec_id, cluster, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM kmd{r}
      ) WHERE rn = 1
    ),
    kmc{r} AS MATERIALIZED (
      SELECT a.cluster, v.dim,
             CAST(floor(sum(v.v_fp) * 1.0 / count(*)) AS BIGINT) AS c_fp
      FROM kmvals v JOIN kma{r} a USING (vec_id)
      GROUP BY a.cluster, v.dim
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT a.cluster,
           count(*) AS n_members,
           CAST(floor(sum(a.dist) * 1.0 / count(*)) AS BIGINT)
             AS inertia_mean,
           (SELECT CAST(sum(c.c_fp) AS BIGINT) FROM kmc{KM_ROUNDS} c
            WHERE c.cluster = a.cluster) AS c_fp_sum
    FROM kma{KM_ROUNDS} a
    GROUP BY a.cluster
    """
    )


@query("emb_kmeans_exact", oracle=_kmeans_oracle())
def emb_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM_ROUNDS unrolled fixed-point Lloyd rounds; returns per-cluster
    membership, floor-mean inertia, and a centroid fingerprint."""
    from deisa_ray_spark.functions.dedup import free_local_checkpoint

    emb = _emb(spark, sf_dir)
    vals = (
        emb.select("vec_id", F.posexplode("e").alias("dim", "v"))
        .select(
            "vec_id",
            "dim",
            F.floor(F.col("v") * KM_FP + 0.5).cast("bigint").alias("v_fp"),
        )
        .localCheckpoint(eager=True)
    )
    cent = vals.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cluster"), "dim", F.col("v_fp").alias("c_fp")
    )
    assign = None
    for r in range(1, KM_ROUNDS + 1):
        dist = (
            vals.join(F.broadcast(cent), "dim")
            .withColumn("d2", (F.col("v_fp") - F.col("c_fp")) * (F.col("v_fp") - F.col("c_fp")))
            .groupBy("vec_id", "cluster")
            .agg(F.sum("d2").alias("dist"))
        )
        rn_w = W.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cluster"))
        nxt_assign = (
            dist.withColumn("rn", F.row_number().over(rn_w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster", F.col("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if assign is not None:
            free_local_checkpoint(assign)
        assign = nxt_assign
        # re-estimate after EVERY round incl. the last: the declared
        # centroid fingerprint is the post-final-assignment re-estimate
        # (the oracle's kmc{KM_ROUNDS}), not the stale round-entry table
        cent = (
            vals.join(assign.select("vec_id", "cluster"), "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                F.floor(F.sum("v_fp") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("c_fp")
            )
        )
    cent_fp = cent.groupBy("cluster").agg(
        F.sum("c_fp").cast("bigint").alias("c_fp_sum")
    )
    out = (
        assign.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.floor(F.sum("dist") * 1.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("inertia_mean"),
        )
        .join(cent_fp, "cluster")
        .select("cluster", "n_members", "inertia_mean", "c_fp_sum")
    ).localCheckpoint(eager=True)
    # out is materialized — release the n·d-row exploded store and the
    # final assignment (the free-superseded-checkpoints discipline; a
    # bench/mirror session runs hundreds of queries after this one)
    free_local_checkpoint(vals)
    free_local_checkpoint(assign)
    return out


# --------------------------------------------------------------------------
# sim_eval_mrr — retrieval-quality EVALUATION: mean reciprocal rank of
# the brute-force cosine ranking against the same-label gold standard
# (the standard labeled-ANN-benchmark protocol: a neighbor is relevant
# iff it shares the query's cluster label). The recall audits
# (dedup_lsh_recall_audit, the *_topk recall contracts) grade candidate
# GENERATION; this grades the RANKING itself — per query the rank of
# the first relevant hit, its reciprocal in integer millionths
# (1e6 DIV rank), and one corpus row with the integer-mean MRR. The
# exact-ranking twin every approximate tier's MRR is later compared
# against.
#
# Scale shape: same as sim_bruteforce_topk (broadcast query panel × one
# corpus scan, per-query WindowGroupLimit is not applicable — the FIRST
# relevant hit needs the full ranking until that hit, so the window
# keeps rank order and a min-filter takes the first match; output is
# N_QUERIES + 1 rows).
# --------------------------------------------------------------------------
@query(
    "sim_eval_mrr",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                      embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    ranked AS (
      SELECT q.qid,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY round(list_cosine_similarity(
                                    q.qe, c.embedding::DOUBLE[]), 6) + 0 DESC,
                                         c.vec_id) AS rank,
             (c.label = q.qlabel) AS relevant
      FROM q JOIN embeddings c ON c.vec_id <> q.qid
    ),
    firsts AS (
      SELECT qid, CAST(min(rank) AS BIGINT) AS first_rel_rank
      FROM ranked WHERE relevant GROUP BY qid
    )
    SELECT CAST(qid AS BIGINT) AS qid, first_rel_rank,
           1000000 // first_rel_rank AS rr_x1e6
    FROM firsts
    UNION ALL
    SELECT -1, CAST(count(*) AS BIGINT),
           CAST(sum(1000000 // first_rel_rank) // count(*) AS BIGINT)
    FROM firsts
    """,
)
def sim_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("qe"),
    )
    w = W.partitionBy("qid").orderBy(
        F.desc(F.round(cosine_sim(F.col("qe"), F.col("e")), 6)),
        F.asc("vec_id"),
    )
    ranked = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(F.min("rank").cast("bigint").alias("first_rel_rank"))
        .localCheckpoint(eager=True)  # N_QUERIES rows feed two branches
    )
    per_q = ranked.select(
        F.col("qid").cast("bigint").alias("qid"),
        "first_rel_rank",
        F.expr("1000000 DIV first_rel_rank").alias("rr_x1e6"),
    )
    summary = ranked.agg(
        F.lit(-1).cast("bigint").alias("qid"),
        F.count(F.lit(1)).cast("bigint").alias("first_rel_rank"),
        F.expr("sum(1000000 DIV first_rel_rank) DIV count(1)")
        .cast("bigint")
        .alias("rr_x1e6"),
    )
    return per_q.unionAll(summary)


# --------------------------------------------------------------------------
# sim_eval_mrr_served — MRR@TOP_K of the SERVED graph-ANN tier
# (sim_graph_beam_topk) against the same-label gold: the evaluation
# that closes the loop from sim_eval_mrr's exact-ranking reference to
# the ranking users actually get from the beam-served index. A query
# with no relevant hit inside the served top-K scores 0 (the MRR@k
# convention), so serving regressions show up as mass at rr=0, not as
# silently-missing rows. Single source twice over: the Spark side calls
# the registered sim_graph_beam_topk builder, and the oracle WRAPS its
# registered oracle as a CTE (the txt_lang_confusion composition
# pattern) — the evaluation cannot drift from the tier it evaluates.
#
# Scale shape: the served table is Q×K rows; labeling is one equi-join
# to the vector store; everything after is a Q-row aggregate.
# --------------------------------------------------------------------------
def _mrr_served_oracle() -> str:
    from deisa_ray_spark.registry import QUERIES

    served = QUERIES["sim_graph_beam_topk"].oracle
    return f"""
    WITH served AS ({served}),
    qpanel AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    firsts AS (
      SELECT p.qid,
             CAST(coalesce(min(CASE WHEN e.label = p.qlabel THEN s.rank END),
                           0) AS BIGINT) AS first_rel_rank
      FROM qpanel p
      LEFT JOIN served s ON s.qid = p.qid
      LEFT JOIN embeddings e ON e.vec_id = s.neighbor_id
      GROUP BY p.qid, p.qlabel
    )
    SELECT CAST(qid AS BIGINT) AS qid, first_rel_rank,
           CAST(CASE WHEN first_rel_rank = 0 THEN 0
                ELSE 1000000 // first_rel_rank END AS BIGINT) AS rr_x1e6
    FROM firsts
    UNION ALL
    SELECT -1, CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN first_rel_rank = 0 THEN 0
                    ELSE 1000000 // first_rel_rank END) // count(*) AS BIGINT)
    FROM firsts
    """


@query("sim_eval_mrr_served", oracle=_mrr_served_oracle())
def sim_eval_mrr_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deisa_ray_spark.registry import QUERIES

    served = QUERIES["sim_graph_beam_topk"].fn(spark, sf_dir).select(
        "qid", "rank", "neighbor_id"
    )
    emb = _emb(spark, sf_dir)
    qpanel = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    labeled = served.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    )
    firsts = (
        qpanel.join(labeled, "qid", "left")
        .groupBy("qid", "qlabel")
        .agg(
            F.coalesce(
                F.min(
                    F.when(F.col("label") == F.col("qlabel"), F.col("rank"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("first_rel_rank")
        )
        .localCheckpoint(eager=True)  # Q rows feed two branches
    )
    rr = F.when(F.col("first_rel_rank") == 0, F.lit(0)).otherwise(
        F.expr("1000000 DIV first_rel_rank")
    )
    per_q = firsts.select(
        F.col("qid").cast("bigint").alias("qid"),
        "first_rel_rank",
        rr.cast("bigint").alias("rr_x1e6"),
    )
    summary = firsts.select(rr.alias("rr")).agg(
        F.lit(-1).cast("bigint").alias("qid"),
        F.count(F.lit(1)).cast("bigint").alias("first_rel_rank"),
        F.expr("sum(rr) DIV count(1)").cast("bigint").alias("rr_x1e6"),
    )
    return per_q.unionAll(summary)
