"""Incremental MinHash-LSH near-duplicate gating over a document stream:
the scale-path fuzzy dedup (functions.dedup.dedup_minhash_lsh) run the
way crawl corpora actually arrive — shard by shard, with state carried
between micro-batches.

Decision rule (the candidate-level LSH gate): a document is flagged
``is_dup`` iff any of its band buckets is already OWNED by an
earlier-arrived document. Owners are first-arrival (min doc_id within
the claiming micro-batch), exactly the rule the batch twin
:func:`neardup_flags_batch` computes globally — so for shards arriving
in doc_id order the streaming flags are IDENTICAL to the batch job's,
which is the module's declared contract (pinned in
tests/test_streaming_neardup.py, same streaming==batch strategy as
streaming/curation.py).

State shape (100 TB/day): the owners table holds one row per DISTINCT
band bucket — O(corpus novelty), not O(corpus) — and each micro-batch
touches it with one equi-join on (band_id, band_key) plus one append of
its newly-claimed buckets. It lives in storage (parquet here; Delta/an
indexed store in production), not on the heap, so engine restarts keep
dedup state for free. Compact it periodically with
``maintenance.compact_parquet`` — appends are per-batch small files.

Two operating modes:

- **Gate only** (``verify=False``, default): bucket collision = dup.
  At the operating point here (12 hashes, 4 bands → ~50% Jaccard
  threshold) this is the standard streaming accept criterion; it trades
  a band-collision false-positive rate for zero shingle storage.
- **Gate + verify** (``verify=True``): exactly what dedup_minhash_lsh
  does in batch — collisions are CANDIDATES, confirmed by exact Jaccard
  against the colliding owner's shingle set, which requires keeping a
  (owner -> shingles) side table for every novel document. O(novel
  corpus) storage, the honest cost of exact verification (the batch job
  pays the same by re-scanning the corpus); random band collisions no
  longer flag.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.dedup import shingles_col

#: Owners-table schema: one row per claimed band bucket.
OWNERS_SCHEMA = "band_id int, band_key string, owner bigint"

#: Verify-mode side table: shingle sets of every bucket-owning document.
SHINGLES_SCHEMA = "doc_id bigint, shingles array<string>, n_sh int"


def band_rows_for(docs: DataFrame) -> DataFrame:
    """LSH band rows ``(doc_id, band_id, band_key)`` for a document
    frame — composed from the SAME ``minhash_signature_df`` +
    ``lsh_band_rows`` builders the batch queries (dedup_minhash_lsh,
    dedup_decontaminate_fuzzy) use, so batch and streaming cannot drift
    apart. Documents with fewer than 3 tokens have no shingles and
    produce no band rows (they are never near-dup candidates, matching
    the batch query's behavior)."""
    from deisa_ray_spark.functions.dedup import lsh_band_rows, minhash_signature_df

    return lsh_band_rows(
        minhash_signature_df(
            docs.select("doc_id", F.explode(shingles_col()).alias("s"))
        )
    )


def neardup_pairs_batch(docs: DataFrame, verify: bool = False) -> DataFrame:
    """Batch candidate pairs ``(doc_id, owner)`` with owner = global min
    doc_id per band bucket; with ``verify`` only pairs whose exact
    Jaccard clears the threshold survive. The shared edge extraction
    under both the flags and clusters batch twins."""
    from deisa_ray_spark.functions.dedup import JACCARD_THRESHOLD

    bands = band_rows_for(docs)
    owners = bands.groupBy("band_id", "band_key").agg(
        F.min("doc_id").alias("owner")
    )
    cand = (
        bands.join(owners, ["band_id", "band_key"])
        .filter(F.col("owner") < F.col("doc_id"))
        .select("doc_id", "owner")
        .distinct()
    )
    if verify:
        sh = docs.select(
            "doc_id", shingles_col().alias("shingles")
        ).withColumn("n_sh", F.size("shingles"))
        a = sh.select("doc_id", F.col("shingles").alias("sa"), F.col("n_sh").alias("na"))
        b = sh.select(
            F.col("doc_id").alias("owner"),
            F.col("shingles").alias("sb"),
            F.col("n_sh").alias("nb"),
        )
        n_common = F.size(F.array_intersect("sa", "sb"))
        jac = n_common / (F.col("na") + F.col("nb") - n_common)
        cand = cand.join(a, "doc_id").join(b, "owner").filter(
            jac >= JACCARD_THRESHOLD
        ).select("doc_id", "owner")
    return cand


def neardup_flags_batch(docs: DataFrame, verify: bool = False) -> DataFrame:
    """Batch twin: ``(doc_id, is_dup)``. Equals the incremental result
    for in-doc_id-order arrival."""
    flags = neardup_pairs_batch(docs, verify).groupBy("doc_id").agg(
        F.lit(1).alias("_d")
    )
    return docs.select("doc_id").join(flags, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("_d") == 1, F.lit(False)).alias("is_dup")
    )


def neardup_clusters_batch(docs: DataFrame, verify: bool = False) -> DataFrame:
    """Batch twin of the gate→cluster composition: connected components
    ``(node, comp)`` over the owner-collision pair graph — what the
    streaming ``IncrementalNearDup(cluster=True)`` resolves to for
    in-doc_id-order arrival."""
    from deisa_ray_spark.functions.dedup import cc_labels

    pairs = neardup_pairs_batch(docs, verify).select(
        F.col("owner").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    return cc_labels(pairs).select(F.col("id").alias("node"), "comp")


class IncrementalNearDup:
    """foreachBatch processor: per micro-batch, flag near-dups against
    the persistent owners table and claim this batch's new buckets.

    The per-batch writes execute in the order flags → (verify mode:
    owner shingles) → owners claims. A mid-batch crash re-processes the
    batch with the owners table missing at most THIS batch's claims, so
    identical flags are re-emitted (flag computation never reads this
    batch's own appends); a crash between the shingles and owners
    appends re-appends both on retry — at worst duplicate shingle rows,
    which the flag computation collapses. The one non-idempotent
    artifact is the flags output itself (a retried batch appends its
    rows twice); production sinks wanting exactly-once wrap the writes
    in one transactional table keyed by batchId."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        out_dir: str,
        verify: bool = False,
        cluster: bool = False,
    ) -> None:
        self.spark = spark
        self.owners_dir = os.path.join(state_dir, "band_owners")
        self.shingles_dir = os.path.join(state_dir, "owner_shingles")
        self.out_dir = out_dir
        self.verify = verify
        #: gate→cluster composition: fold each batch's candidate pairs
        #: into incremental connected components, so dedup CLUSTERS are
        #: maintained alongside the flags (batch twin:
        #: neardup_clusters_batch). CC folds happen LAST in the batch:
        #: a crash before the fold retries the batch, recomputes the
        #: same pairs (owners coalesce to the same values whether or
        #: not claims landed), and converges (IncrementalCC retry
        #: contract).
        self.cc = None
        if cluster:
            from deisa_ray_spark.streaming.cc_incremental import IncrementalCC

            self.cc = IncrementalCC(spark, os.path.join(state_dir, "clusters"))

    @staticmethod
    def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
        from deisa_ray_spark.streaming.state_io import read_state_dir

        return read_state_dir(spark, path, schema)

    def _owners(self) -> DataFrame:
        return self._read_state(self.spark, self.owners_dir, OWNERS_SCHEMA)

    def _owner_shingles(self) -> DataFrame:
        return self._read_state(self.spark, self.shingles_dir, SHINGLES_SCHEMA)

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        bands = band_rows_for(docs)
        # tiny per-batch table referenced from three branches — persist
        # (released before return; state across batches lives on disk)
        bands = bands.persist()
        bands.count()
        try:
            owners = self._owners()
            batch_min = bands.groupBy("band_id", "band_key").agg(
                F.min("doc_id").alias("batch_owner")
            )
            eff = batch_min.join(owners, ["band_id", "band_key"], "left").select(
                "band_id",
                "band_key",
                F.coalesce("owner", "batch_owner").alias("owner"),
                F.col("owner").isNull().alias("is_new"),
            )
            cand = (
                bands.join(eff, ["band_id", "band_key"])
                .filter(F.col("owner") < F.col("doc_id"))
                .select("doc_id", "owner")
                .distinct()
            )
            if self.verify:
                from deisa_ray_spark.functions.dedup import JACCARD_THRESHOLD

                batch_sh = docs.select(
                    "doc_id", shingles_col().alias("shingles")
                ).withColumn("n_sh", F.size("shingles"))
                # a colliding owner is either in the persistent store or
                # earlier in THIS batch — union covers both
                owner_sh = self._owner_shingles().unionByName(batch_sh)
                a = batch_sh.select(
                    "doc_id",
                    F.col("shingles").alias("sa"),
                    F.col("n_sh").alias("na"),
                )
                b = owner_sh.select(
                    F.col("doc_id").alias("owner"),
                    F.col("shingles").alias("sb"),
                    F.col("n_sh").alias("nb"),
                )
                n_common = F.size(F.array_intersect("sa", "sb"))
                jac = n_common / (F.col("na") + F.col("nb") - n_common)
                cand = (
                    cand.join(a, "doc_id")
                    .join(b, "owner")
                    .filter(jac >= JACCARD_THRESHOLD)
                    .select("doc_id", "owner")
                )
            flags = cand.groupBy("doc_id").agg(F.lit(1).alias("_d"))
            out = (
                docs.select("doc_id", "source", "lang")
                .join(flags, "doc_id", "left")
                .select(
                    "doc_id",
                    "source",
                    "lang",
                    F.coalesce(F.col("_d") == 1, F.lit(False)).alias("is_dup"),
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            out.write.mode("append").parquet(self.out_dir)
            new_buckets = eff.filter("is_new")
            if self.verify:
                # only docs that own >=1 bucket can ever be verify
                # targets — store exactly those shingle sets. WRITE
                # ORDER MATTERS: shingles must land BEFORE the owners
                # claims. A crash between the two appends then retries
                # the batch with is_new still True (owners unclaimed),
                # re-appending both — at worst duplicate shingle rows,
                # which the flag computation collapses (same shingles →
                # same Jaccard → same distinct candidates). The reverse
                # order would retry with is_new False and permanently
                # skip the shingle append, silently suppressing every
                # future verified dup against those owners.
                os.makedirs(self.shingles_dir, exist_ok=True)
                new_owner_ids = new_buckets.select(
                    F.col("owner").alias("doc_id")
                ).distinct()
                batch_sh.join(new_owner_ids, "doc_id", "left_semi").write.mode(
                    "append"
                ).parquet(self.shingles_dir)
            os.makedirs(self.owners_dir, exist_ok=True)
            new_buckets.select("band_id", "band_key", "owner").write.mode(
                "append"
            ).parquet(self.owners_dir)
            if self.cc is not None:
                self.cc.process_batch(
                    cand.select(
                        F.col("owner").alias("doc_a"),
                        F.col("doc_id").alias("doc_b"),
                    ),
                    batch_id,
                )
        finally:
            bands.unpersist()

    def run_available(
        self,
        src_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = 1,
    ) -> None:
        """One AvailableNow pass over a shard drop directory (per-file
        micro-batches by default — the shard-at-a-time arrival shape)."""
        from deisa_ray_spark.streaming.curation import stream_documents

        docs = stream_documents(self.spark, src_dir, max_files_per_trigger)
        q = (
            docs.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def flags(self) -> DataFrame:
        return self.spark.read.parquet(self.out_dir)

    def clusters(self) -> DataFrame:
        """Current dedup-cluster assignment ``(node, comp)`` (requires
        ``cluster=True``)."""
        if self.cc is None:
            raise ValueError("constructed without cluster=True")
        return self.cc.resolve()

    def split_assignment(self) -> DataFrame:
        """Leakage-safe train/val split of every doc seen so far:
        hash-split by CLUSTER (near-dups never straddle), singletons
        self-clustered — the streaming read of
        ``functions.dedup.dedup_split_leakage_safe``'s rule, against
        the incrementally-maintained clusters. Stable as the stream
        grows EXCEPT when a later shard merges a doc's cluster into one
        with a smaller min-id (its comp, hence possibly its side,
        changes with the new information — the same re-assignment a
        batch re-run over the grown corpus would make)."""
        from deisa_ray_spark.functions.dedup import VAL_HEX_LT

        if self.cc is None:
            raise ValueError("constructed without cluster=True")
        docs = self.flags().select("doc_id").distinct()
        comps = self.clusters().select(
            F.col("node").alias("doc_id"), "comp"
        )
        cluster = F.coalesce(F.col("comp"), F.col("doc_id"))
        return docs.join(comps, "doc_id", "left").select(
            "doc_id",
            cluster.cast("bigint").alias("cluster_id"),
            F.when(
                F.substring(F.md5(cluster.cast("string")), 1, 2) < VAL_HEX_LT,
                "val",
            )
            .otherwise("train")
            .alias("split"),
        )
