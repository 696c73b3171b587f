"""Incremental ANN serving-graph maintenance: the kNN serving graph
(functions.similarity.serve_edges + upper_edges) maintained batch by
batch as new vectors arrive — at 100 TB the serving graph is MAINTAINED,
not rebuilt, and this was the last curation stage without an incremental
twin (neardup/curation/decontaminate/cc all have one).

Exactness contract (the strongest of the streaming contracts — no
arrival-order caveat): the maintained edge set equals a FULL REBUILD
over the vectors seen so far, for ANY append-only batching. This is
exact, not approximate, because every decision inside
``knn_assigned`` — refinement depth, salt-shard row_numbers — depends
only on rows sharing the same depth-0 COARSE key (the prefix windows
strip fixed bit-suffixes off ``coarse|bits`` cells, never crossing the
coarse key; similarity.py:1470), and ``knn_graph_from_assigned`` scores
pairs only within buckets, which never span coarse groups. So
"reassign + re-rank exactly the coarse groups the batch touches, carry
every other group's edges forward" IS the full rebuild restricted to
changed groups. Pinned by tests/test_streaming_servegraph.py, including
a mid-stream restart.

Per batch, per view (block-label view, GEO_VIEWS sign-code views, and
the md5-sampled UPPER entry layer):

1. the batch's distinct coarse keys are collected — a bounded,
   metadata-scale list (≤ 2^GEO_BITS codes per geo view plus the label
   census), never corpus rows;
2. the members of those groups (vectors seen so far, batch included)
   are re-assigned and re-ranked with the SAME builders the batch
   artifact uses (``knn_assigned`` / ``knn_graph_from_assigned`` — one
   source of truth, no drift);
3. ONLY those groups' edge partitions are rewritten; every other
   group's files are left physically untouched.

State lives in parquet under ``state_dir``:

* ``vectors/b{batch_id}`` holds each batch's vectors (overwrite ⇒
  replay safe: foreachBatch may redeliver a batch after a crash);
* ``edges/`` is ONE hive-partitioned table, ``view=<id>/grp=<key>``,
  maintained with dynamic partitionOverwriteMode — the same no-format
  MERGE discipline as ``maintenance.upsert_parquet``. A batch rewrites
  exactly the partitions in its group census; untouched partitions keep
  their exact files (asserted by inode in the tests). Touched groups
  whose rebuild yields ZERO edges are deleted explicitly (dynamic
  overwrite only replaces partitions PRESENT in the written frame — an
  emptied group would otherwise linger with stale edges).

State I/O per batch is therefore O(touched groups), matching the
compute: nothing in ``process_batch`` reads or writes the untouched
part of the edge state. (Through r10 the state was versioned full
snapshots ``edges/v{batch_id}`` — O(total edges) I/O per batch even for
a one-group batch; ``_migrate_legacy`` upgrades such a dir in place.)

Replay/crash safety without versions: the touched partitions' contents
are a deterministic function of the vector state alone (members +
re-sent ids' old keys — ``process_batch`` never reads prior edges), and
``vectors/b{batch_id}`` writes are idempotent, so redelivering a batch
rewrites the same partitions with the same rows, and a crash that left
SOME partitions rewritten converges on redelivery. This is the same
argument Delta's MERGE gives, minus cross-writer atomicity (one
maintainer per state dir, which foreachBatch guarantees).

UPSERT semantics (r10): a re-sent ``vec_id`` REPLACES its previous
version — the member set is keep-latest-per-vec_id (highest batch id
wins), and the group census for each view includes the re-sent ids'
OLD coarse keys as well as their new ones, so the stale vector's old
groups are rebuilt without it and its new groups with it. The
full-rebuild equivalence contract then reads: maintained state ==
rebuild over the keep-latest vector set. A duplicate vec_id WITHIN one
batch is ambiguous (which version wins?) and raises ContractError —
same-batch dedup is the producer's job.

Work per batch is O(Σ touched-group sizes · cap-bounded pair work) —
independent of corpus size when batches touch few groups, degenerating
honestly to a full rebuild when a batch touches every group.
"""

from __future__ import annotations

import glob
import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.errors import ContractError

from deisa_ray_spark.functions.similarity import (
    GEO_VIEWS,
    SERVE_K,
    _geo_code,
    _upper_sample,
    knn_assigned,
    knn_graph_from_assigned,
)

#: view ids in the edge state: 0 = block-label view, 1..GEO_VIEWS = the
#: geometric sign-code views, UPPER_VIEW = the sampled entry layer.
UPPER_VIEW = 100

EDGES_SCHEMA = "view int, grp string, src bigint, dst bigint"
#: read schema for the partitioned table: data columns first, then the
#: partition columns — explicit so grp is NEVER type-inferred (a geo
#: code like "0101" would otherwise infer as the integer 101).
_EDGES_READ_SCHEMA = "src bigint, dst bigint, view int, grp string"


def _views() -> list:
    """(view_id, coarse-key builder, sample filter or None)."""
    views = [(0, lambda: F.col("label").cast("string"), None)]
    for v in range(GEO_VIEWS):
        views.append(
            (v + 1, (lambda vv: lambda: _geo_code(F.col("e"), vv))(v), None)
        )
    views.append(
        (UPPER_VIEW, lambda: F.col("label").cast("string"),
         lambda df: df.filter(_upper_sample(F.col("vec_id"))))
    )
    return views


class IncrementalServeGraph:
    """foreachBatch processor maintaining the serving edge state."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    # -- state layout -----------------------------------------------------
    def _edges_dir(self) -> str:
        return os.path.join(self.state_dir, "edges")

    def _migrate_legacy(self) -> None:
        """Upgrade an r10-era ``edges/v{batch}`` full-snapshot state dir
        to the partitioned layout in place: read the newest committed
        snapshot, write it as ``view=*/grp=*`` partitions (they coexist
        with the ``v*`` dirs during the copy), then drop the snapshots.
        Idempotent — a crash at any point re-runs the same rewrite."""
        # strict ^v\d+$ match: a bare "v*" glob would also sweep up the
        # freshly written "view=*" partition dirs
        snaps = [
            p
            for p in glob.glob(os.path.join(self._edges_dir(), "v[0-9]*"))
            if os.path.basename(p)[1:].isdigit()
        ]
        legacy = [
            (int(os.path.basename(p)[1:]), p)
            for p in snaps
            if os.path.exists(os.path.join(p, "_SUCCESS"))
        ]
        if not legacy:
            return
        latest = sorted(legacy)[-1][1]
        df = self.spark.read.parquet(latest).select("src", "dst", "view", "grp")
        self._overwrite_partitions(df)
        for p in snaps:
            shutil.rmtree(p, ignore_errors=True)

    def _read_edges(self) -> DataFrame:
        self._migrate_legacy()
        if not glob.glob(os.path.join(self._edges_dir(), "view=*")):
            return self.spark.createDataFrame([], EDGES_SCHEMA)
        return (
            self.spark.read.schema(_EDGES_READ_SCHEMA)
            .parquet(self._edges_dir())
            .select("view", "grp", "src", "dst")
        )

    def _partition_dirs(self, view: int) -> dict:
        """grp value -> on-disk partition dir for one view (grp values
        hive-%-escaped in dir names; unquote restores them)."""
        base = os.path.join(self._edges_dir(), f"view={view}")
        out = {}
        for d in glob.glob(os.path.join(base, "grp=*")):
            out[urllib.parse.unquote(os.path.basename(d)[4:])] = d
        return out

    def _overwrite_partitions(self, edges: DataFrame) -> None:
        """Dynamic-partition-overwrite ``edges`` (src,dst,view,grp) into
        the state table — only (view, grp) partitions present in the
        frame are replaced (the maintenance.upsert_parquet discipline).
        Repartitioned on the partition keys first so each rewritten
        partition gets exactly ONE file: without it every write task
        emits a sliver into every partition it holds rows for — a
        small-files explosion that grows with both task count and batch
        count. The extra exchange moves only the FRESH edges (touched
        groups × batch scale), never the carried state."""
        conf = self.spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                edges.select("src", "dst", "view", "grp")
                .repartition("view", "grp")
                .write.mode("overwrite")
                .partitionBy("view", "grp")
                .parquet(self._edges_dir())
            )
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        self.spark.catalog.refreshByPath(self._edges_dir())

    def _members_all(self) -> DataFrame:
        """Every stored vector version ``(vec_id, label, e, _b)`` —
        re-sent ids appear once per sending batch. Pre-upsert state
        (vectors written before the ``_b`` column existed) reads as
        ``_b = -1``: those runs were append-only, so at most one
        version of each vec_id predates the upgrade and keep-latest
        ordering stays well-defined."""
        paths = sorted(glob.glob(os.path.join(self.state_dir, "vectors", "b*")))
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        if "_b" not in df.columns:
            df = df.withColumn("_b", F.lit(-1))
        return df.select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("e"),
            F.coalesce(F.col("_b"), F.lit(-1)).alias("_b"),
        )

    def _members(self) -> DataFrame:
        """The LIVE vector set: keep-latest-per-vec_id (upsert)."""
        w = W.partitionBy("vec_id").orderBy(F.desc("_b"))
        return (
            self._members_all()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "label", "e")
        )

    # -- the batch step ----------------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # duplicate vec_id within ONE batch is an ambiguous upsert
        # (which version wins?) — producer contract violation
        dup = (
            batch.groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
        if dup.limit(1).count() > 0:
            raise ContractError(
                "duplicate vec_id within one serve-graph batch — "
                "same-batch upsert order is undefined; dedup upstream"
            )
        self._migrate_legacy()
        batch.withColumn("_b", F.lit(batch_id)).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "vectors", f"b{batch_id}")
        )
        # ONE materialization each per batch: members feeds every view's
        # subset filter, old_versions feeds every view's census —
        # un-checkpointed, each reference would re-read the whole
        # vectors/b* history and re-run the keep-latest window (~2 scans
        # x views per batch, against the module's work-per-batch
        # contract).
        from deisa_ray_spark.functions.dedup import free_local_checkpoint

        members = self._members().localCheckpoint(eager=True)
        bvecs = batch.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
        )
        # prior versions of RE-SENT ids: their OLD coarse keys must join
        # the census so the stale vector's groups rebuild without it
        # (semi join — never a driver-side id list)
        old_versions = (
            self._members_all()
            .filter(F.col("_b") < batch_id)
            .join(bvecs.select("vec_id"), "vec_id", "semi")
            .select("vec_id", "label", "e")
            .localCheckpoint(eager=True)
        )
        fresh_views = []
        touched: list = []  # (view, [grp, ...]) — the group census
        for view, key_fn, sample in _views():
            b = sample(bvecs) if sample else bvecs
            old = sample(old_versions) if sample else old_versions
            # bounded collect: the batch's distinct coarse keys (new ∪
            # re-sent-old) — the group-key census (≤ 2^GEO_BITS codes /
            # label cardinality), metadata-scale at any corpus size.
            groups = [
                r[0]
                for r in b.select(key_fn().alias("g"))
                .unionByName(old.select(key_fn().alias("g")))
                .distinct()
                .collect()
            ]
            if not groups:
                continue
            touched.append((view, groups))
            m = sample(members) if sample else members
            subset = m.withColumn("grp", key_fn()).filter(F.col("grp").isin(groups))
            tags = subset.select("vec_id", "grp")
            assigned = knn_assigned(subset.select("vec_id", "label", "e"), key=key_fn())
            fresh_views.append(
                knn_graph_from_assigned(assigned, k=SERVE_K)
                .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
                .join(tags.withColumnRenamed("vec_id", "src"), "src")
                .select("src", "dst", F.lit(view).alias("view"), "grp")
            )
        if fresh_views:
            fresh = fresh_views[0]
            for fv in fresh_views[1:]:
                fresh = fresh.unionByName(fv)
            # materialize once: the same frame feeds the partition
            # census (which groups actually produced edges) AND the
            # overwrite write
            fresh = fresh.localCheckpoint(eager=True)
            present = {
                (r["view"], r["grp"])
                for r in fresh.select("view", "grp").distinct().collect()
            }
            if present:
                self._overwrite_partitions(fresh)
            # touched groups whose rebuild yielded NO edges: dynamic
            # overwrite never saw their partition — delete the stale
            # files explicitly or an emptied group would keep serving
            # its old edges
            for view, groups in touched:
                dirs = self._partition_dirs(view)
                for g in groups:
                    if (view, g) not in present and g in dirs:
                        shutil.rmtree(dirs[g], ignore_errors=True)
            free_local_checkpoint(fresh)
        free_local_checkpoint(members)
        free_local_checkpoint(old_versions)

    # -- drivers -------------------------------------------------------------
    def run_available(self, src_dir: str, ckpt_dir: str) -> None:
        """Drain every staged shard with availableNow semantics."""
        schema = self.spark.read.parquet(src_dir).schema
        q = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- read the maintained graph --------------------------------------------
    def _symmetrized(self, pred) -> DataFrame:
        directed = self._read_edges().filter(pred).select("src", "dst")
        return directed.unionByName(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    def base_edges(self) -> DataFrame:
        """Undirected base serving edges — equals serve_edges() rebuilt."""
        return self._symmetrized(F.col("view") != UPPER_VIEW)

    def upper_edges(self) -> DataFrame:
        """Undirected upper-layer edges — equals upper_edges() rebuilt."""
        return self._symmetrized(F.col("view") == UPPER_VIEW)
