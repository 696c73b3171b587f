"""Incremental connected components over a streaming near-dup edge
list: maintain dedup CLUSTERS as shards arrive, without ever re-running
CC over the full history — the streaming twin of
``functions.dedup.dedup_cluster_cc`` (which the reference lacks; its
corpus lives one timestep at a time).

Batch-equivalence contract (pinned in tests/test_streaming_cc.py): the
canonical representative of a component is its MIN node id, and min is
merge-order-invariant (min of mins = global min) — so after processing
any shard partitioning of an edge set, in ANY arrival order,
``resolve()`` equals the batch ``cc_labels`` over the union of edges.

State design (the union-find forest as two tables):

- ``labels`` (node, comp) — APPEND-ONLY: each node's component id at
  the moment it was first seen. Never rewritten; O(nodes-in-clusters).
- ``remap`` (comp, root) — FULLY PATH-COMPRESSED: every absorbed
  component id maps DIRECTLY to its current canonical root (never to
  another absorbed id), so resolution is labels ⟕ remap — exactly ONE
  join hop, no iteration at read time. The table is rewritten
  wholesale per batch (it is O(#merged components), orders smaller
  than the corpus) via write-tmp + atomic swap.

Per batch: contract each edge's endpoints to their CURRENT roots (one
join against the resolved labels), drop intra-component edges, run the
diameter-bounded ``cc_labels`` on the remaining ROOT-level mini-graph
(per-batch small — this is where incrementality wins: CC cost is
O(batch), not O(history)), then append new nodes' claims and fold the
root merges into the remap table.

Crash/retry: labels appends may duplicate on a re-processed batch —
``resolve()`` collapses them with a min-aggregate; the remap swap is
atomic; re-running a batch against superset state recomputes the same
(or already-applied) merges, so retries converge on the same
resolution.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LABELS_SCHEMA = "node bigint, comp bigint"
REMAP_SCHEMA = "comp bigint, root bigint"


class IncrementalCC:
    """foreachBatch processor for ``(doc_a, doc_b)`` edge micro-batches."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.labels_dir = os.path.join(state_dir, "cc_labels")
        self.remap_dir = os.path.join(state_dir, "cc_remap")

    def _read(self, path: str, schema: str) -> DataFrame:
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for _r, _d, fs in os.walk(path) for f in fs
        ):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    # -- read side ---------------------------------------------------------

    def resolve(self) -> DataFrame:
        """Current assignment ``(node, comp)`` with comp = min node id of
        the component — one join hop, duplicates from retried batches
        collapsed by the min-aggregate."""
        labels = self._read(self.labels_dir, LABELS_SCHEMA)
        remap = self._read(self.remap_dir, REMAP_SCHEMA)
        return (
            labels.join(remap, "comp", "left")
            .select("node", F.coalesce("root", "comp").alias("comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )

    # -- write side --------------------------------------------------------

    def process_batch(self, edges: DataFrame, batch_id: int) -> None:
        """Fold one edge micro-batch ``(doc_a, doc_b)`` into the forest."""
        from deisa_ray_spark.functions.dedup import cc_labels, free_local_checkpoint

        edges = edges.select("doc_a", "doc_b").distinct().persist()
        try:
            if edges.head(1) == []:
                return
            cur = self.resolve()  # (node, comp) — current roots
            ra = cur.select(
                F.col("node").alias("doc_a"), F.col("comp").alias("_ra")
            )
            rb = cur.select(
                F.col("node").alias("doc_b"), F.col("comp").alias("_rb")
            )
            contracted = (
                edges.join(ra, "doc_a", "left")
                .join(rb, "doc_b", "left")
                .select(
                    F.coalesce("_ra", "doc_a").alias("ra"),
                    F.coalesce("_rb", "doc_b").alias("rb"),
                )
                .filter(F.col("ra") != F.col("rb"))
            )
            new_nodes = (
                edges.select(F.col("doc_a").alias("node"))
                .unionAll(edges.select(F.col("doc_b").alias("node")))
                .distinct()
                .join(cur.select("node"), "node", "left_anti")
                .persist()
            )
            if contracted.head(1) == []:
                # every edge connects two already-same-root nodes. A NEW
                # node cannot occur here: its root is its own (unique)
                # id, so any edge touching it contracts to a root merge.
                new_nodes.unpersist()
                return
            # CC over the ROOT-level mini-graph (per-batch small)
            groups = cc_labels(
                contracted.select(
                    F.col("ra").alias("doc_a"), F.col("rb").alias("doc_b")
                )
            )  # (id = old root, comp = new canonical root)
            # new nodes: claim their final canonical id directly
            claims = new_nodes.join(
                groups, new_nodes.node == groups.id, "left"
            ).select("node", F.coalesce("comp", "node").alias("comp"))
            claims.write.mode("append").parquet(self.labels_dir)
            # fold merges into the remap table, keeping it one-hop:
            # every old entry pointing at an absorbed root re-targets
            # the new canonical; absorbed roots gain direct entries
            merges = groups.filter(F.col("id") != F.col("comp")).select(
                F.col("id").alias("_old"), F.col("comp").alias("_new")
            )
            old_remap = self._read(self.remap_dir, REMAP_SCHEMA)
            rewritten = (
                old_remap.join(merges, old_remap.root == merges._old, "left")
                .select("comp", F.coalesce("_new", "root").alias("root"))
                .unionByName(
                    merges.select(
                        F.col("_old").alias("comp"), F.col("_new").alias("root")
                    )
                )
                # a retried batch re-derives already-applied merges —
                # keep one row per absorbed comp (min root is the
                # canonical one by the min-merge invariant)
                .groupBy("comp")
                .agg(F.min("root").alias("root"))
            )
            self._swap_remap(rewritten)
            new_nodes.unpersist()
            # all consumers of the per-batch CC output have executed
            # (claims append + remap swap) — release its checkpoint
            # blocks instead of waiting on JVM GC
            free_local_checkpoint(groups)
        finally:
            edges.unpersist()

    def _swap_remap(self, remap: DataFrame) -> None:
        tmp = f"{self.remap_dir}.swap-{uuid.uuid4().hex[:8]}"
        remap.write.mode("overwrite").parquet(tmp)
        old = f"{self.remap_dir}.old-{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.remap_dir):
            os.rename(self.remap_dir, old)
        os.rename(tmp, self.remap_dir)
        shutil.rmtree(old, ignore_errors=True)
