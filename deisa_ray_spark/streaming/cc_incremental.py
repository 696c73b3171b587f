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
  join hop, no iteration at read time. It is wholesale-rewritten per
  merging batch (O(#merged components), orders smaller than the
  corpus) and published via ``state_io.publish_versioned``: new
  version dir + atomic ``CURRENT``-pointer replace, so a crash at ANY
  point leaves a complete version visible (old or new) — never a
  missing table.

Per batch: contract each edge's endpoints to their CURRENT roots (one
join against the resolved labels, persisted for the batch — the state
table is O(history), so it must be scanned once per batch, not once
per branch), drop intra-component edges, run the diameter-bounded
``cc_labels`` on the remaining ROOT-level mini-graph (per-batch
small — this is where incrementality wins: CC cost is O(batch), not
O(history)), then append new nodes' claims and fold the root merges
into the remap table.

Crash/retry: labels appends may duplicate or land PARTIALLY on a
crashed batch — ``resolve()`` collapses duplicates with a
min-aggregate, and the claims step covers every batch-touched new node
even when its edges contract away against a partially-claimed peer
(the replay hole a contracted-empty early-exit would leave). The remap
publish is atomic; re-running a batch against superset state
recomputes the same (or already-applied) merges, so retries converge
on the same resolution.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.streaming.state_io import (
    publish_versioned,
    read_state_dir,
    read_versioned,
)

LABELS_SCHEMA = "node bigint, comp bigint"
REMAP_SCHEMA = "comp bigint, root bigint"


class IncrementalCC:
    """foreachBatch processor for ``(doc_a, doc_b)`` edge micro-batches."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.labels_dir = os.path.join(state_dir, "cc_labels")
        self.remap_root = os.path.join(state_dir, "cc_remap")

    # -- read side ---------------------------------------------------------

    def resolve(self) -> DataFrame:
        """Current assignment ``(node, comp)`` with comp = min node id of
        the component — one join hop, duplicates from retried batches
        collapsed by the min-aggregate."""
        labels = read_state_dir(self.spark, self.labels_dir, LABELS_SCHEMA)
        remap = read_versioned(self.spark, self.remap_root, REMAP_SCHEMA)
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
        cur = None
        new_nodes = None
        groups = None
        try:
            if edges.head(1) == []:
                return
            # ONE materialized scan of the O(history) state per batch —
            # it feeds three branches (ra, rb, the new-node anti-join)
            cur = self.resolve().persist()
            ra = cur.select(F.col("node").alias("doc_a"), F.col("comp").alias("_ra"))
            rb = cur.select(F.col("node").alias("doc_b"), F.col("comp").alias("_rb"))
            # every node this batch touches, contracted to its current
            # root (own id when unseen)
            touched = (
                edges.join(ra, "doc_a", "left")
                .join(rb, "doc_b", "left")
                .select(
                    F.col("doc_a").alias("na"),
                    F.col("doc_b").alias("nb"),
                    F.coalesce("_ra", "doc_a").alias("ra"),
                    F.coalesce("_rb", "doc_b").alias("rb"),
                )
            )
            node_roots = (
                touched.select(F.col("na").alias("node"), F.col("ra").alias("root"))
                .unionAll(
                    touched.select(F.col("nb").alias("node"), F.col("rb").alias("root"))
                )
                .groupBy("node")
                .agg(F.min("root").alias("root"))
            )
            contracted = touched.select("ra", "rb").filter(F.col("ra") != F.col("rb"))
            new_nodes = (
                node_roots.select("node", "root")
                .join(cur.select("node"), "node", "left_anti")
                .persist()
            )
            if contracted.head(1) != []:
                # CC over the ROOT-level mini-graph (per-batch small)
                groups = cc_labels(
                    contracted.select(
                        F.col("ra").alias("doc_a"), F.col("rb").alias("doc_b")
                    )
                )  # (id = old root, comp = new canonical root)
                final = node_roots.join(
                    groups, node_roots.root == groups.id, "left"
                ).select("node", F.coalesce("comp", "root").alias("comp"))
            else:
                # no root merges — but batch-touched NEW nodes still
                # need claims (e.g. a replay where a partial claims
                # append made a new pair contract away, or a self-loop)
                final = node_roots.select("node", F.col("root").alias("comp"))
            claims = final.join(new_nodes.select("node"), "node", "left_semi")
            if claims.head(1) != []:
                claims.write.mode("append").parquet(self.labels_dir)
            if groups is not None:
                # fold merges into the remap table, keeping it one-hop:
                # every old entry pointing at an absorbed root
                # re-targets the new canonical; absorbed roots gain
                # direct entries
                merges = groups.filter(F.col("id") != F.col("comp")).select(
                    F.col("id").alias("_old"), F.col("comp").alias("_new")
                )
                old_remap = read_versioned(
                    self.spark, self.remap_root, REMAP_SCHEMA
                )
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
        finally:
            edges.unpersist()
            if cur is not None:
                cur.unpersist()
            if new_nodes is not None:
                new_nodes.unpersist()
            if groups is not None:
                # all consumers executed (claims append + remap swap) —
                # release the per-batch CC checkpoint blocks
                free_local_checkpoint(groups)

    def _swap_remap(self, remap: DataFrame) -> None:
        publish_versioned(remap, self.remap_root)
