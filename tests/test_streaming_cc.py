"""Incremental connected components (streaming/cc_incremental.py):
shard-by-shard folding must resolve to EXACTLY the batch cc_labels
result over the union of edges — in any arrival order — plus restart
continuity, retry convergence, and the one-hop remap invariant."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from deisa_ray_spark.functions.dedup import cc_labels
from deisa_ray_spark.streaming.cc_incremental import REMAP_SCHEMA, IncrementalCC
from deisa_ray_spark.streaming.state_io import CURRENT_MARKER, read_versioned

# a graph that exercises chains, cross-shard merges, and late absorption
# of a smaller id: (40,50) arrives before 10 connects to 40.
EDGES = [
    (1, 2), (2, 3),            # chain
    (40, 50), (10, 40),        # late small-id absorption
    (7, 8),                    # isolated pair
    (3, 4), (4, 5),            # extends the chain across shards
    (60, 61), (61, 62), (5, 60),  # two chains fuse
]


def _batch_expect(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        (r.id, r.comp) for r in cc_labels(df).collect()
    }


def _resolve_set(cc):
    return {(r.node, r.comp) for r in cc.resolve().collect()}


def _shards(edges, n):
    return [edges[i::n] for i in range(n)]


@pytest.mark.parametrize("order", [list(range(3)), [2, 0, 1]])
def test_sharded_folding_equals_batch_cc(spark, tmp_path, order):
    cc = IncrementalCC(spark, str(tmp_path))
    shards = _shards(EDGES, 3)
    for i, idx in enumerate(order):
        df = spark.createDataFrame(shards[idx], "doc_a long, doc_b long")
        cc.process_batch(df, i)
    assert _resolve_set(cc) == _batch_expect(spark, EDGES)


def test_restart_continues_from_disk_state(spark, tmp_path):
    shards = _shards(EDGES, 2)
    cc1 = IncrementalCC(spark, str(tmp_path))
    cc1.process_batch(
        spark.createDataFrame(shards[0], "doc_a long, doc_b long"), 0
    )
    # a NEW processor over the same state dir (engine restart)
    cc2 = IncrementalCC(spark, str(tmp_path))
    cc2.process_batch(
        spark.createDataFrame(shards[1], "doc_a long, doc_b long"), 1
    )
    assert _resolve_set(cc2) == _batch_expect(spark, EDGES)


def test_retried_batch_converges(spark, tmp_path):
    cc = IncrementalCC(spark, str(tmp_path))
    shards = _shards(EDGES, 2)
    b0 = spark.createDataFrame(shards[0], "doc_a long, doc_b long")
    b1 = spark.createDataFrame(shards[1], "doc_a long, doc_b long")
    cc.process_batch(b0, 0)
    cc.process_batch(b0, 0)  # crash-replay of the same batch
    cc.process_batch(b1, 1)
    cc.process_batch(b1, 1)
    assert _resolve_set(cc) == _batch_expect(spark, EDGES)


def test_remap_stays_one_hop(spark, tmp_path):
    """Path-compression invariant: no remap root is itself an absorbed
    comp — resolution never needs a second hop."""
    cc = IncrementalCC(spark, str(tmp_path))
    for i, shard in enumerate(_shards(EDGES, 4)):
        if shard:
            cc.process_batch(
                spark.createDataFrame(shard, "doc_a long, doc_b long"), i
            )
    remap = read_versioned(spark, cc.remap_root, REMAP_SCHEMA)
    absorbed = {r.comp for r in remap.collect()}
    roots = {r.root for r in remap.collect()}
    assert not (roots & absorbed)


def test_intra_component_batch_is_a_noop(spark, tmp_path):
    cc = IncrementalCC(spark, str(tmp_path))
    cc.process_batch(
        spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long"), 0
    )
    before = _resolve_set(cc)
    # an edge inside the existing component: no state change needed
    cc.process_batch(
        spark.createDataFrame([(1, 3)], "doc_a long, doc_b long"), 1
    )
    assert _resolve_set(cc) == before
    # the no-op batch must not have published a new remap version
    marker = os.path.join(cc.remap_root, CURRENT_MARKER)
    pointed_at = open(marker).read()
    cc.process_batch(
        spark.createDataFrame([(2, 3)], "doc_a long, doc_b long"), 2
    )
    assert open(marker).read() == pointed_at


def test_canonical_is_min_id_even_when_small_id_arrives_late(spark, tmp_path):
    cc = IncrementalCC(spark, str(tmp_path))
    cc.process_batch(spark.createDataFrame([(40, 50)], "doc_a long, doc_b long"), 0)
    assert _resolve_set(cc) == {(40, 40), (50, 40)}
    cc.process_batch(spark.createDataFrame([(10, 40)], "doc_a long, doc_b long"), 1)
    assert _resolve_set(cc) == {(10, 10), (40, 10), (50, 10)}


def _pure_cc(edges):
    """Reference union-find with min-id canonicals."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [0, 1])
def test_random_graphs_match_union_find(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    nodes = rng.sample(range(1000), 40)
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (rng.sample(nodes, 2) for _ in range(50))
        }
    )
    rng.shuffle(edges)
    shards = [edges[i::4] for i in range(4)]
    cc = IncrementalCC(spark, str(tmp_path / f"s{seed}"))
    for i, sh in enumerate(shards):
        if sh:
            cc.process_batch(
                spark.createDataFrame(sh, "doc_a long, doc_b long"), i
            )
    assert _resolve_set(cc) == set(_pure_cc(edges).items())


def test_crash_between_claims_and_remap_recovers_on_retry(spark, tmp_path):
    """The documented crash window: labels claims appended, remap swap
    never ran. Replaying the batch (what a checkpointed stream does)
    must converge to the batch-CC resolution — no manual repair."""
    cc = IncrementalCC(spark, str(tmp_path))
    cc.process_batch(
        spark.createDataFrame([(40, 50)], "doc_a long, doc_b long"), 0
    )
    crashing = spark.createDataFrame([(10, 40)], "doc_a long, doc_b long")

    real_swap = cc._swap_remap
    calls = {"n": 0}

    def boom(remap):
        calls["n"] += 1
        raise RuntimeError("injected crash before remap swap")

    cc._swap_remap = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        cc.process_batch(crashing, 1)
    assert calls["n"] == 1
    # claims for node 10 may or may not have landed; remap did NOT.
    cc._swap_remap = real_swap
    cc.process_batch(crashing, 1)  # stream replays the batch
    assert _resolve_set(cc) == {(10, 10), (40, 10), (50, 10)}


def test_crash_inside_remap_publish_leaves_a_complete_table(spark, tmp_path):
    """The swap itself is crash-atomic now: fail AFTER the new version
    dir is written but BEFORE the CURRENT pointer moves — the old remap
    stays fully visible, and replaying the batch converges."""
    from deisa_ray_spark.streaming import state_io

    cc = IncrementalCC(spark, str(tmp_path))
    cc.process_batch(spark.createDataFrame([(40, 50)], "doc_a long, doc_b long"), 0)
    before = _resolve_set(cc)
    assert before == {(40, 40), (50, 40)}

    real_replace = os.replace

    def boom(src, dst):
        if os.path.basename(dst) == state_io.CURRENT_MARKER:
            raise RuntimeError("injected crash mid-publish")
        return real_replace(src, dst)

    batch = spark.createDataFrame([(10, 40)], "doc_a long, doc_b long")
    os.replace = boom
    try:
        with pytest.raises(RuntimeError, match="mid-publish"):
            cc.process_batch(batch, 1)
    finally:
        os.replace = real_replace
    # old remap version still fully readable — resolution did not lose
    # the earlier merge, only the crashed batch's is missing
    mid = dict(_resolve_set(cc))
    assert mid[50] == 40  # pre-crash merge intact
    cc.process_batch(batch, 1)  # stream replays
    assert _resolve_set(cc) == {(10, 10), (40, 10), (50, 10)}
