"""Incremental serving-graph maintenance: the maintained edge state
must equal a full rebuild (serve_edges / upper_edges) over the vectors
seen so far — exactly, for append-only shard arrival — and survive a
mid-stream engine restart. The exactness argument (group-local
assignment decisions) is in streaming/servegraph.py's docstring; these
tests pin it empirically."""

from __future__ import annotations

import shutil

from deisa_ray_spark.functions.similarity import serve_edges, upper_edges
from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR

N_SHARDS = 3


def _edge_set(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


def _stage(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    return stage_ordered_shards(emb, str(tmp_path / "src"), N_SHARDS, order_col="vec_id")


def test_streamed_graph_equals_full_rebuild(spark, tmp_path):
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    _stage(spark, tmp_path)
    proc = IncrementalServeGraph(spark, str(tmp_path / "state"))
    proc.run_available(str(tmp_path / "src"), str(tmp_path / "ckpt"))
    assert _edge_set(proc.base_edges()) == _edge_set(serve_edges(spark, SF_DIR))
    assert _edge_set(proc.upper_edges()) == _edge_set(upper_edges(spark, SF_DIR))


def test_restart_resumes_and_converges(spark, tmp_path):
    """First shard processed, engine 'dies'; a NEW processor over the
    same state dir + checkpoint drains the late shards — the final
    graph still equals the full rebuild (no lost groups, no duplicate
    edge state)."""
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    shards = _stage(spark, tmp_path)
    src = tmp_path / "live"
    src.mkdir()
    shutil.copy(shards[0], src / "shard0.parquet")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    p1 = IncrementalServeGraph(spark, state)
    p1.run_available(str(src), ckpt)
    n_after_first = len(_edge_set(p1.base_edges()))
    assert n_after_first > 0
    for i, s in enumerate(shards[1:], start=1):
        shutil.copy(s, src / f"shard{i}.parquet")
    p2 = IncrementalServeGraph(spark, state)  # "restart"
    p2.run_available(str(src), ckpt)
    assert _edge_set(p2.base_edges()) == _edge_set(serve_edges(spark, SF_DIR))
    assert _edge_set(p2.upper_edges()) == _edge_set(upper_edges(spark, SF_DIR))


def test_upsert_resent_vec_id_replaces(spark, tmp_path):
    """A re-sent vec_id with a CHANGED label+embedding must replace its
    old version: the maintained state equals a full rebuild over the
    keep-latest vector set (old groups rebuilt without the stale row,
    new groups with the fresh one)."""
    from deisa_ray_spark.functions.similarity import (
        _upper_sample,
        serve_edges_from,
        upper_edges_from,
    )
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import pyspark.sql.functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.limit(200).cache()
    # updated versions of 5 vectors: different label, shifted embedding
    updated = (
        base.filter(F.col("vec_id") < 5)
        .withColumn("label", F.col("label") + 1)
        .withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: -x),
        )
    )
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state)
    proc.process_batch(base, 0)
    proc.process_batch(updated, 1)
    live = (
        base.filter(F.col("vec_id") >= 5)
        .unionByName(updated)
        .select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )
    expected_base = serve_edges_from(live)
    expected_upper = upper_edges_from(live.filter(_upper_sample(F.col("vec_id"))))
    assert _edge_set(proc.base_edges()) == _edge_set(expected_base)
    assert _edge_set(proc.upper_edges()) == _edge_set(expected_upper)


def test_same_batch_duplicate_raises(spark, tmp_path):
    from deisa_ray_spark.errors import ContractError
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import pytest

    emb = load_table(spark, SF_DIR, "embeddings").limit(10)
    dup_batch = emb.unionByName(emb.limit(1))
    proc = IncrementalServeGraph(spark, str(tmp_path / "state"))
    with pytest.raises(ContractError):
        proc.process_batch(dup_batch, 0)


def _partition_inodes(state: str) -> dict:
    """(view, grp) -> frozenset of parquet-file inodes, per partition."""
    import glob
    import os
    import urllib.parse

    out = {}
    for d in glob.glob(f"{state}/edges/view=*/grp=*"):
        grp = urllib.parse.unquote(os.path.basename(d)[4:])
        view = int(os.path.basename(os.path.dirname(d))[5:])
        out[(view, grp)] = frozenset(
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
    return out


def test_untouched_partitions_keep_inodes(spark, tmp_path):
    """State I/O is group-local: a one-vector batch rewrites ONLY the
    (view, grp) partitions in its group census — every other partition
    keeps its exact files (same inodes), the upsert_parquet proof
    pattern applied to the maintainer's edge state."""
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph, _views

    import pyspark.sql.functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.limit(150).cache()
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state)
    proc.process_batch(base, 0)
    before = _partition_inodes(state)
    assert len(before) > 3  # enough partitions for the claim to bite

    newvec = (
        base.limit(1)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    # the batch's expected group census, computed with the module's own
    # view/key builders (new vector only — its id has no old versions)
    nv = newvec.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    expected_touched = set()
    for view, key_fn, sample in _views():
        b = sample(nv) if sample else nv
        for r in b.select(key_fn().alias("g")).distinct().collect():
            expected_touched.add((view, r[0]))
    proc.process_batch(newvec, 1)
    after = _partition_inodes(state)
    untouched = [k for k in before if k not in expected_touched]
    assert untouched, "one-vector batch should leave most partitions alone"
    for k in untouched:
        assert after[k] == before[k], f"partition {k} rewritten needlessly"
    for k in expected_touched:
        if k in before:
            assert after.get(k) != before[k], f"touched partition {k} not rewritten"


def test_emptied_group_partition_deleted(spark, tmp_path):
    """Upserting ALL members of a label group out of it must DELETE
    that group's edge partition: dynamic overwrite never sees an empty
    group, so without the explicit delete its stale files would keep
    serving the old edges."""
    from deisa_ray_spark.functions.similarity import serve_edges_from
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import pyspark.sql.functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    labels = sorted(
        r["label"] for r in emb.select("label").distinct().collect()
    )
    lone_label, dest_label = labels[0], labels[1]
    pair = emb.filter(F.col("label") == lone_label).limit(2)
    base = (
        emb.filter(F.col("label") == dest_label)
        .limit(6)
        .unionByName(pair)
        .cache()
    )
    assert pair.count() == 2
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state)
    proc.process_batch(base, 0)
    # the 2-member group HAS edges, so its label-view partition exists
    assert (0, str(lone_label)) in _partition_inodes(state)
    moved = pair.withColumn("label", F.lit(dest_label))
    proc.process_batch(moved, 1)
    assert (0, str(lone_label)) not in _partition_inodes(state)
    live = (
        base.filter(F.col("label") == dest_label)
        .unionByName(moved)
        .select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )
    assert _edge_set(proc.base_edges()) == _edge_set(serve_edges_from(live))


def test_legacy_versioned_state_migrates(spark, tmp_path):
    """An r10-era edges/v{batch} full-snapshot state dir upgrades in
    place on the next batch: the snapshot's rows land in view=/grp=
    partitions, the v* dirs are dropped, and the maintained graph still
    equals the full rebuild."""
    from deisa_ray_spark.functions.similarity import serve_edges_from
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import os

    import pyspark.sql.functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 100).cache()
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state)
    proc.process_batch(base, 0)
    # refactor the partitioned state into a legacy v0 snapshot
    snap = proc._read_edges().select("view", "grp", "src", "dst")
    snap.write.parquet(state + "/edges_v0_tmp")
    import shutil as _sh

    for d in os.listdir(state + "/edges"):
        _sh.rmtree(os.path.join(state, "edges", d), ignore_errors=True)
    os.rename(state + "/edges_v0_tmp", state + "/edges/v0")
    assert os.path.exists(state + "/edges/v0/_SUCCESS")

    nxt = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 120)
    )
    proc2 = IncrementalServeGraph(spark, state)
    proc2.process_batch(nxt, 1)
    assert not os.path.exists(state + "/edges/v0")
    live = base.unionByName(nxt).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    assert _edge_set(proc2.base_edges()) == _edge_set(serve_edges_from(live))


def test_legacy_versioned_vectors_migrate(spark, tmp_path):
    """An r11-era ``vectors/b*`` versioned vector state (including
    pre-upsert files WITHOUT the _b column — append-only runs, read as
    _b = -1) upgrades in place on the next batch: one keep-latest pass
    builds the compacted live + members layout, the b* dirs are
    dropped, and the maintained graph still equals the full rebuild
    over the keep-latest set."""
    from deisa_ray_spark.functions.similarity import serve_edges_from
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import pyspark.sql.functions as F

    import os

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.limit(100).cache()
    # the legacy maintainer's keep-latest view: b0 = base (pre-upsert,
    # no _b column), b1 re-sent ids 0-1 with label+2 (_b = 1). Build the
    # EDGE state consistent with that view (as a real legacy run would
    # have left it), then refactor the vector state into b* version dirs.
    legacy_live = base.filter(F.col("vec_id") >= 2).unionByName(
        base.filter(F.col("vec_id") < 2).withColumn("label", F.col("label") + 2)
    )
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state)
    proc.process_batch(legacy_live, 0)
    base.select("vec_id", "label", "embedding").write.parquet(state + "/vectors/b0")
    (
        base.filter(F.col("vec_id") < 2)
        .withColumn("label", F.col("label") + 2)
        .select("vec_id", "label", "embedding")
        .withColumn("_b", F.lit(1))
        .write.parquet(state + "/vectors/b1")
    )
    shutil.rmtree(state + "/live")
    shutil.rmtree(state + "/members")

    updated = (
        base.filter(F.col("vec_id") < 3)
        .withColumn("label", F.col("label") + 1)
    )
    proc2 = IncrementalServeGraph(spark, state)
    proc2.process_batch(updated, 2)
    assert not os.path.exists(state + "/vectors")
    live = base.filter(F.col("vec_id") >= 3).unionByName(updated).select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    assert _edge_set(proc2.base_edges()) == _edge_set(serve_edges_from(live))


def test_vector_state_io_is_bucket_local(spark, tmp_path):
    """The r12 vector-state contract: a one-vector batch rewrites ONLY
    its live bucket partition and its groups' member partitions — every
    other live bucket and member partition keeps its exact files (same
    inodes). This is the proof that per-batch vector-state I/O is
    O(touched buckets + touched groups), not O(corpus): through r11 the
    maintainer re-read the full vectors/b* history and ran a corpus-wide
    keep-latest window every batch."""
    import glob as _glob
    import os
    import urllib.parse

    from deisa_ray_spark.streaming.servegraph import (
        LIVE_BUCKETS,
        IncrementalServeGraph,
        _views,
    )

    import pyspark.sql.functions as F
    import zlib

    def live_inodes(state):
        out = {}
        for d in _glob.glob(f"{state}/live/bkt=*"):
            out[int(os.path.basename(d)[4:])] = frozenset(
                os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        return out

    def member_inodes(state):
        out = {}
        for d in _glob.glob(f"{state}/members/view=*/grp=*"):
            grp = urllib.parse.unquote(os.path.basename(d)[4:])
            view = int(os.path.basename(os.path.dirname(d))[5:])
            out[(view, grp)] = frozenset(
                os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        return out

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.limit(150).cache()
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state)
    proc.process_batch(base, 0)
    live_before = live_inodes(state)
    mem_before = member_inodes(state)
    assert len(live_before) > 3 and len(mem_before) > 3

    newvec = base.limit(1).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    new_id = newvec.collect()[0]["vec_id"]
    expected_bkt = zlib.crc32(str(new_id).encode()) % LIVE_BUCKETS
    nv = newvec.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    expected_groups = set()
    for view, key_fn, sample in _views():
        b = sample(nv) if sample else nv
        for r in b.select(key_fn().alias("g")).distinct().collect():
            if view <= 90:  # mirror views only (UPPER has no mirror copy)
                expected_groups.add((view, r[0]))
    proc.process_batch(newvec, 1)
    live_after = live_inodes(state)
    mem_after = member_inodes(state)
    for bkt, inodes in live_before.items():
        if bkt != expected_bkt:
            assert live_after[bkt] == inodes, f"bucket {bkt} rewritten needlessly"
    assert live_after.get(expected_bkt) != live_before.get(expected_bkt)
    untouched = [k for k in mem_before if k not in expected_groups]
    assert untouched
    for k in untouched:
        assert mem_after[k] == mem_before[k], f"member partition {k} rewritten"
    for k in expected_groups:
        if k in mem_before:
            assert mem_after.get(k) != mem_before[k], f"touched {k} not rewritten"
    # the write-ahead census is cleaned up after a committed batch
    assert _glob.glob(f"{state}/census/*") == []


def test_merged_maintained_equals_rebuild_with_upsert(spark, tmp_path):
    """merged=True: after a base batch and an UPSERT batch (changed
    label + negated embedding), the maintained merged layer must equal
    merged_serve_edges rebuilt over the keep-latest vector set — the
    affected-sources recompute is exact, not approximate."""
    from deisa_ray_spark.functions.dedup import norm_agg
    from deisa_ray_spark.functions.similarity import (
        merged_directed_from,
        serve_edges_from,
    )
    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import pyspark.sql.functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.limit(200).cache()
    updated = (
        base.filter(F.col("vec_id") < 5)
        .withColumn("label", F.col("label") + 1)
        .withColumn("embedding", F.transform(F.col("embedding"), lambda x: -x))
    )
    proc = IncrementalServeGraph(spark, str(tmp_path / "state"), merged=True)
    proc.process_batch(base, 0)
    proc.process_batch(updated, 1)
    live = (
        base.filter(F.col("vec_id") >= 5)
        .unionByName(updated)
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    d = merged_directed_from(
        serve_edges_from(live),
        live.select("vec_id", "e").withColumn("nrm", norm_agg(F.col("e"))),
    )
    expected = d.unionByName(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    assert _edge_set(proc.merged_edges()) == _edge_set(expected)


def _clustered_vectors(spark, n_clusters=32, per_cluster=10, dim=64):
    """Deterministic well-separated clusters: the first 18 dims are a
    per-cluster ±1 sign pattern (so all three geo views and the label
    view see cluster-determined groups), the rest tiny per-vector
    jitter — a corpus where a one-vector batch touches FEW groups, so
    the merged-maintenance locality claim is observable."""
    rows = []
    for c in range(n_clusters):
        h = (c * 2654435761) & 0xFFFFFFFF
        for i in range(per_cluster):
            vid = c * per_cluster + i
            e = []
            for d in range(dim):
                if d < 18:
                    e.append(1.0 if (h >> d) & 1 else -1.0)
                else:
                    e.append(((vid * 31 + d) % 7 - 3) * 0.01 + 0.05)
            rows.append((vid, e, c))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_merged_maintenance_is_bucket_local(spark, tmp_path):
    """On a clustered corpus, a one-vector batch's merged recompute is
    confined to the affected sources' buckets: every merged/bkt=*
    partition outside the maintainer's recorded touched set keeps its
    exact files, and the touched set is a strict minority of the
    buckets — per-batch merged-state I/O is O(affected), not O(corpus).
    Correctness of the same batch is covered by the equivalence test
    above and the declared stream_serve_graph_merged oracle."""
    import glob as _glob
    import os

    from deisa_ray_spark.streaming.servegraph import IncrementalServeGraph

    import pyspark.sql.functions as F

    def merged_inodes(state):
        out = {}
        for d in _glob.glob(f"{state}/merged/bkt=*"):
            out[int(os.path.basename(d)[4:])] = frozenset(
                os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        return out

    vecs = _clustered_vectors(spark).cache()
    state = str(tmp_path / "state")
    proc = IncrementalServeGraph(spark, state, merged=True)
    proc.process_batch(vecs, 0)
    before = merged_inodes(state)
    assert len(before) > 10

    newvec = vecs.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(9_000_000).cast("bigint")
    )
    proc.process_batch(newvec, 1)
    after = merged_inodes(state)
    touched = set(proc.last_merged_buckets or [])
    assert touched, "incremental path should record its buckets"
    assert len(touched) < len(before) // 2, (
        f"one-vector batch touched {len(touched)} of {len(before)} merged "
        "buckets — recompute set is not local"
    )
    for bkt, inodes in before.items():
        if bkt not in touched:
            assert after[bkt] == inodes, f"merged bucket {bkt} rewritten needlessly"
