"""Sliding list window (A7) as distributed keyed state: the reference's
``deque(maxlen=N)`` per array (types.py:180-201,
window_handler.py:272-293) re-expressed as a stateful streaming operator
so window maintenance shards across executors by key. The
transformWithStateInPandas (ListState) twin is protobuf-gated; its
processor logic is unit-tested against a fake ListState so both
implementations are pinned to the same contract."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from deisa_ray_spark.streaming import list_window as lw


def _write_batch(src_dir: str, seq: int, rows: list[tuple[str, int, float]]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    pdf = pd.DataFrame(
        {
            "k": [k for k, _, _ in rows],
            "t": [t for _, t, _ in rows],
            "v": [v for _, _, v in rows],
        }
    )
    path = os.path.join(src_dir, f"batch-{seq:04d}.parquet")
    pdf.to_parquet(path)
    mtime = time.time() + seq * 0.01
    os.utime(path, (mtime, mtime))


def _expected_windows(per_key_rows: dict[str, list[tuple[int, float]]], n: int):
    """Reference semantics: deque(maxlen=n) per key, emit after each append."""
    out = []
    for k, rows in per_key_rows.items():
        buf: list[tuple[int, float]] = []
        for t, v in rows:
            buf.append((t, v))
            buf = buf[-n:]
            out.append((k, t, tuple(x[0] for x in buf), tuple(x[1] for x in buf)))
    return sorted(out)


def test_sliding_last_n_matches_deque_semantics(spark, tmp_path):
    src = str(tmp_path / "stream")
    # temperature shares t=0..4; pressure alternates (A8-style sparsity)
    _write_batch(src, 0, [("temperature", 0, 10.0), ("pressure", 0, 1.0)])
    _write_batch(src, 1, [("temperature", 1, 20.0)])
    _write_batch(src, 2, [("temperature", 2, 30.0), ("pressure", 2, 3.0)])
    _write_batch(src, 3, [("temperature", 3, 40.0)])
    _write_batch(src, 4, [("temperature", 4, 50.0), ("pressure", 4, 5.0)])

    stream = (
        spark.readStream.schema("k string, t long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        lw.sliding_last_n(stream, n=3)
        .writeStream.format("memory")
        .queryName("win3")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.k, r.t, tuple(r.win_ts), tuple(r.win_vs))
            for r in spark.sql("SELECT * FROM win3").collect()
        )
    finally:
        q.stop()

    expected = _expected_windows(
        {
            "temperature": [(0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0), (4, 50.0)],
            "pressure": [(0, 1.0), (2, 3.0), (4, 5.0)],
        },
        n=3,
    )
    assert got == expected
    # the A7 contract in one line: window at t=4 is the last 3, oldest first
    t4 = [g for g in got if g[0] == "temperature" and g[1] == 4][0]
    assert t4[2] == (2, 3, 4) and t4[3] == (30.0, 40.0, 50.0)


class _FakeListState:
    def __init__(self) -> None:
        self.rows: list[tuple] = []

    def get(self):
        return iter(self.rows)

    def put(self, rows):
        self.rows = list(rows)


class _FakeHandle:
    def __init__(self, state) -> None:
        self._state = state

    def getListState(self, name, schema):
        return self._state


def test_tws_processor_logic_matches_contract():
    """The ListState processor produces byte-identical windows to the
    GroupState implementation (unit-level: fake state, three batches)."""
    proc = lw.SlidingListProcessor(n=2)
    state = _FakeListState()
    proc.init(_FakeHandle(state))

    def feed(rows):
        pdf = pd.DataFrame({"t": [t for t, _ in rows], "v": [v for _, v in rows]})
        (out,) = list(proc.handleInputRows(("temperature",), iter([pdf]), None))
        return [
            (r.k, r.t, tuple(r.win_ts), tuple(r.win_vs))
            for r in out.itertuples(index=False)
        ]

    assert feed([(0, 1.0), (1, 2.0)]) == [
        ("temperature", 0, (0,), (1.0,)),
        ("temperature", 1, (0, 1), (1.0, 2.0)),
    ]
    # state persisted between batches; eviction at maxlen=2
    assert feed([(2, 3.0)]) == [("temperature", 2, (1, 2), (2.0, 3.0))]
    assert state.rows == [(1, 2.0), (2, 3.0)]


def test_tws_runtime_gated_on_protobuf(spark, tmp_path):
    src = str(tmp_path / "s2")
    _write_batch(src, 0, [("a", 0, 1.0)])
    stream = spark.readStream.schema("k string, t long, v double").parquet(src)
    if lw.have_transform_with_state():  # pragma: no cover - env w/ protobuf
        df = lw.sliding_last_n_tws(stream, n=2)
        assert df.schema.simpleString().startswith("struct<k:string,t:bigint")
    else:
        with pytest.raises(ImportError, match="protobuf"):
            lw.sliding_last_n_tws(stream, n=2)


# -- property: the processor IS a deque(maxlen=n), under any batching ----

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _batched_series(draw):
    """A monotonic (t, v) series split into arbitrary micro-batches."""
    n_rows = draw(st.integers(1, 30))
    ts = sorted(draw(st.sets(st.integers(0, 1000), min_size=n_rows, max_size=n_rows)))
    vs = draw(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=n_rows, max_size=n_rows))
    rows = list(zip(ts, vs))
    cuts = sorted(draw(st.sets(st.integers(1, n_rows - 1), max_size=5))) if n_rows > 1 else []
    batches, prev = [], 0
    for c in cuts + [n_rows]:
        batches.append(rows[prev:c])
        prev = c
    n = draw(st.integers(1, 6))
    return batches, n


@given(_batched_series())
@settings(max_examples=150, deadline=None)
def test_tws_processor_equals_deque_model(case):
    """Whatever the micro-batch boundaries, the processor's emitted
    windows equal the reference model: deque(maxlen=n) appended in t
    order (A6 guarantees monotone sends), emitted after each append."""
    from collections import deque

    batches, n = case
    proc = lw.SlidingListProcessor(n=n)
    state = _FakeListState()
    proc.init(_FakeHandle(state))

    got = []
    for batch in batches:
        if not batch:
            continue
        pdf = pd.DataFrame({"t": [t for t, _ in batch], "v": [v for _, v in batch]})
        (out,) = list(proc.handleInputRows(("k",), iter([pdf]), None))
        got.extend(
            (r.t, tuple(r.win_ts), tuple(r.win_vs))
            for r in out.itertuples(index=False)
        )

    model = deque(maxlen=n)
    expected = []
    for t, v in [r for b in batches for r in b]:
        model.append((t, v))
        expected.append((t, tuple(x[0] for x in model), tuple(x[1] for x in model)))
    assert got == expected


def test_sliding_window_on_rocksdb_state_store(spark, tmp_path):
    """Same stateful operator, production state backend: RocksDB state
    store (incremental checkpoints, state spills off-heap — the backend
    a 100 TB streaming deployment runs). Results must be identical to
    the default (HDFS-backed in-memory) provider."""
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    old = spark.conf.get(provider_conf, None)
    src = str(tmp_path / "stream")
    _write_batch(src, 0, [("a", 0, 1.0), ("b", 0, 9.0)])
    _write_batch(src, 1, [("a", 1, 2.0)])
    _write_batch(src, 2, [("a", 2, 3.0), ("b", 2, 7.0)])
    spark.conf.set(provider_conf, rocks)
    try:
        stream = (
            spark.readStream.schema("k string, t long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            lw.sliding_last_n(stream, n=2)
            .writeStream.format("memory")
            .queryName("win_rocks")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(
                (r.k, r.t, tuple(r.win_ts), tuple(r.win_vs))
                for r in spark.sql("SELECT * FROM win_rocks").collect()
            )
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset(provider_conf)
        else:
            spark.conf.set(provider_conf, old)
    assert got == _expected_windows(
        {"a": [(0, 1.0), (1, 2.0), (2, 3.0)], "b": [(0, 9.0), (2, 7.0)]}, n=2
    )
