"""Executor-side sliding list window (A7) as a distributed stateful
operator.

The reference keeps the last N timesteps of each array in a driver-side
``collections.deque(maxlen=size)`` and hands callbacks the oldest→newest
list (types.py:180-201, window_handler.py:272-293). The in-situ engine
mirrors that dispatch loop (engine.py); THIS module is the scale path:
the same deque semantics as keyed state inside Structured Streaming, so
window maintenance shards across executors by key instead of serializing
through one driver loop — with 10^6 arrays/keys the driver never touches
per-key state.

Two implementations of the same contract:

- ``sliding_last_n`` — ``applyInPandasWithState`` (GroupState), runs in
  this environment. State per key = the last N (t, v) pairs as two
  parallel arrays; arrival order within a micro-batch is resolved by
  sorting on t (the reference asserts monotonic sends — A6 — so t-order
  IS arrival order).
- ``sliding_last_n_tws`` — ``transformWithStateInPandas`` (ListState,
  Spark 4 state-v2 API): the direct analog of the reference's deque —
  but its Python protocol requires ``google.protobuf``, absent in this
  container, so it is import-gated exactly like the h5py/zarr sinks.
  The processor class itself is defined unconditionally (pure Python)
  and unit-testable; only *running* it needs protobuf.

Emission contract (both): for every input row (k, t, v), one output row
``(k, t, win_ts, win_vs)`` where win_* are the window contents ending at
t, oldest→newest, length min(n, #rows so far) — i.e. exactly what the
reference's callback receives as ``list[DeisaArray]`` per boundary.

Scale notes (100 TB): state per key is O(N) scalars regardless of stream
length (the deque bound, A16); the shuffle is one hash exchange on the
key; payloads stay in the value column (for array streams, send a
summary or a storage pointer through the window, not the chunk bytes —
same discipline as the engine's metadata-projection control plane).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd
from pyspark.sql import DataFrame

#: Output schema shared by both implementations.
WINDOW_SCHEMA = "k string, t bigint, win_ts array<bigint>, win_vs array<double>"
#: GroupState layout: parallel arrays = the deque.
_STATE_SCHEMA = "ts array<bigint>, vs array<double>"


def have_transform_with_state() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    server protocol (pyspark/sql/streaming/proto/StateMessage_pb2)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _window_fn(n: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts, vs = state.get
            buf = list(zip(ts, vs))
        else:
            buf = []
        out_t, out_wts, out_wvs = [], [], []
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["t"], pdf["v"]))
        rows.sort()  # A6: t-order == send order (monotonic sends)
        for t, v in rows:
            buf.append((int(t), float(v)))
            buf = buf[-n:]
            out_t.append(int(t))
            out_wts.append([x[0] for x in buf])
            out_wvs.append([x[1] for x in buf])
        state.update(([x[0] for x in buf], [x[1] for x in buf]))
        yield pd.DataFrame(
            {
                "k": [key[0]] * len(out_t),
                "t": out_t,
                "win_ts": out_wts,
                "win_vs": out_wvs,
            }
        )

    return fn


def sliding_last_n(stream: DataFrame, n: int) -> DataFrame:
    """Keyed sliding window of the last ``n`` values over a stream with
    columns (k string, t long, v double). See module docstring."""
    return stream.groupBy("k").applyInPandasWithState(
        _window_fn(n),
        outputStructType=WINDOW_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


class SlidingListProcessor:
    """StatefulProcessor twin for ``transformWithStateInPandas`` — the
    reference deque as a real ListState("win", "t long, v double").

    Defined without importing pyspark's StatefulProcessor base (that
    import chain is safe, but *executing* the operator needs
    google.protobuf) — duck-typed: transformWithStateInPandas only calls
    init/handleInputRows/close.
    """

    def __init__(self, n: int) -> None:
        self.n = n

    def init(self, handle) -> None:
        self.win = handle.getListState("win", "t long, v double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        buf = [(int(r[0]), float(r[1])) for r in self.win.get()]
        incoming = []
        for pdf in rows:
            incoming.extend(zip(pdf["t"], pdf["v"]))
        incoming.sort()
        out_t, out_wts, out_wvs = [], [], []
        for t, v in incoming:
            buf.append((int(t), float(v)))
            buf = buf[-self.n :]
            out_t.append(int(t))
            out_wts.append([x[0] for x in buf])
            out_wvs.append([x[1] for x in buf])
        self.win.put(buf)
        yield pd.DataFrame(
            {
                "k": [key[0]] * len(out_t),
                "t": out_t,
                "win_ts": out_wts,
                "win_vs": out_wvs,
            }
        )

    def close(self) -> None:
        pass


def sliding_last_n_tws(stream: DataFrame, n: int) -> DataFrame:
    """ListState implementation (state-v2). Raises ImportError without
    google.protobuf — same gating convention as sinks.to_hdf5/to_zarr."""
    if not have_transform_with_state():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (not "
            "installed in this environment); use sliding_last_n (the "
            "applyInPandasWithState implementation of the same contract)"
        )
    return stream.groupBy("k").transformWithStateInPandas(
        statefulProcessor=SlidingListProcessor(n),
        outputStructType=WINDOW_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
