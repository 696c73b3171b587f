"""Feedback channel: keyed (timestep, value) queues with strict-increase
enforcement and fixed-size eviction (A11/A12).

Reference semantics (head_node.py:96-97,213-303):
- per-key deque with maxlen = feedback_queue_size (default 1024, > 0),
- ``set`` with t <= the stored max t for that key raises,
- ``get(key, t)`` is an exact-t lookup with default-on-miss;
  ``get(key)`` returns the whole queue oldest→newest.

Storage is a parquet directory of tiny append-only files (one per set) —
the feedback table is small by contract (small JSON values, bounded
queue), so reads scan the directory with pyarrow; no SparkSession is
needed on either side, which lets the simulation poll feedback without a
JVM. At cluster scale this table is broadcast-size by construction.
Eviction is applied at read time (retention beyond queue_size is invisible
to readers, matching deque semantics observably).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_QUEUE_SIZE = 1024

_SCHEMA = pa.schema([("key", pa.string()), ("t", pa.int64()), ("value", pa.string())])


def _read_all(feedback_dir: str) -> pd.DataFrame:
    if not os.path.isdir(feedback_dir):
        return pd.DataFrame({"key": [], "t": [], "value": []})
    files = [
        os.path.join(feedback_dir, f)
        for f in os.listdir(feedback_dir)
        if f.endswith(".parquet")
    ]
    if not files:
        return pd.DataFrame({"key": [], "t": [], "value": []})
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


class FeedbackStore:
    """Analytics-side feedback writer (reference ``Deisa.set``,
    window_handler.py:455-483)."""

    def __init__(self, feedback_dir: str, queue_size: int = DEFAULT_QUEUE_SIZE) -> None:
        if queue_size <= 0:
            raise ValueError("feedback_queue_size must be > 0")
        self.feedback_dir = feedback_dir
        self.queue_size = queue_size
        os.makedirs(feedback_dir, exist_ok=True)
        #: max t seen per key — the strict-increase guard (head_node.py:244-260).
        self._max_t: dict[str, int] = {}
        existing = _read_all(feedback_dir)
        if len(existing):
            self._max_t = existing.groupby("key")["t"].max().astype(int).to_dict()

    def set(self, key: str, value: Any, timestep: int) -> None:
        t = int(timestep)
        prev = self._max_t.get(key)
        if prev is not None and t <= prev:
            raise ValueError(
                f"feedback timesteps must be strictly increasing per key: "
                f"key={key!r} t={t} <= stored max {prev}"
            )
        self._max_t[key] = t
        table = pa.Table.from_pandas(
            pd.DataFrame([{"key": key, "t": t, "value": json.dumps(value)}]),
            schema=_SCHEMA,
            preserve_index=False,
        )
        fname = f"fb-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.feedback_dir, f".{fname}.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.feedback_dir, fname))

    def get(self, key: str, timestep: int | None = None, default: Any = None) -> Any:
        return read_feedback(self.feedback_dir, key, timestep, default, self.queue_size)


def read_feedback(
    feedback_dir: str,
    key: str,
    timestep: int | None = None,
    default: Any = None,
    queue_size: int = DEFAULT_QUEUE_SIZE,
) -> Any:
    """Shared read path (bridge + store): exact-t lookup or full queue
    (reference bridge.py:525-584, head_node.py:263-303)."""
    df = _read_all(feedback_dir)
    rows = df[df["key"] == key].sort_values("t")
    rows = rows.tail(queue_size)  # deque eviction, observably identical
    if timestep is None:
        if not len(rows):
            return default
        return [(int(t), json.loads(v)) for t, v in zip(rows["t"], rows["value"])]
    hit = rows[rows["t"] == int(timestep)]
    if not len(hit):
        return default
    return json.loads(hit["value"].iloc[-1])
