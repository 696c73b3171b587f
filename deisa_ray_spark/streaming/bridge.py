"""Simulation-side ingest client: the Spark-engine replacement for the
reference's ``Bridge`` (bridge.py:138-584).

The reference pushes chunks into a Ray object store and routes refs
through actors; here the transport is a file-drop directory of chunk-row
parquet files consumed by Structured Streaming (SURVEY §1.5/§3.1 "Spark
shape"). One file per ``send`` keeps micro-batch granularity under the
engine's control via ``maxFilesPerTrigger`` (A13 backpressure analogue).

Writes are atomic (tmp file + rename) so a concurrently-running stream
never reads a partial file, and file mtimes are strictly increasing so
the file source's arrival order matches send order (the reference's
"Sends are ordered" assumption, docs/source/quick_start.rst).

No SparkSession is needed on the simulation side — chunks are written
with pyarrow directly; ranks of an MPI job can write concurrently.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Mapping
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deisa_ray_spark.errors import ContractError
from deisa_ray_spark.model import SENTINEL_ARRAY, validate_arrays_metadata

#: Engine-written analytics-progress marker inside the chunk dir
#: (atomic rename; read by the bridge's A15 lookahead gate).
PROGRESS_MARKER = ".analytics_progress.json"

#: Arrow schema of the chunk drop files (mirrors model.CHUNK_SCHEMA).
_ARROW_SCHEMA = pa.schema(
    [
        ("arr", pa.string()),
        ("t", pa.int64()),
        ("bridge_id", pa.int32()),
        ("pos", pa.list_(pa.int32())),
        ("chunk_shape", pa.list_(pa.int32())),
        ("global_shape", pa.list_(pa.int32())),
        ("dtype", pa.string()),
        ("data", pa.binary()),
    ]
)


class SparkBridge:
    """Declare arrays up front, then ``send`` chunks per timestep.

    Mirrors the reference contract (bridge.py:201-315): metadata is
    validated at construction (A2); sending an undeclared array raises
    ``ContractError``; ``close(timestep)`` emits the sentinel (A3).
    """

    def __init__(
        self,
        bridge_id: int,
        arrays_metadata: Mapping[str, Mapping[str, Any]],
        chunk_dir: str,
        feedback_dir: str | None = None,
        max_simulation_ahead: int | None = None,
        ahead_timeout: float = 100.0,
        ahead_poll: float = 0.05,
        feedback_queue_size: int | None = None,
    ) -> None:
        """``max_simulation_ahead``: opt-in ENFORCED lookahead bound — the
        simulation may create at most K timesteps beyond the last one the
        analytics dispatched. The reference documents this knob but never
        enforces it (head_node.py:33-37,87: attribute stored, the
        semaphore in the docstring does not exist); ``None`` (default)
        reproduces that no-op faithfully. When set, ``send`` of a
        too-new timestep blocks, polling the engine's progress marker,
        and raises ``TimeoutError`` after ``ahead_timeout`` seconds —
        the same block-then-raise shape as the reference's object-store
        admission control (bridge.py:90-121, default 100 s)."""
        self.bridge_id = int(bridge_id)
        self.metadata = validate_arrays_metadata(arrays_metadata)
        self.chunk_dir = chunk_dir
        self.feedback_dir = feedback_dir
        #: must match the engine's feedback_queue_size when set: the
        #: reference has ONE shared deque, so both sides must observe
        #: the same eviction horizon ("miss means evicted" parity)
        self.feedback_queue_size = feedback_queue_size
        self.max_simulation_ahead = max_simulation_ahead
        self.ahead_timeout = ahead_timeout
        self.ahead_poll = ahead_poll
        self._seq = 0
        self._last_t: int | None = None
        self._first_t: int | None = None
        os.makedirs(chunk_dir, exist_ok=True)

    def _analyzed_t(self) -> int | None:
        """Latest timestep the analytics dispatched (engine-written
        marker), or None before any dispatch."""
        path = os.path.join(self.chunk_dir, PROGRESS_MARKER)
        try:
            with open(path) as f:
                return int(json.load(f)["t"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _wait_for_lookahead(self, timestep: int) -> None:
        """Block until ``timestep`` is within ``max_simulation_ahead`` of
        analytics progress (A15 enforcement; anchor = first sent timestep
        so starting at any t works, A17)."""
        k = self.max_simulation_ahead
        if k is None:
            return
        anchor = self._first_t if self._first_t is not None else timestep
        deadline = time.monotonic() + self.ahead_timeout
        while True:
            analyzed = self._analyzed_t()
            floor = analyzed if analyzed is not None else anchor - 1
            if timestep - floor <= k:
                return
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"simulation {timestep - floor} timesteps ahead of analytics "
                    f"(analyzed={floor}, limit={k}) after {self.ahead_timeout}s"
                )
            time.sleep(self.ahead_poll)

    # -- send path ---------------------------------------------------------

    def send(self, array_name: str, chunk: np.ndarray, timestep: int) -> None:
        """Write one chunk row (reference bridge.py:343-407). Blocks only
        for the local file write — Spark-side flow control is the stream's
        ``maxFilesPerTrigger`` (A13)."""
        if array_name not in self.metadata:
            raise ContractError(f"undeclared array {array_name!r}")
        md = self.metadata[array_name]
        if tuple(chunk.shape) != md["chunk_shape"]:
            raise ContractError(
                f"{array_name}: chunk shape {chunk.shape} != declared {md['chunk_shape']}"
            )
        if self._last_t is not None and timestep < self._last_t:
            raise ContractError(
                f"out-of-order send: t={timestep} after t={self._last_t} (sends are ordered)"
            )
        if self._last_t is None or timestep > self._last_t:
            self._wait_for_lookahead(int(timestep))
        if self._first_t is None:
            self._first_t = int(timestep)
        self._last_t = int(timestep)
        self._write_row(
            arr=array_name,
            t=int(timestep),
            pos=list(md["chunk_position"]),
            chunk_shape=list(md["chunk_shape"]),
            global_shape=list(md["global_shape"]),
            dtype=chunk.dtype.name,
            data=np.ascontiguousarray(chunk).tobytes(),
        )

    def close(self, timestep: int) -> None:
        """End-of-stream sentinel: a 1x1 array named ``SENTINEL_ARRAY``
        (reference bridge.py:269-274,425-459). Only one bridge (id 0 by
        convention, like rank 0) should call this."""
        self._write_row(
            arr=SENTINEL_ARRAY,
            t=int(timestep),
            pos=[0, 0],
            chunk_shape=[1, 1],
            global_shape=[1, 1],
            dtype="int64",
            data=np.zeros((1, 1), dtype=np.int64).tobytes(),
        )

    def _write_row(self, **row: Any) -> None:
        row["bridge_id"] = self.bridge_id
        table = pa.Table.from_pandas(pd.DataFrame([row]), schema=_ARROW_SCHEMA, preserve_index=False)
        fname = f"chunk-{self.bridge_id:04d}-{self._seq:08d}-{uuid.uuid4().hex[:8]}.parquet"
        self._seq += 1
        # Drop files land under arr_<arr>/t_<t>/: the data plane then
        # reads ONE directory per (array, timestep) — O(its chunks), not
        # O(every file ever sent). A flat drop dir makes each boundary's
        # pruned scan list + footer-read the whole history (quadratic
        # over a run); the subdir layout keeps 10^5-timestep runs flat.
        # The streaming control plane scans the root recursively. The
        # ``arr_`` prefix matters: Spark silently ignores paths starting
        # with '_' or '.', and the sentinel array name starts with '__'.
        subdir = os.path.join(self.chunk_dir, f"arr_{row['arr']}", f"t_{row['t']}")
        os.makedirs(subdir, exist_ok=True)
        tmp = os.path.join(subdir, f".{fname}.tmp")
        pq.write_table(table, tmp)
        final = os.path.join(subdir, fname)
        os.rename(tmp, final)
        # Strictly-increasing mtime => file-source arrival order == send
        # order even within the same clock tick.
        ts = time.time()
        SparkBridge._mtime_counter = max(getattr(SparkBridge, "_mtime_counter", 0.0) + 0.001, ts)
        os.utime(final, (SparkBridge._mtime_counter, SparkBridge._mtime_counter))

    # -- feedback read path (A12) -----------------------------------------

    def get(self, key: str, timestep: int | None = None, default: Any = None) -> Any:
        """Feedback lookup (reference bridge.py:525-584): exact-t value,
        or the full queue oldest→newest when ``timestep`` is None;
        ``default`` on miss. Best-effort by contract (the reference
        explicitly disclaims read-your-writes timing)."""
        if self.feedback_dir is None:
            raise ValueError("bridge constructed without feedback_dir")
        from deisa_ray_spark.streaming.feedback import (
            DEFAULT_QUEUE_SIZE,
            read_feedback,
        )

        size = (
            self.feedback_queue_size
            if self.feedback_queue_size is not None
            else DEFAULT_QUEUE_SIZE
        )
        return read_feedback(self.feedback_dir, key, timestep, default, size)


def metadata_for_grid(
    arrays: tuple[str, ...],
    global_shape: tuple[int, ...],
    chunk_shape: tuple[int, ...],
    chunk_position: tuple[int, ...],
) -> dict[str, dict[str, tuple[int, ...]]]:
    """Convenience: same layout for every array (the common MPI case)."""
    return {
        a: {
            "global_shape": global_shape,
            "chunk_shape": chunk_shape,
            "chunk_position": chunk_position,
        }
        for a in arrays
    }


def feedback_value_to_json(value: Any) -> str:
    """Feedback values are small JSON-able objects in this engine (the
    reference allows arbitrary Python; JSON keeps the table queryable)."""
    return json.dumps(value)
