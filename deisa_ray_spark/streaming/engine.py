"""Analytics-side in-situ engine: stateful assembly/trigger operator +
windowed callback dispatch (the reference's ``Deisa`` +
``execute_callbacks``, window_handler.py:75-405).

Architecture (SURVEY §3.1 "Spark shape"):

- **Control plane** — ``applyInPandasWithState`` over the *metadata
  projection* of the chunk stream (the ``data`` column is dropped before
  the shuffle, so payload bytes never flow through the stateful task —
  the same property as the reference, where actors pass ObjectRefs and
  "chunk payloads never pass through the actors", SURVEY §1.3). The
  single-group state mirrors the reference's single head actor: per-(arr,
  t) arrival counts (A4 completeness), current-timestep boundary (A5),
  monotonicity enforcement (A6 — *fails the run*, not drop-late-data),
  sentinel handling (A3), start-at-any-timestep bootstrap (A17).
- **Data plane** — callbacks receive ``ArrayFrame`` handles that read the
  chunk store lazily, filtered by (arr, t); at scale those reads are
  partition-pruned parquet scans executed across the cluster, exactly
  like any other DataFrame.
- **Dispatch** — driver-side (like the reference's pull loop, which runs
  on the analytics driver): per-array deques of the last N timesteps
  (A7), AND/OR gating (A8), registration-order multi-callback dispatch
  (A9), exception policy (A10), feedback publication (A11).
"""

from __future__ import annotations

import json
import os
from collections import deque
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.errors import ContractError, OrderingError
from deisa_ray_spark.model import (
    CHUNK_SCHEMA,
    SENTINEL_ARRAY,
    explode_chunks,
    explode_chunks_nd,
)
from deisa_ray_spark.streaming.feedback import DEFAULT_QUEUE_SIZE, FeedbackStore
from deisa_ray_spark.streaming.lazy import LazyArray, LazyScalar

_ORDERING_MARKER = "DEISA_ORDERING_VIOLATION"
_CONTRACT_MARKER = "DEISA_CONTRACT_VIOLATION"

#: Event rows emitted by the control-plane operator. ``win_ts`` is the
#: JSON list of timesteps in the array's sliding window as of this
#: event — maintained INSIDE the operator's keyed state (the
#: list_window.py deque-as-state shape), so window membership lives in
#: the checkpoint, not in driver object graphs.
_EVENT_SCHEMA = "t bigint, arr string, n_chunks int, event string, win_ts string"
_STATE_SCHEMA = "state string"


@dataclass(frozen=True)
class ArrayWindow:
    """Sliding-window request: the last ``size`` shared timesteps of one
    array, oldest→newest (reference ``Window(name, size)``,
    types.py:180-201)."""

    name: str
    size: int = 1

    def __post_init__(self) -> None:
        if self.size < 1:
            raise ValueError("window size must be >= 1")


class ArrayFrame:
    """A distributed array at one timestep: lazy handle over the chunk
    store (the engine's ``DeisaArray`` — a DataFrame + ``.t`` instead of a
    dask.Array + ``.t``, reference types.py:206-269)."""

    def __init__(
        self,
        spark: SparkSession,
        chunk_dir: str,
        name: str,
        t: int,
        loader: Callable[[str, int], DataFrame] | None = None,
    ) -> None:
        self._spark = spark
        self.chunk_dir = chunk_dir
        self.name = name
        self.t = int(t)
        self._loader = loader

    def chunks(self) -> DataFrame:
        """Chunk rows of this (array, timestep) — reads exactly this
        group's drop subdirectory ``<arr>/<t>/`` (O(its chunks) listing,
        independent of run length), or the injected loader when the
        chunk store is not a parquet drop dir (e.g. the sim_grid
        source)."""
        if self._loader is not None:
            return self._loader(self.name, self.t)
        path = os.path.join(self.chunk_dir, f"arr_{self.name}", f"t_{self.t}")
        return self._spark.read.schema(CHUNK_SCHEMA).parquet(path)

    def cells(self) -> DataFrame:
        """Long-form ``(arr, t, x, y, value)`` cells (never densifies).
        2-D hot path; any-rank arrays use :meth:`cells_nd`."""
        return explode_chunks(self.chunks())

    def cells_nd(self) -> DataFrame:
        """Rank-agnostic long form ``(arr, t, coord, value)`` with
        ``coord`` the global index vector — the distributed surface for
        N-D fields (grid_ops' N-d axis ops consume exactly this)."""
        return explode_chunks_nd(self.chunks())

    # -- lazy compute verbs (the reference's dask idiom: build the
    #    expression now, ``.compute()`` later — quick_start.rst
    #    ``latest.mean().compute()``). Each runs ONE distributed
    #    aggregate over the cells, so the callback idiom ports verbatim
    #    and never densifies; ``std`` is population (ddof=0), the
    #    reference's contract (tests/test_analytics.py:42). ------------

    def _lazy_agg(self, agg_col) -> "LazyScalar":
        # explode_chunks_nd, not cells(): the whole-array aggregate
        # needs no coordinates, and the N-d exploder works at ANY rank
        # (cells() is the 2-D hot path and would reject a 3-D field
        # the engine otherwise transports fine)
        def run() -> float:
            v = explode_chunks_nd(self.chunks()).agg(agg_col.alias("v")).first()["v"]
            if v is None:  # empty chunk set aggregates to NULL — match
                # the descriptive to_numpy() error, not an opaque float(None)
                raise ValueError(f"no chunks for ({self.name}, t={self.t})")
            return float(v)

        return LazyScalar(run)

    def mean(self) -> "LazyScalar":
        return self._lazy_agg(F.avg("value"))

    def sum(self) -> "LazyScalar":
        return self._lazy_agg(F.sum("value"))

    def min(self) -> "LazyScalar":
        return self._lazy_agg(F.min("value"))

    def max(self) -> "LazyScalar":
        return self._lazy_agg(F.max("value"))

    def std(self) -> "LazyScalar":
        return self._lazy_agg(F.stddev_pop("value"))

    # -- expression surface (reference tests/test_analytics.py:25-102:
    #    arithmetic incl. reflected forms, comparisons as elementwise
    #    lazy masks, slicing, .T, @, **, unary, clip, astype, persist —
    #    the dask idioms a ported callback uses verbatim). Delegates to
    #    ONE cached streaming.lazy.LazyArray handle per frame, so a
    #    frame referenced from many subexpressions materializes its
    #    dense form once per callback, dask-graph style. A frame kept
    #    in a sliding window thus holds its dense cache for the window
    #    lifetime — memory is bounded by window_size × global_shape,
    #    the same bound as the reference's deque of in-store dask
    #    arrays (A7/A16). ``.compute()``
    #    lands driver-side, the same place the reference's dask
    #    compute() lands, bounded by the declared global_shape.
    #    Distributed twins: grid_ops. ---------------------------------

    __array_ufunc__ = None  # ndarray OP frame → our reflected op
    __array_priority__ = 1000

    def _lazy(self) -> LazyArray:
        handle = self.__dict__.get("_lazy_handle")
        if handle is None:
            handle = LazyArray(self.to_numpy)
            self.__dict__["_lazy_handle"] = handle
        return handle

    def compute(self) -> np.ndarray:
        """The reference's ``DeisaArray.compute()`` — dense ndarray."""
        return self.to_numpy()

    def persist(self):
        """Materialize once; further verbs reuse the result (reference
        ``d_arr.persist()``, tests/test_analytics.py:29-38)."""
        return self._lazy().persist()

    def __mul__(self, o):
        return self._lazy() * o

    __rmul__ = __mul__

    def __add__(self, o):
        return self._lazy() + o

    __radd__ = __add__

    def __sub__(self, o):
        return self._lazy() - o

    def __rsub__(self, o):
        return self._lazy().__rsub__(o)

    def __truediv__(self, o):
        return self._lazy() / o

    def __rtruediv__(self, o):
        return self._lazy().__rtruediv__(o)

    def __matmul__(self, o):
        return self._lazy() @ o

    def __rmatmul__(self, o):
        return self._lazy().__rmatmul__(o)

    def __pow__(self, o):
        return self._lazy() ** o

    def __neg__(self):
        return -self._lazy()

    def __abs__(self):
        return abs(self._lazy())

    def __gt__(self, o):
        return self._lazy() > o

    def __lt__(self, o):
        return self._lazy() < o

    def __ge__(self, o):
        return self._lazy() >= o

    def __le__(self, o):
        return self._lazy() <= o

    def __eq__(self, o):  # elementwise lazy mask, not identity
        return self._lazy() == o

    def __ne__(self, o):
        return self._lazy() != o

    __hash__ = object.__hash__

    def __getitem__(self, idx):
        return self._lazy()[idx]

    @property
    def T(self):  # noqa: N802 — numpy/dask name
        return self._lazy().T

    def astype(self, dtype):
        return self._lazy().astype(dtype)

    def clip(self, lo, hi):
        return self._lazy().clip(lo, hi)

    def to_numpy(self) -> np.ndarray:
        """Assemble the dense tensor driver-side (bounded by the declared
        global_shape — the analogue of calling ``.compute()`` on the
        reference's DeisaArray).

        Drop-dir mode reads the group's subdirectory directly with
        pyarrow — the result lands on the analytics driver either way
        (exactly like the reference's ``.compute()``), so launching a
        Spark job per boundary only adds ~100 ms of scheduling to every
        timestep. Distributed analytics still go through
        ``chunks()``/``cells()`` (real DataFrame scans)."""
        if self._loader is None:
            import glob as _glob

            import pyarrow.parquet as _pq

            pattern = os.path.join(
                self.chunk_dir, f"arr_{self.name}", f"t_{self.t}", "*.parquet"
            )
            files = [
                f for f in _glob.glob(pattern)
                if not os.path.basename(f).startswith(".")
            ]
            if not files:
                raise ValueError(f"no chunks for ({self.name}, t={self.t})")
            out = None
            for f in files:
                tbl = _pq.read_table(f)
                for row in tbl.to_pylist():
                    cshape = tuple(row["chunk_shape"])
                    dt = np.dtype(row["dtype"])
                    if out is None:
                        out = np.empty(tuple(row["global_shape"]), dtype=dt)
                    block = np.frombuffer(row["data"], dtype=dt).reshape(cshape)
                    sl = tuple(
                        slice(p * c, (p + 1) * c)
                        for p, c in zip(row["pos"], cshape)
                    )
                    out[sl] = block
            return out
        rows = self.chunks().collect()
        if not rows:
            raise ValueError(f"no chunks for ({self.name}, t={self.t})")
        gshape = tuple(rows[0]["global_shape"])
        cshape = tuple(rows[0]["chunk_shape"])
        out = np.empty(gshape, dtype=np.dtype(rows[0]["dtype"]))
        for r in rows:
            block = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(cshape)
            sl = tuple(slice(p * c, (p + 1) * c) for p, c in zip(r["pos"], cshape))
            out[sl] = block
        return out

    # -- sinks (reference DeisaArray.to_zarr / .to_hdf5 methods,
    #    types.py:271-336: the array handle carries its own save verbs) --

    def to_zarr(
        self,
        url: str,
        component: str | None = None,
        mode: str = "a",
        region: tuple[slice, ...] | None = None,
    ) -> None:
        """Save this (array, timestep) to a zarr store — method form of
        ``sinks.to_zarr`` with the reference's defaults (mode='a')."""
        from deisa_ray_spark import sinks

        sinks.to_zarr(self.chunks(), url, component=component, mode=mode, region=region)

    def to_hdf5(self, fname: str, dataset: str) -> None:
        """Save this (array, timestep) as an HDF5 virtual dataset —
        method form of ``sinks.to_hdf5``."""
        from deisa_ray_spark import sinks

        sinks.to_hdf5(self.chunks(), fname, dataset)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ArrayFrame({self.name!r}, t={self.t})"


@dataclass
class _CallbackConfig:
    fn: Callable[..., None]
    windows: tuple[ArrayWindow, ...]
    when: str
    exception_handler: Callable[[BaseException], None] | None
    calls: int = 0


def _make_control_plane(window_sizes: dict[str, int] | None = None):
    """Build the stateful control-plane body: completeness counting,
    boundary detection, ordering enforcement, sentinel, and sliding-
    window membership. Pure metadata — tiny rows, one group.

    ``window_sizes`` maps array → max requested window size (default 1):
    the operator keeps the last-N timestep list per array in its keyed
    state — the executor-side deque of list_window.py — and stamps it on
    every ready event, so the ``state`` window backend can build frames
    from the event alone and a checkpoint restart recovers membership.

    Raises through the query (failing the run) on ordering violations —
    the reference raises RuntimeError("Logical flow of data was
    violated…") rather than dropping late data (window_handler.py:348-351).
    """
    sizes = dict(window_sizes or {})

    def _control_plane(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        st = json.loads(state.get[0]) if state.exists else {
            "t_cur": None,  # open timestep (None until first assembly, A17)
            "closed_t": None,  # newest closed timestep
            "counts": {},  # "arr|t" -> [distinct arrived chunk positions]
            "expected": {},  # arr -> nb_chunks of the declared grid
            "open": {},  # str(t) -> {arr: n_chunks} assembled, not yet closed
            "win": {},  # arr -> last-N closed timesteps (deque-as-state, A7)
            "done": False,
        }
        st.setdefault("win", {})  # pre-r5 checkpoints lack the key
        events: list[dict] = []

        def close_upto(limit_t: int | None) -> None:
            """Emit ready events for every assembled timestep < limit_t
            (None = all), oldest first."""
            for ts in sorted(int(k) for k in st["open"]):
                if limit_t is not None and ts >= limit_t:
                    continue
                for arr, n in sorted(st["open"][str(ts)].items()):
                    w = st["win"].setdefault(arr, [])
                    w.append(ts)
                    del w[: -max(int(sizes.get(arr, 1)), 1)]
                    events.append(
                        {
                            "t": ts,
                            "arr": arr,
                            "n_chunks": n,
                            "event": "ready",
                            "win_ts": json.dumps(w),
                        }
                    )
                st["closed_t"] = ts
                del st["open"][str(ts)]

        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(pdf.itertuples(index=False))
        rows.sort(key=lambda r: int(r.t))  # arrival order: per-file batches + t

        sentinel_t: int | None = None
        for r in rows:
            t = int(r.t)
            if r.arr == SENTINEL_ARRAY:
                sentinel_t = t if sentinel_t is None else max(sentinel_t, t)
                continue
            grid = [g // c for g, c in zip(r.global_shape, r.chunk_shape)]
            expected = int(np.prod(grid))
            prev = st["expected"].setdefault(r.arr, expected)
            if prev != expected:
                raise ContractError(
                    f"{_CONTRACT_MARKER}: {r.arr}: grid changed {prev} -> {expected}"
                )
            ck = f"{r.arr}|{t}"
            # completeness = DISTINCT positions, not arrival count: a crashed
            # bridge that re-sends its chunk (new file, same pos) must not
            # both mark the timestep complete early (with a real position
            # still missing -> uninitialized-garbage assembly) and phantom-
            # complete it a second time later (-> spurious OrderingError)
            if r.arr in st["open"].get(str(t), {}):
                # resend noise for an assembled-but-not-yet-closed timestep.
                # (A resend arriving after CLOSE still accumulates and, if it
                # ever re-completes, aborts via the ordering check below —
                # the reference's conservative stance on genuinely-late data.)
                continue
            pos_key = ",".join(str(int(p)) for p in r.pos)
            seen = st["counts"].setdefault(ck, [])
            if pos_key not in seen:
                seen.append(pos_key)
            if len(seen) < expected:
                continue
            # assembled (A4 completeness reached)
            del st["counts"][ck]
            if st["t_cur"] is not None and t < st["t_cur"]:
                # The reference raises on pulling an assembled array older than
                # the current timestep, whether or not it was "closed"
                # (window_handler.py:348-351).
                raise OrderingError(
                    f"{_ORDERING_MARKER}: array ({r.arr}, t={t}) completed after "
                    f"timestep {st['t_cur']} was current — logical flow of data "
                    "was violated (sends must be ordered)"
                )
            st["open"].setdefault(str(t), {})[r.arr] = expected
            if st["t_cur"] is None:
                st["t_cur"] = t  # bootstrap from first arrival (A17)
            elif t > st["t_cur"]:
                close_upto(t)  # boundary: a newer assembly closes older ts (A5)
                st["t_cur"] = t

        if sentinel_t is not None:
            close_upto(None)  # sentinel closes everything buffered (A3)
            events.append(
                {
                    "t": sentinel_t,
                    "arr": SENTINEL_ARRAY,
                    "n_chunks": 0,
                    "event": "sentinel",
                    "win_ts": "[]",
                }
            )
            st["done"] = True

        state.update((json.dumps(st),))
        if events:
            yield pd.DataFrame(events, columns=["t", "arr", "n_chunks", "event", "win_ts"])

    return _control_plane


class InSituEngine:
    """Register callbacks over sliding windows, then consume a chunk drop
    directory as a stream (reference ``Deisa`` + ``register_callback`` +
    ``execute_callbacks``)."""

    def __init__(
        self,
        spark: SparkSession,
        chunk_dir: str,
        feedback_dir: str | None = None,
        feedback_queue_size: int = DEFAULT_QUEUE_SIZE,
        max_simulation_ahead: int = 1,
        chunk_stream: DataFrame | None = None,
        chunk_loader: Callable[[str, int], DataFrame] | None = None,
        window_backend: str = "driver",
    ) -> None:
        #: A15 parity: accepted and stored but NOT enforced — faithful to
        #: the reference, where the documented semaphore does not exist
        #: (head_node.py:33-37,87: attribute stored, arrays_ready queue
        #: unbounded). Flow control lives in the source instead
        #: (maxFilesPerTrigger, A13).
        self.max_simulation_ahead = max_simulation_ahead
        self.spark = spark
        self.chunk_dir = chunk_dir
        # A18 (startup order independence): analytics may start before
        # any bridge exists. Creating the drop dir here means the first
        # poll sees an empty-but-valid source instead of PATH_NOT_FOUND.
        if chunk_stream is None:
            os.makedirs(chunk_dir, exist_ok=True)
        #: Alternative chunk transports: a streaming DataFrame of
        #: CHUNK_SCHEMA rows for the control plane (e.g. the sim_grid
        #: source) + a matching (arr, t) -> DataFrame loader for the
        #: data plane. Default (None, None) = the parquet drop dir.
        self._chunk_stream = chunk_stream
        self._chunk_loader = chunk_loader
        #: A7 window maintenance: "driver" keeps a deque of live
        #: ArrayFrames per array (frames reuse their dense cache across
        #: boundaries — memory bounded by window × global_shape on the
        #: driver); "state" keeps ONLY the timestep membership list,
        #: maintained inside the control-plane operator's keyed state
        #: (list_window.py's deque-as-state shape) and rebuilds frames
        #: per dispatch — no dense arrays retained across boundaries, so
        #: large window×array products survive driver-memory pressure,
        #: and membership rides the streaming checkpoint across restarts.
        if window_backend not in ("driver", "state"):
            raise ValueError("window_backend must be 'driver' or 'state'")
        self.window_backend = window_backend
        self.callbacks: list[_CallbackConfig] = []
        self.feedback = (
            FeedbackStore(feedback_dir, feedback_queue_size) if feedback_dir else None
        )
        self._windows: dict[str, deque[ArrayFrame]] = {}
        #: state backend: array -> window timestep list (ints only),
        #: refreshed from each ready event's ``win_ts`` stamp.
        self._win_ts: dict[str, list[int]] = {}
        self._new_at_boundary: set[str] = set()
        self.done = False
        self._boundary_count = 0  # progress signal for run()'s stall gate

    # -- registration (A9) -------------------------------------------------

    def register_callback(
        self,
        fn: Callable[..., None],
        *windows: ArrayWindow | str,
        when: str = "AND",
        exception_handler: Callable[[BaseException], None] | None = None,
    ) -> Callable[..., None]:
        """Register ``fn`` over the given windows. Specs may be
        ``ArrayWindow`` objects or bare array names (size-1 windows),
        freely mixed; returns ``fn`` — both contracts from reference
        tests/test_callback_registration.py:46-59."""
        if when not in ("AND", "OR"):
            raise ValueError("when must be 'AND' or 'OR'")
        # Accept the reference QUICKSTART's documented list form —
        # register_callback(cb, [Window(...), ...]) — alongside the
        # varargs form its code actually implements. (The reference
        # SKIPS non-Window/str varargs silently, so its own doc example
        # registers an empty spec — docs/source/quick_start.rst:112-115
        # vs window_handler.py:255-259; here the documented form works
        # and junk raises instead of vanishing.)
        flat: list = []
        for w in windows:
            if isinstance(w, (list, tuple)):
                flat.extend(w)
            else:
                flat.append(w)
        if not flat:
            raise ValueError("at least one ArrayWindow is required")
        for w in flat:
            if not isinstance(w, (ArrayWindow, str)):
                raise TypeError(
                    f"window spec must be ArrayWindow or str, got {type(w).__name__}"
                )
        normalized = tuple(
            ArrayWindow(w) if isinstance(w, str) else w for w in flat
        )
        self.callbacks.append(_CallbackConfig(fn, normalized, when, exception_handler))
        return fn

    def register(
        self,
        *windows: ArrayWindow | str,
        when: str = "AND",
        exception_handler: Callable[[BaseException], None] | None = None,
    ) -> Callable[[Callable[..., None]], Callable[..., None]]:
        """Decorator form — reference ``@d.register("arr1",
        Window("arr2", 5))`` (tests/test_callback_registration.py:5-44):

            @engine.register("temperature", ArrayWindow("pressure", 2))
            def cb(temperature, pressure): ...
        """

        def deco(fn: Callable[..., None]) -> Callable[..., None]:
            return self.register_callback(
                fn, *windows, when=when, exception_handler=exception_handler
            )

        return deco

    # -- feedback publish (A11) -------------------------------------------

    def set(self, key: str, value: Any, timestep: int) -> None:
        if self.feedback is None:
            raise ValueError("engine constructed without feedback_dir")
        self.feedback.set(key, value, timestep)

    # -- dispatch (driver-side, mirrors the reference pull loop) ----------

    def _max_window(self, arr: str) -> int:
        sizes = [w.size for cfg in self.callbacks for w in cfg.windows if w.name == arr]
        return max(sizes, default=1)

    def _should_call(self, cfg: _CallbackConfig, new_arrays: set[str]) -> bool:
        """AND/OR gating (reference window_handler.py:432-453): AND = all
        requested arrays have a new share at this boundary; OR = all seen
        at least once and any has a new share (stale windows reused)."""
        names = [w.name for w in cfg.windows]
        if cfg.when == "AND":
            return all(n in new_arrays for n in names)
        seen = self._win_ts if self.window_backend == "state" else self._windows
        all_seen = all(len(seen.get(n, ())) > 0 for n in names)
        return all_seen and any(n in new_arrays for n in names)

    def _dispatch_boundary(
        self,
        t: int,
        new_arrays: set[str],
        win_map: dict[str, list[int]] | None = None,
    ) -> None:
        self._boundary_count += 1
        if self.window_backend == "state":
            # authoritative membership arrived WITH the event (operator
            # keyed state); the driver keeps only int lists
            for arr, ts_list in (win_map or {}).items():
                self._win_ts[arr] = [int(x) for x in ts_list]
        else:
            for arr in sorted(new_arrays):
                dq = self._windows.setdefault(
                    arr, deque(maxlen=self._max_window(arr))
                )
                dq.append(
                    ArrayFrame(self.spark, self.chunk_dir, arr, t, self._chunk_loader)
                )
        for cfg in self.callbacks:
            if not self._should_call(cfg, new_arrays):
                continue
            if self.window_backend == "state":
                # fresh frames per dispatch: dense caches live for one
                # callback, not the window lifetime
                kwargs = {
                    w.name: [
                        ArrayFrame(
                            self.spark, self.chunk_dir, w.name, ts, self._chunk_loader
                        )
                        for ts in self._win_ts.get(w.name, [])[-w.size :]
                    ]
                    for w in cfg.windows
                }
            else:
                kwargs = {
                    w.name: list(self._windows[w.name])[-w.size :]
                    for w in cfg.windows
                }
            cfg.calls += 1
            try:
                cfg.fn(**kwargs)
            except (TimeoutError, AssertionError):
                raise  # escalate so broken analytics fail the run (A10)
            except Exception as exc:  # noqa: BLE001
                if cfg.exception_handler is None:
                    raise
                cfg.exception_handler(exc)

    def _write_progress(self, t: int) -> None:
        """Publish the latest dispatched timestep (atomic rename) — the
        marker the bridge's opt-in A15 lookahead gate polls. Written
        unconditionally: one tiny file per boundary, and keeping it
        engine-side means enforcement is purely a bridge decision."""
        from deisa_ray_spark.streaming.bridge import PROGRESS_MARKER

        os.makedirs(self.chunk_dir, exist_ok=True)
        path = os.path.join(self.chunk_dir, PROGRESS_MARKER)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"t": int(t)}, f)
        os.replace(tmp, path)

    def _process_events(self, batch_df: DataFrame, batch_id: int) -> None:
        try:
            events = batch_df.toPandas()
            if not len(events):
                return
            events = events.sort_values(["t", "arr"])
            for t in sorted(events["t"].unique()):
                at_t = events[events["t"] == t]
                ready = at_t[at_t["event"] == "ready"]
                if len(ready):
                    win_map = None
                    if self.window_backend == "state":
                        win_map = {
                            r.arr: json.loads(r.win_ts)
                            for r in ready.itertuples(index=False)
                        }
                    self._dispatch_boundary(int(t), set(ready["arr"]), win_map)
                    self._write_progress(int(t))
                if (at_t["event"] == "sentinel").any():
                    self.done = True
        except BaseException as exc:
            # foreachBatch wraps driver-side exceptions in a
            # StreamingQueryException; keep the original so run() can
            # re-raise it unwrapped (exception policy A10).
            self._dispatch_exc = exc
            raise

    # -- run (A1 source + control plane + dispatch) -----------------------

    def events_stream(self, max_files_per_trigger: int | None = 1) -> DataFrame:
        """The control-plane event stream (exposed for testing/explain)."""
        from deisa_ray_spark.shipping import ensure_shipped

        ensure_shipped(self.spark)
        if self._chunk_stream is not None:
            chunks = self._chunk_stream
        else:
            reader = self.spark.readStream.schema(CHUNK_SCHEMA).option(
                "recursiveFileLookup", "true"  # bridge drops under <arr>/<t>/
            )
            if max_files_per_trigger is not None:
                reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
            chunks = reader.parquet(self.chunk_dir)
        meta = chunks.drop("data").withColumn("k", F.lit(0))
        sizes = {
            w.name: self._max_window(w.name)
            for cfg in self.callbacks
            for w in cfg.windows
        }
        return meta.groupBy("k").applyInPandasWithState(
            _make_control_plane(sizes),
            outputStructType=_EVENT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )

    def drain_available(
        self, checkpoint_dir: str, max_files_per_trigger: int | None = 1
    ) -> None:
        """One AvailableNow pass over the drop directory. The checkpoint
        carries the control-plane state across passes AND process
        restarts: a new engine on the same checkpoint resumes exactly
        after the last processed file (no re-delivery — a restart story
        the reference does not have)."""
        events = self.events_stream(max_files_per_trigger)
        q = (
            events.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self._process_events)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception as exc:  # translate worker-side failures
            pending = getattr(self, "_dispatch_exc", None)
            self._dispatch_exc = None
            msg = str(pending) if pending is not None else str(exc)
            if _ORDERING_MARKER in msg:
                raise OrderingError(msg) from None
            if _CONTRACT_MARKER in msg:
                raise ContractError(msg) from None
            if pending is not None:
                raise pending from None
            raise

    def run_live(self, checkpoint_dir: str) -> None:
        """Consume an injected ``chunk_stream`` with a live continuous
        query until its offsets stop advancing (``processAllAvailable``)
        — the mode for rate-paced sources like sim_grid, where
        AvailableNow snapshotting does not apply. Sentinel handling,
        ordering abort, and exception translation are identical to the
        file-drop path."""
        events = self.events_stream(None)
        q = (
            events.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self._process_events)
            .start()
        )
        try:
            q.processAllAvailable()
        except Exception as exc:  # same translation as drain_available
            pending = getattr(self, "_dispatch_exc", None)
            self._dispatch_exc = None
            msg = str(pending) if pending is not None else str(exc)
            if _ORDERING_MARKER in msg:
                raise OrderingError(msg) from None
            if _CONTRACT_MARKER in msg:
                raise ContractError(msg) from None
            if pending is not None:
                raise pending from None
            raise
        finally:
            q.stop()

    def _drop_file_count(self) -> int:
        """Total visible chunk files in the drop dir (cheap driver-side
        walk) — the second progress signal for run()'s stall gate."""
        n = 0
        for _root, _dirs, files in os.walk(self.chunk_dir):
            n += sum(
                1 for f in files if f.endswith(".parquet") and not f.startswith(".")
            )
        return n

    def _incomplete_assemblies(self) -> list[tuple[str, int, int, int]]:
        """Scan the drop dir for partially-assembled (array, timestep)
        groups: ``[(arr, t, have, expected), ...]``. Expected chunk count
        comes from any one chunk file's declared grid (global // chunk).
        Only meaningful in drop-dir mode; with an injected chunk_stream
        the stall diagnosis falls back to the plain timeout."""
        import glob as _glob

        import pyarrow.parquet as _pq

        bad: list[tuple[str, int, int, int]] = []
        for arr_dir in sorted(_glob.glob(os.path.join(self.chunk_dir, "arr_*"))):
            arr = os.path.basename(arr_dir)[len("arr_"):]
            for t_dir in sorted(_glob.glob(os.path.join(arr_dir, "t_*"))):
                files = [
                    f
                    for f in os.listdir(t_dir)
                    if f.endswith(".parquet") and not f.startswith(".")
                ]
                if not files:
                    continue
                tbl = _pq.read_table(
                    os.path.join(t_dir, files[0]),
                    columns=["global_shape", "chunk_shape"],
                )
                row = tbl.to_pylist()[0]
                expected = 1
                for g, c in zip(row["global_shape"], row["chunk_shape"]):
                    expected *= g // c
                if len(files) < expected:
                    bad.append(
                        (arr, int(os.path.basename(t_dir)[len("t_"):]),
                         len(files), expected)
                    )
        return bad

    def run(
        self,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = 1,
        timeout_sec: float = 300.0,
        stall_timeout: float = 30.0,
    ) -> None:
        """Consume the drop directory until the sentinel arrives (one
        AvailableNow pass at a time, so a simulation that is still ahead
        of analytics keeps being polled — either side may start first,
        A18). Raises OrderingError/ContractError exactly where the
        reference fails the run.

        **Under-subscribed world fails fast** (reference
        tests/test_startup_order.py negative case: fewer bridges than the
        declared grid must be an error, not a silent hang): if no
        progress — no new drop files AND no dispatched boundary — for
        ``stall_timeout`` seconds while some (array, timestep) is only
        partially assembled, raise :class:`ContractError` naming each
        incomplete group and its missing-chunk count. A stalled-but-fully-
        assembled world (simulation alive between timesteps, sentinel
        pending) keeps polling until ``timeout_sec``."""
        import time as _time

        deadline = _time.monotonic() + timeout_sec
        last_sig: tuple[int, int] | None = None
        last_progress = _time.monotonic()
        last_walk = 0.0
        while not self.done:
            self.drain_available(checkpoint_dir, max_files_per_trigger)
            if self.done:
                return
            now = _time.monotonic()
            # The file-count walk is O(run history) — only pay it when
            # boundaries have stopped advancing (the walk exists solely
            # to arm the stall gate), and at most a few times per stall
            # window; dispatched boundaries alone prove liveness.
            if last_sig is not None and self._boundary_count != last_sig[0]:
                sig = (self._boundary_count, last_sig[1])
            elif now - last_walk >= max(0.5, stall_timeout / 5.0):
                last_walk = now
                sig = (self._boundary_count, self._drop_file_count())
            else:
                sig = last_sig if last_sig is not None else (self._boundary_count, -1)
            if sig != last_sig:
                last_sig = sig
                last_progress = now
            elif now - last_progress > stall_timeout and self._chunk_stream is None:
                incomplete = self._incomplete_assemblies()
                if incomplete:
                    detail = ", ".join(
                        f"({arr!r}, t={t}): {have}/{exp} chunks"
                        for arr, t, have, exp in incomplete
                    )
                    raise ContractError(
                        f"world under-subscribed: no progress for "
                        f"{stall_timeout:.0f}s with partially-assembled "
                        f"timesteps — fewer bridges are sending than the "
                        f"declared chunk grid expects [{detail}]"
                    )
            if now > deadline:
                raise TimeoutError(f"sentinel not seen within {timeout_sec}s")
            _time.sleep(0.2)
