"""Migration shim: the reference's public class and method names over
this engine, so existing analytics/simulation scripts port with minimal
edits.

Reference surface (deisa-ray v0.1.5): analytics constructs ``Deisa()``,
registers callbacks via ``@d.register(...)`` / ``d.register_callback``,
then blocks in ``execute_callbacks()`` (window_handler.py:75-295);
simulation ranks construct ``Bridge(arrays_metadata=..., comm=...)`` and
call ``send`` / ``close`` / ``get`` (bridge.py:201-545).

Differences a migrating user must supply, both inherent to the engine
swap: a ``SparkSession`` (instead of a Ray cluster address) and a shared
``transport_dir`` (the chunk drop directory that replaces Ray's object
store as the simulation→analytics channel). ``comm`` is accepted and
ignored — rank exchange happens through the chunk metadata, so no
collective communicator is needed.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
from pyspark.sql import SparkSession

from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge

#: The reference's Window spec type under its own name
#: (deisa.ray.types.Window(name, size)).
Window = ArrayWindow

#: The reference's array-handle type under its own name — scripts
#: import it for callback annotations (``array: list[DeisaArray]``,
#: docs/source/quick_start.rst) and isinstance checks; the engine's
#: ArrayFrame IS that handle here.
from deisa_ray_spark.streaming.engine import ArrayFrame as DeisaArray  # noqa: E402

#: Reference type alias (deisa/ray/__init__.py:5): a timestep is any
#: Hashable, in practice an int.
from typing import Hashable  # noqa: E402

Timestep = Hashable

#: Reference error surface under the names a migrating script imports
#: (deisa/ray/errors.py). ContractError is this engine's own (same
#: semantics); ConfigError mirrors the reference's
#: mutated-after-lock config error for scripts that catch it.
from deisa_ray_spark.errors import (  # noqa: E402, F401
    ConfigError,
    ContractError,
    default_exception_handler,
)


# ConfigError (reference errors.py:20-23) is re-exported from errors.py
# above — a single class, so except clauses catching either spelling
# (compat.ConfigError / errors.ConfigError) see the same type.


def _ambient_transport_dir(given: str | None) -> str:
    """Resolve the transport dir the way the reference resolves its
    cluster: from the ambient environment when not passed explicitly.
    The reference's ``Deisa()`` / ``Bridge(...)`` take no cluster
    address (Ray is ambient); here the ambient channel is the
    ``DEISA_SPARK_TRANSPORT_DIR`` environment variable, so a verbatim
    zero-config quickstart script runs once both sides export it."""
    import os

    if given is not None:
        return given
    env = os.environ.get("DEISA_SPARK_TRANSPORT_DIR")
    if env:
        return env
    raise TypeError(
        "a transport dir is required: pass transport_dir= or export "
        "DEISA_SPARK_TRANSPORT_DIR (the shared path both the bridges "
        "and the analytics can reach — this engine's analogue of the "
        "ambient Ray cluster)"
    )


class Deisa:
    """Reference-named analytics front end (window_handler.Deisa).

    Cheap constructor, no cluster side effects — connection happens on
    ``execute_callbacks`` (mirrors window_handler.py:83-120's
    "cheap constructor" contract)."""

    def __init__(
        self,
        feedback_queue_size: int = 1024,
        *,
        spark: SparkSession | None = None,
        transport_dir: str | None = None,
        checkpoint_dir: str | None = None,
        max_simulation_ahead: int = 1,
    ) -> None:
        transport_dir = _ambient_transport_dir(transport_dir)
        self.spark = spark
        self.transport_dir = transport_dir
        self.checkpoint_dir = checkpoint_dir or transport_dir + "/.ckpt"
        self.max_simulation_ahead = max_simulation_ahead
        self.feedback_queue_size = feedback_queue_size
        self._engine: InSituEngine | None = None
        self._pending: list[tuple[tuple, dict]] = []

    # -- registration (reference window_handler.py:173-293) ---------------

    def register(
        self,
        *specs: ArrayWindow | str,
        when: str = "AND",
        exception_handler=None,
    ):
        """Decorator form: ``@d.register("array")`` /
        ``@d.register(Window("a", 2), "b")``."""

        def deco(fn: Callable[..., None]) -> Callable[..., None]:
            self.register_callback(
                fn, *specs, when=when, exception_handler=exception_handler
            )
            return fn

        return deco

    def register_callback(
        self,
        fn: Callable[..., None],
        *specs: ArrayWindow | str,
        when: str = "AND",
        exception_handler=None,
    ) -> Callable[..., None]:
        # reference default: print-and-continue (errors.py:27-42,
        # window_handler.py:176) — a crashing migrated callback must not
        # abort the run under compat. Timeout/Assertion still escalate
        # (engine A10 policy runs before any handler). Pass an explicit
        # handler to override; the NATIVE engine API keeps the stricter
        # raise-by-default.
        from deisa_ray_spark.errors import default_exception_handler

        handler = exception_handler or default_exception_handler
        self._pending.append(
            ((fn, *specs), {"when": when, "exception_handler": handler})
        )
        return fn

    # -- execution (reference window_handler.py:295-400) ------------------

    def execute_callbacks(self) -> None:
        """Run the callback loop until the simulation closes the stream
        (the reference blocks here the same way)."""
        if not self._pending:
            raise RuntimeError(
                "Please register at least one callback before calling execute_callbacks()"
            )
        spark = self.spark or SparkSession.builder.getOrCreate()
        self._engine = InSituEngine(
            spark,
            self.transport_dir + "/chunks",
            feedback_dir=self.transport_dir + "/fb",
            feedback_queue_size=self.feedback_queue_size,
            max_simulation_ahead=self.max_simulation_ahead,
        )
        for args, kwargs in self._pending:
            self._engine.register_callback(*args, **kwargs)
        self._engine.run(checkpoint_dir=self.checkpoint_dir)

    # -- feedback publish (reference window_handler set/feedback path) ----

    def set(self, key: str, value: Any, timestep: int) -> None:
        if self._engine is None:
            raise RuntimeError("set() is only valid inside execute_callbacks()")
        self._engine.set(key, value, timestep)


class Bridge:
    """Reference-named simulation client (bridge.Bridge).

    Positional order matches the reference — ``Bridge(comm,
    arrays_metadata, ...)`` (bridge.py:201-207) — so a migrating script
    calling it positionally binds correctly.

    One DELIBERATE relaxation: the reference rejects ``comm=None``
    (tests/test_bridge_init.py: "comm is required", because its bridge
    id comes from ``comm.Get_rank()``); here a communicator is optional
    since the declared chunk position already determines the rank — a
    script without MPI installed can drive the bridge directly. ``comm`` needs no
    collective here (per-rank chunk metadata carries the grid position),
    but when it quacks like a communicator its ``Get_rank()`` supplies
    the bridge id, exactly as the reference derives it; otherwise
    ``rank`` defaults to ``chunk_position``'s row-major index when the
    metadata carries one unambiguous position."""

    def __init__(
        self,
        comm: Any = None,
        arrays_metadata: dict[str, dict] | None = None,
        *,
        rank: int | None = None,
        transport_dir: str | None = None,
        max_simulation_ahead: int | None = None,
    ) -> None:
        from collections.abc import Mapping

        transport_dir = _ambient_transport_dir(transport_dir)

        if arrays_metadata is None and isinstance(comm, Mapping):
            # tolerate the metadata-first call style of earlier shim
            # versions — unambiguous, since a communicator is never a dict
            comm, arrays_metadata = None, comm
        if not isinstance(arrays_metadata, Mapping):
            raise TypeError(
                "Bridge(comm, arrays_metadata, ...): the reference signature "
                "puts comm FIRST (bridge.py:201); arrays_metadata must be a "
                "mapping of array name -> {global_shape, chunk_shape, "
                "chunk_position}, got " + type(arrays_metadata).__name__
            )
        if not arrays_metadata:
            raise ValueError("arrays_metadata must declare at least one array")
        if rank is None and comm is not None and hasattr(comm, "Get_rank"):
            # reference: "The unique bridge identifier is derived from
            # comm.Get_rank()" (bridge.py:213-215)
            rank = int(comm.Get_rank())
        if rank is None:
            # derive a stable rank from the declared chunk positions;
            # every array must agree, else the caller has to say which
            # rank this process is (ambiguous layouts would otherwise
            # silently collide bridge ids)
            candidates = set()
            for md in arrays_metadata.values():
                pos = tuple(md["chunk_position"])
                grid = tuple(
                    int(g) // int(c)
                    for g, c in zip(md["global_shape"], md["chunk_shape"])
                )
                r = 0
                for p, extent in zip(pos, grid):
                    r = r * extent + int(p)
                candidates.add(r)
            if len(candidates) != 1:
                raise ValueError(
                    f"ambiguous rank from chunk positions {sorted(candidates)}; "
                    "pass rank= explicitly when arrays have different layouts"
                )
            rank = candidates.pop()
        kwargs: dict[str, Any] = {}
        if max_simulation_ahead is not None:
            kwargs["max_simulation_ahead"] = max_simulation_ahead
        self._bridge = SparkBridge(
            rank,
            arrays_metadata,
            transport_dir + "/chunks",
            feedback_dir=transport_dir + "/fb",
            **kwargs,
        )
        self.node_id = f"spark-bridge-{rank}"

    def send(self, array_name: str, chunk: np.ndarray, timestep: int) -> None:
        self._bridge.send(array_name, chunk, timestep)

    def close(self, timestep: int) -> None:
        self._bridge.close(timestep)

    def get(self, key: str, timestep: int | None = None, default: Any = None) -> Any:
        return self._bridge.get(key, timestep, default)


# ---------------------------------------------------------------------------
# Lazy expression layer: the reference callback's dask-array idioms
# (tests/test_analytics.py:25-102 — arithmetic, slicing, .T, @, clip,
# astype, rechunk, persist, da.where/sqrt/concatenate/linalg.svd/
# fft.fft) over this engine's ArrayFrame, so an analytics callback
# ports by changing `import dask.array as da` to
# `from deisa_ray_spark.compat import da`.
#
# Evaluation contract: `.compute()` materializes ON THE DRIVER — the
# same landing point as the reference's dask `.compute()` (its results
# are ndarrays in the callback process too), bounded by the declared
# global_shape exactly like ArrayFrame.to_numpy. The DISTRIBUTED twins
# of every one of these kernels live in operators/grid_ops.py and
# operators/linalg.py (B1-B20, oracle-checked); use those via
# ArrayFrame.cells() when the arrays are bigger than a driver.
# ---------------------------------------------------------------------------


# One shared implementation (previously duplicated here and in the
# engine); see streaming/lazy.py for semantics (memoized compute,
# full dask-style operator surface, elementwise comparisons,
# __array_ufunc__ = None).
from deisa_ray_spark.streaming.lazy import (  # noqa: E402
    LazyArray,
    LazyScalar,
    as_lazy as _as_lazy,
)

#: back-compat alias: earlier shim versions named the scalar handle
#: _LazyNumber; it IS LazyScalar.
_LazyNumber = LazyScalar


class _DaLinalg:
    @staticmethod
    def svd(a):
        """Reduced SVD, dask-shaped: returns (u, s, v) lazy triple
        sharing one factorization."""
        a = _as_lazy(a)
        cache: dict = {}

        def factor():
            if "usv" not in cache:
                cache["usv"] = np.linalg.svd(a.compute(), full_matrices=False)
            return cache["usv"]

        return (
            LazyArray(lambda: factor()[0]),
            LazyArray(lambda: factor()[1]),
            LazyArray(lambda: factor()[2]),
        )


class _DaFft:
    @staticmethod
    def fft(a, axis=-1):
        a = _as_lazy(a)
        return LazyArray(lambda: np.fft.fft(a.compute(), axis=axis))


class _DaModule:
    """``da``: the dask.array module functions reference callbacks use."""

    linalg = _DaLinalg()
    fft = _DaFft()

    @staticmethod
    def where(cond, x, y):
        c, xv, yv = _as_lazy(cond), _as_lazy(x), _as_lazy(y)
        return LazyArray(lambda: np.where(c.compute(), xv.compute(), yv.compute()))

    @staticmethod
    def sqrt(a):
        a = _as_lazy(a)
        return LazyArray(lambda: np.sqrt(a.compute()))

    @staticmethod
    def concatenate(seq, axis=0):
        lazies = [_as_lazy(s) for s in seq]
        return LazyArray(lambda: np.concatenate([s.compute() for s in lazies], axis=axis))


da = _DaModule()


def to_hdf5(fname: str, sources: dict[str, Any]) -> None:
    """Module-level multi-dataset HDF5 save — the reference's
    ``deisa.ray.types.to_hdf5(fname, {dataset: DeisaArray})``
    (types.py:451; docs/source/analytics.rst "Saving to HDF5").
    Values are this engine's ArrayFrames (the callback arguments)."""
    from deisa_ray_spark import sinks

    sinks.to_hdf5_multi({name: af.chunks() for name, af in sources.items()}, fname)
