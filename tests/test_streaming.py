"""Behavioral tests for the streaming in-situ layer, mirroring the
reference's e2e strategy (SURVEY §5): closed-form golden values
(rank r sends ``t * (r+1) * ones(chunk)``), the test_when AND/OR count
matrix (OR=4/AND=0 on alternating shares), ordering-violation abort,
start-at-any-timestep, and feedback queue semantics."""

from __future__ import annotations

import numpy as np
import pytest

from deisa_ray_spark.errors import ContractError, OrderingError
from deisa_ray_spark.streaming import ArrayWindow, FeedbackStore, InSituEngine, SparkBridge
from deisa_ray_spark.streaming.bridge import metadata_for_grid

GLOBAL = (4, 4)
CHUNK = (2, 2)
GRID = (2, 2)  # 4 bridges, bridge r owns pos (r//2, r%2)


def _send_timestep(bridges, arrays, t):
    """All 4 bridges send t*(r+1)*ones — assembled sum = 4t*(1+2+3+4)=40t."""
    for r, b in enumerate(bridges):
        for arr in arrays:
            b.send(arr, t * (r + 1) * np.ones(CHUNK, dtype=np.int64), t)


def _make_bridges(tmp_path, arrays=("temperature", "pressure")):
    chunk_dir = str(tmp_path / "chunks")
    bridges = []
    for r in range(4):
        pos = (r // 2, r % 2)
        md = metadata_for_grid(arrays, GLOBAL, CHUNK, pos)
        bridges.append(SparkBridge(r, md, chunk_dir, feedback_dir=str(tmp_path / "fb")))
    return chunk_dir, bridges


def _run(engine, tmp_path, **kw):
    kw.setdefault("max_files_per_trigger", None)  # one batch per pass: fast
    engine.run(checkpoint_dir=str(tmp_path / "ckpt"), **kw)


def test_full_workflow_golden_values(spark, tmp_path):
    """Assembled sums match the closed form (reference
    tests/test_full_workflow.py:24-27: exact golden values)."""
    chunk_dir, bridges = _make_bridges(tmp_path)
    for t in range(5):
        _send_timestep(bridges, ("temperature", "pressure"), t)
    bridges[0].close(4)

    sums: dict[int, float] = {}
    windows_seen: list[int] = []

    def cb(temperature, pressure):
        af = temperature[-1]
        a = af.to_numpy()
        assert a.shape == GLOBAL
        sums[af.t] = float(a.sum())
        windows_seen.append(len(temperature))

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature"), ArrayWindow("pressure"), when="AND")
    _run(engine, tmp_path)

    assert sums == {t: 40.0 * t for t in range(5)}
    assert windows_seen == [1] * 5  # size-1 windows
    assert engine.callbacks[0].calls == 5


def test_when_and_or_count_matrix(spark, tmp_path):
    """Alternating shares: AND fires 0 times, OR fires 4 times
    (reference tests/test_when.py:118-191)."""
    chunk_dir, bridges = _make_bridges(tmp_path)
    for t in range(5):
        arr = "temperature" if t % 2 == 0 else "pressure"
        _send_timestep(bridges, (arr,), t)
    bridges[0].close(4)

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(
        lambda **kw: None, ArrayWindow("temperature"), ArrayWindow("pressure"), when="AND"
    )
    or_ts: list[tuple[int, int]] = []

    def or_cb(temperature, pressure):
        or_ts.append((temperature[-1].t, pressure[-1].t))

    engine.register_callback(
        or_cb, ArrayWindow("temperature"), ArrayWindow("pressure"), when="OR"
    )
    _run(engine, tmp_path)

    assert engine.callbacks[0].calls == 0  # AND: never co-shared
    assert engine.callbacks[1].calls == 4  # OR: every boundary after all-seen
    # OR reuses the stale window for the array without a new share:
    assert or_ts == [(0, 1), (2, 1), (2, 3), (4, 3)]


def test_sliding_window_temporal_diff(spark, tmp_path):
    """Size-2 window delivers oldest→newest; diff of sums == 40
    (reference tests/test_sliding_window.py:29-34)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(5):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(4)

    diffs = []

    def cb(temperature):
        if len(temperature) == 2:
            older, newer = temperature
            assert newer.t == older.t + 1
            diffs.append(float(newer.to_numpy().sum() - older.to_numpy().sum()))

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature", size=2))
    _run(engine, tmp_path)
    assert diffs == [40.0] * 4


def test_start_any_timestep(spark, tmp_path):
    """First share may be any t (reference tests/test_start_any_timestep.py)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in (3, 4, 5):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(5)

    ts = []
    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(lambda temperature: ts.append(temperature[-1].t),
                             ArrayWindow("temperature"))
    _run(engine, tmp_path)
    assert ts == [3, 4, 5]


def test_ordering_violation_fails_run(spark, tmp_path):
    """An older timestep completing after a newer one aborts the run —
    late data is rejected, not dropped (reference
    tests/test_sequential_consistency.py:49-52,85-86)."""
    chunk_dir, _ = _make_bridges(tmp_path, arrays=("temperature",))
    # Single-chunk grid so each send is a complete assembly.
    md5 = metadata_for_grid(("temperature",), (2, 2), (2, 2), (0, 0))
    b = SparkBridge(0, md5, chunk_dir)
    b.send("temperature", np.ones((2, 2)), 5)
    # A second producer violates global ordering with t=3 after t=5.
    b2 = SparkBridge(1, md5, chunk_dir)
    b2.send("temperature", np.ones((2, 2)), 3)
    b.close(5)

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(lambda temperature: None, ArrayWindow("temperature"))
    with pytest.raises(OrderingError):
        # both sends in ONE micro-batch would legally sort by t; force
        # per-file batches so arrival order is send order.
        engine.run(checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1)


def test_bridge_contract_errors(tmp_path):
    md = metadata_for_grid(("temperature",), GLOBAL, CHUNK, (0, 0))
    b = SparkBridge(0, md, str(tmp_path / "chunks"))
    with pytest.raises(ContractError):
        b.send("undeclared", np.ones(CHUNK), 0)
    with pytest.raises(ContractError):
        b.send("temperature", np.ones((3, 3)), 0)  # wrong chunk shape
    b.send("temperature", np.ones(CHUNK), 1)
    with pytest.raises(ContractError):
        b.send("temperature", np.ones(CHUNK), 0)  # out-of-order same bridge
    with pytest.raises(ContractError):
        SparkBridge(0, {"a": {"global_shape": (4,), "chunk_shape": (3,),
                              "chunk_position": (0,)}}, str(tmp_path / "c2"))


def test_callback_exception_policy(spark, tmp_path):
    """User exceptions go to the handler; AssertionError escalates
    (reference tests/test_error_handler.py:87-124)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    _send_timestep(bridges, ("temperature",), 0)
    bridges[0].close(0)

    caught = []

    def bad(temperature):
        raise ValueError("user bug")

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(bad, ArrayWindow("temperature"),
                             exception_handler=caught.append)
    _run(engine, tmp_path)
    assert len(caught) == 1 and isinstance(caught[0], ValueError)

    # AssertionError must escalate (the guard against silently broken tests)
    chunk_dir2 = str(tmp_path / "chunks2")
    md = metadata_for_grid(("temperature",), GLOBAL, CHUNK, (0, 0))
    bridges2 = [SparkBridge(r, metadata_for_grid(("temperature",), GLOBAL, CHUNK,
                                                 (r // 2, r % 2)), chunk_dir2)
                for r in range(4)]
    _send_timestep(bridges2, ("temperature",), 0)
    bridges2[0].close(0)

    def asserting(temperature):
        assert False, "must escalate"

    engine2 = InSituEngine(spark, chunk_dir2)
    engine2.register_callback(asserting, ArrayWindow("temperature"),
                              exception_handler=caught.append)
    with pytest.raises(AssertionError):
        engine2.run(checkpoint_dir=str(tmp_path / "ckpt2"),
                    max_files_per_trigger=None)


def test_feedback_queue_semantics(spark, tmp_path):
    """Strict increase, eviction, hit/miss matrix, full-queue read
    (reference tests/test_feedback_loop.py:104-252)."""
    fb_dir = str(tmp_path / "fb")
    store = FeedbackStore(fb_dir, queue_size=3)
    for t in (1, 3, 5, 7):
        store.set("alpha", {"v": t * 10}, t)
    with pytest.raises(ValueError):
        store.set("alpha", {"v": 0}, 7)  # not strictly increasing
    with pytest.raises(ValueError):
        store.set("alpha", {"v": 0}, 2)
    store.set("beta", 42, 0)

    # eviction: queue_size=3 keeps t=3,5,7
    assert store.get("alpha") == [(3, {"v": 30}), (5, {"v": 50}), (7, {"v": 70})]
    assert store.get("alpha", 5) == {"v": 50}
    assert store.get("alpha", 1, default="gone") == "gone"  # evicted
    assert store.get("alpha", 2, default=-1) == -1  # never set
    assert store.get("missing", default="dflt") == "dflt"

    # bridge-side read (rank-0 lookup path)
    md = metadata_for_grid(("temperature",), GLOBAL, CHUNK, (0, 0))
    b = SparkBridge(0, md, str(tmp_path / "chunks"), feedback_dir=fb_dir)
    assert b.get("beta", 0) == 42
    assert b.get("beta", 9, default=None) is None


def test_feedback_loop_end_to_end(spark, tmp_path):
    """Analytics publishes per-timestep feedback; simulation reads it
    after close (reference tests/test_feedback_loop.py:202-218)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(3):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(2)

    fb_dir = str(tmp_path / "fb")
    engine = InSituEngine(spark, chunk_dir, feedback_dir=fb_dir)

    def cb(temperature):
        af = temperature[-1]
        engine.set("sum", float(af.to_numpy().sum()), af.t)

    engine.register_callback(cb, ArrayWindow("temperature"))
    _run(engine, tmp_path)

    assert bridges[0].get("sum", 2) == 80.0
    assert bridges[0].get("sum") == [(0, 0.0), (1, 40.0), (2, 80.0)]


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: a NEW engine on the same checkpoint
    resumes after the last processed chunk file — no timestep is
    re-delivered (Spark-checkpoint restart story; the reference has no
    restart semantics at all)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(3):
        _send_timestep(bridges, ("temperature",), t)

    seen_first: list[int] = []
    e1 = InSituEngine(spark, chunk_dir)
    e1.register_callback(lambda temperature: seen_first.append(temperature[-1].t),
                         ArrayWindow("temperature"))
    e1.drain_available(str(tmp_path / "ckpt"), max_files_per_trigger=None)
    assert seen_first == [0, 1]  # t=2 still open (no later share yet)

    # simulate a crash: brand-new engine instance, same checkpoint
    for t in (3, 4):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(4)

    seen_second: list[int] = []
    e2 = InSituEngine(spark, chunk_dir)
    e2.register_callback(lambda temperature: seen_second.append(temperature[-1].t),
                         ArrayWindow("temperature"))
    e2.run(checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=None)

    assert seen_second == [2, 3, 4]  # resumes exactly where e1 stopped
    assert seen_first + seen_second == [0, 1, 2, 3, 4]  # no duplicates


def test_realistic_chunk_sizes(spark, tmp_path):
    """Engine handles production-shaped chunks: 256x256 float64 per rank
    (0.5 MiB each, 4 ranks, 8 timesteps = 16 MiB total payload) — the
    scale band of the reference's own memory-release test (4 MiB chunks,
    tests/test_memory_release.py:88-92). Checks golden sums and that
    per-timestep assembly stays exact at this size."""
    chunk_dir = str(tmp_path / "chunks")
    G, C = (512, 512), (256, 256)
    bridges = [
        SparkBridge(r, metadata_for_grid(("temperature",), G, C, (r // 2, r % 2)), chunk_dir)
        for r in range(4)
    ]
    for t in range(8):
        for r, b in enumerate(bridges):
            b.send("temperature", float(t * (r + 1)) * np.ones(C), t)
    bridges[0].close(7)

    sums = {}

    def cb(temperature):
        af = temperature[-1]
        sums[af.t] = float(af.to_numpy().sum())

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature"))
    engine.run(checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=None)

    cells = C[0] * C[1]
    assert sums == {t: float(t * (1 + 2 + 3 + 4) * cells) for t in range(8)}


def test_max_simulation_ahead_enforced_opt_in(spark, tmp_path):
    """A15 lookahead as an opt-in EXTENSION: the reference documents the
    semaphore but never enforces it (head_node.py:33-37,87); default
    None reproduces that no-op. With max_simulation_ahead=K the bridge
    blocks sends more than K timesteps past analytics progress
    (TimeoutError after ahead_timeout, mirroring the admission-control
    shape of reference bridge.py:90-121) and proceeds once the engine
    catches up via the progress marker."""
    chunk_dir = str(tmp_path / "chunks")
    bridges = []
    for r in range(4):
        md = metadata_for_grid(("temperature",), GLOBAL, CHUNK, (r // 2, r % 2))
        bridges.append(
            SparkBridge(r, md, chunk_dir, max_simulation_ahead=2,
                        ahead_timeout=0.3, ahead_poll=0.02)
        )

    def send_t(t):
        for r, b in enumerate(bridges):
            b.send("temperature", t * (r + 1) * np.ones(CHUNK, dtype=np.int64), t)

    # anchor = first sent timestep: t=0, t=1 fit in the K=2 budget
    send_t(0)
    send_t(1)
    # t=2 is 3 ahead of (anchor-1) with no analytics progress yet → blocks
    with pytest.raises(TimeoutError, match="ahead of analytics"):
        bridges[0].send("temperature", 2 * np.ones(CHUNK, dtype=np.int64), 2)

    # analytics catches up: boundary t=0 closes once t=1 shares arrive
    engine = InSituEngine(spark, chunk_dir)
    seen = []
    engine.register_callback(
        lambda temperature: seen.append(temperature[-1].t),
        ArrayWindow("temperature"),
    )
    engine.drain_available(str(tmp_path / "ckpt"), max_files_per_trigger=None)
    assert seen == [0]

    # progress marker now says t=0 → t=2 is exactly K=2 ahead → admitted
    send_t(2)
    engine.drain_available(str(tmp_path / "ckpt"), max_files_per_trigger=None)
    assert seen == [0, 1]


def test_analytics_first_startup(spark, tmp_path):
    """Analytics may start BEFORE the simulation sends anything
    (reference tests/test_startup_order.py:100-134
    test_analytics_start_first_and_sim_can_start_after_x_secs): the run
    loop polls an empty drop directory until shares arrive. The sim-first
    direction is covered by every other test in this file; this pins the
    other half of A18."""
    import threading

    chunk_dir = str(tmp_path / "chunks")
    sums: dict[int, float] = {}
    errs: list[BaseException] = []

    def analytics():
        try:
            engine = InSituEngine(spark, chunk_dir)
            engine.register_callback(
                lambda temperature: sums.__setitem__(
                    temperature[-1].t, float(temperature[-1].to_numpy().sum())
                ),
                ArrayWindow("temperature"),
            )
            engine.run(
                checkpoint_dir=str(tmp_path / "ckpt"),
                max_files_per_trigger=None,
                timeout_sec=60.0,
            )
        except BaseException as e:  # noqa: BLE001 — surfaced in the main thread
            errs.append(e)

    th = threading.Thread(target=analytics, daemon=True)
    th.start()
    # Analytics is live and polling before the first bridge exists.
    import time

    time.sleep(1.0)
    _, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(3):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(2)

    th.join(timeout=90)
    assert not th.is_alive(), "analytics thread did not terminate"
    assert not errs, errs
    assert sums == {t: 40.0 * t for t in range(3)}


def test_exchange_data_between_callbacks(spark, tmp_path):
    """Callbacks share driver-side Python state: cb1 computes and stores
    the per-t sum, cb2 (registered after, dispatched after — A9 order)
    reads it back for the SAME timestep (reference
    tests/test_exchange_data_between_cb.py)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(4):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(3)

    shared: dict[str, float] = {}
    seen_by_cb2: list[tuple[int, float]] = []

    def cb1(temperature):
        shared["sum"] = float(temperature[-1].to_numpy().sum())

    def cb2(temperature):
        # Registration order == dispatch order, so cb1 already ran for
        # this boundary; the shared value must match our own view.
        assert shared["sum"] == float(temperature[-1].to_numpy().sum())
        seen_by_cb2.append((temperature[-1].t, shared["sum"]))

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb1, ArrayWindow("temperature"))
    engine.register_callback(cb2, ArrayWindow("temperature"))
    _run(engine, tmp_path)

    assert seen_by_cb2 == [(t, 40.0 * t) for t in range(4)]


def test_dtype_per_timestep(spark, tmp_path):
    """dtype may vary per (array, timestep) — reference types.py:580-581
    tracks dtype at timestep granularity. t=0 arrives int32, t=1
    float64; both decode exactly through the per-row dtype read in
    ArrayFrame.to_numpy."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for r, b in enumerate(bridges):
        b.send("temperature", (r + 1) * np.ones(CHUNK, dtype=np.int32), 0)
    for r, b in enumerate(bridges):
        b.send("temperature", 0.5 * (r + 1) * np.ones(CHUNK, dtype=np.float64), 1)
    bridges[0].close(1)

    frames: dict[int, np.ndarray] = {}

    def cb(temperature):
        frames[temperature[-1].t] = temperature[-1].to_numpy()

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature"))
    _run(engine, tmp_path)

    assert frames[0].dtype == np.int32
    assert frames[1].dtype == np.float64
    assert float(frames[0].sum()) == 4.0 * (1 + 2 + 3 + 4)
    assert float(frames[1].sum()) == 2.0 * (1 + 2 + 3 + 4)


def test_complex_dtype_chunks(spark, tmp_path):
    """Complex arrays travel the chunk path natively (reference FFT
    analytics produce complex arrays, tests/test_analytics.py:99): the
    payload is opaque bytes + a dtype string, so complex128 decodes
    exactly — no re/im column-pair workaround needed in situ."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("spectrum",))
    for r, b in enumerate(bridges):
        b.send("spectrum", (r + 1) * (1 + 2j) * np.ones(CHUNK, dtype=np.complex128), 0)
    bridges[0].close(0)

    got = {}
    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(
        lambda spectrum: got.__setitem__(spectrum[-1].t, spectrum[-1].to_numpy()),
        ArrayWindow("spectrum"),
    )
    _run(engine, tmp_path)
    assert got[0].dtype == np.complex128
    assert got[0].sum() == 4 * (1 + 2 + 3 + 4) * (1 + 2j)


def test_register_arg_combinations(spark, tmp_path):
    """Registration API parity (reference
    tests/test_callback_registration.py): decorator form, bare strings,
    ArrayWindow objects, and mixes all normalize to sized windows in
    registration order; register_callback returns the callback."""
    engine = InSituEngine(spark, str(tmp_path / "chunks"))

    @engine.register("arr1")
    def cb_string_default(arr1):
        pass

    @engine.register("arr1", "arr2")
    def cb_two_strings(arr1, arr2):
        pass

    @engine.register(ArrayWindow("arr1"))
    def cb_window_default(arr1):
        pass

    @engine.register(ArrayWindow("arr1", 2), ArrayWindow("arr2", 5), "arr3")
    def cb_mixed(arr1, arr2, arr3):
        pass

    def plain(arr1, arr2):
        pass

    windows = [ArrayWindow("arr1", 2), ArrayWindow("arr2", 5)]
    assert engine.register_callback(plain, *windows) is plain

    registered = [
        [(w.name, w.size) for w in cfg.windows] for cfg in engine.callbacks
    ]
    assert registered == [
        [("arr1", 1)],
        [("arr1", 1), ("arr2", 1)],
        [("arr1", 1)],
        [("arr1", 2), ("arr2", 5), ("arr3", 1)],
        [("arr1", 2), ("arr2", 5)],
    ]


def test_public_api_exports():
    """Top-level exports (reference tests/test_public_api.py:
    `from deisa.ray import Bridge, Deisa` is the supported surface)."""
    from deisa_ray_spark import ArrayWindow as AW
    from deisa_ray_spark import InSituEngine as E
    from deisa_ray_spark import SparkBridge as B
    from deisa_ray_spark.streaming import InSituEngine, SparkBridge
    from deisa_ray_spark.streaming.engine import InSituEngine as EngineFromModule

    assert E is InSituEngine is EngineFromModule
    assert B is SparkBridge
    assert AW is ArrayWindow
    # migration-shim surface mirrors `from deisa.ray import ...` exactly
    # (reference __init__.py exports Bridge, Deisa, Timestep; errors.py
    # exports ContractError, ConfigError)
    from deisa_ray_spark.compat import (  # noqa: F401
        Bridge,
        ConfigError,
        ContractError,
        Deisa,
        Timestep,
        Window,
    )


def test_register_accepts_documented_list_form(spark, tmp_path):
    """The reference quickstart registers with a LIST —
    ``register_callback(cb, [Window(...)])`` (docs/source/
    quick_start.rst:112-115) — which the reference's own varargs loop
    silently drops (window_handler.py:255-259: non-Window/str args are
    skipped, leaving an empty spec). Here the documented form works,
    mixed specs normalize, and junk raises instead of vanishing."""
    from deisa_ray_spark.streaming import ArrayWindow, InSituEngine

    engine = InSituEngine(spark, str(tmp_path / "chunks"))
    engine.register_callback(lambda temperature: None,
                             [ArrayWindow("temperature", 3), "pressure"])
    windows = engine.callbacks[0].windows
    assert [(w.name, w.size) for w in windows] == [("temperature", 3),
                                                   ("pressure", 1)]
    with pytest.raises(TypeError, match="ArrayWindow or str"):
        engine.register_callback(lambda x: None, 42)
    with pytest.raises(ValueError, match="at least one"):
        engine.register_callback(lambda x: None, [])
