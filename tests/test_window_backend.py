"""A7 window backends: the driver-deque default and the opt-in
``window_backend="state"`` (membership kept in the control-plane
operator's keyed state, frames rebuilt per dispatch) must be
behaviorally identical on the reference's when-matrix and
sliding-window contracts (reference tests/test_when.py:118-191,
tests/test_sliding_window.py:29-34, window_handler.py:272-293)."""

from __future__ import annotations

import numpy as np
import pytest

from deisa_ray_spark.streaming import ArrayWindow, InSituEngine

from .test_streaming import _make_bridges, _run, _send_timestep

BACKENDS = ["driver", "state"]


@pytest.mark.parametrize("backend", BACKENDS)
def test_when_and_or_matrix_both_backends(spark, tmp_path, backend):
    chunk_dir, bridges = _make_bridges(tmp_path)
    for t in range(5):
        arr = "temperature" if t % 2 == 0 else "pressure"
        _send_timestep(bridges, (arr,), t)
    bridges[0].close(4)

    engine = InSituEngine(spark, chunk_dir, window_backend=backend)
    engine.register_callback(
        lambda **kw: None,
        ArrayWindow("temperature"),
        ArrayWindow("pressure"),
        when="AND",
    )
    or_ts: list[tuple[int, int]] = []

    def or_cb(temperature, pressure):
        or_ts.append((temperature[-1].t, pressure[-1].t))

    engine.register_callback(
        or_cb, ArrayWindow("temperature"), ArrayWindow("pressure"), when="OR"
    )
    _run(engine, tmp_path)

    assert engine.callbacks[0].calls == 0
    assert engine.callbacks[1].calls == 4
    # OR reuses the stale window for the array without a new share —
    # in state mode that stale membership comes from _win_ts, proving
    # the event-carried lists cover non-new arrays too
    assert or_ts == [(0, 1), (2, 1), (2, 3), (4, 3)]


@pytest.mark.parametrize("backend", BACKENDS)
def test_sliding_window_temporal_diff_both_backends(spark, tmp_path, backend):
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(5):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(4)

    diffs = []
    lens = []

    def cb(temperature):
        lens.append([af.t for af in temperature])
        if len(temperature) == 2:
            older, newer = temperature
            assert newer.t == older.t + 1
            diffs.append(float(newer.to_numpy().sum() - older.to_numpy().sum()))

    engine = InSituEngine(spark, chunk_dir, window_backend=backend)
    engine.register_callback(cb, ArrayWindow("temperature", size=2))
    _run(engine, tmp_path)
    assert diffs == [40.0] * 4
    assert lens == [[0], [0, 1], [1, 2], [2, 3], [3, 4]]  # oldest→newest


def test_state_backend_holds_no_frames_between_boundaries(spark, tmp_path):
    """The point of the opt-in: after the run, the driver retains only
    int membership lists — no ArrayFrame (hence no dense cache) survives
    outside a dispatch."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(3):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(2)

    engine = InSituEngine(spark, chunk_dir, window_backend="state")
    engine.register_callback(
        lambda temperature: temperature[-1].to_numpy(),
        ArrayWindow("temperature", size=2),
    )
    _run(engine, tmp_path)
    assert engine._windows == {}  # the deque store was never touched
    assert engine._win_ts == {"temperature": [1, 2]}  # ints only, size-capped


def test_state_backend_membership_survives_restart(spark, tmp_path):
    """Window membership rides the streaming checkpoint: a NEW engine on
    the same checkpoint keeps filling the same window (the driver-deque
    backend restarts with an empty window — its known gap)."""
    chunk_dir, bridges = _make_bridges(tmp_path, arrays=("temperature",))
    for t in range(2):
        _send_timestep(bridges, ("temperature",), t)

    seen_a: list[list[int]] = []
    e1 = InSituEngine(spark, chunk_dir, window_backend="state")
    e1.register_callback(
        lambda temperature: seen_a.append([af.t for af in temperature]),
        ArrayWindow("temperature", size=3),
    )
    e1.drain_available(str(tmp_path / "ckpt"), max_files_per_trigger=None)
    assert seen_a == [[0]]  # t=1 still open

    for t in (2, 3):
        _send_timestep(bridges, ("temperature",), t)
    bridges[0].close(3)

    seen_b: list[list[int]] = []
    e2 = InSituEngine(spark, chunk_dir, window_backend="state")
    e2.register_callback(
        lambda temperature: seen_b.append([af.t for af in temperature]),
        ArrayWindow("temperature", size=3),
    )
    while not e2.done:
        e2.drain_available(str(tmp_path / "ckpt"), max_files_per_trigger=None)
    # resumed membership includes t=0 from before the restart
    assert seen_b == [[0, 1], [0, 1, 2], [1, 2, 3]]


def test_invalid_backend_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="window_backend"):
        InSituEngine(spark, str(tmp_path / "c"), window_backend="bogus")


def test_state_backend_golden_values(spark, tmp_path):
    """Full-workflow golden values under the state backend (closed form:
    assembled sum = 40t)."""
    chunk_dir, bridges = _make_bridges(tmp_path)
    for t in range(4):
        _send_timestep(bridges, ("temperature", "pressure"), t)
    bridges[0].close(3)

    sums = {}

    def cb(temperature, pressure):
        af = temperature[-1]
        a = af.to_numpy()
        assert a.shape == (4, 4)
        assert np.array_equal(a, pressure[-1].to_numpy())
        sums[af.t] = float(a.sum())

    engine = InSituEngine(spark, chunk_dir, window_backend="state")
    engine.register_callback(
        cb, ArrayWindow("temperature"), ArrayWindow("pressure"), when="AND"
    )
    _run(engine, tmp_path)
    assert sums == {t: 40.0 * t for t in range(4)}


def test_state_backend_over_live_sim_stream(spark, tmp_path):
    """run_live (injected chunk stream, no files) with the state window
    backend: sliding-window goldens identical to the file-drop path —
    closes the backend × transport matrix."""
    from deisa_ray_spark.sources.sim_source import batch_loader, register

    register(spark)
    opts = {"timesteps": "4"}
    stream = (
        spark.readStream.format("sim_grid")
        .options(with_sentinel="true", **opts)
        .load()
    )
    diffs = []

    def cb(temperature):
        if len(temperature) == 2:
            older, newer = temperature
            diffs.append(
                float(newer.to_numpy().sum() - older.to_numpy().sum())
            )

    engine = InSituEngine(
        spark,
        chunk_dir=str(tmp_path / "unused"),
        chunk_stream=stream,
        chunk_loader=batch_loader(spark, **opts),
        window_backend="state",
    )
    engine.register_callback(cb, ArrayWindow("temperature", size=2))
    engine.run_live(str(tmp_path / "ckpt"))
    assert engine.done
    assert diffs == [40.0] * 3
    assert engine._windows == {}  # deque store untouched in state mode
