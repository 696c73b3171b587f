"""Bounded-state invariant: the control-plane state must not grow with
stream length — the engine's analogue of the reference's zero-spill
resource regression (tests/test_memory_release.py:139-158: 240 iterations
through an 80 MB store, zero bytes spilled).

The stateful function is pure (rows + state-json in → events + state-json
out), so the invariant is tested directly over 240 timesteps without
running a 240-micro-batch stream."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from deisa_ray_spark.errors import OrderingError
from deisa_ray_spark.streaming.engine import _make_control_plane

_control_plane = _make_control_plane({})

N_ITERATIONS = 240  # mirror of the reference's NB_ITERATIONS


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _chunk_rows(t: int, arrs=("temperature", "pressure"), grid=(2, 2)):
    rows = []
    for arr in arrs:
        for px in range(grid[0]):
            for py in range(grid[1]):
                rows.append(
                    {
                        "arr": arr,
                        "t": t,
                        "bridge_id": px * grid[1] + py,
                        "pos": [px, py],
                        "chunk_shape": [2, 2],
                        "global_shape": [4, 4],
                        "dtype": "int64",
                    }
                )
    return rows


def test_state_size_is_bounded_over_240_timesteps():
    state = FakeState()
    sizes = []
    n_events = 0
    for t in range(N_ITERATIONS):
        out = list(_control_plane((0,), iter([pd.DataFrame(_chunk_rows(t))]), state))
        n_events += sum(len(df) for df in out)
        sizes.append(len(state.get[0]))
    # every timestep except the open one was emitted (2 arrays each)
    assert n_events == 2 * (N_ITERATIONS - 1)
    st = json.loads(state.get[0])
    assert st["counts"] == {}  # all assemblies completed → counts freed
    assert len(st["open"]) == 1  # only the current open timestep retained
    # O(1): state never grows past its size at t=2 by more than the
    # digit-width growth of the handful of stored timestep integers
    # (t_cur, closed_t, the open key, and one win entry per array)
    assert max(sizes) <= sizes[2] + 24
    # interleaved arrival across a boundary still bounded: partial t, then
    # completion, then next t (reference pipelining, head_node.py:383-391)
    rows = _chunk_rows(N_ITERATIONS)[:4] + _chunk_rows(N_ITERATIONS)[4:]
    list(_control_plane((0,), iter([pd.DataFrame(rows)]), state))
    assert len(json.loads(state.get[0])["open"]) == 1


def test_state_partial_assembly_accumulates_then_frees():
    state = FakeState()
    rows = _chunk_rows(0, arrs=("temperature",))
    # first 3 of 4 chunks: distinct positions accumulate, nothing
    # assembled (positions, not arrival counts — a duplicate resend must
    # not fake completeness)
    list(_control_plane((0,), iter([pd.DataFrame(rows[:3])]), state))
    st = json.loads(state.get[0])
    assert sorted(st["counts"]["temperature|0"]) == ["0,0", "0,1", "1,0"]
    assert st["open"] == {}
    # 4th chunk: assembled, count freed
    list(_control_plane((0,), iter([pd.DataFrame(rows[3:])]), state))
    st = json.loads(state.get[0])
    assert st["counts"] == {}
    assert st["open"] == {"0": {"temperature": 4}}


def test_ordering_violation_detected_in_pure_function():
    state = FakeState()
    list(_control_plane((0,), iter([pd.DataFrame(_chunk_rows(5))]), state))
    with pytest.raises(OrderingError):
        list(_control_plane((0,), iter([pd.DataFrame(_chunk_rows(3))]), state))
