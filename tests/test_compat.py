"""Migration-shim contract: a script written against the reference's
public names (Deisa / Bridge / Window, register / execute_callbacks /
send / close / get) runs unchanged on this engine, modulo supplying a
SparkSession and a transport dir.

Mirrors reference tests/test_full_workflow.py +
test_feedback_loop.py through the compat surface only.
"""

from __future__ import annotations

import threading

import numpy as np

from deisa_ray_spark.compat import Bridge, Deisa, Window


def test_reference_style_workflow(spark, tmp_path):
    transport = str(tmp_path / "transport")

    # --- simulation side: 4 ranks, reference Bridge API ---
    def make_bridge(r):
        return Bridge(
            arrays_metadata={
                "array": {
                    "global_shape": (4, 4),
                    "chunk_shape": (2, 2),
                    "chunk_position": (r // 2, r % 2),
                }
            },
            comm=None,  # accepted & ignored (no collective needed)
            transport_dir=transport,
        )

    bridges = [make_bridge(r) for r in range(4)]
    assert bridges[3].node_id == "spark-bridge-3"  # rank derived from position
    for t in range(4):
        for r, b in enumerate(bridges):
            b.send("array", t * (r + 1) * np.ones((2, 2), dtype=np.int64), t)
    bridges[0].close(3)

    # --- analytics side: reference Deisa API ---
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))
    sums: dict[int, float] = {}

    @d.register(Window("array"))
    def simulation_callback(array):
        af = array[-1]
        sums[af.t] = float(af.to_numpy().sum())
        d.set("target", sums[af.t] / 16.0, af.t)

    d.execute_callbacks()
    assert sums == {t: 40.0 * t for t in range(4)}

    # feedback readable through the reference Bridge.get contract
    assert bridges[0].get("target", 2) == 5.0
    assert bridges[0].get("target", 99, default="miss") == "miss"
    # full queue is [(t, value), ...] — reference
    # tests/test_feedback_loop.py:124 pins exactly this shape
    assert bridges[0].get("target") == [(0, 0.0), (1, 2.5), (2, 5.0), (3, 7.5)]


def test_execute_without_callbacks_raises(spark, tmp_path):
    d = Deisa(spark=spark, transport_dir=str(tmp_path / "t"))
    try:
        d.execute_callbacks()
    except RuntimeError as e:
        assert "register at least one callback" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected RuntimeError")


def test_analytics_first_through_compat(spark, tmp_path):
    """Either side may start first through the shim too (A18)."""
    transport = str(tmp_path / "transport")
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))
    seen: list[int] = []

    @d.register("array")
    def cb(array):
        seen.append(array[-1].t)

    th = threading.Thread(target=d.execute_callbacks, daemon=True)
    th.start()

    import time

    time.sleep(1.0)
    b = Bridge(
        arrays_metadata={
            "array": {
                "global_shape": (2, 2),
                "chunk_shape": (2, 2),
                "chunk_position": (0, 0),
            }
        },
        transport_dir=transport,
    )
    for t in range(3):
        b.send("array", t * np.ones((2, 2), dtype=np.int64), t)
    b.close(2)
    th.join(timeout=90)
    assert not th.is_alive()
    assert seen == [0, 1, 2]


def test_bridge_positional_order_matches_reference(tmp_path):
    """Reference signature is Bridge(comm, arrays_metadata, ...)
    (bridge.py:201-207): positional comm-first must bind correctly, a
    communicator's Get_rank() supplies the bridge id, the older
    metadata-first style still works, and a wrong type raises a clear
    TypeError naming the signature difference."""
    md = {
        "array": {
            "global_shape": (4, 4),
            "chunk_shape": (2, 2),
            "chunk_position": (1, 0),
        }
    }

    class FakeComm:
        def Get_rank(self):
            return 3

    b = Bridge(FakeComm(), md, transport_dir=str(tmp_path / "t1"))
    assert b.node_id == "spark-bridge-3"  # from comm.Get_rank()

    b2 = Bridge(None, md, transport_dir=str(tmp_path / "t2"))
    assert b2.node_id == "spark-bridge-2"  # row-major of (1, 0) in 2x2

    b3 = Bridge(md, transport_dir=str(tmp_path / "t3"))  # metadata-first
    assert b3.node_id == "spark-bridge-2"

    import pytest as _pytest

    with _pytest.raises(TypeError, match="comm FIRST"):
        Bridge(object(), None, transport_dir=str(tmp_path / "t4"))


def test_quickstart_compute_idiom(spark, tmp_path):
    """The reference quickstart's callback body ports verbatim:
    ``latest.mean().compute()`` (docs/source/quick_start.rst analytics
    snippet) — lazy verb + .compute(), computed as ONE distributed
    aggregate over the chunk cells (std is population, ddof=0,
    reference tests/test_analytics.py:42)."""
    transport = str(tmp_path / "transport")
    bridges = [
        Bridge(
            None,
            {
                "array": {
                    "global_shape": (4, 4),
                    "chunk_shape": (2, 2),
                    "chunk_position": (r // 2, r % 2),
                }
            },
            transport_dir=transport,
        )
        for r in range(4)
    ]
    for t in range(3):
        for r, b in enumerate(bridges):
            b.send("array", t * (r + 1) * np.ones((2, 2), dtype=np.int64), t)
    bridges[0].close(2)

    got = {}
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))

    @d.register(Window("array"))
    def summary_callback(array):
        latest = array[-1]
        got[latest.t] = (
            latest.mean().compute(),
            latest.sum().compute(),
            latest.min().compute(),
            latest.max().compute(),
        )

    d.execute_callbacks()
    # rank r sends t*(r+1)*ones -> sum = 4t*(1+2+3+4) = 40t over 16
    # cells; min = rank 0's value = t, max = rank 3's = 4t
    assert got == {t: (2.5 * t, 40.0 * t, 1.0 * t, 4.0 * t) for t in range(3)}


def test_reference_analytics_idioms_port_verbatim(spark, tmp_path):
    """The reference's analytics test callback (tests/test_analytics.py:
    25-102) ported with its dask idioms intact — persist, compute,
    scalar aggs, scalar/elementwise arithmetic, slicing, .T, @, clip,
    where, sqrt, astype, concatenate+rechunk, axis-mean centering, SVD,
    FFT — via `from deisa_ray_spark.compat import da` instead of
    `import dask.array as da`. Same input ([[1, 2]]), same golden
    values, byte-for-byte the reference's assertions."""
    from deisa_ray_spark.compat import da

    transport = str(tmp_path / "transport")
    bridge = Bridge(
        None,
        {"array": {"global_shape": (1, 2), "chunk_shape": (1, 2),
                   "chunk_position": (0, 0)}},
        transport_dir=transport,
    )
    bridge.send("array", np.array([[1, 2]], dtype=np.int64), 0)
    bridge.close(0)

    ran = []
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))

    @d.register("array")
    def analytics_callback(array):
        d_arr = array[0]

        d_arr_p = d_arr.persist()

        computed = d_arr.compute()
        np.testing.assert_array_equal(computed, np.array([[1, 2]], dtype=np.int64))

        assert isinstance(d_arr.mean().compute(), float)
        assert d_arr_p.mean().compute() == 1.5
        assert d_arr.sum().compute() == 3
        assert d_arr.min().compute() == 1
        assert d_arr.max().compute() == 2
        assert d_arr.std().compute() == 0.5

        np.testing.assert_array_equal(
            (d_arr * 2).compute(), np.array([[2, 4]], dtype=np.int64))
        np.testing.assert_array_equal(
            (d_arr * d_arr).compute(), np.array([[1, 4]], dtype=np.int64))
        np.testing.assert_array_equal(
            d_arr[:, :1].compute(), np.array([[1]], dtype=np.int64))
        np.testing.assert_array_equal(
            d_arr.T.compute(), np.array([[1], [2]], dtype=np.int64))
        np.testing.assert_array_equal(
            (d_arr.T @ d_arr).compute(),
            np.array([[1, 2], [2, 4]], dtype=np.int64))
        np.testing.assert_array_equal(
            d_arr.clip(1, 1).compute(), np.array([[1, 1]], dtype=np.int64))
        np.testing.assert_array_equal(
            da.where(d_arr > 1, d_arr, 0).compute(),
            np.array([[0, 2]], dtype=np.int64))
        np.testing.assert_allclose(
            da.sqrt(d_arr.astype(float)).compute(),
            np.array([[1.0, np.sqrt(2.0)]]))

        stacked = da.concatenate(
            [d_arr, d_arr * 2, d_arr * 3], axis=0).rechunk((3, 2))
        np.testing.assert_array_equal(
            stacked.compute(),
            np.array([[1, 2], [2, 4], [3, 6]], dtype=np.int64))

        centered = stacked.astype(float) - stacked.mean(axis=0)
        _, singular_values, principal_components = da.linalg.svd(centered)
        np.testing.assert_allclose(
            singular_values.compute(), np.array([np.sqrt(10.0), 0.0]),
            atol=1e-12)
        np.testing.assert_allclose(
            np.abs(principal_components.compute()[0]),
            np.array([1 / np.sqrt(5), 2 / np.sqrt(5)]))

        fft = da.fft.fft(d_arr.astype(float).rechunk((1, 2)), axis=1).compute()
        np.testing.assert_allclose(fft, np.array([[3.0 + 0.0j, -1.0 + 0.0j]]))

        ran.append(d_arr.t)

    d.execute_callbacks()
    assert ran == [0]


def test_zero_config_ambient_transport(spark, tmp_path, monkeypatch):
    """The reference quickstart constructs ``Deisa()`` and
    ``Bridge(arrays_metadata=..., comm=...)`` with NO cluster argument —
    Ray is ambient. The shim's ambient channel is
    $DEISA_SPARK_TRANSPORT_DIR: with it exported, the verbatim
    zero-config forms work; without it, a clear TypeError names the fix."""
    import pytest as _pytest

    monkeypatch.delenv("DEISA_SPARK_TRANSPORT_DIR", raising=False)
    with _pytest.raises(TypeError, match="DEISA_SPARK_TRANSPORT_DIR"):
        Deisa(spark=spark)

    transport = str(tmp_path / "ambient")
    monkeypatch.setenv("DEISA_SPARK_TRANSPORT_DIR", transport)
    b = Bridge(
        arrays_metadata={
            "array": {"global_shape": (2, 2), "chunk_shape": (2, 2),
                      "chunk_position": (0, 0)}
        },
        comm=None,
    )
    b.send("array", np.ones((2, 2), dtype=np.int64), 0)
    b.close(0)

    seen = []
    d = Deisa(spark=spark, checkpoint_dir=str(tmp_path / "ck"))

    @d.register("array")
    def cb(array):
        seen.append(float(array[-1].sum().compute()))

    d.execute_callbacks()
    assert seen == [4.0]


def test_analytics_doc_examples_port(spark, tmp_path):
    """The analytics-guide examples (docs/source/analytics.rst:100-177)
    port verbatim: the three-point rate (newest - oldest) / dt, the
    five-point average via builtin sum() over the window list, and
    sum().persist() whose compute() reuses the materialized value."""
    transport = str(tmp_path / "transport")
    b = Bridge(
        None,
        {"temperature": {"global_shape": (2, 2), "chunk_shape": (2, 2),
                         "chunk_position": (0, 0)}},
        transport_dir=transport,
    )
    for t in range(6):
        b.send("temperature", t * np.ones((2, 2), dtype=np.float64), t)
    b.close(5)

    rates, fives, persisted = [], [], []
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))

    @d.register(Window("temperature", size=5))
    def estimate_temperature_change(temperature):
        total = temperature[-1].sum().persist()
        persisted.append(total.compute())

        if len(temperature) >= 3:
            newest, oldest = temperature[-1], temperature[-3]
            three_point_rate = (newest - oldest) / (newest.t - oldest.t)
            rates.append(three_point_rate.mean().compute())

        if len(temperature) < 5:
            return
        five_point_average = sum(ts for ts in temperature) / 5
        fives.append(five_point_average.mean().compute())

    d.execute_callbacks()
    assert persisted == [4.0 * t for t in range(6)]   # sum = 4t
    assert rates == [1.0] * 4                         # dT/dt = 1 everywhere
    # five newest timesteps end at t=4 (mean 2) and t=5 (mean 3)
    assert fives == [2.0, 3.0]


def test_doc_hdf5_save_idioms(spark, tmp_path):
    """The save examples from the analytics guide port verbatim: the
    method form ``temperature[0].to_hdf5(fname, dataset)`` and the
    module-level dict form ``to_hdf5(fname, {name: arr})``
    (docs/source/analytics.rst:185-225; reference types.py:318,451).
    Round-trips are byte-checked through the VDS reader."""
    from deisa_ray_spark.compat import to_hdf5
    from deisa_ray_spark.sinks import read_vds

    transport = str(tmp_path / "transport")
    md = {
        name: {"global_shape": (2, 2), "chunk_shape": (2, 2),
               "chunk_position": (0, 0)}
        for name in ("temperature", "pressure")
    }
    b = Bridge(None, md, transport_dir=transport)
    b.send("temperature", np.arange(4, dtype=np.int64).reshape(2, 2), 0)
    b.send("pressure", 10 * np.arange(4, dtype=np.int64).reshape(2, 2), 0)
    b.close(0)

    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))
    single = str(tmp_path / "interesting-event.h5")
    multi = str(tmp_path / "state.h5")

    @d.register(Window("temperature"), Window("pressure"), when="AND")
    def save_state_snapshot(temperature, pressure):
        temperature[0].to_hdf5(single, "temperature")
        to_hdf5(multi, {"temperature": temperature[0], "pressure": pressure[0]})

    d.execute_callbacks()

    np.testing.assert_array_equal(
        read_vds(single, "temperature"), np.arange(4).reshape(2, 2))
    np.testing.assert_array_equal(
        read_vds(multi, "temperature"), np.arange(4).reshape(2, 2))
    np.testing.assert_array_equal(
        read_vds(multi, "pressure"), 10 * np.arange(4).reshape(2, 2))


def test_lazy_scalar_and_mixed_arithmetic(spark, tmp_path):
    """Dask-scalar arithmetic stays lazy and mixes freely with arrays:
    anomaly = d_arr - d_arr.mean() (array minus lazy scalar),
    2 * d_arr.sum() + 1 (scalar chain), and a normalized ratio of two
    lazy scalars — shapes a reference callback produces constantly."""
    transport = str(tmp_path / "transport")
    b = Bridge(
        None,
        {"array": {"global_shape": (1, 2), "chunk_shape": (1, 2),
                   "chunk_position": (0, 0)}},
        transport_dir=transport,
    )
    b.send("array", np.array([[1, 3]], dtype=np.float64), 0)
    b.close(0)

    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))
    out = {}

    @d.register("array")
    def cb(array):
        a = array[0]
        out["anomaly"] = (a - a.mean()).compute()          # array - lazy scalar
        out["chain"] = (2 * a.sum() + 1).compute()         # lazy scalar chain
        out["ratio"] = (a.max() / a.min()).compute()       # lazy / lazy

    d.execute_callbacks()
    np.testing.assert_array_equal(out["anomaly"], np.array([[-1.0, 1.0]]))
    assert out["chain"] == 9.0
    assert out["ratio"] == 3.0


def test_nd_array_lazy_aggregates(spark, tmp_path):
    """The lazy aggregate verbs work at ANY rank: a 3-D field's
    latest.mean().compute() must aggregate, not trip the 2-D cell
    exploder (the engine transports N-D arrays; quickstart idioms must
    follow)."""
    transport = str(tmp_path / "transport")
    b = Bridge(
        None,
        {"field3d": {"global_shape": (2, 2, 2), "chunk_shape": (2, 2, 2),
                     "chunk_position": (0, 0, 0)}},
        transport_dir=transport,
    )
    b.send("field3d", np.arange(8, dtype=np.float64).reshape(2, 2, 2), 0)
    b.close(0)

    out = {}
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))

    @d.register("field3d")
    def cb(field3d):
        a = field3d[-1]
        out["mean"] = a.mean().compute()
        out["max"] = a.max().compute()
        out["dense"] = a.compute()

    d.execute_callbacks()
    assert out["mean"] == 3.5 and out["max"] == 7.0
    np.testing.assert_array_equal(out["dense"], np.arange(8).reshape(2, 2, 2))


def test_cells_nd_distributed_surface(spark, tmp_path):
    """cells_nd() exposes the rank-agnostic long form for distributed
    analytics on N-D fields — coord is the global index vector and a
    Spark aggregation over it matches the dense assembly."""
    from pyspark.sql import functions as F

    transport = str(tmp_path / "transport")
    b = Bridge(
        None,
        {"f": {"global_shape": (2, 2, 2), "chunk_shape": (2, 2, 2),
               "chunk_position": (0, 0, 0)}},
        transport_dir=transport,
    )
    b.send("f", np.arange(8, dtype=np.float64).reshape(2, 2, 2), 0)
    b.close(0)

    out = {}
    d = Deisa(spark=spark, transport_dir=transport, checkpoint_dir=str(tmp_path / "ck"))

    @d.register("f")
    def cb(f):
        cells = f[-1].cells_nd()
        out["n"] = cells.count()
        out["sum"] = cells.agg(F.sum("value")).first()[0]
        # axis-0 slab sums via element_at on the coord vector
        out["slabs"] = {
            int(r["k"]): float(r["s"])
            for r in cells.groupBy(F.element_at("coord", 1).alias("k"))
            .agg(F.sum("value").alias("s"))
            .collect()
        }

    d.execute_callbacks()
    assert out["n"] == 8 and out["sum"] == 28.0
    assert out["slabs"] == {0: 6.0, 1: 22.0}  # arange slabs 0-3 / 4-7


def test_crashing_callback_prints_and_continues_under_compat(tmp_path, capfd):
    """Reference default exception policy (errors.py:27-42,
    window_handler.py:176): a callback raising an ordinary exception is
    reported to stderr and the run CONTINUES — later timesteps still
    dispatch. (The native engine API keeps raise-by-default; this is
    compat-only.)"""
    import numpy as np

    from deisa_ray_spark import compat

    transport = str(tmp_path / "transport")
    md = {
        "temperature": {
            "global_shape": (2, 2),
            "chunk_shape": (2, 2),
            "chunk_position": (0, 0),
        }
    }
    b = compat.Bridge(None, md, transport_dir=transport)
    for t in range(3):
        b.send("temperature", t * np.ones((2, 2)), t)
    b.close(2)

    seen = []

    d = compat.Deisa(transport_dir=transport, checkpoint_dir=str(tmp_path / 'ck'))

    @d.register("temperature")
    def cb(temperature):
        seen.append(temperature[-1].t)
        if temperature[-1].t == 0:
            raise ZeroDivisionError("boom at t=0")

    d.execute_callbacks()
    assert seen == [0, 1, 2]  # t=0 crashed, t=1/2 still ran
    err = capfd.readouterr().err
    assert "ZeroDivisionError" in err and "boom at t=0" in err


def test_contract_error_message_attribute_matches_reference():
    from deisa_ray_spark.compat import ConfigError, ContractError

    e = ContractError()
    assert e.message == "Contract not satisfied."
    assert issubclass(ConfigError, RuntimeError)


def test_config_error_is_one_class_across_modules():
    # a local redefinition in compat would split the type — an except
    # clause catching one spelling would miss raises of the other
    from deisa_ray_spark import compat, errors

    assert compat.ConfigError is errors.ConfigError
