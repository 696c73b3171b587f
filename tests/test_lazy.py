"""Unit tests for the shared lazy-handle module (streaming/lazy.py) —
the dask-semantics contract of the migration surface, pinned without a
SparkSession: full operator surface including reflected/unary/pow
forms, ELEMENTWISE comparisons (not identity), ndarray-on-the-left
deferral, lazy scalar thresholds, and memoized diamond reuse."""

from __future__ import annotations

import numpy as np

from deisa_ray_spark.streaming.lazy import LazyArray, LazyScalar


def _counting(base: np.ndarray):
    calls = {"n": 0}

    def thunk():
        calls["n"] += 1
        return base

    return LazyArray(thunk), calls


def test_operator_surface_matches_numpy():
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    la = LazyArray(lambda: a)
    np.testing.assert_array_equal((la**2).compute(), a**2)
    np.testing.assert_array_equal((-la).compute(), -a)
    np.testing.assert_array_equal(abs(-la).compute(), a)
    np.testing.assert_array_equal((1.0 / la).compute(), 1.0 / a)
    np.testing.assert_array_equal((2 - la).compute(), 2 - a)
    np.testing.assert_array_equal((la >= 2).compute(), a >= 2)
    np.testing.assert_array_equal((la <= 2).compute(), a <= 2)


def test_elementwise_equality_is_a_lazy_mask_not_identity():
    a = np.array([1, 2, 1, 3])
    la = LazyArray(lambda: a)
    mask = la == 1
    assert isinstance(mask, LazyArray)  # NOT a Python bool
    np.testing.assert_array_equal(mask.compute(), np.array([True, False, True, False]))
    np.testing.assert_array_equal((la != 1).compute(), a != 1)
    # the silent-wrong-data trap: where() over an equality mask
    np.testing.assert_array_equal(
        np.where((la == 1).compute(), 0, a), np.array([0, 2, 0, 3])
    )


def test_ndarray_on_the_left_defers_to_reflected_ops():
    a = np.array([1.0, 2.0, 3.0])
    weights = np.array([2.0, 2.0, 2.0])
    la = LazyArray(lambda: a)
    out = weights * la  # ndarray.__mul__ must defer via __array_ufunc__=None
    assert isinstance(out, LazyArray), type(out)
    np.testing.assert_array_equal(out.compute(), weights * a)
    out2 = weights @ la
    assert isinstance(out2, LazyArray)
    assert out2.compute() == 12.0


def test_scalar_threshold_if_works_verbatim():
    hot = LazyScalar(lambda: 400.0)
    cold = LazyScalar(lambda: 200.0)
    assert (hot > 300) and not (cold > 300)  # __bool__ computes
    assert (hot == 400.0) and (cold != 400.0)
    assert float(hot) == 400.0 and int(cold) == 200
    assert abs(-hot).compute() == 400.0
    assert (hot**2).compute() == 160000.0


def test_diamond_reuse_computes_base_once():
    base = np.ones((4, 4))
    la, calls = _counting(base)
    x = la * la
    y = (x + x) - (x / 2)
    np.testing.assert_array_equal(y.compute(), base * 1.5)
    assert calls["n"] == 1, f"base materialized {calls['n']} times"
    # a second compute of the same expression is also free
    y.compute()
    assert calls["n"] == 1


def test_persist_returns_live_handle():
    la, calls = _counting(np.arange(4))
    p = la.persist()
    assert calls["n"] == 1
    assert p.mean().compute() == 1.5
    assert calls["n"] == 1


def test_array_truthiness_matches_numpy():
    import pytest

    one = LazyArray(lambda: np.array([True]))
    many = LazyArray(lambda: np.array([True, False]))
    assert bool(one)
    with pytest.raises(ValueError, match="ambiguous"):
        bool(many)  # never silently True


# -- property: random expression trees evaluate exactly like numpy --------

def test_random_expression_trees_match_numpy():
    """Build random expression trees over LazyArray handles and verify
    compute() equals the same tree evaluated directly in numpy — the
    lazy layer must be a pure deferral, never a semantic change."""
    import random

    rng = random.Random(42)
    nprng = np.random.default_rng(42)

    binops = [
        (lambda x, y: x + y, "+"),
        (lambda x, y: x - y, "-"),
        (lambda x, y: x * y, "*"),
        (lambda x, y: x / y, "/"),
    ]
    unops = [
        (lambda x: -x, "neg"),
        (lambda x: abs(x), "abs"),
        (lambda x: x.clip(-1.0, 1.0) if hasattr(x, "clip") else np.clip(x, -1.0, 1.0), "clip"),
        (lambda x: x.T, "T"),
        (lambda x: x.astype(np.float64), "astype"),
    ]

    for trial in range(25):
        base = nprng.uniform(0.5, 2.0, size=(3, 3))  # away from 0: safe /
        lazy, plain = LazyArray(lambda b=base: b), base
        for _step in range(rng.randint(1, 6)):
            if rng.random() < 0.5:
                op, _n = rng.choice(binops)
                if rng.random() < 0.5:  # scalar operand
                    s = rng.uniform(0.5, 2.0)
                    lazy, plain = op(lazy, s), op(plain, s)
                else:  # self-referencing operand (diamond reuse)
                    lazy, plain = op(lazy, lazy), op(plain, plain)
            else:
                op, _n = rng.choice(unops)
                lazy, plain = op(lazy), op(plain)
        np.testing.assert_allclose(lazy.compute(), plain, rtol=1e-12,
                                   err_msg=f"trial {trial}")
        # scalar verbs agree too (population std)
        np.testing.assert_allclose(lazy.mean().compute(), float(np.mean(plain)))
        np.testing.assert_allclose(lazy.std().compute(), float(np.std(plain)))


def test_scalar_times_array_promotes_to_array_handle():
    # dask promotes scalar⊗array to an array handle with the full array
    # surface (.T, indexing, axis aggs) — LazyScalar must not swallow it
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    weights = np.array([10.0, 100.0])
    s = LazyScalar(lambda: 2.0)
    out = s * weights
    assert isinstance(out, LazyArray), type(out)
    np.testing.assert_array_equal(out.compute(), 2.0 * weights)
    # reflected path and the array surface of the promoted result
    out2 = (weights * s).T
    np.testing.assert_array_equal(out2.compute(), (weights * 2.0).T)
    la = LazyArray(lambda: a)
    prod = LazyScalar(lambda: 3.0) * la
    assert isinstance(prod, LazyArray)
    np.testing.assert_array_equal(prod[0].compute(), 3.0 * a[0])
    np.testing.assert_array_equal(prod.sum(axis=0).compute(), (3.0 * a).sum(axis=0))


def test_whole_array_agg_preserves_complex_and_int_dtypes():
    z = np.fft.fft(np.array([1.0, 2.0, 3.0, 4.0]))
    lz = LazyArray(lambda: z)
    got = lz.mean().compute()  # complex must survive, not TypeError
    assert isinstance(got, complex)
    np.testing.assert_allclose(got, z.mean())
    li = LazyArray(lambda: np.array([1, 2, 3], dtype=np.int64))
    total = li.sum().compute()
    assert isinstance(total, int) and total == 6
    # real floats keep the Python-float contract
    assert isinstance(LazyArray(lambda: np.array([1.0, 2.0])).mean().compute(), float)


def test_frame_operands_reuse_the_memoized_lazy_handle():
    # an ArrayFrame-shaped operand (has _lazy() AND to_numpy) must
    # resolve through its cached handle, not re-materialize per use
    from deisa_ray_spark.streaming.lazy import as_lazy

    class FakeFrame:
        def __init__(self, base):
            self._base = base
            self.n_materialize = 0
            self._handle = None

        def to_numpy(self):
            self.n_materialize += 1
            return self._base

        def _lazy(self):
            if self._handle is None:
                self._handle = LazyArray(self.to_numpy)
            return self._handle

    f = FakeFrame(np.array([1.0, 2.0, 3.0]))
    la = LazyArray(lambda: np.array([10.0, 20.0, 30.0]))
    # the reference idiom: the frame appears in several subexpressions
    expr = (la + f) * (la - f) + as_lazy(f)
    expr.compute()
    (la * f).compute()
    assert f.n_materialize == 1, f.n_materialize
