"""Lazy handles for the migration compute surface — ONE implementation
shared by the engine's ArrayFrame verbs and the compat layer's ``da``
shim (previously three divergent copies; the reference's dask handles
are likewise one type each for array and scalar).

Semantics mirror dask's handles as far as the migration contract needs:

- build now, ``compute()`` later; ``compute()`` is MEMOIZED per handle
  (dask computes each graph key once — without this, diamond-shaped
  reuse like ``x + x`` re-materializes the whole base array per
  occurrence, exponential in nesting depth).
- ``persist()`` materializes eagerly; further computes are free.
- full operator surface including the right-hand forms, unary ops,
  ``**``, and ELEMENTWISE comparisons (``d_arr == sentinel`` must be a
  lazy mask, not Python identity — a silent-wrong-data trap otherwise).
- ``__array_ufunc__ = None`` so an ndarray on the LEFT defers to our
  reflected ops instead of broadcasting the handle into an
  object-dtype ndarray of per-element thunks.
- scalar comparisons yield a lazy boolean whose ``__bool__`` computes,
  so ``if temperature[-1].max() > 300:`` runs verbatim.

Evaluation lands on the driver — the same place the reference's dask
``.compute()`` lands; the distributed twins of every kernel live in
operators/grid_ops.py / operators/linalg.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

_UNSET = object()


def _val(x: Any):
    """Resolve an operand: lazy handle / ArrayFrame / plain value."""
    if isinstance(x, (LazyArray, LazyScalar)):
        return x.compute()
    h = getattr(x, "_lazy", None)
    if callable(h):  # ArrayFrame: reuse its memoized per-frame handle
        return h().compute()
    if hasattr(x, "to_numpy"):  # foreign array-frame operand
        return x.to_numpy()
    if hasattr(x, "compute"):  # foreign lazy handle
        return x.compute()
    return x


def _is_arraylike(x: Any) -> bool:
    """Operands that make a scalar-OP-x result an ARRAY (dask promotes
    scalar⊗array to an array handle, never a scalar one)."""
    return (
        isinstance(x, (LazyArray, np.ndarray, list, tuple))
        or callable(getattr(x, "_lazy", None))
        or hasattr(x, "to_numpy")
    )


class LazyScalar:
    """Deferred scalar (dask-scalar shape): lazy arithmetic and
    comparisons; ``__bool__`` computes, so threshold ``if``s work."""

    __array_ufunc__ = None  # ndarray OP scalar-handle → our reflected op
    __array_priority__ = 1000

    def __init__(self, fn: Callable[[], Any]) -> None:
        self._fn = fn
        self._cache: Any = _UNSET

    def compute(self):
        if self._cache is _UNSET:
            self._cache = self._fn()
        return self._cache

    def persist(self) -> "LazyScalar":
        self.compute()
        return self

    # -- arithmetic (stays lazy) ------------------------------------------

    def _bin(self, other, op):
        # scalar ⊗ array promotes to an ARRAY handle (dask semantics):
        # the result needs .T / indexing / axis aggs, and LazyScalar's
        # __bool__/__float__ would raise on its multi-element value.
        if _is_arraylike(other):
            return LazyArray(lambda: op(self.compute(), _val(other)))
        return LazyScalar(lambda: op(self.compute(), _val(other)))

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._bin(o, lambda a, b: b / a)

    def __pow__(self, o):
        return self._bin(o, lambda a, b: a**b)

    def __neg__(self):
        return LazyScalar(lambda: -self.compute())

    def __abs__(self):
        return LazyScalar(lambda: abs(self.compute()))

    # -- comparisons: lazy bool; __bool__ computes (dask's 0-d behavior) --

    def __gt__(self, o):
        return self._bin(o, lambda a, b: a > b)

    def __lt__(self, o):
        return self._bin(o, lambda a, b: a < b)

    def __ge__(self, o):
        return self._bin(o, lambda a, b: a >= b)

    def __le__(self, o):
        return self._bin(o, lambda a, b: a <= b)

    def __eq__(self, o):  # lazy equality, not identity
        return self._bin(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._bin(o, lambda a, b: a != b)

    __hash__ = object.__hash__  # defining __eq__ would otherwise unhash

    def __bool__(self) -> bool:
        return bool(self.compute())

    def __float__(self) -> float:
        return float(self.compute())

    def __int__(self) -> int:
        return int(self.compute())


class LazyArray:
    """Deferred ndarray expression (the dask-array handle shape)."""

    __array_ufunc__ = None  # ndarray OP handle → our reflected op
    __array_priority__ = 1000

    def __init__(self, thunk: Callable[[], np.ndarray]) -> None:
        self._thunk = thunk
        self._cache: Any = _UNSET

    # -- materialization ---------------------------------------------------

    def compute(self) -> np.ndarray:
        if self._cache is _UNSET:
            self._cache = self._thunk()
        return self._cache

    def persist(self) -> "LazyArray":
        self.compute()
        return self

    def rechunk(self, *_a, **_k) -> "LazyArray":
        return self  # chunking is the engine's concern (SURVEY B16)

    # -- elementwise / structural ops --------------------------------------

    def _bin(self, other, op) -> "LazyArray":
        return LazyArray(lambda: op(self.compute(), _val(other)))

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._bin(o, lambda a, b: b / a)

    def __matmul__(self, o):
        return self._bin(o, lambda a, b: a @ b)

    def __rmatmul__(self, o):
        return self._bin(o, lambda a, b: b @ a)

    def __pow__(self, o):
        return self._bin(o, lambda a, b: a**b)

    def __neg__(self):
        return LazyArray(lambda: -self.compute())

    def __abs__(self):
        return LazyArray(lambda: np.abs(self.compute()))

    # -- elementwise comparisons (lazy masks, dask semantics) --------------

    def __gt__(self, o):
        return self._bin(o, lambda a, b: a > b)

    def __lt__(self, o):
        return self._bin(o, lambda a, b: a < b)

    def __ge__(self, o):
        return self._bin(o, lambda a, b: a >= b)

    def __le__(self, o):
        return self._bin(o, lambda a, b: a <= b)

    def __eq__(self, o):  # elementwise, NOT identity — silent-data trap
        return self._bin(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._bin(o, lambda a, b: a != b)

    __hash__ = object.__hash__

    def __bool__(self) -> bool:
        # numpy/dask semantics: single-element truthiness computes,
        # multi-element raises the ambiguity error — never silently True
        # (``if d_arr == x:`` must not pass unexamined)
        return bool(self.compute())

    def __getitem__(self, idx) -> "LazyArray":
        return LazyArray(lambda: self.compute()[idx])

    @property
    def T(self) -> "LazyArray":  # noqa: N802 — numpy/dask name
        return LazyArray(lambda: self.compute().T)

    def astype(self, dtype) -> "LazyArray":
        return LazyArray(lambda: self.compute().astype(dtype))

    def clip(self, lo, hi) -> "LazyArray":
        return LazyArray(lambda: np.clip(self.compute(), lo, hi))

    # -- aggregations (scalar unless axis= given, like dask) ---------------

    def _agg(self, fn, axis=None):
        if axis is None:
            # .item(), not float(): whole-array aggregation of a complex
            # result (da.fft.fft(x).mean()) must stay complex, and an
            # integer dtype must not silently widen — real floats still
            # come back as Python float, preserving the float contract.
            def run():
                r = fn(self.compute())
                return r.item() if isinstance(r, np.generic) else r

            return LazyScalar(run)
        return LazyArray(lambda: fn(self.compute(), axis=axis))

    def mean(self, axis=None):
        return self._agg(np.mean, axis)

    def sum(self, axis=None):
        return self._agg(np.sum, axis)

    def min(self, axis=None):
        return self._agg(np.min, axis)

    def max(self, axis=None):
        return self._agg(np.max, axis)

    def std(self, axis=None):  # population, the reference's contract
        return self._agg(np.std, axis)


def as_lazy(x) -> LazyArray:
    """ArrayFrame | LazyArray | ndarray/scalar → LazyArray."""
    if isinstance(x, LazyArray):
        return x
    h = getattr(x, "_lazy", None)
    if callable(h):  # ArrayFrame: its memoized handle, not a fresh one —
        return h()  # da.where(f > 1, f, 0) must densify f ONCE
    if hasattr(x, "to_numpy"):  # foreign array-frame
        return LazyArray(x.to_numpy)
    return LazyArray(lambda: np.asarray(x))
