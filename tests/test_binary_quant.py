"""Property tests for the binary-quantization bit packing: the Spark
expression tree in _bq_halves must agree with a pure-Python packer on
random vectors (including zeros and exact sign boundaries), and the
Hamming expression must equal popcount of the packed XOR.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from deisa_ray_spark.functions.similarity import BQ_DIM, _bq_halves


def _py_halves(vec: list[float]) -> tuple[int, int]:
    lo = sum(1 << j for j in range(32) if vec[j] > 0)
    hi = sum(1 << (j - 32) for j in range(32, BQ_DIM) if vec[j] > 0)
    return lo, hi


def test_packing_matches_python(spark):
    rng = random.Random(3)
    vecs = []
    for _ in range(20):
        v = [rng.uniform(-1, 1) for _ in range(BQ_DIM)]
        # exact boundary values: 0.0 must pack as NOT set (> 0, not >=)
        v[rng.randrange(BQ_DIM)] = 0.0
        vecs.append(v)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i int, e array<double>"
    )
    lo, hi = _bq_halves(F.col("e"))
    got = {
        r["i"]: (r["lo"], r["hi"])
        for r in df.select("i", lo.alias("lo"), hi.alias("hi")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == _py_halves(v), f"vector {i} packed wrong"
        assert 0 <= got[i][0] < 1 << 32 and 0 <= got[i][1] < 1 << 32


def test_hamming_equals_popcount(spark):
    rng = random.Random(5)
    a = [rng.uniform(-1, 1) for _ in range(BQ_DIM)]
    b = [rng.uniform(-1, 1) for _ in range(BQ_DIM)]
    df = spark.createDataFrame([(a, b)], "ea array<double>, eb array<double>")
    alo, ahi = _bq_halves(F.col("ea"))
    blo, bhi = _bq_halves(F.col("eb"))
    ham = (
        F.bit_count(alo.bitwiseXOR(blo)) + F.bit_count(ahi.bitwiseXOR(bhi))
    ).cast("int")
    got = df.select(ham.alias("h")).collect()[0]["h"]
    pa, pb = _py_halves(a), _py_halves(b)
    want = bin((pa[0] ^ pb[0]) | ((pa[1] ^ pb[1]) << 32)).count("1")
    assert got == want


def test_bq_halves_rejects_short_vector(spark):
    """Precondition guard: a vector narrower than BQ_DIM must raise, not
    silently pack missing dims as 0 (the element_at-past-end NULL trap)."""
    import pytest

    df = spark.createDataFrame([(1, [0.5] * (BQ_DIM - 1))], "i int, e array<double>")
    lo, _hi = _bq_halves(F.col("e"))
    with pytest.raises(Exception, match="64-dim"):
        df.select(lo.alias("lo")).collect()


def _py_level(x: float, t: float) -> int:
    """4-level thermometer quantizer: # thresholds in (-t, 0, t) below x."""
    return (x > -t) + (x > 0) + (x > t)


def test_thermometer_hamming_equals_quantized_l1(spark):
    """The 3-plane thermometer Hamming must equal the L1 distance of the
    4-level quantized values — the property that makes it a valid
    multi-bit distance (each crossed threshold flips exactly one bit)."""
    from deisa_ray_spark.functions.similarity import BQ2_T

    rng = random.Random(11)
    pairs = []
    for _ in range(15):
        a = [rng.uniform(-0.3, 0.3) for _ in range(BQ_DIM)]
        b = [rng.uniform(-0.3, 0.3) for _ in range(BQ_DIM)]
        # exact boundary hits: value equal to a threshold is NOT above it
        a[0], b[1], a[2] = BQ2_T, -BQ2_T, 0.0
        pairs.append((a, b))
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i int, ea array<double>, eb array<double>",
    )
    ham = F.lit(0)
    for t in (BQ2_T, 0.0, -BQ2_T):
        alo, ahi = _bq_halves(F.col("ea"), t)
        blo, bhi = _bq_halves(F.col("eb"), t)
        ham = ham + F.bit_count(alo.bitwiseXOR(blo)) + F.bit_count(ahi.bitwiseXOR(bhi))
    got = {r["i"]: r["h"] for r in df.select("i", ham.cast("int").alias("h")).collect()}
    for i, (a, b) in enumerate(pairs):
        want = sum(abs(_py_level(x, BQ2_T) - _py_level(y, BQ2_T)) for x, y in zip(a, b))
        assert got[i] == want, f"pair {i}: {got[i]} != {want}"
