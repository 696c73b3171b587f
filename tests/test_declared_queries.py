"""Oracle check for every declared query — the local mirror of the
driver's t2 correctness gate (CORRECTNESS_r{N}.json): run the Spark plan
and the DuckDB twin, compare order-insensitively with name-sorted
columns."""

from __future__ import annotations

import pytest

from deisa_ray_spark.registry import load_all
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = load_all()
ORACLED = sorted(name for name, spec in QUERIES.items() if spec.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    # File-reading oracles (read_blob) embed the driver's correctness SF
    # literally (oracle SQL is static; the driver runs it at sf0.01) —
    # retarget them at the test SF so both sides read the same files.
    oracle = spec.oracle.replace("/root/testdata/sf0.01", SF_DIR)
    assert_matches_oracle(df, duck, oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
