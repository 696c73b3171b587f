"""Schema-drift canary: every loader-normalized table must match
``SCHEMA_CONTRACT`` exactly after load.

The testdata parquet regenerates each round, and physical-type drift has
already burned a round (events.ts TIMESTAMP(NANOS) -> TIMESTAMP_NTZ in
r2, which zeroed the bench). The loader (``sources/registry.py``) is the
single normalization point; this test makes any future drift fail in ONE
obvious place instead of as a value-hash mismatch deep inside a query.

Also proves the absorption path: a deliberately drifted physical file
(DATE instead of TIMESTAMP_NTZ, INT32 instead of INT64) loads back to
the exact contract schema, and a file missing a contract column raises
``SchemaContractError`` at the loader.
"""

from __future__ import annotations

import os

import pytest

from deisa_ray_spark.sources import registry
from deisa_ray_spark.sources.registry import (
    SCHEMA_CONTRACT,
    SchemaContractError,
    TABLES,
    load_table,
)

from .conftest import SF_DIR


def test_contract_covers_every_table():
    assert set(SCHEMA_CONTRACT) == set(TABLES)


@pytest.mark.parametrize("name", TABLES)
def test_loaded_schema_matches_contract(spark, name):
    df = load_table(spark, SF_DIR, name)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    # column ORDER is part of the contract (positional consumers)
    assert list(got.items()) == list(SCHEMA_CONTRACT[name].items())
    assert got == SCHEMA_CONTRACT[name], (
        f"schema drift on table {name!r}: loaded+normalized {got} != "
        f"contract {SCHEMA_CONTRACT[name]} — either the testdata physical "
        f"types drifted past what _apply_contract can cast, or the "
        f"contract in sources/registry.py needs a deliberate update"
    )


def test_drifted_physical_types_are_absorbed(spark, tmp_path):
    """A regenerated file with different-but-castable physical types must
    load to the identical contract schema (the r2 failure mode)."""
    import duckdb

    drift_dir = str(tmp_path / "drift")
    os.makedirs(drift_dir)
    con = duckdb.connect()
    # DATE instead of TIMESTAMP_NTZ, INT32 keys instead of INT64, an extra
    # physical column the contract does not know about.
    con.execute(
        f"""
        COPY (
          SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey,
                 o_custkey, o_orderstatus, o_totalprice,
                 CAST(o_orderdate AS DATE) AS o_orderdate,
                 o_orderpriority,
                 42 AS surprise_extra_col
          FROM read_parquet('{SF_DIR}/orders.parquet') LIMIT 50
        ) TO '{drift_dir}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    df = load_table(spark, drift_dir, "orders")
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got == SCHEMA_CONTRACT["orders"]
    assert df.count() == 50
    # values survive the cast (date midnight == ntz midnight)
    row = df.select("o_orderkey", "o_orderdate").orderBy("o_orderkey").first()
    assert row.o_orderdate is not None


def test_reordered_columns_are_renormalized(spark, tmp_path):
    """Same names/types but a different physical column order must take
    the normalization path and come back in contract order (dict
    equality is order-blind — the fast path must not be)."""
    import duckdb

    drift_dir = str(tmp_path / "reorder")
    os.makedirs(drift_dir)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT r_name, r_regionkey
          FROM read_parquet('{SF_DIR}/region.parquet')
        ) TO '{drift_dir}/region.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    df = load_table(spark, drift_dir, "region")
    assert df.columns == list(SCHEMA_CONTRACT["region"])


def test_missing_contract_column_fails_fast(spark, tmp_path):
    import duckdb

    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT r_regionkey FROM read_parquet('{SF_DIR}/region.parquet')
        ) TO '{bad_dir}/region.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    with pytest.raises(SchemaContractError, match="r_name"):
        load_table(spark, bad_dir, "region")


def test_fast_path_is_zero_overhead(spark):
    """When the physical schema already matches, load_table must return
    the raw scan with NO extra Project node injected by the contract."""
    registry._TABLE_CACHE.clear()
    df = load_table(spark, SF_DIR, "customer")
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "Project" not in plan, plan
