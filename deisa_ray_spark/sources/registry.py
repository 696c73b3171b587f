"""Parquet table registry for the synthetic star schema + doc/embedding
tables (TESTDATA.md).

The reference has no file readers at all (SURVEY §2.C "Scans"); Spark's
parquet source gives us scans with predicate pushdown and column pruning
for free. At 100 TB these tables would be partitioned directories; the
reader code is identical — ``spark.read.parquet`` over a directory prunes
partitions from pushed-down filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor: region is
# 5 rows and nation 25 at every TPC-H SF; broadcasting them never shuffles.
BROADCAST_TABLES = frozenset({"region", "nation"})

#: The normalized schema CONTRACT every downstream query sees, regardless
#: of the physical types the parquet files happen to store. The testdata
#: regenerates between rounds and physical-type drift has already happened
#: once (TIMESTAMP(NANOS)->TIMESTAMP_NTZ on events.ts); the loader is the
#: single normalization point, so any future drift is absorbed here by a
#: cast (temporal/numeric widening) instead of surfacing as a deep
#: hash-mismatch in some query. tests/test_schema_canary.py asserts this
#: exact mapping after load for every table.
SCHEMA_CONTRACT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


class SchemaContractError(RuntimeError):
    """A loaded table is missing a column the contract requires — casting
    cannot absorb that; fail loudly at the loader, not deep in a query."""


def _apply_contract(name: str, df: DataFrame) -> DataFrame:
    """Normalize ``df`` to ``SCHEMA_CONTRACT[name]``.

    Fast path: schema already matches -> return df unchanged (zero plan
    overhead; the common case every round the data does NOT drift). Drift
    path: select contract columns in contract order, casting any column
    whose loaded type differs. Extra physical columns are dropped — the
    contract IS the query-visible surface. A missing column raises
    :class:`SchemaContractError` immediately.
    """
    from pyspark.sql import functions as F

    contract = SCHEMA_CONTRACT[name]
    loaded = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    # ORDER-SENSITIVE compare: dict equality ignores insertion order, but
    # the contract guarantees column ORDER too (positional consumers,
    # value-hash gates) — a reordered-columns regeneration must take the
    # normalization path, not the fast path.
    if list(loaded.items()) == list(contract.items()):
        return df
    missing = [c for c in contract if c not in loaded]
    if missing:
        raise SchemaContractError(
            f"table {name!r} is missing contract column(s) {missing}; "
            f"loaded schema: {loaded}"
        )
    cols = [
        F.col(c).cast(t).alias(c) if loaded[c] != t else F.col(c)
        for c, t in contract.items()
    ]
    return df.select(*cols)


#: DataFrame cache keyed by (applicationId, sf_dir, table). Constructing
#: a parquet DataFrame costs ~80 ms (file listing + footer schema read);
#: the bench builds each query 3× and most queries load 2-5 tables, so
#: uncached construction alone is seconds of pure overhead.
#:
#: Contract: the registry tables are READ-ONLY fixtures — a cached
#: DataFrame pins its file listing, so rewriting a table in-place within
#: one application would serve a stale snapshot (use spark.read directly
#: for mutable paths). Entries from other applicationIds are evicted on
#: access, so a process cycling many sessions holds at most one
#: session's worth of plans.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    app_id = spark.sparkContext.applicationId
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]
    key = (app_id, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = _apply_contract(name, df)
        _TABLE_CACHE[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long via the
    legacy conf (runtime-settable; only affects NANOS columns) and convert
    to a micro-precision timestamp — still a native columnar scan with
    pushdown on every other column."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer division: float `/ 1000` loses 1 µs on half the rows
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type != "timestamp":
        # The loader owns the schema contract: whatever physical type the
        # file stores (TIMESTAMP_NTZ, TIMESTAMP_MICROS, ...), downstream
        # queries see TimestampType. NTZ->TIMESTAMP is a no-op under the
        # UTC session timezone pinned in session.py.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: Explicit schema for JSONL document corpora (the standard LLM-corpus
#: interchange format: one JSON object per line). Matches the parquet
#: ``documents`` table column-for-column.
DOCUMENTS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def load_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL document corpus with the declared schema.

    The schema is explicit, never inferred: at 100 TB schema inference is
    itself a full scan of the corpus before the first real job runs.
    Corrupt lines land in no row rather than poisoning the schema
    (mode=PERMISSIVE with all-null rows dropped via doc_id presence)."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .json(path)
        .filter("doc_id IS NOT NULL")
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
