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
