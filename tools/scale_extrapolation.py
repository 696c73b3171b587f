#!/usr/bin/env python
"""Scale extrapolation: replicate the sf0.1 fact tables 8× (key-shifted,
≈ sf0.8 — 4.8M lineitem rows) into a scratch dir and compare this
engine vs DuckDB on the heaviest bench queries, to measure the MARGINAL
cost trend one decade further than the provided testdata.

Writes its result table to stdout; SCALING.md records the findings.
Run: ``python tools/scale_extrapolation.py [factor]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sfbig"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 8

#: Heaviest relational bench queries (fact-table bound) + the LSH dedup
#: (documents-bound). Grid/multimodal queries scale with chunk count,
#: which the provided generator fixes, so they are out of scope here.
QUERIES = [
    "q01_pricing_summary",
    "q03_regional_revenue",
    "q04_priority_high_qty_orders",
    "q40_priority_line_counts",
    "q45_local_supplier_volume",
    "q51_large_volume_customers",
    "txt_unigram_logprob",
    "dedup_minhash_lsh",
]


def build_dataset() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # key-shifted replication keeps join fan-outs realistic: each copy's
    # orderkeys are disjoint, customers/suppliers/parts are shared (so
    # per-dim cardinality ratios grow like a real SF increase)
    maxo = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    maxd = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    parts = " UNION ALL ".join(
        f"SELECT l_orderkey + {i * maxo} AS l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate "
        f"FROM read_parquet('{SRC}/lineitem.parquet')"
        for i in range(FACTOR)
    )
    con.execute(f"COPY ({parts}) TO '{DST}/lineitem.parquet' (FORMAT parquet)")
    parts = " UNION ALL ".join(
        f"SELECT o_orderkey + {i * maxo} AS o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority "
        f"FROM read_parquet('{SRC}/orders.parquet')"
        for i in range(FACTOR)
    )
    con.execute(f"COPY ({parts}) TO '{DST}/orders.parquet' (FORMAT parquet)")
    parts = " UNION ALL ".join(
        f"SELECT doc_id + {i * maxd} AS doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet')"
        for i in range(FACTOR)
    )
    con.execute(f"COPY ({parts}) TO '{DST}/documents.parquet' (FORMAT parquet)")
    for t in ("region", "nation", "customer", "supplier", "part", "events", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    con.close()


def main() -> None:
    build_dataset()
    from deisa_ray_spark.registry import load_all
    from deisa_ray_spark.session import get_session
    from pyspark.sql import functions as F

    specs = load_all()
    spark = get_session(
        app_name="scale_extrapolation",
        shuffle_partitions=32,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "64MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    spark_t: dict[str, float] = {}
    for name in QUERIES:
        fn = specs[name].fn

        def once() -> float:
            t0 = time.perf_counter()
            fn(spark, DST).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        spark_t[name] = min(once(), once(), once())
        print(f"# spark {name}: {spark_t[name]:.3f}s", file=sys.stderr)
    spark.stop()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{DST}/{t}.parquet')"
        )
    duck_t: dict[str, float] = {}
    for name in QUERIES:
        sql = specs[name].oracle

        def donce() -> float:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            return time.perf_counter() - t0

        duck_t[name] = min(donce(), donce(), donce())
        print(f"# duckdb {name}: {duck_t[name]:.3f}s", file=sys.stderr)

    print(f"| query | spark (s) | duckdb (s) | ratio | ({FACTOR}x sf0.1) |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        r = spark_t[name] / duck_t[name] if duck_t[name] else float("inf")
        print(f"| {name} | {spark_t[name]:.2f} | {duck_t[name]:.2f} | {r:.2f}x | |")
    ts = sum(spark_t.values())
    td = sum(duck_t.values())
    print(f"| TOTAL | {ts:.2f} | {td:.2f} | {ts / td:.2f}x | |")


if __name__ == "__main__":
    main()
