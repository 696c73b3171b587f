#!/usr/bin/env python
"""Dev harness: run named declared queries against their DuckDB oracles
at one SF and print per-query verdicts. Usage:

    python tools/check_query.py [--sf /root/testdata/sf0.01] name [name ...]

Exit code 0 iff every named query hash-matches (or is rows-only).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    import duckdb

    from deisa_ray_spark.registry import load_all
    from deisa_ray_spark.session import get_session

    spark = get_session(app_name="check_query", shuffle_partitions=16)
    specs = load_all()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rc = 0
    for name in args:
        spec = specs[name]
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        spd = df.toPandas()
        t1 = time.time()
        if spec.oracle is None:
            print(f"{name}: rows-only ({len(spd)} rows, spark {t1 - t0:.2f}s)")
            continue
        # the DRIVER-FAITHFUL comparator (incl. the dtype-kind check a
        # value hash trips on — e.g. Spark date→object vs DuckDB
        # date→datetime64, the q55 lesson); the looser astype(str)
        # compare in sf1_mirror passes cases the driver would fail
        try:
            from tests.conftest import assert_matches_oracle

            assert_matches_oracle(df, con, spec.oracle)
            print(f"{name}: green ({len(spd)} rows, spark {t1 - t0:.2f}s, "
                  f"oracle {time.time() - t1:.2f}s)")
        except AssertionError as e:
            rc = 1
            print(f"{name}: MISMATCH — {e}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
