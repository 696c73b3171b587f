#!/usr/bin/env python
"""Dump full `.explain("formatted")` output (tree + node details —
PushedFilters/ReadSchema/join build sides) for the named declared
queries into ``plans/r13/<query>_<suffix>.txt``.

Usage:
    python tools/r13_plans.py before [query ...]
    python tools/r13_plans.py after  [query ...]

With no query names: the whole bench panel minus the eager-construction
queries (the same SKIP set as tools/gen_plans.py — their "plan" is a
sequence of eager jobs, not one static tree). SF dir from
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1); AQE left ON so
the captured `AdaptiveSparkPlan isFinalPlan=false` trees match what the
bench actually submits.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_plans import SKIP  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from deisa_ray_spark.registry import load_all
    from deisa_ray_spark.session import get_session

    specs = load_all()
    if not names:
        names = [n for n in bench.BENCH_QUERIES if n not in SKIP]

    spark = get_session(
        app_name="r13_plans",
        shuffle_partitions=max(8, os.cpu_count() or 8),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "64MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
