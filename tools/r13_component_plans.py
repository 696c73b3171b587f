#!/usr/bin/env python
"""Dump formatted plans of the serving-graph BUILD components (not
declared queries — they run eagerly inside the tier constructions, so
the bench queries' static plans cannot show them): the bounded-block
kNN edge stage and the NN-descent merge stage.

Usage: python tools/r13_component_plans.py <suffix>
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from deisa_ray_spark.functions import similarity as sim
    from deisa_ray_spark.functions.dedup import norm_agg
    from deisa_ray_spark.session import get_session

    spark = get_session(app_name="r13_component_plans",
                        shuffle_partitions=max(8, os.cpu_count() or 8))
    spark.sparkContext.setLogLevel("ERROR")
    emb = sim._emb(spark, sf_dir)
    comps = {
        "component_knn_edges": sim.knn_graph_from_assigned(sim.knn_assigned(emb)),
        "component_merged_directed": sim.merged_directed_from(
            sim.serve_edges_from(emb),
            emb.select("vec_id", "e", norm_agg(F.col("e")).alias("nrm")),
        ),
    }
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, df in comps.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name)
    spark.stop()


main()
