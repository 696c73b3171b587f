#!/usr/bin/env python
"""Profile one or more declared queries under the bench session: runs
each query with the bench's noop-sink protocol and prints the Spark
jobs it submitted (description, duration) from the local UI REST API.

Usage: python tools/profile_query.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROFILE_RUNS (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(ui: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "1"))

    from deisa_ray_spark.registry import load_all
    from deisa_ray_spark.session import get_session

    if os.environ.get("SPARK_GRAFT_BENCH_SPLIT", "1") != "0":
        from deisa_ray_spark.maintenance import stage_split_tables

        sf_dir = stage_split_tables(sf_dir, min_files=8)

    specs = load_all()
    spark = get_session(
        app_name="deisa_ray_spark_profile",
        shuffle_partitions=max(8, cpus),
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
            "spark.ui.enabled": "true",
        },
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    for name in names:
        fn = specs[name].fn
        for i in range(runs):
            before = {j["jobId"] for j in _jobs(ui, app_id)}
            sc.setJobDescription(f"PROFILE:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            time.sleep(0.3)
            jobs = [j for j in _jobs(ui, app_id) if j["jobId"] not in before]
            jobs.sort(key=lambda j: j["jobId"])
            print(f"\n=== {name} run {i}: {dt:.3f}s, {len(jobs)} jobs ===")
            for j in jobs:
                sub = j.get("submissionTime", "")
                comp = j.get("completionTime", "")
                dur = ""
                try:
                    from datetime import datetime

                    f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    dur = (
                        datetime.strptime(comp, f) - datetime.strptime(sub, f)
                    ).total_seconds()
                    dur = f"{dur:7.3f}s"
                except Exception:
                    dur = "?"
                desc = (j.get("description") or j.get("name", ""))[:100]
                print(f"  job {j['jobId']:4d} {dur}  stages={len(j.get('stageIds', []))}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
