"""Bench smoke-gate: every query in bench.py's BENCH_QUERIES must at
least pass Catalyst analysis at sf0.001. Round 2's lesson: one query
throwing an AnalysisException (q11's TIMESTAMP_NTZ cast) aborted the
whole bench run and the round produced zero timing data. This test makes
that failure mode show up in `pytest tests/` before it ever reaches the
driver's bench harness.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES
from deisa_ray_spark.registry import load_all

from .conftest import SF_DIR


def test_bench_queries_all_registered():
    specs = load_all()
    missing = [q for q in BENCH_QUERIES if q not in specs]
    assert not missing, f"bench names not in registry: {missing}"


@pytest.mark.parametrize("name", BENCH_QUERIES)
def test_bench_query_plan_analyzes(spark, name):
    specs = load_all()
    df = specs[name].fn(spark, SF_DIR)
    # Forcing the analyzed + optimized plan catches AnalysisExceptions
    # (unresolvable casts, missing columns) without paying execution.
    df._jdf.queryExecution().optimizedPlan()
