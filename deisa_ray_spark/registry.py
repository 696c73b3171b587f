"""Declared-query registry.

Every operator from SURVEY.md §2 that we claim as done registers here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__.py`` simply
re-exports this registry to the driver's correctness harness.

Column-name discipline: the driver's compare sorts columns by name before
hashing, so every computed column is aliased identically in the Spark plan
and the oracle SQL. Float aggregates are rounded on BOTH sides (summation
order differs between engines; see ``round_`` helpers) — integer-valued
results are left exact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` marks a non-SQL-expressible
    op (tensor kernels, stateful streaming) → weaker rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Ship this package to Python workers: harness sessions may run
            # from a cwd where deisa_ray_spark is not importable worker-side.
            from deisa_ray_spark.shipping import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(name, wrapped, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query-defining module (side effect: registration)."""
    import deisa_ray_spark.operators.relational  # noqa: F401
    import deisa_ray_spark.operators.sql_api  # noqa: F401
    import deisa_ray_spark.operators.grid_ops  # noqa: F401
    import deisa_ray_spark.operators.linalg  # noqa: F401
    import deisa_ray_spark.operators.feedback_queries  # noqa: F401
    import deisa_ray_spark.operators.insitu_query  # noqa: F401
    import deisa_ray_spark.operators.stream_cc_query  # noqa: F401
    import deisa_ray_spark.operators.stream_curation_query  # noqa: F401
    import deisa_ray_spark.operators.stream_window_query  # noqa: F401
    import deisa_ray_spark.operators.stream_session_query  # noqa: F401
    import deisa_ray_spark.operators.stream_join_query  # noqa: F401
    import deisa_ray_spark.operators.stream_decon_query  # noqa: F401
    import deisa_ray_spark.operators.stream_servegraph_query  # noqa: F401
    import deisa_ray_spark.operators.stream_sketch_query  # noqa: F401
    import deisa_ray_spark.operators.stream_vocab_query  # noqa: F401
    import deisa_ray_spark.functions.text  # noqa: F401
    import deisa_ray_spark.functions.bpe  # noqa: F401
    import deisa_ray_spark.functions.wordpiece  # noqa: F401
    import deisa_ray_spark.functions.unigram  # noqa: F401
    import deisa_ray_spark.functions.quality_model  # noqa: F401
    import deisa_ray_spark.functions.dedup  # noqa: F401
    import deisa_ray_spark.functions.pipeline  # noqa: F401
    import deisa_ray_spark.functions.report  # noqa: F401
    import deisa_ray_spark.functions.sampling  # noqa: F401
    import deisa_ray_spark.functions.similarity  # noqa: F401
    import deisa_ray_spark.functions.multimodal  # noqa: F401
    import deisa_ray_spark.functions.udfs  # noqa: F401
    import deisa_ray_spark.mv  # noqa: F401
    import deisa_ray_spark.functions.sketches  # noqa: F401

    return QUERIES
