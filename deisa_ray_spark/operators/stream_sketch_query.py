"""Streaming frequency-sketch maintenance as a declared, ORACLE-CHECKED
query: events staged as event_id-ordered shards, each micro-batch
appending a partial Count-Min counter table (streaming/sketchstream),
the serving sketch merged at read time.

The oracle-pinned claims, following the cms_heavy_hitters boolean
convention (exact values hash-match; the sketch's guarantees ride as
TRUE columns):

- ``merge_ok`` — the streamed-and-merged sketch equals the batch-built
  sketch CELL-WISE (the mergeable-sketch law: integer cells + fixed
  hash family + commutative sum ⇒ bit-identical for ANY sharding). This
  is the column that makes the STREAM the thing under test, not a
  re-derivation from batch state.
- ``over_ok`` / ``tight_ok`` — the CMS one-sided estimate bound and the
  collision-mass bound, evaluated against the STREAMED sketch.

No arrival-order caveat at all (the strongest streaming contract class,
same as stream_decontaminate): cell sums commute, so any shard split
gives the same sketch.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deisa_ray_spark.functions.sketches import CMS_W, cms_build, cms_estimate
from deisa_ray_spark.operators.stream_cc_query import stage_ordered_shards
from deisa_ray_spark.registry import query

N_SHARDS = 3

_ORACLE = """
    SELECT user_id, count(*) AS n_exact,
           TRUE AS merge_ok, TRUE AS over_ok, TRUE AS tight_ok
    FROM events
    GROUP BY user_id
    ORDER BY n_exact DESC, user_id
    LIMIT 10
    """


@query("stream_cms_heavy_hitters", oracle=_ORACLE)
def stream_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage event shards, stream them through IncrementalCMS, return
    the exact heavy hitters with the streamed sketch's guarantee booleans
    plus the streamed==batch merge-equivalence bit."""
    from deisa_ray_spark.sources.registry import load_table
    from deisa_ray_spark.streaming.sketchstream import IncrementalCMS

    work = tempfile.mkdtemp(prefix="stream_cms_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
        stage_ordered_shards(ev, f"{work}/src", N_SHARDS, order_col="event_id")
        proc = IncrementalCMS(spark, f"{work}/partials")
        proc.run_available(f"{work}/src", f"{work}/ckpt")
        streamed = proc.merged()

        batch_sketch = cms_build(ev, "user_id")
        # cell-wise equivalence: full outer join, every cell must pair up
        # with equal counts; ≤ d·w rows on both sides
        s = streamed.select("seed", "bucket", F.col("cnt").alias("s_cnt"))
        b = batch_sketch.select("seed", "bucket", F.col("cnt").alias("b_cnt"))
        merge_ok = F.broadcast(
            s.join(b, ["seed", "bucket"], "full_outer").agg(
                F.min(
                    F.coalesce(F.col("s_cnt") == F.col("b_cnt"), F.lit(False))
                ).alias("merge_ok")
            )
        )

        exact = (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_exact"))
            .orderBy(F.desc("n_exact"), F.asc("user_id"))
            .limit(10)
        )
        n_total = F.broadcast(
            streamed.filter(F.col("seed") == 0).agg(
                F.sum("cnt").cast("double").alias("n_total")
            )
        )
        est = cms_estimate(streamed, exact.select("user_id"), "user_id")
        out = (
            exact.join(est, "user_id")
            .crossJoin(merge_ok)
            .crossJoin(n_total)
            .select(
                "user_id",
                "n_exact",
                "merge_ok",
                (F.col("cms_count") >= F.col("n_exact")).alias("over_ok"),
                (
                    (F.col("cms_count") - F.col("n_exact"))
                    <= 2.0 * F.col("n_total") / CMS_W
                ).alias("tight_ok"),
            )
            .orderBy(F.desc("n_exact"), F.asc("user_id"))
        )
        # materialize executor-side before the temp partials dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
