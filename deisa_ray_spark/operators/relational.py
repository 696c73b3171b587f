"""Relational surface: scans, filters, aggregates, joins, sorts/top-k,
set ops, SQL window functions, scalar functions, rollup/cube,
sessionization.

The reference has NO relational operators (SURVEY §2.C: joins, grouping
sets, SQL window functions, sorts, set ops are all absent — its nearest
analogues are coordinate-aligned elementwise ops and AND-gating). These
queries pin the capability the Spark engine adds, each with a DuckDB
oracle.

Scale notes (100 TB):
- ``region``/``nation`` are O(10) rows at any SF → always broadcast;
  ``customer``/``supplier``/``part`` grow with SF but remain << lineitem;
  Catalyst + AQE pick broadcast vs sort-merge from stats at runtime.
- All aggregations here are partial-aggregate friendly (sum/count/min/max/
  avg decompose), so map-side combine bounds shuffle volume by group
  cardinality, not row count.
- Top-k per group uses row_number + filter: Spark inserts a per-partition
  WindowGroupLimit (rank pushdown) before the shuffle in recent versions,
  so only k rows per partition per key shuffle.
- Float aggregates are rounded identically on both sides; summation order
  is engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table


#: Exact-decimal aggregate fragments, shared VERBATIM by the oracle SQL
#: and the Spark side (F.expr) of q01/q02/q03: a float sum is
#: partition-order-dependent, and a rounded float sum flips its last
#: digit between runs when a group total lands within an ulp of the
#: rounding boundary (measured on q45 at sf1). Decimal sums are exact →
#: order-independent → identical across engines and cluster sizes; the
#: cast to DOUBLE happens once, on the already-rounded exact value.
_DEC_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
_DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DEC_DISC = "(1 - CAST(l_discount AS DECIMAL(18,2)))"
_REV_SUM = f"CAST(round(sum({_DEC_PRICE} * {_DEC_DISC}), 2) AS DOUBLE)"
_CHARGE_SUM = (
    f"CAST(round(sum(CAST({_DEC_PRICE} * {_DEC_DISC} AS DECIMAL(24,4))"
    f" * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01 — flagship: TPC-H Q1-style pricing summary (scan → filter → agg).
# Pins: parquet scan w/ predicate pushdown + column pruning, partial agg.
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum({_DEC_QTY}), 2) AS DOUBLE)        AS sum_qty,
           CAST(round(sum({_DEC_PRICE}), 2) AS DOUBLE)      AS sum_base_price,
           {_REV_SUM}                                       AS sum_disc_price,
           {_CHARGE_SUM}                                    AS sum_charge,
           round(CAST(sum({_DEC_QTY}) AS DOUBLE) / count(*), 4)   AS avg_qty,
           round(CAST(sum({_DEC_PRICE}) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4)                             AS avg_disc,
           count(*)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship aggregate query (reference analogue: global sum/mean
    reductions, tests/test_analytics.py:36-42, here over a relational
    fact table). Aggregates are exact-decimal fragments shared verbatim
    with the oracle (_REV_SUM et al. — see their comment)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(round(sum({_DEC_QTY}), 2) AS DOUBLE)").alias("sum_qty"),
            F.expr(f"CAST(round(sum({_DEC_PRICE}), 2) AS DOUBLE)").alias("sum_base_price"),
            F.expr(_REV_SUM).alias("sum_disc_price"),
            F.expr(_CHARGE_SUM).alias("sum_charge"),
            F.expr(f"round(CAST(sum({_DEC_QTY}) AS DOUBLE) / count(*), 4)").alias("avg_qty"),
            F.expr(f"round(CAST(sum({_DEC_PRICE}) AS DOUBLE) / count(*), 4)").alias("avg_price"),
            F.expr("round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"
                   " / count(*), 4)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — join + top-k: revenue per customer, top 10.
# Pins: 3-way join (fact→orders→customer), agg, deterministic top-k.
# --------------------------------------------------------------------------
@query(
    "q02_top_customers_by_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_REV_SUM} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def q02_top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.expr(_REV_SUM).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q03 — star join through broadcast dims: revenue per region/nation.
# Pins: broadcast hash join (nation/region are O(10) rows at any SF).
# --------------------------------------------------------------------------
@query(
    "q03_regional_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {_REV_SUM} AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q03_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.expr(_REV_SUM).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q04 — semi join (EXISTS): orders having any high-quantity lineitem.
# --------------------------------------------------------------------------
@query(
    "q04_priority_high_qty_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q04_priority_high_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# q05 — anti join (NOT EXISTS): customers with no big-ticket order, by
# segment. (Threshold chosen so the result is non-empty at every SF — an
# empty anti-join would make the oracle check vacuous.)
# --------------------------------------------------------------------------
@query(
    "q05_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
)
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# q06 — pure filter + scalar agg (TPC-H Q6 style).
# Pins: predicate pushdown of range predicates to the parquet scan.
# --------------------------------------------------------------------------
@query(
    "q06_revenue_forecast",
    oracle=f"""
    SELECT CAST(round(sum({_DEC_PRICE}
                          * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07) & (F.col("l_quantity") < 24)
    ).agg(
        F.expr(
            f"CAST(round(sum({_DEC_PRICE}"
            f" * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)"
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# q07 — SQL window functions: top-3 parts per brand by retail price.
# Pins: row_number over partition (reference has no SQL-window analogue).
# --------------------------------------------------------------------------
@query(
    "q07_top3_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, rn
    FROM (SELECT p_brand, p_partkey, p_name,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3
    """,
)
def q07_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "rn")
    )


# --------------------------------------------------------------------------
# q08 — set operations: INTERSECT / EXCEPT / UNION ALL over nation keys.
# Reference has only concatenate (≈ UNION ALL, B15); INTERSECT/EXCEPT are
# new surface (SURVEY §2.C "Set ops").
# --------------------------------------------------------------------------
@query(
    "q08_set_ops_nations",
    oracle="""
    SELECT 'both' AS tag, n FROM
      (SELECT DISTINCT c_nationkey AS n FROM customer
       INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS tag, n FROM
      (SELECT DISTINCT c_nationkey AS n FROM customer
       EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'supp_only' AS tag, n FROM
      (SELECT DISTINCT s_nationkey AS n FROM supplier
       EXCEPT SELECT DISTINCT c_nationkey FROM customer)
    """,
)
def q08_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n")).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("tag"), "n")
    cust_only = cn.exceptAll(sn).select(F.lit("cust_only").alias("tag"), "n")
    supp_only = sn.exceptAll(cn).select(F.lit("supp_only").alias("tag"), "n")
    return both.unionAll(cust_only).unionAll(supp_only)


# --------------------------------------------------------------------------
# q09 — scalar functions: string / date / JSON (absent in reference,
# SURVEY §2.C "Scalar functions": math only).
# --------------------------------------------------------------------------
@query(
    "q09_scalar_functions",
    oracle="""
    SELECT event_id,
           upper(event_type)                         AS type_upper,
           substr(event_type, 1, 3)                  AS type_prefix,
           length(event_type)                        AS type_len,
           strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
           CAST(extract(year FROM ts) AS BIGINT)     AS yr,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           round(abs(value) + sqrt(abs(value)), 4)   AS math_mix
    FROM events
    WHERE event_id % 7 = 0
    """,
)
def q09_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.length("event_type").alias("type_len"),
        F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM-dd").alias("month"),
        F.year("ts").cast("bigint").alias("yr"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.round(F.abs("value") + F.sqrt(F.abs("value")), 4).alias("math_mix"),
    )


# --------------------------------------------------------------------------
# q10 — grouping sets (ROLLUP): multi-level totals in one pass.
# --------------------------------------------------------------------------
@query(
    "q10_rollup_lineitem",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q10_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# q11 — sessionization over the events stream table (gaps-and-islands).
# Batch twin of streaming session windows; at 100 TB this is one shuffle
# on user_id with window functions inside each partition.
# --------------------------------------------------------------------------
@query(
    "q11_sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q11_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(wcum).cast("bigint"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("bigint")
        .alias("duration_sec"),
    )


# --------------------------------------------------------------------------
# q12 — sort + limit with full ordering (ORDER BY ... LIMIT as TakeOrdered).
# --------------------------------------------------------------------------
@query(
    "q12_latest_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey
    LIMIT 20
    """,
)
def q12_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q13 — AS-OF JOIN: for each click, the latest view at-or-before it by
# the same user. Spark lacks a native as-of join; implemented as the
# union + tagged-sort + carry-forward-last composition (one shuffle on
# user_id, one in-partition sort — the standard scale shape; no range
# explosion, no per-row subquery). Oracle: DuckDB's native ASOF JOIN.
# Tag sorts views (0) before clicks (1) at equal ts => inclusive >=.
# --------------------------------------------------------------------------
@query(
    "q13_asof_join_click_view",
    oracle="""
    SELECT c.event_id,
           epoch_us(c.ts) AS click_ts,
           c.user_id,
           v.event_id AS view_event_id,
           epoch_us(v.ts) AS view_ts,
           v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def q13_asof_join_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id",
        F.unix_micros("ts").alias("ts_s"),
        "user_id",
        "value",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("tag"),
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "tag", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    view_col = lambda c: F.when(F.col("tag") == 0, F.col(c))
    carried = tagged.select(
        "event_id",
        "ts_s",
        "user_id",
        "tag",
        F.last(view_col("event_id"), ignorenulls=True).over(w).alias("view_event_id"),
        F.last(view_col("ts_s"), ignorenulls=True).over(w).alias("view_ts"),
        F.last(view_col("value"), ignorenulls=True).over(w).alias("view_value"),
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        F.col("ts_s").alias("click_ts"),
        "user_id",
        "view_event_id",
        "view_ts",
        "view_value",
    )


# --------------------------------------------------------------------------
# q14 — salted two-stage aggregation: the skew-mitigation pattern for
# hot keys (groupBy (key, salt) partial → groupBy key final). The event
# types here are uniform, but the plan is the one that survives a 1000×
# skewed key: stage 1 spreads each hot key over 16 reducers, stage 2
# combines 16 tiny rows per key. Oracle: the plain single-stage agg —
# salting must be semantically invisible.
# --------------------------------------------------------------------------
@query(
    "q14_salted_agg_events",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q14_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sum in DECIMAL(18,2): event values are 2-decimal by construction,
    # so the quantized sum is EXACT at any scale and any summation
    # order — no round(sum(double)) anywhere near a rounding boundary
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("n_p"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_p"),
        F.max("value").alias("max_p"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_p").alias("n"),
        F.sum("sum_p").cast("double").alias("sum_value"),
        F.round(F.max("max_p"), 6).alias("max_value"),
    )


# --------------------------------------------------------------------------
# q15 — array & map scalar functions (SURVEY §2.C "Scalar functions":
# absent in the reference beyond math): collect per-user event-type
# arrays, sort/dedupe/filter/transform them, build a type→count map and
# read it back. All codegen'd collection expressions.
# --------------------------------------------------------------------------
@query(
    "q15_array_map_functions",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    agg AS (
      SELECT user_id,
             list_sort(list(DISTINCT event_type)) AS types,
             map_from_entries(list(struct_pack(k := event_type, v := n)
                              ORDER BY event_type)) AS counts
      FROM per GROUP BY user_id
    )
    SELECT user_id,
           len(types) AS n_types,
           array_to_string(types, ',') AS types_csv,
           len(list_filter(types, t -> t LIKE '%r%')) AS n_with_r,
           array_to_string(list_transform(types, t -> upper(t)), ',') AS types_upper_csv,
           coalesce(map_extract(counts, 'click')[1], 0) AS n_clicks,
           coalesce(map_extract(counts, 'error')[1], 0) AS n_errors
    FROM agg
    WHERE user_id % 10 = 0
    """,
)
def q15_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    agg = per.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("event_type").alias("k"), F.col("n").alias("v"))))
        ).alias("counts"),
    )
    return agg.filter(F.col("user_id") % 10 == 0).select(
        "user_id",
        F.size("types").alias("n_types"),
        F.array_join("types", ",").alias("types_csv"),
        F.size(F.filter("types", lambda t: t.contains("r"))).alias("n_with_r"),
        F.array_join(F.transform("types", lambda t: F.upper(t)), ",").alias("types_upper_csv"),
        F.coalesce(F.col("counts").getItem("click"), F.lit(0)).cast("bigint").alias("n_clicks"),
        F.coalesce(F.col("counts").getItem("error"), F.lit(0)).cast("bigint").alias("n_errors"),
    )


# --------------------------------------------------------------------------
# q16 — distinct aggregates + exact percentiles (reference has neither,
# SURVEY §2.C "Aggregations"): per event type, distinct-user count and
# exact interpolated median/p90. Spark `percentile` and DuckDB
# `quantile_cont` share the interpolation definition.
# --------------------------------------------------------------------------
@query(
    "q16_distinct_percentiles",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value,
           round(avg(DISTINCT value), 6) AS avg_distinct_value
    FROM events GROUP BY event_type
    """,
)
def q16_distinct_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_value"),
        F.round(F.expr("avg(DISTINCT value)"), 6).alias("avg_distinct_value"),
    )


# --------------------------------------------------------------------------
# q17 — range (interval) join: match each order to lineitems shipped
# within 30 days after the order date. The range predicate rides on an
# equi-key (orderkey), so Catalyst plans a hash join with the interval
# as a post-join filter — the scale-safe shape. (A PURE range join with
# no equi-key would plan BroadcastNestedLoop, O(n·m); the fix there is
# binning both sides to interval-width buckets so candidates share a
# bucket key — not needed when an equi-key exists, as here.)
# --------------------------------------------------------------------------
@query(
    "q17_range_join_ship_window",
    oracle="""
    SELECT o.o_orderkey, count(*) AS n_items_in_window,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS window_revenue
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def q17_range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.date_add(F.col("o_orderdate"), 30))
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_items_in_window"),
        # exact-decimal sum (the q45 boundary-flip discipline): money
        # sums land exactly on .005 boundaries, so a double sum can
        # flip round()'s last digit between runs/engines
        F.expr(
            "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)"
            " AS DOUBLE)"
        ).alias("window_revenue"),
    )


# --------------------------------------------------------------------------
# q18 — pivot (long→wide) with a fixed column set: per-user event-type
# value sums as columns. Fixed pivot values keep the plan a single
# partial-agg pass (no extra distinct-values job) — required at scale.
# Oracle: conditional aggregation (the relational identity of pivot).
# --------------------------------------------------------------------------
@query(
    "q18_pivot_event_values",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 2) AS click,
           round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0), 2) AS view,
           round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase
    FROM events
    WHERE user_id < 30
    GROUP BY user_id
    """,
)
def q18_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])  # fixed values: one pass
        .agg(F.sum("value"))
    )
    return wide.select(
        "user_id",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("click", "view", "purchase")],
    )


# --------------------------------------------------------------------------
# q19 — CUBE: all grouping-set combinations over two dimensions in one
# pass (reference has no grouping sets of any kind, SURVEY §2.C).
# --------------------------------------------------------------------------
@query(
    "q19_cube_orders",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(CAST(extract(year FROM o_orderdate) AS VARCHAR), 'ALL') AS yr,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, extract(year FROM o_orderdate))
    """,
)
def q19_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "yr_num", F.year("o_orderdate")
    )
    return (
        orders.cube("o_orderpriority", "yr_num")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)"
                " AS DOUBLE)"
            ).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("yr_num").cast("string"), F.lit("ALL")).alias("yr"),
            "n_orders",
            "total",
        )
    )


# --------------------------------------------------------------------------
# q20 — SQL window-function suite: lead/lag, dense_rank, ntile,
# cume_dist, running sum — one partition pass for all of them (same
# window spec → single sort+shuffle).
# --------------------------------------------------------------------------
@query(
    "q20_window_suite",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           dense_rank()       OVER w AS drank,
           ntile(4)           OVER w AS quartile,
           round(cume_dist()  OVER w, 6) AS cdist,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (w ROWS UNBOUNDED PRECEDING), 2)
                AS DOUBLE) AS running_total
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q20_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        # exact-decimal running sum (the q45 discipline): the frame
        # order is total, but decimal keeps every prefix exact too
        F.round(
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(
                w.rowsBetween(W.unboundedPreceding, 0)
            ),
            2,
        )
        .cast("double")
        .alias("running_total"),
    )


# --------------------------------------------------------------------------
# q21 — statistical aggregates: correlation, covariance, sample
# variance/stddev between quantity and price per return flag.
# --------------------------------------------------------------------------
@query(
    "q21_stats_aggs",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(var_samp(l_quantity), 6) AS qty_var,
           round(stddev_samp(l_extendedprice), 4) AS price_std
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q21_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
    )


# --------------------------------------------------------------------------
# q26 — ordered conversion funnel over the event stream: users who
# viewed, then clicked AFTER their first view, then purchased AFTER that
# first qualifying click. Each stage aggregates to one row per user
# BEFORE joining (min-ts per user), so the stage joins are on
# deduplicated keys — at 100 TB the join input is |users|, not |events|.
# --------------------------------------------------------------------------
@query(
    "q26_funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_buy
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    """,
)
def q26_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view")
        .unionAll(stage(c, "2_click"))
        .unionAll(stage(p, "3_purchase"))
    )


# --------------------------------------------------------------------------
# q27 — approximate aggregates: HyperLogLog++ distinct counts and
# approximate percentiles. THE scale substitutes for exact
# distinct/percentile (fixed-size sketch state, map-side combinable, no
# giant shuffle of distinct keys). Raw sketch outputs are
# implementation-defined, so the cross-engine oracle checks the
# ACCURACY CONTRACT instead (the q42 convention): exact per-group
# counts hash-match, and the sketch claims are emitted as booleans —
# HLL estimate within 5% of the exact distinct, and each
# percentile_approx value sitting at the right empirical CDF rank
# (±0.03 rank bracket — percentile_approx returns real data values, so
# rank, not relative error, is the correct yardstick). The oracle
# asserts the booleans are all TRUE.
# --------------------------------------------------------------------------
@query(
    "q27_approx_aggs",
    oracle="""
    SELECT event_type, count(*) AS n,
           TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM events
    GROUP BY event_type
    """,
)
def q27_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    approx = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("_pcts"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "approx_users",
            "n",
            F.element_at("_pcts", 1).alias("p50"),
            F.element_at("_pcts", 2).alias("p95"),
            F.element_at("_pcts", 3).alias("p99"),
        )
    )
    # Join the (group-cardinality-sized) sketch results back to the fact
    # once to measure the exact distinct and the empirical CDF at each
    # returned value — one broadcast join + one keyed aggregate.
    checked = (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type", "approx_users", "n", "p50", "p95", "p99")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.avg((F.col("value") <= F.col("p50")).cast("double")).alias("cdf50"),
            F.avg((F.col("value") <= F.col("p95")).cast("double")).alias("cdf95"),
            F.avg((F.col("value") <= F.col("p99")).cast("double")).alias("cdf99"),
        )
    )
    return checked.select(
        "event_type",
        F.col("n"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("users_ok"),
        (F.abs(F.col("cdf50") - 0.5) <= 0.03).alias("p50_ok"),
        (F.abs(F.col("cdf95") - 0.95) <= 0.03).alias("p95_ok"),
        (F.abs(F.col("cdf99") - 0.99) <= 0.03).alias("p99_ok"),
    )


# --------------------------------------------------------------------------
# q28 — unpivot (melt): wide metric columns → long (metric, value) rows,
# the inverse of q18's pivot. Spark's unpivot is a zero-shuffle Expand
# (each input row fans to k rows in place); the aggregate after it is
# the only exchange.
# --------------------------------------------------------------------------
@query(
    "q28_unpivot_lineitem",
    oracle="""
    SELECT l_returnflag, metric,
           CAST(round(sum(CAST(val AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
           count(*) AS n
    FROM (
      SELECT l_returnflag, 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    GROUP BY l_returnflag, metric
    """,
)
def q28_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_extendedprice", "price")
        .otherwise("discount"),
    )
    return long.groupBy("l_returnflag", "metric").agg(
        # all three unpivoted metrics are 2-decimal money columns, so
        # the exact-decimal sum discipline applies to the shared slot
        F.expr("CAST(round(sum(CAST(val AS DECIMAL(18,2))), 2) AS DOUBLE)")
        .alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# q29 — RANGE window frame (value-based, not row-count-based): for each
# order, revenue of the customer's orders within ±500 of its price, and
# a time-based range frame: count of the customer's orders in the
# preceding 90 days. Complements q20's ROWS frames.
# --------------------------------------------------------------------------
@query(
    "q29_range_frames",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
               AS n_similar_price,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
               AS n_last_90d
    FROM orders WHERE o_custkey < 50
    """,
)
def q29_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    orders.createOrReplaceTempView("orders_r")
    return orders.sparkSession.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
                   AS n_similar_price,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                              RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
                   AS n_last_90d
        FROM orders_r
        """
    )


# --------------------------------------------------------------------------
# q32 — FULL OUTER join: daily order activity vs daily event activity.
# The two date ranges are disjoint in the fixture (orders 1995-2001,
# events 2024), so both unmatched sides must survive with zero-filled
# counts — the full-outer semantics the declared set did not yet pin
# (inner/left/semi/anti/asof/range are q02-q05/q13/q17). Both inputs
# aggregate BEFORE the join, so the shuffle is per-day counts, not raw
# rows.
# --------------------------------------------------------------------------
@query(
    "q32_full_outer_daily_activity",
    oracle="""
    SELECT d, coalesce(n_orders, 0) AS n_orders, coalesce(n_events, 0) AS n_events
    FROM (SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n_orders
          FROM orders GROUP BY 1) o
    FULL JOIN (SELECT date_trunc('day', ts) AS d, count(*) AS n_events
               FROM events GROUP BY 1) e USING (d)
    """,
)
def q32_full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    od = orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    ed = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return od.join(ed, ["d"], "full").select(
        "d",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# q33 — time-series densification + LOCF: build the dense hourly spine
# (sequence + explode — generated, not scanned), left-join the sparse
# hourly aggregates, and carry the last observed hourly average forward
# with last(..., ignoreNulls=True) over an unbounded-preceding frame —
# the gap-filling idiom for sensor/metric series. The spine is generated
# from two scalars (min/max hour), so at 100 TB the only heavy op is the
# initial per-hour partial aggregation; the window runs over
# #hours × #types rows, not raw events.
#
# The ev/hourly/spine/grid scaffolding (and its oracle CTE prefix) is
# SHARED with q43's interpolation — one definition, so a spine or
# tie-rounding fix cannot be applied to one gap-fill and missed in the
# other (the exact-arithmetic trick below was exactly such a fix).
# --------------------------------------------------------------------------
_HOURLY_SPINE_CTE = """
    WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
    hourly AS (SELECT event_type, h, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                 AS avg_v
               FROM ev GROUP BY 1, 2),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
    grid AS (SELECT t.event_type, s.h
             FROM (SELECT DISTINCT event_type FROM ev) t, spine s),
    fg AS (SELECT g.event_type, g.h, hourly.n, hourly.avg_v
           FROM grid g LEFT JOIN hourly USING (event_type, h))
"""


def _hourly_spine_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (event_type, hour) grid left-joined with sparse hourly
    aggregates — Spark twin of ``_HOURLY_SPINE_CTE``.

    Exact cross-engine arithmetic instead of rounding at the end:
    values are exact 2-decimal, so summing in DECIMAL(18,2) is EXACT at
    any scale and any summation order; the cast to double is the same
    nearest-representable in both engines and the division by the same
    bigint is the identical IEEE op — the avg is bit-equal with no
    tie-rounding anywhere. (avg(value) + a final round hits half-point
    ties — averages over n∈{8,16,160,...} 2-decimal values land EXACTLY
    on round boundaries, where Spark's shortest-decimal HALF_UP and
    DuckDB's binary expansion disagree; observed at sf0.1. The earlier
    round(sum(double), 2) form was only exact while accumulated float
    error stayed under 0.005 — true at toy SF, not a 100 TB contract.)"""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    # ONE events scan (guide §2.4): spine bounds, the distinct-type list
    # and the join's probe side all read the per-run staged ``hourly``
    # frame (tiny: types × hours) — referencing the un-materialized
    # subtree three times made Catalyst re-execute the scan+agg per
    # reference (events ×3 in the before-plan). The bounds/type sets
    # over hourly equal those over ev because date_trunc('hour') and
    # event_type are the group keys. Staged per invocation — rebuilt
    # from parquet every run; the previous run's blocks are freed.
    from deisa_ray_spark.functions.dedup import run_staged

    hourly = run_staged(
        "hourly_spine_grid",
        ev.groupBy("event_type", "h").agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_v"),
        ),
    )
    spine = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1")).select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    grid = hourly.select("event_type").distinct().crossJoin(F.broadcast(spine))
    return grid.join(hourly, ["event_type", "h"], "left")


@query(
    "q33_gap_fill_locf",
    oracle=_HOURLY_SPINE_CTE
    + """
    SELECT event_type, h, coalesce(n, 0) AS n,
           coalesce(last_value(avg_v IGNORE NULLS) OVER (
                     PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS locf_avg
    FROM fg
    """,
)
def q33_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    fg = _hourly_spine_grid(spark, sf_dir)
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return fg.select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce(F.last("avg_v", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "locf_avg"
        ),
    )


# --------------------------------------------------------------------------
# q35 — semi-structured round trip through VARIANT (Spark 4): rows are
# serialized to JSON (the shape raw event feeds arrive in), parsed with
# parse_json into the binary VARIANT encoding, fields re-extracted with
# typed try_variant_get, then aggregated. Pins the engine's
# semi-structured path end-to-end: ingestion of schemaless payloads
# without a pre-declared struct schema, with typed extraction pushed to
# the JVM (no Python, no regex). Oracle extracts the same fields with
# DuckDB's JSON functions — doubles round-trip exactly through
# shortest-repr JSON in both engines.
# --------------------------------------------------------------------------
@query(
    "q35_variant_json_roundtrip",
    oracle="""
    WITH payload AS (
      SELECT to_json(struct_pack(event_type := event_type, value := value)) AS p
      FROM events
    )
    SELECT json_extract_string(p, '$.event_type') AS event_type,
           count(*) AS n,
           CAST(sum(CAST(CAST(json_extract(p, '$.value') AS DOUBLE)
                         AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM payload GROUP BY 1
    """,
)
def q35_variant_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    payload = ev.select(
        F.to_json(F.struct("event_type", "value")).alias("p")
    )
    var = payload.select(F.parse_json("p").alias("var"))
    return (
        var.select(
            F.try_variant_get("var", "$.event_type", "string").alias("event_type"),
            F.try_variant_get("var", "$.value", "double").alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# q42 — mergeable HLL sketch rollup (DataSketches): per-group sketches
# union-merge into a global estimate WITHOUT rescanning the fact — the
# pre-aggregated-sketch-table pattern that makes distinct-count
# dashboards O(groups) instead of O(rows) at 100 TB (sketches compose
# across partitions, days, and rollup levels; exact distincts do not).
# The declared output pins BOTH the exact distincts (hash-matched
# against DuckDB) and the sketch-accuracy contract (|est/exact − 1| <
# 5%, emitted as a boolean the oracle asserts true) — so the driver's
# gate verifies the estimates without requiring cross-engine sketch
# equality (Spark's DataSketches HLL and DuckDB's HLL differ).
# --------------------------------------------------------------------------
@query(
    "q42_hll_mergeable_rollup",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
           true AS within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__', count(DISTINCT user_id), true FROM events
    """,
)
def q42_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    ok = (
        F.abs(
            F.hll_sketch_estimate("sk") / F.col("exact_distinct") - F.lit(1.0)
        )
        < 0.05
    )
    per_out = per.select("event_type", "exact_distinct", ok.alias("within_5pct"))
    # the rollup: union-merge the per-group sketches — no fact rescan
    glob = (
        per.agg(
            F.hll_union_agg("sk").alias("sk"),
        )
        .crossJoin(ev.agg(F.countDistinct("user_id").alias("exact_distinct")))
        .select(
            F.lit("__all__").alias("event_type"),
            "exact_distinct",
            (
                F.abs(
                    F.hll_sketch_estimate("sk") / F.col("exact_distinct")
                    - F.lit(1.0)
                )
                < 0.05
            ).alias("within_5pct"),
        )
    )
    return per_out.unionAll(glob)


# --------------------------------------------------------------------------
# q43 — time-series linear interpolation (the LOCF complement, q33):
# missing spine cells blend the surrounding observations weighted by
# time distance. The carried value must bring its own timestamp, so the
# forward/backward fills carry a STRUCT (obs time, obs value) through
# last/first(..., ignoreNulls) windows — nullable-struct carry is the
# idiom that generalizes LOCF to any "nearest observation" logic.
# Scale shape identical to q33: heavy lifting is one per-hour partial
# aggregation; windows run over #hours × #types rows, not raw events.
# --------------------------------------------------------------------------
@query(
    "q43_gap_fill_interp",
    oracle=_HOURLY_SPINE_CTE.rstrip()
    + """,
    fg2 AS (SELECT *, CASE WHEN avg_v IS NOT NULL
                           THEN {'oh': h, 'ov': avg_v} END AS obs FROM fg),
    w AS (SELECT event_type, h, n,
            last_value(obs IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
            first_value(obs IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
          FROM fg2)
    SELECT event_type, h, coalesce(n, 0) AS n,
      cast(floor((CASE WHEN prev IS NULL THEN nxt.ov
                 WHEN nxt IS NULL THEN prev.ov
                 WHEN prev.oh = nxt.oh THEN prev.ov
                 ELSE prev.ov + (nxt.ov - prev.ov)
                      * ((epoch(h) - epoch(prev.oh))
                         / (epoch(nxt.oh) - epoch(prev.oh)))
            END) * 1e4 + 0.5) AS BIGINT) AS interp_avg_e4
    FROM w
    """,
)
def q43_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    fg = _hourly_spine_grid(spark, sf_dir).withColumn(
        "obs",
        F.when(
            F.col("avg_v").isNotNull(),
            F.struct(F.col("h").alias("oh"), F.col("avg_v").alias("ov")),
        ),
    )
    wb = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prev = F.last("obs", ignorenulls=True).over(wb)
    nxt = F.first("obs", ignorenulls=True).over(wf)
    frac = (
        (F.unix_timestamp(F.col("h")) - F.unix_timestamp(prev["oh"]))
        / (F.unix_timestamp(nxt["oh"]) - F.unix_timestamp(prev["oh"]))
    )
    interp = (
        F.when(prev.isNull(), nxt["ov"])
        .when(nxt.isNull(), prev["ov"])
        .when(prev["oh"] == nxt["oh"], prev["ov"])
        .otherwise(prev["ov"] + (nxt["ov"] - prev["ov"]) * frac)
    )
    return fg.select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).alias("n"),
        # identical input doubles on both engines -> floor is exact even
        # at .5 boundaries (round() implementations differ there)
        F.floor(interp * 1e4 + F.lit(0.5)).cast("bigint").alias("interp_avg_e4"),
    )


# --------------------------------------------------------------------------
# q53 — retention cohorts: users grouped by first-seen week, activity
# counted at weekly offsets — the standard product-analytics retention
# matrix, and a distinct dataflow shape: distinct-projection →
# per-user min → join-back → two-key distinct aggregate. The week
# offset uses datediff-in-days div 7 (date-based, so daylight-saving
# shifts can never produce a fractional week, unlike epoch-second
# arithmetic). Scale: the user×week distinct is the only fact-sized
# exchange; everything after runs on ≤ |users| rows.
# --------------------------------------------------------------------------
@query(
    "q53_retention_cohorts",
    oracle="""
    WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                FROM events),
         fc AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
    SELECT cohort,
           CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT uw.user_id) AS n_users
    FROM uw JOIN fc ON uw.user_id = fc.user_id
    GROUP BY cohort, week_offset
    """,
)
def q53_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    fc = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        uw.join(fc, "user_id")
        .groupBy(
            "cohort",
            F.expr("CAST(datediff(wk, cohort) div 7 AS BIGINT)").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# q54 — blocked fuzzy record linkage: pairs of DISTINCT part names within
# edit distance 2, blocked on the name's SECOND word (the noun of the
# two-word "adjective noun" fixture names — split_part(..., 2) in the
# oracle, element_at(split(...), 2) here; keep the two in lockstep). The data-cleaning /
# entity-resolution primitive (match near-identical catalog entries,
# vendor names, user aliases) the reference has no analogue of.
# Dataflow shape: extract the distinct-name DICTIONARY with row counts
# (the only corpus-sized exchange — one groupBy), then run the pairwise
# Levenshtein stage over the dictionary only, equi-blocked so each
# block is tiny. At 100 TB the dictionary of a categorical-ish column
# is orders of magnitude smaller than the table — the quadratic stage
# never sees row-level data, and the blocks bound it further (the same
# blocking discipline as LSH bands in dedup_minhash_lsh). Levenshtein
# is unit-cost in both engines, so distances are exact integers.
# --------------------------------------------------------------------------
FUZZY_MAX_DIST = 2


@query(
    "q54_fuzzy_name_linkage",
    oracle=f"""
    WITH dict AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS blk,
             count(*) AS n_rows
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
           a.n_rows AS rows_a, b.n_rows AS rows_b
    FROM dict a JOIN dict b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
)
def q54_fuzzy_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    dict_df = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rows"))
    # coalesce to '' — for a single-word name DuckDB's split_part gives
    # '' while element_at past the end gives NULL, which would silently
    # drop the row from the equi-blocked join on one side only
    dict_df = dict_df.withColumn(
        "blk", F.coalesce(F.element_at(F.split("p_name", " "), 2), F.lit(""))
    )
    a = dict_df.select(
        F.col("p_name").alias("name_a"), F.col("blk"), F.col("n_rows").alias("rows_a")
    )
    b = dict_df.select(
        F.col("p_name").alias("name_b"), F.col("blk"), F.col("n_rows").alias("rows_b")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "edit_dist", "rows_a", "rows_b")
    )


# --------------------------------------------------------------------------
# q55 — robust anomaly detection on the event stream: days whose
# per-type event count exceeds median + K·MAD (median absolute
# deviation — the outlier rule that, unlike mean+K·sigma, is not itself
# dragged by the outliers it hunts). The pipeline-monitoring primitive:
# "which days did event volume spike?". Daily counts are integers, so
# the exact continuous medians land on .0/.5 values both engines
# represent exactly — no rounding needed anywhere.
#
# Scale shape: one events scan into a (type, day) partial agg (the
# daily frame is tiny — types × days); two percentile aggs and the
# final filter run on that frame, never on raw events.
# --------------------------------------------------------------------------
ANOMALY_K = 2  #: MAD multiplier


@query(
    "q55_event_anomaly_mad",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY event_type, day
    ),
    med AS (
      SELECT event_type, quantile_cont(n_events, 0.5) AS med
      FROM daily GROUP BY event_type
    ),
    mad AS (
      SELECT d.event_type, any_value(m.med) AS med,
             quantile_cont(abs(d.n_events - m.med), 0.5) AS mad
      FROM daily d JOIN med m USING (event_type)
      GROUP BY d.event_type
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n_events AS BIGINT) AS n_events,
           mad.med, mad.mad
    FROM daily d JOIN mad USING (event_type)
    WHERE d.n_events > mad.med + {ANOMALY_K} * mad.mad
    """,
)
def q55_event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE events scan (guide §2.4): the former med/mad CTE joins made
    # Catalyst re-execute the daily scan+agg subtree three times (3
    # events scans + 2 broadcast builds in the before-plan). `daily` is
    # tiny (types × days), so the per-type medians compute as WINDOW
    # aggregates over the same partitioning instead — the two percentile
    # windows share one hash-partitioning of the tiny frame, and the raw
    # events table is scanned exactly once. Values are identical: a
    # whole-partition window aggregate IS the groupBy aggregate of that
    # key (oracle-verified at sf0.001/0.01/0.1).
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wt = W.partitionBy("event_type")
    scored = daily.withColumn(
        "med", F.percentile("n_events", F.lit(0.5)).over(wt)
    ).withColumn(
        "mad",
        F.percentile(F.abs(F.col("n_events") - F.col("med")), F.lit(0.5)).over(wt),
    )
    return (
        scored
        .filter(F.col("n_events") > F.col("med") + ANOMALY_K * F.col("mad"))
        .select(
            "event_type",
            # string ISO day: a DATE column reaches pandas as object on
            # the Spark side but datetime64 from DuckDB — the driver
            # hash (and the mirror's dtype-kind check) would diverge on
            # equal values (the month-column convention from q06)
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_events").cast("bigint").alias("n_events"),
            "med",
            "mad",
        )
    )


# --------------------------------------------------------------------------
# q56 — event-transition matrix: per-user journeys ordered by time,
# counted as (event_type → next event_type) bigrams with row shares in
# integer millionths — the first-order Markov table behind funnel
# modeling, session simulation, and sequence-training data prep (q26's
# funnel checks ONE ordered pattern; this measures ALL pairwise
# transitions at once).
#
# Determinism: events carry unique event_id, so the lag order
# (ts, event_id) is a total order both engines agree on. Scale shape:
# one events scan, one user-keyed window (the sessionize/funnel
# exchange), then a (from, to) partial agg — the matrix is
# |event_types|² rows; shares via a window over that tiny frame.
# --------------------------------------------------------------------------
@query(
    "q56_event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) * 1000000
                // sum(count(*)) OVER (PARTITION BY from_type) AS BIGINT)
             AS share_x1e6
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def q56_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    conf = (
        seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("row_total", F.sum("n").over(W.partitionBy("from_type")))
    )
    return conf.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("n * 1000000 DIV row_total").cast("bigint").alias("share_x1e6"),
    )
