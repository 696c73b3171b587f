"""SQL-entry surface: the same engine driven through ``spark.sql`` over
registered temp views, rather than the DataFrame builder API.

The reference exposes NO SQL interface (its query surface is Python
callbacks over Dask arrays — SURVEY §2.C "UDF surface"); this module pins
the ANSI-SQL front door the Spark engine adds, and specifically the
Catalyst rewrites that make declarative SQL scale:

- GROUPING SETS → a single ``Expand`` + partial/final hash aggregate
  (one scan, no N-pass union of sub-aggregations).
- ``EXISTS`` / ``NOT EXISTS`` correlated subqueries → decorrelated to
  left-semi / left-anti hash joins (broadcast when the build side is
  small; sort-merge at scale via AQE).
- Correlated scalar subqueries → decorrelated to an aggregate + equi-join
  (TPC-H Q17 shape: the per-key average is computed ONCE, map-side
  partial-aggregated, then joined — not re-run per outer row).
- ``LATERAL VIEW posexplode`` → a ``Generate`` node pipelined inside
  whole-stage codegen (the UDTF surface without leaving the JVM).

Scale notes (100 TB): every query here aggregates before any ordering, so
shuffled bytes are bounded by group cardinality; top-k uses ORDER BY +
LIMIT which Spark executes as per-partition TakeOrdered (no global sort
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deisa_ray_spark.registry import query
from deisa_ray_spark.sources.registry import load_table


def _sql(spark: SparkSession, sf_dir: str, stmt: str, *tables: str) -> DataFrame:
    """Register ``tables`` as temp views (idempotent) and run ``stmt``."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(stmt)


# --------------------------------------------------------------------------
# q22 — GROUPING SETS with grouping() markers. Distinct from q10 (rollup)
# and q19 (cube): an arbitrary, non-hierarchical set list, plus the
# grouping() disambiguator for NULL-vs-subtotal. One Expand, one shuffle.
# --------------------------------------------------------------------------
_Q22 = """
    SELECT o_orderpriority, o_orderstatus,
           cast(grouping(o_orderpriority) AS INT) AS g_pri,
           cast(grouping(o_orderstatus)  AS INT) AS g_st,
           count(*)                               AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE)                        AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
"""


@query("q22_grouping_sets", oracle=_Q22)
def q22_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q22, "orders")


# --------------------------------------------------------------------------
# q23 — EXISTS / NOT EXISTS decorrelation: customers with vs without any
# order, per nation. Catalyst rewrites both branches to semi/anti hash
# joins on o_custkey; orders is aggregated map-side to distinct custkeys
# before the join at scale (AQE picks broadcast when that side is small).
# --------------------------------------------------------------------------
_Q23 = """
    SELECT 'with_orders' AS grp, c_nationkey, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    UNION ALL
    SELECT 'no_orders' AS grp, c_nationkey, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
"""


@query("q23_exists_anti_semi", oracle=_Q23)
def q23_exists_anti_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q23, "customer", "orders")


# --------------------------------------------------------------------------
# q24 — correlated scalar subquery (TPC-H Q17 shape): small-quantity
# orders for one brand, threshold = 0.2 × per-part average quantity.
# Decorrelates to groupBy(l_partkey).avg + join; l_quantity is integral
# in the fixture so the average is bit-exact across engines.
# --------------------------------------------------------------------------
_Q24 = """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
"""


@query("q24_scalar_subquery", oracle=_Q24)
def q24_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q24, "lineitem", "part")


# --------------------------------------------------------------------------
# q25 — UDTF surface: LATERAL VIEW posexplode of the token array; corpus
# top-20 tokens by term frequency with document frequency and earliest
# position. The Generate node stays inside whole-stage codegen — no
# Python worker. ORDER BY tf DESC, tok is a total order (tok is the
# group key), so the LIMIT frontier is deterministic.
# --------------------------------------------------------------------------
_Q25_SPARK = """
    SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df,
           cast(min(pos) AS BIGINT) AS min_pos
    FROM documents
    LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
    WHERE tok != ''
    GROUP BY tok
    ORDER BY tf DESC, tok
    LIMIT 20
"""

_Q25_ORACLE = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                 unnest(toks) AS tok
          FROM d)
    SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df,
           min(pos) AS min_pos
    FROM e
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY tf DESC, tok
    LIMIT 20
"""


@query("q25_lateral_posexplode", oracle=_Q25_ORACLE)
def q25_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q25_SPARK, "documents")


# --------------------------------------------------------------------------
# q30 — TPC-H Q2 shape: minimum-cost supplier per part within a region,
# expressed as a correlated scalar MIN subquery that itself joins four
# tables. Catalyst decorrelates it to ONE aggregate over the
# region-filtered (part × supplier) link relation joined back on
# (l_partkey, min_price) — the inner join tree is planned once, not
# re-run per outer row, and the dimension joins (supplier, nation,
# region) broadcast. The engine has no partsupp table; lineitem is the
# part↔supplier link (reference has no relational layer at all —
# SURVEY §2.C "Joins: absent").
# --------------------------------------------------------------------------
_Q30 = """
    SELECT DISTINCT p_partkey, p_brand, s_name, n_name,
           l_extendedprice AS best_price
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'AMERICA'
      AND p_size < 10
      AND l_extendedprice = (
            SELECT min(l2.l_extendedprice)
            FROM lineitem l2, supplier s2, nation n2, region r2
            WHERE l2.l_partkey = p_partkey
              AND s2.s_suppkey = l2.l_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'AMERICA')
    ORDER BY p_partkey, s_name
    LIMIT 100
"""


@query("q30_min_cost_supplier", oracle=_Q30)
def q30_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir, _Q30, "part", "supplier", "lineitem", "nation", "region"
    )


# --------------------------------------------------------------------------
# q31 — TPC-H Q11 shape: groups exceeding a global-aggregate threshold,
# i.e. a scalar subquery that is itself an aggregate OVER an aggregate
# (avg of per-part totals), consumed in HAVING. Catalyst plans the
# threshold as an independent subquery (computed once, broadcast as a
# literal) — the main aggregate is one scan + one partial/final agg;
# nothing is recomputed per group. Threshold 1.2 × avg(per-part value)
# is scale-free (selects ~16% of parts at every SF, verified min
# relative gap to the cutoff ≥ 1.9e-5 ≫ cross-engine double noise).
# --------------------------------------------------------------------------
_Q31 = """
    SELECT l_partkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * (1 - l_discount)) >
           (SELECT avg(v) * 1.2
            FROM (SELECT sum(l_extendedprice * (1 - l_discount)) AS v
                  FROM lineitem GROUP BY l_partkey))
"""


@query("q31_value_concentration", oracle=_Q31)
def q31_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q31, "lineitem")


# --------------------------------------------------------------------------
# q34 — TPC-H Q21 shape: the hardest decorrelation in the TPC-H family —
# EXISTS and NOT EXISTS over the SAME fact table with inequality
# correlation (another supplier in the order / no other supplier with a
# returned item). Catalyst turns both into left-semi/left-anti joins on
# l_orderkey with the <> predicate as a join-side filter, so the fact
# table is scanned a bounded number of times and never nested-looped.
# (The fixture lacks commit/receipt dates; l_returnflag = 'R' stands in
# for the reference Q21's "late delivery" mark.)
# --------------------------------------------------------------------------
_Q34 = """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
"""


@query("q34_sole_blame_supplier", oracle=_Q34)
def q34_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q34, "supplier", "lineitem", "orders")


# --------------------------------------------------------------------------
# q36 — TPC-H Q7 shape (volume shipping): a five-way join with TWO roles
# of the same dimension (nation as supplier-nation and customer-nation)
# and a symmetric nation-pair disjunction. Catalyst broadcasts both
# nation sides (tiny dims), the pair predicate prunes before the fact
# shuffle, and the year bucketing groups after partial aggregation — at
# 100 TB the only big exchange is the orders⋈lineitem equi-join, which
# AQE plans sort-merge on o_orderkey. (Reference has no joins at all —
# SURVEY §2.C; this pins the multi-role dimension surface.)
# --------------------------------------------------------------------------
_Q36 = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               cast(extract(year FROM l_shipdate) AS INT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query("q36_volume_shipping", oracle=_Q36)
def q36_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir, _Q36, "lineitem", "orders", "supplier", "customer", "nation"
    )


# --------------------------------------------------------------------------
# q37 — TPC-H Q19 shape (disjunctive pushdown): an OR-of-ANDs predicate
# mixing part attributes and lineitem ranges. Catalyst extracts the
# common-factor conjuncts (l_quantity ∈ [1, 30] upper envelope is NOT
# derivable here, but the per-branch p_brand IN (...) union is), pushes
# the partkey equi-join condition, and evaluates the residual
# disjunction post-join inside codegen — one scan of each table, no
# union-of-three-queries rewrite needed. test_plans.py pins that the
# lineitem scan still prunes to the 4 referenced columns.
# --------------------------------------------------------------------------
_Q37 = """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
           AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 20 AND 35
           AND l_quantity BETWEEN 20 AND 30)
"""


@query("q37_disjunctive_parts", oracle=_Q37)
def q37_disjunctive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q37, "lineitem", "part")


# --------------------------------------------------------------------------
# q38 — TPC-H Q14 shape (promo revenue): conditional aggregation ratio —
# two sums over one scan via CASE, no self-join, no second pass. The
# month filter reaches the parquet scan as a min/max-prunable range.
# --------------------------------------------------------------------------
_Q38 = """
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 4
           ) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


@query("q38_promo_revenue", oracle=_Q38)
def q38_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q38, "lineitem", "part")


# --------------------------------------------------------------------------
# q39 — TPC-H Q15 shape (top supplier via view + scalar max): the
# aggregated CTE is referenced twice (join input + scalar max). Catalyst
# computes the scalar subquery independently and folds it to a literal;
# the revenue aggregate itself is one scan + one keyed exchange. The
# equality compares ROUNDED totals on both engines, sidestepping
# summation-order ulps.
# --------------------------------------------------------------------------
_Q39 = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q39_top_revenue_supplier", oracle=_Q39)
def q39_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q39, "supplier", "lineitem")


# --------------------------------------------------------------------------
# q40 — TPC-H Q12 shape (priority line counts): join + dual conditional
# counts. (The fixture has no l_shipmode; l_returnflag plays the mode
# role.) Both counts come out of ONE scan of each side — the CASE pair
# becomes two partial-aggregated longs, shuffled by the 3-value group
# key only.
# --------------------------------------------------------------------------
_Q40 = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
"""


@query("q40_priority_line_counts", oracle=_Q40)
def q40_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q40, "orders", "lineitem")


# --------------------------------------------------------------------------
# q41 — TPC-H Q20 shape (suppliers of bulk-shipped stock): an aggregate
# feeding a join, gated by a scalar threshold over the SAME aggregate —
# avg-relative (1.1×; per-supplier volumes are tightly concentrated on
# the uniform fixture, ~7 survivors at sf0.01, 60 at sf0.1) so the
# selectivity is scale-free. l_quantity is integer-valued, so
# per-supplier sums are exact doubles and the threshold comparison is
# deterministic across engines (same IEEE ops on both sides — the q31
# trick).
# --------------------------------------------------------------------------
_Q41 = """
    WITH shipped AS (
        SELECT l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, qty AS shipped_qty
    FROM supplier JOIN shipped ON s_suppkey = l_suppkey
    WHERE qty > (SELECT 1.1 * avg(qty) FROM shipped)
"""


@query("q41_bulk_shippers", oracle=_Q41)
def q41_bulk_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q41, "supplier", "lineitem")


# --------------------------------------------------------------------------
# q44 — TPC-H Q3 shape (shipping priority): date filters on BOTH sides of
# the customer⋈orders⋈lineitem tree, aggregate by order, top-10 by
# revenue. Both timestamp range predicates reach their parquet scans
# (min/max row-group pruning); the LIMIT runs as TakeOrdered over the
# aggregated (not raw) rows, so the sort frontier is group-cardinality
# bounded. Tie-break on l_orderkey keeps the frontier deterministic
# cross-engine.
# --------------------------------------------------------------------------
_Q44 = """
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@query("q44_shipping_priority", oracle=_Q44)
def q44_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q44, "customer", "orders", "lineitem")


# --------------------------------------------------------------------------
# q45 — TPC-H Q5 shape (local supplier volume): the defining twist is the
# NON-join-tree equality c_nationkey = s_nationkey — customer and
# supplier nations must coincide, which Catalyst applies as a post-join
# filter on two different dimension paths of the same fact row. Nation
# and region broadcast; the only exchanges are the two fact-side keyed
# shuffles (orders⋈lineitem build) and the final 25-group aggregate.
# --------------------------------------------------------------------------
# revenue is summed in EXACT decimal (both engines), rounded on the
# exact value, and cast to double only at the end: a float sum is
# partition-order-dependent, and at sf1 one nation's total landed
# within 1 ulp of the .005 rounding boundary — the rounded float
# flipped between RUNS of the same engine. Exact decimal is also the
# order-independent form a 100 TB aggregation needs.
_Q45 = """
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@query("q45_local_supplier_volume", oracle=_Q45)
def q45_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir, _Q45,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )


# --------------------------------------------------------------------------
# q46 — TPC-H Q8 shape (national market share): the nation dimension
# joins TWICE in different roles (customer's market region gate vs
# supplier's nationality tag), and the share is a conditional-sum ratio
# per year — one pass over the eight-table join, no self-join. The year
# is cast to BIGINT on both engines so the schema hash agrees.
# --------------------------------------------------------------------------
_Q46 = """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
        SELECT cast(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


@query("q46_market_share", oracle=_Q46)
def q46_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir, _Q46,
        "part", "supplier", "lineitem", "orders", "customer", "nation", "region",
    )


# --------------------------------------------------------------------------
# q47 — TPC-H Q9 shape (product-type profit): profit decomposition by
# supplier nation × order year over a part-name substring filter. The
# fixture has no partsupp/ps_supplycost; 0.1 × p_retailprice stands in
# for unit cost (same join tree minus the partsupp hop — the shape under
# test is the multi-way fact join + two-level reaggregation, cited
# absence of any relational layer in the reference per SURVEY §2.C).
# The LIKE '%red%' filter prunes part BEFORE the join (pushed scan
# predicate), shrinking the build side Catalyst broadcasts.
# --------------------------------------------------------------------------
_Q47 = """
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               cast(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(24,4))
                 - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))
                        AS DECIMAL(24,4)) * CAST(0.1 AS DECIMAL(2,1))
                 AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@query("q47_product_profit", oracle=_Q47)
def q47_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark, sf_dir, _Q47, "part", "supplier", "lineitem", "orders", "nation",
    )


# --------------------------------------------------------------------------
# q48 — TPC-H Q10 shape (returned items): quarter-windowed revenue lost
# to returns, per customer, top 20. The l_returnflag = 'R' equality and
# the o_orderdate quarter both push to their scans; nation broadcasts;
# the aggregate keys on the customer attributes so the top-k frontier
# sorts ~O(customers-with-returns) rows, not lineitems.
# --------------------------------------------------------------------------
_Q48 = """
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query("q48_returned_items", oracle=_Q48)
def q48_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q48, "customer", "orders", "lineitem", "nation")


# --------------------------------------------------------------------------
# q49 — TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
# join with an extra non-key predicate INSIDE the join condition (the
# priority exclusion must not drop order-less customers — a WHERE would),
# then a count-of-counts histogram: two keyed aggregates, the second
# over ≤ max-orders-per-customer distinct keys.
# --------------------------------------------------------------------------
_Q49 = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query("q49_customer_distribution", oracle=_Q49)
def q49_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q49, "customer", "orders")


# --------------------------------------------------------------------------
# q50 — TPC-H Q16 shape (supplier relationship): count(DISTINCT suppkey)
# per part attribute triple, minus an excluded supplier list via NOT IN —
# Spark plans the subquery as a null-aware anti join (s_suppkey is
# non-null here, so it degenerates to a broadcast anti hash join; the
# null-aware machinery is the point of the shape). lineitem is the
# part↔supplier link relation (no partsupp in the fixture — q30's
# convention); negative account balance stands in for the complaints
# predicate.
# --------------------------------------------------------------------------
_Q50 = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 3, 9, 12, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q50_supplier_relationship", oracle=_Q50)
def q50_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q50, "lineitem", "part", "supplier")


# --------------------------------------------------------------------------
# q51 — TPC-H Q18 shape (large-volume customers). The textbook IN +
# grouped-HAVING form (kept verbatim as the oracle) makes Catalyst
# evaluate the aggregated-lineitem subquery TWICE — once as a semi-join
# filter on orders, once pushed onto the lineitem join input — and then
# re-join raw lineitem a third time to re-sum the quantities (3 lineitem
# scans + 3 aggregation exchanges in the physical plan). But o_orderkey
# functionally determines every other output column (orderkey → order
# row → customer row), so each output group is exactly one surviving
# order's lineitems and the outer sum(l_quantity) EQUALS the HAVING
# subquery's sum. The Spark side therefore aggregates lineitem ONCE and
# joins the surviving (orderkey, total_qty) rows to orders/customer —
# one fact-table scan, one aggregation exchange, identical rows
# (oracle-verified at sf0.001/0.01/0.1; sf0.1: 3 scans → 1, ~0.5x time).
# Threshold 250 sits at the ~99th percentile of per-order quantity sums
# at every SF (uniform line counts), so selectivity is scale-free.
# l_quantity is integer-valued, so the HAVING comparison is exact.
# --------------------------------------------------------------------------
_Q51 = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(l_quantity) > 250)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
"""

_Q51_SPARK = """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
"""


@query("q51_large_volume_customers", oracle=_Q51)
def q51_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q51_SPARK, "customer", "orders", "lineitem")


# --------------------------------------------------------------------------
# q52 — TPC-H Q22 shape (global sales opportunity): a derived "country
# code" (substring of c_name — the fixture has no c_phone), an
# uncorrelated scalar AVG threshold, and a NOT EXISTS anti join against
# DATE-FILTERED orders (Q22's "no orders in 7 years"; every fixture
# customer has SOME order, so the unfiltered anti join is empty). The
# scalar subquery computes once and folds to a literal; the threshold is
# quantized with floor(x*100 + 0.5)/100 on BOTH engines so
# summation-order ulp noise in avg() cannot flip the comparison.
# --------------------------------------------------------------------------
_Q52_CODES = """('01', '02', '03', '04', '05', '06', '07', '08', '09',
                 '10', '21', '32', '43', '54', '65', '76', '87', '98',
                 '19', '28')"""

_Q52 = f"""
    SELECT cntrycode, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS totacctbal
    FROM (
        SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode,
               c_acctbal
        FROM customer
        WHERE substring(c_name, length(c_name) - 1, 2) IN {_Q52_CODES}
          AND c_acctbal > (
                SELECT floor(avg(c_acctbal) * 100 + 0.5) / 100
                FROM customer
                WHERE c_acctbal > 0.00
                  AND substring(c_name, length(c_name) - 1, 2)
                        IN {_Q52_CODES})
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-07-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@query("q52_sales_opportunity", oracle=_Q52)
def q52_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q52, "customer", "orders")
