"""The remaining TPC-H query shapes (Q2, Q4, Q9, Q11, Q12, Q16, Q20, Q21).

Together with the shapes in ``advanced.py`` / ``relational.py`` (Q1, Q3, Q5,
Q6, Q7, Q8, Q10, Q13, Q14, Q15, Q17, Q18, Q19, Q22) this completes all 22
TPC-H query *shapes* against the driver fixtures. The fixture schema is
TPC-H-ish, not TPC-H: there is no ``partsupp`` table and ``lineitem`` has no
commit/receipt dates, so each query keeps the reference TPC-H plan shape
(the part Catalyst must get right — correlated subqueries, EXISTS/NOT-EXISTS
self-joins, scalar-subquery thresholds, count-distinct with NOT IN) while
adapting the business predicate to the columns that exist:

- "supply cost"            → min unit price observed in lineitem per
                              (part, supplier) — the part-supplier link table
                              is derived by aggregation instead of scanned;
- "commit < receipt" (late) → ``l_shipdate > o_orderdate + 365 days``
                              (fixture ship lag: median 36 d, p90 1404 d);
- "availqty > half demand"  → supplier's share of a part's shipped quantity
                              exceeding half.

All money/quantity sums go through DECIMAL(12,2) so both engines agree
bit-for-bit (base.py conventions); threshold comparisons stay in DECIMAL so
the HAVING/WHERE cut is exact in both engines, and only display columns are
cast to DOUBLE + rounded.

Reference: joins/subqueries are absent in the reference engine — every one of
these is "UDF-expressible only" there (SURVEY.md §2 Part B, Joins /
Subqueries; reduce-side join sketch ReduceRunner.java:78-110).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from map_reduce_engine_spark.queries.base import register, t

_DEC_SUM_EP = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
_LATE_DAYS = 365


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
    FROM cost
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size = 25 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND supply_cost = (
        SELECT min(c2.supply_cost)
        FROM cost c2
        JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: minimum-cost supplier per part via a correlated "
    "scalar MIN subquery. The part-supplier catalog is derived from "
    "lineitem (min observed unit price per (part, supplier)) since the "
    "fixture has no partsupp. The oracle keeps the authentic correlated "
    "form; the Spark plan decorrelates it by hand the way Catalyst would "
    "— one groupBy(partkey).min over the already-filtered candidate set, "
    "joined back on (partkey, cost-equality). At 100 TB the candidate set "
    "after the part/region filters is dim-table sized, so the min-cost "
    "aggregate and its join-back both broadcast; only the initial "
    "(part,supplier) aggregation shuffles lineitem, on l_partkey. "
    "min() on DOUBLE picks an exact stored value (no accumulation), so "
    "the equality join-back is bit-safe in both engines.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(
        (F.col("p_size") == 25) & (F.col("p_type") == "STANDARD")
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    cand = cost.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = cand.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cand.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority checking — EXISTS over lineitem "
    "with a predicate correlating both tables (late shipment: shipped "
    ">365 d after order date, standing in for commit<receipt which the "
    "fixture lacks). Spark side expresses the EXISTS as a LEFT SEMI join "
    "with the cross-table predicate in the join condition, so Catalyst "
    "plans one shuffle on the order key and the quarter filter pushes "
    "into the orders scan; no pre-aggregation of lineitem is needed and "
    "semi-join short-circuits per matching key.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'")
        & F.expr("o_orderdate < TIMESTAMP_NTZ '1997-04-01 00:00:00'")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAY")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name,
           CAST(year(o_orderdate) AS INT) AS o_year,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))
                          - CAST(0.5 AS DECIMAL(2,1))
                            * CAST(p_retailprice AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2)))
                     AS DOUBLE), 2) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_type = 'ECONOMY'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year DESC
    """,
    doc="TPC-H Q9 shape: product-type profit by supplier nation and order "
    "year. Profit = revenue − cost, with cost proxied by half the part's "
    "retail price per unit (no ps_supplycost in the fixture). The classic "
    "5-way join: part/supplier/nation broadcast (dim-sized at any SF), "
    "lineitem⋈orders is the one real shuffle, on the order key; the "
    "p_type filter prunes lineitem through the broadcast join before the "
    "shuffle. All arithmetic stays in DECIMAL until the final cast, so "
    "revenue-minus-cost sums are exact under any partitioning.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    profit = (
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (1 - CAST(l_discount AS DECIMAL(12,2)))"
        " - CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2))"
        " * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.expr(profit), 2).alias("sum_profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey IN (1, 2, 3, 4, 5)
      GROUP BY l_partkey
    )
    SELECT l_partkey, round(CAST(value_dec AS DOUBLE), 2) AS part_value
    FROM v
    WHERE value_dec > 0.001 * (SELECT sum(value_dec) FROM v)
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: important-stock identification — per-part value "
    "restricted to suppliers of a nation group, kept only where it "
    "exceeds a fraction of the global total (scalar subquery in HAVING "
    "position). Spark computes the per-part aggregate once, derives the "
    "global total from *that* aggregate (partkey-grouped, so dim-sized "
    "— no second lineitem scan), and broadcasts the 1-row threshold "
    "into the filter. The threshold comparison stays in DECIMAL in both "
    "engines so the cut line is exact; only the display column is cast "
    "to DOUBLE. One lineitem shuffle, on l_partkey.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").where(F.col("s_nationkey").isin(1, 2, 3, 4, 5))
    v = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.expr("sum(CAST(l_extendedprice AS DECIMAL(12,2)))").alias("value_dec"))
    )
    total = v.agg(F.sum("value_dec").alias("total_dec"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("value_dec") > F.expr("0.001") * F.col("total_dec"))
        .select(
            "l_partkey",
            F.round(F.col("value_dec").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape: shipping-priority class counts — join plus "
    "two-branch conditional counting in one aggregation pass (the "
    "fixture has no l_shipmode; l_returnflag is the grouping class). "
    "The year filter pushes into the lineitem scan, the filtered "
    "lineitem⋈orders join shuffles on the order key once, and both CASE "
    "branches are computed in the same hash aggregate — one scan, one "
    "shuffle, no second pass.",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").where(
        F.expr("l_shipdate >= TIMESTAMP_NTZ '1998-01-01 00:00:00'")
        & F.expr("l_shipdate < TIMESTAMP_NTZ '1999-01-01 00:00:00'")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: supplier count by part attributes, excluding a "
    "NOT-IN subquery of disqualified suppliers (negative balance standing "
    "in for the complaints LIKE). The part-supplier relation is lineitem "
    "(no partsupp). Spark turns the NOT IN into a LEFT ANTI broadcast "
    "join (the exclusion list is supplier-sized — tiny at any SF; and "
    "s_suppkey is non-null so NOT IN ≡ anti-join with no null trap), "
    "then count(DISTINCT) in a part-attribute hash aggregate. Lineitem "
    "shuffles once, on the grouping attributes after the broadcast "
    "part-filter prunes it.",
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_sup = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_shippers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY l_suppkey, l_partkey
    ), pt AS (
      SELECT l_partkey AS t_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS part_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM sp
        JOIN pt   ON t_partkey = l_partkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'ECONOMY'
          AND supp_qty > CAST(0.5 AS DECIMAL(2,1)) * part_qty)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: suppliers who dominated shipments of some part — "
    "the nested-IN 'more than half' threshold query. TPC-H compares "
    "availqty to half the year's shipments; with no partsupp the "
    "adaptation flags a supplier holding >50% share of a part's shipped "
    "quantity that year. Spark: both aggregates come from the same "
    "date-filtered lineitem scan (grouped at two granularities — "
    "(supp,part) and part), joined on partkey; the qualifying-supplier "
    "set is then a LEFT SEMI broadcast into the supplier dim. Share "
    "comparison stays in DECIMAL — exact in both engines. Two shuffles "
    "of the filtered scan, both on partkey-prefixed keys.",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    window = F.expr(
        "l_shipdate >= TIMESTAMP_NTZ '1998-01-01 00:00:00'"
    ) & F.expr("l_shipdate < TIMESTAMP_NTZ '1999-01-01 00:00:00'")
    li = t(spark, sf_dir, "lineitem").where(window)
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.expr("sum(CAST(l_quantity AS DECIMAL(12,2)))").alias("supp_qty")
    )
    pt = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.expr("sum(CAST(l_quantity AS DECIMAL(12,2)))").alias("part_qty")
    )
    qualifying = (
        sp.join(pt, F.col("l_partkey") == F.col("t_partkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("supp_qty") > F.expr("CAST(0.5 AS DECIMAL(2,1))") * F.col("part_qty"))
        .select("l_suppkey")
    )
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle=f"""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape: suppliers who kept orders waiting — the "
    "EXISTS + NOT-EXISTS double self-join on lineitem ('some other "
    "supplier in the order, but no other *late* supplier'). Late = "
    "shipped >365 d after order date. The oracle keeps the authentic "
    "self-join form; the Spark plan replaces both correlated self-joins "
    "with ONE per-order aggregate — count(DISTINCT supplier) and "
    "count(DISTINCT late supplier) — joined back to the late rows: "
    "n_supp > 1 ≡ EXISTS, n_late_supp = 1 ≡ NOT EXISTS (the row's own "
    "supplier is late, so 1 means 'no other'). At 100 TB that's one "
    "orderkey shuffle instead of two lineitem×lineitem self-joins — the "
    "self-join shape is quadratic in per-order lineitems and its "
    "worst-case skew lands on exactly the multi-supplier orders the "
    "query targets.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAY")
        ).alias("late"),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    blockers = (
        lo.where(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("g_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blockers.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
