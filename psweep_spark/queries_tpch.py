"""Full TPC-H query-shape suite, adapted to the driver's reduced star
schema (see TESTDATA.md: no ``partsupp``, no ``l_commitdate`` /
``l_receiptdate`` / ``l_shipmode``, no ``p_container`` / ``p_mfgr``).

Q1/Q3/Q5/Q10/Q14/Q18 live in ``queries_catalog``; this module adds the
remaining sixteen shapes.  Where a TPC-H query depends on a missing
column, the *structural essence* is preserved with an available stand-in
(documented per query): ``lineitem`` is the part↔supplier link in place
of ``partsupp`` (Q2/Q11/Q16/Q20), ``l_shipdate`` vs ``o_orderdate`` + N
days replaces the commit/receipt lateness predicates (Q4/Q12/Q21), and
``c_nationkey`` replaces the phone country-code substring (Q22).

Scale posture (100 TB): every dimension that survives its filter is
broadcast; the only shuffles are fact-table aggregations/joins keyed on
orderkey/partkey/suppkey/custkey; correlated scalar subqueries are
decorrelated into a grouped aggregation + equi-join (what Catalyst would
do, but stated explicitly so the physical plan is pinned); aggregation
is pushed below joins wherever the group key is the join key (Q13, Q15).

Cross-engine determinism follows queries_catalog's rules: money math in
exact decimal, one final cast to double, averages as sum/count of
identical operands, identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psweep_spark.queries_catalog import (
    _REV_SQL,
    _dsum,
    _ld,
    _m,
    _one,
    _q,
    _revenue_expr,
)


def _eu_suppliers(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """supplier ⋈ nation ⋈ region filtered to one region — all tiny,
    stays a broadcast-able dimension at any scale."""
    na = _ld(spark, sf_dir, "nation")
    re = _ld(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        _ld(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
    )


@_q(
    "q2_min_cost_supplier",
    """
    SELECT DISTINCT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
           l_extendedprice AS min_price
    FROM lineitem, supplier, nation, region, part
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND p_size = 15
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2, supplier s2, nation n2, region r2
        WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery → decorrelated): cheapest
    European offer per size-15 part, lineitem standing in for partsupp
    (reference has no partsupp; cf. /root/reference has no analogue —
    this is BASELINE north-star surface).

    Plan: part(σ size=15) and supplier⋈nation⋈region are broadcast onto
    lineitem; the correlated MIN becomes one groupBy(l_partkey) agg; the
    min join-back is a broadcast (one row per qualifying part). Exactly
    one fact shuffle (the partkey agg)."""
    pa = _ld(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eu = _eu_suppliers(spark, sf_dir, "EUROPE").select(
        "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    li = _ld(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = li.join(
        F.broadcast(pa.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    minp = offers.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("__min_price")
    ).withColumnRenamed("l_partkey", "__pk")
    return (
        offers.join(
            F.broadcast(minp),
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("l_extendedprice") == F.col("__min_price")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@_q(
    "q4_priority_late_ship",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join fact→fact. The lateness
    predicate is l_shipdate > o_orderdate + 60 days (schema has no
    commit/receipt dates). Plan: orders pre-filtered to one quarter
    (partition-prunable at scale), left-semi against lineitem on
    orderkey with the non-equi lateness condition folded into the same
    join; one shuffle pair on orderkey, then a tiny priority agg."""
    od = _ld(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    li = _ld(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = od.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@_q(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, the pushdown litmus test.
    All four predicates and both arithmetic columns must reach the
    parquet scan (PushedFilters + 3-column ReadSchema); no shuffle at
    all beyond the single-row final agg."""
    li = _ld(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_m(F.col("l_extendedprice")) * _m(F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@_q(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Plan: BOTH fact inputs are pre-filtered by their
    broadcast nation dimension *before* the orderkey shuffle — lineitem
    keeps only the two nations' suppliers, orders keeps only the two
    nations' customers — so the one big join moves ~2/25 of each fact;
    the cross-pair predicate then runs on the joined slice."""
    na = _ld(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    su = _ld(spark, sf_dir, "supplier").join(
        F.broadcast(na.select(F.col("n_nationkey").alias("sn_key"),
                              F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cu = _ld(spark, sf_dir, "customer").join(
        F.broadcast(na.select(F.col("n_nationkey").alias("cn_key"),
                              F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    li = (
        _ld(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    od = (
        _ld(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue_expr()).cast("double").alias("revenue"))
    )


@_q(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS volume, n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1,
           nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ASIA-customer PROMO-part
    revenue per order year — conditional-aggregate ratio. Plan: part
    (σ type), supplier⋈nation (all nations, for the numerator tag), and
    customer⋈nation⋈region (σ ASIA) all broadcast; lineitem is
    pre-filtered by the part broadcast before the orderkey shuffle
    against date-filtered orders."""
    pa = _ld(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = (
        _ld(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_ld(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    asia_cu = (
        _ld(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                _ld(spark, sf_dir, "nation").join(
                    F.broadcast(_ld(spark, sf_dir, "region").filter(
                        F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    od = (
        _ld(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1998-01-01 00:00:00")
        )
        .join(F.broadcast(asia_cu), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        _ld(spark, sf_dir, "lineitem")
        .join(F.broadcast(pa.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = _revenue_expr()
    zero = F.lit(0).cast("decimal(12,2)") * F.lit(0).cast("decimal(12,2)")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@_q(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for parts
    matching a name pattern. The schema has no ps_supplycost, so profit
    degrades to discounted revenue — the plan shape (5-way join, LIKE
    filter on a broadcast dim, two-key agg) is what's under test.
    lineitem is pre-filtered by the part broadcast before the orderkey
    shuffle."""
    pa = _ld(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    su = (
        _ld(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_ld(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    li = (
        _ld(spark, sf_dir, "lineitem")
        .join(F.broadcast(pa.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    od = _ld(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.sum(_revenue_expr()).cast("double").alias("sum_profit"))
    )


@_q(
    "q11_important_parts",
    f"""
    WITH nat_value AS (
      SELECT l_partkey, SUM({_REV_SQL}) AS value_dec
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM nat_value
    WHERE CAST(value_dec AS DOUBLE) >
          (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM nat_value)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value from one nation's
    suppliers exceeds a fraction of that nation's total (scalar
    subquery over the same aggregate). lineitem revenue stands in for
    ps_supplycost*ps_availqty. Plan: one partkey agg (the only fact
    shuffle); the global total reuses the SAME per-part aggregate as a
    single-row broadcast cross-join — the fact is scanned once, not
    twice."""
    su = (
        _ld(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_ld(spark, sf_dir, "nation").filter(
                F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        _ld(spark, sf_dir, "lineitem")
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue_expr()).alias("value_dec"))
    )
    total = per_part.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("__threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("__threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


@_q(
    "q12_late_shipments",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                          AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment priority breakdown (l_shipmode is
    absent → grouped by l_returnflag; lateness = shipped ≥30 days after
    order). Plan: lineitem date-filtered at the scan, one orderkey
    shuffle join, CASE-sum agg on 3 groups."""
    li = _ld(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    od = _ld(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate",
                                             "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate")
                >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long")
            .alias("low_line_count"),
        )
    )


@_q(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers. Plan: aggregation pushed BELOW the outer join
    — orders is pre-aggregated by custkey (one fact shuffle), then
    left-joined to customer on the same key, so the join moves one row
    per customer instead of one per order; missing matches coalesce to
    0. The outer histogram agg is tiny."""
    cnts = (
        _ld(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("__n"))
    )
    cu = _ld(spark, sf_dir, "customer").select("c_custkey")
    return (
        cu.join(cnts, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@_q(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_dec = (SELECT MAX(total_dec) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the quarter's max revenue
    (scalar MAX subquery over a derived view). Plan: one suppkey agg
    over the date-pruned scan; the MAX is a single-row broadcast
    cross-join against the same aggregate (fact scanned once); supplier
    names arrive by broadcast. Exact-decimal totals make the equality
    join engine-stable."""
    rev = (
        _ld(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-04-01 00:00:00")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue_expr()).alias("total_dec"))
    )
    mx = rev.agg(F.max("total_dec").alias("__max_dec"))
    su = _ld(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("__max_dec"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
    )


@_q(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    with a NOT-IN supplier exclusion (negative balance standing in for
    the complaints LIKE — schema has no comments). lineitem is the
    part↔supplier link (no partsupp). Plan: part filter broadcast,
    excluded suppliers broadcast anti-join, then one shuffle for the
    3-key distinct agg."""
    pa = _ld(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_su = _ld(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    li = _ld(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_su), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity lines, correlated
    AVG subquery per part (p_container absent → brand-only filter).
    Plan: decorrelated — lineitem is first cut to Brand#13 parts via
    the part broadcast, the per-part average is one partkey agg over
    that slice (the correlation only ever touches Brand#13 partkeys),
    then a broadcast join-back applies the 0.2·avg threshold. Fact
    scanned once, one shuffle."""
    pa = _ld(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    li = _ld(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
    avgs = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count("*").cast("double")
        ).alias("__avg_qty")
    )
    return (
        li.join(F.broadcast(avgs), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@_q(
    "q19_discounted_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicate (the classic
    OR-pushdown test; p_container absent → brand+size+quantity arms).
    Plan: part is broadcast; the quantity bounds (1..30 overall) are
    derivable per-arm, and the OR of the three arms runs post-join
    while the part side prunes to the three brands before broadcast —
    no shuffle, single-row agg."""
    pa = _ld(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#15")
    ).select("p_partkey", "p_brand", "p_size")
    li = _ld(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)
    )
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm1 | arm2 | arm3)
        .agg(F.sum(_revenue_expr()).cast("double").alias("revenue"))
    )


@_q(
    "q20_promotion_suppliers",
    """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 50)
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved significant
    volume of promo-candidate parts (lineitem sums stand in for
    ps_availqty). Plan: part LIKE-filter broadcast onto the date-pruned
    lineitem scan; one (suppkey, partkey) agg; HAVING on the exact
    decimal sum; result distinct-ed to suppkeys and semi-joined into
    the broadcast-small nation slice of supplier."""
    pa = _ld(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    qualified = (
        _ld(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
        )
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__q"))
        .filter(F.col("__q") > 50)
        .select("l_suppkey")
    )
    na = _ld(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        _ld(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@_q(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the LAST to ship in
    multi-supplier finished orders (l_shipdate lateness replaces the
    receipt/commit predicate). Plan: the NATION_4 supplier slice and
    nation are broadcast; orders(σ status=F) joins on orderkey; the
    EXISTS and NOT EXISTS become a left-semi and a left-anti join
    against lineitem keyed on orderkey with the supplier/date
    inequality folded in — three orderkey-keyed shuffles of a
    pre-filtered fact, no cartesian anywhere."""
    na = _ld(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    su = (
        _ld(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    od = _ld(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = (
        _ld(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    l2 = _ld(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey"))
        & (F.col("x_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return waited.groupBy("s_name").agg(F.count("*").alias("numwait"))


@_q(
    "q22_sales_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
    ) rich
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers in target countries with
    no recent orders (c_nationkey stands in for the phone country-code
    substring; "no orders since 1999" replaces "no orders ever" so the
    anti-join has work to do at every SF). Plan: the scalar average is
    a single-row broadcast from a pre-aggregated customer scan; the
    anti-join streams date-filtered orders keyed on custkey; final
    7-group agg is tiny."""
    nats = [1, 3, 5, 7, 9, 11, 13]
    cu = _ld(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nats))
    avg = cu.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("__avg_bal")
    )
    recent = _ld(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01 00:00:00"
    ).select("o_custkey")
    return (
        cu.join(F.broadcast(avg))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), "decimal(12,2)").alias("totacctbal"),
        )
    )
