"""Deep-join query surface: the TPC-H Q7/Q9/Q10/Q16/Q19 shapes,
adapted to the driver's tables (no partsupp; lineitem carries no
shipmode/commitdate — predicates use the columns that exist).

The reference has no explicit joins (SURVEY §2.3) — its star schema
exists to be joined at query time; these are the multi-join /
disjunctive-predicate / distinct-count shapes a warehouse query
surface must plan well.

Scale notes (100 TB):
- Every dimension side (nation, supplier, customer, part at fact
  scale) is explicitly broadcast or small enough for AQE to broadcast;
  the only large shuffles are lineitem⋈orders on orderkey — the key
  the fact table would be bucketed by in production.
- Q19's disjunctive predicate stays a single scan: the OR-of-ANDs is
  one Catalyst filter after a broadcast join, with the shared
  ``l_quantity <= 40`` bound pushed to the parquet row-group stats.
- Q16-style distinct-count aggregates partial per partition before the
  final exchange on the (brand, type, size) grouping key.

Cross-engine float determinism follows plans/relational.py: aggregate
in exact decimal, emit double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_data_pipeline_spark.plans.relational import DEC2, DEC4, _as_double, _dec2, _dec4
from securities_data_pipeline_spark.sources.tables import table


def _revenue():
    return _dec2("l_extendedprice") * (F.lit(1).cast(DEC4) - _dec4("l_discount"))


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nation pairs.

    lineitem⋈orders shuffles on orderkey; supplier/customer/nation are
    broadcast. The nation-pair disjunction is evaluated after the
    broadcast joins — no fact-side re-shuffle for the second nation
    role (the same ``nation`` relation is broadcast twice under two
    aliases, the standard two-role dimension pattern).
    """
    nation1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nation2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nation2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_as_double(F.sum(_revenue())).alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         {_REVENUE_SQL} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: product-line profit by nation and year.

    No partsupp table → profit proxy = discounted revenue minus
    ``p_retailprice * 0.01 * l_quantity`` cost. part filters on name
    LIKE before the join, so the broadcast build side is the filtered
    subset only. Revenue and cost are summed as *separate* exact
    decimals and subtracted once as doubles — summing the per-row
    difference would hit the engines' divergent decimal-subtraction
    precision-overflow rules.
    """
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.01").cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (_as_double(F.sum(_revenue())) - _as_double(F.sum(cost))).alias(
                "sum_profit"
            )
        )
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE)
         - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
                    * CAST(0.01 AS DECIMAL(3,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returns.

    Date-bounded orders ⋈ returned lineitems shuffle on orderkey;
    customer/nation broadcast into the aggregate's output (group key
    includes the customer attributes, so the join happens before the
    groupBy — at 100 TB the per-customer aggregate is still tiny next
    to the fact scan). Deterministic top-20 via (revenue desc,
    custkey asc).
    """
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1995-12-31").cast("timestamp")
        )
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_as_double(F.sum(_revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers per (brand, type, size).

    partsupp is absent → the part↔supplier relationship comes from
    lineitem's (l_partkey, l_suppkey) pairs. Excluded brand/type
    filter on the broadcast part side; COUNT(DISTINCT) partial-aggs
    per partition before the final exchange.
    """
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45") & (~F.col("p_type").like("MEDIUM%"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
GROUP BY p_brand, p_type, p_size
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under an OR-of-ANDs brand/size/qty
    predicate.

    One broadcast join + one filter — Catalyst keeps the disjunction a
    single predicate (no union-of-scans), and the common
    ``l_quantity <= 40`` upper bound is factored out so it pushes to
    the parquet scan independently of the per-brand branches.
    """
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") <= 40)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch)
        .agg(_as_double(F.sum(_revenue())).alias("revenue"))
    )


Q19_SQL = f"""
SELECT CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_quantity <= 40
  AND (   (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 40))
"""


TPCH2_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q7_nation_volume": q7_nation_volume,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q10_returned_items": q10_returned_items,
    "q16_supplier_count": q16_supplier_count,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
}

TPCH2_ORACLES: dict[str, str] = {
    "q7_nation_volume": Q7_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q16_supplier_count": Q16_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
}


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: NATION_3 suppliers' fraction of
    EUROPE-region revenue per year — a nested ratio aggregate.

    Numerator and denominator are exact-decimal sums emitted as
    doubles; the share is ONE double division at the end (identical
    inputs → identical quotient in both engines). The conditional
    numerator uses sum(CASE WHEN ...) so both sums come from a single
    pass over the joined fact — no second scan or self-join.
    """
    nation_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nation_c = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    rev = _revenue()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                _as_double(
                    F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast(DEC2)))
                )
                / _as_double(F.sum(rev))
            ).alias("mkt_share")
        )
    )


Q8_SQL = f"""
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REVENUE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY 1
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional counts: high- vs low-priority order
    counts per lineitem return flag (no shipmode column — returnflag
    is the grouping surrogate). One join + one agg; the CASE branches
    fold into the same aggregate pass."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY l_returnflag
"""

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check (ref b2.2.2 Q4; the
    synthetic schema has no commit/receipt dates, so "late" =
    EXISTS a lineitem shipped >30 days after the order date): count
    Q3-1995 orders per priority having at least one late line.

    Plan: the EXISTS compiles to a LEFT SEMI hash join on orderkey —
    the lineitem side never duplicates orders (no post-join distinct
    needed), and the date filters push to both parquet scans."""
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-07-01").cast("timestamp"), F.lit("1995-09-30").cast("timestamp")
        )
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1995-07-01' AND TIMESTAMP '1995-09-30'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""

TPCH2_QUERIES["q4_order_priority"] = q4_order_priority
TPCH2_QUERIES["q8_market_share"] = q8_market_share
TPCH2_QUERIES["q12_priority_shipping"] = q12_priority_shipping
TPCH2_ORACLES["q4_order_priority"] = Q4_SQL
TPCH2_ORACLES["q8_market_share"] = Q8_SQL
TPCH2_ORACLES["q12_priority_shipping"] = Q12_SQL
