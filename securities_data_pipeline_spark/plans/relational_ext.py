"""Extended relational surface: set ops, grouping sets, pivot/unpivot,
percentiles, multi-distinct aggregates, approximate sketches.

None of these exist in the reference (SURVEY §2.4/2.7 notes) — Spark
provides them natively and the star schema exists to be queried this
way, so the engine exposes them as first-class, oracle-checked
operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_data_pipeline_spark.plans.relational import DEC2, _as_double, _dec2
from securities_data_pipeline_spark.sources.tables import table

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def u5_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sup = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(sup)


U5_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


def u6_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): nations with customers but no suppliers."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sup = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract = EXCEPT DISTINCT (set semantics, matching the SQL
    # EXCEPT oracle); exceptAll would be bag semantics
    return cust.subtract(sup)


U6_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all grouping sets."""
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _as_double(F.sum(_dec2("o_totalprice"))).alias("sum_totalprice"),
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def f_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: customer count per nation × market segment (wide). The
    oracle is the equivalent conditional aggregation."""
    cust = table(spark, sf_dir, "customer")
    out = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(SEGMENTS))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(SEGMENTS))
    )
    return out.select("c_nationkey", *[F.col(s).alias(s.lower()) for s in SEGMENTS])


F_PIVOT_SQL = f"""
SELECT c_nationkey,
       {', '.join(f"COUNT(*) FILTER (c_mktsegment = '{s}') AS {s.lower()}" for s in SEGMENTS)}
FROM customer
GROUP BY c_nationkey
"""


def f_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: lineitem measures → long (measure, value) rows —
    the same reshape the price pipeline uses, as a query operator."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") % 1000 == 0).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


F_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, u.measure, u.value
FROM lineitem,
LATERAL (VALUES ('l_quantity', l_quantity),
                ('l_extendedprice', l_extendedprice),
                ('l_discount', l_discount)) AS u(measure, value)
WHERE l_orderkey % 1000 = 0
"""


def a5_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates in one pass per group."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        _as_double(F.sum(_dec2("c_acctbal"))).alias("sum_acctbal"),
    )


A5_SQL = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY c_mktsegment
"""


def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) of
    order totals per priority, rounded for cross-engine stability."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.9)), 4).alias("p90"),
    )


A7_SQL = """
SELECT o_orderpriority,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90
FROM orders
GROUP BY o_orderpriority
"""


def approx_distinct_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct count of order keys per
    month — the raw library surface (sketch internals are
    engine-specific, so the raw estimate has no SQL oracle; its
    accuracy is pinned by tests/test_analytics.py)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .agg(F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"))
    )


def a6_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated HLL contract: per-month exact distinct order count
    plus an in-plan check that the HLL++ estimate (rsd=0.02) lands
    within 3·rsd of it. approx_count_distinct is deterministic for a
    fixed dataset, so ``estimate_ok`` is reproducible and the DuckDB
    oracle asserts it TRUE alongside the exact counts — giving the
    sketch a hash-checkable correctness gate without comparing
    engine-specific sketch internals. Both aggregates share one
    shuffle on the month key; at scale the HLL partial aggregates are
    constant-size per group while exact count-distinct shuffles the
    keys — the query exists to certify the cheap path tracks the
    expensive one."""
    li = table(spark, sf_dir, "lineitem")
    month = F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month")
    agg = li.groupBy(month).agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("_approx"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    err_bound = F.lit(3 * 0.02) * F.col("exact_orders")
    return agg.select(
        "ship_month",
        "exact_orders",
        (F.abs(F.col("_approx") - F.col("exact_orders")) <= err_bound).alias(
            "estimate_ok"
        ),
    )


A6_SQL = """
SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS ship_month,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS estimate_ok
FROM lineitem
GROUP BY 1
"""


def a9_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated sketch-percentile contract (the a6 pattern for
    quantiles): per order-priority, the exact interpolated median of
    o_totalprice plus an in-plan check that Spark's
    ``approx_percentile`` (G-K sketch, accuracy 10000 ⇒ rank error
    ≤ n/10000) lands within 2% of it. The sketch is deterministic for
    fixed data, so ``estimate_ok``
    is reproducible; the oracle recomputes the exact side and asserts
    the booleans. At 100 TB the sketch is the runnable path — constant
    memory per group vs the exact percentile's full sort — and this
    query is the calibration job certifying it."""
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("_exact"),
        F.percentile_approx(F.col("o_totalprice"), F.lit(0.5), F.lit(10000)).alias(
            "_approx"
        ),
    )
    return agg.select(
        "o_orderpriority",
        F.round("_exact", 4).alias("p50"),
        (F.abs(F.col("_approx") - F.col("_exact")) <= 0.02 * F.col("_exact")).alias(
            "estimate_ok"
        ),
    )


A9_SQL = """
SELECT o_orderpriority,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
       TRUE AS estimate_ok
FROM orders
GROUP BY o_orderpriority
"""


def q6_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan-and-sum — date range + discount band
    + quantity cap, all pushed to the parquet scan; single partial→
    final agg, no join, no wide columns. The canonical "is the scan
    fast" probe."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _as_double(
                F.sum(_dec2("l_extendedprice") * F.col("l_discount").cast("decimal(18,4)"))
            ).alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over a broadcast
    dimension join (promo revenue share by ship month)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    disc = _dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(24,6)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .agg(
            # a month whose entire revenue is zero (every line fully
            # discounted) has an undefined promo share: NULL on both
            # engines instead of an ANSI divide-by-zero abort
            # (found by tools/fuzz_relational.py)
            F.when(
                F.sum(disc) != 0,
                F.lit(100.0) * _as_double(F.sum(promo)) / _as_double(F.sum(disc)),
            ).alias("promo_pct")
        )
    )


Q14_SQL = """
SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS ship_month,
       CASE WHEN SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))) <> 0 THEN
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                   ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
       END AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""



def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status-only and priority-only
    aggregates in one pass — the general form cube/rollup specialize;
    Spark 4 DataFrame API). One shuffle, each input row expanded only
    into its declared sets."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _as_double(F.sum(_dec2("o_totalprice"))).alias("sum_totalprice"),
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""



RELATIONAL_EXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "u5_intersect": u5_intersect,
    "u6_except": u6_except,
    "agg_cube": agg_cube,
    "f_pivot_segments": f_pivot_segments,
    "f_unpivot_measures": f_unpivot_measures,
    "a5_multi_distinct": a5_multi_distinct,
    "a7_percentiles": a7_percentiles,
    # a6 is gated via its exact-count + estimate_ok contract (the raw
    # HLL estimate stays library-only as approx_distinct_by_month).
    "a6_approx_distinct": a6_approx_distinct,
    "a9_approx_percentile": a9_approx_percentile,
    "q6_banded_revenue": q6_banded_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "agg_grouping_sets": agg_grouping_sets,
}

RELATIONAL_EXT_ORACLES: dict[str, str] = {
    "u5_intersect": U5_SQL,
    "u6_except": U6_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "f_pivot_segments": F_PIVOT_SQL,
    "f_unpivot_measures": F_UNPIVOT_SQL,
    "a5_multi_distinct": A5_SQL,
    "a7_percentiles": A7_SQL,
    "a6_approx_distinct": A6_SQL,
    "a9_approx_percentile": A9_SQL,
    "q6_banded_revenue": Q6_SQL,
    "q14_promo_revenue": Q14_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
}


def w6_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window surface: percent_rank / cume_dist / ntile over
    o_totalprice within each order priority. One shuffle on the
    partition key serves all three functions (same window spec).
    ntile depends on absolute row position, so the ORDER BY carries a
    unique tie-break (o_orderkey) to stay deterministic under equal
    prices."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


W6_SQL = """
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""

RELATIONAL_EXT_QUERIES["w6_rank_surface"] = w6_rank_surface
RELATIONAL_EXT_ORACLES["w6_rank_surface"] = W6_SQL


def g_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel attribution: each user's first view and the first
    purchase at-or-after it, with the conversion lag in seconds — the
    two-stage conditional-min shape behind activation/conversion
    dashboards.

    Stage 1 aggregates views to one (user, first_view) row; stage 2
    left-joins purchases behind that row-count reduction, so the range
    condition (purchase_ts >= first_view) probes |users| rows rather
    than |views| × |purchases|. Both stages shuffle on user_id — AQE
    reuses the partitioning. The conversion lag is a microsecond-exact
    integer subtraction (``unix_micros`` ↔ ``epoch_us``) —
    second-granularity APIs disagree across engines on fractional
    seconds (Spark truncates, DuckDB's double→bigint cast rounds).
    """
    ev = table(spark, sf_dir, "events")
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        first_view.join(
            purch,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") >= F.col("first_view")),
            "left",
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("p_ts").alias("first_purchase"))
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (F.unix_micros("first_purchase") - F.unix_micros("first_view")).alias(
                "lag_us"
            ),
        )
    )


G_FUNNEL_SQL = """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
)
SELECT f.user_id, f.first_view,
       MIN(p.ts) AS first_purchase,
       epoch_us(MIN(p.ts)) - epoch_us(f.first_view) AS lag_us
FROM first_view f
LEFT JOIN events p
  ON p.user_id = f.user_id AND p.event_type = 'purchase' AND p.ts >= f.first_view
GROUP BY f.user_id, f.first_view
"""

RELATIONAL_EXT_QUERIES["g_funnel_conversion"] = g_funnel_conversion
RELATIONAL_EXT_ORACLES["g_funnel_conversion"] = G_FUNNEL_SQL


def g_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by signup week, counted
    distinct in each subsequent activity week — the cohort matrix
    behind every retention dashboard.

    Activity collapses to distinct (user, week) BEFORE the cohort
    join, so the join probes one row per user-week, not one per
    event; the signup side is one row per user. Week arithmetic stays
    integral (both engines truncate to ISO Monday; offsets are exact
    multiples of 7 days), so no float drift is possible.
    """
    ev = table(spark, sf_dir, "events")
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", "ts")).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        activity.join(signup, "user_id")
        .where(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy(
            # DuckDB's date_trunc('week') yields DATE; Spark's yields
            # timestamp — emit DATE so the hash compare agrees
            F.to_date("cohort_week").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


G_COHORT_SQL = """
WITH signup AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT cohort_week,
       CAST(datediff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a
JOIN signup s ON a.user_id = s.user_id
WHERE act_week >= cohort_week
GROUP BY 1, 2
"""

RELATIONAL_EXT_QUERIES["g_cohort_retention"] = g_cohort_retention
RELATIONAL_EXT_ORACLES["g_cohort_retention"] = G_COHORT_SQL


def j3_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation: per-nation customer count vs
    supplier count, keeping nations that appear on only one side
    (the side-by-side diff every dimension migration runs).

    Both inputs pre-aggregate to one row per nationkey BEFORE the
    join, so the full outer joins two dimension-sized aggregates —
    never the facts — and AQE broadcast-falls-back freely. Nulls from
    the missing side surface as 0 via coalesce.
    """
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(sup, cust.ck == sup.sk, "full_outer")
        .select(
            F.coalesce(F.col("ck"), F.col("sk")).cast("long").alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).cast("long").alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).cast("long").alias("n_supp"),
        )
    )


J3_FULL_OUTER_SQL = """
WITH c AS (
  SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1
), s AS (
  SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier GROUP BY 1
)
SELECT CAST(COALESCE(ck, sk) AS BIGINT) AS nationkey,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
FROM c FULL OUTER JOIN s ON ck = sk
"""

RELATIONAL_EXT_QUERIES["j3_full_outer"] = j3_full_outer
RELATIONAL_EXT_ORACLES["j3_full_outer"] = J3_FULL_OUTER_SQL


def f_variant_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type: the
    events props JSON parses ONCE into a variant (a binary
    semi-structured encoding Catalyst can push typed extraction into),
    then ``variant_get`` pulls typed fields without string re-parsing
    per access. This is the open-format twin of f_json_extract (which
    re-parses the JSON text per extraction with get_json_object) — at
    100 TB the parse-once/extract-many difference is the whole cost of
    a wide semi-structured scan. Per-type min/max/sum over the typed
    extraction, so the oracle compares plain int64s; the variant
    itself never leaves the plan (VARIANT has no cross-engine
    canonical form to hash).

    Garbage-JSON contract (fuzz-derived, tools/fuzz_events.py):
    ``try_parse_json`` quarantines malformed props to a NULL variant
    instead of FAILFAST-aborting the whole scan (one '{broken' row
    killed the query), and ``try_variant_get`` yields NULL for a
    non-long field instead of an ANSI cast error; the oracle mirrors
    with a ``json_valid`` guard + ``TRY_CAST``. Documented strictness
    gap: VARIANT rejects duplicate-key objects (NULL) where the text
    path keeps the first match — a fuzz dup-key row only agrees
    because its object lacks the extracted field.
    """
    ev = table(spark, sf_dir, "events")
    k = F.expr("try_variant_get(try_parse_json(props), '$.k', 'long')")
    return ev.groupBy("event_type").agg(
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).cast("long").alias("sum_k"),
        F.count(k).cast("long").alias("n_with_k"),
    )


F_VARIANT_SQL = """
WITH kx AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(k) AS BIGINT) AS n_with_k
FROM kx
GROUP BY event_type
"""

RELATIONAL_EXT_QUERIES["f_variant_parse"] = f_variant_parse
RELATIONAL_EXT_ORACLES["f_variant_parse"] = F_VARIANT_SQL


def f_sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDF (``CREATE FUNCTION … RETURN <expr>``) — the
    engine-native equivalent of the reference's dbt MACROS
    (`dw_transformer/macros/ffill_candles.sql`): a named, reusable
    expression that INLINES into the calling plan at analysis time —
    no Python boundary, no codegen break, the plan is byte-identical
    to writing the expression in place (the plan audit shows zero
    Python nodes). This is how shared business logic (the discounted-
    revenue formula every TPC-H query re-derives) gets one definition
    without leaving whole-stage codegen.

    The body keeps the repo's exact-decimal discipline: DECIMAL(28,6)
    return type so the 6-dp product never rounds; one cast to double
    after the SUM.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sdp_disc_revenue(p DOUBLE, d DOUBLE) "
        "RETURNS DECIMAL(28,6) "
        "RETURN CAST(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,4))) "
        "AS DECIMAL(28,6))"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_sqludf_lineitem")
    return spark.sql("""
SELECT l_returnflag,
       CAST(SUM(sdp_disc_revenue(l_extendedprice, l_discount)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM _sqludf_lineitem
GROUP BY l_returnflag
""")


F_SQL_UDF_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""

RELATIONAL_EXT_QUERIES["f_sql_udf_revenue"] = f_sql_udf_revenue
RELATIONAL_EXT_ORACLES["f_sql_udf_revenue"] = F_SQL_UDF_SQL


def f_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL **pipe syntax** (`|>`): the linear dataflow spelling
    of filter → aggregate → having → projection, the engine-native twin
    of a dbt model's staged CTE chain — each stage reads top-to-bottom
    in execution order instead of inside-out. Semantically identical to
    the nested spelling (the oracle is plain ANSI SQL): Catalyst sees
    the same resolved plan, so pushdown/codegen are unchanged.

    The body keeps the exact-decimal revenue discipline; per-group
    averages divide the exact sums once at the end.
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_pipe_lineitem")
    return spark.sql("""
FROM _pipe_lineitem
|> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
   AND l_discount BETWEEN 0.02 AND 0.09
|> EXTEND CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,4))) AS disc_price
|> AGGREGATE COUNT(*) AS n_lines,
             CAST(SUM(disc_price) AS DOUBLE) AS revenue,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
   GROUP BY l_returnflag, l_linestatus
|> WHERE n_lines > 50
|> SELECT l_returnflag, l_linestatus, n_lines, revenue,
          revenue / n_lines AS avg_line_revenue, sum_qty
""")


F_PIPE_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         / COUNT(*) AS avg_line_revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 50
"""

RELATIONAL_EXT_QUERIES["f_pipe_syntax"] = f_pipe_syntax
RELATIONAL_EXT_ORACLES["f_pipe_syntax"] = F_PIPE_SQL


#: the parameterized report's binding — one place, shared by the Spark
#: parameter dict and the oracle literal so they cannot drift
PARAM_QUERY_ARGS = {"min_ship": "1996-03-15", "flag": "R", "min_qty": 25}


def f_param_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers, `spark.sql(...,
    args=...)`) — the engine-native twin of the reference's dbt
    ``var()`` templating (dbt_project.yml vars rendered into model
    SQL): values bind as TYPED literals at parse time, never via string
    interpolation, so a malicious or just weird value (quote, unicode,
    huge number) cannot change the query shape — the injection-safety
    dbt gets from Jinja auto-quoting, done by the parser instead.

    Catalyst folds the bound literals into the plan exactly like
    hand-written constants: same pushdown, same codegen — verified by
    the plan audit (PushedFilters shows the bound shipdate bound).
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_param_lineitem")
    return spark.sql(
        """
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM _param_lineitem
WHERE l_shipdate >= CAST(:min_ship AS TIMESTAMP)
  AND l_returnflag = :flag
  AND l_quantity >= :min_qty
GROUP BY l_returnflag
""",
        args=PARAM_QUERY_ARGS,
    )


F_PARAM_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{PARAM_QUERY_ARGS["min_ship"]}'
  AND l_returnflag = '{PARAM_QUERY_ARGS["flag"]}'
  AND l_quantity >= {PARAM_QUERY_ARGS["min_qty"]}
GROUP BY l_returnflag
"""

RELATIONAL_EXT_QUERIES["f_param_query"] = f_param_query
RELATIONAL_EXT_ORACLES["f_param_query"] = F_PARAM_SQL
