"""Statistical-analytics query surface: single-pass moment statistics
(corr / regression), time-interval RANGE windows, and array
higher-order-function vector statistics.

The reference computes no statistics beyond window forward-fill
(dw_transformer/macros/ffill_candles.sql:1-19), but its star schema
exists to be analyzed — correlation/beta of price series and rolling
interval aggregates are the first queries an analyst runs on
`fct_prices` (README.md:131-133's Metabase dashboard). These generalize
that surface onto the driver's tables.

Cross-engine float determinism: native `corr`/`covar`/`stddev`
aggregates are order-dependent double sums — never hash-stable across
engines. Every statistic here is instead derived from EXACT decimal
moment sums (n, Σx, Σy, Σx², Σy², Σxy) accumulated in one pass, with
the closed-form combination done in double at the very end with an
identical operation order in both engines.

Scale notes (100 TB):
- moment aggregation is a plain groupBy().agg() — partial (map-side)
  combine, ONE exchange of six numbers per group, and adding a new
  statistic costs zero extra passes;
- the interval RANGE window shuffles once on the series key (the key
  production data is clustered by) and sorts within partitions;
  frame peers are defined by event-time so the result is independent
  of intra-key row order;
- vector stats are narrow per-row projections (scan speed, no Python,
  no shuffle): fold order is fixed left-to-right in both engines
  (`F.aggregate` ↔ `list_aggregate`), so even float addition is
  bit-reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_data_pipeline_spark.sources.tables import table

DEC2 = "decimal(18,2)"


def _dec2(c: str):
    return F.col(c).cast(DEC2)


# ---------------------------------------------------------------------------
# single-pass moment statistics


def a8_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag correlation and least-squares regression of line
    quantity vs extended price, from one pass of exact decimal moments.

    corr = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²) / √(nΣy²−(Σy)²)
    slope = (nΣxy − ΣxΣy) / (nΣx²−(Σx)²); intercept = (Σy − slope·Σx)/n

    The double-precision combination happens once per GROUP (not per
    row), in the same operation order as the oracle, so results are
    bit-identical across engines.
    """
    li = table(spark, sf_dir, "lineitem")
    x, y = _dec2("l_quantity"), _dec2("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = nd * sxy - sx * sy
    var_x_n = nd * sxx - sx * sx
    var_y_n = nd * syy - sy * sy
    slope = cov_n / var_x_n
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(cov_n / F.sqrt(var_x_n) / F.sqrt(var_y_n), 6).alias("corr_qty_price"),
        F.round(slope, 6).alias("beta"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
    )


A8_SQL = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
         AS corr_qty_price,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS beta,
       round((CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM m
"""


# ---------------------------------------------------------------------------
# time-interval RANGE window

_WEEK_US = 7 * 24 * 3600 * 1_000_000  # range frame bound in event-time µs


def w7_interval_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day rolling sum/count — a RANGE window whose
    frame is defined by event time (µs), not row position, so duplicate
    timestamps are frame peers and the result is order-independent.

    The rolling sum accumulates exact decimals inside the frame. One
    shuffle on user_id; at 100 TB the partition key is the natural
    series key the lake is clustered by.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_WEEK_US, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("roll_sum_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n_7d"),
    )


W7_SQL = f"""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS roll_sum_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS roll_n_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_WEEK_US} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# array higher-order-function vector statistics


def f_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector statistics over the embedding column via higher-order
    functions only — dimensionality, L2 norm, max |x|, positive count.

    Pure narrow projection: no shuffle, no Python, whole-stage codegen.
    The L2 fold is left-to-right in both engines (`F.aggregate` ↔
    `list_aggregate('sum')`), so the float accumulation is
    bit-reproducible.
    """
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    sumsq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.sqrt(sumsq), 6).alias("l2_norm"),
        F.round(F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))), 6).alias(
            "max_abs"
        ),
        F.size(F.filter(v, lambda x: x > F.lit(0.0))).alias("n_pos"),
    )


F_ARRAY_STATS_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_aggregate(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           'sum')), 6) AS l2_norm,
       round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs,
       len(list_filter(embedding, x -> x > 0.0)) AS n_pos
FROM embeddings
"""


ANALYTICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "a8_corr_moments": a8_corr_moments,
    "w7_interval_range": w7_interval_range,
    "f_array_stats": f_array_stats,
}

ANALYTICS_ORACLES: dict[str, str] = {
    "a8_corr_moments": A8_SQL,
    "w7_interval_range": W7_SQL,
    "f_array_stats": F_ARRAY_STATS_SQL,
}
