"""The securities staging pipeline as an oracle-gated query.

The star-schema models (plans/models.py) run on securities-shaped
inputs, which the driver's correctness gate can't feed directly — so
this module derives a daily OHLCV bar table *from the events table*
(symbol ← user_id, one bar per user-day, gaps injected deterministically
on every 5th day-of-month) and pushes it through the REAL staging
pipeline: round-to-2dp **then** forward-fill with the reference's
no-IGNORE-NULLS semantics (dw_transformer/models/staging/
stg_stock_prices.sql + macros/ffill_candles.sql). The DuckDB oracle
spells out the identical arithmetic, so the flagship parity path is
hash-checked end-to-end on every round, not just unit-tested.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_data_pipeline_spark.plans.models import stg_stock_prices
from securities_data_pipeline_spark.sources.tables import table


def _derived_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → raw daily bars with injected null gaps."""
    ev = table(spark, sf_dir, "events")
    bars = (
        ev.groupBy(
            F.to_date("ts").alias("date_stamp"),
            F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
        )
        .agg(
            F.min("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            (F.sum(F.col("value").cast("decimal(18,4)")) / F.count(F.lit(1)))
            .cast("double")
            .alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        )
    )
    gap = F.dayofmonth("date_stamp") % 5 == 0
    null_d = F.lit(None).cast("double")
    return bars.select(
        "date_stamp",
        "symbol",
        *[F.when(gap, null_d).otherwise(F.col(c)).alias(c) for c in ("open", "high", "low", "close")],
        F.when(gap, F.lit(None).cast("long")).otherwise(F.col("volume")).alias("volume"),
    )


def sec_stg_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived bars → the real stg_stock_prices model (round 2 dp →
    ffill from previous rounded close, volume null → 0)."""
    return stg_stock_prices(_derived_bars(spark, sf_dir))


SEC_STG_FFILL_SQL = """
WITH bars AS (
  SELECT CAST(ts AS DATE) AS date_stamp,
         'U' || CAST(user_id AS VARCHAR) AS symbol,
         MIN(value) AS open,
         MAX(value) AS high,
         MIN(value) AS low,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE) AS close,
         COUNT(*) AS volume
  FROM events
  GROUP BY 1, 2
), gapped AS (
  SELECT date_stamp, symbol,
         CASE WHEN dayofmonth(date_stamp) % 5 = 0 THEN NULL ELSE open END AS open,
         CASE WHEN dayofmonth(date_stamp) % 5 = 0 THEN NULL ELSE high END AS high,
         CASE WHEN dayofmonth(date_stamp) % 5 = 0 THEN NULL ELSE low END AS low,
         CASE WHEN dayofmonth(date_stamp) % 5 = 0 THEN NULL ELSE close END AS close,
         CASE WHEN dayofmonth(date_stamp) % 5 = 0 THEN NULL ELSE volume END AS volume
  FROM bars
), base_ AS (
  SELECT date_stamp, symbol,
         CAST(round(CAST(open  AS DECIMAL(38,12)), 2) AS DOUBLE) AS open,
         CAST(round(CAST(high  AS DECIMAL(38,12)), 2) AS DOUBLE) AS high,
         CAST(round(CAST(low   AS DECIMAL(38,12)), 2) AS DOUBLE) AS low,
         CAST(round(CAST(close AS DECIMAL(38,12)), 2) AS DOUBLE) AS close,
         CAST(volume AS BIGINT) AS volume
  FROM gapped
)
SELECT date_stamp, symbol,
  CASE WHEN open IS NULL THEN last_value(close) OVER w ELSE open END AS open,
  CASE WHEN high IS NULL THEN last_value(close) OVER w ELSE high END AS high,
  CASE WHEN low  IS NULL THEN last_value(close) OVER w ELSE low  END AS low,
  CASE WHEN close IS NULL THEN last_value(close) OVER w ELSE close END AS close,
  CAST(CASE WHEN volume IS NULL THEN 0 ELSE volume END AS BIGINT) AS volume
FROM base_
WINDOW w AS (PARTITION BY symbol ORDER BY date_stamp
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


SECURITIES_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sec_stg_ffill": sec_stg_ffill,
}

SECURITIES_ORACLES: dict[str, str] = {
    "sec_stg_ffill": SEC_STG_FFILL_SQL,
}
