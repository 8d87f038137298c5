"""Warehouse star-schema models — the dbt project as DataFrame functions.

Each model mirrors one file under ``dw_transformer/models/``:

- ``stg_stock_prices``  ← staging/stg_stock_prices.sql (round 2 dp →
  ffill)
- ``stg_fx_prices``     ← staging/stg_fx_prices.sql (round 5 dp / 3 dp
  for USDJPY → ffill)
- ``stg_stock_symbols`` ← staging/stg_stock_symbols.sql
- ``stg_fx_symbols``    ← staging/stg_fx_symbols.sql (dimension rows
  *derived from the fact* via SELECT DISTINCT symbol)
- ``dim_symbols``       ← core/dim_symbols.sql (UNION ALL)
- ``fct_prices``        ← core/fct_prices.sql (UNION ALL)

Ordering parity matters: rounding happens in the ``base_`` CTE *before*
the forward-fill, so gaps fill with the **rounded** previous close.
dbt unions positionally; here every branch projects an explicit aligned
column list and unions by name (SURVEY §7 risk #5).

Scale: the only shuffle in the whole DAG is the per-symbol window sort
inside ffill. ``register_views`` exposes each model for Spark SQL —
the engine's answer to dbt's view materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_data_pipeline_spark.functions.candles import (
    OHLC,
    ffill_candles,
    fx_price_precision,
    round_prices,
)


def stg_stock_prices(raw_stock_prices: DataFrame) -> DataFrame:
    """staging/stg_stock_prices.sql: cast + round(2) then ffill."""
    base = raw_stock_prices.select(
        F.col("date_stamp").cast("date").alias("date_stamp"),
        "symbol",
        *[round_prices(c, 2) for c in OHLC],
        F.col("volume").cast("long").alias("volume"),
    )
    return base.select("date_stamp", "symbol", *ffill_candles("symbol"))


def stg_fx_prices(raw_fx_prices: DataFrame) -> DataFrame:
    """staging/stg_fx_prices.sql: per-symbol precision (USDJPY 3 dp,
    else 5 dp) then ffill."""
    base = raw_fx_prices.select(
        F.col("date_stamp").cast("date").alias("date_stamp"),
        "symbol",
        *[fx_price_precision(c) for c in OHLC],
        F.col("volume").cast("long").alias("volume"),
    )
    return base.select("date_stamp", "symbol", *ffill_candles("symbol"))


def stg_stock_symbols(raw_stock_symbols: DataFrame) -> DataFrame:
    """staging/stg_stock_symbols.sql: project + tag asset_type."""
    return raw_stock_symbols.select(
        "symbol",
        "name",
        "sector",
        "industry",
        F.lit("Stock").alias("asset_type"),
        "in_sp400",
        "in_sp500",
        "in_sp600",
        F.col("date_stamp").cast("date").alias("date_stamp"),
    )


def stg_fx_symbols(raw_fx_prices: DataFrame) -> DataFrame:
    """staging/stg_fx_symbols.sql: FX dimension derived from the fact
    (SELECT DISTINCT symbol) with typed NULL/constant padding."""
    return raw_fx_prices.select("symbol").distinct().select(
        "symbol",
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("sector"),
        F.lit(None).cast("string").alias("industry"),
        F.lit("FX").alias("asset_type"),
        F.lit(False).alias("in_sp400"),
        F.lit(False).alias("in_sp500"),
        F.lit(False).alias("in_sp600"),
        F.lit(None).cast("date").alias("date_stamp"),
    )


def dim_symbols(stg_fx_symbols_df: DataFrame, stg_stock_symbols_df: DataFrame) -> DataFrame:
    """core/dim_symbols.sql: FX ∪ stock symbol rows."""
    return stg_fx_symbols_df.unionByName(stg_stock_symbols_df)


def fct_prices(stg_fx_prices_df: DataFrame, stg_stock_prices_df: DataFrame) -> DataFrame:
    """core/fct_prices.sql: FX ∪ stock ffilled prices."""
    cols = ["date_stamp", "symbol", "open", "high", "low", "close", "volume"]
    return stg_fx_prices_df.select(*cols).unionByName(stg_stock_prices_df.select(*cols))


def build_star_schema(
    raw_fx_prices: DataFrame,
    raw_stock_prices: DataFrame,
    raw_stock_symbols: DataFrame,
) -> dict[str, DataFrame]:
    """Run the full model DAG (the ``dbt run`` step,
    py_pipeline/orchestration.py:273) and return every model."""
    m: dict[str, DataFrame] = {}
    m["stg_fx_prices"] = stg_fx_prices(raw_fx_prices)
    m["stg_stock_prices"] = stg_stock_prices(raw_stock_prices)
    m["stg_fx_symbols"] = stg_fx_symbols(raw_fx_prices)
    m["stg_stock_symbols"] = stg_stock_symbols(raw_stock_symbols)
    m["dim_symbols"] = dim_symbols(m["stg_fx_symbols"], m["stg_stock_symbols"])
    m["fct_prices"] = fct_prices(m["stg_fx_prices"], m["stg_stock_prices"])
    return m


def register_views(spark: SparkSession, models: dict[str, DataFrame]) -> None:
    """Expose models as temp views (dbt's default view
    materialization, dbt_project.yml:32-37)."""
    for name, df in models.items():
        df.createOrReplaceTempView(name)
