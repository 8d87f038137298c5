"""OHLCV candle functions — the forward-fill macro as a Column builder.

Reference: ``dw_transformer/macros/ffill_candles.sql:1-19`` (a Jinja SQL
macro). Here it is a plain Python function returning Columns — no UDF,
pure built-ins, so the whole expression stays inside whole-stage
codegen.

**Exact semantics, pinned by the reference's dbt unit tests
(dw_transformer/models/properties.yml:172-199):**

- For each of open/high/low/close: if NULL, fill with
  ``last_value(close) OVER (PARTITION BY key ORDER BY date_stamp ROWS
  BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`` — **no IGNORE
  NULLS**. The fill source is the *immediately previous row's raw
  close* (which may itself be NULL ⇒ the 2nd day of a multi-day gap
  stays NULL). ``F.last(..., ignorenulls=False)`` reproduces this
  bit-for-bit; ``ignorenulls=True`` would NOT.
- The fill source is always ``close`` (never the same column).
- volume NULL → literal 0 (``ffill_candles.sql:18``), not last volume.

Scale: all four fills share one (partitionBy symbol, orderBy
date_stamp) window spec ⇒ Catalyst plans a single shuffle + sort and
evaluates every fill in the same Window physical node.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

OHLC = ("open", "high", "low", "close")


def ffill_candles(partition_col: str = "symbol", order_col: str = "date_stamp") -> list[Column]:
    """Columns replicating the ``ffill_candles`` macro over a table with
    open/high/low/close/volume."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_close = F.last("close", ignorenulls=False).over(w)
    cols = [
        F.when(F.col(c).isNull(), prev_close).otherwise(F.col(c)).alias(c) for c in OHLC
    ]
    cols.append(
        F.when(F.col("volume").isNull(), F.lit(0)).otherwise(F.col("volume")).cast("long").alias("volume")
    )
    return cols


def round_prices(column: str, scale: int) -> Column:
    """``round(cast(x as decimal), n)`` parity.

    Postgres bare ``decimal`` is unlimited-precision numeric; Spark's
    bare ``cast("decimal")`` is decimal(10,0) and would drop the
    fraction (SURVEY §1.2 gotcha). Route through a wide decimal, round
    half-up (Spark ROUND == Postgres numeric rounding for positives),
    emit double.
    """
    return F.round(F.col(column).cast("decimal(38,12)"), scale).cast("double").alias(column)


def fx_price_precision(column: str) -> Column:
    """FX staging precision branch (stg_fx_prices.sql:3-20): USDJPY
    rounds to 3 dp, every other pair to 5 dp."""
    return (
        F.when(
            F.col("symbol") == "USDJPY",
            F.round(F.col(column).cast("decimal(38,12)"), 3),
        )
        .otherwise(F.round(F.col(column).cast("decimal(38,12)"), 5))
        .cast("double")
        .alias(column)
    )
