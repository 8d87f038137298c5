"""Golden forward-fill semantics — the reference's dbt unit tests
(dw_transformer/models/properties.yml:172-199, FIXTURES.md §6) plus the
multi-day-gap extension case implied by the no-IGNORE-NULLS frame."""

import datetime as dt

import pytest

from securities_data_pipeline_spark.plans.models import stg_fx_prices, stg_stock_prices

D = dt.date


def _raw(spark, rows):
    return spark.createDataFrame(
        rows, "date_stamp date, symbol string, open double, high double, low double, close double, volume long"
    )


def test_stock_one_day_gap_fills_from_prev_close(spark):
    """FIXTURES §6: day-2 all-null → OHLC ← prev close, volume ← 0."""
    raw = _raw(
        spark,
        [
            (D(2025, 1, 1), "S1", 100.004, 102.045, 99.981, 100.008, 1000),
            (D(2025, 1, 2), "S1", None, None, None, None, None),
        ],
    )
    out = {(r.date_stamp): r for r in stg_stock_prices(raw).collect()}
    r1, r2 = out[D(2025, 1, 1)], out[D(2025, 1, 2)]
    assert (r1.open, r1.high, r1.low, r1.close, r1.volume) == (100.0, 102.05, 99.98, 100.01, 1000)
    assert (r2.open, r2.high, r2.low, r2.close, r2.volume) == (100.01, 100.01, 100.01, 100.01, 0)


def test_multi_day_gap_second_day_stays_null(spark):
    """No IGNORE NULLS: fill source is the immediately previous row's
    raw close, so the 2nd consecutive null day stays null."""
    raw = _raw(
        spark,
        [
            (D(2025, 1, 1), "S1", 10.0, 11.0, 9.0, 10.5, 100),
            (D(2025, 1, 2), "S1", None, None, None, None, None),
            (D(2025, 1, 3), "S1", None, None, None, None, None),
        ],
    )
    out = {r.date_stamp: r for r in stg_stock_prices(raw).collect()}
    assert out[D(2025, 1, 2)].close == 10.5
    assert out[D(2025, 1, 3)].close is None
    assert out[D(2025, 1, 3)].volume == 0


def test_partial_null_row_fills_only_null_fields(spark):
    """Each OHLC field fills independently; fill source is always the
    previous close, never the same column."""
    raw = _raw(
        spark,
        [
            (D(2025, 1, 1), "S1", 10.0, 11.0, 9.0, 10.5, 100),
            (D(2025, 1, 2), "S1", None, 12.0, None, 11.0, 50),
        ],
    )
    r2 = {r.date_stamp: r for r in stg_stock_prices(raw).collect()}[D(2025, 1, 2)]
    assert (r2.open, r2.high, r2.low, r2.close, r2.volume) == (10.5, 12.0, 10.5, 11.0, 50)


def test_fill_happens_per_symbol(spark):
    """Window partitions by symbol — S2's gap must not see S1's close."""
    raw = _raw(
        spark,
        [
            (D(2025, 1, 1), "S1", 10.0, 10.0, 10.0, 10.0, 1),
            (D(2025, 1, 2), "S2", None, None, None, None, None),
        ],
    )
    out = {r.symbol: r for r in stg_stock_prices(raw).collect()}
    assert out["S2"].close is None


@pytest.mark.parametrize(
    "symbol,raw_close,expected",
    [("EURUSD", 1.1234567, 1.12346), ("USDJPY", 151.23456, 151.235)],
)
def test_fx_precision_branches(spark, symbol, raw_close, expected):
    """stg_fx_prices.sql: USDJPY → 3 dp, others → 5 dp."""
    raw = _raw(spark, [(D(2025, 1, 1), symbol, raw_close, raw_close, raw_close, raw_close, 0)])
    r = stg_fx_prices(raw).collect()[0]
    assert r.close == expected


def test_fx_gap_fills_with_rounded_close(spark):
    """Rounding happens in base_ *before* ffill — the gap day gets the
    rounded previous close, not the raw one."""
    raw = _raw(
        spark,
        [
            (D(2025, 1, 1), "EURUSD", 1.0, 1.0, 1.0, 1.1234567, 0),
            (D(2025, 1, 2), "EURUSD", None, None, None, None, None),
        ],
    )
    out = {r.date_stamp: r for r in stg_fx_prices(raw).collect()}
    assert out[D(2025, 1, 2)].close == 1.12346
