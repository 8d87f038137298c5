"""Merge-sink semantics: idempotent PK upsert, update-wins, replace
(reference: py_pipeline/load.py + tests/load_test.py:92-157,207-265)."""

import datetime as dt

from securities_data_pipeline_spark.load import dedupe_on_keys, load_fx_symbols, load_prices

D = dt.date
PRICE_SCHEMA = (
    "date_stamp date, symbol string, open double, high double, low double, close double, volume long"
)


def _prices(spark, rows):
    return spark.createDataFrame(rows, PRICE_SCHEMA)


def _read(spark, path):
    return {
        (r.date_stamp, r.symbol): r for r in spark.read.parquet(path).collect()
    }


def test_initial_load_then_idempotent_remerge(spark, tmp_path):
    path = str(tmp_path / "prices")
    batch = _prices(
        spark,
        [
            (D(2025, 1, 1), "AAA", 1.0, 1.0, 1.0, 1.0, 10),
            (D(2025, 1, 1), "BBB", 2.0, 2.0, 2.0, 2.0, 20),
        ],
    )
    load_prices(spark, batch, path)
    assert len(_read(spark, path)) == 2
    # re-loading the identical batch leaves the table unchanged
    load_prices(spark, batch, path)
    out = _read(spark, path)
    assert len(out) == 2
    assert out[(D(2025, 1, 1), "AAA")].close == 1.0


def test_update_wins_and_new_rows_insert(spark, tmp_path):
    path = str(tmp_path / "prices")
    initial = _prices(
        spark,
        [
            (D(2025, 1, 1), "AAA", 1.0, 1.0, 1.0, 1.0, 10),
            (D(2025, 1, 1), "BBB", 2.0, 2.0, 2.0, 2.0, 20),
        ],
    )
    load_prices(spark, initial, path)
    update = _prices(
        spark,
        [
            (D(2025, 1, 1), "AAA", 9.0, 9.0, 9.0, 9.0, 90),  # PK match → update
            (D(2025, 1, 2), "AAA", 3.0, 3.0, 3.0, 3.0, 30),  # new partition → insert
        ],
    )
    load_prices(spark, update, path)
    out = _read(spark, path)
    assert len(out) == 3
    assert out[(D(2025, 1, 1), "AAA")].close == 9.0
    assert out[(D(2025, 1, 1), "BBB")].close == 2.0  # untouched survivor
    assert out[(D(2025, 1, 2), "AAA")].close == 3.0


def test_merge_does_not_touch_other_partitions(spark, tmp_path):
    """Dynamic partition overwrite: a batch for day 2 must leave day 1
    rows intact without rewriting them."""
    path = str(tmp_path / "prices")
    load_prices(spark, _prices(spark, [(D(2025, 1, 1), "AAA", 1.0, 1.0, 1.0, 1.0, 10)]), path)
    load_prices(spark, _prices(spark, [(D(2025, 1, 2), "BBB", 2.0, 2.0, 2.0, 2.0, 20)]), path)
    out = _read(spark, path)
    assert len(out) == 2
    assert out[(D(2025, 1, 1), "AAA")].volume == 10


def test_incoming_duplicate_pks_are_deduped(spark):
    """dlt tolerates in-batch duplicate PKs; MERGE must see exactly one
    row per key (SURVEY §7 risk #4) — kept deterministically."""
    df = _prices(
        spark,
        [
            (D(2025, 1, 1), "AAA", 1.0, 1.0, 1.0, 1.0, 10),
            (D(2025, 1, 1), "AAA", 2.0, 2.0, 2.0, 2.0, 20),
        ],
    )
    out = dedupe_on_keys(df, ["date_stamp", "symbol"]).collect()
    assert len(out) == 1
    assert out[0].close == 2.0  # deterministic: max by remaining cols


def test_fx_symbols_replace(spark, tmp_path):
    path = str(tmp_path / "fx_symbols")
    load_fx_symbols(spark, spark.createDataFrame([("EURUSD=X",), ("JPY=X",)], "symbol string"), path)
    load_fx_symbols(spark, spark.createDataFrame([("GBPUSD=X",)], "symbol string"), path)
    got = {r.symbol for r in spark.read.parquet(path).collect()}
    assert got == {"GBPUSD=X"}  # replace, not merge (load.py:52-53)
