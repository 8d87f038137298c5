"""Spark 4 Python DataSource V2: the market-data fetch as a FIRST-CLASS
``spark.read.format(...)`` source.

The reference's extract layer is a driver-side function call
(`py_pipeline/extract.py:125-131` — yfinance batch download); round 2
re-expressed it as a distributed `mapInPandas` fetch
(`sources/adapters.py:price_history_source`). This module is the third
and most idiomatic form: a registered Python DataSource, so the fetch
participates in Spark's source machinery proper —

    spark.dataSource.register(MarketDataSource)
    spark.read.format("market_prices")
         .option("symbols", "AAPL,MSFT,...")
         .option("start", "2024-01-02").option("end", "2024-02-01")
         .load()

- **Planning**: ``partitions()`` splits the symbol list into
  ≤ ``batch_size`` batches — one InputPartition each, so a 10 000-
  symbol universe fans out across the cluster exactly like the
  reference's 500-symbol chunk loop (`orchestration.py:90-108`), but
  scheduled by Spark instead of a driver for-loop.
- **Execution**: each partition's ``read()`` yields plain tuples;
  Spark applies the declared schema. ``mode=synthetic`` (default here)
  generates deterministic vendor-shaped bars — md5-seeded walk per
  (symbol, day), weekdays only, so tests are hermetic and repeatable;
  ``mode=live`` imports yfinance on the executor (documented blocker:
  not installed in this container).
- **Scale note**: a real deployment adds rate limiting per partition
  and maps vendor pagination into multiple partitions per symbol
  range; the partition-per-batch shape is already the right unit — no
  driver-side fetch loop, no single-executor hotspot.
"""

from __future__ import annotations

import datetime as dt
import hashlib

try:  # pragma: no cover - import guard mirrors the optional families
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAVE_DSV2 = True
except ImportError:  # Spark < 4
    HAVE_DSV2 = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


PRICE_SCHEMA = (
    "date_stamp date, symbol string, open double, high double, "
    "low double, close double, volume double"
)


def _synthetic_bar(symbol: str, day: dt.date) -> tuple:
    """Deterministic vendor-shaped OHLCV bar: md5-seeded so any
    executor (or test) regenerates the identical bar with no state."""
    h = hashlib.md5(f"{symbol}:{day.isoformat()}".encode()).hexdigest()
    base = 20.0 + (int(h[:8], 16) % 100_000) / 500.0  # 20.00 .. 220.00
    spread = (int(h[8:12], 16) % 400) / 100.0  # 0.00 .. 4.00
    drift = ((int(h[12:16], 16) % 200) - 100) / 100.0  # -1.00 .. 1.00
    o = round(base, 2)
    c = round(base + drift, 2)
    hi = round(max(o, c) + spread, 2)
    lo = round(max(0.01, min(o, c) - spread), 2)
    vol = float(1_000 + int(h[16:22], 16) % 5_000_000)
    return (day, symbol, o, hi, lo, c, vol)


class _SymbolBatch(InputPartition):
    def __init__(self, symbols: list[str]):
        self.symbols = symbols


class MarketDataReader(DataSourceReader):
    def __init__(self, options):
        self.symbols = [
            s.strip() for s in options.get("symbols", "").split(",") if s.strip()
        ]
        if not self.symbols:
            raise ValueError("market_prices: non-empty `symbols` option required")
        self.start = dt.date.fromisoformat(options.get("start", "2024-01-02"))
        self.end = dt.date.fromisoformat(options.get("end", "2024-01-31"))
        self.batch_size = int(options.get("batch_size", "500"))
        self.mode = options.get("mode", "synthetic")

    def partitions(self):
        b = self.batch_size
        return [
            _SymbolBatch(self.symbols[i : i + b])
            for i in range(0, len(self.symbols), b)
        ]

    def read(self, partition: _SymbolBatch):
        if self.mode == "live":  # pragma: no cover - no vendor here
            yield from self._read_live(partition.symbols)
            return
        day = self.start
        while day <= self.end:
            if day.weekday() < 5:  # trading days only, like the vendor
                for sym in partition.symbols:
                    yield _synthetic_bar(sym, day)
            day += dt.timedelta(days=1)

    def _read_live(self, symbols):  # pragma: no cover
        from securities_data_pipeline_spark.sources.adapters import (
            _default_downloader,
            wide_bars_to_long,
        )

        long = wide_bars_to_long(
            _default_downloader(symbols, self.start, self.end), symbols
        )
        for row in long.itertuples(index=False):
            yield tuple(row)


class MarketDataSource(DataSource):
    """``spark.read.format("market_prices")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "market_prices"

    def schema(self) -> str:
        return PRICE_SCHEMA

    def reader(self, schema) -> MarketDataReader:
        return MarketDataReader(self.options)


def register_market_source(spark) -> bool:
    """Register the source on a session; returns False on Spark < 4."""
    if not HAVE_DSV2:
        return False
    spark.dataSource.register(MarketDataSource)
    return True


class MarketTicksStreamReader(
    SimpleDataSourceStreamReader if HAVE_DSV2 else object  # type: ignore[misc]
):
    """Offset = {"day_index": n} (trading days consumed so far), so a
    checkpoint restart resumes mid-range exactly-once. ``read(start)``
    honors the Simple-reader contract — return ALL data available past
    the start offset — so an AvailableNow run drains the whole range
    in one batch; ``max_days_per_poll`` caps a poll to simulate a
    paced live feed (each continuous-trigger micro-batch then advances
    that many days). A real feed replaces the synthetic generator with
    the vendor poll and keeps the identical monotone-cursor contract."""

    def __init__(self, options):
        self.inner = MarketDataReader(options)
        self.per_poll = int(options.get("max_days_per_poll", "0"))  # 0 = all
        self.days = []
        d = self.inner.start
        while d <= self.inner.end:
            if d.weekday() < 5:
                self.days.append(d)
            d += dt.timedelta(days=1)

    def initialOffset(self) -> dict:
        return {"day_index": 0}

    def read(self, start: dict):
        i = int(start["day_index"])
        if i >= len(self.days):
            return iter(()), start
        j = len(self.days) if self.per_poll <= 0 else min(i + self.per_poll, len(self.days))
        rows = [
            _synthetic_bar(s, day)
            for day in self.days[i:j]
            for s in self.inner.symbols
        ]
        return iter(rows), {"day_index": j}

    def commit(self, end: dict) -> None:
        pass


class MarketTicksSource(DataSource):
    """``spark.readStream.format("market_ticks")`` — the streaming
    face of ``MarketDataSource``: same schema, same deterministic
    synthetic bars, delivered one trading day per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "market_ticks"

    def schema(self) -> str:
        return PRICE_SCHEMA

    def simpleStreamReader(self, schema) -> "MarketTicksStreamReader":
        return MarketTicksStreamReader(self.options)


def register_market_ticks(spark) -> bool:
    if not HAVE_DSV2:
        return False
    spark.dataSource.register(MarketTicksSource)
    return True
