"""Pluggable source registry — the extractor dispatch layer.

Reference: ``py_pipeline/extract.py:16-39`` routes
``(dataset, asset_category, source)`` to a concrete extractor
(Wikipedia scrape, yfinance batch download, inline FX list, Delta
read-back). Here sources are registered callables returning DataFrames,
so tests plug in parquet/fixture sources exactly like the reference's
mocked tests, and production plugs in real web adapters.

The two web sources (Wikipedia constituents scrape, market-data API)
are *driver-side* fetches for ~1,500 symbols — at that size a driver
fetch + ``spark.createDataFrame`` is correct. For much larger symbol
universes the scale path is ``fetch_prices_distributed``: partition the
symbol list and fetch per-partition on executors via ``mapInPandas``
(the Spark analog of the reference's 500-symbol chunking,
py_pipeline/orchestration.py:90-101).

The 7 FX pairs (py_pipeline/extract.py:67-77) are an inline literal
source.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

SourceFn = Callable[..., DataFrame]

_REGISTRY: dict[tuple[str, str], SourceFn] = {}

#: the 7 major FX pairs, as listed inline at py_pipeline/extract.py:68-76
FX_PAIRS = (
    "EURUSD=X",
    "GBPUSD=X",
    "AUDUSD=X",
    "NZDUSD=X",
    "JPY=X",
    "CHF=X",
    "CAD=X",
)


def register_source(dataset: str, asset_category: str, fn: SourceFn) -> None:
    _REGISTRY[(dataset, asset_category)] = fn


def get_source(dataset: str, asset_category: str) -> SourceFn:
    try:
        return _REGISTRY[(dataset, asset_category)]
    except KeyError:
        raise ValueError(f"Unknown source: ({dataset}, {asset_category})") from None


def extract(spark: SparkSession, dataset: str, asset_category: str, **kwargs) -> DataFrame:
    """Dispatcher scan (extract.py:16-39)."""
    return get_source(dataset, asset_category)(spark, **kwargs)


def fx_symbols_source(spark: SparkSession, **_) -> DataFrame:
    """Inline literal source (extract.py:67-77)."""
    return spark.createDataFrame([(s,) for s in FX_PAIRS], "Symbol string")


register_source("symbols", "fx", fx_symbols_source)


def fetch_prices_distributed(
    spark: SparkSession,
    symbols: list[str],
    fetch_batch: Callable[[list[str]], "object"],
    schema: str,
    batch_size: int = 500,
) -> DataFrame:
    """Scale path for market-data extraction: distribute symbol batches
    across executors, fetch per-partition, return one long DataFrame.

    ``fetch_batch(symbols) -> pandas.DataFrame`` is the per-batch
    adapter (yfinance-like). Network fetch happens on executors via
    ``mapInPandas`` — replacing the reference's serial driver-side
    500-symbol chunk loop with parallel partitioned fetch.
    """
    import pandas as pd  # local import: only needed on this path

    n_parts = max(1, (len(symbols) + batch_size - 1) // batch_size)
    sym_df = spark.createDataFrame([(s,) for s in symbols], "symbol string").repartition(
        n_parts
    )

    def fetch(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            if len(pdf):
                yield fetch_batch(pdf["symbol"].tolist())

    return sym_df.mapInPandas(fetch, schema=schema)


def price_history_dsv2_source(
    spark: SparkSession,
    *,
    symbols: list[str] | None = None,
    start_date: str = "2024-01-02",
    end_date: str = "2024-01-31",
    batch_size: int = 500,
    **_,
) -> DataFrame:
    """S4 third form: the market-data fetch as a registered Spark 4
    Python DataSource (``spark.read.format("market_prices")``) — the
    symbol-batch partitioning is planned by Spark's source machinery
    instead of a mapInPandas repartition. See sources/datasource_v2.py.
    """
    from securities_data_pipeline_spark.sources.datasource_v2 import (
        register_market_source,
    )

    if not register_market_source(spark):  # pragma: no cover - Spark < 4
        raise RuntimeError("Python DataSource API requires Spark >= 4")
    return (
        spark.read.format("market_prices")
        .option("symbols", ",".join(symbols or []))
        .option("start", start_date)
        .option("end", end_date)
        .option("batch_size", str(batch_size))
        .load()
    )


register_source("price_history", "dsv2", price_history_dsv2_source)
