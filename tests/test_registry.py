"""Source registry dispatch + distributed partitioned fetch (the Spark
replacement for the reference's 500-symbol chunk loop)."""

import pandas as pd
import pytest

from securities_data_pipeline_spark.sources.registry import (
    FX_PAIRS,
    extract,
    fetch_prices_distributed,
    register_source,
)


def test_fx_inline_source_and_dispatch(spark):
    df = extract(spark, "symbols", "fx")
    assert [r.Symbol for r in df.collect()] == list(FX_PAIRS)
    with pytest.raises(ValueError, match="Unknown source"):
        extract(spark, "symbols", "bonds")


def test_register_custom_source(spark):
    register_source("symbols", "custom", lambda s, **kw: s.createDataFrame([("Z",)], "Symbol string"))
    assert extract(spark, "symbols", "custom").first().Symbol == "Z"


def test_fetch_prices_distributed(spark):
    """Executor-side batch fetch: each partition's symbol list goes to
    the adapter once; results concatenate into one long DataFrame."""
    symbols = [f"S{i}" for i in range(10)]

    def fake_fetch(batch: list[str]) -> pd.DataFrame:
        return pd.DataFrame(
            {"symbol": batch, "close": [float(s[1:]) for s in batch], "n_in_batch": len(batch)}
        )

    out = fetch_prices_distributed(
        spark, symbols, fake_fetch, schema="symbol string, close double, n_in_batch int",
        batch_size=4,
    )
    rows = {r.symbol: r for r in out.collect()}
    assert set(rows) == set(symbols)
    assert rows["S7"].close == 7.0
    # 10 symbols / batch_size 4 → 3 partitions; every batch bounded
    assert all(r.n_in_batch <= 4 for r in rows.values())
