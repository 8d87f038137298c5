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


# ---------------------------------------------------------------------------
# S2/S4 live-source adapters (sources/adapters.py), network-mocked the same
# way the reference mocks them (tests/extract_test.py): the transport is
# injected with the public library's exact call shape.


def _fake_read_html(url: str):
    """pd.read_html-shaped: returns a list of tables per URL; each index
    page carries one extra column the others lack (exercises the
    outer-union)."""
    n = 400 if "400" in url else 500 if "500" in url else 600
    t = pd.DataFrame(
        {
            "Symbol": [f"{n}A", f"{n}B"],
            "Security": [f"Co {n}A", f"Co {n}B"],
            f"only_{n}": [1, 2],
        }
    )
    return [t, pd.DataFrame({"ignored": [0]})]  # page has trailing tables


def test_sp_stock_symbols_adapter_union_and_flags(spark):
    from securities_data_pipeline_spark.sources.adapters import sp_stock_symbols_source

    df = sp_stock_symbols_source(spark, read_html=_fake_read_html)
    rows = {r.Symbol: r for r in df.collect()}
    assert len(rows) == 6  # 2 symbols × 3 indices
    assert rows["400A"].in_sp400 and not rows["400A"].in_sp500 and not rows["400A"].in_sp600
    assert rows["500B"].in_sp500 and not rows["500B"].in_sp400
    assert rows["600A"].in_sp600
    # outer-union: per-index columns survive, null elsewhere
    assert rows["400A"].only_400 == 1 and rows["500A"].only_400 is None


def test_sp_stock_symbols_via_registry_dispatch(spark):
    out = extract(spark, "symbols", "sp_stocks", read_html=_fake_read_html)
    assert out.count() == 6


def test_price_history_adapter_long_rows_and_failed_symbols(spark):
    from securities_data_pipeline_spark.sources.adapters import failed_symbols

    # yf.download-shaped: wide frame, index=Date, MultiIndex columns
    # (Price, Ticker); one symbol returns no data (NaN bars). Defined
    # INSIDE the test so cloudpickle ships it by value to executors
    # (the test module is not importable on workers).
    def _fake_yf_download(symbols, start, end):
        import numpy as np

        dates = pd.to_datetime(["2025-01-01", "2025-01-02"])
        fields = ["Open", "High", "Low", "Close", "Volume"]
        cols = pd.MultiIndex.from_product([fields, symbols], names=["Price", "Ticker"])
        data = {}
        for f_ in fields:
            for s in symbols:
                if s == "DEAD":
                    data[(f_, s)] = [np.nan, np.nan]
                else:
                    base = float(ord(s[0]))
                    data[(f_, s)] = [base + 0.1, base + 0.2]
        return pd.DataFrame(data, index=dates, columns=cols).rename_axis("Date")

    symbols = ["AAA", "BBB", "DEAD"]
    bars = extract(
        spark, "price_history", "sp_stocks",
        symbols=symbols, downloader=_fake_yf_download, batch_size=2,
    )
    rows = {(r.symbol, r.date_stamp.date().isoformat()): r for r in bars.collect()}
    # 2 live symbols × 2 dates; DEAD's all-NaN bars dropped in-batch
    assert len(rows) == 4
    assert rows[("AAA", "2025-01-01")].close == float(ord("A")) + 0.1
    failed = [r.symbol for r in failed_symbols(spark, symbols, bars).collect()]
    assert failed == ["DEAD"]


def test_wide_bars_single_symbol_flat_columns(spark):
    """yf.download with one ticker returns flat columns — the adapter
    must lift them to the MultiIndex form using the batch symbol."""
    from securities_data_pipeline_spark.sources.adapters import wide_bars_to_long

    dates = pd.to_datetime(["2025-01-01"])
    flat = pd.DataFrame(
        {"Open": [1.0], "High": [2.0], "Low": [0.5], "Close": [1.5], "Volume": [10.0]},
        index=dates,
    ).rename_axis("Date")
    long = wide_bars_to_long(flat, ["SOLO"])
    assert list(long["symbol"]) == ["SOLO"] and float(long["close"].iloc[0]) == 1.5


def test_query_registry_contract():
    """Driver-contract invariants the rest of the suite assumes:
    queries and oracles are 1:1, names carry a known family prefix
    (the rotation logic keys on them), and the ordering is identical
    between the two maps (the driver zips them positionally)."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)
    assert list(q) == list(o), "queries() and oracle_sql() order diverged"
    families = (
        "q", "p", "s", "a", "j", "w", "u", "f", "g", "m", "agg",
        "dedup_", "sim_", "sec_", "t_", "mm_", "sq_", "udtf_", "s_stream_",
    )
    bad = [n for n in q if not n.startswith(families)]
    assert not bad, f"unknown family prefixes: {bad}"


def test_round_front_queries_lead_registry_order():
    """The driver samples ~50 queries in registry order; the round's
    new/changed head must actually lead (and every head name must
    exist — a typo would silently drop a query from priority)."""
    import __spark_entry__ as e

    q = e.queries()
    names = list(q)
    head = [n for n in e._NEW_OR_CHANGED if n in q]
    missing = set(e._NEW_OR_CHANGED) - set(q)
    assert not missing, f"front-load names not in registry: {missing}"
    assert names[: len(head)] == head


def test_stale_tail_is_least_recently_green_order():
    """Since r7 the stale tail is COMPUTED from the CORRECTNESS_r*.json
    history (the r6 hand-written tuple drifted from reality): after the
    new/changed head, last-driver-green rounds must be non-decreasing,
    and queries in the driver's ~50 window must include every query
    whose last green round is minimal (nothing maximally stale can hide
    below the window while fresher entries sit inside it)."""
    import __spark_entry__ as e

    q = e.queries()
    names = list(q)
    head = set(e._NEW_OR_CHANGED)
    greens = e._last_green_rounds()
    tail = [n for n in names if n not in head]
    rounds = [greens.get(n, 0) for n in tail]
    assert rounds == sorted(rounds), "stale tail not least-recently-green"
    # the CLI twin must agree with the import-time logic
    import tools.staleness as st

    assert st.last_green_rounds() == greens


def test_driver_window_covers_every_deeply_stale_query():
    """VERDICT r7 item 2: coverage claims must be COMPUTED and
    enforced, not narrated. Two invariants, checked on the live
    registry order so any late-round head addition that would push a
    stale query below the driver window fails here instead of
    silently invalidating the round's changelog claim:

    1. the hand-maintained new/changed head stays within its cap;
    2. every query ≥4 rounds stale (last driver-green ≤ max_round-4,
       never-checked counts as round 0) ranks inside the first
       DRIVER_WINDOW positions of queries() order.
    """
    import __spark_entry__ as e

    assert len(e._NEW_OR_CHANGED) <= e.NEW_OR_CHANGED_CAP, (
        f"new/changed head has {len(e._NEW_OR_CHANGED)} entries; "
        f"cap is {e.NEW_OR_CHANGED_CAP} (VERDICT r7 item 1)"
    )
    greens = e._last_green_rounds()
    max_round = max(greens.values(), default=0)
    threshold = max_round - 4
    order = list(e.queries())
    window = set(order[: e.DRIVER_WINDOW])
    deeply_stale = sorted(
        n for n in order if greens.get(n, 0) <= threshold
    )
    outside = [n for n in deeply_stale if n not in window]
    assert not outside, (
        f"{len(outside)} queries ≥4 rounds stale (last green ≤ "
        f"r{threshold}) rank below the {e.DRIVER_WINDOW}-query driver "
        f"window: {outside} — shrink the new/changed head"
    )
