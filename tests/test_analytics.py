"""Statistical analytics (plans/analytics) and boilerplate curation
(operators/boilerplate): semantic invariants and physical-plan
assertions at sf0.001. Value parity vs DuckDB is covered by
tools/check_oracle.py at sf0.01."""

import math

from pyspark.sql import functions as F

from securities_data_pipeline_spark.operators.boilerplate import (
    REDACT_MASK,
    REDACT_TERMS,
    chunk_hashes,
    t_chunk_dedup,
    t_redact_terms,
)
from securities_data_pipeline_spark.plans.analytics import (
    a8_corr_moments,
    f_array_stats,
    w7_interval_range,
)
from securities_data_pipeline_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_a8_corr_matches_direct_computation(spark):
    out = {r.l_returnflag: r for r in a8_corr_moments(spark, SF).collect()}
    li = (
        table(spark, SF, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (round(r.l_quantity, 2), round(r.l_extendedprice, 2))
        )
    for flag, pts in by_flag.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        syy = sum(p[1] * p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        corr = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(
            n * syy - sy * sy
        )
        assert out[flag].n == n
        assert abs(out[flag].corr_qty_price - corr) < 1e-4
        # corr of near-independent columns is small but defined
        assert -1.0 <= out[flag].corr_qty_price <= 1.0


def test_a8_single_pass_one_exchange_pair(spark):
    # one groupBy → partial+final aggregate, no join, no extra scan
    plan = _plan(a8_corr_moments(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_w7_rolling_window_semantics(spark):
    out = w7_interval_range(spark, SF).collect()
    ev = table(spark, SF, "events").select("user_id", "event_id", "ts", "value").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    # verify one user end-to-end against a direct O(n²) recompute
    uid = min(by_user, key=lambda u: len(by_user[u]))
    expected = {}
    for r in by_user[uid]:
        frame = [
            e
            for e in by_user[uid]
            if 0 <= (r.ts - e.ts).total_seconds() <= 7 * 86400
        ]
        expected[r.event_id] = (sum(round(e.value, 6) for e in frame), len(frame))
    got = {r.event_id: r for r in out if r.user_id == uid}
    assert set(got) == set(expected)
    for eid, (s, n) in expected.items():
        assert got[eid].roll_n_7d == n
        assert abs(got[eid].roll_sum_7d - s) < 1e-6


def test_w7_single_shuffle(spark):
    plan = _plan(w7_interval_range(spark, SF))
    assert plan.count("Exchange") == 1


def test_f_array_stats_matches_numpy(spark):
    import numpy as np

    out = {r.vec_id: r for r in f_array_stats(spark, SF).collect()}
    emb = table(spark, SF, "embeddings").collect()
    for r in emb[:50]:
        v = np.array(r.embedding, dtype=np.float64)
        assert out[r.vec_id].dim == len(v)
        assert abs(out[r.vec_id].l2_norm - float(np.sqrt((v * v).sum()))) < 1e-5
        assert out[r.vec_id].n_pos == int((v > 0).sum())


def test_f_array_stats_no_shuffle_no_python(spark):
    plan = _plan(f_array_stats(spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_chunk_hashes_identical_for_identical_chunks(spark):
    df = spark.createDataFrame(
        [
            (1, "w0 w1 w2 w3 w4 w5 w6 w7 x0 x1 x2 x3 x4 x5 x6 x7"),
            (2, "w0 w1 w2 w3 w4 w5 w6 w7"),
            (3, "y0 y1"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.ch for r in df.select("doc_id", chunk_hashes().alias("ch")).collect()}
    assert len(out[1]) == 2 and len(out[2]) == 1 and len(out[3]) == 1
    assert out[1][0] == out[2][0]  # shared 8-word chunk → same hash
    assert out[1][1] != out[1][0]


def test_chunk_dedup_shares_bounded(spark):
    out = t_chunk_dedup(spark, SF).collect()
    assert len(out) == table(spark, SF, "documents").count()
    for r in out:
        assert r.n_chunks >= 1
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert abs(r.dup_share - r.n_dup_chunks / r.n_chunks) < 1e-6


def test_redact_masks_all_denylist_terms(spark):
    out = t_redact_terms(spark, SF).collect()
    deny = set(REDACT_TERMS)
    for r in out:
        toks = r.masked_text.split(" ")
        assert not (deny & set(toks))
        assert toks.count(REDACT_MASK) == r.n_masked


def test_redact_is_narrow_projection(spark):
    plan = _plan(t_redact_terms(spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_unigram_logprob_orders_by_fluency(spark):
    from securities_data_pipeline_spark.operators.textops import t_unigram_logprob

    out = {r.doc_id: r for r in t_unigram_logprob(spark, SF).collect()}
    docs = {r.doc_id: r.text for r in table(spark, SF, "documents").collect()}
    assert set(out) == set(docs)
    for r in out.values():
        assert r.avg_logprob < 0  # log of probabilities < 1
        assert r.n_tokens >= 1
    # a document made of the corpus's most common tokens must outscore
    # one made of its rarest: verify via the two extreme documents
    import collections

    cnt = collections.Counter(t for text in docs.values() for t in text.lower().split())
    total = sum(cnt.values())
    import math

    def direct(text):
        toks = [t for t in text.lower().split() if t]
        return sum(round(math.log(cnt[t] / total), 9) for t in toks) / len(toks)

    for doc_id in list(docs)[:20]:
        assert abs(out[doc_id].avg_logprob - round(direct(docs[doc_id]), 6)) < 2e-6


def test_zorder_buckets_bound_both_axes(spark):
    from securities_data_pipeline_spark.plans.maintenance import m_zorder_cluster

    out = m_zorder_cluster(spark, SF).collect()
    assert sum(r.n_rows for r in out) == table(spark, SF, "lineitem").count()
    # bucket = top 6 z-bits = (px, sy) high-3-bit pair → inside one
    # bucket both axes span < 2^5: the locality property clustering
    # exists to provide
    for r in out:
        assert r.max_px - r.min_px <= 31
        assert r.max_sy - r.min_sy <= 31


def test_incremental_rollup_equals_full_recompute(spark):
    from securities_data_pipeline_spark.plans.maintenance import m_incremental_rollup

    got = {
        (str(r.month), r.o_orderpriority): (r.n_orders, r.total_price)
        for r in m_incremental_rollup(spark, SF).collect()
    }
    full = {
        (str(r.month), r.o_orderpriority): (r.n_orders, r.total_price)
        for r in table(spark, SF, "orders")
        .groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .collect()
    }
    assert got == full


def test_incremental_rollup_pushes_disjoint_ranges(spark):
    from securities_data_pipeline_spark.plans.maintenance import m_incremental_rollup

    plan = _plan(m_incremental_rollup(spark, SF))
    assert plan.count("Scan parquet") == 2
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_drawdown_invariants(spark):
    from securities_data_pipeline_spark.plans.securities_demo import sec_drawdown

    out = sec_drawdown(spark, SF).collect()
    by_sym = {}
    for r in sorted(out, key=lambda r: (r.symbol, r.date_stamp)):
        assert r.drawdown <= 0  # price never exceeds its running peak
        assert r.close <= r.peak
        prev = by_sym.get(r.symbol)
        if prev is not None:
            assert r.peak >= prev  # running max is monotone
        by_sym[r.symbol] = r.peak


def test_sma_crossover_alternates(spark):
    from securities_data_pipeline_spark.plans.securities_demo import sec_sma_crossover

    out = sec_sma_crossover(spark, SF).collect()
    by_sym = {}
    for r in sorted(out, key=lambda r: (r.symbol, r.date_stamp)):
        by_sym.setdefault(r.symbol, []).append(r.cross)
    assert by_sym  # signals exist on this corpus
    for crosses in by_sym.values():
        for a, b in zip(crosses, crosses[1:]):
            assert a != b  # consecutive signals must flip direction


def test_weekly_bars_consistency(spark):
    from securities_data_pipeline_spark.plans.securities_demo import sec_weekly_bars

    out = sec_weekly_bars(spark, SF).collect()
    assert out
    for r in out:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert 1 <= r.n_days <= 7


def test_rolling_beta_matches_numpy(spark):
    import numpy as np

    from securities_data_pipeline_spark.plans.securities_demo import sec_rolling_beta
    from securities_data_pipeline_spark.sources.tables import table as _table

    out = {(r.symbol, str(r.date_stamp)): r.beta for r in sec_rolling_beta(spark, SF).collect()}
    assert out
    # rebuild one symbol's trailing betas directly (cent-quantized,
    # index = per-date sum, centered): values must agree closely
    ev = _table(spark, SF, "events").select(
        F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
        F.to_date("ts").alias("d"),
        "value",
    )
    rows = ev.groupBy("symbol", "d").agg(F.max("value").alias("close")).collect()
    bars = {}
    for r in rows:
        bars[(r.symbol, str(r.d))] = round(r.close * 100)
    dates = sorted({d for _, d in bars})
    mkt = {d: sum(v for (s, dd), v in bars.items() if dd == d) for d in dates}
    c0 = sum(mkt.values()) // len(mkt)
    sym = next(iter({s for s, _ in bars}))
    series = sorted((d, v) for (s, d), v in bars.items() if s == sym)
    for i in range(len(series)):
        frame = series[max(0, i - 19) : i + 1]
        if len(frame) < 10:
            continue
        x = np.array([mkt[d] - c0 for d, _ in frame], dtype=np.int64)
        y = np.array([v for _, v in frame], dtype=np.int64)
        n = len(frame)
        var_n = n * int((x * x).sum()) - int(x.sum()) ** 2
        if var_n <= 0:
            continue
        cov_n = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        key = (sym, series[i][0])
        assert key in out
        assert abs(out[key] - cov_n / var_n) < 1e-12


def test_span_corruption_rate_and_determinism(spark):
    from securities_data_pipeline_spark.operators.boilerplate import (
        SPAN_PCT,
        t_span_corruption,
    )

    a = {r.doc_id: tuple(r) for r in t_span_corruption(spark, SF).collect()}
    b = {r.doc_id: tuple(r) for r in t_span_corruption(spark, SF).collect()}
    assert a == b  # hash-driven selection is run-stable
    total = sum(r[1] for r in a.values())
    masked = sum(r[2] for r in a.values())
    assert 0 < masked < total
    rate = masked / total
    assert abs(rate - SPAN_PCT / 100) < 0.05  # matches the target rate


def test_a6_approx_distinct_within_rsd(spark):
    """Pin the raw HLL estimate's accuracy (the sketch internals are
    engine-specific, so the raw estimate has no SQL oracle): every
    monthly estimate must land within ~3x the configured 2% rsd of the
    exact distinct count. The registered a6_approx_distinct query
    carries the driver-facing estimate_ok contract built on this."""
    from securities_data_pipeline_spark.plans.relational_ext import (
        a6_approx_distinct,
        approx_distinct_by_month,
    )

    approx = {
        r.ship_month: r.approx_orders
        for r in approx_distinct_by_month(spark, SF).collect()
    }
    gated = a6_approx_distinct(spark, SF).collect()
    assert gated and all(r.estimate_ok for r in gated)
    exact = {
        r.ship_month: r.exact_orders
        for r in table(spark, SF, "lineitem")
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .agg(F.count_distinct("l_orderkey").alias("exact_orders"))
        .collect()
    }
    assert set(approx) == set(exact) and exact
    for month, est in approx.items():
        assert abs(est - exact[month]) <= max(3, 0.06 * exact[month]), month


def test_sec_rsi_bounds_and_known_values(spark):
    """RSI stays in [0, 100]; an all-gains window hits exactly 100 and
    an all-losses window exactly 0 (checked on a constructed series via
    the same operator internals at sf0.001 corpus level: bounds only,
    since the synthetic closes mix gains and losses)."""
    from securities_data_pipeline_spark.plans.securities_demo import sec_rsi

    rows = sec_rsi(spark, SF).collect()
    assert rows, "expected full 14-delta frames at sf0.001"
    assert all(0.0 <= r.rsi_14 <= 100.0 for r in rows)
    # spot-check one row against a driver-side recompute
    import collections

    from securities_data_pipeline_spark.sources.tables import table as tbl

    ev = tbl(spark, SF, "events").collect()
    series = collections.defaultdict(dict)
    for e in ev:
        sym = f"U{e.user_id}"
        d = e.ts.date()
        v = round(e.value, 2)
        series[sym][d] = max(series[sym].get(d, v), v)
    target = rows[0]
    closes = sorted(series[target.symbol].items())
    deltas = [
        round(b[1] - a[1], 2) for a, b in zip(closes, closes[1:])
    ]
    idx = [d for d, _ in closes[1:]].index(target.date_stamp)
    frame = deltas[idx - 13 : idx + 1]
    g = sum(x for x in frame if x > 0)
    l = -sum(x for x in frame if x < 0)
    exp = 100.0 if l == 0 else round(100.0 - 100.0 / (1.0 + g / l), 6)
    assert abs(target.rsi_14 - exp) < 1e-6


def test_sec_sharpe_excludes_flat_series(spark, tmp_path):
    """A zero-variance (flat) symbol must be EXCLUDED, not divided by:
    under Spark 4's ANSI default a 0/0 would kill the whole query."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.securities_demo import sec_sharpe

    rows = []
    for d in range(1, 6):
        ts = dt.datetime(2024, 1, d, 12, 0)
        rows.append((d * 2, ts, 1, "view", 50.0, "{}"))          # user 1: flat
        rows.append((d * 2 + 1, ts, 2, "view", 50.0 + d * d, "{}"))  # user 2: moves
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.symbol: r for r in sec_sharpe(spark, str(tmp_path)).collect()}
    assert "U1" not in out  # flat series excluded, no crash
    assert out["U2"].vol > 0 and out["U2"].n_days == 4


def test_variant_json_path_matches_string_path(spark):
    """Spark 4 VARIANT ingestion: parse_json → variant_get must agree
    with the string-path get_json_object the registered f_json_extract
    uses — the upgrade path for semi-structured props at scale
    (variant stores a parsed binary form; repeated extraction stops
    re-parsing the JSON text per access)."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, '{"k": 87, "tag": "a"}'), (2, '{"k": 3}'), (3, "{}")],
        "event_id long, props string",
    )
    out = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("via_string"),
        F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("via_variant"),
    ).collect()
    assert all(r.via_string == r.via_variant for r in out), out
    assert {r.event_id: r.via_variant for r in out} == {1: 87, 2: 3, 3: None}


def test_sec_ewma_full_window_and_bounds(spark):
    """EWMA emits only full 20-bar windows, and a weighted mean of
    positive prices must sit inside [min, max] of its window inputs —
    checked coarsely against the global per-symbol price range."""
    from securities_data_pipeline_spark.plans.securities_demo import (
        EWMA_SPAN,
        sec_ewma,
    )
    from securities_data_pipeline_spark.sources.tables import table

    sf = "/root/testdata/sf0.001"
    out = sec_ewma(spark, sf).collect()
    assert out, "no full windows at sf0.001?"
    # per symbol: n_out = n_bars - (SPAN - 1)
    from pyspark.sql import functions as F

    ev = table(spark, sf, "events")
    bars = ev.groupBy(
        F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
        F.to_date("ts").alias("d"),
    ).count()
    n_bars = {r.symbol: r["count"] for r in bars.groupBy("symbol").count().collect()}
    n_out = {}
    lo, hi = {}, {}
    for r in out:
        n_out[r.symbol] = n_out.get(r.symbol, 0) + 1
        assert r.ewma20 > 0
        lo[r.symbol] = min(lo.get(r.symbol, r.px), r.px)
        hi[r.symbol] = max(hi.get(r.symbol, r.px), r.px)
    for s, n in n_out.items():
        assert n == max(n_bars[s] - (EWMA_SPAN - 1), 0), s


def test_sec_vwap_between_min_and_max_price(spark):
    """VWAP is a convex combination of the week's daily prices."""
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.plans.securities_demo import sec_vwap
    from securities_data_pipeline_spark.sources.tables import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
        F.to_date("ts").alias("d"),
    ).agg(F.round(F.max("value"), 2).alias("p"))
    rng = {
        (r.symbol, str(r.week)): (r.lo, r.hi)
        for r in daily.groupBy(
            "symbol", F.to_date(F.date_trunc("week", "d")).alias("week")
        )
        .agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
        .collect()
    }
    for r in sec_vwap(spark, sf).collect():
        lo, hi = rng[(r.symbol, str(r.week))]
        assert lo - 0.011 <= r.vwap <= hi + 0.011, (r.symbol, r.week, r.vwap, lo, hi)


def test_int64_overflow_is_loud(spark):
    """Pin the overflow contract the sec_vwap/sec_ewma docstrings rely
    on: this engine runs Spark 4's ANSI default, so int64 arithmetic
    overflow raises ArithmeticException (matching DuckDB's loud error)
    rather than wrapping silently. If a config change ever turns ANSI
    off, the cents×ppb-weight products in securities_demo.py would
    start wrapping — this test is the tripwire."""
    import pytest

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.range(1).select(
        (F.col("id") + F.lit(2**62)) * F.lit(4)
    )
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.collect()


def test_sec_sortino_downside_only_denominator(spark, tmp_path):
    """Sortino penalizes only negative returns: a symbol that only
    gains has zero downside deviation and must be EXCLUDED (ANSI
    divide-by-zero parity with the sharpe flat-series rule), while a
    mixed symbol's denominator uses just its loss days."""
    import datetime as dt
    import math

    from securities_data_pipeline_spark.plans.securities_demo import sec_sortino

    rows, eid = [], 0
    # user 1: monotonically rising -> no negative returns
    # user 2: rise then fall -> one negative return
    for d, (v1, v2) in enumerate(
        [(50.0, 50.0), (55.0, 60.0), (60.0, 45.0), (70.0, 54.0)], start=1
    ):
        ts = dt.datetime(2024, 1, d, 12, 0)
        rows.append((eid, ts, 1, "view", v1, "{}")); eid += 1
        rows.append((eid, ts, 2, "view", v2, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.symbol: r for r in sec_sortino(spark, str(tmp_path)).collect()}
    assert "U1" not in out  # gains-only: zero downside, excluded not crashed
    r2 = out["U2"]
    rets = [
        round(math.log(60.0 / 50.0), 6),
        round(math.log(45.0 / 60.0), 6),
        round(math.log(54.0 / 45.0), 6),
    ]
    dvar = sum(r * r for r in rets if r < 0) / (len(rets) - 1)
    assert r2.n_days == 3
    assert abs(r2.downside_vol - round(math.sqrt(dvar), 6)) < 1e-6
    exp_sortino = round(
        (sum(rets) / 3) / math.sqrt(dvar) * math.sqrt(252.0), 6
    )
    assert abs(r2.sortino_ann - exp_sortino) < 1e-6


def test_a_l_diversity_separates_homogeneous_sets(spark, tmp_path):
    """The homogeneity attack case: two anonymity sets of identical k,
    one whose members share a dominant behavior (l=1 — disclosed) and
    one whose members differ (l=2). The k-anonymity audit alone rates
    both sets k=2; l-diversity must tell them apart."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.analytics import a_l_diversity

    rows, eid = [], 0

    def emit(user, etype, n):
        nonlocal eid
        for i in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + i, 12, 0), user, etype, 1.0, "{}")
            )
            eid += 1

    emit(1, "view", 2)                      # sig view:2, dominant view
    emit(2, "view", 2)                      # same set, same dominant -> l=1
    emit(3, "view", 3); emit(3, "click", 2) # sig click:2|view:2, dominant view
    emit(4, "view", 2); emit(4, "click", 3) # same sig, dominant click -> l=2
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.l: (r.n_sets, r.n_users) for r in a_l_diversity(spark, str(tmp_path)).collect()}
    assert out == {1: (1, 2), 2: (1, 2)}


def test_partition_skew_report_flags_hot_month(spark, tmp_path):
    """The hot partition's ratio is its count over the mean — the
    number an ops runbook thresholds on before repartitioning."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.maintenance import (
        m_partition_skew_report,
    )

    rows = [(dt.datetime(2024, 1, 1 + i, 6, 0),) for i in range(4)]  # hot
    rows += [(dt.datetime(2024, 2, 1, 6, 0),), (dt.datetime(2024, 3, 1, 6, 0),)]
    spark.createDataFrame(rows, "l_shipdate timestamp").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    out = [
        (r.part_month, r.n_rows, r.ratio_to_mean)
        for r in m_partition_skew_report(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("2024-01", 4, 2.0),
        ("2024-02", 1, 0.5),
        ("2024-03", 1, 0.5),
    ]


def test_a_k_map_population_class_sizes(spark, tmp_path):
    """k-map against hand-built registry + release: population classes
    sized by the FULL registry, released records counted per class —
    a released record whose class holds unreleased lookalikes still
    gets the population k (that is the k-map point), NULL QI parts
    map to the sentinel class, and customers without orders never
    appear on the released side."""
    from securities_data_pipeline_spark.plans.analytics import a_k_map

    cust = [
        # class A: nation 1, AUTO, band 0 — pop k=3, 2 released
        (1, "a", 1, 500.0, "AUTO"),
        (2, "b", 1, 999.0, "AUTO"),
        (3, "c", 1, 0.0, "AUTO"),
        # class B: nation 2, BLDG, band -1 (negative balance) — pop
        # k=2, 1 released
        (4, "d", 2, -500.0, "BLDG"),
        (5, "e", 2, -1.0, "BLDG"),
        # class C: NULL nation + NULL balance sentinel — pop k=1,
        # released -> uniquely re-identifiable
        (6, "f", None, None, "MACH"),
    ]
    orders = [(10, 1, "O"), (11, 2, "O"), (12, 4, "O"), (13, 6, "O"),
              (14, None, "O")]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = {r.k: (r.n_classes, r.n_released)
           for r in a_k_map(spark, str(tmp_path)).collect()}
    assert out == {1: (1, 1), 2: (1, 1), 3: (1, 2)}


def test_l_diversity_consistent_with_k_anonymity(spark):
    """Both audits group users by the SAME generalized signature, so
    their histograms must account for identical set and user totals on
    the real corpus — and no set can be more diverse than it is large
    (max l <= max k)."""
    from securities_data_pipeline_spark.plans.analytics import (
        a_k_anonymity,
        a_l_diversity,
    )

    sf = "/root/testdata/sf0.001"
    krows = a_k_anonymity(spark, sf).collect()
    lrows = a_l_diversity(spark, sf).collect()
    assert sum(r.n_users for r in krows) == sum(r.n_users for r in lrows)
    assert sum(r.n_sets for r in krows) == sum(r.n_sets for r in lrows)
    assert max(r.l for r in lrows) <= max(r.k for r in krows)


def test_ivf_balance_accounts_for_every_vector(spark):
    """The balance report's bucket counts must sum to the gated corpus
    size (every admitted vector is assigned exactly once), and ratios
    must average 1 over buckets."""
    from securities_data_pipeline_spark.operators.similarity import (
        emb_table,
        sim_ivf_balance,
    )

    sf = "/root/testdata/sf0.001"
    rows = sim_ivf_balance(spark, sf).collect()
    assert sum(r.n_vectors for r in rows) == emb_table(spark, sf).count()
    mean_ratio = sum(r.ratio_to_mean for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 1e-4


def test_a_t_closeness_flags_skewed_sets(spark, tmp_path):
    """The skewness attack case (Li et al.): a set whose sensitive
    distribution MATCHES the corpus (t=0) vs two sets that are
    perfectly diverse by count but fully skewed (t=0.5). l-diversity
    rates the skewed sets safe at l>=1; t-closeness must not.
    Hand-math: global dominant = {view:3, click:3} -> P=(0.5,0.5);
    set A {view,click} -> TV=0; sets B {view,view} / C {click,click}
    -> TV = 0.5*(|1-0.5|+|0-0.5|) = 0.5."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.analytics import a_t_closeness

    rows, eid = [], 0

    def emit(user, etype, n):
        nonlocal eid
        for i in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + i, 12, 0), user, etype, 1.0, "{}")
            )
            eid += 1

    # set A: sig click:2|view:2, dominants view / click  -> matches corpus
    emit(1, "view", 3); emit(1, "click", 2)
    emit(2, "view", 2); emit(2, "click", 3)
    # set B: sig click:2|view:4, both dominant view      -> fully skewed
    emit(3, "view", 5); emit(3, "click", 2)
    emit(4, "view", 4); emit(4, "click", 2)
    # set C: sig click:4|view:2, both dominant click     -> fully skewed
    emit(5, "click", 5); emit(5, "view", 2)
    emit(6, "click", 4); emit(6, "view", 2)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.t_bucket: (r.n_sets, r.n_users, r.max_t)
        for r in a_t_closeness(spark, str(tmp_path)).collect()
    }
    assert out == {0: (1, 2, 0.0), 10: (2, 4, 0.5)}


def test_t_closeness_consistent_with_k_anonymity(spark):
    """Same signature grouping as the k/l audits: identical set and
    user totals on the real corpus, and TV distance is bounded in
    [0, 1] so every bucket index sits in [0, 20]."""
    from securities_data_pipeline_spark.plans.analytics import (
        a_k_anonymity,
        a_t_closeness,
    )

    sf = "/root/testdata/sf0.001"
    krows = a_k_anonymity(spark, sf).collect()
    trows = a_t_closeness(spark, sf).collect()
    assert sum(r.n_users for r in krows) == sum(r.n_users for r in trows)
    assert sum(r.n_sets for r in krows) == sum(r.n_sets for r in trows)
    assert all(0 <= r.t_bucket <= 20 for r in trows)
    assert all(0.0 <= r.max_t <= 1.0 for r in trows)


def test_w10_conversion_cohorts_hand_math(spark, tmp_path):
    """Exact-median + cohort arithmetic pin: two cohorts, one with an
    even number of converters (median = mean of the two middle
    latencies -> x.5), one with a never-converting user and a purchase
    BEFORE signup (must not count as conversion)."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.analytics import (
        w10_conversion_cohorts,
    )

    rows, eid = [], 0

    def emit(user, etype, ts):
        nonlocal eid
        rows.append((eid, ts, user, etype, 1.0, "{}"))
        eid += 1

    jan = dt.datetime(2024, 1, 10, 0, 0)
    feb = dt.datetime(2024, 2, 5, 0, 0)
    # Jan cohort: u1 converts in 10s, u2 in 20s, u3 in 31s, u4 in 45s
    # -> even count 4, median = (20+31)/2 = 25.5
    for u, lat in [(1, 10), (2, 20), (3, 31), (4, 45)]:
        emit(u, "signup", jan)
        emit(u, "purchase", jan + dt.timedelta(seconds=lat))
    # Feb cohort: u5 converts in 7s; u6 never converts; u7's only
    # purchase PREDATES signup (not a conversion)
    emit(5, "signup", feb)
    emit(5, "purchase", feb + dt.timedelta(seconds=7))
    emit(6, "signup", feb)
    emit(7, "purchase", feb - dt.timedelta(seconds=60))
    emit(7, "signup", feb)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.cohort: (r.n_signups, r.n_converted, r.conv_rate,
                   r.median_latency_sec)
        for r in w10_conversion_cohorts(spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-01": (4, 4, 1.0, 25.5),
        "2024-02": (3, 1, round(1 / 3, 6), 7.0),
    }


def test_quarantine_report_counts_planted_garbage(spark, tmp_path):
    """The reject counts must equal the planted garbage exactly, and
    match the clean-store split by construction: 2 good + 4 bad events
    (NULL ts, watermark poison, NaN, out-of-bound) -> reject_rate 4/6;
    3 good + 2 bad embeddings (NULL, wrong dim)."""
    import datetime as dt
    import math

    from securities_data_pipeline_spark.plans.maintenance import (
        m_quarantine_report,
    )

    ev = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 2, "error", None, "{}"),  # NULL value ok
        (3, None, 3, "view", 1.0, "{}"),                        # NULL ts
        (4, dt.datetime(2200, 1, 1), 4, "view", 1.0, "{}"),     # poison
        (5, dt.datetime(2024, 1, 3), 5, "view", math.nan, "{}"),
        (6, dt.datetime(2024, 1, 4), 6, "view", 1.0e9, "{}"),   # bound
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    good_vec = [0.1] * 64
    em = [(0, good_vec, 0), (1, good_vec, 1), (2, good_vec, 0),
          (3, None, 1), (4, [0.1] * 3, 0)]
    spark.createDataFrame(
        em, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.table_name: (r.n_clean, r.n_quarantined, r.reject_rate)
           for r in m_quarantine_report(spark, str(tmp_path)).collect()}
    assert out == {
        "events": (2, 4, round(4 / 6, 6)),
        "embeddings": (3, 2, 0.4),
    }


def test_markov_transition_hand_math(spark, tmp_path):
    """Transitions follow (ts, event_id) order per user, never cross
    users, group NULL types as the sentinel, and row-normalize:
    u1: view->click->view (tie on ts broken by event_id), u2:
    (null)->view. P(click|view)=0.5, P(view|view)=0.0 absent,
    P(view|click)=1.0, P(view|(null))=1.0."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.analytics import (
        a_markov_transition,
    )

    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t, 1, "view", 1.0, "{}"),
        # tie on ts: event_id 2 sorts before 3 -> view->click->view
        (2, t + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (3, t + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (4, t, 2, None, 1.0, "{}"),
        (5, t + dt.timedelta(minutes=5), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {(r.from_type, r.to_type): (r.n, r.p)
           for r in a_markov_transition(spark, str(tmp_path)).collect()}
    assert out == {
        ("view", "click"): (1, 1.0),
        ("click", "view"): (1, 1.0),
        ("(null)", "view"): (1, 1.0),
    }


def test_peak_concurrency_sweep_and_touch_rule(spark, tmp_path):
    """Two overlapping sessions peak at 2; a third session STARTING at
    the exact instant another ends must not raise the peak (the -1
    boundary sorts before the +1 at a tie) — the classic sweep-line
    touch rule. A SINGLE-EVENT session (start == end) must still
    register as concurrency 1 (ADVICE r9: intervals carry a minimum
    1-microsecond width, so a point session's +1 precedes its own -1
    instead of cancelling it at the tie)."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.analytics import (
        w11_peak_concurrency,
    )

    d = dt.datetime(2024, 3, 1, 10, 0)
    rows, eid = [], 0

    def emit(user, *minutes):
        nonlocal eid
        for m in minutes:
            rows.append((eid, d + dt.timedelta(minutes=m), user, "view",
                         1.0, "{}"))
            eid += 1

    emit(1, 0, 10)      # session 10:00-10:10
    emit(2, 5, 15)      # overlaps u1 -> concurrency 2
    emit(3, 10, 20)     # starts exactly as u1 ends -> still 2
    # next day: only single-event (zero-width) sessions — the ADVICE r9
    # regression case: peak must read 1, not 0
    d2 = d + dt.timedelta(days=1)
    rows.append((eid, d2, 4, "view", 1.0, "{}"))
    rows.append((eid + 1, d2 + dt.timedelta(hours=2), 5, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = [(str(r.day), r.n_sessions, r.peak_concurrent)
           for r in w11_peak_concurrency(spark, str(tmp_path)).collect()]
    assert out == [("2024-03-01", 3, 2), ("2024-03-02", 2, 1)]


def test_stream_quarantine_rate_counts_planted_garbage(spark, tmp_path):
    """The streaming gate audit's final state equals the planted
    garbage split: 2 good + 3 bad events -> reject_rate 0.6."""
    import datetime as dt
    import math

    from securities_data_pipeline_spark.streaming.ingest import (
        s_stream_quarantine_rate,
    )

    ev = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 2, "error", None, "{}"),
        (3, None, 3, "view", 1.0, "{}"),
        (4, dt.datetime(2200, 1, 1), 4, "view", 1.0, "{}"),
        (5, dt.datetime(2024, 1, 3), 5, "view", math.nan, "{}"),
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = s_stream_quarantine_rate(spark, str(tmp_path)).collect()[0]
    assert (r.n_clean, r.n_quarantined, r.reject_rate) == (2, 3, 0.6)


def test_max_drawdown_hand_math(spark, tmp_path):
    """Planted path 100,120,90,110,60: running peak 120 from day 2,
    worst trough 60/120-1 = -0.5 on day 5. A monotone-up symbol has
    max_drawdown 0.0 with the earliest date as trough (dd=0
    everywhere, date tiebreak)."""
    import datetime as dt

    from securities_data_pipeline_spark.plans.securities_demo import (
        sec_max_drawdown,
    )

    rows, eid = [], 0
    for d, (v1, v2) in enumerate(
        [(100.0, 10.0), (120.0, 11.0), (90.0, 12.0), (110.0, 13.0),
         (60.0, 14.0)], start=1
    ):
        ts = dt.datetime(2024, 2, d, 12, 0)
        rows.append((eid, ts, 1, "view", v1, "{}")); eid += 1
        rows.append((eid, ts, 2, "view", v2, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.symbol: (r.n_days, r.max_drawdown, str(r.trough_date))
           for r in sec_max_drawdown(spark, str(tmp_path)).collect()}
    assert out == {
        "U1": (5, -0.5, "2024-02-05"),
        "U2": (5, 0.0, "2024-02-01"),
    }


def test_zipf_fit_matches_pure_python_regression(spark):
    """t_zipf_fit must equal a plain-Python least-squares over the
    same (ln rank, ln freq) pairs built from the operator's own
    ranked vocabulary, with the documented 9-dp quantization."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from securities_data_pipeline_spark.operators.textops import (
        ZIPF_TOP,
        ranked_head,
        t_zipf_fit,
        table,
        token_stream,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    counts = (
        token_stream(table(spark, sf, "documents"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    pairs = [
        (r.rank, r.n_occurrences)
        for r in ranked_head(counts, ZIPF_TOP, "rank").collect()
    ]

    def d9(v):
        return Decimal(v).quantize(Decimal("1e-9"), ROUND_HALF_UP)

    def r6(v):
        return float(Decimal(v).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    xs = [d9(round(math.log(rk), 9)) for rk, _ in pairs]
    ys = [d9(round(math.log(f), 9)) for _, f in pairs]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    nd, sxd, syd = float(n), float(sx), float(sy)
    cov = nd * float(sxy) - sxd * syd
    vx = nd * float(sxx) - sxd * sxd
    vy = nd * float(syy) - syd * syd
    slope = cov / vx
    r = t_zipf_fit(spark, sf).collect()[0]
    assert r.n_terms == n
    assert r.zipf_slope == r6(slope)
    assert r.intercept == r6((syd - slope * sxd) / nd)
    assert r.r2 == r6(cov * cov / (vx * vy))
    assert -3.0 < r.zipf_slope < 0.0  # a frequency-ranked corpus decays
