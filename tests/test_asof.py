"""As-of join semantics on controlled inputs."""

import datetime as dt

from pyspark.sql import functions as F

from securities_data_pipeline_spark.operators.asof import asof_join

TS = dt.datetime


def test_asof_backward_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "A", TS(2024, 1, 10)), (2, "A", TS(2024, 1, 20)), (3, "B", TS(2024, 1, 10))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", TS(2024, 1, 5), 100),
            ("A", TS(2024, 1, 10), 200),   # equal time → inclusive match for id=1
            ("A", TS(2024, 1, 10), 201),   # same time: greatest tiebreak wins
            ("A", TS(2024, 1, 15), 300),
            ("B", TS(2024, 1, 12), 400),   # after left's time → no match for id=3
        ],
        "k string, rt timestamp, val long",
    )
    out = {
        r.id: (r.val, r.rt)
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            payload_cols=["val", "rt"], tiebreak="val",
        ).collect()
    }
    assert out[1][0] == 201          # inclusive at equal time, max tiebreak
    assert out[2][0] == 300          # latest at/before 01-20
    assert out[3] == (None, None)    # nothing at/before → left row kept, nulls


def test_asof_no_row_explosion_columns_from_same_row(spark):
    """Payload travels as a struct: matched columns must come from the
    SAME right row (no tearing between val and rt)."""
    left = spark.createDataFrame([(1, "A", TS(2024, 2, 1))], "id long, k string, t timestamp")
    right = spark.createDataFrame(
        [("A", TS(2024, 1, 1), 10), ("A", TS(2024, 1, 2), 5)],
        "k string, rt timestamp, val long",
    )
    r = asof_join(left, right, "k", "t", "rt", ["val", "rt"], tiebreak="val").collect()[0]
    assert (r.val, r.rt) == (5, TS(2024, 1, 2))  # later time wins even with smaller val


def test_range_bin_equals_direct_inequality_join(spark):
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.operators.asof import j_range_bin
    from securities_data_pipeline_spark.sources.tables import table

    SF = "/root/testdata/sf0.001"
    got = {r.event_id: r.n_events for r in j_range_bin(spark, SF).collect()}
    ev = table(spark, SF, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    e = ev.where(F.col("event_type") != "purchase")
    exp = {
        r.pid: r.n
        for r in p.join(
            e,
            (e.user_id == p.pu)
            & (e.ts >= p.pts)
            & (e.ts < p.pts + F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_range_bin_plans_as_equi_join_not_nested_loop(spark):
    from securities_data_pipeline_spark.operators.asof import j_range_bin

    plan = j_range_bin(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan
    # the range condition is a residual on an equi-join over (user, bin)
    assert "Join" in plan


def test_forward_asof_inclusive_and_unmatched(spark):
    from securities_data_pipeline_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "eq"), (1, 20, "mid"), (1, 30, "late")], "k long, rts long, tag string"
    )
    out = {
        (r.k, r.ts): r.tag
        for r in asof_join_forward(
            left, right, on="k", left_time="ts", right_time="rts",
            payload_cols=["tag"],
        ).collect()
    }
    assert out[(1, 10)] == "eq"    # inclusive: equal time matches
    assert out[(1, 25)] == "late"  # earliest at-or-after
    assert out[(2, 5)] is None     # key with no right rows → null


def test_scd2_intervals_chain(spark):
    """Exactly one open (is_current) interval per user; each closed
    interval's valid_to equals the next interval's valid_from."""
    from securities_data_pipeline_spark.plans.maintenance import m_scd2_intervals

    rows = m_scd2_intervals(spark, "/root/testdata/sf0.001").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].valid_to is None and ivs[-1].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, user


def test_asof_tolerance_nulls_stale_matches(spark):
    """merge_asof-tolerance parity: a backward match older than the
    tolerance nulls out exactly like no match; in-tolerance matches
    (including equal-time) are untouched."""
    import datetime as dt

    from securities_data_pipeline_spark.operators.asof import asof_join_tolerance

    T = lambda d, h=0: dt.datetime(2024, 1, d, h)
    left = spark.createDataFrame(
        [(1, T(10)), (1, T(12)), (2, T(10))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, T(9, 12), "fresh"), (2, T(1), "stale")],
        "k long, rts timestamp, tag string",
    )
    out = {
        (r.k, r.ts): r.tag
        for r in asof_join_tolerance(
            left, right, on="k", left_time="ts", right_time="rts",
            payload_cols=["tag"], tolerance="1 DAY",
        ).collect()
    }
    assert out[(1, T(10))] == "fresh"   # 12h old: within 1 day
    assert out[(1, T(12))] is None      # same match now 2.5 days old
    assert out[(2, T(10))] is None      # 9 days old: stale → null


def test_asof_null_times_match_nothing(spark):
    """SQL three-valued logic: a NULL right_time satisfies neither <=
    nor >=, and a NULL left_time matches nothing — both directions
    must yield null payloads, not the NULLS-FIRST window artifact that
    handed such rows a spurious neighbor."""
    import datetime as dt

    from securities_data_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_forward,
    )

    T = lambda d: dt.datetime(2024, 1, d)
    left = spark.createDataFrame(
        [(1, T(10), "has_t"), (1, None, "null_t")],
        "k long, ts timestamp, who string",
    )
    right = spark.createDataFrame(
        [(1, None, 99), (1, T(5), 5)], "k long, rts timestamp, payload long"
    )
    back = {r.who: r.payload for r in asof_join(
        left, right, on="k", left_time="ts", right_time="rts",
        payload_cols=["payload"],
    ).collect()}
    assert back == {"has_t": 5, "null_t": None}

    fwd_right = spark.createDataFrame(
        [(1, None, 77), (1, T(20), 20)], "k long, rts timestamp, payload long"
    )
    fwd = {r.who: r.payload for r in asof_join_forward(
        left, fwd_right, on="k", left_time="ts", right_time="rts",
        payload_cols=["payload"],
    ).collect()}
    assert fwd == {"has_t": 20, "null_t": None}


def test_asof_nearest_prefers_closer_and_breaks_ties_backward(spark, tmp_path):
    """Nearest mode: the closer order wins in either direction; an
    exact distance tie prefers the at-or-before order; an event before
    every order matches forward; a user with no orders keeps nulls."""
    import datetime as dt
    import os

    from securities_data_pipeline_spark.operators.asof import (
        j_asof_nearest_order,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0)
    ev = [
        (1, t0, 1, "view", 1.0, "{}"),                      # between orders
        (2, t0 - dt.timedelta(days=9), 1, "view", 1.0, "{}"),  # before all
        (3, t0, 2, "view", 1.0, "{}"),                      # exact tie
        (4, t0, 3, "view", 1.0, "{}"),                      # no orders
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    orders = [
        # u1: 3 days before vs 2 days after -> the AFTER one is nearer
        (101, 1, "F", 10.0, t0 - dt.timedelta(days=3), "1-URGENT"),
        (102, 1, "F", 10.0, t0 + dt.timedelta(days=2), "1-URGENT"),
        # u2: 1 day before vs 1 day after -> tie -> backward (101x)
        (201, 2, "F", 10.0, t0 - dt.timedelta(days=1), "1-URGENT"),
        (202, 2, "F", 10.0, t0 + dt.timedelta(days=1), "1-URGENT"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "orders.parquet"))
    out = {r.event_id: r.o_orderkey
           for r in j_asof_nearest_order(spark, str(tmp_path)).collect()}
    assert out == {1: 102, 2: 101, 3: 201, 4: None}
