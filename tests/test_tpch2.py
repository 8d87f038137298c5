"""Deep-join query surface (plans/relational_tpch2): shape and
physical-plan assertions at sf0.001. Value parity vs DuckDB is covered
by tools/check_oracle.py at sf0.01."""

from securities_data_pipeline_spark.plans.relational_tpch2 import (
    q7_nation_volume,
    q9_profit_by_nation,
    q10_returned_items,
    q16_supplier_count,
    q19_disjunctive_revenue,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q7_two_role_nation_join(spark):
    df = q7_nation_volume(spark, SF)
    assert df.columns == ["supp_nation", "cust_nation", "l_year", "revenue"]
    out = df.collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in out}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}


def test_q9_profit_signs_and_grouping(spark):
    df = q9_profit_by_nation(spark, SF)
    out = df.collect()
    assert len(out) > 0
    assert len({(r.nation, r.o_year) for r in out}) == len(out)  # grouped keys unique


def test_q10_top20_deterministic(spark):
    df = q10_returned_items(spark, SF)
    out = df.collect()
    assert len(out) <= 20
    revs = [r.revenue for r in out]
    assert revs == sorted(revs, reverse=True)


def test_q16_distinct_supplier_counts_positive(spark):
    df = q16_supplier_count(spark, SF)
    assert df.where("supplier_cnt < 1").count() == 0
    # excluded brand never appears
    assert df.where("p_brand = 'Brand#45'").count() == 0


def test_q19_single_scan_no_union(spark):
    df = q19_disjunctive_revenue(spark, SF)
    plan = _plan(df)
    # the OR-of-ANDs must stay one filtered scan of lineitem, not a
    # union of per-brand scans
    assert plan.count("Scan parquet") <= 2  # lineitem + part only
    assert "Union" not in plan
    assert df.count() == 1


def test_dimension_joins_are_broadcast(spark):
    for fn in (q7_nation_volume, q9_profit_by_nation, q10_returned_items):
        plan = _plan(fn(spark, SF))
        assert "BroadcastHashJoin" in plan


def test_q8_share_bounded(spark):
    from securities_data_pipeline_spark.plans.relational_tpch2 import q8_market_share

    out = q8_market_share(spark, SF).collect()
    assert len(out) > 0
    assert all(0.0 <= r.mkt_share <= 1.0 for r in out)


def test_q12_counts_partition_lineitems(spark):
    from securities_data_pipeline_spark.plans.relational_tpch2 import (
        q12_priority_shipping,
    )

    out = q12_priority_shipping(spark, SF).collect()
    assert len(out) > 0
    assert all(r.high_line_count + r.low_line_count > 0 for r in out)
