"""TPC-H Q2/Q13/Q15/Q20/Q21 shapes (plans/relational_tpch3) plus the
kNN graph and calendar spine: semantic invariants and physical-plan
assertions at sf0.001. Value parity vs DuckDB is covered by
tools/check_oracle.py at sf0.01."""

from pyspark.sql import functions as F

from securities_data_pipeline_spark.plans.relational_tpch3 import (
    q2_min_acctbal_supplier,
    q13_customer_distribution,
    q15_top_supplier,
    q20_excess_suppliers,
    q21_waiting_suppliers,
)
from securities_data_pipeline_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q13_counts_cover_all_customers(spark):
    df = q13_customer_distribution(spark, SF)
    out = df.collect()
    n_customers = table(spark, SF, "customer").count()
    assert sum(r.custdist for r in out) == n_customers
    # zero-order customers surface via the left join, or every
    # customer has an order — either way no negative bucket
    assert all(r.c_count >= 0 for r in out)


def test_q13_preaggregates_before_customer_join(spark):
    # the orders side must aggregate to one row per custkey BEFORE the
    # customer join: the final aggregate's input is the join of
    # customer with an already-aggregated orders subtree
    plan = _plan(q13_customer_distribution(spark, SF))
    join_pos = plan.find("Join")
    assert join_pos != -1
    assert "HashAggregate" in plan[join_pos:], "orders not pre-aggregated below the join"


def test_q15_all_rows_share_the_max(spark):
    out = q15_top_supplier(spark, SF).collect()
    assert len(out) >= 1
    revs = {r.total_revenue for r in out}
    assert len(revs) == 1  # every returned supplier has THE max revenue


def test_q21_sole_late_supplier_semantics(spark):
    out = q21_waiting_suppliers(spark, SF).collect()
    assert len(out) <= 20
    waits = [r.numwait for r in out]
    assert waits == sorted(waits, reverse=True)
    assert all(r.numwait >= 1 for r in out)


def test_q21_single_fact_shuffle(spark):
    # the EXISTS/NOT-EXISTS collapse: lineitem scanned for lines and
    # for the per-order aggregate (Spark reuses one scan per subtree);
    # no more than 2 lineitem scans may appear, and supplier must be
    # broadcast
    plan = _plan(q21_waiting_suppliers(spark, SF))
    assert plan.count("lineitem") <= 4  # 2 scans x (scan + location strings)
    assert "BroadcastHashJoin" in plan


def test_q2_min_per_part(spark):
    df = q2_min_acctbal_supplier(spark, SF)
    out = df.collect()
    assert len(out) <= 50
    # within the result, each part appears with exactly one acctbal
    # value (the min): duplicates only from ties
    by_part = {}
    for r in out:
        by_part.setdefault(r.p_partkey, set()).add(r.s_acctbal)
    assert all(len(v) == 1 for v in by_part.values())


def test_q20_semi_join_no_duplicates(spark):
    df = q20_excess_suppliers(spark, SF)
    out = df.collect()
    keys = [r.s_suppkey for r in out]
    assert len(keys) == len(set(keys))  # left_semi never multiplies rows
    assert "LeftSemi" in _plan(df)


def test_knn_graph_invariants(spark):
    from securities_data_pipeline_spark.operators.similarity import KNN_K, sim_knn_graph

    out = sim_knn_graph(spark, SF).collect()
    assert len(out) > 0
    per_src = {}
    for r in out:
        per_src.setdefault(r.src, []).append(r)
        assert r.src != r.dst
    for src, edges in per_src.items():
        assert len(edges) <= KNN_K
        ranks = sorted(e.rank for e in edges)
        assert ranks == list(range(1, len(edges) + 1))
        by_rank = sorted(edges, key=lambda e: e.rank)
        sims = [e.sim for e in by_rank]
        assert sims == sorted(sims, reverse=True)


def test_calendar_spine_fills_every_day(spark):
    from securities_data_pipeline_spark.plans.securities_demo import sec_calendar_spine

    df = sec_calendar_spine(spark, SF)
    out = df.collect()
    per_symbol = {}
    for r in out:
        per_symbol.setdefault(r.symbol, []).append(r)
    for symbol, rows in per_symbol.items():
        days = sorted(r.date_stamp for r in rows)
        # contiguous daily spine: span == count
        assert (days[-1] - days[0]).days + 1 == len(days)
        # first day is observed (spine starts at first active day)
        first = min(rows, key=lambda r: r.date_stamp)
        assert not first.is_synthetic
        # synthetic days inherit the previous close
        rows_sorted = sorted(rows, key=lambda r: r.date_stamp)
        for prev, cur in zip(rows_sorted, rows_sorted[1:]):
            if cur.is_synthetic:
                assert cur.close_filled == prev.close_filled
