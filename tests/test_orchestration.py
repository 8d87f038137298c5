"""Scheduling/trigger semantics (reference prefect.cloud.yaml:29-65):
the ``0 0 * * 2-6`` ingest cron and the ``require: all, within: 600``
compound trigger gating the dbt deployment. Pure-Python — no Spark."""

import datetime as dt

import pytest

from securities_data_pipeline_spark.orchestration import (
    DBT_TRIGGER_WITHIN,
    INGEST_CRON,
    CompoundTrigger,
    cron_next_fire,
    run_scheduled_etl,
)

DT = dt.datetime


def test_reference_cron_skips_sunday_and_monday():
    # Sat 2026-01-03 00:00 fired; next is Tue 00:00 (cron 2-6 = Tue-Sat)
    after = DT(2026, 1, 3, 0, 0)
    nxt = cron_next_fire(INGEST_CRON, after)
    assert nxt == DT(2026, 1, 6, 0, 0)
    assert nxt.strftime("%a") == "Tue"
    # mid-week: Wednesday's run follows Tuesday's
    assert cron_next_fire(INGEST_CRON, DT(2026, 1, 6, 0, 0)) == DT(2026, 1, 7, 0, 0)
    # strictly-after: asking at the fire instant returns the NEXT one
    assert cron_next_fire(INGEST_CRON, DT(2026, 1, 7, 0, 0)) > DT(2026, 1, 7, 0, 0)


def test_cron_fields_steps_lists_ranges():
    assert cron_next_fire("*/15 * * * *", DT(2026, 1, 1, 10, 16)) == DT(2026, 1, 1, 10, 30)
    assert cron_next_fire("30 9 1,15 * *", DT(2026, 1, 2, 0, 0)) == DT(2026, 1, 15, 9, 30)
    # dom OR dow when both restricted (vixie-cron): the 13th (Tue) matches
    # via dom even though dow says Friday
    assert cron_next_fire("0 0 13 * 5", DT(2026, 1, 10, 0, 0)) == DT(2026, 1, 13, 0, 0)
    # 7 == Sunday alias — as a value, inside a range, and spanning one
    assert cron_next_fire("0 0 * * 7", DT(2026, 1, 1, 0, 0)).strftime("%a") == "Sun"
    # from a Saturday, '5-7' must fire SUNDAY — fails if a parser bug
    # drops 7 from ranges (then next would be Friday)
    assert cron_next_fire("0 0 * * 5-7", DT(2026, 1, 3, 0, 1)) == DT(2026, 1, 4, 0, 0)
    # 0-7 = every day (both Sunday spellings): Thu Jan 1 → fires Jan 2
    assert cron_next_fire("0 0 * * 0-7", DT(2026, 1, 1, 0, 0)) == DT(2026, 1, 2, 0, 0)
    # vixie star flag: '*/2' in dom BEGINS with '*', so the dom/dow OR
    # rule does NOT apply — '0 0 */2 * 1' fires only on Mondays that
    # land on odd days. From Thu Jan 1 2026: Mon Jan 5 is odd → fires;
    # a bare-'*'-equality bug would instead fire Fri Jan 2 (even-day OR).
    assert cron_next_fire("0 0 */2 * 1", DT(2026, 1, 1, 0, 0)) == DT(2026, 1, 5, 0, 0)
    # ...and the step restriction itself still applies with dow='*':
    # '*/2' over 1-31 yields odd days, so from Jan 1 00:01 → Jan 3
    assert cron_next_fire("0 0 */2 * *", DT(2026, 1, 1, 0, 1)) == DT(2026, 1, 3, 0, 0)
    # stepped star in dow keeps its restriction too: '*/2' over 0-7 →
    # {Sun,Tue,Thu,Sat}; from Thu Jan 1 00:01 the next is Sat Jan 3
    assert cron_next_fire("0 0 * * */2", DT(2026, 1, 1, 0, 1)) == DT(2026, 1, 3, 0, 0)
    with pytest.raises(ValueError):
        cron_next_fire("0 0 * *", DT(2026, 1, 1))  # 4 fields
    with pytest.raises(ValueError):
        cron_next_fire("61 0 * * *", DT(2026, 1, 1))  # out of range


def test_compound_trigger_requires_all_within_window():
    trig = CompoundTrigger(require=frozenset({"fx", "sp_stocks"}))
    t0 = DT(2026, 1, 6, 0, 10)
    assert not trig.record("fx", t0)  # one of two
    # second completes 9 minutes later — outside within=600s; the fx
    # event has aged out, so the trigger must NOT fire (Prefect
    # compound-trigger reset semantics)
    assert not trig.record("sp_stocks", t0 + dt.timedelta(seconds=DBT_TRIGGER_WITHIN + 1))
    # fx completes again close to sp_stocks: both inside one window → fire
    assert trig.record("fx", t0 + dt.timedelta(seconds=DBT_TRIGGER_WITHIN + 30))
    trig.fire()
    # consumed: a lone new event doesn't re-fire
    assert not trig.record("fx", t0 + dt.timedelta(seconds=2000))
    with pytest.raises(ValueError):
        trig.record("bonds", t0)


def test_scheduler_tick_runs_flows_then_transform():
    ran, transformed = [], []
    out = run_scheduled_etl(
        now=DT(2026, 1, 6, 0, 1),       # just after Tue 00:00 fire
        last_run=DT(2026, 1, 3, 0, 0),  # Saturday's run
        run_flow=ran.append,
        run_transform=lambda: transformed.append(True),
    )
    assert out == (["fx", "sp_stocks"], True)
    assert ran == ["fx", "sp_stocks"] and transformed == [True]
    # not due: Sunday/Monday ticks run nothing
    out = run_scheduled_etl(
        now=DT(2026, 1, 5, 12, 0),      # Monday noon
        last_run=DT(2026, 1, 3, 0, 0),
        run_flow=ran.append,
    )
    assert out == ([], False)
    assert ran == ["fx", "sp_stocks"]  # unchanged


def test_cron_single_value_with_step_is_vixie_range():
    """vixie cron: 'N/step' = 'N-max/step' — '5/15' in minutes fires at
    5,20,35,50; silently parsing it as the bare value 5 would drop
    three of the four fire times per hour."""
    import datetime as dt

    from securities_data_pipeline_spark.orchestration import cron_next_fire

    t = dt.datetime(2025, 1, 1, 0, 0)
    fires = []
    for _ in range(4):
        t = cron_next_fire("5/15 * * * *", t)
        fires.append(t.minute)
    assert fires == [5, 20, 35, 50]
