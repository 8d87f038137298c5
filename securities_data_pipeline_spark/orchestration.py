"""Scheduling & event-trigger semantics — the reference's Prefect
deployment layer re-expressed as dependency-free primitives.

Reference (prefect.cloud.yaml:29-65, prefect.local.yaml:12-13):

- both ingest flows run on cron ``0 0 * * 2-6`` (00:00 UTC Tue–Sat —
  one run per completed trading day);
- the dbt transformation deployment carries a COMPOUND trigger:
  ``require: all, within: 600`` over two flow-run-Completed events —
  it fires only when BOTH the fx and sp_stocks pipelines complete
  within a 600-second window.

A Spark deployment schedules with whatever the cluster offers
(Airflow, cron, Databricks jobs), so this module does not embed a
daemon. It provides the two SEMANTIC pieces those schedulers are
configured with, as pure functions that tests can pin:

- ``cron_next_fire(expr, after)`` — the 5-field cron subset the
  reference uses (numbers, ``*``, ranges, lists, steps), so a
  deployment can assert "the next run after Friday's is Tuesday's";
- ``CompoundTrigger`` — ``require=all, within=N`` over named events
  with the same reset-on-expiry behavior Prefect applies: a partial
  event set older than the window no longer counts.

``run_scheduled_etl`` glues them to ``pipeline.etl_flow``: given "now",
it decides which asset categories are due and, on completion events,
whether the downstream transformation should fire — the exact control
flow of the reference's three deployments, minus the daemon.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    """One cron field → the set of matching values. Supports ``*``,
    ``a``, ``a-b``, ``a,b,c``, ``*/s`` and ``a-b/s`` (the standard
    subset; names like MON are out of scope — the reference uses
    numerics only)."""
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        has_step = "/" in part
        if has_step:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"bad cron step: {step_s}")
        if part == "*":
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        elif has_step:
            # vixie parity: 'N/step' means 'N-max/step' (e.g. '5/15' in
            # the minute field fires at 5,20,35,50) — silently treating
            # it as the single value N would drop the step entirely
            lo_p, hi_p = int(part), hi
        else:
            lo_p = hi_p = int(part)
        if not (lo <= lo_p <= hi_p <= hi):
            raise ValueError(f"cron field out of range: {part} not in [{lo},{hi}]")
        out.update(range(lo_p, hi_p + 1, step))
    return out


def cron_next_fire(expr: str, after: dt.datetime) -> dt.datetime:
    """Next fire time strictly after ``after`` for a 5-field cron
    expression (minute hour day-of-month month day-of-week; dow 0=Sun,
    both 0 and 7 accepted as Sunday, vixie-cron's convention).

    Day-of-month and day-of-week combine as cron does: if both are
    restricted the day matches when EITHER does; if only one is
    restricted, it alone decides.
    """
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"need 5 cron fields, got {len(fields)}: {expr!r}")
    minutes = _parse_field(fields[0], 0, 59)
    hours = _parse_field(fields[1], 0, 23)
    doms = _parse_field(fields[2], 1, 31)
    months = _parse_field(fields[3], 1, 12)
    # parse with hi=7 then fold 7→0 per VALUE: a string-level '7'→'0'
    # rewrite would corrupt ranges/steps ('5-7'→'5-0', '*/7'→'*/0')
    dows = {d % 7 for d in _parse_field(fields[4], 0, 7)}
    # vixie-cron's star flag: a field BEGINNING with '*' (so '*/2'
    # counts too, not just bare '*'). The dom/dow rule is OR only when
    # BOTH fields are non-star; if either carries the star flag the
    # day must match both fields (a stepped '*/2' still applies its
    # step restriction in matching) — so '0 0 */2 * 1' fires only on
    # Mondays that fall on odd days, not Mondays-or-odd-days.
    dom_star = fields[2].startswith("*")
    dow_star = fields[4].startswith("*")

    # scan DAYS (date fields first), minutes only inside matching days:
    # the horizon must cover a full Gregorian leap cycle — '0 0 29 2 *'
    # can be up to 8 years out (2096→2104), which a year-of-minutes
    # scan would misreport as never firing — and a day scan makes the
    # 8-year horizon cheap (≤2928 date checks + one day of minutes)
    t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    minutes_sorted, hours_sorted = sorted(minutes), sorted(hours)
    day = t.date()
    first_day = True
    for _ in range(366 * 8 + 1):  # ≥ one Gregorian leap cycle of days
        # python weekday(): Mon=0; cron: Sun=0
        cron_dow = (day.weekday() + 1) % 7
        dom_ok, dow_ok = day.day in doms, cron_dow in dows
        day_ok = (
            (dom_ok and dow_ok)
            if dom_star or dow_star
            else (dom_ok or dow_ok)
        )
        if day.month in months and day_ok:
            for h in hours_sorted:
                if first_day and h < t.hour:
                    continue
                for m in minutes_sorted:
                    if first_day and h == t.hour and m < t.minute:
                        continue
                    return dt.datetime(
                        day.year, day.month, day.day, h, m, tzinfo=after.tzinfo
                    )
        first_day = False
        day += dt.timedelta(days=1)
    raise ValueError(f"cron expression never fires: {expr!r}")


#: the reference's shared ingest schedule (prefect.cloud.yaml:29-30)
INGEST_CRON = "0 0 * * 2-6"
#: the dbt compound-trigger window, seconds (prefect.cloud.yaml:51-54)
DBT_TRIGGER_WITHIN = 600


@dataclass
class CompoundTrigger:
    """``require: all, within: N`` over named completion events.

    ``record(name, at)`` registers an upstream completion;
    ``should_fire(now)`` is True exactly when every required event has
    been seen and the OLDEST of them is still within ``within``
    seconds of the NEWEST (Prefect's interpretation: the events must
    cluster inside one window, not merely each be recent). Firing
    resets the trigger; stale partial sets age out automatically.
    """

    require: frozenset[str]
    within: float = DBT_TRIGGER_WITHIN
    _seen: dict[str, dt.datetime] = field(default_factory=dict)

    def record(self, name: str, at: dt.datetime) -> bool:
        """Register event ``name``; returns should_fire(at)."""
        if name not in self.require:
            raise ValueError(f"unknown trigger event: {name!r}")
        self._seen[name] = at
        return self.should_fire(at)

    def should_fire(self, now: dt.datetime) -> bool:
        self._expire(now)
        return set(self._seen) == set(self.require)

    def fire(self) -> None:
        """Consume the satisfied event set (call after running the
        downstream); the next firing needs a fresh full set."""
        self._seen.clear()

    def _expire(self, now: dt.datetime) -> None:
        newest = max(self._seen.values(), default=None)
        if newest is None:
            return
        horizon = newest - dt.timedelta(seconds=self.within)
        for k in [k for k, v in self._seen.items() if v < horizon]:
            del self._seen[k]


def run_scheduled_etl(
    *,
    now: dt.datetime,
    last_run: dt.datetime,
    run_flow,
    run_transform=None,
    trigger: CompoundTrigger | None = None,
    cron: str = INGEST_CRON,
):
    """One scheduler tick of the reference's 3-deployment topology:
    if the ingest cron has a fire time in (last_run, now], run
    ``run_flow(category)`` for every required asset category; each
    completion feeds the compound trigger; when it fires (all
    completions within the window), ``run_transform()`` runs — the
    dbt deployment's position. The flow callables are injected (a
    caller wires ``pipeline.etl_flow`` with its source DataFrames,
    exactly as the reference's Prefect entrypoints bind parameters);
    this function owns only the WHEN, which is what the reference's
    yaml encodes.

    Returns (ran_categories, transform_ran).
    """
    trigger = trigger or CompoundTrigger(require=frozenset({"fx", "sp_stocks"}))
    due = cron_next_fire(cron, last_run) <= now
    if not due:
        return [], False
    ran, transform_ran = [], False
    for cat in sorted(trigger.require):
        run_flow(cat)
        ran.append(cat)
        if trigger.record(cat, now):
            trigger.fire()
            if run_transform is not None:
                run_transform()
            transform_ran = True
    return ran, transform_ran
