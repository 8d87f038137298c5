"""Scale-stress the event-stream operators beyond the largest driver SF.

Third member of the amplification harness family (stress_dedup,
stress_sim): replicate the sf0.1 events table N× with re-keyed
event_ids and a per-replica timestamp jitter (rep seconds), KEEPING
user_id — so each user's series densifies N×, which is exactly the
axis that stresses per-key windows, sessionization (denser series
merge sessions), interval-join candidate sets, and streaming state.
``j_range_bin``'s 7-day attribution windows are the quadratic risk:
both probe and window sides densify, so candidate pairs grow ~N² per
user — the harness reports output rows next to wall time so
output-driven growth is distinguishable from plan-driven growth.

Works strictly inside ``<scratch_root>/sdp_events_stress`` (only that
harness-owned subdirectory is ever deleted). Usage::

    python tools/stress_events.py [sf_dir] [factor] [scratch_root]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def amplify_events(spark, sf_dir: str, factor: int, out_dir: str) -> str:
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.sources.tables import table

    ev = table(spark, sf_dir, "events")
    n = ev.count()
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    amplified = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(n * 10))
        .withColumn(
            "ts", F.col("ts") + F.make_dt_interval(secs=F.col("rep").cast("double"))
        )
        .drop("rep")
    )
    # the streaming source reads sf_dir with pathGlobFilter
    # 'events.parquet' (driver testdata ships single-FILE parquet), so
    # the amplified table must be one file of that name, not a
    # directory — write a single-part directory and move the part out
    tmp = os.path.join(out_dir, "_events_tmp")
    amplified.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.endswith(".parquet") and f.startswith("part-")
    )
    path = os.path.join(out_dir, "events.parquet")
    os.replace(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path


def _sec_indicator_queries():
    """Round-6 continued-session indicator stack (events-only reads):
    denser per-symbol bars stress the shared one-sort window chains."""
    from securities_data_pipeline_spark.plans.securities_demo import (
        sec_atr,
        sec_bollinger,
        sec_macd,
        sec_stochastic,
    )

    return [
        ("sec_macd", sec_macd),
        ("sec_bollinger", sec_bollinger),
        ("sec_atr", sec_atr),
        ("sec_stochastic", sec_stochastic),
    ]


def main() -> int:
    from securities_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    scratch_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
    scratch = os.path.join(scratch_root, "sdp_events_stress")

    spark = get_spark("events-stress")
    os.makedirs(scratch, exist_ok=True)
    t0 = time.time()
    amp_path = amplify_events(spark, sf_dir, factor, scratch)
    prep_s = time.time() - t0

    from securities_data_pipeline_spark.operators.asof import (
        j_asof_tolerance_purchase,
        j_range_bin,
        w4_session_windows,
    )
    from securities_data_pipeline_spark.plans.analytics import (
        w7_interval_range,
        w8_pattern_match,
    )
    from securities_data_pipeline_spark.streaming.ingest import s_stream_daily_rollup

    n_events = spark.read.parquet(amp_path).count()
    results = {"sf_dir": sf_dir, "factor": factor, "n_events": n_events,
               "prep_sec": round(prep_s, 2), "queries": {}}
    for name, fn in [
        ("w4_session_windows", w4_session_windows),
        ("w7_interval_range", w7_interval_range),
        ("w8_pattern_match", w8_pattern_match),
        ("j_asof_tolerance_purchase", j_asof_tolerance_purchase),
        ("j_range_bin", j_range_bin),
        ("s_stream_daily_rollup", s_stream_daily_rollup),
    ] + _sec_indicator_queries():
        t = time.time()
        rows = fn(spark, scratch).count()
        results["queries"][name] = {"rows": rows, "sec": round(time.time() - t, 2)}
        print(f"{name}: {rows} rows in {results['queries'][name]['sec']}s",
              file=sys.stderr)
    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
