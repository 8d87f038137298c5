"""Per-query profiling harness for the optimization rounds.

For each named query (default: bench HEADLINE), measures separately:

- ``build_s``   — Python time to construct the DataFrame (lazy; includes
  any driver-side work the query function does eagerly);
- ``plan_s``    — time for Catalyst analysis + optimization + physical
  planning (``queryExecution().executedPlan()``), i.e. the driver-side
  single-threaded cost paid before the first task launches;
- ``exec1_s``/``exec2_s`` — two timed ``count()`` executions (the bench
  action), so run-to-run variance is visible inline.

Optionally writes ``explain("formatted")`` to ``plans/r11/<q>_<tag>.txt``
with ``--explain-tag TAG`` (the judge-facing before/after evidence).

Usage:
  python tools/profile_queries.py [--sf-dir D] [--explain-tag TAG] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-tag", default=None)
    ap.add_argument("--plans-dir", default="r12")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from securities_data_pipeline_spark.session import get_spark

    spark = get_spark("sdp-profile")
    qs = entrymod.queries()
    names = args.queries
    if not names:
        import bench

        names = bench.HEADLINE

    # one warmup pass at sf0.001 so codegen/plan shapes are JIT'd,
    # matching the bench protocol
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for n in names:
            try:
                qs[n](spark, warm).count()
            except Exception as ex:
                print(f"# warmup {n} failed: {ex}", file=sys.stderr)

    out = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"profile:{n}")
        row: dict[str, float] = {}
        t0 = time.time()
        df = qs[n](spark, args.sf_dir)
        row["build_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        df._jdf.queryExecution().executedPlan()
        row["plan_s"] = round(time.time() - t0, 3)
        for i in range(args.repeats):
            t0 = time.time()
            # fresh DataFrame each run: no reuse of materialized
            # localCheckpoints between repeats (bench parity)
            qs[n](spark, args.sf_dir).count()
            row[f"exec{i + 1}_s"] = round(time.time() - t0, 3)
        if args.explain_tag:
            pdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                args.plans_dir,
            )
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(pdir, f"{n}_{args.explain_tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        out[n] = row
        print(json.dumps({n: row}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print("# SUMMARY")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
